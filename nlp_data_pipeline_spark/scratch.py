"""Per-user scratch space for staged writes, sinks, and checkpoints.

Operators stage roundtrip writes under predictable, reusable names so
repeated bench/test runs overwrite in place instead of accumulating
mkdtemp copies (the r09 lesson). Rooting those names directly in the
shared system temp dir is unsafe on a multi-user host: a leftover
same-named dir owned by another user makes the silent rmtree fail and
the subsequent write raise — or worse, a pre-created path redirects
the write into a directory someone else controls. Every scratch path
therefore lives under a mode-0700 per-UID root whose ownership is
verified on each use.
"""

from __future__ import annotations

import os
import tempfile


def scratch_root() -> str:
    """The per-user scratch root, created 0700 on first use."""
    root = os.path.join(tempfile.gettempdir(), f"spark_graft_{os.getuid()}")
    os.makedirs(root, mode=0o700, exist_ok=True)
    st = os.stat(root)
    if st.st_uid != os.getuid():
        raise RuntimeError(
            f"scratch root {root} is owned by uid {st.st_uid}, not us — "
            "refusing to stage writes through another user's directory"
        )
    return root


def scratch_path(name: str) -> str:
    """A path under the scratch root (parent guaranteed, leaf not created)."""
    return os.path.join(scratch_root(), name)
