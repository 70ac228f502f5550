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
import stat
import tempfile


def scratch_root() -> str:
    """The per-user scratch root, created 0700 on first use.

    The checks below must not follow symlinks: a pre-planted link in the
    world-writable temp dir (``/tmp/spark_graft_0 -> /victim``) would pass
    an ``os.stat``-based ownership check while redirecting every staged
    write — and the wipe-on-entry rmtree some sinks perform — into a path
    the attacker chose. ``os.lstat`` inspects the link itself, and a
    pre-existing real directory is re-tightened to 0700 (``makedirs`` only
    applies ``mode`` when it creates the leaf).
    """
    root = os.path.join(tempfile.gettempdir(), f"spark_graft_{os.getuid()}")
    try:
        os.mkdir(root, mode=0o700)
    except FileExistsError:
        st = os.lstat(root)
        if stat.S_ISLNK(st.st_mode):
            raise RuntimeError(
                f"scratch root {root} is a symlink — refusing to stage "
                "writes through a link planted in the shared temp dir"
            )
        if not stat.S_ISDIR(st.st_mode):
            raise RuntimeError(f"scratch root {root} exists and is not a directory")
        if st.st_uid != os.getuid():
            raise RuntimeError(
                f"scratch root {root} is owned by uid {st.st_uid}, not us — "
                "refusing to stage writes through another user's directory"
            )
        if stat.S_IMODE(st.st_mode) != 0o700:
            os.chmod(root, 0o700)
    return root


def scratch_path(name: str) -> str:
    """A path under the scratch root (parent guaranteed, leaf not created)."""
    return os.path.join(scratch_root(), name)
