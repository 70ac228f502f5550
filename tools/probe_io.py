"""Guarded artifact writer for the probe/audit tools.

ADVICE r12 / VERDICT r12 "What's wrong" #1: the round-12 semantic-tier
1000x probe was recorded as a ZERO-BYTE committed artifact — the probe
process died (or its stdout redirect produced nothing) and the empty
file landed in the end-of-round snapshot unnoticed. Probes that print
JSON to stdout and rely on shell redirection can silently record
nothing; from round 13 every probe writes its artifact ITSELF through
``emit_artifact`` and refuses to exit 0 unless the written file
re-reads as non-empty, parseable JSON with a populated ``results``
payload.
"""

from __future__ import annotations

import json
import os
import sys


def emit_artifact(path: str, payload: dict) -> None:
    """Write ``payload`` to ``path`` (and stdout); die unless it lands.

    Raises SystemExit(1) — never returns normally on failure — if the
    payload is empty, the write failed, or the file does not re-read
    as the same JSON. A probe using this can therefore never commit an
    empty/truncated artifact as evidence with exit code 0.
    """
    if not isinstance(payload, dict) or not payload:
        sys.stderr.write(f"[probe_io] EMPTY payload for {path}\n")
        raise SystemExit(1)
    if not payload.get("results"):
        sys.stderr.write(f"[probe_io] payload for {path} has no results\n")
        raise SystemExit(1)
    text = json.dumps(payload, indent=1, sort_keys=False)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(text)
        f.write("\n")
        f.flush()
        os.fsync(f.fileno())
    # verify BEFORE the artifact name exists: a crash mid-write leaves
    # only the .tmp file, never a truncated artifact
    with open(tmp) as f:
        back = f.read()
    if not back.strip() or json.loads(back) != payload:
        sys.stderr.write(f"[probe_io] re-read mismatch for {path}\n")
        raise SystemExit(1)
    os.replace(tmp, path)
    print(text)
    sys.stderr.write(
        f"[probe_io] wrote {path} ({os.path.getsize(path)} bytes)\n"
    )
