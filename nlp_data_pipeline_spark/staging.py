"""Round-gated declaration for staged operators.

The driver verifies only the FIRST 50 ``queries()`` entries per round,
ranking never-green queries first — so each NEW declaration displaces
one rotation re-check. When a round's window is already at capacity,
finished operators are STAGED: implemented, oracle written, driver-
style-tested, but left out of the module QUERIES/ORACLES dicts.

This module makes the deferred declaration AUTOMATIC instead of a
manual next-round edit: the driver records ``CORRECTNESS_r{N}.json``
at the END of round N, so "round N is over" is observable from the
filesystem. Staged ops gated on ``staged_ops_live(N)`` stay undeclared
for the whole of round N (including its closing verify, which runs
before the file is written) and appear in ``queries()`` from the first
moment of round N+1 — never-green, therefore first in the new window.

The gate is evaluated LAZILY: operator modules export their staged
entries as ``STAGED_QUERIES`` / ``STAGED_ORACLES`` dicts keyed by
staging round, and ``__spark_entry__._collect`` consults
``staged_ops_live`` on every ``queries()`` / ``oracle_sql()`` call —
so a long-lived process picks up a newly-landed round record without
re-import, and declaration state never depends on import order. The
round markers themselves (``CORRECTNESS_r*.json``) are committed to
git at each round close, so a clone taken from a round boundary
reproduces the same declaration state (mid-round, the working tree may
carry a marker that HEAD does not yet).
"""

from __future__ import annotations

import glob
import os
import re


def latest_recorded_round() -> int:
    """Highest N among repo-root CORRECTNESS_r{N}.json files (0 if none).

    Override: SPARK_GRAFT_ASSUME_ROUND=<N> forces the value — the
    one-command way to rehearse a future round's declarations
    (e.g. ``SPARK_GRAFT_ASSUME_ROUND=7 python tools/check_oracle.py
    /root/testdata/sf0.01 t33``) without copying the repo and planting
    a marker file.
    """
    forced = os.environ.get("SPARK_GRAFT_ASSUME_ROUND")
    if forced is not None:
        try:
            return int(forced)
        except ValueError:
            # Malformed/empty override: fall back to the filesystem scan
            # rather than crashing every operator-module import.
            pass
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return max(rounds, default=0)


def staged_ops_live(staged_during_round: int) -> bool:
    """True once the staging round's correctness record exists — i.e.
    from the start of the NEXT round."""
    return latest_recorded_round() >= staged_during_round
