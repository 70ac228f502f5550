"""Variance-controlled A/B of streaming state-store knobs (VERDICT r14 #4).

e12/e13/e16 are state-commit-bound at the bench SF (~2 s per addBatch,
dominated by per-partition per-operator state store commits, not data).
This probe times each query end-to-end (build + noop force, exactly the
bench's measurement) min-of-3 WARM in ONE session for each config:

  - state partitions: 8 (current default) vs 4 vs 2
  - state store provider: default (HDFSBackedStateStoreProvider) vs RocksDB

Writes probe_stream_ab_r15.json. Host noise is ±11% at identical HEAD,
so only deltas well past that move the default.

Usage: python tools/probe_stream_ab.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from nlp_data_pipeline_spark.session import get_spark
    import bench

    spark = get_spark("probe_stream_ab")
    sf_dir = bench._prep_multifile(
        spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    from nlp_data_pipeline_spark.sources.catalog import load_table

    load_table(spark, sf_dir, "lineitem").select("l_orderkey").limit(10).count()

    def _ident(it):
        yield from it

    spark.range(10).mapInPandas(_ident, "id long").count()

    from nlp_data_pipeline_spark.operators import events as E

    ROCKSDB = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
    default_provider = spark.conf.get(PROVIDER_KEY)

    queries = {
        "e12_stream_stream_join": E.e12_stream_stream_join,
        "e13_stateful_type_counts": E.e13_stateful_type_counts,
        "e16_stream_stream_left_outer": E.e16_stream_stream_left_outer,
    }
    configs = [
        ("hdfs_p8", default_provider, 8),
        ("hdfs_p4", default_provider, 4),
        ("hdfs_p2", default_provider, 2),
        ("rocksdb_p8", ROCKSDB, 8),
        ("rocksdb_p2", ROCKSDB, 2),
    ]

    out: dict = {"round": 15, "sf_dir": sf_dir, "reps": 3, "results": {}}
    for cfg_name, provider, parts in configs:
        spark.conf.set(PROVIDER_KEY, provider)
        prev_parts = E.STREAM_STATE_PARTITIONS
        E.STREAM_STATE_PARTITIONS = parts
        try:
            for qname, fn in queries.items():
                times = []
                for _ in range(3):
                    spark.sparkContext.setJobDescription(
                        f"stream_ab {cfg_name} {qname}"
                    )
                    t0 = time.time()
                    df = fn(spark, sf_dir)
                    bench._force(df)
                    times.append(round(time.time() - t0, 3))
                out["results"].setdefault(qname, {})[cfg_name] = {
                    "times": times,
                    "min": min(times),
                }
                sys.stderr.write(
                    f"[ab] {cfg_name} {qname}: {times} min={min(times)}\n"
                )
        finally:
            E.STREAM_STATE_PARTITIONS = prev_parts
            spark.conf.set(PROVIDER_KEY, default_provider)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "probe_stream_ab_r15.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: {c: v["min"] for c, v in r.items()} for k, r in out["results"].items()}, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
