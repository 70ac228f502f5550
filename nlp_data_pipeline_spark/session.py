"""SparkSession factory tuned for this engine.

Local mode is only the test harness; every config choice is written for
the real target — a many-executor cluster scanning ~100 TB of parquet:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  dynamic broadcast conversion) so plans self-correct at scale,
- Arrow on for every pandas interchange (the only sanctioned Python
  boundary),
- shuffle partitions default to a local-friendly number; on a real
  cluster AQE's coalescing makes the initial number mostly irrelevant
  as long as it is high enough, so deployments should raise
  ``spark.sql.shuffle.partitions`` to ~2-3x total cores.
"""

from __future__ import annotations

import os
import warnings

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_spark(
    app_name: str = "nlp_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-conscious defaults.

    ORDERING REQUIREMENT (ADVICE r13): the single-thread BLAS guard
    below works by mutating process env BEFORE the JVM starts (Python
    workers inherit the JVM's env). Call get_spark before any other
    code creates a SparkSession or initializes BLAS in-process —
    getOrCreate silently reuses an existing session, in which case the
    guard cannot apply and a warning is emitted instead.
    """
    # One BLAS thread per Python worker (round 13): Spark already runs
    # one worker per core, so library-level GEMM threading (OpenBLAS
    # defaults to n_cores threads PER process) oversubscribes 32×32
    # threads and collapses into kernel-time thrash — the NND 1000x
    # probe measured a stage making zero progress in 15 min that
    # completes in seconds single-threaded. Workers inherit the JVM's
    # env, so set this before the session (JVM) starts; setdefault so
    # a deployment that genuinely wants threaded BLAS in a
    # few-fat-executors layout can override.
    active = SparkSession.getActiveSession()
    if active is not None:
        # Too late to influence worker env through the JVM — say so
        # instead of silently pretending the guard applied.
        if any(
            os.environ.get(v) is None
            for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS")
        ):
            warnings.warn(
                "get_spark called with an active SparkSession: the BLAS "
                "single-thread guard (OMP/OPENBLAS/MKL_NUM_THREADS=1) "
                "cannot reach already-started workers; set the vars in "
                "the launcher env if threaded-BLAS oversubscription is "
                "a concern.",
                RuntimeWarning,
                stacklevel=2,
            )
    else:
        for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
            os.environ.setdefault(var, "1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # --- adaptive execution: the 100 TB safety net ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- Arrow for any pandas_udf / toPandas boundary ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # --- shuffle sizing (cluster deployments raise this; AQE coalesces) ---
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # keep parquet scans splittable and pruned
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # broadcast threshold: dims (region/nation/supplier/part) stay broadcast
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # timestamps: parquet test data is TIMESTAMP_NTZ-ish micros; keep UTC
        # (event-time physical-layout normalization — NTZ / legacy nanos —
        # lives in sources/catalog.normalize_event_ts, the single site)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # heartbeat slack for the local 1000x probes: a long driver GC
        # pause under a 5M-row stage must not kill the in-process
        # executor (measured: "unable to send heartbeats more than 60
        # times" ended the first NND 1000x attempt). Interval stays
        # default; only the tolerated silence is raised.
        .config(
            "spark.network.timeout",
            os.environ.get("SPARK_GRAFT_NETWORK_TIMEOUT", "600s"),
        )
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
