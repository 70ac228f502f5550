"""Table catalog over the driver-generated parquet test data.

Scan layer notes for 100 TB deployments:

- Parquet is the only storage format the driver ships; schema-on-read
  comes from the parquet footer, so ``spark.read.parquet`` keeps full
  predicate pushdown + column pruning (verify with
  ``plans.explain.scan_report``).
- At real scale the facts (lineitem / orders / events) should be laid
  out partitioned (events by day: ``ts`` → ``dt`` partition column) or
  bucketed on their join key (`l_orderkey`/`o_orderkey`) so the big
  fact-fact join is shuffle-free.  The loaders below intentionally do
  NOT repartition — per-query operators decide, because a blanket
  repartition is a needless shuffle for most queries.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """THE single normalization point for the event-time column.

    Upstream writers have shipped ``events.ts`` in three physical
    layouts across testdata generations; every one is mapped to a plain
    session-tz TIMESTAMP here so watermarks/windows always see the type
    Structured Streaming requires (``withWatermark`` rejects
    TIMESTAMP_NTZ with EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE):

    - ``bigint``        — legacy parquet TIMESTAMP(NANOS) scanned as
      int64 under ``nanosAsLong``; floor-divide to µs (exact: generator
      values carry no sub-µs precision, matches DuckDB's ns→µs read).
    - ``timestamp_ntz`` — parquet ``timestamp[us]`` without the
      adjusted-to-UTC flag (the current generator's layout). Cast
      reinterprets the wall-clock in the session tz; sessions here run
      UTC, so values are unchanged.
    - ``timestamp``     — already what we want; untouched.
    """
    from pyspark.sql import functions as F

    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def read_events_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Raw scan of an events parquet path (file or directory), tolerant
    of the legacy TIMESTAMP(NANOS) physical type: that layout has no
    native Spark type and fails schema inference with "Illegal Parquet
    type"; only then flip the documented legacy conf and rescan (the
    conf is consulted lazily at execution too, so it must stay set for
    the session — harmless: no other table carries NANOS).

    NOTE: returns the RAW schema (``ts`` may be bigint/timestamp_ntz) —
    callers that consume event time go through ``normalize_event_ts``.
    Streaming readers need exactly this raw schema because the file
    source validates against the files on disk.
    """
    try:
        return spark.read.parquet(path)
    except Exception as exc:  # pragma: no cover - legacy-layout fallback
        if "NANOS" in str(exc) or "Illegal Parquet type" in str(exc):
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            return spark.read.parquet(path)
        raise


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one test table. Plain parquet scan: pushdown-friendly.

    ``events`` routes through ``read_events_parquet`` +
    ``normalize_event_ts`` so ``ts`` is always a session-tz TIMESTAMP
    regardless of which generation of testdata is on disk.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return normalize_event_ts(read_events_parquet(spark, path))
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views so spark.sql() queries run."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
