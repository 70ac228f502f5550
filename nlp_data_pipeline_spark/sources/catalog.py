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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one test table. Plain parquet scan: pushdown-friendly.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark has
    no native type for; with ``spark.sql.legacy.parquet.nanosAsLong`` it
    scans as int64 nanos and is converted here to a microsecond
    TIMESTAMP (exact: the generator's values carry no sub-µs precision,
    and floor-division matches DuckDB's own ns→µs read).
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    if name == "events":
        # must hold for ANY caller-provided session (the driver builds its
        # own); runtime-settable SQL conf, so set it here, not only in the
        # session factory. DELIBERATELY left set for the session rather
        # than save/restored: the conf is consulted again when the lazy
        # scan actually executes, so an eager restore would corrupt the
        # returned DataFrame. Session invariant: nanosAsLong=true is
        # compatible with every other table (none carries TIMESTAMP(NANOS),
        # so their scans are unaffected), and all reads go through
        # load_table.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views so spark.sql() queries run."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
