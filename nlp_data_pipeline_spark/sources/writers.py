"""Sinks: csv / parquet / json, plain and partitioned.

Reference parity: CSV export with header
(/root/reference/nlp_data_tagging.py:529-535). Partitioned parquet is
the 100 TB-relevant sink: a write partitioned by a low-cardinality
column (date, language, source) is what makes downstream partition
pruning possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Reference R25 (:529): header'd CSV."""
    df.write.mode(mode).option("header", True).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Bucketed managed table — the co-located-join layout. Two tables
    bucketed on the same key with the same bucket count join with NO
    shuffle (the orders⋈lineitem strategy at 100 TB)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)
