"""Spark 4 Python Data Source API connector (`docstats` format).

The extension point for formats Spark has no JVM reader for —
proprietary line protocols, domain binary formats, service-backed
feeds. The connector below reads a directory of tab-separated shards
(`doc_id<TAB>source<TAB>n_chars`), exposing ONE InputPartition per
shard file so the scan parallelizes across executors exactly like a
native file source; rows stream back through the API's Arrow batch
channel, never through the driver.

At 100 TB the same three methods are the whole contract: `partitions`
enumerates the work units (files / byte ranges / topic partitions),
`read` parses one unit on an executor, `schema` declares the columns.
Spark handles distribution, retries, and Arrow transfer.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class DocStatsDataSource(DataSource):
    """`spark.read.format("docstats").load(dir)` over TSV shards."""

    @classmethod
    def name(cls) -> str:
        return "docstats"

    def schema(self) -> str:
        return "doc_id bigint, source string, n_chars bigint"

    def reader(self, schema) -> "DocStatsReader":
        return DocStatsReader(self.options["path"])


class DocStatsReader(DataSourceReader):
    def __init__(self, path: str):
        self.path = path

    def partitions(self):
        import glob
        import os

        files = sorted(glob.glob(os.path.join(self.path, "part-*")))
        if not files:
            raise FileNotFoundError(f"no part-* shards under {self.path}")
        return [InputPartition(f) for f in files]

    def read(self, partition):
        with open(partition.value) as fh:
            for line in fh:
                doc_id, source, n_chars = line.rstrip("\n").split("\t")
                yield int(doc_id), source, int(n_chars)
