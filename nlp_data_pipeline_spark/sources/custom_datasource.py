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

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


class DocStatsDataSource(DataSource):
    """`spark.read.format("docstats").load(dir)` over TSV shards, and
    `df.write.format("docstats").mode("overwrite").save(dir)` back."""

    @classmethod
    def name(cls) -> str:
        return "docstats"

    def schema(self) -> str:
        return "doc_id bigint, source string, n_chars bigint"

    def reader(self, schema) -> "DocStatsReader":
        return DocStatsReader(self.options["path"])

    def writer(self, schema, overwrite: bool) -> "DocStatsWriter":
        return DocStatsWriter(self.options["path"], overwrite)


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
        import csv

        # csv.reader's default dialect (quotechar '"', doubled quotes)
        # matches what both writers of this format emit: Spark's CSV
        # writer with escape='"' (r08's stage) and DocStatsWriter below.
        # A raw split("\t") would silently mis-parse any value the
        # writer had to quote (embedded tab/quote/newline).
        with open(partition.value, newline="") as fh:
            for doc_id, source, n_chars in csv.reader(fh, delimiter="\t"):
                yield int(doc_id), source, int(n_chars)


@dataclass
class _ShardCommit(WriterCommitMessage):
    tmp_path: str
    n_rows: int


class DocStatsWriter(DataSourceWriter):
    """Exactly-once batch sink via the standard two-phase commit
    protocol: each task writes its shard to a hidden temp name and
    reports it in a commit message; only the driver-side `commit`
    renames every temp file into its final `part-*` name (and clears
    the previous generation under overwrite). A failed/speculated task
    leaves at most an orphan temp file that `abort` removes — readers
    never observe a partial generation. On a cluster `path` is shared
    storage and the rename is the same one FileOutputCommitter does.
    """

    def __init__(self, path: str, overwrite: bool):
        self.path = path
        self.overwrite = overwrite

    def write(self, iterator) -> _ShardCommit:
        import csv
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}.tsv")
        n = 0
        with open(tmp, "w", newline="") as fh:
            w = csv.writer(fh, delimiter="\t")  # same dialect the reader parses
            for row in iterator:
                w.writerow((row.doc_id, row.source, row.n_chars))
                n += 1
        return _ShardCommit(tmp_path=tmp, n_rows=n)

    def commit(self, messages) -> None:
        import glob
        import os

        if self.overwrite:
            for old in glob.glob(os.path.join(self.path, "part-*")):
                os.remove(old)
        for i, m in enumerate(messages):
            os.rename(m.tmp_path, os.path.join(self.path, f"part-{i:05d}.tsv"))

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class DocFeedStreamSource(DataSource):
    """Streaming half of the Python Data Source API (`docfeed` format):
    `spark.readStream.format("docfeed").load()` over a documents
    parquet file, served as deterministic doc_id stripes.

    Offsets are `{"stripe": i}` dicts; micro-batch (start, end] covers
    stripes start..end-1, and `partitions` splits every stripe into
    `splits_per_stripe` doc_id subranges so each micro-batch fans out
    across executors exactly like a native streaming file source. The
    read path is pyarrow-with-filter on the executor — rows never pass
    through the driver. At 100 TB the same contract serves a message
    bus: offsets name positions in the feed, `partitions` names the
    parallel work units between two offsets, `read` pulls one unit.
    """

    @classmethod
    def name(cls) -> str:
        return "docfeed"

    def schema(self) -> str:
        return "doc_id bigint, source string, n_chars bigint"

    def streamReader(self, schema) -> "DocFeedStreamReader":
        return DocFeedStreamReader(self.options)


class DocFeedStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.path = options["path"]
        self.stripe_docs = int(options["stripe_docs"])
        self.n_stripes = int(options["n_stripes"])
        self.splits = int(options.get("splits_per_stripe", "2"))

    def initialOffset(self) -> dict:
        return {"stripe": 0}

    def latestOffset(self) -> dict:
        # The whole feed is available: Trigger.Once drains it in one
        # deterministic micro-batch (a live feed would report its
        # current high-water mark here instead).
        return {"stripe": self.n_stripes}

    def partitions(self, start: dict, end: dict):
        parts = []
        for s in range(start["stripe"], end["stripe"]):
            lo = s * self.stripe_docs
            step = -(-self.stripe_docs // self.splits)
            for k in range(self.splits):
                a = lo + k * step
                b = min(lo + self.stripe_docs, a + step)
                if a < b:
                    parts.append(InputPartition((a, b)))
        return parts

    def read(self, partition):
        import pyarrow.parquet as pq

        lo, hi = partition.value
        table = pq.read_table(
            self.path,
            columns=["doc_id", "source", "n_chars"],
            filters=[("doc_id", ">=", lo), ("doc_id", "<", hi)],
        )
        for doc_id, source, n_chars in zip(*(c.to_pylist() for c in table.columns)):
            yield doc_id, source, n_chars

    def commit(self, end: dict) -> None:
        pass


class DocShardsStreamSink(DataSource):
    """Streaming SINK half of the Python Data Source API (`docshards`
    format): `df.writeStream.format("docshards").option("path", dir)`.

    Completes the 2×2 API matrix this package ships — batch read
    (docstats reader), batch write (DocStatsWriter), stream read
    (DocFeedStreamSource), stream write (this). Each micro-batch uses
    the same two-phase protocol as the batch writer, with the batch id
    woven into the committed shard name: tasks write hidden temp
    files, the driver-side `commit(messages, batchId)` renames them to
    `part-b{batchId}-{i}.tsv`. A replayed micro-batch (restart between
    sink-commit and offset-commit) re-renames over the SAME names —
    idempotent, so the landed directory stays exactly-once. The shard
    layout is the one the `docstats` batch reader parses, so a landed
    stream round-trips through the batch half of the API.
    """

    @classmethod
    def name(cls) -> str:
        return "docshards"

    def streamWriter(self, schema, overwrite: bool) -> "DocShardsStreamWriter":
        return DocShardsStreamWriter(self.options["path"])


class DocShardsStreamWriter(DataSourceStreamWriter):
    def __init__(self, path: str):
        self.path = path

    def write(self, iterator) -> _ShardCommit:
        import csv
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}.tsv")
        n = 0
        with open(tmp, "w", newline="") as fh:
            w = csv.writer(fh, delimiter="\t")
            for row in iterator:
                w.writerow((row.doc_id, row.source, row.n_chars))
                n += 1
        return _ShardCommit(tmp_path=tmp, n_rows=n)

    def commit(self, messages, batchId: int) -> None:
        import os

        for i, m in enumerate(messages):
            os.replace(
                m.tmp_path,
                os.path.join(self.path, f"part-b{batchId:05d}-{i:05d}.tsv"),
            )

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)
