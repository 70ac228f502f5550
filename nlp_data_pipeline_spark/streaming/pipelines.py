"""Structured Streaming pipelines over the events stream.

Long-running variants of operators/events.py: the batch queries define
(and oracle-pin) the semantics; these wrappers run the same logical
plans as continuous micro-batch jobs. File sources here stand in for
Kafka/queue sources at deployment — swap ``readStream.parquet`` for
``readStream.format("kafka")`` and the rest of each plan is unchanged.

Watermark policy: 10 minutes of allowed lateness. Batch mode keeps late
rows (full replay); streaming drops rows later than the watermark —
tests/test_streaming.py pins exactly that divergence.

Scale: stateful aggregations bound their state by watermark horizon ×
key cardinality; session windows and dedup state evict as the watermark
passes. That bound, not executor count, is what makes these plans safe
on an unbounded 100 TB/day stream.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nlp_data_pipeline_spark.sources.catalog import (
    normalize_event_ts,
    read_events_parquet,
)


def read_events_stream(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """readStream over a directory of events parquet files.

    The ONLY events stream reader — every streaming query goes through
    here so ``ts`` normalization (legacy int64-nanos, TIMESTAMP_NTZ →
    session-tz TIMESTAMP; see catalog.normalize_event_ts) happens in
    one place. The readStream schema must be the RAW file schema (the
    file source validates it against the footers), hence normalize
    AFTER the source, not in the schema.
    """
    raw_schema = read_events_parquet(spark, events_dir).schema
    reader = spark.readStream.schema(raw_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return normalize_event_ts(reader.parquet(events_dir))


def tumbling_counts(stream: DataFrame, window: str = "1 hour", lateness: str = "10 minutes") -> DataFrame:
    return (
        stream.withWatermark("ts", lateness)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def sessionized(stream: DataFrame, gap: str = "30 minutes", lateness: str = "10 minutes") -> DataFrame:
    return (
        stream.withWatermark("ts", lateness)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


def dedup_within_watermark(stream: DataFrame, lateness: str = "10 minutes") -> DataFrame:
    """Drop duplicate (user_id, event_type) pairs; state bounded by watermark."""
    return stream.withWatermark("ts", lateness).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def stateful_user_counters(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    cumulative event count + running value total, emitted every
    micro-batch. This is the extension point for operators Spark's
    built-ins can't express (per-key custom state machines); state is
    one tiny row per user, partitioned by the grouping key — bounded by
    key cardinality, never by stream length.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        "user_id long, n_events long, total_value double",
        "n long, total double",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def stateful_type_counts(stream: DataFrame) -> DataFrame:
    """Per-(user_id, event_type) running event counts — a COMPOSITE
    grouping key stateful operator (state = one counter per key pair,
    bounded by |users|×|event types|, never by stream length). Emits
    the updated count each micro-batch in append mode; downstream takes
    the last emission per key as the final value.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        user_id, event_type = key
        (n,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame(
            {"user_id": [user_id], "event_type": [event_type], "n_events": [n]}
        )

    return stream.groupBy("user_id", "event_type").applyInPandasWithState(
        update,
        "user_id long, event_type string, n_events long",
        "n long",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def transform_with_state_type_counts(stream: DataFrame) -> DataFrame:
    """Spark 4 ``transformWithStateInPandas`` variant of
    ``stateful_type_counts``: one MapState(event_type → count) per
    user, the richer state model (typed value/list/map state, timers,
    TTL) that supersedes applyInPandasWithState.

    IMPORT-GATED: the TransformWithState Python state server speaks
    protobuf and this container ships no ``google.protobuf`` (verified:
    the query crashes in StreamingPythonRunner init). On a cluster with
    protobuf installed this function runs as-is; the declared e13 query
    uses the applyInPandasWithState twin so the semantics stay
    driver-verified either way.
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:  # pragma: no cover - absent in this container
        raise NotImplementedError(
            "transformWithStateInPandas requires the protobuf package "
            "(TransformWithState state-server protocol); not shipped in "
            "this container — use stateful_type_counts instead"
        ) from exc

    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TypeCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.counts = handle.getMapState("counts", "event_type string", "n long")

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            for pdf in rows:
                for et, grp in pdf.groupby("event_type"):
                    prev = (
                        self.counts.getValue((et,))
                        if self.counts.containsKey((et,))
                        else (0,)
                    )
                    self.counts.updateValue((et,), (prev[0] + len(grp),))
            out = sorted((k[0], v[0]) for k, v in self.counts.iterator())
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out),
                    "event_type": [o[0] for o in out],
                    "n_events": [o[1] for o in out],
                }
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=TypeCounts(),
        outputStructType="user_id long, event_type string, n_events long",
        outputMode="Update",
        timeMode="None",
    )


def stream_stream_purchase_attribution(
    events: DataFrame,
    max_gap: str = "7 days",
    lateness: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: each purchase joined to signups of the
    same user that happened at-or-before it within ``max_gap``.

    Both sides carry watermarks and the join has an event-time range
    condition — the two requirements that let Spark BOUND the join
    state: a buffered signup can be evicted once the watermark passes
    signup_ts + max_gap, so state is O(events within the horizon), not
    O(stream). Without the time condition a stream-stream join must
    buffer forever; this shape is the scalable attribution join.

    ``how="left_outer"`` adds the OUTER semantics: matches still emit
    eagerly, but an unmatched purchase emits its null-joined row only
    when the watermark proves no matching signup can still arrive
    (signup_ts <= purchase_ts, so: watermark past purchase_ts) — the
    e16 query pins that emission boundary in closed form.
    """
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    ).withWatermark("purchase_ts", lateness)
    signups = events.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("signup_ts"),
    ).withWatermark("signup_ts", lateness)
    return purchases.join(
        signups,
        F.expr(
            f"""
            p_user = s_user AND
            signup_ts <= purchase_ts AND
            signup_ts >= purchase_ts - INTERVAL {max_gap}
            """
        ),
        how,
    )


def run_foreach_batch_parquet(
    df: DataFrame, out_dir: str, timeout_s: int = 120
) -> list[int]:
    """Exactly-once file sink via foreachBatch: each micro-batch writes a
    parquet partition keyed by epoch id; replays of an epoch overwrite
    the same path (idempotent), which is the standard exactly-once
    pattern for sinks without native transactional support.
    Returns the epoch ids that committed.
    """
    import os as _os

    epochs: list[int] = []

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            _os.path.join(out_dir, f"epoch={epoch_id}")
        )
        epochs.append(epoch_id)

    q = (
        df.writeStream.foreachBatch(write_epoch)
        .option("checkpointLocation", _os.path.join(out_dir, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return epochs


def run_to_memory_sink(
    df: DataFrame, output_mode: str = "append", timeout_s: int = 120
) -> tuple[str, DataFrame]:
    """Execute a streaming DF with availableNow into a memory sink.

    Returns (sink_name, result_df). Used by tests and e04.
    """
    spark = df.sparkSession
    sink = f"sink_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(sink)
        .outputMode(output_mode)
        .option("checkpointLocation", os.path.join(tempfile.mkdtemp(), "ckpt"))  # unique per stream BY DESIGN: concurrent callers must not share checkpoints; dirs are small (offsets only, no data)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return sink, spark.table(sink)
