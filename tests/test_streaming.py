"""Structured Streaming semantics — FIXTURES.md F11 (late-data policy):
a late event beyond the watermark is DROPPED in streaming append mode
but PRESENT in batch mode over the same files."""

import os
import tempfile
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from nlp_data_pipeline_spark.streaming.pipelines import (
    read_events_stream,
    run_to_memory_sink,
    tumbling_counts,
)


def _link_as_batch(sub, stream_dir, order_idx):
    """Hard-link a written parquet dir's data files into the stream dir
    with an EXPLICIT mtime (fixed epoch + order_idx seconds): the file
    source orders batches by modification time, and os.utime is both
    deterministic and ~1 s faster per batch than the sleep it replaces
    (ADVICE r09 flake surface)."""
    stamp = 1_700_000_000 + order_idx
    for f in sorted(os.listdir(sub)):
        if f.endswith(".parquet"):
            dst = os.path.join(stream_dir, f"{chr(97 + order_idx)}_{f}")
            os.link(os.path.join(sub, f), dst)
            os.utime(dst, (stamp, stamp))


def _write_batches(spark, base):
    """Three parquet files (one per micro-batch), mtime-ordered.

    Three, not two: since Spark 3.4 (SPARK-40925) the LATE-EVENT filter
    uses the watermark of the batch *before last*, while state EVICTION
    uses the current one — so a straggler is only dropped two batches
    after the watermark passed it.
    """
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    files = [
        # batch 0: advances watermark to 12:00 - 10min = 11:50
        [(1, datetime(2024, 1, 1, 10, 0, 0)), (2, datetime(2024, 1, 1, 10, 30, 0)),
         (3, datetime(2024, 1, 1, 12, 0, 0))],
        # batch 1: on-time filler; 11:50 becomes the late-filter watermark
        [(4, datetime(2024, 1, 1, 12, 10, 0))],
        # batch 2: 10:05 is > 10 min late → dropped; 12:20 on time
        [(5, datetime(2024, 1, 1, 10, 5, 0)), (6, datetime(2024, 1, 1, 12, 20, 0))],
    ]
    stream_dir = os.path.join(base, "stream")
    os.makedirs(stream_dir)
    for i, rows in enumerate(files):
        df = spark.createDataFrame(
            [(e, t, 1, "click", 1.0, "{}") for e, t in rows], schema
        )
        sub = os.path.join(base, f"f{i}")
        df.coalesce(1).write.parquet(sub)
        _link_as_batch(sub, stream_dir, i)
    return stream_dir


def test_late_event_dropped_in_streaming_present_in_batch(spark):
    base = tempfile.mkdtemp(prefix="stream_test_")
    stream_dir = _write_batches(spark, base)

    # batch replay sees all 6 events — including the straggler
    batch_total = spark.read.parquet(stream_dir).count()
    assert batch_total == 6

    stream = read_events_stream(spark, stream_dir, max_files_per_trigger=1)
    agg = tumbling_counts(stream, window="1 hour", lateness="10 minutes")
    _, result = run_to_memory_sink(agg, output_mode="append")
    emitted = {r["window_start"].hour: r["n_events"] for r in result.collect()}
    # the 10:00 window finalized with only its 2 on-time events; the
    # 10:05 straggler was dropped by the watermark (batch mode kept it)
    assert emitted.get(10) == 2


def test_streaming_totals_match_batch_when_nothing_late(spark, sf_dir):
    """availableNow over the real events table in complete mode ==
    batch aggregation (file replay determinism)."""
    import shutil

    from nlp_data_pipeline_spark.sources.catalog import load_table

    staged = tempfile.mkdtemp(prefix="events_stage_")
    os.symlink(
        os.path.join(sf_dir, "events.parquet"), os.path.join(staged, "events.parquet")
    )
    stream = read_events_stream(spark, staged)
    agg = tumbling_counts(stream)
    _, result = run_to_memory_sink(agg, output_mode="complete")
    stream_total = result.agg(F.sum("n_events")).first()[0]
    batch_total = load_table(spark, sf_dir, "events").count()
    assert stream_total == batch_total
    shutil.rmtree(staged, ignore_errors=True)


def test_streaming_session_windows_match_batch(spark, sf_dir):
    """sessionized() through a real stream == batch session_window."""
    from nlp_data_pipeline_spark.sources.catalog import load_table
    from nlp_data_pipeline_spark.streaming.pipelines import sessionized

    staged = tempfile.mkdtemp(prefix="events_sess_")
    os.symlink(
        os.path.join(sf_dir, "events.parquet"), os.path.join(staged, "events.parquet")
    )
    stream = read_events_stream(spark, staged)
    _, result = run_to_memory_sink(sessionized(stream), output_mode="complete")
    stream_sessions = result.count()
    batch_sessions = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .count()
        .count()
    )
    assert stream_sessions == batch_sessions


def test_stateful_counters_match_batch_totals(spark, sf_dir):
    """applyInPandasWithState cumulative per-user counters: the LAST
    emission per user equals the batch groupBy answer."""
    from nlp_data_pipeline_spark.sources.catalog import load_table
    from nlp_data_pipeline_spark.streaming.pipelines import stateful_user_counters

    staged = tempfile.mkdtemp(prefix="events_state_")
    os.symlink(
        os.path.join(sf_dir, "events.parquet"), os.path.join(staged, "events.parquet")
    )
    stream = read_events_stream(spark, staged)
    _, result = run_to_memory_sink(stateful_user_counters(stream), output_mode="append")
    # availableNow on one file = one micro-batch → one emission per user
    got = {r["user_id"]: (r["n_events"], r["total_value"]) for r in result.collect()}
    expect = {
        r["user_id"]: (r["n"], r["v"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("v"),
        )
        .collect()
    }
    assert set(got) == set(expect)
    for uid, (n, v) in expect.items():
        assert got[uid][0] == n
        assert abs(got[uid][1] - v) < 0.05  # python float accumulation vs spark sum


def test_stream_stream_join_matches_batch_join(spark, sf_dir):
    """Stream-stream time-bounded join == the same join in batch
    (availableNow replay; no late data, so watermarks drop nothing)."""
    from nlp_data_pipeline_spark.sources.catalog import load_table
    from nlp_data_pipeline_spark.streaming.pipelines import (
        stream_stream_purchase_attribution,
    )

    staged = tempfile.mkdtemp(prefix="events_ssj_")
    os.symlink(
        os.path.join(sf_dir, "events.parquet"), os.path.join(staged, "events.parquet")
    )
    stream = read_events_stream(spark, staged)
    joined = stream_stream_purchase_attribution(stream)
    _, result = run_to_memory_sink(joined, output_mode="append")
    stream_count = result.count()

    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts")
    )
    s = e.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_user"), F.col("ts").alias("signup_ts")
    )
    batch_count = p.join(
        s,
        (F.col("p_user") == F.col("s_user"))
        & (F.col("signup_ts") <= F.col("purchase_ts"))
        & (F.col("signup_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 7 DAYS")),
    ).count()
    assert stream_count == batch_count > 0


def test_foreach_batch_parquet_sink_exactly_once_layout(spark, sf_dir):
    """foreachBatch epoch-partitioned parquet: rows written == rows read;
    epoch dirs are idempotent overwrite targets."""
    from nlp_data_pipeline_spark.streaming.pipelines import run_foreach_batch_parquet

    staged = tempfile.mkdtemp(prefix="events_feb_src_")
    os.symlink(
        os.path.join(sf_dir, "events.parquet"), os.path.join(staged, "events.parquet")
    )
    out = tempfile.mkdtemp(prefix="events_feb_out_")
    stream = read_events_stream(spark, staged).select("event_id", "user_id", "ts")
    epochs = run_foreach_batch_parquet(stream, out)
    assert len(epochs) >= 1
    written = spark.read.parquet(*[os.path.join(out, f"epoch={e}") for e in epochs])
    assert written.count() == spark.read.parquet(staged).count()


def test_dedup_within_watermark_bounds(spark, sf_dir):
    staged = tempfile.mkdtemp(prefix="events_dedup_")
    os.symlink(
        os.path.join(sf_dir, "events.parquet"), os.path.join(staged, "events.parquet")
    )
    from nlp_data_pipeline_spark.streaming.pipelines import dedup_within_watermark

    stream = read_events_stream(spark, staged)
    _, result = run_to_memory_sink(dedup_within_watermark(stream), output_mode="append")
    got = result.groupBy("user_id", "event_type").count()
    assert got.filter(F.col("count") > 1).count() == 0  # no dup pairs emitted


def test_checkpoint_resume_does_not_reprocess(spark):
    """Exactly-once across restarts: a file-sink query restarted from
    its checkpoint must process only files that arrived while it was
    down — never re-emit rows from already-committed batches."""
    base = tempfile.mkdtemp(prefix="ckpt_test_")
    stream_dir = os.path.join(base, "in")
    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(stream_dir)
    schema = "event_id long, value double"

    def arrive(rows, tag):
        df = spark.createDataFrame(rows, schema)
        sub = os.path.join(base, tag)
        df.coalesce(1).write.parquet(sub)
        for f in os.listdir(sub):
            if f.endswith(".parquet"):
                os.link(os.path.join(sub, f), os.path.join(stream_dir, f"{tag}_{f}"))

    def run_once():
        q = (
            spark.readStream.schema(schema).parquet(stream_dir)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not finish within 120s"

    arrive([(1, 1.0), (2, 2.0), (3, 3.0)], "a")
    run_once()
    assert spark.read.parquet(out).count() == 3

    arrive([(4, 4.0), (5, 5.0)], "b")
    run_once()  # restart from checkpoint
    got = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3, 4, 5]  # batch a NOT re-emitted


def test_transform_with_state_type_counts_matches_batch(spark, sf_dir):
    """Spark-4 transformWithStateInPandas path (MapState per user).

    Runs automatically wherever google.protobuf exists (the
    TransformWithState state-server protocol); documented skip here.
    The LAST emission per (user, type) must equal the batch groupBy.
    """
    pytest.importorskip("google.protobuf", reason="transformWithStateInPandas needs protobuf")
    from nlp_data_pipeline_spark.sources.catalog import load_table
    from nlp_data_pipeline_spark.streaming.pipelines import (
        transform_with_state_type_counts,
    )

    staged = tempfile.mkdtemp(prefix="events_tws_")
    os.symlink(
        os.path.join(sf_dir, "events.parquet"), os.path.join(staged, "events.parquet")
    )
    stream = read_events_stream(spark, staged)
    _, result = run_to_memory_sink(
        transform_with_state_type_counts(stream), output_mode="update"
    )
    got = {
        (r["user_id"], r["event_type"]): r["n_events"] for r in result.collect()
    }
    expect = {
        (r["user_id"], r["event_type"]): r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expect


def test_left_outer_stream_stream_emits_watermark_proven_nulls(spark, sf_dir):
    """Outer rows must appear ONLY for purchases the watermark has
    passed; matches equal the batch join exactly."""
    from nlp_data_pipeline_spark.sources.catalog import load_table
    from nlp_data_pipeline_spark.streaming.pipelines import (
        stream_stream_purchase_attribution,
    )

    staged = tempfile.mkdtemp(prefix="events_ssl_")
    os.symlink(
        os.path.join(sf_dir, "events.parquet"), os.path.join(staged, "events.parquet")
    )
    stream = read_events_stream(spark, staged)
    _, result = run_to_memory_sink(
        stream_stream_purchase_attribution(stream, how="left_outer"),
        output_mode="append",
    )
    got_matched = result.filter(F.col("signup_id").isNotNull()).count()
    got_nulls = result.filter(F.col("signup_id").isNull()).count()

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter("event_type='purchase'").selectExpr(
        "event_id purchase_id", "user_id pu", "ts pts"
    )
    s = ev.filter("event_type='signup'").selectExpr(
        "event_id signup_id", "user_id su", "ts sts"
    )
    batch = p.join(
        s, F.expr("pu=su AND sts<=pts AND sts >= pts - INTERVAL 7 DAYS"), "left"
    )
    assert got_matched == batch.filter("signup_id IS NOT NULL").count()
    # every emitted null row is watermark-proven: purchase_ts below the
    # min-of-both-streams watermark
    import datetime

    wmax = min(
        p.agg(F.max("pts")).first()[0], s.agg(F.max("sts")).first()[0]
    ) - datetime.timedelta(minutes=10)
    expected_nulls = (
        batch.filter("signup_id IS NULL").filter(F.col("pts") < F.lit(wmax)).count()
    )
    assert got_nulls == expected_nulls


def test_e17_cdc_upsert_matches_batch_argmax(spark, sf_dir):
    """The incrementally-merged state (4 micro-batches, one source file
    per trigger) must equal the batch last-writer-wins argmax — upsert
    is order-independent by construction."""
    import glob

    from pyspark.sql.window import Window

    from nlp_data_pipeline_spark.operators.events import e17_streaming_cdc_upsert
    from nlp_data_pipeline_spark.sources.catalog import load_table

    got = {r.user_id: (r.last_event_id, r.last_ts_epoch)
           for r in e17_streaming_cdc_upsert(spark, sf_dir).collect()}
    # the source really was staged as multiple files → multiple merges
    from nlp_data_pipeline_spark.scratch import scratch_path

    src = scratch_path(f"e17_src_{os.getpid()}")
    assert len(glob.glob(os.path.join(src, "part-*.parquet"))) == 4

    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    expect = {
        r.user_id: (r.event_id, int(r.ts.timestamp()))
        for r in load_table(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    assert got == expect


def test_watermark_evicts_window_state(spark):
    """The 100 TB streaming property none of the semantics tests pin:
    state-store rows must stay BOUNDED by the watermark, not grow with
    stream lifetime. Six hourly micro-batches stream one file per
    trigger; as the watermark advances, finalized tumbling windows must
    be EVICTED — the final batch's numRowsTotal holds only the open
    window(s), and numRowsRemoved fires along the way. Unbounded state
    (numRowsTotal == all windows ever) is the streaming scale killer."""
    import uuid

    base = tempfile.mkdtemp(prefix="stream_evict_")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    stream_dir = os.path.join(base, "stream")
    os.makedirs(stream_dir)
    n_hours = 6
    for i in range(n_hours):
        rows = [
            (i * 10 + j, datetime(2024, 1, 1, 8 + i, 5 * j, 0), 1, "click", 1.0, "{}")
            for j in range(3)
        ]
        sub = os.path.join(base, f"f{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(sub)
        _link_as_batch(sub, stream_dir, i)

    stream = read_events_stream(spark, stream_dir, max_files_per_trigger=1)
    agg = tumbling_counts(stream, window="1 hour", lateness="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName(f"evict_{uuid.uuid4().hex[:8]}")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish within 120s"
    progresses = [p for p in q.recentProgress if p["stateOperators"]]
    assert progresses, "no stateful progress recorded"
    final_rows = progresses[-1]["stateOperators"][0]["numRowsTotal"]
    removed = sum(p["stateOperators"][0]["numRowsRemoved"] for p in progresses)
    # 6 hourly windows passed through; bounded state = far fewer rows
    # than windows-ever at the end, and eviction actually fired.
    assert final_rows <= 2, f"state not bounded by watermark: {final_rows} rows"
    assert removed >= n_hours - 2, f"eviction barely fired: removed={removed}"


def test_watermark_evicts_stream_stream_join_state(spark):
    """Companion to the window-state pin, for the OTHER state store:
    stream_stream_purchase_attribution's docstring claims a buffered
    signup is evicted once the watermark passes signup_ts + max_gap —
    measure it. Six hourly micro-batches (one signup + one purchase
    each) with a 30-minute join horizon: by end-of-stream the join
    state must hold only the horizon's worth of rows, not all 12
    buffered events, and numRowsRemoved must have fired."""
    import uuid

    from nlp_data_pipeline_spark.streaming.pipelines import (
        stream_stream_purchase_attribution,
    )

    base = tempfile.mkdtemp(prefix="stream_ssj_evict_")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    stream_dir = os.path.join(base, "stream")
    os.makedirs(stream_dir)
    n_hours = 6
    for i in range(n_hours):
        rows = [
            (i * 10 + 1, datetime(2024, 1, 1, 8 + i, 0, 0), i, "signup", 1.0, "{}"),
            (i * 10 + 2, datetime(2024, 1, 1, 8 + i, 10, 0), i, "purchase", 1.0, "{}"),
        ]
        sub = os.path.join(base, f"f{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(sub)
        _link_as_batch(sub, stream_dir, i)

    stream = read_events_stream(spark, stream_dir, max_files_per_trigger=1)
    joined = stream_stream_purchase_attribution(stream, max_gap="30 minutes")
    q = (
        joined.writeStream.format("memory")
        .queryName(f"ssj_evict_{uuid.uuid4().hex[:8]}")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish within 120s"
    # every purchase found its same-hour signup despite the evictions
    assert spark.table(q.name).count() == n_hours
    progresses = [p for p in q.recentProgress if p["stateOperators"]]
    assert progresses, "no stateful progress recorded"
    final_rows = progresses[-1]["stateOperators"][0]["numRowsTotal"]
    removed = sum(p["stateOperators"][0]["numRowsRemoved"] for p in progresses)
    assert final_rows <= 4, f"join state not bounded by horizon: {final_rows} rows"
    assert removed >= 2 * (n_hours - 2), f"eviction barely fired: removed={removed}"
