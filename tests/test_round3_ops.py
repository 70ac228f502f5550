"""Round-3 session-3 operator invariants: mixture weights (t26),
unigram entropy (t27), span dedup (d11), PQ encoding (s10), audio
chunking (m06), partition overwrite (r07), composite-key stateful
counters (e13), and the protobuf gate on transformWithState.
Cross-engine value equality is the oracle's job (tools/
check_oracle.py); these pin semantic invariants the hash can't."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F


def test_t26_weights_rebalance_to_uniform(spark, sf_dir):
    from nlp_data_pipeline_spark.operators.text_analytics import t26_mixture_weights

    rows = t26_mixture_weights(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-4
    # weight × share = uniform target for every source
    target = 1.0 / len(rows)
    for r in rows:
        assert abs(r["mix_weight"] * r["token_share"] - target) < 1e-4


def test_t27_entropy_bounds(spark, sf_dir):
    from nlp_data_pipeline_spark.operators.text_analytics import t27_unigram_entropy

    rows = t27_unigram_entropy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_distinct"] <= r["n_tokens"]
        assert -1e-9 <= r["entropy_bits"] <= math.log2(max(r["n_distinct"], 2)) + 1e-6


def test_d11_duplicate_doc_spans_removed(spark, sf_dir):
    """An exact duplicate document shares every span hash, so the copy
    with the higher doc_id must have ALL its spans marked removed."""
    from nlp_data_pipeline_spark.operators.dedup import _SPAN_W, d11_span_dedup_plan
    from nlp_data_pipeline_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    dup = d.filter(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    import tempfile, os, shutil

    tmp = tempfile.mkdtemp(prefix="d11_dup_")
    for name in ("documents", "region", "nation", "customer", "supplier",
                 "part", "orders", "lineitem", "events", "embeddings"):
        src = os.path.join(sf_dir, f"{name}.parquet")
        if name == "documents":
            d.unionByName(dup).write.parquet(os.path.join(tmp, "documents.parquet"))
        elif os.path.exists(src):
            dst = os.path.join(tmp, f"{name}.parquet")
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                os.symlink(src, dst)
    rows = {r["doc_id"]: r for r in d11_span_dedup_plan(spark, tmp).collect()}
    base = rows.get(0)
    copy = rows.get(1_000_000)
    if base is None:
        pytest.skip(f"doc 0 shorter than one span window (W={_SPAN_W})")
    assert copy is not None
    assert copy["n_spans"] == base["n_spans"]
    assert copy["n_removed"] == copy["n_spans"]  # keeper is the lower doc_id
    assert copy["removed_frac"] == 1.0
    assert base["n_dup_spans"] == base["n_spans"]
    assert base["n_removed"] == 0


def test_d11_counts_consistent(spark, sf_dir):
    from nlp_data_pipeline_spark.operators.dedup import d11_span_dedup_plan

    for r in d11_span_dedup_plan(spark, sf_dir).collect():
        assert 0 <= r["n_removed"] <= r["n_dup_spans"] <= r["n_spans"]


def test_s10_codebook_vectors_self_quantize(spark, sf_dir):
    from nlp_data_pipeline_spark.operators.similarity import PQ_K, PQ_M, s10_pq_encode

    rows = {r["vec_id"]: r for r in s10_pq_encode(spark, sf_dir).collect()}
    # every codebook vector is its own nearest codeword in every subspace
    for v in range(PQ_K):
        assert rows[v]["pq_code"] == "-".join([str(v)] * PQ_M)
        assert rows[v]["quant_sq_err"] == 0.0
    # non-codebook vectors have strictly positive quantization error
    non_code = [r for vid, r in rows.items() if vid >= PQ_K]
    assert non_code and all(r["quant_sq_err"] > 0 for r in non_code)


def test_m06_chunk_checksum_matches_python(spark, sf_dir):
    from nlp_data_pipeline_spark.operators.multimodal import (
        CHUNK_BYTES,
        CHUNK_STRIDE,
        m06_audio_chunk_checksums,
    )
    from nlp_data_pipeline_spark.sources.catalog import load_table

    doc = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") >= CHUNK_BYTES)
        .orderBy("doc_id")
        .first()
    )
    payload = doc["text"].encode("utf-8")
    rows = [
        r
        for r in m06_audio_chunk_checksums(spark, sf_dir).collect()
        if r["doc_id"] == doc["doc_id"]
    ]
    n_expected = (len(payload) - CHUNK_BYTES) // CHUNK_STRIDE + 1
    assert len(rows) == n_expected
    for r in rows:
        chunk = payload[r["byte_start"] : r["byte_start"] + CHUNK_BYTES]
        expect = hashlib.sha256(chunk.hex().encode()).hexdigest()
        assert r["chunk_sha256"] == expect


def test_r07_restates_exactly_one_day(spark, sf_dir):
    from nlp_data_pipeline_spark.operators.doc_pipeline import r07_partition_overwrite
    from nlp_data_pipeline_spark.sources.catalog import load_table

    got = {r["day"]: r for r in r07_partition_overwrite(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").cast("string").alias("day"), "value"
    )
    base = {
        r["day"]: r
        for r in ev.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("tv"),
        )
        .collect()
    }
    assert set(got) == set(base)
    first = min(base)
    for day, r in got.items():
        assert r["n_events"] == base[day]["n_events"]  # replaced, not appended
        factor = 2.0 if day == first else 1.0
        assert abs(r["total_value"] - base[day]["tv"] * factor) < 0.01


def test_transform_with_state_gate_or_runs(spark, sf_dir):
    """The Spark 4 transformWithState path needs google.protobuf.

    Without protobuf (this container) the gate must fail loudly, not
    crash mid-query. WITH protobuf (a real cluster image) the same test
    runs the query end-to-end and checks it against the batch counts —
    so the Spark-4 state API stays exercised automatically wherever the
    dependency exists, no manual opt-in.
    """
    import os
    import tempfile

    from nlp_data_pipeline_spark.streaming.pipelines import (
        transform_with_state_type_counts,
    )

    try:
        import google.protobuf  # noqa: F401

        have_protobuf = True
    except ImportError:
        have_protobuf = False

    src = tempfile.mkdtemp(prefix="tws_gate_")
    rows = [(1, "a", 1.0), (1, "a", 2.0), (1, "b", 3.0), (2, "a", 4.0)]
    spark.createDataFrame(
        rows, "user_id long, event_type string, value double"
    ).write.parquet(os.path.join(src, "in"))
    stream = (
        spark.readStream.schema("user_id long, event_type string, value double")
        .parquet(os.path.join(src, "in"))
    )
    if not have_protobuf:
        with pytest.raises(NotImplementedError, match="protobuf"):
            transform_with_state_type_counts(stream)
        return

    from nlp_data_pipeline_spark.streaming.pipelines import run_to_memory_sink

    _, out = run_to_memory_sink(
        transform_with_state_type_counts(stream), output_mode="update"
    )
    got = {(r.user_id, r.event_type): r.n_events for r in out.collect()}
    assert got == {(1, "a"): 2, (1, "b"): 1, (2, "a"): 1}
