"""Round-5 operators: t28 repetition filter, t29 sequence packing."""

import pyspark.sql.functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "srcA", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_t28_flags_repetitive_document(spark, tmp_path, monkeypatch):
    import nlp_data_pipeline_spark.operators.text_analytics as ta

    rows = [
        # one token is ~100% of the doc → top_token_frac 1.0 → drop
        "spam spam spam spam spam spam",
        # varied vocabulary → keep
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet",
    ]
    monkeypatch.setattr(ta, "load_table", lambda s, d, n: _docs(spark, rows))
    out = {r.doc_id: r for r in ta.t28_repetition_filter(spark, "ignored").collect()}
    assert out[0].top_token_frac == 1.0
    assert out[0].top_bigram_frac == 1.0  # "spam spam" is every bigram
    assert not out[0].keep
    assert out[1].dup_token_frac == 0.0
    assert out[1].keep


def test_t29_packing_is_contiguous_per_source(spark, sf_dir):
    from nlp_data_pipeline_spark.operators.text_analytics import (
        _T29_SEQ_LEN,
        t29_sequence_packing,
    )

    df = t29_sequence_packing(spark, sf_dir)
    rows = df.collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for source, docs in by_source.items():
        docs.sort(key=lambda r: r.doc_id)
        off = 0
        for r in docs:
            # concatenation: each doc starts where the previous ended
            assert r.start_off == off
            off += r.n_tokens
            assert r.first_pack == r.start_off // _T29_SEQ_LEN
            if r.n_tokens:
                assert r.last_pack == (r.start_off + r.n_tokens - 1) // _T29_SEQ_LEN
            assert r.spans_boundary == (r.last_pack > r.first_pack)
    # cross-source independence: every source's offsets start at zero
    assert all(docs[0].start_off == 0 for docs in by_source.values())


def test_d12_no_near_dup_straddles_splits(spark, sf_dir):
    """The whole point: both ends of every LSH candidate pair (and by
    transitivity every near-dup cluster) land in the SAME split."""
    from nlp_data_pipeline_spark.operators.dedup import (
        d03_lsh_candidate_pairs,
        d12_leakage_safe_split,
    )

    split = {r.doc_id: r.split for r in d12_leakage_safe_split(spark, sf_dir).collect()}
    pairs = d03_lsh_candidate_pairs(spark, sf_dir).collect()
    assert pairs, "fixture must contain near-dup pairs for this test to bite"
    for p in pairs:
        assert split[p.doc_a] == split[p.doc_b]
    # sanity on the 80/10/10 md5 bucketing: all three splits non-empty
    from collections import Counter

    frac = Counter(split.values())
    assert set(frac) == {"train", "val", "test"}
    assert frac["train"] > frac["val"] and frac["train"] > frac["test"]


def test_e14_emits_exactly_watermark_closed_sessions(spark, sf_dir):
    """Append-mode session windows: emitted = batch sessions whose end
    (last event + gap) precedes the final watermark (max ts − 10 min);
    sessions still open at the horizon stay in state and never emit."""
    from nlp_data_pipeline_spark.operators.events import (
        e02_session_windows,
        e14_streaming_session_finalized,
    )

    batch = e02_session_windows(spark, sf_dir).collect()
    max_ts = max(r.session_end for r in batch)  # end = last ts + 30 min
    import datetime

    wm = max_ts - datetime.timedelta(minutes=30) - datetime.timedelta(minutes=10)
    expected = {
        (r.user_id, r.session_start): r.n_events
        for r in batch
        if r.session_end <= wm
    }
    got = {
        (r.user_id, r.session_start): r.n_events
        for r in e14_streaming_session_finalized(spark, sf_dir).collect()
    }
    assert got == expected
    assert len(expected) < len(batch)  # the horizon actually bites


def test_t30_novelty_bounds_and_unique_doc(spark, tmp_path, monkeypatch):
    import nlp_data_pipeline_spark.operators.text_analytics as ta

    rows = [
        "alpha bravo alpha bravo alpha bravo alpha bravo",  # one repeated bigram
        "unique1 unique2 unique3 unique4 unique5",          # all bigrams unique
    ]
    monkeypatch.setattr(ta, "load_table", lambda s, d, n: _docs(spark, rows))
    out = {r.doc_id: r for r in ta.t30_lm_novelty_score(spark, "ignored").collect()}
    # doc 1's bigrams occur nowhere else → novelty 1.0 and P=1 → 0 bits
    assert out[1].novelty_frac == 1.0
    assert out[1].avg_nll_bits == 0.0
    # doc 0 repeats (alpha,bravo) 4x and (bravo,alpha) 3x → nothing unique
    assert out[0].novelty_frac == 0.0
    assert out[0].n_bigrams == 7
    # predictable text scores strictly fewer bits than 'surprising' is bounded by
    assert 0.0 <= out[0].avg_nll_bits <= 1.0


def test_s11_adc_ranks_complete_and_sane(spark, sf_dir):
    from nlp_data_pipeline_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        s11_pq_adc_search,
    )

    rows = s11_pq_adc_search(spark, sf_dir).collect()
    assert len(rows) == N_QUERIES * TOP_K
    by_q: dict[int, list] = {}
    for r in rows:
        assert r.adc_d2 >= 0.0 and r.exact_d2 >= 0.0
        assert r.vec_id != r.query_id
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        assert sorted(r.adc_rank for r in rs) == list(range(1, TOP_K + 1))
        # ranks follow ADC distance monotonically
        rs.sort(key=lambda r: r.adc_rank)
        assert all(a.adc_d2 <= b.adc_d2 for a, b in zip(rs, rs[1:]))


def test_r08_custom_source_partitions_per_shard(spark, sf_dir):
    """The Python DataSource fans out one input partition per staged
    shard — the property that makes the custom scan parallel."""
    import glob
    import os

    from nlp_data_pipeline_spark.operators.doc_pipeline import (
        r08_python_datasource,
    )
    from nlp_data_pipeline_spark.scratch import scratch_path
    from nlp_data_pipeline_spark.sources.custom_datasource import DocStatsDataSource

    r08_python_datasource(spark, sf_dir).collect()  # stages + registers
    # per-process stage dir under the per-user scratch root
    stage = scratch_path(f"docstats_{os.getpid()}")
    n_shards = len(glob.glob(os.path.join(stage, "part-*")))
    assert n_shards == 8
    df = spark.read.format("docstats").load(stage)
    assert df.rdd.getNumPartitions() == n_shards
    assert df.count() == spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).count()


def test_t29_no_global_single_partition_window(spark, sf_dir):
    """Packing windows are per source shard; a global total order would
    plan an Exchange SinglePartition — the one shape that cannot scale."""
    from nlp_data_pipeline_spark.operators.text_analytics import t29_sequence_packing

    plan = (
        t29_sequence_packing(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan


def test_s11_model_tables_broadcast(spark, sf_dir):
    """Codebooks and per-query distance tables are tiny model state:
    every join against them must broadcast, never shuffle the corpus."""
    from nlp_data_pipeline_spark.operators.similarity import s11_pq_adc_search

    plan = (
        s11_pq_adc_search(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_t28_single_scan_plan(spark, sf_dir):
    """The gram union must not re-tokenize the corpus per signal."""
    from nlp_data_pipeline_spark.operators.text_analytics import (
        t28_repetition_filter,
    )

    plan = (
        t28_repetition_filter(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("documents.parquet") == 1
