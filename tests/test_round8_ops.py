"""Round-8 operator tests: batched distributed-BPE training (the
one-Spark-round-per-merge fix) and subsequent round-8 additions."""

import pytest
from pyspark.sql import functions as F  # noqa: F401 (fixture parity with siblings)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "source string, text string").select(
        F.monotonically_increasing_id().alias("doc_id"), "source", "text"
    )


def _word_freqs_from_corpus(sf_dir):
    import duckdb

    from nlp_data_pipeline_spark.operators.text_analytics import _CLEAN_SQL

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(
        f"""SELECT word, COUNT(*) FROM (
              SELECT unnest(string_split({_CLEAN_SQL}, ' ')) AS word FROM documents
            ) WHERE length(word) >= 2 GROUP BY word"""
    ).fetchall()


def _apply_merge(words, a, b):
    """Greedy-left non-overlapping application of one merge to the
    word-frequency state (the fused-flag convention)."""
    nxt = []
    for syms, f in words:
        out, fused = [], False
        for x in syms:
            if out and not fused and out[-1] == a and x == b:
                out[-1] = a + b
                fused = True
            else:
                out.append(x)
                fused = False
        if len(out) >= 2:
            nxt.append((out, f))
    return nxt


def _pair_count(words, a, b):
    return sum(
        f
        for syms, f in words
        for i in range(len(syms) - 1)
        if syms[i] == a and syms[i + 1] == b
    )


def test_bpe_train_batched_counts_are_exact(spark, sf_dir):
    """The batching contract: selection may deviate from strict
    sequential rank, but every RECORDED COUNT is exact — replaying the
    returned merges one-by-one through the pure-Python applier, each
    merge's pair count measured just before its own application equals
    the count the batched trainer recorded from the round's single
    aggregation (symbol-disjointness makes counts invariant within a
    round)."""
    from nlp_data_pipeline_spark.operators.text_analytics import bpe_train

    got = bpe_train(spark, sf_dir, n_merges=12, batch=6)
    assert len(got) == 12
    words = [
        ([c for c in w], f) for w, f in _word_freqs_from_corpus(sf_dir) if len(w) >= 2
    ]
    for a, b, cnt in got:
        assert _pair_count(words, a, b) == cnt, (a, b)
        words = _apply_merge(words, a, b)


def test_bpe_train_batch_is_symbol_disjoint_per_round(spark, monkeypatch):
    """Within one round the batch must skip pairs sharing a symbol with
    an already-selected pair: corpus 'abc' has equal-count (a,b) and
    (b,c); batch=2 may take only (a,b) in round 1 (b is used), leaving
    round 2 to pick (ab,c) on the merged state."""
    import nlp_data_pipeline_spark.operators.text_analytics as ta

    rows = [("src", "abc abc abc")]
    monkeypatch.setattr(ta, "load_table", lambda s, d, n: _docs(spark, rows))
    merges = ta.bpe_train(spark, "ignored", n_merges=2, batch=2)
    assert [m[:2] for m in merges] == [("a", "b"), ("ab", "c")]
    assert [m[2] for m in merges] == [3, 3]


def test_bpe_train_batch1_equals_sequential(spark, sf_dir):
    """batch=1 is byte-identical to the default sequential path."""
    from nlp_data_pipeline_spark.operators.text_analytics import bpe_train

    assert bpe_train(spark, sf_dir, n_merges=4) == bpe_train(
        spark, sf_dir, n_merges=4, batch=1
    )
