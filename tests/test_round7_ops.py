"""Round-7 operator tests: t38 BPE encode (fixed-chain, driver-visible)
and the sentinel-replace ≡ greedy-fold equivalence that its oracle and
fast path both rely on."""

import duckdb
import pytest
from pyspark.sql import functions as F

from nlp_data_pipeline_spark.operators.text_analytics import (
    _T38_MERGES,
    T38_SQL,
    t38_bpe_encode,
)


def _py_greedy_merge(word: str, merges) -> list[str]:
    """Reference BPE application: per merge, one leftmost-first
    non-overlapping pass where the just-created symbol never fuses as
    the LEFT side within the same pass (the fused-flag convention)."""
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


# words chosen to hit every tricky case: overlap runs (aaa/aaaa with an
# (a,a)-style self-merge), chain merges (t+h then th+e), boundary
# non-matches (xt•h must NOT merge inside), and merge-output re-matching
TRICKY = ["aaa", "aaaa", "ththx", "xth", "the", "then", "and", "rere", "onon"]


@pytest.mark.parametrize("merges", [[("a", "a")], _T38_MERGES])
def test_t38_sentinel_replace_equals_fold(spark, merges):
    """The sentinel-string replace chain (Spark fast path AND DuckDB
    oracle) must equal the explicit greedy fold on every tricky word."""
    df = spark.createDataFrame([(w,) for w in TRICKY], ["w"])
    s = F.regexp_replace("w", r"(\S)", "‹$1›")
    for a, b in merges:
        s = F.replace(s, F.lit(f"‹{a}›‹{b}›"), F.lit(f"‹{a}{b}›"))
    got = {
        r["w"]: r["toks"]
        for r in df.select(
            "w", F.split(F.replace(s, F.lit("›"), F.lit("")), "‹").alias("toks")
        ).collect()
    }
    for w in TRICKY:
        want = _py_greedy_merge(w, merges)
        assert got[w][1:] == want, (w, merges, got[w][1:], want)  # [0]=''


def test_t38_matches_duckdb_oracle(spark, sf_dir):
    """Driver-style comparison: the fixed-8-merge encode query vs its
    closed-form nested-replace DuckDB oracle."""
    got = [tuple(r) for r in t38_bpe_encode(spark, sf_dir).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = [tuple(r) for r in con.execute(T38_SQL).fetchall()]
    assert len(got) > 0 and got == want


def test_t38_compression_sane(spark, sf_dir):
    """Merging can only shrink token counts: chars >= tokens >= chars/2
    per doc for a chain of 2-symbol merges applied once each."""
    rows = t38_bpe_encode(spark, sf_dir).collect()
    for r in rows:
        assert r["n_bpe_tokens"] <= r["n_chars_in_words"]
        assert r["chars_per_token"] >= 1.0 or r["n_bpe_tokens"] == 0


def _duck(sf_dir, views=("documents", "orders", "embeddings")):
    con = duckdb.connect()
    for v in views:
        con.execute(
            f"CREATE VIEW {v} AS SELECT * FROM read_parquet('{sf_dir}/{v}.parquet')"
        )
    return con


def test_q43_matches_duckdb_oracle(spark, sf_dir):
    """q43 DataFrame groupingSets API is STAGED for round-8 declaration;
    this runs the driver-style comparison now (order-insensitive: the
    engines order NULL grouping keys differently within gid ties)."""
    from nlp_data_pipeline_spark.operators.relational_ext import Q43_SQL, q43_grouping_sets

    key = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    got = sorted((tuple(r) for r in q43_grouping_sets(spark, sf_dir).collect()), key=key)
    want = sorted((tuple(r) for r in _duck(sf_dir).execute(Q43_SQL).fetchall()), key=key)
    assert len(got) > 0 and got == want
    # all four grouping sets present: gid 0 (both), two partials, total
    assert {r[2] for r in got} == {0, 1, 2, 3}


def test_s15_matches_duckdb_oracle(spark, sf_dir):
    """s15 reciprocal-rank fusion is STAGED for round-8 declaration;
    the RRF of the cosine and inner-product rankings must match the
    closed-form oracle exactly."""
    from nlp_data_pipeline_spark.operators.similarity import S15_SQL, s15_rrf_fusion

    got = [tuple(r) for r in s15_rrf_fusion(spark, sf_dir).collect()]
    want = [tuple(r) for r in _duck(sf_dir).execute(S15_SQL).fetchall()]
    assert len(got) > 0 and got == want


def test_s15_fuses_distinct_rankings(spark, sf_dir):
    """full-dim and truncated-dim rankings must genuinely disagree in
    the fused top-k (otherwise the fusion is vacuous on this corpus —
    the unit-norm embeddings make cosine ≡ inner product, which is why
    the second ranker is the truncated view, not IP)."""
    from nlp_data_pipeline_spark.operators.similarity import s15_rrf_fusion

    rows = s15_rrf_fusion(spark, sf_dir).collect()
    assert any(r["r_full"] != r["r_trunc"] for r in rows)


def test_d15_matches_duckdb_oracle(spark, sf_dir):
    """d15 blocked edit-distance pairs is STAGED for round-8
    declaration; blocking + Levenshtein must match the oracle."""
    from nlp_data_pipeline_spark.operators.dedup import D15_SQL, d15_fuzzy_prefix_pairs

    got = [tuple(r) for r in d15_fuzzy_prefix_pairs(spark, sf_dir).collect()]
    want = [tuple(r) for r in _duck(sf_dir).execute(D15_SQL).fetchall()]
    assert len(got) > 0 and got == want


def test_d15_hot_block_capped(spark, monkeypatch):
    """With the block cap forced to 1 every block collapses to a single
    doc, so the pair join must return zero rows — a boilerplate leading
    token can never contribute block² pairs."""
    from nlp_data_pipeline_spark.operators import dedup

    monkeypatch.setattr(dedup, "_D15_MAX_BLOCK", 1)
    assert dedup.d15_fuzzy_prefix_pairs(spark, "/root/testdata/sf0.001").count() == 0


def test_s16_matches_duckdb_oracle(spark, sf_dir):
    """s16 graph ANN is STAGED for round-8 declaration; the declared
    surface is the s08-style audit: every query finds k results from
    the fixed entry point with recall@k over threshold."""
    from nlp_data_pipeline_spark.operators.similarity import S16_SQL, s16_graph_ann_recall

    got = [tuple(r) for r in s16_graph_ann_recall(spark, sf_dir).collect()]
    want = [tuple(r) for r in _duck(sf_dir).execute(S16_SQL).fetchall()]
    assert len(got) > 0 and got == want


def test_s16_graph_is_undirected_m_regular(spark):
    """Every node has >= M out-edges (M exact + merged reverse links)
    and the edge set is symmetric — the NSW property greedy search
    relies on to escape clusters."""
    from pyspark.sql import functions as F

    from nlp_data_pipeline_spark.operators.similarity import GRAPH_M, _knn_graph

    g = _knn_graph(spark, "/root/testdata/sf0.001").cache()
    deg = g.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    assert deg.filter(F.col("d") < GRAPH_M).count() == 0
    rev = g.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    assert g.exceptAll(rev).count() == 0
