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


def test_d16_matches_duckdb_oracle(spark, sf_dir):
    """d16 content-defined chunking is STAGED for round-9 declaration;
    the per-doc chunk stats must match the identical rolling-hash
    boundary rule restated in DuckDB list expressions."""
    from nlp_data_pipeline_spark.operators.dedup import D16_SQL, d16_cdc_chunks

    got = [tuple(r) for r in d16_cdc_chunks(spark, sf_dir).collect()]
    want = [tuple(r) for r in _duck(sf_dir).execute(D16_SQL).fetchall()]
    assert len(got) > 0 and got == want


def test_d16_boundaries_resync_after_edit(spark):
    """The CDC property fixed-width spans lack: prepending a char to a
    document shifts only the FIRST chunk — every boundary after the
    window re-synchronizes, so all later chunk lengths are preserved.
    (Fixed spans would shift every chunk and defeat chunk-level dedup.)"""
    import random

    from nlp_data_pipeline_spark.operators.dedup import _D16_DIV, _D16_W
    from nlp_data_pipeline_spark.operators.text_analytics import _MOD

    rng = random.Random(42)
    text = "".join(rng.choice("abcdefgh ") for _ in range(4000))
    edited = "Z" + text

    def chunks(s):
        h, bounds = [], [0]
        for i in range(_D16_W, len(s) + 1):
            acc = 0
            for c in s[i - _D16_W : i]:
                acc = (acc * 31 + ord(c)) % _MOD
            if acc % _D16_DIV == 0:
                bounds.append(i)
        bounds.append(len(s))
        return [b - a for a, b in zip(bounds, bounds[1:]) if b > a]

    base, shifted = chunks(text), chunks(edited)
    assert len(base) > 10  # the rule actually fires on this corpus
    # every chunk after the first edited one is identical
    assert base[1:] == shifted[1 + (len(shifted) - len(base)) :]


def test_v13_matches_duckdb_oracle(spark, sf_dir):
    """v13 SQL scripting is STAGED for round-9 declaration; the WHILE
    fixpoint must equal the closed-form first-threshold-under-100 over
    the pow(2) series."""
    from nlp_data_pipeline_spark.operators.sql_api import V13_SQL, v13_sql_scripting

    got = [tuple(r) for r in v13_sql_scripting(spark, sf_dir).collect()]
    want = [tuple(r) for r in _duck(sf_dir).execute(V13_SQL).fetchall()]
    assert len(got) == 1 and got == want


def test_v14_matches_duckdb_oracle(spark, sf_dir):
    """v14 pandas API on Spark is STAGED for round-9 declaration; the
    ps.DataFrame groupby-agg must equal the plain SQL aggregate."""
    from nlp_data_pipeline_spark.operators.sql_api import V14_SQL, v14_pandas_api

    got = [tuple(r) for r in v14_pandas_api(spark, sf_dir).collect()]
    want = [tuple(r) for r in _duck(sf_dir).execute(V14_SQL).fetchall()]
    assert len(got) > 0 and got == want


def test_v14_plans_distributed(spark, sf_dir):
    """The pandas-API groupby must compile to an ordinary distributed
    hash aggregate — no driver-side collect hiding in the front door."""
    from nlp_data_pipeline_spark.operators.sql_api import v14_pandas_api

    plan = v14_pandas_api(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan or "SortAggregate" in plan


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


def test_s16_nnd_graph_approximates_exact(spark):
    """The linear-cost NN-descent build (s16's index path) must stay a
    faithful stand-in for the exact tile-grid graph: symmetric, every
    node reachable as a source, deterministic across builds (the
    declared s16 hash rides on it), and sharing the large majority of
    the exact graph's edges (measured 96.5% at sf0.001; the navigation
    cross-links account for the extra edges beyond the exact set)."""
    from pyspark.sql import functions as F

    from nlp_data_pipeline_spark.operators.similarity import (
        _knn_graph,
        _knn_graph_nnd,
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    g = _knn_graph_nnd(spark, sf).cache()
    rev = g.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    assert g.exceptAll(rev).count() == 0
    n_nodes = load_table(spark, sf, "embeddings").count()
    assert g.select("src").distinct().count() == n_nodes
    exact = _knn_graph(spark, sf).cache()
    overlap = g.intersect(exact).count() / exact.count()
    assert overlap >= 0.80
    g2 = _knn_graph_nnd(spark, sf)
    assert g.exceptAll(g2).count() == 0 and g2.exceptAll(g).count() == 0


def test_s17_matches_duckdb_oracle(spark, sf_dir):
    """s17 one-step Lloyd refinement is STAGED for round-9 declaration;
    assignment sizes, switch counts, and mean cosine must match the
    identical seed/assign/mean/re-assign chain restated in DuckDB."""
    from nlp_data_pipeline_spark.operators.similarity import S17_SQL, s17_kmeans_refine

    got = [tuple(r) for r in s17_kmeans_refine(spark, sf_dir).collect()]
    want = [tuple(r) for r in _duck(sf_dir).execute(S17_SQL).fetchall()]
    assert len(got) > 0 and got == want
    # Lloyd invariants: both assignments cover the whole corpus, and
    # the refinement actually moved some vectors (non-degenerate seeds)
    n = sum(r[1] for r in got)
    assert n == sum(r[2] for r in got)
    assert sum(r[3] for r in got) > 0


def test_v15_matches_duckdb_oracle(spark, sf_dir):
    """v15 SQL session variables is STAGED for round-9 declaration; the
    DECLARE/SET VAR threshold query must equal the subquery-inlined
    restatement."""
    from nlp_data_pipeline_spark.operators.sql_api import V15_SQL, v15_sql_variables

    got = [tuple(r) for r in v15_sql_variables(spark, sf_dir).collect()]
    want = [tuple(r) for r in _duck(sf_dir).execute(V15_SQL).fetchall()]
    assert len(got) > 0 and got == want


def test_u06_matches_duckdb_oracle(spark, sf_dir):
    """u06 cogrouped-pandas as-of attribution is STAGED for round-9
    declaration; the per-user merge_asof must equal the correlated
    max-prior-purchase restatement."""
    from nlp_data_pipeline_spark.operators.relational_ext import (
        U06_SQL,
        u06_cogrouped_attribution,
    )

    got = [tuple(r) for r in u06_cogrouped_attribution(spark, sf_dir).collect()]
    want = [
        tuple(r)
        for r in _duck(sf_dir, views=("events",)).execute(U06_SQL).fetchall()
    ]
    assert len(got) > 0 and got == want
    # the 24h tolerance actually bites: some clicks must be unattributed
    assert any(r[1] > r[2] for r in got)
    assert any(r[2] > 0 for r in got)


def test_r15_matches_duckdb_oracle(spark, sf_dir):
    """r15 Python streaming data source is STAGED for round-9
    declaration; draining the docfeed stream and re-aggregating must
    reproduce the batch aggregate of the documents table exactly."""
    from nlp_data_pipeline_spark.operators.doc_pipeline import (
        R15_SQL,
        r15_python_stream_source,
    )

    got = [tuple(r) for r in r15_python_stream_source(spark, sf_dir).collect()]
    want = [tuple(r) for r in _duck(sf_dir).execute(R15_SQL).fetchall()]
    assert len(got) > 0 and got == want


def test_r16_matches_duckdb_oracle(spark, sf_dir):
    """r16 Python streaming SINK is STAGED for round-9 declaration;
    the stream-write → batch-read round trip through the docshards/
    docstats pair must reproduce the source-table aggregate exactly."""
    from nlp_data_pipeline_spark.operators.doc_pipeline import (
        R16_SQL,
        r16_python_stream_sink,
    )

    got = [tuple(r) for r in r16_python_stream_sink(spark, sf_dir).collect()]
    want = [tuple(r) for r in _duck(sf_dir).execute(R16_SQL).fetchall()]
    assert len(got) > 0 and got == want


def test_u07_matches_duckdb_oracle(spark, sf_dir):
    """u07 mapInArrow batch kernel is STAGED for round-9 declaration;
    per-vector norm/max-abs/positive-count must match the DuckDB list
    expressions."""
    from nlp_data_pipeline_spark.operators.relational_ext import (
        U07_SQL,
        u07_map_in_arrow,
    )

    got = [tuple(r) for r in u07_map_in_arrow(spark, sf_dir).collect()]
    want = [tuple(r) for r in _duck(sf_dir).execute(U07_SQL).fetchall()]
    assert len(got) > 0 and got == want


def test_v16_matches_duckdb_oracle(spark, sf_dir):
    """v16 polymorphic UDTF is STAGED for round-9 declaration; the
    analyze()-derived two-column parse must equal split_part."""
    from nlp_data_pipeline_spark.operators.sql_api import V16_SQL, v16_polymorphic_udtf

    got = [tuple(r) for r in v16_polymorphic_udtf(spark, sf_dir).collect()]
    want = [tuple(r) for r in _duck(sf_dir).execute(V16_SQL).fetchall()]
    assert len(got) > 0 and got == want


def test_v16_schema_tracks_constant_width(spark, sf_dir):
    """The polymorphic property itself: calling lead_tokens with k=4
    plans four columns — the output schema is decided by analyze()
    from the call-site constant, not fixed at registration."""
    from nlp_data_pipeline_spark.operators.sql_api import v16_polymorphic_udtf

    v16_polymorphic_udtf(spark, sf_dir)  # registers lead_tokens + view
    wide = spark.sql(
        "SELECT t.* FROM v16_cleaned_docs d, LATERAL lead_tokens(d.ctext, 4) t"
    )
    assert wide.columns == ["tok1", "tok2", "tok3", "tok4"]


def test_r16_commit_idempotent_under_replay(tmp_path):
    """The exactly-once claim of the docshards streaming sink: a
    replayed micro-batch (same batchId after a restart between
    sink-commit and offset-commit) re-renames over the SAME shard
    names, so the landed directory never double-counts."""
    import csv
    import os

    from nlp_data_pipeline_spark.sources.custom_datasource import (
        DocShardsStreamWriter,
        _ShardCommit,
    )

    sink = str(tmp_path / "shards")
    w = DocShardsStreamWriter(sink)

    def run_batch():
        os.makedirs(sink, exist_ok=True)
        msgs = []
        for rows in ([(1, "a", 10)], [(2, "b", 20), (3, "a", 30)]):
            tmp = os.path.join(sink, f"_tmp-{len(msgs)}-{len(rows)}.tsv")
            with open(tmp, "w", newline="") as fh:
                csv.writer(fh, delimiter="\t").writerows(rows)
            msgs.append(_ShardCommit(tmp_path=tmp, n_rows=len(rows)))
        w.commit(msgs, batchId=0)

    run_batch()
    run_batch()  # the replay
    parts = sorted(os.listdir(sink))
    assert parts == ["part-b00000-00000.tsv", "part-b00000-00001.tsv"]
    rows = []
    for p in parts:
        with open(os.path.join(sink, p), newline="") as fh:
            rows += [tuple(r) for r in csv.reader(fh, delimiter="\t")]
    assert sorted(rows) == [("1", "a", "10"), ("2", "b", "20"), ("3", "a", "30")]


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.text(alphabet="abcdef .x9", min_size=0, max_size=300),
    )
    def test_d16_oracle_sql_matches_python_reference(text):
        """Independent check of the D16_SQL restatement: on an alphabet
        the cleaning pass only whitespace-normalizes, DuckDB's
        list_reduce rolling-hash boundary rule must agree with a plain
        Python reference for any input."""
        import re

        import duckdb

        from nlp_data_pipeline_spark.operators.dedup import _D16_DIV, _D16_W
        from nlp_data_pipeline_spark.operators.text_analytics import _MOD

        clean = re.sub(r"\s+", " ", text).strip()
        bounds = [0]
        for i in range(_D16_W, len(clean) + 1):
            acc = 0
            for c in clean[i - _D16_W : i]:
                acc = (acc * 31 + ord(c)) % _MOD
            if acc % _D16_DIV == 0:
                bounds.append(i)
        bounds.append(len(clean))
        lens = [b - a for a, b in zip(bounds, bounds[1:]) if b > a]
        exp = (
            len(lens),
            round(len(clean) / len(lens), 6) if lens else 0.0,
            max(lens) if lens else 0,
        )

        from nlp_data_pipeline_spark.operators.dedup import D16_SQL

        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT 0 AS doc_id, ? AS text", [text]
        )
        got = con.execute(D16_SQL).fetchall()
        assert len(got) == 1
        assert (got[0][1], got[0][2], got[0][3]) == exp
except ImportError:  # pragma: no cover - hypothesis is baked in here
    pass


def test_s18_matches_duckdb_oracle(spark, sf_dir):
    """s18 MMR diversified retrieval is STAGED for round-9 declaration;
    the unrolled 3-step greedy must select the identical picks in both
    engines (same fold dot product → bit-identical argmax)."""
    from nlp_data_pipeline_spark.operators.similarity import S18_SQL, s18_mmr_rerank

    got = [tuple(r) for r in s18_mmr_rerank(spark, sf_dir).collect()]
    want = [tuple(r) for r in _duck(sf_dir).execute(S18_SQL).fetchall()]
    assert len(got) > 0 and got == want


def test_s18_diversifies_vs_plain_topk(spark, sf_dir):
    """MMR must actually change the ranking: for at least one query the
    picked set differs from plain top-3 cosine (else the redundancy
    penalty is dead code on this corpus)."""
    from nlp_data_pipeline_spark.operators.similarity import (
        s01_cosine_topk,
        s18_mmr_rerank,
    )

    mmr = {}
    for r in s18_mmr_rerank(spark, sf_dir).collect():
        mmr.setdefault(r.query_id, set()).add(r.vec_id)
    top = {}
    for r in s01_cosine_topk(spark, sf_dir).collect():
        if r.nn_rank <= 3:
            top.setdefault(r.query_id, set()).add(r.vec_id)
    assert any(mmr[q] != top[q] for q in mmr)


def test_q44_matches_duckdb_oracle(spark, sf_dir):
    """q44 LISTAGG WITHIN GROUP is STAGED for round-9 declaration; the
    ordered string aggregation must equal DuckDB's string_agg ORDER BY
    spelling."""
    from nlp_data_pipeline_spark.operators.relational_ext import (
        Q44_SQL,
        q44_listagg_rollup,
    )

    got = [tuple(r) for r in q44_listagg_rollup(spark, sf_dir).collect()]
    want = [
        tuple(r)
        for r in _duck(sf_dir, views=("region", "nation", "customer"))
        .execute(Q44_SQL)
        .fetchall()
    ]
    assert len(got) > 0 and got == want


def test_a04_matches_duckdb_oracle(spark, sf_dir):
    """a04 approx_top_k is STAGED for round-9 declaration; below sketch
    capacity the heavy-hitters result must equal the exact top-3."""
    from nlp_data_pipeline_spark.operators.events import A04_SQL, a04_approx_top_k

    got = [tuple(r) for r in a04_approx_top_k(spark, sf_dir).collect()]
    want = [
        tuple(r) for r in _duck(sf_dir, views=("events",)).execute(A04_SQL).fetchall()
    ]
    assert len(got) == 3 and got == want
    assert all(r[3] for r in got)  # sketch exact below capacity


def test_s19_matches_duckdb_oracle(spark, sf_dir):
    """s19 PageRank on the kNN similarity graph is STAGED for round-9
    declaration; three unrolled power iterations over the BLAS-built
    graph must equal the quadratic SQL restatement for EVERY node."""
    from nlp_data_pipeline_spark.operators.similarity import S19_SQL, s19_pagerank

    got = [tuple(r) for r in s19_pagerank(spark, sf_dir).collect()]
    want = [tuple(r) for r in _duck(sf_dir).execute(S19_SQL).fetchall()]
    assert len(got) > 0 and got == want
    # rank mass is conserved up to damping leakage: mean centrality ~1
    mean_c = sum(r[2] for r in got) / len(got)
    assert 0.9 < mean_c <= 1.000001


def test_new_staged_plan_shapes(spark, sf_dir):
    """Plan-shape pins for the round-9 staged batch: u07 is a pure
    Arrow map (one MapInArrow, no row-at-a-time Python, the only
    exchange is the output sort), and s18's candidate generation
    broadcasts the query side (one corpus scan, no corpus shuffle for
    scoring)."""
    from nlp_data_pipeline_spark.operators.relational_ext import u07_map_in_arrow
    from nlp_data_pipeline_spark.operators.similarity import s18_mmr_rerank
    from nlp_data_pipeline_spark.plans.explain import formatted_plan

    p = formatted_plan(u07_map_in_arrow(spark, sf_dir))
    assert "MapInArrow" in p
    assert "BatchEvalPython" not in p
    # tree spelling "Exchange (n" counts each exchange once (the detail
    # section spells them "(n) Exchange"): only the output sort shuffles
    assert p.count("Exchange (") == 1

    # s18's localCheckpoint truncates the visible lineage at the
    # candidate relation, so the broadcast of its generation phase is
    # not inspectable here (s01's plan test covers that shape); pin
    # what IS visible — the rerank never leaves the JVM
    p = formatted_plan(s18_mmr_rerank(spark, sf_dir))
    assert "BatchEvalPython" not in p and "MapInPandas" not in p


def test_q45_matches_duckdb_oracle(spark, sf_dir):
    """q45 DataFrame.transpose is STAGED for round-9 declaration; the
    flipped metric table must equal the closed-form per-priority
    restatement (floats settled before the flip)."""
    from nlp_data_pipeline_spark.operators.relational_ext import (
        Q45_SQL,
        q45_transpose_metrics,
    )

    got = [tuple(r) for r in q45_transpose_metrics(spark, sf_dir).collect()]
    want = [
        tuple(r) for r in _duck(sf_dir, views=("orders",)).execute(Q45_SQL).fetchall()
    ]
    assert len(got) == 3 and got == want


def test_q46_matches_duckdb_oracle(spark, sf_dir):
    """q46 DataFrame.lateralJoin is STAGED for round-9 declaration; the
    correlated orderBy+limit subframe must equal the window-rank
    restatement (Catalyst decorrelates to the same plan)."""
    from nlp_data_pipeline_spark.operators.relational_ext import (
        Q46_SQL,
        q46_lateral_join_api,
    )

    got = [tuple(r) for r in q46_lateral_join_api(spark, sf_dir).collect()]
    want = [
        tuple(r)
        for r in _duck(sf_dir, views=("region", "nation", "customer"))
        .execute(Q46_SQL)
        .fetchall()
    ]
    assert len(got) > 0 and got == want


def test_m09_matches_duckdb_oracle(spark, sf_dir):
    """m09 pure-JVM WAV header parse is STAGED for round-10
    declaration; every little-endian field parsed back from the
    synthesized 44-byte header must equal its closed-form value."""
    from nlp_data_pipeline_spark.operators.multimodal import M09_SQL, m09_wav_header_parse

    got = [tuple(r) for r in m09_wav_header_parse(spark, sf_dir).collect()]
    want = [tuple(r) for r in _duck(sf_dir).execute(M09_SQL).fetchall()]
    assert len(got) > 0 and got == want
    assert all(r[1] for r in got)  # every header round-trips valid


def test_m09_stays_in_codegen(spark, sf_dir):
    """The header-sniff pass must never leave the JVM — that is its
    entire reason to exist beside m07's Python decoder."""
    from nlp_data_pipeline_spark.operators.multimodal import m09_wav_header_parse
    from nlp_data_pipeline_spark.plans.explain import formatted_plan

    p = formatted_plan(m09_wav_header_parse(spark, sf_dir))
    assert "BatchEvalPython" not in p and "MapInPandas" not in p
    assert "MapInArrow" not in p


def test_t39_matches_duckdb_oracle(spark, sf_dir):
    """t39 PMI collocations is STAGED for round-10 declaration; the
    association-ranked bigram list must match the two-aggregate SQL
    restatement (ordering on the ROUNDED pmi, which is cross-engine
    stable where raw log2 is not)."""
    from nlp_data_pipeline_spark.operators.text_analytics import (
        T39_SQL,
        t39_collocation_pmi,
    )

    got = [tuple(r) for r in t39_collocation_pmi(spark, sf_dir).collect()]
    want = [tuple(r) for r in _duck(sf_dir).execute(T39_SQL).fetchall()]
    assert len(got) > 0 and got == want
    # PMI must genuinely reorder vs raw frequency: the top-PMI bigram
    # is not the most frequent one on this corpus
    assert got[0][1] < max(r[1] for r in got)


def test_r17_matches_duckdb_oracle(spark, sf_dir):
    """r17 recursive discovery + glob filter is STAGED for round-10
    declaration; rows gathered across three nesting depths must equal
    the full table, and the decoy .txt must contribute nothing."""
    from nlp_data_pipeline_spark.operators.doc_pipeline import (
        R17_SQL,
        r17_recursive_glob_ingest,
    )

    got = [tuple(r) for r in r17_recursive_glob_ingest(spark, sf_dir).collect()]
    want = [tuple(r) for r in _duck(sf_dir).execute(R17_SQL).fetchall()]
    assert len(got) > 0 and got == want
    assert not any(r[0] == "poison" for r in got)


def test_e21_matches_duckdb_oracle(spark, sf_dir):
    """e21 admission control is STAGED for round-10 declaration:
    AvailableNow must drain 4 staged files through maxFilesPerTrigger=1
    as exactly 4 non-empty micro-batches whose union is the source."""
    from nlp_data_pipeline_spark.operators.events import E21_SQL, e21_admission_control

    got = [tuple(r) for r in e21_admission_control(spark, sf_dir).collect()]
    want = [
        tuple(r) for r in _duck(sf_dir, views=("events",)).execute(E21_SQL).fetchall()
    ]
    assert got == want and got[0][0] == 4


def test_docfeed_stripes_cover_id_space_exactly():
    """The docfeed stream's partitions must tile the doc_id space with
    no gap and no overlap for any (stripe width, split count) — a
    missed boundary row would silently drop data at scale."""
    from nlp_data_pipeline_spark.sources.custom_datasource import DocFeedStreamReader

    for stripe, n_stripes, splits in ((7, 4, 2), (10, 3, 3), (1, 5, 2), (9, 4, 4)):
        r = DocFeedStreamReader(
            {
                "path": "unused",
                "stripe_docs": str(stripe),
                "n_stripes": str(n_stripes),
                "splits_per_stripe": str(splits),
            }
        )
        parts = r.partitions(r.initialOffset(), r.latestOffset())
        ranges = sorted(p.value for p in parts)
        assert ranges[0][0] == 0
        assert ranges[-1][1] == stripe * n_stripes
        for (a1, b1), (a2, b2) in zip(ranges, ranges[1:]):
            assert b1 == a2  # contiguous: no gap, no overlap
        assert all(a < b for a, b in ranges)


def test_docshards_abort_removes_orphan_temps(tmp_path):
    """A failed micro-batch's abort must clear task temp files so the
    next attempt starts from a clean directory (no half-written shard
    ever becomes visible to the part-* reader)."""
    import csv
    import os

    from nlp_data_pipeline_spark.sources.custom_datasource import (
        DocShardsStreamWriter,
        _ShardCommit,
    )

    sink = str(tmp_path / "shards")
    os.makedirs(sink)
    w = DocShardsStreamWriter(sink)
    tmp = os.path.join(sink, "_tmp-abort.tsv")
    with open(tmp, "w", newline="") as fh:
        csv.writer(fh, delimiter="\t").writerow((1, "a", 10))
    w.abort([_ShardCommit(tmp_path=tmp, n_rows=1), None], batchId=0)
    assert os.listdir(sink) == []


def test_p06_matches_duckdb_oracle(spark, sf_dir):
    """p06 declarative dataflow pipeline is STAGED for round-10
    declaration; the graph-run keep/drop sweep must equal the SQL
    restatement, and the quality gate must actually drop documents."""
    from nlp_data_pipeline_spark.operators.doc_pipeline import (
        P06_SQL,
        p06_dataflow_pipeline,
    )

    got = [tuple(r) for r in p06_dataflow_pipeline(spark, sf_dir).collect()]
    want = [tuple(r) for r in _duck(sf_dir).execute(P06_SQL).fetchall()]
    assert len(got) > 0 and got == want
    assert sum(r[3] for r in got) > 0  # the gate bites on this corpus


def test_dataflow_graph_validation(spark):
    """The runner must reject broken graphs BEFORE any Spark work:
    cycles, unknown dependencies, duplicate names, non-DataFrame
    returns — and resolve shared upstream stages exactly once."""
    import pytest as _pytest

    from nlp_data_pipeline_spark.plans.dataflow import DataflowError, Stage, run_graph

    src = spark.range(3)
    calls = []

    def mk(name):
        def fn(inp):
            calls.append(name)
            return next(iter(inp.values()))
        return fn

    out = run_graph(
        [
            Stage("a", mk("a"), ["src"]),
            Stage("b", mk("b"), ["a"]),
            Stage("c", mk("c"), ["a", "b"]),
        ],
        {"src": src},
    )
    assert set(out) == {"src", "a", "b", "c"}
    assert calls.count("a") == 1  # shared upstream resolved once

    with _pytest.raises(DataflowError, match="cycle"):
        run_graph(
            [Stage("x", mk("x"), ["y"]), Stage("y", mk("y"), ["x"])], {}
        )
    with _pytest.raises(DataflowError, match="unknown"):
        run_graph([Stage("x", mk("x"), ["nope"])], {"src": src})
    with _pytest.raises(DataflowError, match="duplicate"):
        run_graph([Stage("src", mk("s"), [])], {"src": src})
    with _pytest.raises(DataflowError, match="returned"):
        run_graph([Stage("bad", lambda i: 42, [])], {})


def test_d17_matches_duckdb_oracle(spark, sf_dir):
    """d17 asymmetric containment is STAGED for round-10 declaration;
    the min-size-denominator scores must match the postings-join
    restatement, and at least one pair must show the asymmetry
    (containment well above Jaccard) that motivates the operator."""
    from nlp_data_pipeline_spark.operators.dedup import D17_SQL, d17_containment_pairs

    got = [tuple(r) for r in d17_containment_pairs(spark, sf_dir).collect()]
    want = [tuple(r) for r in _duck(sf_dir).execute(D17_SQL).fetchall()]
    assert len(got) > 0 and got == want
    assert any(r[4] > 2 * r[5] for r in got)


def test_s20_matches_duckdb_oracle(spark, sf_dir):
    """s20 IVF operating curve is STAGED for round-10 declaration; the
    nprobe sweep must match the SQL restatement, recall must be
    non-decreasing in nprobe, and the widest probe must scan strictly
    more than the narrowest (the curve is a real trade-off, not flat)."""
    from nlp_data_pipeline_spark.operators.similarity import (
        S20_SQL,
        s20_ivf_operating_curve,
    )

    got = [tuple(r) for r in s20_ivf_operating_curve(spark, sf_dir).collect()]
    want = [tuple(r) for r in _duck(sf_dir).execute(S20_SQL).fetchall()]
    assert len(got) == 4 and got == want
    recalls = [r[1] for r in got]
    assert recalls == sorted(recalls)
    assert got[-1][2] > got[0][2]


def test_u08_matches_duckdb_oracle(spark, sf_dir):
    """u08 SCALAR_ITER pandas UDF is STAGED for round-10 declaration;
    the init-once-per-worker scoring must equal the closed-form CASE
    restatement (init placement changes cost, never semantics)."""
    from nlp_data_pipeline_spark.operators.relational_ext import (
        U08_SQL,
        u08_scalar_iter_udf,
    )

    got = [tuple(r) for r in u08_scalar_iter_udf(spark, sf_dir).collect()]
    want = [
        tuple(r) for r in _duck(sf_dir, views=("events",)).execute(U08_SQL).fetchall()
    ]
    assert len(got) == 5 and got == want


def test_u09_matches_duckdb_oracle(spark, sf_dir):
    """u09 pandas UDAF over a bounded window frame is STAGED for
    round-10 declaration; the exact-integer rolling weighted-cents must
    match the SQL windowed sums row for row."""
    from nlp_data_pipeline_spark.operators.relational_ext import (
        U09_SQL,
        u09_pandas_window_udaf,
    )

    got = [tuple(r) for r in u09_pandas_window_udaf(spark, sf_dir).collect()]
    want = [
        tuple(r) for r in _duck(sf_dir, views=("orders",)).execute(U09_SQL).fetchall()
    ]
    assert len(got) > 0 and got == want
    # frames are genuinely trailing-3: weight totals vary per row
    assert len({r[3] for r in got}) > 1


def test_r18_matches_duckdb_oracle(spark, sf_dir):
    """r18 corrupt-file-resilient ingest is STAGED for round-10
    declaration; with a planted non-parquet poison file in the
    directory, ignoreCorruptFiles must yield exactly the good shards'
    rows (logged-and-skipped, not failed, not partially read)."""
    from nlp_data_pipeline_spark.operators.doc_pipeline import (
        R18_SQL,
        r18_corrupt_file_ingest,
    )

    got = [tuple(r) for r in r18_corrupt_file_ingest(spark, sf_dir).collect()]
    want = [tuple(r) for r in _duck(sf_dir).execute(R18_SQL).fetchall()]
    assert len(got) > 0 and got == want


def test_r18_fails_loudly_without_the_option(spark, sf_dir):
    """The flip side that makes r18 meaningful: the SAME poisoned
    directory read WITHOUT ignoreCorruptFiles must raise — resilience
    is an explicit opt-in, never silent default behavior."""
    import os

    import pytest as _pytest

    from nlp_data_pipeline_spark.operators.doc_pipeline import (
        r18_corrupt_file_ingest,
    )
    from nlp_data_pipeline_spark.scratch import scratch_path

    r18_corrupt_file_ingest(spark, sf_dir).collect()  # stages + poisons
    stage = scratch_path(f"corruptdir_{os.getpid()}")
    with _pytest.raises(Exception):
        (
            spark.read.schema("doc_id bigint, source string, n_chars bigint")
            .parquet(stage)
            .count()
        )


def test_v17_matches_duckdb_oracle(spark, sf_dir):
    """v17 TABLE-argument UDTF is STAGED for round-10 declaration; the
    per-partition streamed fold must equal the plain aggregate
    restatement (the accumulator is order-insensitive by design)."""
    from nlp_data_pipeline_spark.operators.sql_api import (
        V17_SQL,
        v17_udtf_table_argument,
    )

    got = [tuple(r) for r in v17_udtf_table_argument(spark, sf_dir).collect()]
    want = [tuple(r) for r in _duck(sf_dir).execute(V17_SQL).fetchall()]
    assert len(got) > 0 and got == want


def test_t41_matches_duckdb_oracle(spark, sf_dir):
    """t41 Heaps-law vocabulary curve is STAGED for round-10
    declaration; the 4-level conditional-distinct sweep must match the
    SQL restatement, with vocab non-decreasing and vocab-per-token
    non-increasing along the prefix."""
    from nlp_data_pipeline_spark.operators.text_analytics import (
        T41_SQL,
        t41_vocab_growth,
    )

    got = [tuple(r) for r in t41_vocab_growth(spark, sf_dir).collect()]
    want = [tuple(r) for r in _duck(sf_dir).execute(T41_SQL).fetchall()]
    assert len(got) == 4 and got == want
    vocabs = [r[3] for r in got]
    assert vocabs == sorted(vocabs)
    vpt = [r[4] for r in got]
    assert vpt == sorted(vpt, reverse=True)


def test_q47_matches_duckdb_oracle(spark, sf_dir):
    """q47 forward-fill gap filling is STAGED for round-10 declaration;
    the generated hourly spine + IGNORE NULLS fill must match the SQL
    restatement, and real gaps must exist and be filled."""
    from nlp_data_pipeline_spark.operators.relational_ext import (
        Q47_SQL,
        q47_gap_fill_forward,
    )

    got = [tuple(r) for r in q47_gap_fill_forward(spark, sf_dir).collect()]
    want = [tuple(r) for r in _duck(sf_dir, views=("events",)).execute(Q47_SQL).fetchall()]
    assert len(got) > 0 and got == want
    gaps = [r for r in got if not r[2]]
    assert gaps and all(r[3] is not None for r in gaps)  # spine fills every gap


def test_d19_matches_duckdb_oracle(spark, sf_dir):
    """d19 shingle-size sensitivity curve is STAGED for round-10
    declaration; the per-k candidate counts and Jaccard stats must
    match the SQL restatement, and the curve must show the precision
    trade-off that justifies k=3 (k=2 floods with low-quality pairs)."""
    from nlp_data_pipeline_spark.operators.dedup import D19_SQL, d19_shingle_k_curve

    got = [tuple(r) for r in d19_shingle_k_curve(spark, sf_dir).collect()]
    want = [tuple(r) for r in _duck(sf_dir).execute(D19_SQL).fetchall()]
    assert len(got) == 3 and got == want
    by_k = {r[0]: r for r in got}
    assert by_k[2][1] > 10 * by_k[3][1]  # k=2 candidate flood
    assert by_k[2][2] < by_k[3][2]  # ...of much lower mean quality


def test_e22_matches_duckdb_oracle(spark, sf_dir):
    """e22 row-level ForeachWriter sink is STAGED for round-10
    declaration; the per-(partition, epoch) idempotent landing must
    reproduce the source aggregate exactly, including on rerun."""
    from nlp_data_pipeline_spark.operators.events import E22_SQL, e22_foreach_row_sink

    got = [tuple(r) for r in e22_foreach_row_sink(spark, sf_dir).collect()]
    want = [
        tuple(r) for r in _duck(sf_dir, views=("events",)).execute(E22_SQL).fetchall()
    ]
    assert len(got) == 5 and got == want
