"""Round-6 operators: t22 boilerplate prune, s12 BM25, v07 recursive CTE."""

from datetime import date

import pyspark.sql.functions as F

from nlp_data_pipeline_spark.plans.explain import formatted_plan


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", src, len(t)) for i, (src, t) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_t22_flags_shared_boilerplate_segment(spark, monkeypatch):
    import nlp_data_pipeline_spark.operators.text_analytics as ta

    footer = "common footer navigation links"
    rows = [
        # the footer shingle set recurs in 3 of 4 srcA docs → boilerplate
        ("srcA", f"alpha bravo charlie {footer}"),
        ("srcA", f"delta echo foxtrot {footer}"),
        ("srcA", f"golf hotel india {footer}"),
        ("srcA", "juliet kilo lima mike november oscar"),
        # same footer in a DIFFERENT source with only one doc → not
        # boilerplate there (per-source doc frequency, absolute floor 2)
        ("srcB", f"papa quebec romeo {footer}"),
    ]
    monkeypatch.setattr(ta, "load_table", lambda s, d, n: _docs(spark, rows))
    out = {r.doc_id: r for r in ta.t22_boilerplate_prune(spark, "ignored").collect()}
    # docs 0-2 each contain the recurring footer shingles; doc 3 is clean
    assert out[0].n_boiler > 0 and out[1].n_boiler > 0 and out[2].n_boiler > 0
    assert out[3].n_boiler == 0 and out[3].keep
    assert out[4].n_boiler == 0  # srcB footer below the frequency floor
    for r in out.values():
        assert 0 <= r.n_boiler <= r.n_segments
        assert r.keep == (r.n_boiler / r.n_segments <= 0.5)


def test_t22_joinback_is_broadcast(spark, sf_dir):
    from nlp_data_pipeline_spark.operators.text_analytics import t22_boilerplate_prune

    plan = formatted_plan(t22_boilerplate_prune(spark, sf_dir))
    # the corpus-sized segs relation must join the tiny boilerplate set
    # via broadcast, never a shuffle of the big side
    assert "BroadcastHashJoin" in plan


def test_s12_bm25_ranks_term_dense_docs(spark, sf_dir):
    from nlp_data_pipeline_spark.operators.similarity import (
        BM25_TERMS,
        BM25_TOP_K,
        s12_bm25_topk,
    )

    rows = s12_bm25_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= BM25_TOP_K
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r.bm25 > 0 for r in rows)
    assert all(1 <= r.n_terms_matched <= len(BM25_TERMS) for r in rows)


def test_v07_spine_is_dense_and_anchored(spark, sf_dir):
    from nlp_data_pipeline_spark.operators.sql_api import v07_recursive_month_spine
    from nlp_data_pipeline_spark.sources.catalog import load_table

    rows = v07_recursive_month_spine(spark, sf_dir).collect()
    months = [date.fromisoformat(r.month) for r in rows]
    # dense: every consecutive pair is exactly one month apart
    for a, b in zip(months, months[1:]):
        assert (b.year * 12 + b.month) - (a.year * 12 + a.month) == 1
    # anchored at the data's min/max order month
    bounds = (
        load_table(spark, sf_dir, "orders")
        .agg(
            F.min(F.date_trunc("MONTH", "o_orderdate")).alias("mn"),
            F.max(F.date_trunc("MONTH", "o_orderdate")).alias("mx"),
        )
        .first()
    )
    assert months[0] == bounds.mn.date() and months[-1] == bounds.mx.date()
    # totals preserved through the spine join (zero-months add nothing)
    assert sum(r.n_orders for r in rows) == load_table(spark, sf_dir, "orders").count()


def test_t31_target_docs_lean_positive(spark, sf_dir):
    """Docs FROM the target domain should on average carry higher
    importance weight than the rest (the property DSIR selection
    relies on)."""
    from nlp_data_pipeline_spark.operators.text_analytics import (
        _T31_TARGET,
        t31_dsir_importance,
    )
    from nlp_data_pipeline_spark.sources.catalog import load_table

    w = t31_dsir_importance(spark, sf_dir)
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    joined = w.join(src, "doc_id").groupBy(
        (F.col("source") == _T31_TARGET).alias("is_target")
    ).agg(F.avg(F.col("dsir_logweight") / F.col("n_toks")).alias("avg_per_tok"))
    rows = {r.is_target: r.avg_per_tok for r in joined.collect()}
    assert rows[True] > rows[False]


def test_r11_gzip_stage_is_actually_gzip(spark, sf_dir, tmp_path):
    import glob
    import gzip
    import os

    from nlp_data_pipeline_spark.operators.doc_pipeline import (
        r11_gzip_jsonl_roundtrip,
    )

    out = r11_gzip_jsonl_roundtrip(spark, sf_dir)
    assert out.count() > 0
    stage = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"gzjsonl_{os.getpid()}"
    )
    files = glob.glob(os.path.join(stage, "part-*.json.gz"))
    assert files, "stage must be .gz-suffixed shards"
    with gzip.open(files[0], "rt") as fh:  # decodes only if really gzip
        assert '"doc_id"' in fh.readline()


def test_e15_scan_is_dynamically_pruned(spark, sf_dir):
    """The fact scan must carry a dynamicpruning expression on the
    partition column — dim-side predicates prune fact partitions at
    RUNTIME, the property that keeps partitioned scans bounded at
    100 TB."""
    from nlp_data_pipeline_spark.operators.events import (
        e15_dynamic_partition_pruning,
    )

    plan = formatted_plan(e15_dynamic_partition_pruning(spark, sf_dir))
    assert "dynamicpruning" in plan.lower()


def test_q38_single_scan_all_rules(spark, sf_dir):
    """The expectations audit must evaluate ALL rules in one pass —
    exactly one parquet scan and one aggregate in the plan."""
    from nlp_data_pipeline_spark.operators.relational_ext import (
        _Q38_RULES,
        q38_data_expectations,
    )

    import re

    df = q38_data_expectations(spark, sf_dir)
    plan = formatted_plan(df)
    # one scan NODE (formatted output prints each node twice: once in
    # the tree, once as a "(N) Scan parquet" detail header)
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1
    rows = {r.rule: r for r in df.collect()}
    assert len(rows) == len(_Q38_RULES)
    for name, _pred, tol in _Q38_RULES:
        if tol == 0.0:
            assert rows[name].n_violations == 0 and rows[name]["pass"]


def test_q39_zorder_bounds_both_dimensions(spark, sf_dir):
    """Z-order buckets must bound BOTH key ranges; the 1-D sort layout
    bounds only its sort key — the property that makes min/max file
    skipping work for predicates on either column."""
    from nlp_data_pipeline_spark.operators.relational_ext import (
        q39_zorder_clustering,
    )

    rows = q39_zorder_clustering(spark, sf_dir).collect()
    spans = {}
    for layout in ("zorder", "linear_x"):
        xs = [r.x_span_frac for r in rows if r.layout == layout]
        ys = [r.y_span_frac for r in rows if r.layout == layout]
        spans[layout] = (sum(xs) / len(xs), sum(ys) / len(ys))
    # linear layout: x tightly bounded, y unbounded (~full range)
    assert spans["linear_x"][0] < 0.2 and spans["linear_x"][1] > 0.8
    # z-order: BOTH dimensions substantially bounded
    assert spans["zorder"][0] < 0.5 and spans["zorder"][1] < 0.5
    # and z-order's y bound beats linear's by a wide margin
    assert spans["zorder"][1] < spans["linear_x"][1] / 2
