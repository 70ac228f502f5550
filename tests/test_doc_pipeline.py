"""Pipeline/export operators + approximate-aggregate tolerances."""

import pytest
from pyspark.sql import functions as F

from nlp_data_pipeline_spark.operators.doc_pipeline import (
    a01_approx_stats,
    p01_document_records,
    p02_export_projection,
)
from nlp_data_pipeline_spark.sources.catalog import load_table


def test_p01_schema_and_invariants(spark, sf_dir):
    df = p01_document_records(spark, sf_dir)
    rows = df.limit(50).collect()
    assert df.columns == [
        "filename", "cleaned_text", "processed_text", "summary",
        "text_length", "summary_length",
    ]
    for r in rows:
        assert r["filename"].startswith("doc_") and r["filename"].endswith(".txt")
        assert r["summary_length"] <= 153  # 150 + '...'
        assert r["summary_length"] == len(r["summary"])


def test_p02_compression_ratio_bounds(spark, sf_dir):
    rows = p02_export_projection(spark, sf_dir).collect()
    for r in rows:
        assert 0 < r["Compression_Ratio"] <= 1.001


def test_a01_approx_within_tolerance_of_exact(spark, sf_dir):
    """Sketch-vs-exact tolerance booleans must hold; exact stats must
    agree with an independently-computed exact aggregation."""
    rows = {r["l_returnflag"]: r for r in a01_approx_stats(spark, sf_dir).collect()}
    l = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("median"),
        )
        .collect()
    }
    assert rows
    for flag, a in rows.items():
        e = exact[flag]
        assert a["hll_within_5pct"] and a["pct_sketch_within_1pct"]
        assert a["exact_parts"] == e["parts"]
        # rank-based p50 vs interpolated percentile: same neighborhood
        assert float(a["p50"]) == pytest.approx(e["median"], rel=0.01)


def test_p04_stage_attribution_consistent(spark, sf_dir):
    """Verdicts respect stage precedence and each reason is consistent
    with its rule's standalone computation."""
    import pyspark.sql.functions as F

    from nlp_data_pipeline_spark.operators.doc_pipeline import (
        _P04_MIN_TOKENS,
        p04_curation_pipeline,
    )

    rows = p04_curation_pipeline(spark, sf_dir).collect()
    assert len(rows) > 0
    reasons = {r.drop_reason for r in rows}
    assert reasons <= {"exact_dup", "too_short", "repetitive", "boilerplate", "kept"}
    for r in rows:
        assert r.keep == (r.drop_reason == "kept")
        if r.drop_reason == "too_short":
            assert r.n_tokens < _P04_MIN_TOKENS
        if r.drop_reason in ("repetitive", "boilerplate", "kept"):
            # later stages only reachable when length rule passed
            assert r.n_tokens >= _P04_MIN_TOKENS
