"""Round-9 additions: ADVICE-r08 hardening tests (n05 cross-engine
log boundary agreement) and round-9 session operators."""

import pytest
from pyspark.sql import functions as F  # noqa: F401 (fixture parity with siblings)


def _duck(sf_dir, views=("documents",)):
    import duckdb

    con = duckdb.connect()
    for v in views:
        con.execute(
            f"CREATE VIEW {v} AS SELECT * FROM read_parquet('{sf_dir}/{v}.parquet')"
        )
    return con


def test_n05_log_agrees_across_engines_at_rounding_boundaries(spark, sf_dir):
    """ADVICE r08: n05 declares round(ln((m+1)/(df+1)), 6) where the ln
    runs in JVM Math.log (inside pyspark.ml IDF) on the Spark side and
    in DuckDB's libm on the oracle side. A last-ulp divergence at a
    5e-7 rounding boundary would flip the 6-dp hash even though df/m
    are exact. For every (df, m) pair the corpus ACTUALLY produces at
    this sf, rank by distance of frac(ln·1e6) from the .5 rounding
    boundary and assert Python math.log, the JVM (Spark SQL ln), and
    DuckDB ln agree at 6 dp on the 10 nearest-to-boundary pairs (plus
    the overall closest regardless of rank)."""
    import math

    from nlp_data_pipeline_spark.operators.nlp_model import _n05_sql

    pairs = sorted(
        set(
            _duck(sf_dir)
            .execute(f"SELECT df, n_docs FROM ({_n05_sql()})")
            .fetchall()
        )
    )
    assert pairs, "n05 oracle returned no (df, n_docs) pairs"

    def frac_dist(df, m):
        v = math.log((m + 1.0) / (df + 1.0)) * 1e6
        f = v - math.floor(v)
        return abs(f - 0.5)

    nearest = sorted(pairs, key=lambda p: frac_dist(*p))[:10]

    # One engine per batch: Python half-up (idf >= 0 always), JVM via
    # Spark SQL's ln + round (HALF_UP), DuckDB's ln + round (half-away,
    # identical to half-up for non-negative values).
    py = [
        math.floor(math.log((m + 1.0) / (df + 1.0)) * 1e6 + 0.5) / 1e6
        for df, m in nearest
    ]
    values_sql = ", ".join(f"({df}, {m})" for df, m in nearest)
    jvm = [
        r[0]
        for r in spark.sql(
            "SELECT round(ln((CAST(m AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0)), 6) "
            f"FROM VALUES {values_sql} AS t(df, m) ORDER BY df, m"
        ).collect()
    ]
    duck = [
        r[0]
        for r in _duck(sf_dir)
        .execute(
            "SELECT round(ln((CAST(m AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0)), 6) "
            f"FROM (VALUES {values_sql}) AS t(df, m) ORDER BY df, m"
        )
        .fetchall()
    ]
    ordered = sorted(nearest)
    py_ordered = [
        math.floor(math.log((m + 1.0) / (df + 1.0)) * 1e6 + 0.5) / 1e6
        for df, m in ordered
    ]
    assert py_ordered == jvm == duck, (
        f"6-dp ln disagreement on boundary pairs {ordered}: "
        f"py={py_ordered} jvm={jvm} duck={duck}"
    )
    # sanity: the ranking actually surfaced the closest observed pair
    assert frac_dist(*nearest[0]) == min(frac_dist(*p) for p in pairs)
    assert len(py) == len(nearest)


def test_n05_declared_integers_are_model_state(spark, sf_dir):
    """The declared df/n_docs columns come from the fitted IDFModel
    itself (docFreq vector, numDocs scalar), not a side recompute —
    so they satisfy the model's own invariant ln((m+1)/(df+1)) == idf
    at 6 dp, row for row."""
    import math

    from nlp_data_pipeline_spark.operators.nlp_model import n05_idf_model

    rows = n05_idf_model(spark, sf_dir).collect()
    assert rows
    for r in rows:
        expect = math.floor(
            math.log((r["n_docs"] + 1.0) / (r["df"] + 1.0)) * 1e6 + 0.5
        ) / 1e6
        assert abs(expect - r["idf"]) < 1e-9, (r["term"], r["df"], r["n_docs"])
