"""Similarity math tests — FIXTURES.md F11 hand vectors."""

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nlp_data_pipeline_spark.operators.similarity import as_double, dot, norm


def test_dot_and_norm_hand_values(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0])], ["a", "b"]
    )
    rows = df.select(dot("a", "b").alias("d"), norm("a").alias("na")).collect()
    assert rows[0]["d"] == 0.0
    assert rows[1]["d"] == pytest.approx(2.0)
    assert rows[1]["na"] == pytest.approx(math.sqrt(2))


def test_nearest_neighbor_of_1_1(spark):
    # F11: vectors [1,0],[0,1],[1,1]; NN of [1,1] excluding self —
    # cosine to both others is 0.7071… → tie broken by lowest vec_id
    vecs = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 1.0])]
    e = spark.createDataFrame(vecs, ["vec_id", "emb"])
    q = e.filter(F.col("vec_id") == 2).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    joined = e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    cos = dot("qemb", "emb") / (norm("qemb") * norm("emb"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    top = (
        joined.select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .first()
    )
    assert top["vec_id"] == 0  # tie-break by id
    assert top["cosine"] == pytest.approx(1 / math.sqrt(2))


def test_s02_is_fully_distributed(spark, sf_dir):
    """s02 must not materialize the corpus driver-side (the round-1
    design collected it via toPandas — a driver OOM at scale). Guard:
    no driver-materialization calls in the operator source, and the
    executed plan's pair kernel is the block-grid MapInPandas over the
    packed-block join, not a broadcast of a driver-built matrix."""
    import inspect

    from nlp_data_pipeline_spark.operators.similarity import s02_top_similar_pairs

    src = inspect.getsource(s02_top_similar_pairs)
    for banned in ("toPandas", ".collect(", "sparkContext.broadcast"):
        assert banned not in src, f"driver-side materialization in s02: {banned}"

    plan = (
        s02_top_similar_pairs(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" in plan


def test_float32_widening_is_exact(spark, sf_dir):
    """embedding floats must be widened to double BEFORE arithmetic."""
    from nlp_data_pipeline_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "embeddings").limit(1)
    row = e.select(
        as_double("embedding").alias("d"), F.col("embedding").alias("f")
    ).first()
    assert all(float(a) == float(b) for a, b in zip(row["d"], row["f"]))
