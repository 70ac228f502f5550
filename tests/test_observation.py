"""df.observe() — pipeline-embedded metrics without a second pass.

At 100 TB a separate metrics query re-scans the input; Observation
collects named aggregates during the SAME action.
"""

from pyspark.sql import Observation
from pyspark.sql import functions as F

from nlp_data_pipeline_spark.functions.text import clean_text, tokenize
from nlp_data_pipeline_spark.sources.catalog import load_table


def test_observe_collects_metrics_in_single_pass(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    obs = Observation("doc_metrics")
    pipeline = d.observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.length("text")).alias("avg_chars"),
        F.max("n_chars").alias("max_chars"),
    ).select("doc_id", tokenize(clean_text("text")).alias("tokens"))
    out_rows = pipeline.count()  # the single action drives both outputs

    got = obs.get
    assert got["n_docs"] == out_rows == 500
    assert got["avg_chars"] > 0
    assert got["max_chars"] >= got["avg_chars"]
