"""Metric parity tests — FIXTURES.md F6/F9 against evaluate_summary /
corpus-aggregate semantics (/root/reference/nlp_data_tagging.py:242-261,
:441-456)."""

import pytest
from pyspark.sql import functions as F


def test_word_overlap_f6(spark):
    df = spark.createDataFrame([("a b c d", "c d e")], ["orig", "summary"])
    ow = F.array_distinct(F.split(F.lower("orig"), " "))
    sw = F.array_distinct(F.split(F.lower("summary"), " "))
    got = df.select(
        (F.size(F.array_intersect(ow, sw)) / F.size(ow)).alias("overlap")
    ).first()["overlap"]
    assert got == pytest.approx(0.5)


def test_compression_and_avg_sentence_length_f6(spark):
    df = spark.createDataFrame([("x" * 100, "ab cd. ef gh.")], ["orig", "summary"])
    row = df.select(
        (F.length("summary") / F.length("orig")).alias("compression"),
        (
            F.size(F.filter(F.split("summary", r"\s+"), lambda t: t != F.lit("")))
            / F.size(F.split("summary", r"[.!?]+"))
        ).alias("asl"),
    ).first()
    assert row["compression"] == pytest.approx(0.13)
    # reference counts raw re.split parts (here: 'ab cd', ' ef gh', '') = 3
    assert row["asl"] == pytest.approx(4 / 3)


def test_corpus_aggregates_f9(spark):
    df = spark.createDataFrame(
        [(100, 10), (200, 40), (0, 0)], ["text_length", "summary_length"]
    )
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("text_length").alias("avg_len"),
        F.avg("summary_length").alias("avg_sum"),
        F.avg(
            F.when(
                F.col("text_length") > 0,
                F.col("summary_length") / F.col("text_length"),
            )
        ).alias("avg_compression"),
    ).first()
    assert row["n"] == 3
    assert row["avg_len"] == pytest.approx(100.0)
    assert row["avg_sum"] == pytest.approx(50 / 3)
    # ":454 — text_length > 0 rows only: mean(0.1, 0.2)"
    assert row["avg_compression"] == pytest.approx(0.15)
