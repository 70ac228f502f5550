"""Golden-output tests for reference-parity text operators.

Fixtures F1-F5 from FIXTURES.md §2; expected values hand-computed from
/root/reference/nlp_data_tagging.py semantics (cited per test).
"""

import pytest
from pyspark.sql import functions as F

from nlp_data_pipeline_spark.functions.text import (
    STOP_WORDS,
    clean_text,
    sentences,
    tokenize,
    tokenize_joined,
    truncate_at_word,
    word_count,
)


def one(spark, text, col):
    return spark.createDataFrame([(text,)], ["text"]).select(col.alias("out")).first()["out"]


# F1 — preprocess (:49-66)
def test_clean_text_f1(spark):
    got = one(spark, "Hello,   World!! It's 99%... done\nNow.", clean_text("text"))
    assert got == "hello world it s 99 ... done now."


def test_clean_text_empty_and_null(spark):
    assert one(spark, "", clean_text("text")) == ""
    row = spark.createDataFrame([(None,)], "text string").select(clean_text("text").alias("o")).first()
    assert row["o"] == ""  # ":51-52 if not text: return ''"


def test_clean_text_idempotent(spark):
    src = "Mixed CASE &&& punct...   spaces\t\ttabs"
    once = one(spark, src, clean_text("text"))
    twice = one(spark, once, clean_text("text"))
    assert once == twice


# F2 — tokenize + stopword + minlen (:68-76)
def test_tokenize_f2(spark):
    got = one(spark, "the cat is on a big mat now it runs", tokenize_joined("text"))
    assert got == "cat big mat runs"


def test_tokenize_no_stopwords_no_shorts(spark):
    toks = one(spark, "a an the running quickly to it be xy z", tokenize("text"))
    assert all(t.lower() not in STOP_WORDS for t in toks)
    assert all(len(t) > 2 for t in toks)
    assert toks == ["running", "quickly"]


# F3 — sentence split (:81-84)
def test_sentences_f3(spark):
    got = one(
        spark,
        "Short. This sentence is long enough! Tiny? Another sufficiently long sentence.",
        sentences("text"),
    )
    assert got == ["This sentence is long enough", "Another sufficiently long sentence"]


# F5 — length-controlled truncation (:126-128)
def test_truncate_at_word_f5(spark):
    long = "word " * 40  # 200 chars
    got = one(spark, long.strip(), truncate_at_word("text", 50))
    # reference: summary[:50].rsplit(' ',1)[0] + '...'
    expected = long.strip()[:50].rsplit(" ", 1)[0] + "..."
    assert got == expected
    assert len(got) <= 53


def test_truncate_no_space_keeps_all(spark):
    blob = "x" * 80
    got = one(spark, blob, truncate_at_word("text", 50))
    assert got == "x" * 50 + "..."  # rsplit on spaceless string keeps it


def test_truncate_short_passthrough(spark):
    got = one(spark, "short text", truncate_at_word("text", 50))
    assert got == "short text"


def test_word_count(spark):
    assert one(spark, "a  b   c", word_count("text")) == 3
    assert one(spark, "", word_count("text")) == 0


@pytest.mark.parametrize(
    "raw",
    ["", "   ", "ALL CAPS!!!", "tabs\tand\nnewlines", "ünïcode wörds here", "1 22 333 4444"],
)
def test_pipeline_invariants(spark, raw):
    """Property sweep: clean→tokenize never errors, emits no stopword/shorts."""
    toks = one(spark, raw, tokenize(clean_text("text")))
    assert all(len(t) > 2 and t.lower() not in STOP_WORDS for t in toks)
