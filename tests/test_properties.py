"""Property-based tests (hypothesis) — SURVEY.md §5.2-4.

Invariants of the reference-parity string operators that must hold for
ARBITRARY input, not just fixtures: preprocess idempotence, tokenizer
postconditions, metric ranges. Strategies are kept small (text up to
~200 chars) and batched into a single Spark job per property so the
suite stays fast.
"""

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from nlp_data_pipeline_spark.functions.text import (
    STOP_WORDS,
    clean_text,
    sentences,
    tokenize,
    truncate_at_word,
)

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
    max_size=200,
)


def _run_many(spark, texts, col):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [r["out"] for r in df.select(col.alias("out")).collect()]


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=60))
def test_clean_text_idempotent_property(spark, texts):
    once = _run_many(spark, texts, clean_text("text"))
    twice = _run_many(spark, once, clean_text("text"))
    assert once == twice


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=60))
def test_tokenize_postconditions(spark, texts):
    all_tokens = _run_many(spark, texts, tokenize(clean_text("text")))
    for toks in all_tokens:
        for t in toks:
            assert len(t) > 2
            assert t.lower() not in STOP_WORDS
            assert " " not in t


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=60))
def test_sentences_postconditions(spark, texts):
    outs = _run_many(spark, texts, sentences(clean_text("text")))
    for sents in outs:
        for s in sents:
            assert len(s) > 10
            assert s == s.strip()
            assert not any(ch in s for ch in ".!?")


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=60))
def test_truncate_bounds(spark, texts):
    outs = _run_many(spark, texts, truncate_at_word(clean_text("text"), 50))
    cleans = _run_many(spark, texts, clean_text("text"))
    for out, clean in zip(outs, cleans):
        if len(clean) <= 50:
            assert out == clean
        else:
            assert out.endswith("...")
            assert len(out) <= 53


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(TEXT, TEXT), min_size=1, max_size=60))
def test_word_overlap_in_unit_interval(spark, pairs):
    df = spark.createDataFrame(
        [(a if a.strip() else "x", b) for a, b in pairs], "orig string, summ string"
    )
    ow = F.array_distinct(F.filter(F.split(F.lower("orig"), r"\s+"), lambda t: t != F.lit("")))
    sw = F.array_distinct(F.filter(F.split(F.lower("summ"), r"\s+"), lambda t: t != F.lit("")))
    vals = [
        r["o"]
        for r in df.select(
            (F.size(F.array_intersect(ow, sw)) / F.greatest(F.size(ow), F.lit(1))).alias("o")
        ).collect()
    ]
    assert all(not math.isnan(v) and 0.0 <= v <= 1.0 for v in vals)
