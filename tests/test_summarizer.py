"""Summarizer general-path tests (punctuated fixtures the driver corpus
lacks — FIXTURES.md F4/F5 and the TF-IDF ranking path R8-R9)."""

from pyspark.sql import functions as F

from nlp_data_pipeline_spark.functions.text import clean_text, sentences
from nlp_data_pipeline_spark.operators.summarizer import summary_general_path


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "ctext"]
    )


def test_general_path_selects_k_sentences_in_order(spark):
    # 5 distinct sentences; target 2 → output must be 2 sentences joined
    # in ORIGINAL document order (:103 re-sort) ending with '.'
    text = (
        "alpha bravo charlie delta repeated. "
        "echo foxtrot golf hotel india. "
        "juliet kilo lima mike november. "
        "oscar papa quebec romeo sierra. "
        "alpha bravo charlie delta repeated again."
    )
    out = summary_general_path(None, _docs(spark, [text]), 2).collect()
    assert len(out) == 1
    summary = out[0]["general_summary"]
    assert summary.endswith(".")
    parts = [s for s in summary.split(". ") if s]
    assert len(parts) == 2
    # order preserved: each part appears in the source in the same order
    positions = [text.find(p.rstrip(".")) for p in parts]
    assert positions == sorted(positions) and all(p >= 0 for p in positions)


def test_early_exit_docs_excluded(spark):
    # 2 sentences <= target 3 → general path emits nothing for this doc
    out = summary_general_path(
        None, _docs(spark, ["one sentence long enough here. two sentence also long enough."]), 3
    ).collect()
    assert out == []


def test_l2_normalized_scoring_favors_term_rich_sentence(spark):
    # reference scores = row sums of the L2-NORMALIZED tf-idf matrix
    # (:99): for a sentence with n roughly-equal-weight distinct terms the
    # score ≈ sqrt(n), so the distinct-term-richest sentence wins top-1 —
    # NOT the one that repeats a few terms (repetition cancels in the norm)
    text = (
        "spark engine spark engine spark engine runs fast. "
        "unrelated words entirely different topic here. "
        "spark engine computes spark engine answers quickly."
    )
    out = summary_general_path(None, _docs(spark, [text]), 1).collect()
    assert out[0]["general_summary"] == "unrelated words entirely different topic here."
