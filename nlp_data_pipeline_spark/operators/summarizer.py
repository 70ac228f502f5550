"""Extractive TF-IDF summarization as a distributed DataFrame pipeline.

Reference semantics (/root/reference/nlp_data_tagging.py:86-130):

1. split text into sentences (re.split('[.!?]+'), keep len>10)   (:89)
2. early exit: if n_sentences <= num_sentences → return text     (:91-92)
3. TF-IDF over the document's sentences (fit per document)       (:95-96)
4. sentence score = sum of its L2-normalized TF-IDF row          (:99)
5. take top-k scores, re-sort selected indices ascending to
   restore document order, join with '. ' and append '.'         (:102-106)
6. length control: truncate at last word boundary + '...'        (:118-130)

The reference fits a *separate* sklearn vectorizer per document inside
a Python loop. Distributed re-expression: explode all sentences of all
documents, compute tf / df / idf grouped **per document** so every
document's model is fit independently — one pass, shuffle keyed on
(doc_id[, term]), no per-document driver loop. This is the shape that
survives 100 TB: all per-document state lives in the shuffle, never on
the driver.

Deliberate deviation (documented): sklearn's TfidfVectorizer uses its
built-in 318-word english stop list and token_pattern \\w\\w+ with
max_features=100. We use token_pattern parity (\\w\\w+) and the app's
own 118-word STOP_WORDS (the set the rest of the reference pipeline
uses), with the same max_features cap (top-100 per-document terms by
frequency, alphabetical tie-break, matching sklearn's selection rule).
Numeric score parity with sklearn is therefore approximate; ordering
invariants are tested on fixtures instead (tests/test_summarizer.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nlp_data_pipeline_spark.functions.text import STOP_WORDS_SORTED, sentences


def summary_general_path(
    spark: SparkSession, docs: DataFrame, num_sentences: int, vocab_size: int = 100
) -> DataFrame:
    """TF-IDF top-k sentence summary for docs with > num_sentences sentences.

    ``docs`` must have (doc_id, ctext). Returns (doc_id, general_summary)
    containing only documents that take the general (non-early-exit) path.
    """
    sent = docs.select(
        "doc_id", F.posexplode(sentences("ctext")).alias("sent_pos", "sentence")
    )
    # per-doc sentence count via unbounded window — one shuffle on doc_id,
    # no second scan of the corpus (vs groupBy + self-join)
    sent = (
        sent.withColumn(
            "n_sentences", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
        )
        .filter(F.col("n_sentences") > num_sentences)
        # fan-out: consumed by the term explosion AND the zero-score
        # backfill join — materialize once (Spark re-runs the corpus
        # sentence-split per consumer otherwise; ReusedExchange never
        # fires here, measured)
        .localCheckpoint()
    )

    # isin -> INSET hash probe; array_contains was an O(118) scan/token
    terms = F.filter(
        F.regexp_extract_all(F.lower("sentence"), F.lit(r"\w\w+"), 0),
        lambda t: ~t.isin(*STOP_WORDS_SORTED),
    )
    tok = sent.select(
        "doc_id", "sent_pos", "n_sentences", F.explode(terms).alias("term")
    )

    # Single upstream aggregation tf0; EVERY later relation (vocab cap,
    # capped tf, per-doc df) derives from it. Materialized once: the
    # branches do NOT share the shuffle subplan automatically
    # (ReusedExchange requires byte-identical exchanges and never fires
    # across these differently-keyed consumers — measured), so without
    # the checkpoint each branch re-runs the explode+count.
    tf0 = tok.groupBy("doc_id", "sent_pos", "n_sentences", "term").agg(
        F.count(F.lit(1)).alias("tf")
    ).localCheckpoint()

    # per-document vocabulary cap: top `vocab_size` terms by total count
    # (sklearn max_features rule: frequency desc, term asc)
    term_tot = tf0.groupBy("doc_id", "term").agg(F.sum("tf").alias("total_tf"))
    wv = Window.partitionBy("doc_id").orderBy(F.desc("total_tf"), F.asc("term"))
    vocab = term_tot.withColumn("vrank", F.row_number().over(wv)).filter(
        F.col("vrank") <= vocab_size
    ).select("doc_id", "term")

    tf = tf0.join(vocab, ["doc_id", "term"], "left_semi")
    # per-document df derives from tf (rows are distinct (doc, sent, term))
    df_ = tf.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df_, ["doc_id", "term"])
    idf = (
        F.log(
            (F.lit(1.0) + F.col("n_sentences").cast("double"))
            / (F.lit(1.0) + F.col("df").cast("double"))
        )
        + F.lit(1.0)
    )
    scored = scored.withColumn("tfidf", F.col("tf").cast("double") * idf)

    # sentence score = sum of L2-normalized row  (:99 — row sums of the
    # normalized matrix) = sum(tfidf) / sqrt(sum(tfidf^2))
    sent_scores = scored.groupBy("doc_id", "sent_pos", "n_sentences").agg(
        (F.sum("tfidf") / F.sqrt(F.sum(F.col("tfidf") * F.col("tfidf")))).alias("score")
    )
    # sentences with no in-vocab terms score 0 (sklearn row of zeros)
    all_sent = sent.select("doc_id", "sent_pos", "sentence", "n_sentences")
    sent_scores = all_sent.join(sent_scores, ["doc_id", "sent_pos", "n_sentences"], "left").fillna(
        {"score": 0.0}
    )

    # top-k by score; numpy argsort is stable ascending, so `[-k:]` keeps
    # the *last* occurrence among ties — i.e. ties prefer the LATER
    # sentence position (:102). Emulate: desc score, desc sent_pos.
    wk = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.desc("sent_pos"))
    picked = sent_scores.withColumn("k_rank", F.row_number().over(wk)).filter(
        F.col("k_rank") <= num_sentences
    )
    # restore original order (:103) and join (:106)
    return (
        picked.groupBy("doc_id")
        .agg(
            F.concat(
                F.array_join(
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("sent_pos", "sentence"))),
                        lambda s: s.sentence,
                    ),
                    ". ",
                ),
                F.lit("."),
            ).alias("general_summary")
        )
    )
