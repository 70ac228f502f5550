"""End-to-end document pipeline — the reference application's main()
flow as ONE declarative DataFrame program.

Reference structure (/root/reference/nlp_data_tagging.py:387-431):
pass 1 per document: extract → preprocess → tokenize → summarize,
building the results record (:410-418); pass 2: corpus topic fit then
per-doc tags (:421-429); then export projection + CSV (:515-535).

Here pass 1 is a single narrow select (no shuffle at all), pass 2 is
the MLlib fit/transform barrier (inherent — model state must exist
before inference), and the export is a projection + csv sink. The
reference's sequential per-file loop disappears: every stage is
partition-parallel.

p01/p02 are the oracle surface: every deterministic column of the
reference's export schema (:515-526). p03 adds the LDA tags column
(rows-only: model-dependent). r01 exercises the csv sink+source round
trip. a01 covers the approximate-aggregate envelope (HLL distinct,
approximate percentiles) — engine-specific sketches, so rows-only with
a tolerance unit test (tests/test_doc_pipeline.py).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nlp_data_pipeline_spark.functions.text import clean_text, tokenize_joined, truncate_at_word
from nlp_data_pipeline_spark.operators.text_analytics import _CLEAN_SQL, _STOP_SQL
from nlp_data_pipeline_spark.sources.catalog import load_table
from nlp_data_pipeline_spark.sources.writers import write_csv

_SUMMARY_SQL = """
CASE WHEN length(ctext) > 150 THEN
  CASE WHEN strpos(reverse(substring(ctext, 1, 150)), ' ') > 0
       THEN substring(ctext, 1, 150 - strpos(reverse(substring(ctext, 1, 150)), ' ')) || '...'
       ELSE substring(ctext, 1, 150) || '...'
  END
ELSE ctext END
"""


# --------------------------------------------------------------------------
# p01: per-document pipeline records (reference :410-418, minus tags).
# filename ≅ "doc_<id>.txt" (the driver corpus has no file names).
# The summary column takes the early-exit branch on this corpus; the
# general path is the same machinery as t05.
# --------------------------------------------------------------------------
def p01_document_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    ctext = clean_text("text")
    return d.select(
        F.concat(F.lit("doc_"), F.col("doc_id"), F.lit(".txt")).alias("filename"),
        ctext.alias("cleaned_text"),
        tokenize_joined(ctext).alias("processed_text"),
        truncate_at_word(ctext, 150).alias("summary"),
        F.length("text").cast("long").alias("text_length"),
        F.length(truncate_at_word(ctext, 150)).cast("long").alias("summary_length"),
    )


P01_SQL = f"""
WITH cleaned AS (SELECT doc_id, text, {_CLEAN_SQL} AS ctext FROM documents),
toks AS (
  SELECT doc_id, text, ctext,
         list_filter(string_split(ctext, ' '),
                     t -> length(t) > 2 AND lower(t) NOT IN ({_STOP_SQL}) AND t != '') AS tok_list
  FROM cleaned
)
SELECT 'doc_' || doc_id || '.txt' AS filename,
       ctext AS cleaned_text,
       array_to_string(tok_list, ' ') AS processed_text,
       {_SUMMARY_SQL} AS summary,
       length(text) AS text_length,
       length({_SUMMARY_SQL}) AS summary_length
FROM toks
"""


# --------------------------------------------------------------------------
# p02: export projection (reference :515-526): the CSV schema the app
# offers for download, tags excluded (model-dependent → p03).
# --------------------------------------------------------------------------
def p02_export_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    rec = p01_document_records(spark, sf_dir)
    return rec.select(
        F.col("filename").alias("Filename"),
        F.col("summary").alias("Summary"),
        F.col("text_length").alias("Original_Length"),
        F.col("summary_length").alias("Summary_Length"),
        F.round(F.col("summary_length") / F.col("text_length"), 3).alias("Compression_Ratio"),
    )


P02_SQL = f"""
WITH cleaned AS (SELECT doc_id, text, {_CLEAN_SQL} AS ctext FROM documents)
SELECT 'doc_' || doc_id || '.txt' AS "Filename",
       {_SUMMARY_SQL} AS "Summary",
       length(text) AS "Original_Length",
       length({_SUMMARY_SQL}) AS "Summary_Length",
       round(CAST(length({_SUMMARY_SQL}) AS DOUBLE) / length(text), 3) AS "Compression_Ratio"
FROM cleaned
"""


# --------------------------------------------------------------------------
# p03: full records WITH tags — the complete reference app output
# (:426-429 + :515-526). Rows-only: tags come from the fitted LDA.
# --------------------------------------------------------------------------
def p03_records_with_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nlp_data_pipeline_spark.operators.nlp_model import n02_doc_tags

    d = load_table(spark, sf_dir, "documents")
    rec = p01_document_records(spark, sf_dir).withColumn(
        "doc_id", F.regexp_extract("filename", r"doc_(\d+)\.txt", 1).cast("long")
    )
    tags = n02_doc_tags(spark, sf_dir)
    return (
        rec.join(tags, "doc_id")
        .select(
            "filename",
            "summary",
            F.array_join("tags", ", ").alias("tags_joined"),  # :521 ', '.join
            "text_length",
            "summary_length",
        )
    )


# --------------------------------------------------------------------------
# r01: csv sink → source round trip (reference R25 sink + §2.B csv
# reader). Integer columns only, so the round trip is value-exact; the
# oracle computes the same aggregate straight from parquet.
# --------------------------------------------------------------------------
def r01_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    rec = p01_document_records(spark, sf_dir).select(
        "filename", "text_length", "summary_length"
    )
    out = os.path.join(tempfile.mkdtemp(prefix="csv_export_"), "export")
    write_csv(rec, out)
    back = spark.read.option("header", True).schema(
        "filename string, text_length long, summary_length long"
    ).csv(out)
    return back.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("text_length").alias("total_chars"),
        F.sum("summary_length").alias("total_summary_chars"),
    )


R01_SQL = f"""
WITH cleaned AS (SELECT doc_id, text, {_CLEAN_SQL} AS ctext FROM documents)
SELECT COUNT(*) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(SUM(length({_SUMMARY_SQL})) AS BIGINT) AS total_summary_chars
FROM cleaned
"""


# --------------------------------------------------------------------------
# r02: corrupt-record JSON ingestion — robust reading, the property a
# 100 TB pipeline cannot skip (bad records are a statistical certainty
# at scale). A JSONL export is built with a deterministic fault
# injection (every doc_id ≡ 3 mod 7 gets a truncated line), then read
# back PERMISSIVE with an explicit _corrupt_record column: good rows
# parse, bad rows land in the corrupt column instead of killing the
# job. The oracle knows the fault pattern and states the expected
# good/corrupt split and the good-row checksum directly.
# --------------------------------------------------------------------------
def r02_corrupt_json_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    line = F.when(
        F.col("doc_id") % 7 == 3,
        F.concat(F.lit('{"doc_id": '), F.col("doc_id"), F.lit(', "source": "')),
    ).otherwise(F.to_json(F.struct("doc_id", "source")))
    out = os.path.join(tempfile.mkdtemp(prefix="json_ingest_"), "docs_jsonl")
    d.select(line.alias("value")).write.mode("overwrite").text(out)

    back = spark.read.schema(
        "doc_id long, source string, _corrupt_record string"
    ).option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_corrupt_record").json(out)
    return back.agg(
        F.count(F.when(F.col("_corrupt_record").isNull(), 1)).alias("n_good"),
        F.count(F.when(F.col("_corrupt_record").isNotNull(), 1)).alias("n_corrupt"),
        F.sum(F.when(F.col("_corrupt_record").isNull(), F.col("doc_id"))).alias(
            "good_docid_sum"
        ),
        F.count_distinct(
            F.when(F.col("_corrupt_record").isNull(), F.col("source"))
        ).alias("n_good_sources"),
    )


R02_SQL = """
SELECT COUNT(*) FILTER (doc_id % 7 != 3) AS n_good,
       COUNT(*) FILTER (doc_id % 7 = 3) AS n_corrupt,
       SUM(doc_id) FILTER (doc_id % 7 != 3) AS good_docid_sum,
       COUNT(DISTINCT source) FILTER (doc_id % 7 != 3) AS n_good_sources
FROM documents
"""


# --------------------------------------------------------------------------
# a01: approximate aggregates — HLL++ distinct + approx percentiles.
# Sketches are engine-specific (Spark HLL++ vs DuckDB HLL give
# different estimates), so rows-only; the tolerance-vs-exact invariant
# is unit-tested instead. At 100 TB these replace exact distinct/
# percentile wherever a ±2% answer is acceptable — no giant shuffle.
# --------------------------------------------------------------------------
def a01_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000).alias(
            "price_percentiles"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    ).orderBy("l_returnflag")


QUERIES = {
    "p01_document_records": p01_document_records,
    "p02_export_projection": p02_export_projection,
    "p03_records_with_tags": p03_records_with_tags,
    "r01_csv_roundtrip": r01_csv_roundtrip,
    "r02_corrupt_json_ingest": r02_corrupt_json_ingest,
    "a01_approx_stats": a01_approx_stats,
}

ORACLES = {
    "p01_document_records": P01_SQL,
    "p02_export_projection": P02_SQL,
    "r01_csv_roundtrip": R01_SQL,
    "r02_corrupt_json_ingest": R02_SQL,
    # p03: rows-only (LDA tags); a01: rows-only (engine-specific sketches)
}
