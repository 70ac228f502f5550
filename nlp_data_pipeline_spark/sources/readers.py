"""Non-parquet sources: csv / json / text / binaryFile (+ PDF extraction).

Reference parity: the app's only source is PDF upload
(/root/reference/nlp_data_tagging.py:37-47, :370-375). Here that
becomes ``spark.read.format("binaryFile")`` → Arrow-batched extraction
kernel; csv/json/text readers round out the envelope (SURVEY.md §2.B
"Scans/sources").

The PDF text extractor is import-gated: this container ships no PDF
library, so ``extract_pdf_text`` degrades to the reference's own error
path (:45-47 — errors become None) with a clearly marked stub.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_csv(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    reader = spark.read.option("header", True)
    reader = reader.schema(schema) if schema else reader.option("inferSchema", True)
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def read_text(spark: SparkSession, path: str, whole: bool = False) -> DataFrame:
    return spark.read.text(path, wholetext=whole)


def read_binary_files(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Opaque file ingestion: (path, modificationTime, length, content)."""
    return (
        spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    )


def _extract_pdf_bytes(content: bytes) -> str | None:
    """Per-file PDF → text. Reference parity (:37-47): page texts joined
    with '\\n'; any failure → None (the app shows an error banner and
    skips the file)."""
    try:
        import io

        try:
            from pypdf import PdfReader  # not shipped in this container
        except ImportError:
            from PyPDF2 import PdfReader  # reference's own dependency (:11)
        reader = PdfReader(io.BytesIO(content))
        return "".join((page.extract_text() or "") + "\n" for page in reader.pages)
    except Exception:
        return None


def extract_pdf_text(files_df: DataFrame) -> DataFrame:
    """binaryFile scan → (path, raw_text) via Arrow-batched extraction.

    STUB NOTE: without a PDF library installed every row degrades to
    raw_text = NULL — exactly the reference's error path (:45-47). The
    Spark-side plumbing (binary column in, text out, batch iteration)
    is real and tested with synthetic payloads.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "raw_text": pdf["content"].map(_extract_pdf_bytes),
                }
            )

    return files_df.select("path", "content").mapInPandas(
        extract, "path string, raw_text string"
    )
