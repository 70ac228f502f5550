"""Reader/writer round trips + binaryFile/PDF-stub plumbing."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from nlp_data_pipeline_spark.sources.readers import (
    extract_pdf_text,
    read_binary_files,
    read_csv,
    read_json,
)
from nlp_data_pipeline_spark.sources.writers import write_csv, write_json, write_parquet


@pytest.fixture()
def tiny(spark):
    return spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", 2.5), (3, "gamma", -0.5)],
        "id long, name string, score double",
    )


def test_csv_round_trip(spark, tiny):
    path = os.path.join(tempfile.mkdtemp(), "csv")
    write_csv(tiny, path)
    back = read_csv(spark, path, "id long, name string, score double")
    assert sorted(back.collect()) == sorted(tiny.collect())


def test_json_round_trip(spark, tiny):
    path = os.path.join(tempfile.mkdtemp(), "json")
    write_json(tiny, path)
    back = read_json(spark, path, "id long, name string, score double")
    assert sorted(back.collect()) == sorted(tiny.collect())


def test_partitioned_parquet_layout_and_pruning(spark, tiny):
    path = os.path.join(tempfile.mkdtemp(), "pq")
    write_parquet(tiny.withColumn("part", F.col("id") % 2), path, partition_by=["part"])
    # physical layout: one dir per partition value
    assert sorted(d for d in os.listdir(path) if d.startswith("part=")) == ["part=0", "part=1"]
    back = spark.read.parquet(path).filter(F.col("part") == 1)
    assert back.count() == 2
    # partition pruning reached the scan
    from nlp_data_pipeline_spark.plans.explain import formatted_plan

    assert "PartitionFilters" in formatted_plan(back)


def test_binary_file_scan_and_pdf_stub(spark):
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "fake.pdf"), "wb") as f:
        f.write(b"%PDF-1.4 not really a pdf")
    files = read_binary_files(spark, d, "*.pdf")
    row = files.select("path", "length", "content").first()
    assert row["length"] == 25 and row["content"].startswith(b"%PDF")
    # no PDF lib in this container → reference error path: raw_text NULL
    out = extract_pdf_text(files).first()
    assert out["raw_text"] is None
