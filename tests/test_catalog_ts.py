"""Pin sources/catalog.normalize_event_ts across every events.ts
physical layout the testdata generator has shipped.

The driver regenerates the parquet between rounds and has already
switched layouts once (int64 TIMESTAMP(NANOS) → timestamp[us]/NTZ),
silently breaking every watermark query. This test writes one tiny
events.parquet per layout and asserts the catalog reader and the
streaming reader both deliver identical session-tz TIMESTAMP values —
so the next layout change fails HERE, not in the driver.
"""

import datetime
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nlp_data_pipeline_spark.sources.catalog import load_table

TS_VALUES = [
    datetime.datetime(2024, 1, 1, 0, 10, 30, 123456),
    datetime.datetime(2024, 1, 2, 13, 59, 59, 999999),
]


def _write_events(tmp: str, ts_array: pa.Array) -> str:
    sf_dir = tempfile.mkdtemp(prefix="cat_ts_", dir=tmp)
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["a", "b"], pa.string()),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(["{}", "{}"], pa.string()),
        }
    )
    pq.write_table(table, os.path.join(sf_dir, "events.parquet"))
    return sf_dir


LAYOUTS = {
    # current generator: µs without the adjusted-to-UTC flag → NTZ in Spark
    "ntz_us": pa.array(TS_VALUES, pa.timestamp("us")),
    # instant-typed µs (adjusted to UTC) → plain TIMESTAMP in Spark
    "ltz_us": pa.array(TS_VALUES, pa.timestamp("us", tz="UTC")),
    # legacy generator: INT64 TIMESTAMP(NANOS), no native Spark type —
    # readable only via the nanosAsLong fallback
    "nanos": pa.array(TS_VALUES, pa.timestamp("ns")),
}


@pytest.mark.parametrize("layout", sorted(LAYOUTS))
def test_load_table_normalizes_every_layout(spark, tmp_path, layout):
    sf_dir = _write_events(str(tmp_path), LAYOUTS[layout])
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = [r.ts for r in df.orderBy("event_id").select("ts").collect()]
    assert got == TS_VALUES


@pytest.mark.parametrize("layout", ["ntz_us", "ltz_us"])
def test_streaming_reader_matches_batch(spark, tmp_path, layout):
    # nanos excluded: once nanosAsLong is set by another test the scan
    # yields bigint regardless of order — batch covers that conversion.
    from nlp_data_pipeline_spark.streaming.pipelines import (
        read_events_stream,
        run_to_memory_sink,
    )

    sf_dir = _write_events(str(tmp_path), LAYOUTS[layout])
    # file stream sources require a directory; sf_dir holds only events.parquet
    stream = read_events_stream(spark, sf_dir)
    assert dict(stream.dtypes)["ts"] == "timestamp"
    # withWatermark must accept the normalized column (the exact call
    # that crashed on TIMESTAMP_NTZ before normalization existed)
    _, out = run_to_memory_sink(stream.withWatermark("ts", "10 minutes"))
    got = sorted(r.ts for r in out.select("ts").collect())
    assert got == TS_VALUES
