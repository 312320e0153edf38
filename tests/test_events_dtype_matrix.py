"""Events-ingestion dtype matrix (VERDICT r2 'Next round' #1/#2).

The driver's testdata changed ``events.ts`` from parquet
TIMESTAMP(NANOS) to TIMESTAMP(MICROS) between rounds, which broke the
three live streaming queries that hard-coded nanos arithmetic. This
matrix writes the SAME logical events in us / ms / ns parquet units
and asserts every ingestion path — batch ``load_table``, raw
``load_events_raw``, and the streaming ``open_events_stream`` — lands
on byte-identical NTZ results regardless of the physical encoding, so
the next unit flip cannot break ingestion again.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

# One logical dataset: micro-precision instants (exactly representable
# in every tested unit except ms, which gets its own ms-aligned set).
_US = [
    1704067200123456,  # 2024-01-01T00:00:00.123456
    1704070800000001,  # 2024-01-01T01:00:00.000001
    1704153600999999,  # 2024-01-02T00:00:00.999999
]
_MS_ALIGNED_US = [(u // 1000) * 1000 for u in _US]


def _write_events(tmp_path, unit: str) -> str:
    """Write a tiny events table with ts in the given parquet unit."""
    us = _MS_ALIGNED_US if unit == "ms" else _US
    scale = {"us": 1, "ms": 1_000, "ns": 1_000}[unit]
    vals = [u // 1_000 if unit == "ms" else u * scale if unit == "ns" else u for u in us]
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "event_type": pa.array(["click", "view", "click"]),
            "user_id": pa.array([10, 11, 10], pa.int64()),
            "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
            "ts": pa.array(vals, pa.timestamp(unit)),
        }
    )
    d = os.path.join(tmp_path, unit)
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, os.path.join(d, "events.parquet"), version="2.6")
    return d


UNITS = ("us", "ms", "ns")


@pytest.mark.parametrize("unit", UNITS)
def test_batch_load_lands_ntz(spark, tmp_path, unit):
    from aden_hive_fork_spark.catalog import load_table

    df = load_table(spark, _write_events(tmp_path, unit), "events")
    assert isinstance(df.schema["ts"].dataType, TimestampNTZType)
    got = [r["ts"].isoformat() for r in df.orderBy("event_id").collect()]
    want_us = _MS_ALIGNED_US if unit == "ms" else _US
    import datetime as dt

    want = [
        dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=u) for u in want_us
    ]
    assert got == [w.isoformat() for w in want]
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "false"


@pytest.mark.parametrize("unit", UNITS)
def test_load_events_raw_ts_ns_contract(spark, tmp_path, unit):
    """ts_ns is BIGINT epoch-nanos under every physical encoding."""
    from aden_hive_fork_spark.catalog import load_events_raw

    raw = load_events_raw(spark, _write_events(tmp_path, unit))
    assert isinstance(raw.schema["ts_ns"].dataType, LongType)
    got = [r["ts_ns"] for r in raw.orderBy("event_id").collect()]
    want_us = _MS_ALIGNED_US if unit == "ms" else _US
    assert got == [u * 1000 for u in want_us]


@pytest.mark.parametrize("unit", UNITS)
def test_streaming_ingestion_matches_batch(spark, tmp_path, unit):
    """open_events_stream + adaptive exprs == batch load, per unit."""
    import uuid

    from aden_hive_fork_spark.catalog import load_table, open_events_stream

    d = _write_events(tmp_path, unit)
    stream, ts_ntz, ts_wm = open_events_stream(spark, d)
    sink = f"mx_{unit}_{uuid.uuid4().hex[:8]}"
    q = (
        stream.withColumn("ts_wm", ts_wm)
        .withColumn("ts", ts_ntz)
        .withWatermark("ts_wm", "1 minute")
        .select("event_id", "ts")
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r["event_id"]: r["ts"] for r in spark.table(sink).collect()
    }
    batch = {
        r["event_id"]: r["ts"]
        for r in load_table(spark, d, "events").select("event_id", "ts").collect()
    }
    assert streamed == batch and len(streamed) == 3


def test_adaptive_exprs_reject_unknown_dtype():
    from aden_hive_fork_spark.catalog import ts_micros_sql

    with pytest.raises(TypeError):
        ts_micros_sql("string", "ts")
