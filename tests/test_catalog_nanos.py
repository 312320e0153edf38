"""nanosAsLong conf hygiene (VERDICT r1 'What's wrong' #3).

``load_table`` must not leave ``spark.sql.legacy.parquet.nanosAsLong``
set on the session: any OTHER nano-timestamp parquet read through the
same session would silently come back as BIGINT. The engine path
(``load_table``) converts nano columns to ``timestamp_ntz`` for every
table, driver-known or not (footer-driven detection).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import LongType, TimestampNTZType

from conftest import SF_SMALL


@pytest.fixture()
def nano_parquet(tmp_path):
    t = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            # 2024-01-01T00:00:00.123456789, +1d, +2d
            "ts": pa.array(
                [1704067200123456789, 1704153600000000001, 1704240000999999999],
                pa.timestamp("ns"),
            ),
        }
    )
    p = os.path.join(tmp_path, "nano.parquet")
    pq.write_table(t, p, version="2.6")
    return str(tmp_path)


def test_load_table_does_not_leak_nanos_conf(spark):
    from aden_hive_fork_spark.catalog import load_table

    ev = load_table(spark, SF_SMALL, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampNTZType)
    # conf restored: other sessions' parquet reads are unaffected
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "false"
    # lazy execution still works after the conf was restored
    assert ev.count() > 0


def test_foreign_nano_parquet_gets_timestamp_ntz(spark, nano_parquet):
    """A NON-driver table with a TIMESTAMP(NANOS) column, read through
    the engine's catalog path, lands as timestamp_ntz (truncated to
    micros, like DuckDB's ns->us narrowing) — not BIGINT."""
    from aden_hive_fork_spark.catalog import load_table

    df = load_table(spark, nano_parquet, "nano")
    assert isinstance(df.schema["ts"].dataType, TimestampNTZType)
    rows = {r["id"]: r["ts"] for r in df.collect()}
    assert rows[1].isoformat() == "2024-01-01T00:00:00.123456"
    assert rows[3].isoformat() == "2024-01-03T00:00:00.999999"
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "false"


def test_load_events_raw_keeps_pushdown_long(spark):
    from aden_hive_fork_spark.catalog import load_events_raw

    raw = load_events_raw(spark, SF_SMALL)
    assert isinstance(raw.schema["ts_ns"].dataType, LongType)
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "false"
    assert raw.count() > 0
