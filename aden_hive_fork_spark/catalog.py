"""Catalog: register parquet tables as temp views and describe them.

Mirrors the reference's catalog surface — ``pg_list_schemas`` /
``pg_list_tables`` / ``pg_describe_table``
(reference: tools/src/aden_tools/tools/postgres_tool/postgres_tool.py:358-475),
``excel_sheet_list`` (excel_tool.py:420-471), ``csv_info``
(csv_tool.py:215-271) — on top of ``spark.catalog``.

Timestamp note (driver testdata): most tables carry parquet
TIMESTAMP(MILLIS, ntz) columns which Spark reads natively as
``timestamp_ntz``; ``events.ts`` is TIMESTAMP(NANOS, ntz), which Spark
only reads with ``spark.sql.legacy.parquet.nanosAsLong=true`` (as a
BIGINT of epoch-nanos). ``load_table`` converts that column to
``timestamp_ntz`` by truncating to microseconds — exactly what DuckDB
does when it narrows ns→µs — using pure NTZ arithmetic so the result
is independent of the session timezone.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The driver's deterministic testdata tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# table -> columns stored as parquet TIMESTAMP(NANOS) (read as long ns).
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _ns_long_to_ntz(col: str) -> F.Column:
    """epoch-nanos BIGINT -> timestamp_ntz, truncating to microseconds.

    ``timestampadd`` on an NTZ base is timezone-independent, so the
    same instant is produced no matter what the (driver's) session
    timezone is set to.
    """
    return F.expr(f"timestampadd(MICROSECOND, CAST(`{col}` div 1000 AS BIGINT), {_EPOCH_NTZ})")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table with engine-canonical column types.

    Stays declarative: column pruning + filter pushdown reach the
    parquet scan for every natively-typed column. For the ns-encoded
    ``events.ts`` the conversion is a projection over the pushdown-
    friendly raw long (see ``load_events_raw`` for range-scan paths).
    """
    ns_cols = _NANOS_TS_COLS.get(name, ())
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    for c in ns_cols:
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            df = df.withColumn(c, _ns_long_to_ntz(c))
    return df


def load_events_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` left as epoch-nanos BIGINT (``ts_ns``).

    Scale path: a predicate on the raw long column is pushed down to
    the parquet scan (row-group pruning on a 100 TB event log), while
    a predicate on the converted timestamp is evaluated post-scan.
    Filter here first, then ``with_ts()``-style convert.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(table_path(sf_dir, "events")).withColumnRenamed("ts", "ts_ns")


def ns_literal(iso_ts: str) -> int:
    """ISO timestamp string -> epoch-nanos int for raw-long pushdown filters."""
    import datetime as _dt

    dt = _dt.datetime.fromisoformat(iso_ts)
    return int(dt.replace(tzinfo=_dt.timezone.utc).timestamp() * 1_000_000) * 1_000


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> list[str]:
    """Register every available table in ``sf_dir`` as a temp view.

    Views are lazy: registration does not scan data, so calling this
    per-query is cheap.
    """
    registered = []
    for name in tables:
        if os.path.exists(table_path(sf_dir, name)):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
            registered.append(name)
    return registered


def list_tables(spark: SparkSession) -> list[str]:
    """Analog of pg_list_tables / excel_sheet_list."""
    return sorted(t.name for t in spark.catalog.listTables())


def describe_table(spark: SparkSession, name: str, with_count: bool = True) -> dict:
    """Analog of pg_describe_table / csv_info / excel_info: columns,
    types, nullability, optional row count
    (reference: csv_tool.py:215-271, postgres_tool.py:427-475)."""
    df = spark.table(name)
    info: dict = {
        "success": True,
        "table": name,
        "columns": [
            {"name": f.name, "type": f.dataType.simpleString(), "nullable": f.nullable}
            for f in df.schema.fields
        ],
    }
    if with_count:
        info["row_count"] = df.count()
    return info
