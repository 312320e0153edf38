"""CSV source/sink with the reference tool's semantics on Spark.

Reference surface (tools/src/aden_tools/tools/csv_tool/csv_tool.py):
- csv_read(path, limit, offset) -> rows+columns+total_rows (:15-88)
- csv_write(path, columns, rows) / csv_append(path, rows) (:91-212)
- csv_info(path) -> columns, row count, size (:215-271)
- csv_sql(path, query) -> CSV registered as table ``data``, arbitrary
  read-only SELECT (:273-385)

Spark-first: `spark.read.csv` (distributed scan, schema inference at
ingestion only), `df.write.csv` (job-commit atomic), Spark SQL over a
temp view. The reference reads CSV as all-strings (csv.DictReader,
test_csv_tool.py:102) and only types on the SQL path (DuckDB
read_csv_auto, :358) — mirrored here with ``infer_schema``.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..engine import MAX_RESULT_ROWS
from ..guard import ensure_read_only


def _read(spark: SparkSession, path: str, infer_schema: bool) -> DataFrame:
    return (
        spark.read.option("header", True)
        .option("inferSchema", infer_schema)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def csv_read(
    spark: SparkSession,
    path: str,
    limit: int | None = None,
    offset: int = 0,
    infer_schema: bool = False,
) -> dict[str, Any]:
    """Paged read. All-string by default (reference parity). The page
    is taken with offset/limit *after* a deterministic order on the
    input order is NOT guaranteed by Spark across partitions — for
    single-file CSVs (the tool's use case) ordering matches the file.
    """
    try:
        df = _read(spark, path, infer_schema)
        total = df.count()
        page = df.offset(offset).limit(limit) if limit is not None else df.offset(offset)
        rows = [r.asDict() for r in page.collect()]
        return {
            "success": True,
            "columns": list(df.columns),
            "rows": rows,
            "row_count": len(rows),
            "total_rows": total,
        }
    except Exception as exc:
        return {"success": False, "error": str(exc)}


def csv_write(
    spark: SparkSession, path: str, columns: list[str], rows: list[dict[str, Any]]
) -> dict[str, Any]:
    """Write rows (reference csv_write). Uses a single partition so the
    output is one CSV file like the tool produced; large DataFrames
    should use ``df.write.csv`` directly instead."""
    try:
        df = spark.createDataFrame(
            [[r.get(c) for c in columns] for r in rows],
            schema=", ".join(f"`{c}` string" for c in columns),
        )
        df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
        return {"success": True, "path": path, "rows_written": len(rows)}
    except Exception as exc:
        return {"success": False, "error": str(exc)}


def csv_append(spark: SparkSession, path: str, rows: list[dict[str, Any]]) -> dict[str, Any]:
    """Append rows matching the existing header (reference csv_append
    validates columns against the header, csv_tool.py:91-160)."""
    try:
        existing = _read(spark, path, infer_schema=False)
        columns = list(existing.columns)
        bad = [c for r in rows for c in r if c not in columns]
        if bad:
            return {"success": False, "error": f"unknown columns: {sorted(set(bad))}"}
        df = spark.createDataFrame(
            [[r.get(c) for c in columns] for r in rows],
            schema=", ".join(f"`{c}` string" for c in columns),
        )
        # header=True on the appended part file too: Spark's CSV reader
        # skips the first line of every file in a header=True directory.
        df.coalesce(1).write.mode("append").option("header", True).csv(path)
        return {"success": True, "path": path, "rows_appended": len(rows)}
    except Exception as exc:
        return {"success": False, "error": str(exc)}


def csv_info(spark: SparkSession, path: str) -> dict[str, Any]:
    """columns + row count + size (reference csv_info, :215-271)."""
    try:
        df = _read(spark, path, infer_schema=False)
        size = 0
        if os.path.isfile(path):
            size = os.path.getsize(path)
        elif os.path.isdir(path):
            size = sum(
                os.path.getsize(os.path.join(d, f))
                for d, _, fs in os.walk(path)
                for f in fs
            )
        return {
            "success": True,
            "columns": list(df.columns),
            "row_count": df.count(),
            "size_bytes": size,
        }
    except Exception as exc:
        return {"success": False, "error": str(exc)}


def csv_sql(
    spark: SparkSession, path: str, query: str, max_rows: int = MAX_RESULT_ROWS
) -> dict[str, Any]:
    """The reference's core path (csv_tool.py:273-385): CSV as table
    ``data`` (typed via inference, like read_csv_auto), arbitrary
    read-only SELECT, envelope result."""
    ensure_read_only(query)
    try:
        _read(spark, path, infer_schema=True).createOrReplaceTempView("data")
        df = spark.sql(query)
        collected = df.limit(max_rows + 1).collect()
        truncated = len(collected) > max_rows
        rows = [r.asDict(recursive=True) for r in collected[:max_rows]]
        return {
            "success": True,
            "columns": list(df.columns),
            "rows": rows,
            "row_count": len(rows),
            "truncated": truncated,
        }
    except Exception as exc:
        return {"success": False, "error": str(exc)}
