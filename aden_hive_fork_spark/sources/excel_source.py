"""Excel source: every sheet a table, JOINs across sheets.

Reference surface (tools/src/aden_tools/tools/excel_tool/excel_tool.py):
- excel_read(path, sheet, limit, offset), typed cells (:16-145,792-801)
- excel_sql(path, query, sheet): one table per sheet, target sheet
  aliased ``data`` (:474-654; join example :508)
- excel_sheet_list (:420-471), excel_search match modes (:656-789)

Excel is inherently small-data, so the file bridge is driver-side:
the pure-stdlib xlsx parser (``xlsx_stdlib`` — zipfile + xml.etree,
no openpyxl needed) reads/writes workbooks; sheets become Spark
DataFrames for distributed SQL.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine import MAX_RESULT_ROWS
from ..guard import ensure_read_only
from .xlsx_stdlib import read_workbook, write_workbook


def sheets_to_views(
    spark: SparkSession, sheets: dict[str, DataFrame], target_sheet: str | None = None
) -> list[str]:
    """Register each sheet as a temp view named after the sheet; the
    target (or first) sheet is additionally aliased ``data``
    (reference excel_tool.py:580-617)."""
    names = []
    for name, df in sheets.items():
        df.createOrReplaceTempView(name)
        names.append(name)
    if sheets:
        target = target_sheet if target_sheet in sheets else next(iter(sheets))
        sheets[target].createOrReplaceTempView("data")
    return names


def excel_sql_frames(
    spark: SparkSession,
    sheets: dict[str, DataFrame],
    query: str,
    sheet: str | None = None,
    max_rows: int = MAX_RESULT_ROWS,
) -> dict[str, Any]:
    """Multi-table SQL over in-memory "sheets" — the engine half of
    excel_sql, usable with any DataFrame dict."""
    ensure_read_only(query)
    try:
        sheets_to_views(spark, sheets, sheet)
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


def _typed_frame(spark: SparkSession, rows: list[list[Any]]):
    """Header row + typed body rows -> Spark DataFrame, preserving the
    reference's cell typing (int/float/str/bool/datetime→ISO,
    excel_tool.py:792-801). Mixed-type columns fall back to string."""
    import pandas as pd

    if not rows:
        return spark.createDataFrame([], "col1 string")
    header = [str(h) if h is not None else f"col{i+1}" for i, h in enumerate(rows[0])]
    body = [
        [v.isoformat() if isinstance(v, (_dt.datetime, _dt.date)) else v for v in r]
        for r in rows[1:]
    ]
    pdf = pd.DataFrame(body, columns=header)
    for col in pdf.columns:
        vals = [v for v in pdf[col] if v is not None]
        types = {type(v) for v in vals}
        if types <= {int} and vals:
            pdf[col] = pdf[col].astype("Int64")
        elif types <= {int, float} and vals:
            pdf[col] = pdf[col].astype("float64")
        elif types <= {bool} and vals:
            pdf[col] = pdf[col].astype("boolean")
        else:
            pdf[col] = pdf[col].map(lambda v: None if v is None else str(v))
    return spark.createDataFrame(pdf)


def read_sheets(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """Workbook -> {sheet_name: DataFrame} via the stdlib xlsx parser;
    first row of each sheet is the header (excel_tool.py read
    contract)."""
    return {
        name: _typed_frame(spark, rows) for name, rows in read_workbook(path).items()
    }


def excel_read(
    spark: SparkSession,
    path: str,
    sheet: str | None = None,
    limit: int = 1000,
    offset: int = 0,
) -> dict[str, Any]:
    """Reference ``excel_read`` (excel_tool.py:16-145): typed cells,
    limit/offset pagination over the target (or first) sheet."""
    try:
        books = read_workbook(path)
        if not books:
            return {"success": False, "error": "workbook has no sheets"}
        name = sheet if sheet in books else next(iter(books))
        rows = books[name]
        header = [str(h) if h is not None else "" for h in (rows[0] if rows else [])]
        body = rows[1 + offset : 1 + offset + limit]
        data = [
            [v.isoformat() if isinstance(v, (_dt.datetime, _dt.date)) else v for v in r]
            for r in body
        ]
        return {
            "success": True,
            "sheet": name,
            "columns": header,
            "rows": data,
            "row_count": len(data),
            "total_rows": max(0, len(rows) - 1),
            "truncated": offset + len(data) < len(rows) - 1,
        }
    except Exception as exc:
        return {"success": False, "error": str(exc)}


def excel_write(path: str, sheets: dict[str, tuple[list[str], list[list[Any]]]]) -> dict:
    """Reference ``excel_write`` (excel_tool.py:148-330): each sheet a
    (columns, rows) pair; header row written first."""
    try:
        write_workbook(
            path, {name: [cols, *rows] for name, (cols, rows) in sheets.items()}
        )
        return {
            "success": True,
            "path": path,
            "sheets": {n: len(rows) for n, (_, rows) in sheets.items()},
        }
    except Exception as exc:
        return {"success": False, "error": str(exc)}


def excel_write_df(path: str, sheets: dict[str, DataFrame], max_rows: int = 100_000) -> dict:
    """DataFrame sink: collect (bounded) and write — Excel is a small-
    data interchange format, never the 100 TB path (that's parquet)."""
    payload = {}
    for name, df in sheets.items():
        rows = df.limit(max_rows).collect()
        payload[name] = (list(df.columns), [list(r) for r in rows])
    return excel_write(path, payload)


def excel_sql(
    spark: SparkSession,
    path: str,
    query: str,
    sheet: str | None = None,
    max_rows: int = MAX_RESULT_ROWS,
) -> dict[str, Any]:
    """Reference excel_sql: load workbook, one view per sheet + ``data``
    alias, run read-only SQL."""
    return excel_sql_frames(spark, read_sheets(spark, path), query, sheet, max_rows)


# -- excel_search match modes (excel_tool.py:746-772) as a predicate --

def search_predicate(cols: list[str], needle: str, mode: str = "contains",
                     case_insensitive: bool = True) -> Column:
    """OR-across-columns string match with the reference's four modes:
    contains / exact / starts_with / ends_with."""
    def one(c: str) -> Column:
        col = F.col(c).cast("string")
        pat = needle
        if case_insensitive:
            col, pat = F.lower(col), needle.lower()
        if mode == "exact":
            return col == pat
        if mode == "starts_with":
            return col.startswith(pat)
        if mode == "ends_with":
            return col.endswith(pat)
        return col.contains(pat)

    pred = one(cols[0])
    for c in cols[1:]:
        pred = pred | one(c)
    return pred
