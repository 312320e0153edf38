"""Excel source: every sheet a table, JOINs across sheets.

Reference surface (tools/src/aden_tools/tools/excel_tool/excel_tool.py):
- excel_read(path, sheet, limit, offset), typed cells (:16-145,792-801)
- excel_sql(path, query, sheet): one table per sheet, target sheet
  aliased ``data`` (:474-654; join example :508)
- excel_sheet_list (:420-471), excel_search match modes (:656-789)

Excel is inherently small-data, so the file bridge is driver-side
pandas/openpyxl (gated: the lib may be absent — the Spark-side logic
is factored so it's fully testable with synthetic DataFrames via
``excel_sql_frames``).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine import MAX_RESULT_ROWS
from ..guard import ensure_read_only

try:  # pragma: no cover - environment probe
    import openpyxl  # noqa: F401

    HAVE_OPENPYXL = True
except ImportError:
    HAVE_OPENPYXL = False


def _require_openpyxl() -> None:
    if not HAVE_OPENPYXL:
        raise NotImplementedError(
            "Excel file I/O requires openpyxl, which is not installed in "
            "this environment. The Spark-side multi-sheet SQL logic is "
            "available via excel_sql_frames()."
        )


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


def read_sheets(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """Workbook -> {sheet_name: DataFrame} via the pandas bridge,
    preserving the reference's cell typing (int/float/str/bool/
    datetime→ISO, excel_tool.py:792-801)."""
    _require_openpyxl()
    import pandas as pd

    out: dict[str, DataFrame] = {}
    for name, pdf in pd.read_excel(path, sheet_name=None).items():
        for col in pdf.columns:
            if pdf[col].dtype == "datetime64[ns]":
                pdf[col] = pdf[col].dt.strftime("%Y-%m-%dT%H:%M:%S")
        out[name] = spark.createDataFrame(pdf)
    return out


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
