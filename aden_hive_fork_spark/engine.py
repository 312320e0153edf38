"""Engine facade: guarded SQL with the reference's result envelope.

The reference's core query path is ``csv_sql`` / ``excel_sql``: load
tabular data as named tables, run arbitrary *read-only* SQL, return
``{success, columns, rows, row_count}``
(reference: tools/src/aden_tools/tools/csv_tool/csv_tool.py:273-385,
excel_tool.py:474-654). ``Engine`` gives the same contract on Spark:
views come from the catalog (parquet/CSV/Excel sources), the guard
blocks writes, Catalyst does all optimization.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from . import catalog
from .guard import SqlGuardError, ensure_read_only

__all__ = ["Engine", "SqlGuardError"]

# Safety cap mirroring the reference's result-row limits
# (postgres_tool.py:307 MAX_ROWS, bigquery_tool.py:206-214 hard cap 10000).
MAX_RESULT_ROWS = 10_000


class Engine:
    """A thin, session-owning facade over Spark SQL."""

    def __init__(self, spark: SparkSession | None = None, sf_dir: str | None = None):
        if spark is None:
            from .session import build_session

            spark = build_session()
        self.spark = spark
        if sf_dir:
            catalog.register_views(spark, sf_dir)

    # -- query ---------------------------------------------------------

    def df(self, query: str, dialect: str | None = None) -> DataFrame:
        """Parse+analyze a guarded read-only query; execution stays lazy.

        ``dialect="duckdb"`` first rewrites the reference's DuckDB-isms
        to Spark SQL (functions.dialect) — the migration path for
        queries written against the reference's csv_sql/excel_sql.
        """
        if dialect == "duckdb":
            from .functions.dialect import duckdb_to_spark_sql

            query = duckdb_to_spark_sql(query)
        ensure_read_only(query)
        return self.spark.sql(query)

    def sql(
        self,
        query: str,
        max_rows: int = MAX_RESULT_ROWS,
        dialect: str | None = None,
    ) -> dict[str, Any]:
        """Run read-only SQL, return the reference's result envelope
        (csv_tool.py:368-376): success, columns, rows (list of dicts),
        row_count, plus ``truncated`` mirroring bigquery_tool's
        ``query_truncated`` flag (bigquery_tool.py:206-243).
        """
        try:
            df = self.df(query, dialect=dialect)
            # limit(n+1) keeps the collect bounded (never materializes the
            # full result on the driver) while still detecting truncation.
            collected = df.limit(max_rows + 1).collect()
        except SqlGuardError:
            raise
        except Exception as exc:  # analysis/execution errors -> envelope
            return {"success": False, "error": str(exc), "columns": [], "rows": [], "row_count": 0}
        truncated = len(collected) > max_rows
        rows = [r.asDict(recursive=True) for r in collected[:max_rows]]
        return {
            "success": True,
            "columns": list(df.columns),
            "rows": rows,
            "row_count": len(rows),
            "truncated": truncated,
        }

    # -- introspection --------------------------------------------------

    def explain(self, query: str, mode: str = "formatted") -> str:
        """Analog of ``pg_explain`` (postgres_tool.py:478+)."""
        ensure_read_only(query)
        return self.spark.sql(query)._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            self.spark.sql(query)._jdf.queryExecution(), mode
        )

    def list_tables(self) -> list[str]:
        return catalog.list_tables(self.spark)

    def table_info(self, name: str, with_count: bool = True) -> dict:
        return catalog.describe_table(self.spark, name, with_count=with_count)
