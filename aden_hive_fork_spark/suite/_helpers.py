"""Shared helpers for the declared query suite."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def dec(col: str | Column, scale: int = 2, precision: int = 18) -> Column:
    """Cast to DECIMAL so aggregate arithmetic is exact (bit-identical
    between Spark and DuckDB regardless of summation order)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dround(c: Column, n: int = 2) -> Column:
    """ROUND(x, n) cast to DOUBLE — the canonical numeric output type
    of the suite (both engines produce the identical IEEE double for
    the same exact decimal input)."""
    return F.round(c, n).cast("double")


def avg2(sum_dec: Column, count: Column, n: int = 2) -> Column:
    """Deterministic AVG: exact decimal SUM → double → one IEEE
    division by the count → round. Identical in Spark and DuckDB
    (decimal→double conversion is correctly rounded in both)."""
    return F.round(sum_dec.cast("double") / count.cast("double"), n).cast("double")


# DuckDB oracle fragment mirroring avg2():
#   ROUND(CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 2)
