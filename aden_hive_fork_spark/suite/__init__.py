"""Declared query suite: the operator-coverage contract.

Every operator from SURVEY.md §2 that is SQL-expressible gets a pair:
a Spark implementation (DataFrame API — the idiomatic plan, so
Catalyst owns pushdown/broadcast/ordering decisions) and a DuckDB
oracle SQL string the driver runs side-by-side at sf=0.01.

Registration: modules call ``@query(name, oracle=...)``; the driver
entry point (``__spark_entry__.py``) re-exports ``QUERIES`` /
``ORACLE``. Non-SQL-expressible operators register with
``oracle=None`` → driver records a rows-only check.

Determinism contract (SURVEY.md §7.3, memory: duckdb-oracle rules):
- aggregate arithmetic on DECIMAL casts (exact in both engines),
  final numeric outputs ROUND(...)::DOUBLE or integer types;
- every query carries a total ORDER BY with unique tie-breaker and
  explicit NULLS placement when NULLs are possible;
- no approx_* / LIMIT-without-total-order / RAND;
- division always guarded (NULLIF) — Spark runs ANSI mode.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every suite module (idempotent)."""
    from . import (  # noqa: F401
        analytics,
        analytics2,
        analytics3,
        analytics4,
        builder_suite,
        chunking_suite,
        connectors,
        connectors2,
        curation,
        dedup,
        dml,
        events,
        external_db,
        graph,
        metrics_suite,
        ml,
        multimodal,
        pretrain,
        quality_suite,
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        relational6,
        relational7,
        relational8,
        roundtrip,
        sampling,
        search,
        security,
        similarity,
        text,
    )


def get_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def get_oracle_sql() -> dict[str, str]:
    load_all()
    return dict(ORACLE)
