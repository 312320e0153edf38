"""Hierarchical keyed shared state as a changelog table.

Reference semantics (core/framework/runtime/shared_state.py):
- 3-level hierarchy execution → stream → global with read resolution
  execution-first (:152-182);
- scoped writes with isolation levels (:49-127);
- a StateChange audit ring buffer (:36-47, :280-343).

Spark-first re-expression: state lives as an APPEND-ONLY CHANGELOG
DataFrame (scope, scope_id, key, value, seq). The latest value per
(scope, scope_id, key) is a window aggregate; hierarchical read is a
coalesce over three scope lookups. Append-only + derive-latest is the
scalable CDC pattern: writes never contend, and compaction is just
``latest_state`` materialized (the streaming twin keeps live state in
``applyInPandasWithState`` — see streaming.stateful).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# changelog schema: scope in ('execution','stream','global');
# scope_id '' for global; seq is a monotonically increasing write id.
CHANGELOG_SCHEMA = "scope string, scope_id string, key string, value string, seq long"

_SCOPE_ORDER = ("execution", "stream", "global")


@dataclass
class StateChange:
    """One audit entry (reference StateChange, shared_state.py:36-47)."""

    scope: str
    scope_id: str
    key: str
    old: str | None
    new: str | None
    seq: int


def latest_state(changelog: DataFrame) -> DataFrame:
    """Materialize current state: last write wins per
    (scope, scope_id, key). One shuffle on the state key — at scale
    this is the compaction job, run incrementally per partition."""
    w = Window.partitionBy("scope", "scope_id", "key").orderBy(F.desc("seq"))
    return (
        changelog.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def read_resolved(
    changelog: DataFrame,
    execution_id: str,
    stream_id: str,
    keys: list[str] | None = None,
) -> DataFrame:
    """Hierarchical read: for each key, the execution-scope value if
    present, else stream-scope, else global (reference read resolution,
    shared_state.py:152-182). Returns (key, value, resolved_scope)."""
    latest = latest_state(changelog)
    if keys is not None:
        latest = latest.filter(F.col("key").isin(keys))
    scoped = latest.filter(
        ((F.col("scope") == "execution") & (F.col("scope_id") == execution_id))
        | ((F.col("scope") == "stream") & (F.col("scope_id") == stream_id))
        | (F.col("scope") == "global")
    )
    pri = (
        F.when(F.col("scope") == "execution", 0)
        .when(F.col("scope") == "stream", 1)
        .otherwise(2)
    )
    w = Window.partitionBy("key").orderBy(pri.asc(), F.desc("seq"))
    return (
        scoped.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("key", "value", F.col("scope").alias("resolved_scope"))
    )


def recent_changes(changelog: DataFrame, limit: int = 1000) -> DataFrame:
    """The audit ring buffer as a query: last N writes with the
    previous value per key (reference get_recent_changes +
    StateChange.old, shared_state.py:280-343)."""
    w = Window.partitionBy("scope", "scope_id", "key").orderBy(F.asc("seq"))
    with_old = changelog.withColumn("old", F.lag("value").over(w))
    return (
        with_old.select(
            "scope", "scope_id", "key", "old", F.col("value").alias("new"), "seq"
        )
        .orderBy(F.desc("seq"))
        .limit(limit)
    )
