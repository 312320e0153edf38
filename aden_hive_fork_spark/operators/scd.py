"""Slowly-changing-dimension (type 2) interval builder — turn a
change log into validity intervals, the warehouse-standard history
table that the merge-on-read keyed table (operators/table) and time
travel (operators/layout) do not cover: those answer "state as of
version/now", SCD-2 answers "state as of any TIMESTAMP" with one
interval row per state episode.

Build shape (pure window functions, two keyed shuffles max):

1. order change events per key by (ts, tie_col) — the tie column
   makes the episode sequence total, so the build is deterministic
   under duplicate timestamps;
2. drop NO-OP changes (attributes equal to the previous row's) with
   one lag() pass — change logs are noisy and repeating states must
   not split episodes;
3. valid_from = episode ts, valid_to = lead(valid_from) (NULL = still
   current) with a second window pass over the kept rows only.

Both passes share the same partitioning key, so Catalyst plans ONE
Exchange (hashpartitioning by key) reused by both Window operators —
at 100 TB the build costs a single shuffle of the change log.

``scd2_asof`` answers point-in-time lookups against the built table
(key equi-join + interval residual — broadcast when the probe side is
small, never a cross join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def build_scd2(
    changelog: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tie_col: str | None = None,
) -> DataFrame:
    """Validity intervals from a change log. Output: ``key_col``,
    ``attr_cols``, ``valid_from``, ``valid_to`` (NULL while current),
    ``is_current``, ``episode`` (1-based per key).

    ``tie_col`` totalizes the order under duplicate timestamps
    (defaults to the first attr). Consecutive rows with identical
    attributes merge into one episode.
    """
    if not attr_cols:
        raise ValueError("attr_cols must be non-empty")
    tie = tie_col or attr_cols[0]
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(tie))

    state = F.struct(*[F.col(c) for c in attr_cols])
    # NULL-SAFE comparison: plain != yields NULL when an attribute
    # transitions to/from NULL and the filter would silently drop the
    # episode; <=> treats NULL as a comparable value. The first row
    # per key has lag()=NULL which never null-safe-equals a struct,
    # so it is always kept.
    changed = ~F.lag(state).over(w).eqNullSafe(state)
    kept = (
        changelog.withColumn("_chg", changed)
        .filter(F.col("_chg"))
        .drop("_chg")
    )
    w2 = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(tie))
    return (
        kept.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .withColumn("episode", F.row_number().over(w2))
        .select(key_col, *attr_cols, "valid_from", "valid_to",
                "is_current", "episode")
    )


def scd2_asof(
    scd: DataFrame,
    probes: DataFrame,
    key_col: str,
    ts_col: str,
) -> DataFrame:
    """State of each probe row's key AS OF its timestamp: key
    equi-join + half-open interval residual
    ``valid_from <= ts < coalesce(valid_to, +inf)``. At most one SCD
    row matches per probe (intervals partition time), so the result
    has probe cardinality."""
    cond = (
        (probes[key_col] == scd[key_col])
        & (scd["valid_from"] <= probes[ts_col])
        & (
            scd["valid_to"].isNull()
            | (probes[ts_col] < scd["valid_to"])
        )
    )
    return probes.join(scd, cond, "left").drop(scd[key_col])
