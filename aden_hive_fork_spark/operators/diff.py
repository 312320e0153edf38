"""Snapshot reconciliation: keyed diff of two table states.

The lakehouse audit primitive — what changed between yesterday's
snapshot and today's (or between a table and its replica): rows
added, removed, and changed, with the changed column names. Pairs
with the versioned-publish layer (``layout.read_version`` gives the
two sides for a version-over-version diff) and with the CDC sink
(the diff IS the change feed you'd replay).

One full-outer hash join on the key — both sides shuffle once on the
same key, AQE co-partitions them; the per-column comparison is a
null-safe JVM expression (``eqNullSafe`` — NULL→value and
value→NULL are CHANGES, two NULLs are not). Output is only the
differing rows; at 100 TB of mostly-unchanged data, pre-prune both
sides with a partition-level checksum compare before the row diff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def diff_tables(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(key_cols..., change_type, changed_cols) for every key whose
    state differs: ``added`` (right only), ``removed`` (left only),
    ``changed`` (both sides, any compare column differs null-safely;
    ``changed_cols`` lists them in column order). Unchanged rows are
    absent from the output."""
    cmp_cols = compare_cols or [
        c for c in left.columns if c not in key_cols and c in right.columns
    ]
    l = left.select(
        *[F.col(k).alias(f"_lk_{k}") for k in key_cols],
        *[F.col(c).alias(f"_l_{c}") for c in cmp_cols],
        F.lit(1).alias("_l_present"),
    )
    r = right.select(
        *[F.col(k).alias(f"_rk_{k}") for k in key_cols],
        *[F.col(c).alias(f"_r_{c}") for c in cmp_cols],
        F.lit(1).alias("_r_present"),
    )
    cond = None
    for k in key_cols:
        c = F.col(f"_lk_{k}") == F.col(f"_rk_{k}")
        cond = c if cond is None else cond & c
    j = l.join(r, cond, "full_outer")

    changed_flags = [
        F.when(
            ~F.col(f"_l_{c}").eqNullSafe(F.col(f"_r_{c}")), F.lit(c)
        )
        for c in cmp_cols
    ]
    changed_cols = F.filter(
        F.array(*changed_flags), lambda x: x.isNotNull()
    )
    change_type = (
        F.when(F.col("_l_present").isNull(), F.lit("added"))
        .when(F.col("_r_present").isNull(), F.lit("removed"))
        .when(F.size(changed_cols) > 0, F.lit("changed"))
    )
    out_keys = [
        F.coalesce(F.col(f"_lk_{k}"), F.col(f"_rk_{k}")).alias(k)
        for k in key_cols
    ]
    return (
        j.select(
            *out_keys,
            change_type.alias("change_type"),
            F.when(
                change_type == "changed", changed_cols
            ).otherwise(F.array().cast("array<string>")).alias("changed_cols"),
        )
        .filter(F.col("change_type").isNotNull())
    )
