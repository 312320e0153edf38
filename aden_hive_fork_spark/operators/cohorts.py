"""Cohort retention analysis over an event stream.

The product-analytics staple: group users by the period of their
first event (the cohort), then measure what fraction of each cohort
is still active N periods later. The reference serves this class of
question through its event-history SQL tier (events log + generic
SQL); this is the declarative operator form.

Plan shape — ONE data-sized shuffle, no join over the events:

1. per-user period sets: ``groupBy(user).agg(collect_set(period))``
   — the single events-sized shuffle, combining map-side; the set is
   bounded by the analysis horizon (weeks), so state per user is
   tiny and hub-user skew is structurally impossible.
2. cohort = ``array_min`` of the set (free — same row); explode the
   set back out: rows = users × active-periods, already a fraction
   of the event volume.
3. matrix: aggregate to (cohort, period_offset) with a plain count —
   each user appears at most once per period by set construction, so
   count == distinct users with no countDistinct expansion. Output
   is cohorts × horizon (tiny).

Retention is divided against the cohort's size at offset 0 computed
via a window over the tiny matrix — no second pass over events.
Period arithmetic is integer day math on DATE — no timezone, no
double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PERIOD_DAYS = {"week": 7, "day": 1}


def retention_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
    ndigits: int = 4,
) -> DataFrame:
    """(cohort_period, period_offset, n_active, cohort_size,
    retention) — retention = n_active / cohort_size rounded to
    ``ndigits``. ``period`` is ``week`` (ISO weeks, Monday start —
    date_trunc semantics shared by Spark and DuckDB) or ``day``."""
    if period not in _PERIOD_DAYS:
        raise ValueError(f"period must be one of {sorted(_PERIOD_DAYS)}")
    days = _PERIOD_DAYS[period]

    bucket = F.date_trunc(period, F.col(ts_col)).cast("date")
    per_user = events.groupBy(F.col(user_col).alias("_user")).agg(
        F.collect_set(bucket).alias("_periods")
    )
    exploded = per_user.select(
        F.array_min("_periods").alias("_cohort"),
        F.explode("_periods").alias("_period"),
    )
    matrix = (
        exploded.groupBy(
            F.col("_cohort").alias("cohort_period"),
            (
                F.datediff(F.col("_period"), F.col("_cohort")) / days
            )
            .cast("bigint")
            .alias("period_offset"),
        )
        # one row per (user, period) by set construction → a plain
        # count IS the distinct-user count
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )
    w = Window.partitionBy("cohort_period")
    size0 = F.max(
        F.when(F.col("period_offset") == 0, F.col("n_active"))
    ).over(w)
    return matrix.select(
        "cohort_period",
        "period_offset",
        "n_active",
        size0.cast("bigint").alias("cohort_size"),
        F.round(
            F.col("n_active").cast("double") / size0.cast("double"), ndigits
        )
        .cast("double")
        .alias("retention"),
    )
