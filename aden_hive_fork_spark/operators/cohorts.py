"""Cohort retention analysis over an event stream.

The product-analytics staple: group users by the period of their
first event (the cohort), then measure what fraction of each cohort
is still active N periods later. The reference serves this class of
question through its event-history SQL tier (events log + generic
SQL); this is the declarative operator form.

Plan shape — three keyed aggregates, no window functions:

1. first-touch: min(ts) per user → cohort period (one shuffle on
   user, combines map-side).
2. activity: distinct (user, period) (same user-keyed shuffle — AQE
   reuses the partitioning from step 1 for the join).
3. matrix: join activity to first-touch on user (user-keyed hash
   join, co-partitioned), aggregate to (cohort, period_offset) —
   the output is tiny (cohorts × horizon), whatever the event
   volume.

Retention is divided against the cohort's size at offset 0 computed
INSIDE the same aggregate via a window over the tiny matrix — no
second pass over events.

100 TB: everything shuffles on user_id exactly once conceptually;
the matrix aggregate reduces to a few thousand rows before the
window. Period arithmetic is integer day math on DATE — no
timezone, no double.
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
    activity = (
        events.select(
            F.col(user_col).alias("_user"), bucket.alias("_period")
        ).distinct()
    )
    first_touch = activity.groupBy("_user").agg(
        F.min("_period").alias("_cohort")
    )
    matrix = (
        activity.join(first_touch, "_user")
        .groupBy(
            F.col("_cohort").alias("cohort_period"),
            (
                F.datediff(F.col("_period"), F.col("_cohort")) / days
            )
            .cast("bigint")
            .alias("period_offset"),
        )
        .agg(F.countDistinct("_user").cast("bigint").alias("n_active"))
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
