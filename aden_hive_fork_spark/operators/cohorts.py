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


def growth_accounting(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period: str = "week",
) -> DataFrame:
    """The growth-accounting decomposition: per period, how many
    active users are NEW (first period ever), RETAINED (also active
    the previous period), RESURRECTED (active before but not the
    previous period), and how many of the previous period's actives
    CHURNED (absent this period). Output: ``period_start, wau, n_new,
    n_retained, n_resurrected, n_churned_prev`` — wau = new +
    retained + resurrected always holds, the standard audit identity.

    Shape: raw activity collapses to the distinct (user, period)
    grid immediately — everything downstream is grid-sized. One lag
    window per user classifies each active period against the
    previous one (first_seen via a running min in the SAME window
    pass — no second shuffle); churn is the lead direction of the
    identical window. Period truncation uses Monday-anchored
    ``date_trunc`` — the one week semantics Spark and DuckDB share
    (the q133 convention).
    """
    from pyspark.sql.window import Window

    grid = (
        df.select(
            F.col(user_col).alias("u"),
            F.date_trunc(period, F.col(ts_col)).alias("p"),
        )
        .filter(F.col("u").isNotNull() & F.col("p").isNotNull())
        .distinct()
    )
    w = Window.partitionBy("u").orderBy("p")
    step = {"week": 7, "day": 1}.get(period)
    if step is None:
        raise ValueError("period must be 'week' or 'day'")
    prev_p = F.lag("p").over(w)
    next_p = F.lead("p").over(w)
    first_p = F.min("p").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lab = grid.select(
        "p",
        F.when(first_p == F.col("p"), "new")
        .when(
            prev_p == F.col("p") - F.expr(f"INTERVAL {step} DAYS"),
            "retained",
        )
        .otherwise("resurrected")
        .alias("kind"),
        # this user churns AFTER p if the next active period is not
        # the immediately following one
        (
            next_p.isNull()
            | (next_p != F.col("p") + F.expr(f"INTERVAL {step} DAYS"))
        ).alias("churns_after"),
    )
    per = lab.groupBy("p").agg(
        F.count(F.lit(1)).cast("bigint").alias("wau"),
        F.sum(F.when(F.col("kind") == "new", 1).otherwise(0))
        .cast("bigint")
        .alias("n_new"),
        F.sum(F.when(F.col("kind") == "retained", 1).otherwise(0))
        .cast("bigint")
        .alias("n_retained"),
        F.sum(F.when(F.col("kind") == "resurrected", 1).otherwise(0))
        .cast("bigint")
        .alias("n_resurrected"),
        F.sum(F.when(F.col("churns_after"), 1).otherwise(0))
        .cast("bigint")
        .alias("_churn_out"),
    )
    # churned(p) = period p−step's actives that did not return in p.
    # A keyed join on the SHIFTED period (not a lag over the period
    # table) stays correct when a period has zero activity — lag
    # would silently reach back to an older period across the gap.
    shifted = per.select(
        (F.col("p") + F.expr(f"INTERVAL {step} DAYS")).alias("p"),
        F.col("_churn_out").alias("_churned_prev"),
    )
    return (
        per.join(shifted, "p", "left")
        .select(
            F.col("p").alias("period_start"),
            "wau",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce("_churned_prev", F.lit(0))
            .cast("bigint")
            .alias("n_churned_prev"),
        )
    )
