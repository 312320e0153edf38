"""Kaplan-Meier survival estimation — time-to-event analysis with
right-censoring (churn curves, subscription lifetimes, time-to-failure).

Shape for scale: the raw cohort aggregates to ONE row per (group,
duration) — the time grid, bounded by the duration resolution (bucket
durations to days/months upstream), never by cohort size. The at-risk
counts are an integer window sum over that grid; the survival curve is
a per-group prefix product over the grid array. The O(k²) prefix fold
is intentional: k is grid length, and a left-to-right IEEE
multiplication chain is bit-deterministic across engines, unlike
exp(sum(ln f)) which inherits ln/exp ulp noise (the fold family
discipline — see timeseries.ewma/holt).

Estimator: S(t) = Π_{s ≤ t} (1 − d_s / n_s), with d_s events at s and
n_s = |{T ≥ s}| at risk (deaths + censored both leave the risk set).
Censored-only times contribute factor exactly 1.0 and are folded (no
effect) but excluded from the output, which lists event times only —
the standard KM presentation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: list[str] | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """Kaplan-Meier curve per group: one row per event time with
    ``t, n_risk, n_events, survival``. ``event_col`` is 1 when the
    event was observed at ``duration_col``, 0 when the subject was
    censored then (still alive at last observation). NULL or negative
    durations and NULL event flags are dropped (incomplete records).
    """
    g = group_cols or []
    t = F.col(duration_col).cast("bigint")
    ev = F.col(event_col).cast("int")
    base = df.filter(t.isNotNull() & (t >= 0) & ev.isNotNull())
    per_t = base.groupBy(*g, t.alias("t")).agg(
        F.sum(ev).cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
    )
    w = (
        Window.partitionBy(*g)
        .orderBy(F.desc("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rows = per_t.withColumn(
        "n_risk", F.sum("m").over(w).cast("bigint")
    ).withColumn(
        "f",
        F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk").cast("double"),
    )
    arr = rows.groupBy(*g).agg(
        F.sort_array(
            F.collect_list(F.struct("t", "d", "n_risk", "f"))
        ).alias("a")
    )
    ex = arr.select(*g, "a", F.posexplode("a").alias("i", "s"))
    fs = F.transform(F.col("a"), lambda s: s["f"])
    surv = F.aggregate(
        F.slice(fs, 1, F.col("i") + 1),
        F.lit(1.0),
        lambda acc, x: acc * x,
    )
    return (
        ex.filter(F.col("s.d") > 0)
        .select(
            *g,
            F.col("s.t").alias("t"),
            F.col("s.n_risk").alias("n_risk"),
            F.col("s.d").alias("n_events"),
            F.round(surv, ndigits).cast("double").alias("survival"),
        )
    )
