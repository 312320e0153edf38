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


def log_rank(
    df: DataFrame,
    t_col: str,
    event_col: str,
    arm_col: str,
    arm_a: str,
    arm_b: str,
    ndigits: int = 6,
) -> DataFrame:
    """Two-sample log-rank test (Mantel-Cox): does survival differ
    between two arms? 1-row output ``n_a, n_b, n_events, o_minus_e,
    var_o, z`` with O−E = Σ_t (d_a(t) − d(t)·n_a(t)/n(t)) and the
    hypergeometric variance V = Σ_t d(n_a/n)(1−n_a/n)(n−d)/(n−1),
    z = (O−E)/√V (NULL when V is not positive).

    Same grid discipline as :func:`kaplan_meier`: the cohort
    collapses to one row per (time bucket) — bounded by resolution —
    at-risk counts are reverse-cumulative integer window sums, and
    the only float reductions (the O−E and V sums over the bounded
    grid) go through the det_sum sorted fold. Everything upstream is
    exact integers, so the statistic replays in DuckDB.
    """
    a, b = arm_a, arm_b
    per = (
        df.filter(F.col(arm_col).isin([a, b]))
        .groupBy(F.col(t_col).alias("t"))
        .agg(
            F.sum(
                F.when(F.col(arm_col) == a, F.col(event_col)).otherwise(0)
            ).cast("bigint").alias("d_a"),
            F.sum(
                F.when(F.col(arm_col) == b, F.col(event_col)).otherwise(0)
            ).cast("bigint").alias("d_b"),
            F.sum(F.when(F.col(arm_col) == a, 1).otherwise(0))
            .cast("bigint").alias("m_a"),
            F.sum(F.when(F.col(arm_col) == b, 1).otherwise(0))
            .cast("bigint").alias("m_b"),
        )
    )
    w = (
        Window.orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = per.select(
        "t",
        "d_a",
        "d_b",
        F.sum("m_a").over(w).cast("bigint").alias("n_a_t"),
        F.sum("m_b").over(w).cast("bigint").alias("n_b_t"),
    ).filter((F.col("d_a") + F.col("d_b")) > 0)
    d = (F.col("d_a") + F.col("d_b")).cast("double")
    na = F.col("n_a_t").cast("double")
    n = (F.col("n_a_t") + F.col("n_b_t")).cast("double")
    ea = d * na / n
    vt = F.when(
        n > 1.0,
        d * (na / n) * (1.0 - na / n) * (n - d) / (n - 1.0),
    ).otherwise(F.lit(0.0))
    terms = r.select(
        (F.col("d_a").cast("double") - ea).alias("_oe"), vt.alias("_v")
    )
    sums = terms.agg(
        F.aggregate(
            F.sort_array(F.collect_list("_oe")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("_soe"),
        F.aggregate(
            F.sort_array(F.collect_list("_v")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("_sv"),
    )
    counts = df.filter(F.col(arm_col).isin([a, b])).agg(
        F.sum(F.when(F.col(arm_col) == a, 1).otherwise(0))
        .cast("bigint").alias("n_a"),
        F.sum(F.when(F.col(arm_col) == b, 1).otherwise(0))
        .cast("bigint").alias("n_b"),
        F.sum(F.col(event_col)).cast("bigint").alias("n_events"),
    )
    z = F.when(
        F.col("_sv") > 0, F.col("_soe") / F.sqrt(F.col("_sv"))
    )
    return counts.crossJoin(F.broadcast(sums)).select(
        "n_a",
        "n_b",
        "n_events",
        F.round(F.col("_soe"), ndigits).cast("double").alias("o_minus_e"),
        F.round(F.col("_sv"), ndigits).cast("double").alias("var_o"),
        F.round(z, ndigits).cast("double").alias("z"),
    )


def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: list[str] | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator per group — the
    additive companion of :func:`kaplan_meier`: one row per event
    time with ``t, n_risk, n_events, cum_hazard, cum_haz_var``,

        H(t) = Σ_{s ≤ t} d_s/n_s,    Var(t) = Σ_{s ≤ t} d_s/n_s²

    Same scale shape as KM (the cohort collapses to the duration
    grid; at-risk counts are a group-partitioned window sum), but the
    prefix accumulation is EXACT: each increment floor-quantizes at
    1e-9 to an integer, so the in-group fold is an int64 sum —
    associative, engine-identical (the KM prefix product must instead
    pin a left-to-right IEEE chain). Censored-only times contribute 0
    and are excluded from the output.
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
    nd = F.col("d").cast("double")
    nr = F.col("n_risk").cast("double")
    rows = (
        per_t.withColumn("n_risk", F.sum("m").over(w).cast("bigint"))
        .withColumn("h9", F.floor(nd / nr * 1e9).cast("long"))
        .withColumn("v9", F.floor(nd / (nr * nr) * 1e9).cast("long"))
    )
    arr = rows.groupBy(*g).agg(
        F.sort_array(
            F.collect_list(F.struct("t", "d", "n_risk", "h9", "v9"))
        ).alias("a")
    )
    ex = arr.select(*g, "a", F.posexplode("a").alias("i", "s"))
    cum = lambda field: F.aggregate(  # noqa: E731
        F.slice(
            F.transform(F.col("a"), lambda s: s[field]), 1, F.col("i") + 1
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    p6 = F.lit(float(10 ** ndigits))
    q6 = lambda c: (F.floor(c * p6 + F.lit(0.5)) / p6).cast("double")  # noqa: E731
    return ex.filter(F.col("s.d") > 0).select(
        *g,
        F.col("s.t").alias("t"),
        F.col("s.n_risk").alias("n_risk"),
        F.col("s.d").alias("n_events"),
        q6(cum("h9").cast("double") / F.lit(1e9)).alias("cum_hazard"),
        q6(cum("v9").cast("double") / F.lit(1e9)).alias("cum_haz_var"),
    )
