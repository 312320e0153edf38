"""Analytics batch 2: exponential smoothing, rolling-window anomaly
flags, RFM segmentation, touch attribution, winsorized means — the
forecasting/marketing tier of the reference's generic SQL surface,
each with the plan a 100 TB deployment needs (no NTILE, no global
sort, no float window reassociation).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query
from ._helpers import T, dec, dround

_DAILY_REV_SQL = """
      SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS d,
        CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
          AS rev
      FROM orders GROUP BY 1, 2
"""


def _daily_rev(spark, sf_dir):
    return (
        T(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.to_date("o_orderdate").alias("d"),
        )
        .agg(dround(F.sum(dec("o_totalprice"))).alias("rev"))
    )


# ---------------------------------------------------------------------------
# q160 — EWMA level per priority. The recursion is a left fold (not a
# window sum — engines reassociate float window sums); Spark folds the
# per-key sorted array JVM-side with aggregate(), DuckDB replays the
# identical left-to-right IEEE order with list_reduce.
# ---------------------------------------------------------------------------
@query(
    "q160_ewma_forecast",
    oracle=f"""
    WITH s AS ({_DAILY_REV_SQL})
    SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_obs,
      CAST(ROUND(list_reduce(list(rev ORDER BY d ASC),
                             (acc, x) -> 0.3*x + (1.0 - 0.3)*acc), 6)
           AS DOUBLE) AS ewma_level
    FROM s GROUP BY priority ORDER BY priority ASC
    """,
)
def q160_ewma_forecast(spark, sf_dir):
    """operators/timeseries.ewma — deterministic exponential
    smoothing; the final level is the one-step-ahead forecast."""
    from ..operators.timeseries import ewma

    return ewma(
        _daily_rev(spark, sf_dir), ["priority"], "d", "rev", alpha=0.3
    ).orderBy("priority")


# ---------------------------------------------------------------------------
# q161 — trailing 28-day z-score anomalies on the same daily series.
# Exact DECIMAL window sums make mean/var order-independent (a DOUBLE
# window sum would diverge: DuckDB aggregates frames via segment
# tree); z rounds to 6 digits before the threshold compare.
# ---------------------------------------------------------------------------
@query(
    "q161_rolling_anomalies",
    oracle=f"""
    WITH s AS ({_DAILY_REV_SQL}),
    w AS (
      SELECT priority, d, rev,
        CAST(SUM(CAST(rev AS DECIMAL(18,2))) OVER win AS DOUBLE) AS s1,
        CAST(SUM(CAST(rev AS DECIMAL(18,2)) * CAST(rev AS DECIMAL(18,2)))
             OVER win AS DOUBLE) AS s2,
        COUNT(*) OVER win AS n
      FROM s
      WINDOW win AS (PARTITION BY priority ORDER BY d ASC
                     ROWS BETWEEN 27 PRECEDING AND CURRENT ROW)
    )
    SELECT priority, d, rev,
      ROUND((rev - s1/n)
            / NULLIF(sqrt(GREATEST(s2/n - (s1/n)*(s1/n), 0.0)), 0.0), 6) AS z
    FROM w
    WHERE n = 28
      AND ABS(ROUND((rev - s1/n)
            / NULLIF(sqrt(GREATEST(s2/n - (s1/n)*(s1/n), 0.0)), 0.0), 6))
          > 2.5
    ORDER BY priority ASC, d ASC
    """,
)
def q161_rolling_anomalies(spark, sf_dir):
    """operators/timeseries.rolling_zscore — full-window trailing
    anomalies, |z| > 2.5."""
    from ..operators.timeseries import rolling_zscore

    return rolling_zscore(
        _daily_rev(spark, sf_dir), ["priority"], "d", "rev",
        window=28, z_threshold=2.5,
    ).orderBy("priority", "d")


# ---------------------------------------------------------------------------
# q162 — RFM segmentation. One aggregate computes ALL quintile cuts
# (no NTILE — a global NTILE(5) funnels 100 TB through one task);
# scores are a broadcast map-side fold.
# ---------------------------------------------------------------------------
@query(
    "q162_rfm_segments",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
        date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                  (SELECT CAST(MAX(o_orderdate) AS DATE) FROM orders))
          AS recency,
        CAST(COUNT(*) AS DOUBLE) AS frequency,
        CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
          AS monetary
      FROM orders GROUP BY o_custkey
    ),
    cuts AS (
      SELECT
        list_transform(quantile_cont(CAST(recency AS DOUBLE),
          [0.2, 0.4, 0.6, 0.8]), c -> ROUND(c, 6)) AS rc,
        list_transform(quantile_cont(frequency,
          [0.2, 0.4, 0.6, 0.8]), c -> ROUND(c, 6)) AS fc,
        list_transform(quantile_cont(monetary,
          [0.2, 0.4, 0.6, 0.8]), c -> ROUND(c, 6)) AS mc
      FROM rfm
    ),
    scored AS (
      SELECT
        1 + len(list_filter(rc, c -> CAST(recency AS DOUBLE) > c))
          AS r_score,
        1 + len(list_filter(fc, c -> frequency > c)) AS f_score,
        1 + len(list_filter(mc, c -> monetary > c)) AS m_score,
        monetary
      FROM rfm CROSS JOIN cuts
    )
    SELECT CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
      CAST(m_score AS INT) AS m_score,
      CAST(COUNT(*) AS BIGINT) AS n_customers,
      CAST(ROUND(SUM(CAST(monetary AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS total_monetary
    FROM scored
    GROUP BY 1, 2, 3
    ORDER BY r_score ASC, f_score ASC, m_score ASC
    """,
)
def q162_rfm_segments(spark, sf_dir):
    """operators/quality.quantile_scores over per-customer recency /
    frequency / monetary."""
    from ..operators.quality import quantile_scores

    o = T(spark, sf_dir, "orders")
    anchor = o.agg(F.max(F.to_date("o_orderdate")).alias("_anchor"))
    rfm = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("_last"),
            F.count(F.lit(1)).cast("double").alias("frequency"),
            dround(F.sum(dec("o_totalprice"))).alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .withColumn("recency", F.datediff(F.col("_anchor"), F.col("_last")))
        .drop("_anchor", "_last")
    )
    scored = quantile_scores(rfm, ["recency", "frequency", "monetary"])
    return (
        scored.groupBy(
            F.col("recency_score").alias("r_score"),
            F.col("frequency_score").alias("f_score"),
            F.col("monetary_score").alias("m_score"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            dround(F.sum(dec("monetary"))).alias("total_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


# ---------------------------------------------------------------------------
# q163 — first/last-touch attribution: keyed range join (user key +
# bounded time predicate — pair volume tracks touches-per-window, not
# corpus size), credit via one conversion-keyed window.
# ---------------------------------------------------------------------------
@query(
    "q163_touch_attribution",
    oracle="""
    WITH conv AS (
      SELECT event_id AS conv_id, user_id AS u, ts AS conv_ts
      FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT user_id AS u, ts AS touch_ts, event_id AS touch_id,
        event_type AS channel
      FROM events WHERE event_type <> 'purchase'
    ),
    pairs AS (
      SELECT c.conv_id, t.channel, t.touch_ts, t.touch_id
      FROM conv c JOIN touch t ON t.u = c.u
        AND t.touch_ts < c.conv_ts
        AND t.touch_ts >= c.conv_ts - INTERVAL 7 DAY
    ),
    ranked AS (
      SELECT channel,
        ROW_NUMBER() OVER (PARTITION BY conv_id
          ORDER BY touch_ts ASC, touch_id ASC) AS rn_first,
        ROW_NUMBER() OVER (PARTITION BY conv_id
          ORDER BY touch_ts DESC, touch_id DESC) AS rn_last
      FROM pairs
    )
    SELECT channel,
      CAST(SUM(CASE WHEN rn_first = 1 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_first_touch,
      CAST(SUM(CASE WHEN rn_last = 1 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_last_touch
    FROM ranked
    GROUP BY channel
    ORDER BY channel ASC
    """,
)
def q163_touch_attribution(spark, sf_dir):
    """operators/attribution.touch_attribution — 7-day lookback,
    purchase conversions."""
    from ..operators.attribution import touch_attribution

    e = T(spark, sf_dir, "events")
    return touch_attribution(e, conversion_type="purchase",
                             lookback_days=7).orderBy("channel")


# ---------------------------------------------------------------------------
# q164 — winsorized mean per priority: grouped percentile caps joined
# back (AQE broadcasts the tiny cap table), clamp map-side, one
# exact-decimal aggregate.
# ---------------------------------------------------------------------------
@query(
    "q164_winsorized_stats",
    oracle="""
    WITH caps AS (
      SELECT o_orderpriority AS priority,
        ROUND(quantile_cont(o_totalprice, 0.05), 6) AS lo_cap,
        ROUND(quantile_cont(o_totalprice, 0.95), 6) AS hi_cap
      FROM orders GROUP BY 1
    ),
    clamped AS (
      SELECT o.o_orderpriority AS priority, c.lo_cap, c.hi_cap,
        LEAST(GREATEST(o.o_totalprice, c.lo_cap), c.hi_cap) AS w
      FROM orders o JOIN caps c ON c.priority = o.o_orderpriority
    )
    SELECT priority, CAST(COUNT(*) AS BIGINT) AS n,
      ROUND(CAST(SUM(CAST(w AS DECIMAL(28,6))) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE), 2) AS w_mean,
      lo_cap, hi_cap
    FROM clamped
    GROUP BY priority, lo_cap, hi_cap
    ORDER BY priority ASC
    """,
)
def q164_winsorized_stats(spark, sf_dir):
    """operators/quality.winsorized_stats on order totals."""
    from ..operators.quality import winsorized_stats

    return winsorized_stats(
        T(spark, sf_dir, "orders"), "o_totalprice", ["o_orderpriority"]
    ).withColumnRenamed("o_orderpriority", "priority").orderBy("priority")


# ---------------------------------------------------------------------------
# q167 — l-diversity: k-anonymity's homogeneity-attack companion.
# Quasi-identifiers (nation, segment, order year) against the
# sensitive order priority; same data → classes → summary shape as
# q137.
# ---------------------------------------------------------------------------
@query(
    "q167_l_diversity",
    oracle="""
    WITH j AS (
      SELECT c.c_nationkey, c.c_mktsegment,
        CAST(year(o.o_orderdate) AS INT) AS yr,
        o.o_orderpriority AS sens
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    cls AS (
      SELECT c_nationkey, c_mktsegment, yr,
        CAST(COUNT(*) AS BIGINT) AS class_size,
        CAST(COUNT(DISTINCT sens) AS BIGINT) AS diversity
      FROM j GROUP BY 1, 2, 3
    )
    SELECT CAST(SUM(class_size) AS BIGINT) AS n_rows,
      CAST(COUNT(*) AS BIGINT) AS n_classes,
      CAST(MIN(diversity) AS BIGINT) AS min_diversity,
      CAST(SUM(CASE WHEN diversity < 5 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_weak_classes,
      CAST(SUM(CASE WHEN diversity < 5 THEN class_size ELSE 0 END) AS BIGINT)
        AS exposed_rows,
      CAST(ROUND(CAST(SUM(CASE WHEN diversity < 5 THEN class_size ELSE 0 END)
                      AS DOUBLE)
           / CAST(SUM(class_size) AS DOUBLE), 6) AS DOUBLE) AS exposed_frac
    FROM cls
    """,
)
def q167_l_diversity(spark, sf_dir):
    """operators/pii.l_diversity_report — quasi (nation, segment,
    order year), sensitive priority, l=5."""
    from ..operators.pii import l_diversity_report

    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    j = o.join(c, c["c_custkey"] == o["o_custkey"]).select(
        "c_nationkey",
        "c_mktsegment",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.col("o_orderpriority").alias("sens"),
    )
    return l_diversity_report(
        j, ["c_nationkey", "c_mktsegment", "yr"], "sens", l=5
    )


# ---------------------------------------------------------------------------
# q168 — Holt level+trend forecast: the two-state recursion as ONE
# JVM struct-accumulator fold per key (pure +-*/ arithmetic — no
# per-step rounding needed); DuckDB replays it with a struct-list
# list_reduce whose head is the init state.
# ---------------------------------------------------------------------------
@query(
    "q168_holt_forecast",
    oracle=f"""
    WITH s AS ({_DAILY_REV_SQL}),
    arr AS (
      SELECT priority, list(rev ORDER BY d ASC) AS xs,
        COUNT(*) AS n
      FROM s GROUP BY priority HAVING COUNT(*) >= 2
    ),
    f AS (
      -- state rides as a 2-list [level, trend]: this DuckDB's
      -- list_reduce mis-evaluates STRUCT accumulators past one fold
      -- step (single-step folds are fine — verified), while list
      -- accumulators replay the recursion exactly
      SELECT priority, n,
        list_reduce(
          [[xs[1], xs[2] - xs[1]]] ||
            list_transform(xs[2:], x -> [x, CAST(0.0 AS DOUBLE)]),
          (acc, e) -> [
            0.3*e[1] + (1.0 - 0.3)*(acc[1] + acc[2]),
            0.1*((0.3*e[1] + (1.0 - 0.3)*(acc[1] + acc[2])) - acc[1])
                 + (1.0 - 0.1)*acc[2]]
        ) AS st
      FROM arr
    )
    SELECT priority, CAST(n AS BIGINT) AS n_obs,
      CAST(ROUND(st[1], 6) AS DOUBLE) AS level,
      CAST(ROUND(st[2], 6) AS DOUBLE) AS trend,
      CAST(ROUND(st[1] + st[2], 6) AS DOUBLE) AS forecast_1
    FROM f ORDER BY priority ASC
    """,
)
def q168_holt_forecast(spark, sf_dir):
    """operators/timeseries.holt — α=0.3, β=0.1 over the daily
    revenue series."""
    from ..operators.timeseries import holt

    return holt(
        _daily_rev(spark, sf_dir), ["priority"], "d", "rev",
        alpha=0.3, beta=0.1,
    ).orderBy("priority")


# ---------------------------------------------------------------------------
# q170 — CUSUM mean-shift detection (Page's test) on the daily
# series: the third member of the fold family (ewma, holt) — 4-list
# accumulator, replayed by list_reduce with the same init-prepend
# trick.
# ---------------------------------------------------------------------------
@query(
    "q170_cusum_shifts",
    oracle=f"""
    WITH s AS ({_DAILY_REV_SQL}),
    arr AS (
      SELECT priority, list(rev ORDER BY d ASC) AS xs,
        CAST(SUM(CAST(rev AS DECIMAL(18,2))) AS DOUBLE) AS s1,
        CAST(SUM(CAST(rev AS DECIMAL(18,2)) * CAST(rev AS DECIMAL(18,2)))
             AS DOUBLE) AS s2,
        COUNT(*) AS n
      FROM s GROUP BY priority
    ),
    p AS (
      -- FLOOR-quantization, not ROUND: Spark ROUND(double) rounds the
      -- shortest decimal repr, DuckDB the exact binary value — they
      -- disagree at digit boundaries; floor(x*1e6)/1e6 is pure IEEE
      SELECT priority, xs, n,
        CAST(FLOOR((s1 / n) * 1000000.0) AS DOUBLE) / 1000000.0 AS mu,
        CAST(FLOOR(sqrt(GREATEST(s2 / n - (s1 / n) * (s1 / n), 0.0))
                   * 1000000.0) AS DOUBLE) / 1000000.0 AS sg
      FROM arr
    ),
    f AS (
      SELECT priority, n, mu, sg,
        0.5 * sg AS k, 4.0 * sg AS h,
        list_reduce(
          [[CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
            CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)]] ||
            list_transform(xs, x -> [x, CAST(0.0 AS DOUBLE),
                                     CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)]),
          (acc, e) -> [
            GREATEST(0.0, acc[1] + ((e[1] - mu) - 0.5 * sg)),
            GREATEST(0.0, acc[2] + ((mu - 0.5 * sg) - e[1])),
            GREATEST(acc[3], GREATEST(0.0, acc[1] + ((e[1] - mu) - 0.5 * sg))),
            GREATEST(acc[4], GREATEST(0.0, acc[2] + ((mu - 0.5 * sg) - e[1])))]
        ) AS st
      FROM p
    )
    SELECT priority, CAST(n AS BIGINT) AS n_obs, mu, sg AS sigma,
      CAST(FLOOR(st[3] * 1000000.0) AS DOUBLE) / 1000000.0 AS max_pos,
      CAST(FLOOR(st[4] * 1000000.0) AS DOUBLE) / 1000000.0 AS max_neg,
      (CAST(FLOOR(st[3] * 1000000.0) AS DOUBLE) / 1000000.0 > h
       OR CAST(FLOOR(st[4] * 1000000.0) AS DOUBLE) / 1000000.0 > h)
        AS shift_detected
    FROM f ORDER BY priority ASC
    """,
)
def q170_cusum_shifts(spark, sf_dir):
    """operators/timeseries.cusum — k=0.5σ slack, h=4σ threshold."""
    from ..operators.timeseries import cusum

    return cusum(
        _daily_rev(spark, sf_dir), ["priority"], "d", "rev",
        slack_sigmas=0.5, threshold_sigmas=4.0,
    ).orderBy("priority")


# ---------------------------------------------------------------------------
# q244 — Holt linear-trend smoothing of the daily revenue series: the
# q160 fold with two-component (level, trend) state. The oracle
# replays the fold as a RECURSIVE CTE stepping (l, b) row by row —
# NOT list_reduce: DuckDB v1.0 mis-evaluates struct accumulators
# across list_reduce iterations (a single application is correct,
# chaining is not — verified directly), while the recursive CTE is
# plain row arithmetic and reproduces the JVM fold bit for bit.
# ---------------------------------------------------------------------------
@query(
    "q244_holt_forecast",
    oracle=f"""
    WITH RECURSIVE base AS ({_DAILY_REV_SQL}),
    s AS (
      SELECT priority, rev,
        ROW_NUMBER() OVER (PARTITION BY priority ORDER BY d ASC) AS i
      FROM base
    ),
    mx AS (SELECT priority, MAX(i) AS n FROM s GROUP BY priority),
    rec AS (
      SELECT priority, i, CAST(rev AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS b
      FROM s WHERE i = 1
      UNION ALL
      SELECT r.priority, s.i,
        CAST(0.3*s.rev + 0.7*(r.l + r.b) AS DOUBLE),
        CAST(0.2*((0.3*s.rev + 0.7*(r.l + r.b)) - r.l) + 0.8*r.b AS DOUBLE)
      FROM rec r JOIN s ON s.priority = r.priority AND s.i = r.i + 1
    )
    SELECT rec.priority, CAST(mx.n AS BIGINT) AS n_obs,
      CAST(ROUND(rec.l, 4) AS DOUBLE) AS level,
      CAST(ROUND(rec.b, 4) AS DOUBLE) AS trend,
      CAST(ROUND(rec.l + 1.0*rec.b, 4) AS DOUBLE) AS fc_1,
      CAST(ROUND(rec.l + 2.0*rec.b, 4) AS DOUBLE) AS fc_2,
      CAST(ROUND(rec.l + 3.0*rec.b, 4) AS DOUBLE) AS fc_3
    FROM rec JOIN mx ON mx.priority = rec.priority AND rec.i = mx.n
    ORDER BY rec.priority ASC
    """,
)
def q244_holt_forecast(spark, sf_dir):
    """operators/timeseries.holt_linear over the daily revenue
    series: level+trend state and 1/2/3-step forecasts."""
    from ..operators.timeseries import holt_linear

    return holt_linear(
        _daily_rev(spark, sf_dir), ["priority"], "d", "rev",
        alpha=0.3, beta=0.2,
    ).orderBy("priority")


# ---------------------------------------------------------------------------
# q245 — additive seasonal decomposition of daily revenue: centered
# 7-day moving-average trend (exact decimal window sums), per-ISO-
# weekday seasonal means of the detrended series (raw sorted fold,
# rounded only at the final day-magnitude mean).
# ---------------------------------------------------------------------------
@query(
    "q245_seasonal_decompose",
    oracle=f"""
    WITH base AS ({_DAILY_REV_SQL}),
    w AS (
      SELECT priority, d, rev,
        CAST(SUM(CAST(rev AS DECIMAL(18,2))) OVER win AS DOUBLE)
          / CAST(COUNT(*) OVER win AS DOUBLE) AS trend
      FROM base
      WINDOW win AS (PARTITION BY priority ORDER BY d ASC
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (
      SELECT priority, CAST(isodow(d) AS INT) AS isodow,
        rev - trend AS detr
      FROM w
    )
    SELECT priority, isodow, CAST(COUNT(*) AS BIGINT) AS n_days,
      CAST(ROUND(list_sum(list_sort(list(detr)))
                 / CAST(COUNT(*) AS DOUBLE), 4) AS DOUBLE) AS seasonal
    FROM det GROUP BY priority, isodow
    ORDER BY priority ASC, isodow ASC
    """,
)
def q245_seasonal_decompose(spark, sf_dir):
    """operators/timeseries.seasonal_decompose over daily revenue
    per priority: 7-day centered trend, weekday seasonal profile."""
    from ..operators.timeseries import seasonal_decompose

    return seasonal_decompose(
        _daily_rev(spark, sf_dir), ["priority"], "d", "rev",
        half_window=3,
    ).orderBy(F.asc("priority"), F.asc("isodow"))


# ---------------------------------------------------------------------------
# q315 — Holt-Winters additive seasonal smoothing (round 8): the
# seasonal member of the q160/q244 fold family. Spark folds a
# (level, trend, seasonal-ring) struct accumulator JVM-side; DuckDB
# replays the identical IEEE order with a recursive CTE whose state
# row carries the seasonal LIST (chained list_reduce stays banned —
# the analytics2 gotcha; single list_reduce only for the two init
# means, matching Spark's aggregate-fold order exactly).
# ---------------------------------------------------------------------------
_HW_M = 7
_HW_A = 0.3
_HW_B = 0.1
_HW_G = 0.2


@query(
    "q315_holt_winters",
    oracle=f"""
    WITH RECURSIVE base AS ({_DAILY_REV_SQL}),
    s AS (
      SELECT priority, CAST(rev AS DOUBLE) AS x,
        ROW_NUMBER() OVER (PARTITION BY priority ORDER BY d ASC) AS i
      FROM base
    ),
    mx AS (
      SELECT priority, MAX(i) AS n FROM s GROUP BY priority
      HAVING MAX(i) >= {2 * _HW_M}
    ),
    arrs AS (
      SELECT s.priority, list(s.x ORDER BY s.i ASC) AS xs
      FROM s JOIN mx ON mx.priority = s.priority
      GROUP BY s.priority
    ),
    init AS (
      SELECT priority,
        list_reduce(xs[1:{_HW_M}], (p, q) -> p + q) / {_HW_M}.0 AS l,
        (list_reduce(xs[{_HW_M + 1}:{2 * _HW_M}], (p, q) -> p + q)
           / {_HW_M}.0
         - list_reduce(xs[1:{_HW_M}], (p, q) -> p + q) / {_HW_M}.0)
          / {_HW_M}.0 AS b,
        list_transform(xs[1:{_HW_M}],
          x -> x - list_reduce(xs[1:{_HW_M}], (p, q) -> p + q)
                 / {_HW_M}.0) AS sv
      FROM arrs
    ),
    rec AS (
      SELECT priority, {_HW_M} AS i, l, b, sv FROM init
      UNION ALL
      SELECT priority, i,
        lnew AS l,
        CAST({_HW_B} * (lnew - lprev) + {1.0 - _HW_B} * bprev AS DOUBLE)
          AS b,
        svprev[2:{_HW_M}]
          || [CAST({_HW_G} * (x - lnew) + {1.0 - _HW_G} * su AS DOUBLE)]
          AS sv
      FROM (
        SELECT r.priority, s.i, s.x, r.l AS lprev, r.b AS bprev,
          r.sv AS svprev, r.sv[1] AS su,
          CAST({_HW_A} * (s.x - r.sv[1])
               + {1.0 - _HW_A} * (r.l + r.b) AS DOUBLE) AS lnew
        FROM rec r JOIN s ON s.priority = r.priority AND s.i = r.i + 1
      )
    )
    SELECT rec.priority, CAST(mx.n AS BIGINT) AS n_obs,
      CAST(ROUND(rec.l, 4) AS DOUBLE) AS level,
      CAST(ROUND(rec.b, 4) AS DOUBLE) AS trend,
      CAST(ROUND(rec.sv[1], 4) AS DOUBLE) AS seasonal_next,
      CAST(ROUND(rec.l + 1.0 * rec.b + rec.sv[1], 4) AS DOUBLE) AS fc_1,
      CAST(ROUND(rec.l + 2.0 * rec.b + rec.sv[2], 4) AS DOUBLE) AS fc_2,
      CAST(ROUND(rec.l + 3.0 * rec.b + rec.sv[3], 4) AS DOUBLE) AS fc_3
    FROM rec JOIN mx ON mx.priority = rec.priority AND rec.i = mx.n
    ORDER BY rec.priority ASC
    """,
)
def q315_holt_winters(spark, sf_dir):
    """operators/timeseries.holt_winters over per-priority daily
    revenue: weekly additive seasonality (m=7), level/trend/seasonal
    state and 1/2/3-step seasonal forecasts."""
    from ..operators.timeseries import holt_winters

    return holt_winters(
        _daily_rev(spark, sf_dir), ["priority"], "d", "rev",
        period=_HW_M, alpha=_HW_A, beta=_HW_B, gamma=_HW_G, horizon=3,
    ).orderBy("priority")
