"""Round-7 statistics wave (q291-q294): the rank/multiple-testing/
effect-size/change-point completions of the experimentation tier —
all on the range-partitioned machinery (running_totals/dense_ids),
zero un-partitioned windows, all inside the value-hash gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query
from ._helpers import T


# ---------------------------------------------------------------------------
# q291 — Mann-Whitney U: do 1-URGENT and 5-LOW orders differ in price
# distribution? The k=2 rank test on the kruskal machinery (distinct-
# value running counts, exact integer rank sums, one IEEE z).
# ---------------------------------------------------------------------------
@query(
    "q291_mann_whitney",
    oracle="""
    WITH base AS (
      SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS v, o_orderpriority AS g
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        AND o_totalprice IS NOT NULL
    ),
    ranked AS (
      SELECT g,
        2 * RANK() OVER (ORDER BY v ASC)
          + COUNT(*) OVER (PARTITION BY v) - 1 AS r2
      FROM base
    ),
    per_g AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(r2) AS BIGINT) AS sr2
      FROM ranked GROUP BY g
    ),
    ties AS (
      SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie
      FROM (SELECT COUNT(*) AS t FROM base GROUP BY v)
    ),
    w AS (
      SELECT a.n AS n_a, b.n AS n_b, a.sr2 AS sr2a, ties.tie
      FROM per_g a, per_g b, ties
      WHERE a.g = '1-URGENT' AND b.g = '5-LOW'
    )
    SELECT n_a, n_b,
      CAST((sr2a - n_a * (n_a + 1)) AS DOUBLE) / 2.0 AS u_stat,
      CAST(ROUND(
        (CAST((sr2a - n_a * (n_a + 1)) AS DOUBLE) / 2.0
         - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
        / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
               * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1.0
                  - CAST(tie AS DOUBLE)
                    / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                       * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)
                          - 1.0)))),
        6) AS DOUBLE) AS z_score
    FROM w
    """,
)
def q291_mann_whitney(spark, sf_dir):
    """operators/stats.mann_whitney_u over order prices: URGENT vs
    LOW priority. The engine side never ranks the corpus — doubled
    ranks derive from running counts over DISTINCT prices (2-decimal
    domain, heavily tied), so the ordered pass is distinct-value-
    sized and range-partitioned."""
    from ..operators.stats import mann_whitney_u

    o = T(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("price"),
        F.col("o_orderpriority").alias("priority"),
    )
    return mann_whitney_u(o, "price", "priority", "1-URGENT", "5-LOW")


# ---------------------------------------------------------------------------
# q292 — Benjamini-Hochberg FDR over a deterministic p-value screen
# (md5-uniform per sampled customer — the replayable stand-in for a
# per-segment test sweep). Step-up rule: reject rank ≤ k where k =
# max{i : p_i ≤ i·α/m}.
# ---------------------------------------------------------------------------
@query(
    "q292_bh_fdr",
    oracle="""
    WITH tests AS (
      SELECT c_custkey AS test_id,
        (CAST(('0x' || substr(md5('fdr292' || CAST(c_custkey AS VARCHAR)),
          1, 8)) AS UBIGINT) + 1.0) / 4294967297.0 AS p_value
      FROM customer WHERE c_custkey % 29 = 0
    ),
    ranked AS (
      SELECT test_id, p_value,
        ROW_NUMBER() OVER (ORDER BY p_value ASC, test_id ASC) AS rank,
        COUNT(*) OVER () AS m
      FROM tests
    ),
    thr AS (
      SELECT test_id, p_value, rank,
        CAST(rank AS DOUBLE) * 0.2 / CAST(m AS DOUBLE) AS threshold
      FROM ranked
    ),
    kk AS (
      SELECT COALESCE(MAX(rank), 0) AS k FROM thr
      WHERE p_value <= threshold
    )
    SELECT CAST(test_id AS BIGINT) AS test_id,
      CAST(p_value AS DOUBLE) AS p_value,
      CAST(rank AS BIGINT) AS rank,
      CAST(ROUND(threshold, 9) AS DOUBLE) AS threshold,
      rank <= k AS rejected
    FROM thr CROSS JOIN kk
    ORDER BY rank ASC
    """,
)
def q292_bh_fdr(spark, sf_dir):
    """operators/stats.bh_fdr over an md5-deterministic p-value table
    (1-in-29 customer sample, the hash_bucket convention). Global
    p-rank via dense_ids — no single-task window; k is a broadcast
    1-row aggregate."""
    from ..operators.bootstrap import md5_uniform
    from ..operators.stats import bh_fdr

    c = T(spark, sf_dir, "customer").filter(F.col("c_custkey") % 29 == 0)
    tests = c.select(
        F.col("c_custkey").alias("test_id"),
        md5_uniform(F.col("c_custkey").cast("string"), "fdr292").alias(
            "p_value"
        ),
    )
    return bh_fdr(tests, "test_id", "p_value", alpha=0.2).orderBy("rank")


# ---------------------------------------------------------------------------
# q293 — standardized effect sizes between order-status groups:
# Cohen's d + Hedges' g for every ordered status pair, from one
# exact-decimal suffstats aggregate.
# ---------------------------------------------------------------------------
@query(
    "q293_effect_sizes",
    oracle="""
    WITH g AS (
      SELECT o_orderstatus AS s, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,6))
          AS sx,
        CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
          * CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(38,4)))
          AS DECIMAL(38,6)) AS ss
      FROM orders WHERE o_totalprice IS NOT NULL
      GROUP BY o_orderstatus
    ),
    pairs AS (
      SELECT a.s AS group_a, b.s AS group_b, a.n AS n_a, b.n AS n_b,
        CAST(a.sx AS DOUBLE) AS sa, CAST(a.ss AS DOUBLE) AS ssa,
        CAST(b.sx AS DOUBLE) AS sb, CAST(b.ss AS DOUBLE) AS ssb,
        CAST(a.n AS DOUBLE) AS na, CAST(b.n AS DOUBLE) AS nb
      FROM g a JOIN g b ON a.s < b.s
    ),
    d AS (
      SELECT group_a, group_b, n_a, n_b, na, nb,
        ((na - 1.0) * ((ssa - sa * sa / na) / (na - 1.0))
         + (nb - 1.0) * ((ssb - sb * sb / nb) / (nb - 1.0)))
          / (na + nb - 2.0) AS sp2,
        sa / na - sb / nb AS md
      FROM pairs
    )
    SELECT group_a, group_b, n_a, n_b,
      CAST(ROUND(CASE WHEN n_a >= 2 AND n_b >= 2 AND sp2 > 0
        THEN md / sqrt(sp2) END, 6) AS DOUBLE) AS d,
      CAST(ROUND(CASE WHEN n_a >= 2 AND n_b >= 2 AND sp2 > 0
        THEN md / sqrt(sp2) END
        * (1.0 - 3.0 / (4.0 * (na + nb) - 9.0)), 6) AS DOUBLE) AS g
    FROM d
    ORDER BY group_a ASC, group_b ASC
    """,
)
def q293_effect_sizes(spark, sf_dir):
    """operators/stats.cohens_d across order-status groups on order
    value — the effect-size companion to q248's Welch t-test (one
    keyed exact-decimal aggregate, broadcast pair join)."""
    from ..operators.stats import cohens_d

    o = T(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    return cohens_d(o, "price", "status").orderBy("group_a", "group_b")


# ---------------------------------------------------------------------------
# q294 — CUSUM change-point over daily revenue: where does cumulative
# deviation from the mean peak? Exact integer cumsum (running_totals)
# + dense_ids rank; argmax is a top-1.
# ---------------------------------------------------------------------------
@query(
    "q294_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
        CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
          AS DECIMAL(18,2)) * 100 AS BIGINT) AS xs
      FROM orders GROUP BY 1
    ),
    c AS (
      SELECT day, xs,
        SUM(xs) OVER (ORDER BY day ASC ROWS UNBOUNDED PRECEDING) AS cum,
        ROW_NUMBER() OVER (ORDER BY day ASC) AS i
      FROM daily
    ),
    t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(xs) AS BIGINT) AS tt
      FROM daily
    ),
    scored AS (
      SELECT n, i AS cp_rank, day AS cp_day,
        ABS(CAST(n AS DECIMAL(38,0)) * CAST(cum AS DECIMAL(38,0))
            - CAST(i AS DECIMAL(38,0)) * CAST(tt AS DECIMAL(38,0))) AS ad,
        tt
      FROM c CROSS JOIN t
    ),
    top AS (
      SELECT * FROM scored ORDER BY ad DESC, cp_rank ASC LIMIT 1
    )
    SELECT n, CAST(cp_rank AS BIGINT) AS cp_rank, cp_day,
      CAST(FLOOR(CAST(ad AS DOUBLE)
        / (100.0 * CAST(n AS DOUBLE)) * 1000000 + 0.5) / 1000000
        AS DOUBLE) AS s_max,
      CAST(FLOOR(CAST(tt AS DOUBLE)
        / (100.0 * CAST(n AS DOUBLE)) * 1000000 + 0.5) / 1000000
        AS DOUBLE) AS mean
    FROM top
    """,
)
def q294_cusum_changepoint(spark, sf_dir):
    """operators/timeseries.cusum_changepoint over the daily-revenue
    series (orders aggregated per day first — order key unique by
    construction). Detects the level shift the synthetic order stream
    carries across its date range."""
    from ..operators.timeseries import cusum_changepoint
    from ._helpers import dec

    daily = (
        T(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(dec("o_totalprice")).cast("decimal(18,2)").alias("rev"))
    )
    return cusum_changepoint(daily, "day", "rev", scale=2).select(
        "n", "cp_rank", F.col("cp_day").cast("date").alias("cp_day"),
        "s_max", "mean",
    )
