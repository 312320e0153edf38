"""Round-7 statistics wave (q291-q297): rank tests, multiple-testing
control, effect sizes, change-point detection, variance homogeneity,
autocorrelation, and proportion A/B — the completions of the
experimentation tier, all on the range-partitioned machinery
(running_totals/dense_ids) or pure keyed aggregates, zero
un-partitioned windows, all inside the value-hash gate.
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


# ---------------------------------------------------------------------------
# q295 — Brown-Forsythe variance homogeneity across order statuses:
# ANOVA F on |x − group median| (exact type-7 medians, q102
# contract), the robustness pre-check for q243/q293's pooled-
# variance assumptions.
# ---------------------------------------------------------------------------
@query(
    "q295_brown_forsythe",
    oracle="""
    WITH med AS (
      SELECT o_orderstatus AS g, quantile_cont(o_totalprice, 0.5) AS m
      FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1
    ),
    z AS (
      SELECT o.o_orderstatus AS g,
        CAST(ABS(CAST(o.o_totalprice AS DOUBLE) - med.m)
             AS DECIMAL(18,3)) AS v
      FROM orders o JOIN med ON med.g = o.o_orderstatus
      WHERE o.o_totalprice IS NOT NULL
    ),
    lvl AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(v) AS DECIMAL(38,6)) AS s,
        CAST(SUM(CAST(v * v AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS ss
      FROM z GROUP BY g
    ),
    top AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k_groups,
        CAST(SUM(n) AS BIGINT) AS n_rows,
        CAST(SUM(s) AS DECIMAL(38,6)) AS sg,
        CAST(SUM(ss) AS DECIMAL(38,6)) AS ssg,
        CAST(list_sum(list_sort(list(
          CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
        ))) AS DOUBLE) AS t1
      FROM lvl
    ),
    d AS (
      SELECT k_groups, n_rows, t1,
        CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
          / CAST(n_rows AS DOUBLE) AS cf,
        CAST(ssg AS DOUBLE) AS ss_tot
      FROM top
    ),
    m AS (
      SELECT k_groups, n_rows,
        t1 - cf AS ssb, ss_tot - t1 AS ssw, ss_tot - cf AS sst,
        (k_groups >= 2 AND n_rows > k_groups AND ss_tot - t1 > 0) AS ok
      FROM d
    )
    SELECT k_groups, n_rows,
      CAST(ROUND(ssb / 1.0e9, 3) AS DOUBLE) AS ss_between_bn,
      CAST(ROUND(ssw / 1.0e9, 3) AS DOUBLE) AS ss_within_bn,
      CAST(ROUND(CASE WHEN ok THEN
        (ssb / (CAST(k_groups AS DOUBLE) - 1.0))
        / (ssw / (CAST(n_rows AS DOUBLE) - CAST(k_groups AS DOUBLE)))
      END, 6) AS DOUBLE) AS f_stat,
      CAST(ROUND(CASE WHEN ok AND sst > 0 THEN ssb / sst END, 6)
        AS DOUBLE) AS eta_sq
    FROM m
    """,
)
def q295_brown_forsythe(spark, sf_dir):
    """operators/stats.brown_forsythe over order value by status —
    group medians broadcast, deviations quantized at 1e-3 (exact for
    2-decimal inputs), then the anova_f machinery unchanged."""
    from ..operators.stats import brown_forsythe

    o = T(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    return brown_forsythe(o, "price", "status")


# ---------------------------------------------------------------------------
# q296 — exact autocorrelation of daily revenue at lags 1..7: the
# weekly-seasonality probe. Integer sums (scaled 1e2), the mean
# cleared in ONE fixed IEEE expression, no windows (lagged pairs via
# a date+k equi-join).
# ---------------------------------------------------------------------------
@query(
    "q296_revenue_acf",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
        CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
          AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(x) AS DECIMAL(38,0)) AS t,
        CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
          AS DECIMAL(38,0)) AS sxx
      FROM daily
    ),
    lags AS (SELECT CAST(unnest(range(1, 8)) AS INT) AS lag),
    per_lag AS (
      SELECT l.lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        CAST(SUM(CAST(a.x AS DECIMAL(19,0)) * CAST(b.x AS DECIMAL(19,0)))
          AS DECIMAL(38,0)) AS sxy,
        CAST(SUM(a.x) AS DECIMAL(38,0)) AS h,
        CAST(SUM(b.x) AS DECIMAL(38,0)) AS lo
      FROM lags l
      JOIN daily a ON TRUE
      JOIN daily b ON b.d = a.d + l.lag
      GROUP BY l.lag
    )
    SELECT lag, n_pairs,
      CAST(CASE WHEN CAST(sxx AS DOUBLE)
            - CAST(t AS DOUBLE) * CAST(t AS DOUBLE) / CAST(n AS DOUBLE) > 0
        THEN FLOOR((
          CAST(sxy AS DOUBLE)
          - CAST(t AS DOUBLE) * (CAST(h AS DOUBLE) + CAST(lo AS DOUBLE))
            / CAST(n AS DOUBLE)
          + (CAST(n AS DOUBLE) - CAST(lag AS DOUBLE)) * CAST(t AS DOUBLE)
            * CAST(t AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
        ) / (
          CAST(sxx AS DOUBLE)
          - CAST(t AS DOUBLE) * CAST(t AS DOUBLE) / CAST(n AS DOUBLE)
        ) * 1000000 + 0.5) / 1000000 END AS DOUBLE) AS r
    FROM per_lag CROSS JOIN tot
    ORDER BY lag ASC
    """,
)
def q296_revenue_acf(spark, sf_dir):
    """operators/timeseries.acf_exact over the daily-revenue series —
    exact integer sums, mean cleared in one IEEE expression, lagged
    pairs from a date+k equi-join."""
    from ..operators.timeseries import acf_exact
    from ._helpers import dec

    daily = (
        T(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(dec("o_totalprice")).cast("decimal(18,2)").alias("rev"))
    )
    return acf_exact(daily, "day", "rev", max_lag=7, scale=2)


# ---------------------------------------------------------------------------
# q297 — two-proportion z-test + Wilson CIs: conversion-rate A/B over
# md5-assigned arms (success = positive account balance), the
# categorical companion of q251's bootstrap uplift.
# ---------------------------------------------------------------------------
@query(
    "q297_two_proportion_ab",
    oracle="""
    WITH u AS (
      SELECT
        CASE WHEN CAST(('0x' || substr(md5('ab297'
            || CAST(c_custkey AS VARCHAR)), 1, 8)) AS UBIGINT) % 2 = 0
          THEN 'control' ELSE 'treatment' END AS arm,
        CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS conv
      FROM customer
    ),
    agg AS (
      SELECT
        CAST(COUNT(CASE WHEN arm = 'control' THEN 1 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN arm = 'control' THEN conv ELSE 0 END)
          AS BIGINT) AS x_a,
        CAST(COUNT(CASE WHEN arm = 'treatment' THEN 1 END) AS BIGINT)
          AS n_b,
        CAST(SUM(CASE WHEN arm = 'treatment' THEN conv ELSE 0 END)
          AS BIGINT) AS x_b
      FROM u
    ),
    d AS (
      SELECT n_a, x_a, n_b, x_b,
        CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
        CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb,
        (CAST(x_a AS DOUBLE) + CAST(x_b AS DOUBLE))
          / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS pp,
        CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
        1.959964 AS c
      FROM agg
    )
    SELECT n_a, x_a, n_b, x_b,
      CAST(ROUND(pa, 6) AS DOUBLE) AS p_a,
      CAST(ROUND(pb, 6) AS DOUBLE) AS p_b,
      CAST(ROUND(CASE WHEN n_a > 0 AND n_b > 0
          AND pp * (1.0 - pp) * (1.0 / na + 1.0 / nb) > 0
        THEN (pa - pb)
          / sqrt(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb)) END, 6)
        AS DOUBLE) AS z_score,
      CAST(ROUND((pa + c * c / (2.0 * na)
        - c * sqrt(pa * (1.0 - pa) / na + c * c / (4.0 * na * na)))
        / (1.0 + c * c / na), 6) AS DOUBLE) AS wilson_lo_a,
      CAST(ROUND((pa + c * c / (2.0 * na)
        + c * sqrt(pa * (1.0 - pa) / na + c * c / (4.0 * na * na)))
        / (1.0 + c * c / na), 6) AS DOUBLE) AS wilson_hi_a,
      CAST(ROUND((pb + c * c / (2.0 * nb)
        - c * sqrt(pb * (1.0 - pb) / nb + c * c / (4.0 * nb * nb)))
        / (1.0 + c * c / nb), 6) AS DOUBLE) AS wilson_lo_b,
      CAST(ROUND((pb + c * c / (2.0 * nb)
        + c * sqrt(pb * (1.0 - pb) / nb + c * c / (4.0 * nb * nb)))
        / (1.0 + c * c / nb), 6) AS DOUBLE) AS wilson_hi_b
    FROM d
    """,
)
def q297_two_proportion_ab(spark, sf_dir):
    """operators/stats.two_proportion_ztest over md5-assigned arms on
    customer conversion (positive balance) — one conditional exact-
    count aggregate, Wilson intervals per arm."""
    from ..operators.sampling import hash_bucket
    from ..operators.stats import two_proportion_ztest

    c = T(spark, sf_dir, "customer").select(
        (F.col("c_acctbal") > 0).alias("converted"),
        F.when(
            hash_bucket("c_custkey", 2, salt="ab297") == 0, "control"
        )
        .otherwise("treatment")
        .alias("arm"),
    )
    return two_proportion_ztest(c, "converted", "arm", "control", "treatment")


# ---------------------------------------------------------------------------
# q298 — Gopher repetition filters over the document corpus: the
# top-2-gram and duplicated-5-gram character fractions (Rae et al.
# 2021 quality signals), worst 15 documents.
# ---------------------------------------------------------------------------
@query(
    "q298_gopher_repetition",
    oracle="""
    WITH docs AS (
      SELECT doc_id, length(text) AS L,
        list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                    x -> x <> '') AS ws
      FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL
    ),
    w AS (SELECT * FROM docs WHERE len(ws) >= 5),
    g2 AS (
      SELECT doc_id,
        unnest([array_to_string(ws[i:i+1], ' ')
                for i in range(1, len(ws))]) AS gram
      FROM w
    ),
    c2 AS (
      SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS c
      FROM g2 GROUP BY 1, 2
    ),
    m2 AS (SELECT doc_id, MAX(c) AS mc FROM c2 GROUP BY 1),
    t2 AS (
      SELECT c2.doc_id, MIN(c2.gram) AS top_gram, MAX(m2.mc) AS tc
      FROM c2 JOIN m2 ON m2.doc_id = c2.doc_id AND c2.c = m2.mc
      GROUP BY 1
    ),
    g5 AS (
      SELECT doc_id,
        unnest([array_to_string(ws[i:i+4], ' ')
                for i in range(1, len(ws) - 3)]) AS gram
      FROM w
    ),
    c5 AS (
      SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS c
      FROM g5 GROUP BY 1, 2
    ),
    d5 AS (
      SELECT doc_id, CAST(SUM(c * length(gram)) AS BIGINT) AS dc
      FROM c5 WHERE c > 1 GROUP BY 1
    ),
    scored AS (
      SELECT w.doc_id, CAST(len(w.ws) AS BIGINT) AS n_words,
        t2.top_gram,
        FLOOR(CAST(t2.tc AS DOUBLE) * CAST(length(t2.top_gram) AS DOUBLE)
              / CAST(w.L AS DOUBLE) * 1000000 + 0.5) / 1000000 AS top_frac,
        FLOOR(CAST(COALESCE(d5.dc, 0) AS DOUBLE)
              / CAST(w.L AS DOUBLE) * 1000000 + 0.5) / 1000000 AS dup_frac
      FROM w
      JOIN t2 ON t2.doc_id = w.doc_id
      LEFT JOIN d5 ON d5.doc_id = w.doc_id
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, n_words, top_gram,
      CAST(top_frac AS DOUBLE) AS top_frac,
      CAST(dup_frac AS DOUBLE) AS dup_frac
    FROM scored
    ORDER BY dup_frac DESC, top_frac DESC, doc_id ASC
    LIMIT 15
    """,
)
def q298_gopher_repetition(spark, sf_dir):
    """operators/quality.ngram_repetition — the MassiveText/Gopher
    intra-document repetition filters (top-2-gram and duplicated-
    5-gram character fractions), worst 15 documents by duplication.
    Map-side n-gram generation, two keyed aggregates per signal, the
    argmax gram via max-count join-back (no window)."""
    from ..operators.quality import ngram_repetition

    d = T(spark, sf_dir, "documents")
    return (
        ngram_repetition(d, "doc_id", "text", top_n=2, dup_n=5)
        .orderBy(
            F.desc("dup_frac"), F.desc("top_frac"), F.asc("doc_id")
        )
        .limit(15)
    )


# ---------------------------------------------------------------------------
# q299 — corpus-scale exact quantiles WITHOUT group buffering: the
# distinct-value cumsum path (running_totals) locating exact order
# statistics + type-7 interpolation. The 100 TB twin of q102's
# percentile() (which buffers its group in executor memory).
# ---------------------------------------------------------------------------
@query(
    "q299_scalable_quantiles",
    oracle="""
    WITH vt AS (
      SELECT l_extendedprice AS v, CAST(COUNT(*) AS BIGINT) AS t
      FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1
    ),
    cum AS (
      SELECT v, t,
        SUM(t) OVER (ORDER BY v ASC ROWS UNBOUNDED PRECEDING) AS c
      FROM vt
    ),
    nn AS (SELECT CAST(SUM(t) AS BIGINT) AS n FROM vt),
    probs AS (
      SELECT unnest([0.1, 0.25, 0.5, 0.75, 0.9, 0.99]) AS p
    ),
    pos AS (
      SELECT p,
        CAST(n - 1 AS DOUBLE) * p + 1.0 AS h,
        CAST(FLOOR(CAST(n - 1 AS DOUBLE) * p + 1.0) AS BIGINT) AS lo,
        CAST(CEIL(CAST(n - 1 AS DOUBLE) * p + 1.0) AS BIGINT) AS hi
      FROM probs CROSS JOIN nn
    ),
    picked AS (
      SELECT pos.p, pos.h,
        MAX(CASE WHEN pos.lo >= c - t + 1 AND pos.lo <= c
            THEN CAST(v AS DOUBLE) END) AS vlo,
        MAX(CASE WHEN pos.hi >= c - t + 1 AND pos.hi <= c
            THEN CAST(v AS DOUBLE) END) AS vhi
      FROM cum CROSS JOIN pos
      GROUP BY pos.p, pos.h
    )
    SELECT p,
      CAST(FLOOR((vlo + (h - FLOOR(h)) * (vhi - vlo)) * 1000000 + 0.5)
           / 1000000 AS DOUBLE) AS quantile
    FROM picked
    ORDER BY p ASC
    """,
)
def q299_scalable_quantiles(spark, sf_dir):
    """operators/quality.exact_quantiles_scalable over lineitem
    extended price — six corpus-wide quantiles from the distinct-
    value running-count table; no executor ever buffers the corpus
    (contrast q102's percentile(), the bounded-group tool)."""
    from ..operators.quality import exact_quantiles_scalable

    li = T(spark, sf_dir, "lineitem")
    return exact_quantiles_scalable(
        li, "l_extendedprice", [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    )


# ---------------------------------------------------------------------------
# q300 — moment-based normality screen per order priority: skewness,
# excess kurtosis, Jarque-Bera from exact decimal raw moments Σx..Σx⁴
# (one keyed aggregate; the central-moment algebra is one IEEE
# expression — builtin skewness() float-accumulates and is unusable
# under the hash gate).
# ---------------------------------------------------------------------------
@query(
    "q300_jarque_bera",
    oracle="""
    WITH m AS (
      SELECT o_orderpriority AS priority,
        CAST(COUNT(*) AS BIGINT) AS n,
        SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s1,
        SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
            * CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(19,4))) AS s2,
        SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
            * CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(19,4))
            * CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(28,6))) AS s3,
        SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
            * CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(19,4))
            * CAST(CAST(o_totalprice AS DECIMAL(18,2))
              * CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(19,4))
            AS DECIMAL(33,8))) AS s4
      FROM orders WHERE o_totalprice IS NOT NULL
      GROUP BY o_orderpriority
    ),
    d AS (
      SELECT priority, n,
        CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS s1,
        CAST(s2 AS DOUBLE) AS s2, CAST(s3 AS DOUBLE) AS s3,
        CAST(s4 AS DOUBLE) AS s4
      FROM m
    ),
    c AS (
      SELECT priority, n, nd,
        s1 / nd AS mu, s2 / nd - (s1 / nd) * (s1 / nd) AS m2,
        s3 / nd - 3.0 * (s1 / nd) * (s2 / nd)
          + 2.0 * (s1 / nd) * (s1 / nd) * (s1 / nd) AS m3,
        s4 / nd - 4.0 * (s1 / nd) * (s3 / nd)
          + 6.0 * (s1 / nd) * (s1 / nd) * (s2 / nd)
          - 3.0 * (s1 / nd) * (s1 / nd) * (s1 / nd) * (s1 / nd) AS m4
      FROM d
    ),
    s AS (
      SELECT priority, n, nd,
        CASE WHEN n >= 2 AND m2 > 0
          THEN m3 / sqrt(m2 * m2 * m2) END AS sk,
        CASE WHEN n >= 2 AND m2 > 0
          THEN m4 / (m2 * m2) - 3.0 END AS ku
      FROM c
    )
    SELECT priority, n,
      CAST(ROUND(sk, 6) AS DOUBLE) AS skewness,
      CAST(ROUND(ku, 6) AS DOUBLE) AS kurtosis_ex,
      CAST(ROUND(nd / 6.0 * (sk * sk + ku * ku / 4.0), 6) AS DOUBLE)
        AS jb_stat
    FROM s
    ORDER BY priority ASC
    """,
)
def q300_jarque_bera(spark, sf_dir):
    """operators/stats.moments_normality over order value per
    priority — exact raw moments, central-moment algebra in one IEEE
    expression, the moment casts width-safe on both engines."""
    from ..operators.stats import moments_normality

    o = T(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("price"),
        F.col("o_orderpriority").alias("priority"),
    )
    return moments_normality(o, "price", "priority").orderBy("priority")


# ---------------------------------------------------------------------------
# q301 — forecast accuracy of the naive-seasonal baseline (predict
# daily revenue with the value 7 days earlier): MAE/RMSE/MAPE/sMAPE/
# bias from exact quantized error sums.
# ---------------------------------------------------------------------------
@query(
    "q301_forecast_accuracy",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
        CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
          AS DECIMAL(18,2)) AS DOUBLE) AS rev
      FROM orders GROUP BY 1
    ),
    pairs AS (
      SELECT a.rev AS actual, b.rev AS pred
      FROM daily a JOIN daily b ON a.day = b.day + 7
    ),
    terms AS (
      SELECT
        CAST(pred - actual AS DECIMAL(18,4)) AS err,
        CAST(ABS(pred - actual) AS DECIMAL(18,4)) AS abs_err,
        CAST((pred - actual) * (pred - actual) AS DECIMAL(30,4)) AS sq_err,
        CASE WHEN actual <> 0.0
          THEN CAST(ABS(pred - actual) / ABS(actual) AS DECIMAL(18,4))
        END AS ape,
        CASE WHEN ABS(actual) + ABS(pred) > 0.0
          THEN CAST(ABS(pred - actual) / (ABS(actual) + ABS(pred))
               AS DECIMAL(18,4))
        END AS sape
      FROM pairs
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(abs_err) AS DECIMAL(38,6)) AS sae,
        CAST(SUM(sq_err) AS DECIMAL(38,6)) AS sse,
        CAST(SUM(err) AS DECIMAL(38,6)) AS se,
        CAST(SUM(ape) AS DECIMAL(38,6)) AS sape_sum,
        CAST(COUNT(ape) AS BIGINT) AS n_mape,
        CAST(SUM(sape) AS DECIMAL(38,6)) AS ssmape,
        CAST(COUNT(sape) AS BIGINT) AS n_smape
      FROM terms
    )
    SELECT n,
      CAST(ROUND(CAST(sae AS DOUBLE) / CAST(n AS DOUBLE), 6) AS DOUBLE)
        AS mae,
      CAST(ROUND(sqrt(CAST(sse AS DOUBLE) / CAST(n AS DOUBLE)), 6)
        AS DOUBLE) AS rmse,
      CAST(ROUND(CASE WHEN n_mape > 0 THEN CAST(sape_sum AS DOUBLE)
        / CAST(n_mape AS DOUBLE) * 100.0 END, 6) AS DOUBLE) AS mape,
      CAST(ROUND(CASE WHEN n_smape > 0 THEN CAST(ssmape AS DOUBLE)
        / CAST(n_smape AS DOUBLE) * 200.0 END, 6) AS DOUBLE) AS smape,
      CAST(ROUND(CAST(se AS DOUBLE) / CAST(n AS DOUBLE), 6) AS DOUBLE)
        AS bias
    FROM agg
    """,
)
def q301_forecast_accuracy(spark, sf_dir):
    """operators/stats.forecast_accuracy over the naive-seasonal
    (lag-7) daily-revenue baseline — the holdout evaluation table the
    holt/ewma tiers report against. The lag join is a date+7
    equi-join (q296's shape); error terms quantize at 1e-4 so the
    corpus-sized sums are exact."""
    from ..operators.stats import forecast_accuracy
    from ._helpers import dec

    daily = (
        T(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(dec("o_totalprice"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("rev")
        )
    )
    a = daily.select(F.col("day").alias("_d"), F.col("rev").alias("actual"))
    b = daily.select(
        F.expr("date_add(day, 7)").alias("_d"), F.col("rev").alias("pred")
    )
    pairs = a.join(b, "_d").select("actual", "pred")
    return forecast_accuracy(pairs, "actual", "pred")


# ---------------------------------------------------------------------------
# q302 — ordered funnel (view → click → purchase): strict-order
# earliest-event funnel, one keyed MIN aggregate + co-keyed join per
# step; rates floor-quantized.
# ---------------------------------------------------------------------------
@query(
    "q302_event_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t FROM events
      WHERE event_type = 'view' AND user_id IS NOT NULL GROUP BY 1
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t
      WHERE e.event_type = 'click' GROUP BY 1
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t
      WHERE e.event_type = 'purchase' GROUP BY 1
    ),
    c AS (
      SELECT (SELECT COUNT(*) FROM s1) AS n1,
             (SELECT COUNT(*) FROM s2) AS n2,
             (SELECT COUNT(*) FROM s3) AS n3
    )
    SELECT 1 AS step_idx, 'view' AS step, CAST(n1 AS BIGINT) AS n_users,
      CAST(CASE WHEN n1 > 0 THEN 1.0 END AS DOUBLE) AS conv_from_prev,
      CAST(CASE WHEN n1 > 0 THEN FLOOR(CAST(n1 AS DOUBLE)
        / CAST(n1 AS DOUBLE) * 1000000 + 0.5) / 1000000 END AS DOUBLE)
        AS conv_from_first
    FROM c
    UNION ALL
    SELECT 2, 'click', CAST(n2 AS BIGINT),
      CAST(CASE WHEN n1 > 0 THEN FLOOR(CAST(n2 AS DOUBLE)
        / CAST(n1 AS DOUBLE) * 1000000 + 0.5) / 1000000 END AS DOUBLE),
      CAST(CASE WHEN n1 > 0 THEN FLOOR(CAST(n2 AS DOUBLE)
        / CAST(n1 AS DOUBLE) * 1000000 + 0.5) / 1000000 END AS DOUBLE)
    FROM c
    UNION ALL
    SELECT 3, 'purchase', CAST(n3 AS BIGINT),
      CAST(CASE WHEN n2 > 0 THEN FLOOR(CAST(n3 AS DOUBLE)
        / CAST(n2 AS DOUBLE) * 1000000 + 0.5) / 1000000 END AS DOUBLE),
      CAST(CASE WHEN n1 > 0 THEN FLOOR(CAST(n3 AS DOUBLE)
        / CAST(n1 AS DOUBLE) * 1000000 + 0.5) / 1000000 END AS DOUBLE)
    FROM c
    ORDER BY step_idx ASC
    """,
)
def q302_event_funnel(spark, sf_dir):
    """operators/sequences.funnel_steps over the event stream:
    view → click → purchase, strict event-time order (a user's click
    counts only after their first view, etc.). Each step is one
    co-keyed MIN aggregate; intermediates are one row per surviving
    user."""
    from ..operators.sequences import funnel_steps

    e = T(spark, sf_dir, "events")
    return funnel_steps(
        e, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    ).orderBy("step_idx")


# ---------------------------------------------------------------------------
# q303 — per-source word-entropy profile: the template/boilerplate
# screen (near-zero entropy = a handful of tokens repeated). Per-doc
# entropies are exact (quantize-then-decimal-sum over word counts),
# then aggregate per source as exact DECIMAL(18,6) sums.
# ---------------------------------------------------------------------------
@query(
    "q303_word_entropy_profile",
    oracle="""
    WITH words AS (
      SELECT doc_id, source,
        unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> '')) AS w
      FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL
    ),
    wc AS (
      SELECT doc_id, source, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM words GROUP BY 1, 2, 3
    ),
    per_doc AS (
      SELECT doc_id, source,
        CAST(SUM(c) AS BIGINT) AS n_words,
        SUM(CAST(c AS DECIMAL(10,0))
            * CAST(FLOOR(ln(CAST(c AS DOUBLE)) * 1000000000)
                   AS DECIMAL(12,0))) AS sclnc
      FROM wc GROUP BY 1, 2
    ),
    ent AS (
      SELECT doc_id, source, n_words,
        FLOOR((ln(CAST(n_words AS DOUBLE))
               - CAST(sclnc AS DOUBLE) / 1e9 / CAST(n_words AS DOUBLE))
              * 1000000 + 0.5) / 1000000 AS h
      FROM per_doc
    )
    SELECT source,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(ROUND(CAST(SUM(CAST(h AS DECIMAL(18,6))) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE), 6) AS DOUBLE) AS avg_entropy,
      CAST(MIN(h) AS DOUBLE) AS min_entropy,
      CAST(MAX(h) AS DOUBLE) AS max_entropy
    FROM ent
    GROUP BY source
    ORDER BY source ASC
    """,
)
def q303_word_entropy_profile(spark, sf_dir):
    """operators/quality.word_entropy rolled up per source — average/
    min/max per-doc unigram entropy (exact decimal aggregation of the
    floor-quantized per-doc values)."""
    from ..operators.quality import word_entropy

    d = T(spark, sf_dir, "documents")
    ent = word_entropy(d, "doc_id", "text")
    src = T(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        ent.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(
                F.sum(F.col("entropy").cast("decimal(18,6)"))
                .cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            )
            .cast("double")
            .alias("avg_entropy"),
            F.min("entropy").cast("double").alias("min_entropy"),
            F.max("entropy").cast("double").alias("max_entropy"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q304 — exact 1-Wasserstein drift between URGENT and LOW order-value
# distributions: the earth-mover magnitude KS can't give. One range
# shuffle for BOTH cumulative counts (two-weight running_totals),
# rationals cleared by n_a·n_b so the reduction is an exact decimal
# integer sum; one division at the end.
# ---------------------------------------------------------------------------
@query(
    "q304_wasserstein_drift",
    oracle="""
    WITH base AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        AS v, o_orderpriority AS g
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        AND o_totalprice IS NOT NULL
    ),
    vt AS (
      SELECT v,
        CAST(SUM(CASE WHEN g = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT)
          AS ca,
        CAST(SUM(CASE WHEN g = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT)
          AS cb
      FROM base GROUP BY v
    ),
    cum AS (
      SELECT v,
        SUM(ca) OVER (ORDER BY v ASC ROWS UNBOUNDED PRECEDING) AS cuma,
        SUM(cb) OVER (ORDER BY v ASC ROWS UNBOUNDED PRECEDING) AS cumb,
        LEAD(v) OVER (ORDER BY v ASC) AS vnext
      FROM vt
    ),
    tot AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
      FROM vt
    ),
    terms AS (
      SELECT na, nb,
        ABS(CAST(cuma AS DECIMAL(14,0)) * CAST(nb AS DECIMAL(14,0))
            - CAST(cumb AS DECIMAL(14,0)) * CAST(na AS DECIMAL(14,0)))
          * CAST(vnext - v AS DECIMAL(9,0)) AS t
      FROM cum CROSS JOIN tot WHERE vnext IS NOT NULL
    )
    SELECT na AS n_a, nb AS n_b,
      CAST(CASE WHEN na > 0 AND nb > 0 THEN
        FLOOR(CAST(SUM(t) AS DOUBLE)
              / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) * 100.0)
              * 1000000 + 0.5) / 1000000 END AS DOUBLE) AS w1
    FROM terms GROUP BY na, nb
    """,
)
def q304_wasserstein_drift(spark, sf_dir):
    """operators/stats.wasserstein_1d between URGENT and LOW order
    values — the exact earth-mover distance from one two-weight
    range-partitioned cumsum over merged distinct values; neighbor
    gaps via a dense-rank equi-join, no windows."""
    from ..operators.stats import wasserstein_1d

    o = T(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("price"),
        F.col("o_orderpriority").alias("priority"),
    )
    return wasserstein_1d(o, "price", "priority", "1-URGENT", "5-LOW")


# ---------------------------------------------------------------------------
# q305 — Nelson-Aalen cumulative hazard of customer lifetimes (the
# additive twin of q177's KM curve, same cohort): increments
# floor-quantized at 1e-9 so the in-group prefix accumulation is an
# exact integer sum.
# ---------------------------------------------------------------------------
@query(
    "q305_nelson_aalen",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
        MIN(CAST(o_orderdate AS DATE)) AS f,
        MAX(CAST(o_orderdate AS DATE)) AS l
      FROM orders GROUP BY o_custkey
    ),
    coh AS (
      SELECT CAST(FLOOR(date_diff('day', f, l) / 30) AS BIGINT) AS t,
        CASE WHEN l < DATE '2000-01-01' THEN 1 ELSE 0 END AS ev
      FROM cust
    ),
    per AS (
      SELECT t, CAST(SUM(ev) AS BIGINT) AS d, CAST(COUNT(*) AS BIGINT) AS m
      FROM coh GROUP BY t
    ),
    r AS (
      SELECT t, d,
        CAST(SUM(m) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS BIGINT) AS n_risk
      FROM per
    ),
    a AS (
      SELECT list(t ORDER BY t) AS ts, list(d ORDER BY t) AS ds,
        list(n_risk ORDER BY t) AS ns,
        list(CAST(FLOOR(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) * 1e9)
             AS BIGINT) ORDER BY t) AS hs,
        list(CAST(FLOOR(CAST(d AS DOUBLE)
             / (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE)) * 1e9)
             AS BIGINT) ORDER BY t) AS vs
      FROM r
    )
    SELECT ts[i] AS t, ns[i] AS n_risk, ds[i] AS n_events,
      CAST(FLOOR(CAST(list_sum(hs[1:i]) AS DOUBLE) / 1e9 * 1000000 + 0.5)
        / 1000000 AS DOUBLE) AS cum_hazard,
      CAST(FLOOR(CAST(list_sum(vs[1:i]) AS DOUBLE) / 1e9 * 1000000 + 0.5)
        / 1000000 AS DOUBLE) AS cum_haz_var
    FROM a, unnest(generate_series(1, len(ts))) AS u(i)
    WHERE ds[i] > 0
    ORDER BY t ASC
    """,
)
def q305_nelson_aalen(spark, sf_dir):
    """operators/survival.nelson_aalen over the q177 customer-
    lifetime cohort — cumulative hazard + its variance at every event
    time, exact integer prefix sums of 1e-9-quantized increments."""
    from ..operators.survival import nelson_aalen

    cust = (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.min(F.to_date("o_orderdate")).alias("f"),
            F.max(F.to_date("o_orderdate")).alias("l"),
        )
    )
    coh = cust.select(
        F.floor(F.datediff("l", "f") / 30).cast("bigint").alias("t"),
        F.when(F.col("l") < F.lit("2000-01-01").cast("date"), 1)
        .otherwise(0)
        .alias("ev"),
    )
    return nelson_aalen(coh, "t", "ev").orderBy("t")
