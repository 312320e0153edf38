"""Seventh relational batch: bitwise operators/aggregates and
UNPIVOT — SQL-surface breadth the passthrough contract must accept
(the reference delegates arbitrary read-only SQL; DuckDB supports
both constructs natively).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query
from ._helpers import T, dec, dround


# ---------------------------------------------------------------------------
# q87 — bitwise expressions + bitwise aggregates (§2.A row 27 breadth).
# ---------------------------------------------------------------------------
@query(
    "q87_bitwise_ops",
    oracle="""
    SELECT o_orderpriority,
      CAST(BIT_AND(o_orderkey) AS BIGINT) AS key_and,
      CAST(BIT_OR(o_orderkey & 255) AS BIGINT) AS low_or,
      CAST(BIT_XOR(o_orderkey) AS BIGINT) AS key_xor,
      CAST(SUM(CASE WHEN (o_orderkey & 1) = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_odd,
      CAST(MAX(o_orderkey << 2) AS BIGINT) AS max_shifted
    FROM orders
    WHERE o_orderkey < 4096
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority ASC
    """,
)
def q87_bitwise_ops(spark, sf_dir):
    """Bitwise AND/OR/XOR aggregates + shift/mask expressions — all
    pure JVM column arithmetic inside whole-stage codegen, one keyed
    shuffle. The o_orderkey < 4096 guard keeps `<< 2` inside BIGINT
    for both engines."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 4096)
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.bit_and("o_orderkey").cast("bigint").alias("key_and"),
            F.bit_or(F.col("o_orderkey").bitwiseAND(F.lit(255)))
            .cast("bigint")
            .alias("low_or"),
            F.bit_xor("o_orderkey").cast("bigint").alias("key_xor"),
            F.sum(
                F.when(F.col("o_orderkey").bitwiseAND(F.lit(1)) == 1, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_odd"),
            F.max(F.shiftleft("o_orderkey", 2)).cast("bigint").alias("max_shifted"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q88 — UNPIVOT (wide -> long): Spark's stack() generator; the oracle
# expresses the same reshape as UNION ALL (engine-neutral semantics).
# ---------------------------------------------------------------------------
@query(
    "q88_unpivot_balances",
    oracle="""
    WITH wide AS (
      SELECT n.n_name AS nation,
        CAST(ROUND(SUM(CASE WHEN c.c_mktsegment = 'BUILDING'
              THEN CAST(c.c_acctbal AS DECIMAL(18,2)) ELSE 0 END), 2) AS DOUBLE) AS building,
        CAST(ROUND(SUM(CASE WHEN c.c_mktsegment = 'MACHINERY'
              THEN CAST(c.c_acctbal AS DECIMAL(18,2)) ELSE 0 END), 2) AS DOUBLE) AS machinery,
        CAST(ROUND(SUM(CASE WHEN c.c_mktsegment = 'AUTOMOBILE'
              THEN CAST(c.c_acctbal AS DECIMAL(18,2)) ELSE 0 END), 2) AS DOUBLE) AS automobile
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name
    )
    SELECT nation, segment, balance FROM (
      SELECT nation, 'BUILDING' AS segment, building AS balance FROM wide
      UNION ALL
      SELECT nation, 'MACHINERY' AS segment, machinery AS balance FROM wide
      UNION ALL
      SELECT nation, 'AUTOMOBILE' AS segment, automobile AS balance FROM wide
    )
    WHERE balance <> 0
    ORDER BY nation ASC, segment ASC
    """,
)
def q88_unpivot_balances(spark, sf_dir):
    """PIVOT (conditional aggregation to wide) then UNPIVOT back to
    long via the stack() generator — the reshape pair a spreadsheet-
    style surface (excel_sql users) leans on. stack() is a generator
    expression (no shuffle beyond the original aggregate); the
    balance <> 0 filter keeps parity with sparse long form."""
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    seg = lambda s: dround(
        F.sum(F.when(F.col("c_mktsegment") == s, dec("c_acctbal")).otherwise(F.lit(0).cast("decimal(18,2)")))
    )
    wide = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            seg("BUILDING").alias("building"),
            seg("MACHINERY").alias("machinery"),
            seg("AUTOMOBILE").alias("automobile"),
        )
    )
    return (
        wide.select(
            "nation",
            F.expr(
                "stack(3, 'BUILDING', building, 'MACHINERY', machinery,"
                " 'AUTOMOBILE', automobile) AS (segment, balance)"
            ),
        )
        .filter(F.col("balance") != 0)
        .orderBy("nation", "segment")
    )


# ---------------------------------------------------------------------------
# q102 — EXACT interpolated percentiles per group (§2.A row 27 depth):
# Spark `percentile` and DuckDB `quantile_cont` implement the same
# type-7 linear interpolation, so exact quantiles are hash-matchable
# (unlike approx_percentile, which is rows-only by contract — q47).
# ---------------------------------------------------------------------------
@query(
    "q102_exact_percentiles",
    oracle="""
    SELECT l_returnflag, l_linestatus,
      CAST(COUNT(*) AS BIGINT) AS n_rows,
      ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
      ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
      ROUND(quantile_cont(l_extendedprice, 0.90), 4) AS p90,
      ROUND(quantile_cont(l_discount, 0.50), 4) AS disc_median
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag ASC, l_linestatus ASC
    """,
)
def q102_exact_percentiles(spark, sf_dir):
    """Exact per-group quantiles over lineitem. Scale note: exact
    percentile is a full-sort-per-group aggregate — the right tool at
    report granularity (bounded groups); for corpus-wide monitoring
    the mergeable log-bucket histograms (operators/rollup) serve
    percentiles from pre-aggregated buckets instead."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            # ONE percentile buffer for all three extendedprice
            # quantiles (array form) instead of three independent
            # aggregates each buffering the full group — measured
            # 3.3 s → 2.0 s at sf0.1, identical output.
            F.expr(
                "percentile(l_extendedprice, array(0.25, 0.50, 0.90))"
            ).alias("_p"),
            F.round(F.expr("percentile(l_discount, 0.50)"), 4).alias(
                "disc_median"
            ),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "n_rows",
            F.round(F.col("_p")[0], 4).alias("p25"),
            F.round(F.col("_p")[1], 4).alias("p50"),
            F.round(F.col("_p")[2], 4).alias("p90"),
            "disc_median",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
