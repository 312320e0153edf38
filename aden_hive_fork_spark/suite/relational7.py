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


# ---------------------------------------------------------------------------
# q191 — the TPC-H Q5 shape (local-supplier volume): six-way join
# where customer and supplier must share a nation. Supplier/nation/
# region broadcast (dims), the date filter pushes to the orders
# scan, and lineitem joins pre-filtered orders before the wide join.
# ---------------------------------------------------------------------------
@query(
    "q191_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
      CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
        * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
        AS revenue,
      CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
      AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name ASC
    """,
)
def q191_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 analog: revenue from lineitems where the supplier and
    the customer share an ASIA nation, 1996 orders. Dims broadcast;
    the order-date filter reaches the parquet scan (PushedFilters);
    the c↔s nation equality rides the supplier join as a residual."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(s),
            (s["s_suppkey"] == li["l_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), n["n_nationkey"] == s["s_nationkey"])
        .join(F.broadcast(r), r["r_regionkey"] == n["n_regionkey"])
        .groupBy("n_name")
        .agg(
            dround(F.sum(rev)).alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


# ---------------------------------------------------------------------------
# q192 — the TPC-H Q10 shape (returned-item reporting): top-20
# customers by revenue lost to returns in one quarter. The
# returnflag + date filters prune before the joins; top-20 compiles
# to TakeOrderedAndProject.
# ---------------------------------------------------------------------------
@query(
    "q192_returned_item_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
      CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
        * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
        AS lost_revenue,
      CAST(COUNT(*) AS BIGINT) AS n_returned
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= DATE '1996-07-01'
      AND o.o_orderdate < DATE '1996-10-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY lost_revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
)
def q192_returned_item_customers(spark, sf_dir):
    """TPC-H Q10 analog: who returned the most revenue in 1996 Q3.
    Both selective filters push to the scans; nation broadcasts; the
    quarter's returned lineitems aggregate per customer before the
    top-20."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-07-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1996-10-01").cast("date"))
    )
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = T(spark, sf_dir, "nation")
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), n["n_nationkey"] == c["c_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dround(F.sum(rev)).alias("lost_revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_returned"),
        )
        .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q193 — the TPC-H Q8 shape (market share): of all revenue EUROPE
# customers generated per year, which fraction came from NATION_3
# suppliers? Conditional decimal sums in ONE aggregate over the
# joined facts — the share never needs a second pass or a self-join.
# ---------------------------------------------------------------------------
@query(
    "q193_market_share",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS INT) AS yr,
      CAST(COUNT(*) AS BIGINT) AS n_lineitems,
      CAST(ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
          * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE), 2)
        AS DOUBLE) AS total_revenue,
      CAST(ROUND(COALESCE(CAST(SUM(CASE WHEN ns.n_name = 'NATION_3'
            THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(18,4))) END)
            AS DOUBLE), 0.0)
          / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
            * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE), 6)
        AS DOUBLE) AS nation3_share
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = nc.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'EUROPE'
    GROUP BY 1
    ORDER BY yr ASC
    """,
)
def q193_market_share(spark, sf_dir):
    """TPC-H Q8 analog: NATION_3 suppliers' share of EUROPE-customer
    revenue per order year. All dims broadcast; share from
    conditional sums in the same aggregate as the total."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    s = T(spark, sf_dir, "supplier")
    nc = n.select(
        F.col("n_nationkey").alias("nc_key"),
        F.col("n_regionkey").alias("nc_region"),
    )
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("ns_name")
    )
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4))
    cond = F.when(F.col("ns_name") == "NATION_3", rev)
    j = (
        li.join(o, o["o_orderkey"] == li["l_orderkey"])
        .join(c, c["c_custkey"] == o["o_custkey"])
        .join(F.broadcast(nc), F.col("nc_key") == c["c_nationkey"])
        .join(F.broadcast(r), r["r_regionkey"] == F.col("nc_region"))
        .join(F.broadcast(s), s["s_suppkey"] == li["l_suppkey"])
        .join(F.broadcast(ns), F.col("ns_key") == s["s_nationkey"])
    )
    tot = F.sum(rev).cast("double")
    part = F.coalesce(F.sum(cond).cast("double"), F.lit(0.0))
    return (
        j.groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
            F.round(tot, 2).cast("double").alias("total_revenue"),
            F.round(part / tot, 6).cast("double").alias("nation3_share"),
        )
        .orderBy("yr")
    )


# ---------------------------------------------------------------------------
# q201 — the TPC-H Q18 shape (large-volume customers): orders whose
# total line quantity clears a HAVING threshold, semi-joined back to
# facts. The threshold aggregate is the only extra pass, keyed by
# orderkey — the qualifying-key set stays key-sized.
# ---------------------------------------------------------------------------
@query(
    "q201_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 120
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
      CAST(o.o_orderdate AS DATE) AS o_orderdate,
      CAST(ROUND(CAST(o.o_totalprice AS DECIMAL(18,2)), 2) AS DOUBLE)
        AS o_totalprice,
      CAST(ROUND(SUM(CAST(l.l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
      o.o_totalprice
    ORDER BY o_totalprice DESC, o.o_orderkey ASC
    LIMIT 20
    """,
)
def q201_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 analog: orders with > 120 total quantity, top-20 by
    order value. The HAVING subquery is one keyed aggregate whose
    qualifying-key output left-semi prunes the fact join."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("_q"))
        .filter(F.col("_q") > 120)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            "c_custkey", "c_name", "o_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            dround(F.col("o_totalprice"), 2).alias("o_totalprice"),
        )
        .agg(dround(F.sum(dec("l_quantity"))).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q202 — the TPC-H Q17 shape (small-quantity-order revenue): lineitems
# below HALF THEIR PART'S average quantity. The per-part threshold is
# one keyed aggregate joined back (the correlated-aggregate pattern);
# the threshold ROUNDS before the compare so the filter decision is
# engine-neutral.
# ---------------------------------------------------------------------------
@query(
    "q202_small_quantity_revenue",
    oracle="""
    WITH thr AS (
      SELECT l_partkey,
        ROUND(0.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE)), 6) AS half_avg
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lineitems,
      CAST(ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
        AS DOUBLE) / 7.0, 2) AS DOUBLE) AS avg_yearly_loss
    FROM lineitem l JOIN thr t ON t.l_partkey = l.l_partkey
    WHERE CAST(l.l_quantity AS DECIMAL(18,2)) < t.half_avg
    """,
)
def q202_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 analog: revenue locked in below-half-average-quantity
    lineitems. The threshold table is part-cardinality-sized (plain
    join — AQE broadcasts while small); one fact pass."""
    li = T(spark, sf_dir, "lineitem")
    thr = li.groupBy("l_partkey").agg(
        F.round(
            F.lit(0.5)
            * (
                F.sum(dec("l_quantity")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ),
            6,
        ).alias("half_avg")
    )
    return (
        li.join(thr, "l_partkey")
        .filter(dec("l_quantity") < F.col("half_avg"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
            F.round(
                F.sum(dec("l_extendedprice")).cast("double") / 7.0, 2
            )
            .cast("double")
            .alias("avg_yearly_loss"),
        )
    )


# ---------------------------------------------------------------------------
# q203 — the TPC-H Q7 shape (bilateral shipping volume): revenue
# flowing between two specific nations, both directions, per ship
# year. Nation dims broadcast twice (supplier side + customer side);
# the pair predicate prunes before the aggregate.
# ---------------------------------------------------------------------------
@query(
    "q203_bilateral_volume",
    oracle="""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
      CAST(year(l.l_shipdate) AS INT) AS ship_year,
      CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
        * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
        AS volume
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
       OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    ORDER BY supp_nation ASC, cust_nation ASC, ship_year ASC
    """,
)
def q203_bilateral_volume(spark, sf_dir):
    """TPC-H Q7 analog: NATION_1 ↔ NATION_2 trade volume per ship
    year. Both nation lookups broadcast; the bilateral predicate
    prunes pairs before the (nation², years)-sized aggregate."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"),
        F.col("n_name").alias("supp_nation"),
    )
    nc = n.select(
        F.col("n_nationkey").alias("nc_key"),
        F.col("n_name").alias("cust_nation"),
    )
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4))
    pair = (
        (F.col("supp_nation") == "NATION_1")
        & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2")
        & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(o, o["o_orderkey"] == li["l_orderkey"])
        .join(c, c["c_custkey"] == o["o_custkey"])
        .join(F.broadcast(s), s["s_suppkey"] == li["l_suppkey"])
        .join(F.broadcast(ns), F.col("ns_key") == s["s_nationkey"])
        .join(F.broadcast(nc), F.col("nc_key") == c["c_nationkey"])
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(dround(F.sum(rev)).alias("volume"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )
