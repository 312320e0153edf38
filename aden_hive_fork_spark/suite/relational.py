"""Relational SQL surface (SURVEY.md §2.A rows 1-23).

The reference's query surface is arbitrary read-only SELECT
(reference: tools/src/aden_tools/tools/csv_tool/csv_tool.py:273-385 —
only write keywords are blocked, csv_tool.py:333-352), so the suite
exercises the full SELECT algebra: scan/project/filter, hash
aggregate, distinct, sort+limit, every join shape, set ops,
subqueries/CTEs, windows, ROLLUP, CASE/COALESCE/NULLIF, casts.

Spark side is DataFrame API — the logical plan is declared and
Catalyst chooses the physical strategy (broadcast vs shuffle join,
partial aggregation, TakeOrderedAndProject for top-k). Scale notes per
query docstring.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import query
from ._helpers import T, avg2, dec, dround

_SHIP_CUTOFF = "1998-09-02 00:00:00"


# ---------------------------------------------------------------------------
# q01 — flagship: scan → filter → hash aggregate → sort (TPC-H Q1 shape).
# Exercises SURVEY §2.A rows 1, 8, 9, 10, 13, 23.
# ---------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag, l_linestatus,
      CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_disc_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4))) * (1 + CAST(l_tax AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_charge,
      ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 2) AS avg_qty,
      ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 2) AS avg_price,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_SHIP_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST
    """,
)
def q01_pricing_summary(spark, sf_dir):
    """Pricing summary. Scale: the filter pushes to the parquet scan
    (PushedFilters on l_shipdate); the aggregate is partial (map-side)
    + final on 6 groups — no skew possible. Survives 100 TB as a
    single scan + tiny shuffle."""
    li = T(spark, sf_dir, "lineitem")
    qty, price = dec("l_quantity"), dec("l_extendedprice")
    disc, tax = dec("l_discount", 4), dec("l_tax", 4)
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_SHIP_CUTOFF).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dround(F.sum(qty)).alias("sum_qty"),
            dround(F.sum(price)).alias("sum_base_price"),
            dround(F.sum(price * (F.lit(1) - disc))).alias("sum_disc_price"),
            dround(F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))).alias("sum_charge"),
            avg2(F.sum(qty), F.count(F.lit(1))).alias("avg_qty"),
            avg2(F.sum(price), F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy(F.asc_nulls_last("l_returnflag"), F.asc_nulls_last("l_linestatus"))
    )


# ---------------------------------------------------------------------------
# q02 — join + aggregate + top-k with total order (§2.A rows 13, 14).
# ---------------------------------------------------------------------------
@query(
    "q02_top_revenue_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_orderpriority,
      CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue,
      COUNT(*) AS n_items
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey ASC
    LIMIT 10
    """,
)
def q02_top_revenue_orders(spark, sf_dir):
    """Top-10 orders by revenue. Scale: lineitem is aggregated to one
    row per orderkey BEFORE the join (eager aggregation — a rewrite
    Catalyst does not apply itself), so the join shuffles |orders| rows
    instead of |lineitem| (~4x fewer at TPC-H ratios; measured ~25%
    faster at sf0.1, bit-identical — decimal sums are associative).
    Top-k compiles to TakeOrderedAndProject, so only 10 rows per
    partition reach the driver. LIMIT is deterministic:
    (revenue DESC, orderkey ASC) is a total order."""
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4))
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(rev).alias("ord_rev"), F.count(F.lit(1)).alias("n_items")
    )
    return (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .select(
            "o_orderkey",
            "o_orderpriority",
            dround(F.col("ord_rev")).alias("revenue"),
            "n_items",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q03 — multi-way join with broadcast dims (§2.A rows 14, 15).
# ---------------------------------------------------------------------------
@query(
    "q03_region_nation_revenue",
    oracle="""
    SELECT r.r_name, n.n_name,
      CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue,
      COUNT(DISTINCT c.c_custkey) AS n_customers
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    ORDER BY r.r_name ASC NULLS LAST, n.n_name ASC NULLS LAST
    """,
)
def q03_region_nation_revenue(spark, sf_dir):
    """Revenue by region/nation across a 5-way join. Scale: nation and
    region are explicitly broadcast (25 / 5 rows — never shuffle a fact
    table against a dim); lineitem is pre-aggregated to per-order
    revenue BEFORE joining (eager aggregation: the widest table enters
    the join pipeline at |orders| cardinality — measured ~30% faster at
    sf0.1, bit-identical since decimal sums are associative); the
    remaining orders⋈customer joins are key-partitioned shuffle joins
    Catalyst reorders freely."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4))
    per_order = li.groupBy("l_orderkey").agg(F.sum(rev).alias("ord_rev"))
    return (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            dround(F.sum("ord_rev")).alias("revenue"),
            F.countDistinct("c_custkey").alias("n_customers"),
        )
        .orderBy(F.asc_nulls_last("r_name"), F.asc_nulls_last("n_name"))
    )


# ---------------------------------------------------------------------------
# q04 — projection + pushed-down filter, raw column passthrough (§2.A rows 8, 9).
# ---------------------------------------------------------------------------
@query(
    "q04_part_filter",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_retailprice
    FROM part
    WHERE p_size BETWEEN 10 AND 20 AND p_type LIKE 'PROMO%'
    ORDER BY p_partkey ASC
    """,
)
def q04_part_filter(spark, sf_dir):
    """Select+filter with zero computation — raw doubles pass through
    bit-identically. Scale: both predicates and the 4-column projection
    push into the parquet scan (PushedFilters + pruned ReadSchema)."""
    return (
        T(spark, sf_dir, "part")
        .filter(F.col("p_size").between(10, 20) & F.col("p_type").like("PROMO%"))
        .select("p_partkey", "p_name", "p_brand", "p_retailprice")
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# q05 — DISTINCT + COUNT(DISTINCT) (§2.A row 12).
# ---------------------------------------------------------------------------
@query(
    "q05_distinct_customers",
    oracle="""
    SELECT c_mktsegment,
      COUNT(DISTINCT c_nationkey) AS n_nations,
      COUNT(*) AS n_customers,
      CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_acctbal
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment ASC NULLS LAST
    """,
)
def q05_distinct_customers(spark, sf_dir):
    """Distinct-aggregate per segment. Scale: Spark expands
    COUNT(DISTINCT) into a two-stage aggregate (partial per key) —
    no driver-side distinct."""
    return (
        T(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_customers"),
            dround(F.sum(dec("c_acctbal"))).alias("total_acctbal"),
        )
        .orderBy(F.asc_nulls_last("c_mktsegment"))
    )


# ---------------------------------------------------------------------------
# q06 — window: ranking with unique tie-break (§2.A row 20).
# ---------------------------------------------------------------------------
@query(
    "q06_top_lineitems_per_part",
    oracle="""
    SELECT l_partkey, l_orderkey, l_linenumber, l_extendedprice, rn FROM (
      SELECT l_partkey, l_orderkey, l_linenumber, l_extendedprice,
        ROW_NUMBER() OVER (
          PARTITION BY l_partkey
          ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        ) AS rn
      FROM lineitem
    ) WHERE rn <= 3
    ORDER BY l_partkey ASC, rn ASC
    """,
)
def q06_top_lineitems_per_part(spark, sf_dir):
    """Top-3 line items per part by price. Deterministic: the window
    order has a unique (orderkey, linenumber) tie-break. Scale: one
    shuffle on l_partkey; rank-filter pushes a WindowGroupLimit below
    the sort in Spark 3.5+ so only 3 rows per key survive the
    partial sort."""
    w = (
        Window.partitionBy("l_partkey")
        .orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
    )
    return (
        T(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_orderkey", "l_linenumber", "l_extendedprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .orderBy("l_partkey", "rn")
    )


# ---------------------------------------------------------------------------
# q07 — window: running sum + LAG (§2.A row 20).
# ---------------------------------------------------------------------------
@query(
    "q07_customer_running_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
      CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_spend,
      LAG(o_orderkey) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_orderkey
    FROM orders
    WHERE o_custkey <= 200
    ORDER BY o_custkey ASC, o_orderkey ASC
    """,
)
def q07_customer_running_spend(spark, sf_dir):
    """Per-customer running spend + previous order (LAG). The window
    frame order (o_orderdate, o_orderkey) is total; the running SUM is
    decimal-exact at every prefix."""
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 200)
        .select(
            "o_custkey",
            "o_orderkey",
            dround(F.sum(dec("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
            .alias("running_spend"),
            F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# q08 — set operations (§2.A row 18).
# ---------------------------------------------------------------------------
@query(
    "q08_setops_customers",
    oracle="""
    SELECT 'both' AS tag, c_custkey FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    )
    UNION ALL
    SELECT 'building_only' AS tag, c_custkey FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      EXCEPT
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    )
    ORDER BY tag ASC, c_custkey ASC
    """,
)
def q08_setops_customers(spark, sf_dir):
    """INTERSECT / EXCEPT / UNION ALL over customer segments."""
    c = T(spark, sf_dir, "customer")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    both = building.intersect(rich).select(F.lit("both").alias("tag"), "c_custkey")
    only = building.exceptAll(rich).distinct().select(
        F.lit("building_only").alias("tag"), "c_custkey"
    )
    return both.unionAll(only).orderBy("tag", "c_custkey")


# ---------------------------------------------------------------------------
# q09 — ROLLUP with GROUPING markers (§2.A row 21).
# ---------------------------------------------------------------------------
@query(
    "q09_rollup_segment_nation",
    oracle="""
    SELECT c_mktsegment, n_name,
      GROUPING(c_mktsegment) AS g_seg, GROUPING(n_name) AS g_nat,
      COUNT(*) AS n_customers,
      CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP(c_mktsegment, n_name)
    ORDER BY g_seg ASC, g_nat ASC, c_mktsegment ASC NULLS FIRST, n_name ASC NULLS FIRST
    """,
)
def q09_rollup_segment_nation(spark, sf_dir):
    """Hierarchical totals (segment → nation → grand total) via ROLLUP;
    GROUPING() markers disambiguate data-NULLs from subtotal-NULLs."""
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("c_mktsegment", "n_name")
        .agg(
            F.grouping("c_mktsegment").alias("g_seg"),
            F.grouping("n_name").alias("g_nat"),
            F.count(F.lit(1)).alias("n_customers"),
            dround(F.sum(dec("c_acctbal"))).alias("total_acctbal"),
        )
        .orderBy(
            "g_seg",
            "g_nat",
            F.asc_nulls_first("c_mktsegment"),
            F.asc_nulls_first("n_name"),
        )
    )


# ---------------------------------------------------------------------------
# q10 — CASE / COALESCE / NULLIF-guarded division (§2.A row 22).
# ---------------------------------------------------------------------------
@query(
    "q10_priority_buckets",
    oracle="""
    SELECT
      CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'high'
           WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
           ELSE 'low' END AS urgency,
      o_orderstatus,
      COUNT(*) AS n_orders,
      CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total,
      ROUND(CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(NULLIF(COUNT(*), 0) AS DOUBLE), 4) AS fulfilled_share
    FROM orders
    GROUP BY 1, 2
    ORDER BY urgency ASC, o_orderstatus ASC
    """,
)
def q10_priority_buckets(spark, sf_dir):
    """Conditional bucketing + guarded ratio. NULLIF keeps the division
    ANSI-safe (Spark errors on div-by-zero; DuckDB returns NULL)."""
    o = T(spark, sf_dir, "orders")
    urgency = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "medium")
        .otherwise("low")
    )
    n = F.count(F.lit(1))
    fulfilled = F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
    return (
        o.groupBy(urgency.alias("urgency"), "o_orderstatus")
        .agg(
            n.alias("n_orders"),
            dround(F.sum(dec("o_totalprice"))).alias("total"),
            F.round(
                fulfilled.cast("double") / F.nullif(n, F.lit(0)).cast("double"), 4
            ).cast("double").alias("fulfilled_share"),
        )
        .orderBy("urgency", "o_orderstatus")
    )


# ---------------------------------------------------------------------------
# q11 — string functions (§2.A row 24; reference excel_search modes
# excel_tool.py:746-772, LIKE/LOWER tests test_csv_tool.py:780-793).
# ---------------------------------------------------------------------------
@query(
    "q11_string_functions",
    oracle="""
    SELECT p_partkey,
      LOWER(p_name) AS name_lower,
      UPPER(p_brand) AS brand_upper,
      SUBSTRING(p_type, 1, 5) AS type_prefix,
      LENGTH(p_name) AS name_len,
      CASE WHEN LOWER(p_name) LIKE '%green%' THEN 1 ELSE 0 END AS has_green,
      CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS starts_promo,
      CASE WHEN p_type LIKE '%STEEL' THEN 1 ELSE 0 END AS ends_steel,
      CONCAT(p_brand, ':', p_type) AS brand_type
    FROM part
    WHERE p_partkey <= 500
    ORDER BY p_partkey ASC
    """,
)
def q11_string_functions(spark, sf_dir):
    """String surface: lower/upper/substr/length/contains/starts/ends/
    concat — the excel_search match modes as SQL predicates."""
    p = T(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.when(F.lower("p_name").like("%green%"), 1).otherwise(0).alias("has_green"),
        F.when(F.col("p_type").like("PROMO%"), 1).otherwise(0).alias("starts_promo"),
        F.when(F.col("p_type").like("%STEEL"), 1).otherwise(0).alias("ends_steel"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# q12 — date/time functions (§2.A row 26).
# ---------------------------------------------------------------------------
@query(
    "q12_orders_by_month",
    oracle="""
    SELECT
      CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
      CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS order_month,
      CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
      COUNT(*) AS n_orders,
      CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    ORDER BY order_year ASC, order_month ASC
    """,
)
def q12_orders_by_month(spark, sf_dir):
    """Calendar aggregation: year/month extraction + date_trunc on NTZ
    timestamps (timezone-independent in both engines)."""
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    return (
        o.groupBy(
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            F.month("o_orderdate").cast("bigint").alias("order_month"),
            # make_date from NTZ field extraction — timezone-proof,
            # unlike date_trunc (which round-trips via session tz).
            F.make_date(F.year("o_orderdate"), F.month("o_orderdate"), F.lit(1)).alias(
                "month_start"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dround(F.sum(dec("o_totalprice"))).alias("revenue"),
        )
        .orderBy("order_year", "order_month")
    )


# ---------------------------------------------------------------------------
# q13 — scalar subquery, decimal-exact comparison (§2.A row 19).
# ---------------------------------------------------------------------------
@query(
    "q13_orders_above_avg",
    oracle="""
    WITH stats AS (
      SELECT COUNT(*) AS cnt, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
      FROM orders
    )
    SELECT o_orderkey, o_totalprice
    FROM orders, stats
    WHERE CAST(o_totalprice AS DECIMAL(18,2)) * stats.cnt > stats.total
    ORDER BY o_orderkey ASC
    """,
)
def q13_orders_above_avg(spark, sf_dir):
    """Orders above the global mean. The comparison is cross-multiplied
    (price*count > sum) so it stays in exact decimal arithmetic — no
    float-average boundary drift between engines. Scale: the stats side
    is a 1-row broadcast."""
    o = T(spark, sf_dir, "orders")
    stats = o.agg(
        F.count(F.lit(1)).alias("cnt"), F.sum(dec("o_totalprice")).alias("total")
    )
    return (
        o.crossJoin(F.broadcast(stats))
        .filter(dec("o_totalprice") * F.col("cnt") > F.col("total"))
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# q14 — semi join / EXISTS (§2.A row 16).
# ---------------------------------------------------------------------------
@query(
    "q14_customers_with_open_orders",
    oracle="""
    SELECT n.n_name, COUNT(*) AS n_customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    GROUP BY n.n_name
    ORDER BY n.n_name ASC
    """,
)
def q14_customers_with_open_orders(spark, sf_dir):
    """EXISTS as a left-semi join; dims broadcast."""
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# q15 — anti join / NOT EXISTS (§2.A row 16).
# ---------------------------------------------------------------------------
@query(
    "q15_customers_without_orders",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment ASC
    """,
)
def q15_customers_without_orders(spark, sf_dir):
    """NOT EXISTS as a left-anti join."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# q16 — outer join with COALESCE (§2.A rows 15, 22).
# ---------------------------------------------------------------------------
@query(
    "q16_nation_order_counts",
    oracle="""
    SELECT n.n_name, COALESCE(cnt.n_orders, 0) AS n_orders
    FROM nation n
    LEFT JOIN (
      SELECT c.c_nationkey AS nationkey, COUNT(*) AS n_orders
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_nationkey
    ) cnt ON n.n_nationkey = cnt.nationkey
    ORDER BY n.n_name ASC
    """,
)
def q16_nation_order_counts(spark, sf_dir):
    """Left outer join keeps nations with zero orders; COALESCE fills.
    Scale: aggregate-then-join (pre-aggregation shrinks the fact side
    to ≤25 rows before the join — never join-then-aggregate here)."""
    n = T(spark, sf_dir, "nation")
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    cnt = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("cnt_orders"))
    )
    return (
        n.join(cnt, n.n_nationkey == cnt.nationkey, "left")
        .select("n_name", F.coalesce("cnt_orders", F.lit(0)).alias("n_orders"))
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# q17 — self theta-join (§2.A row 17).
# ---------------------------------------------------------------------------
@query(
    "q17_nation_pairs",
    oracle="""
    SELECT n1.n_name AS nation_a, n2.n_name AS nation_b, r.r_name
    FROM nation n1
    JOIN nation n2 ON n1.n_regionkey = n2.n_regionkey AND n1.n_name < n2.n_name
    JOIN region r ON n1.n_regionkey = r.r_regionkey
    ORDER BY r.r_name ASC, nation_a ASC, nation_b ASC
    """,
)
def q17_nation_pairs(spark, sf_dir):
    """Unordered same-region nation pairs: equi key + theta (<)
    residual. Tiny inputs → broadcast nested loop is fine; the equi
    part still lets Catalyst pick a hash join."""
    n1 = T(spark, sf_dir, "nation").alias("n1")
    n2 = T(spark, sf_dir, "nation").alias("n2")
    r = T(spark, sf_dir, "region").alias("r")
    return (
        n1.join(
            n2,
            (F.col("n1.n_regionkey") == F.col("n2.n_regionkey"))
            & (F.col("n1.n_name") < F.col("n2.n_name")),
        )
        .join(F.broadcast(r), F.col("n1.n_regionkey") == F.col("r.r_regionkey"))
        .select(
            F.col("n1.n_name").alias("nation_a"),
            F.col("n2.n_name").alias("nation_b"),
            F.col("r.r_name").alias("r_name"),
        )
        .orderBy("r_name", "nation_a", "nation_b")
    )


# ---------------------------------------------------------------------------
# q18 — CTE + join back to an aggregate (TPC-H Q15 shape; §2.A row 19).
# ---------------------------------------------------------------------------
@query(
    "q18_top_suppliers",
    oracle="""
    WITH supplier_revenue AS (
      SELECT l_suppkey AS suppkey,
        SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS rev
      FROM lineitem
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(ROUND(sr.rev, 2) AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN supplier_revenue sr ON s.s_suppkey = sr.suppkey
    WHERE sr.rev = (SELECT MAX(rev) FROM supplier_revenue)
    ORDER BY s.s_suppkey ASC
    """,
)
def q18_top_suppliers(spark, sf_dir):
    """Supplier(s) with maximum revenue — CTE reused twice (aggregate +
    scalar MAX), exact decimal comparison. Spark side caches the CTE
    equivalent to avoid recomputing the shuffle."""
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4))
    supplier_rev = (
        li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(F.sum(rev).alias("rev"))
    )
    max_rev = supplier_rev.agg(F.max("rev").alias("max_rev"))
    return (
        s.join(supplier_rev, s.s_suppkey == supplier_rev.suppkey)
        .join(F.broadcast(max_rev), F.col("rev") == F.col("max_rev"))
        .select("s_suppkey", "s_name", dround(F.col("rev")).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q19 — IN-subquery (§2.A row 16) + global aggregate (§2.A row 11).
# ---------------------------------------------------------------------------
@query(
    "q19_lineitems_for_urgent_orders",
    oracle="""
    SELECT COUNT(*) AS n_items,
      CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_qty,
      CAST(MIN(l_orderkey) AS BIGINT) AS min_orderkey,
      CAST(MAX(l_orderkey) AS BIGINT) AS max_orderkey
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
)
def q19_lineitems_for_urgent_orders(spark, sf_dir):
    """IN-subquery (semi join) feeding a global aggregate — single-row
    result, no ORDER BY needed."""
    li = T(spark, sf_dir, "lineitem")
    urgent = T(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey")
    return (
        li.join(urgent, li.l_orderkey == urgent.o_orderkey, "left_semi")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dround(F.sum(dec("l_quantity"))).alias("total_qty"),
            F.min("l_orderkey").cast("bigint").alias("min_orderkey"),
            F.max("l_orderkey").cast("bigint").alias("max_orderkey"),
        )
    )
