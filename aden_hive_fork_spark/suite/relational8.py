"""Eighth relational batch: the classic TPC-H query shapes not yet
represented in the suite — Q3, Q4, Q6, Q9, Q12, Q13, Q14, Q16, Q19,
Q20, Q21 — each adapted to the driver testdata schema (no partsupp /
l_commitdate / l_receiptdate / l_shipmode columns exist, so the
shapes substitute semantically equivalent predicates over the columns
that do: lateness = l_shipdate far after o_orderdate, the
supplier-part relationship = DISTINCT (l_partkey, l_suppkey) pairs
observed in lineitem).

These exercise the SELECT-algebra breadth the reference's SQL
passthrough accepts (SURVEY §2.A provenance: arbitrary read-only
SELECT via csv_tool.py:273-385 / excel_tool.py:474-654 /
bigquery_tool.py:149-243), in the exact plan shapes a 100 TB
warehouse cares about: eager pre-aggregation below joins, semi/anti
joins for EXISTS/NOT EXISTS, conditional aggregation, disjunctive
join predicates, and two-level aggregation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query
from ._helpers import T, dec, dround

_REV = None  # revenue expression built per query (decimal-exact)


def _rev():
    return dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4))


# ---------------------------------------------------------------------------
# q204 — TPC-H Q3 shape (shipping priority): top-10 unshipped orders
# by accrued revenue for one market segment at a cutoff date.
# ---------------------------------------------------------------------------
@query(
    "q204_shipping_priority",
    oracle="""
    SELECT o.o_orderkey,
      CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
        AS revenue,
      o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey ASC
    LIMIT 10
    """,
)
def q204_shipping_priority(spark, sf_dir):
    """TPC-H Q3 analog: BUILDING-segment orders placed before the
    cutoff whose lineitems ship after it, ranked by accrued revenue.

    Scale: both date filters push to the parquet scans (PushedFilters
    on l_shipdate / o_orderdate); lineitem collapses to one row per
    orderkey BEFORE the joins (eager aggregation — the join then
    shuffles |orders-after-filter| rows, not |lineitem|); the
    segment-filtered customer key list joins semi, so no customer
    payload rides the shuffle. Top-10 compiles to
    TakeOrderedAndProject — 10 rows per partition reach the driver."""
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    cust = (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = T(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    per_order = (
        T(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey")
        .agg(F.sum(_rev()).alias("_rev"))
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left_semi")
        .join(per_order, F.col("o_orderkey") == per_order.l_orderkey)
        .select(
            "o_orderkey",
            dround(F.col("_rev")).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q205 — TPC-H Q4 shape (order priority checking): EXISTS-style count
# of orders with at least one late lineitem, per priority.
# ---------------------------------------------------------------------------
@query(
    "q205_order_priority_checking",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority ASC
    """,
)
def q205_order_priority_checking(spark, sf_dir):
    """TPC-H Q4 analog: in 1996Q1, how many orders of each priority
    had a lineitem shipped more than 60 days after the order date
    (the late-commit predicate adapted to the available columns).

    Scale: the quarter filter prunes orders at the scan; the EXISTS
    becomes a LEFT SEMI join on orderkey with the lateness predicate
    as a join residual — Spark never materializes matched duplicates,
    and the final aggregate is 5 groups (map-side partials)."""
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy(F.asc("o_orderpriority"))
    )


# ---------------------------------------------------------------------------
# q206 — TPC-H Q6 shape (forecasting revenue change): pure scan +
# conjunctive range predicates + one global aggregate.
# ---------------------------------------------------------------------------
@query(
    "q206_forecast_revenue",
    oracle="""
    SELECT
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE)
        AS revenue,
      COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24
    """,
)
def q206_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 analog: revenue that would have been kept had
    mid-band discounts on small-quantity 1996 lineitems been
    eliminated. The canonical scan-dominated query.

    Scale: every predicate (shipdate range, discount band, quantity)
    pushes to the parquet scan — zero shuffle beyond the single-row
    global aggregate's partials. This is the query shape where
    column pruning matters most: only 4 of 11 lineitem columns are
    read (ReadSchema evidence pattern, SCALING §2)."""
    li = T(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.04)
        & (F.col("l_quantity") < 24)
    ).agg(
        dround(F.sum(dec("l_extendedprice") * dec("l_discount", 4))).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# q207 — TPC-H Q9 shape (product type profit): profit by supplier
# nation and year for one part family.
# ---------------------------------------------------------------------------
@query(
    "q207_product_type_profit",
    oracle="""
    SELECT n.n_name AS nation,
      CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS o_year,
      CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                       * (1 - CAST(l.l_discount AS DECIMAL(18,4)))
                     - CAST(l.l_quantity AS DECIMAL(18,2))
                       * CAST(p.p_retailprice AS DECIMAL(18,2))
                       * CAST(0.10 AS DECIMAL(6,2))), 2) AS DOUBLE)
        AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%bolt%'
    GROUP BY nation, o_year
    ORDER BY nation ASC, o_year DESC
    """,
)
def q207_product_type_profit(spark, sf_dir):
    """TPC-H Q9 analog: per-nation-per-year profit on the 'bolt' part
    family, with cost modeled as 10% of retail price per unit (the
    testdata has no ps_supplycost).

    Scale: part is filtered by the LIKE before its join and carries
    only (partkey, retailprice); supplier⨝nation is a tiny broadcast
    (100 × 25 rows — bounded dimensions at every SF, both explicitly
    broadcast); the one real shuffle is the final
    (nation, year) aggregate, preceded by map-side partials. The
    part join is the only potentially-large side at 100 TB — AQE
    picks broadcast vs shuffle from the measured filtered size."""
    li = T(spark, sf_dir, "lineitem")
    part = (
        T(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey", "p_retailprice")
    )
    sup = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = _rev() - dec("l_quantity") * dec("p_retailprice") * F.lit(0.10).cast(
        "decimal(6,2)"
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("o_year"),
        )
        .agg(dround(F.sum(profit)).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# q208 — TPC-H Q12 shape (shipping-mode / priority split):
# conditional aggregation over a join, high- vs low-priority counts.
# ---------------------------------------------------------------------------
@query(
    "q208_priority_shipping_split",
    oracle="""
    SELECT
      CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
           THEN 'LATE' ELSE 'ONTIME' END AS ship_bucket,
      CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY ship_bucket
    ORDER BY ship_bucket ASC
    """,
)
def q208_priority_shipping_split(spark, sf_dir):
    """TPC-H Q12 analog: of 1997 shipments, how many high- vs
    low-priority lineitems landed in each lateness bucket (>90 days
    after the order date = LATE; the shipmode dimension does not
    exist in this schema, lateness is the grouping instead).

    Scale: the year filter pushes to the lineitem scan; the join
    carries only (orderkey, orderdate, priority) against
    (orderkey, shipdate); output is 2 groups with map-side partial
    aggregation, so the post-join aggregate shuffles ~nothing."""
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = (
        T(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        )
        .select("l_orderkey", "l_shipdate")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.when(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"),
                "LATE",
            )
            .otherwise("ONTIME")
            .alias("ship_bucket"),
            high.alias("_high"),
        )
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(F.col("_high"), 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(~F.col("_high"), 1).otherwise(0))
            .cast("bigint")
            .alias("low_line_count"),
        )
        .orderBy(F.asc("ship_bucket"))
    )


# ---------------------------------------------------------------------------
# q209 — TPC-H Q13 shape (customer distribution): two-level
# aggregation with a filtered LEFT OUTER join, zero-order customers
# included.
# ---------------------------------------------------------------------------
@query(
    "q209_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q209_customer_distribution(spark, sf_dir):
    """TPC-H Q13 analog: the distribution of non-urgent order counts
    per customer — including customers with zero such orders, which
    is why the join must be LEFT OUTER with the priority predicate in
    the ON clause (in WHERE it would silently drop the zero bucket).

    Scale: orders pre-aggregates to one (custkey, count) row per
    customer BEFORE the outer join — the join input shrinks from
    |orders| to |customers-with-orders| — and the second aggregate's
    domain is tiny (distinct counts). COUNT(o_orderkey) over the
    outer join's NULLs = COALESCE(pre-agg count, 0), preserved
    exactly."""
    cust = T(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("_n"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# q210 — TPC-H Q14 shape (promotion effect): conditional-share
# aggregate over one month's join.
# ---------------------------------------------------------------------------
@query(
    "q210_promo_revenue_share",
    oracle="""
    SELECT
      CAST(ROUND(
        100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
              THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l.l_discount AS DECIMAL(18,4)))
              ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE),
      4) AS DOUBLE) AS promo_revenue_pct,
      COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def q210_promo_revenue_share(spark, sf_dir):
    """TPC-H Q14 analog: the percentage of March-1997 revenue earned
    by PROMO-type parts. Both sums ride ONE aggregate over the join
    (no second pass); the division is a single IEEE double op on two
    exact decimal sums, rounded — deterministic across engines.

    Scale: the one-month filter prunes the lineitem scan hard; part
    carries only (partkey, type) and AQE broadcasts it when the
    filtered build side measures small. Zero-revenue months are
    impossible by construction here, but the guarded-division
    discipline (NULLIF) is not needed since total >= promo > 0 is not
    assumed: a NULL would propagate visibly rather than fabricate 0."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp_ntz"))
    )
    part = T(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _rev()
    zero = F.lit(0).cast("decimal(18,2)")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    return joined.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast(
                "double"
            )
            / F.sum(rev).cast("double"),
            4,
        )
        .cast("double")
        .alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# q211 — TPC-H Q16 shape (parts/supplier relationship): COUNT
# DISTINCT suppliers per part attribute group, with NOT-IN and
# anti-join exclusions.
# ---------------------------------------------------------------------------
@query(
    "q211_parts_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
      CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand ASC, p.p_type ASC, p.p_size ASC
    """,
)
def q211_parts_supplier_counts(spark, sf_dir):
    """TPC-H Q16 analog: how many distinct suppliers can furnish
    parts of each (brand, type, size) combination — excluding one
    brand, the PROMO type, and suppliers in deficit (the
    customer-complaints exclusion adapted to s_acctbal < 0). The
    supplier-part relationship is the DISTINCT (partkey, suppkey)
    pairs observed in lineitem (no partsupp table exists).

    Scale: the pair-distinct is one shuffle keyed (partkey, suppkey)
    — at 100 TB that is THE cost, and it is irreducible (the
    relationship must be materialized once); everything after joins
    against the filtered ~bounded part table and a ~bounded excluded-
    supplier list (broadcast anti join). COUNT(DISTINCT) re-uses the
    already-distinct pairs, so Catalyst plans a plain count."""
    pairs = (
        T(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    part = T(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad_sup = (
        T(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        pairs.join(
            F.broadcast(bad_sup),
            pairs.l_suppkey == bad_sup.s_suppkey,
            "left_anti",
        )
        .join(part, pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"),
            F.asc("p_brand"),
            F.asc("p_type"),
            F.asc("p_size"),
        )
    )


# ---------------------------------------------------------------------------
# q212 — TPC-H Q19 shape (discounted revenue): disjunction of
# conjunctive join predicates (brand × size × quantity bands).
# ---------------------------------------------------------------------------
@query(
    "q212_disjunctive_revenue",
    oracle="""
    SELECT
      CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
        AS revenue,
      COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE
      (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
        AND l.l_quantity BETWEEN 1 AND 11)
      OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
        AND l.l_quantity BETWEEN 10 AND 20)
      OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
        AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q212_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 analog: revenue from three (brand, size-band,
    quantity-band) clauses OR-ed together — the canonical test that
    the optimizer pushes the COMMON parts of a disjunction below the
    join while keeping the cross-table residual on it.

    Scale: the union-of-bands bound (p_size <= 15, brand IN the
    3-list, l_quantity <= 30) is implied by the disjunction; Spark
    derives and pushes those per-table envelopes to both scans, and
    the full disjunction evaluates as the join residual. part
    filtered to 3 brands is broadcast-sized at any SF (bounded brand
    cardinality)."""
    li = T(spark, sf_dir, "lineitem")
    part = T(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(part, li.l_partkey == part.p_partkey)
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(clause).agg(
        dround(F.sum(_rev())).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# q213 — TPC-H Q20 shape (potential part promotion): nested
# aggregation threshold feeding a semi-join chain up to suppliers.
# ---------------------------------------------------------------------------
@query(
    "q213_potential_promotion",
    oracle="""
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      WHERE l.l_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
        )
        AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING SUM(l.l_quantity) > 50
    )
    ORDER BY s.s_name ASC
    """,
)
def q213_potential_promotion(spark, sf_dir):
    """TPC-H Q20 analog: suppliers who moved more than 50 units of
    any single red part in 1997 — candidates for a promotion. The
    shape: inner aggregate with HAVING feeds an IN (= semi join) on
    the outer table.

    Scale: the part-name filter reduces to a key list joined semi
    into lineitem BEFORE the (suppkey, partkey) aggregate, so the
    aggregate runs over red-part lines only; the HAVING survivors
    collapse to distinct suppkeys (bounded by |supplier|), which
    semi-join the supplier table. Three shuffles total, each over a
    monotonically smaller keyspace."""
    red_parts = (
        T(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    movers = (
        li.join(red_parts, li.l_partkey == red_parts.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    sup = T(spark, sf_dir, "supplier")
    return (
        sup.join(movers, sup.s_suppkey == movers.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy(F.asc("s_name"))
    )


# ---------------------------------------------------------------------------
# q214 — TPC-H Q21 shape (suppliers who kept orders waiting): the
# sole-late-supplier pattern (EXISTS other supplier, NOT EXISTS other
# late supplier) as one grouped pass.
# ---------------------------------------------------------------------------
@query(
    "q214_waiting_suppliers",
    oracle="""
    WITH per AS (
      SELECT l.l_orderkey, l.l_suppkey,
        MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
            THEN 1 ELSE 0 END) AS was_late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY l.l_orderkey, l.l_suppkey
    ), per_order AS (
      SELECT l_orderkey,
        COUNT(*) AS n_sups,
        SUM(was_late) AS n_late
      FROM per GROUP BY l_orderkey
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM per
    JOIN per_order po ON po.l_orderkey = per.l_orderkey
    JOIN supplier s ON s.s_suppkey = per.l_suppkey
    WHERE per.was_late = 1 AND po.n_sups > 1 AND po.n_late = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name ASC
    LIMIT 25
    """,
)
def q214_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 analog: suppliers who were the SOLE late shipper
    (>90 days after order date) on finalized multi-supplier orders.

    The reference formulation is EXISTS(other supplier) AND NOT
    EXISTS(other late supplier); both quantifiers collapse into ONE
    grouped pass — per (orderkey, suppkey) lateness, then per-order
    supplier/late counts — so the double correlated-subquery plan
    (two extra joins of lineitem against itself) never materializes.
    Identical result, provably: n_sups>1 ⟺ EXISTS other supplier;
    was_late=1 ∧ n_late=1 ⟺ this supplier late ∧ no other late.

    Scale: lineitem self-join avoided entirely; the two aggregates
    share the (orderkey) shuffle key so AQE reuses the exchange; the
    supplier join is a 100-row broadcast; top-25 is
    TakeOrderedAndProject."""
    o = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    per = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"),
                    1,
                ).otherwise(0)
            ).alias("was_late")
        )
    )
    per_order = per.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_sups"), F.sum("was_late").alias("n_late")
    )
    sup = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per.filter(F.col("was_late") == 1)
        .join(per_order, "l_orderkey")
        .filter((F.col("n_sups") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(25)
    )
