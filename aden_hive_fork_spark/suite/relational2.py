"""Relational surface, second batch (SURVEY.md §2.A rows 12, 18-22,
24, 26, 37): CUBE, exact percentiles, LEAD/NTILE/DENSE_RANK, date
arithmetic, regexp extraction, correlated EXISTS, FULL OUTER, the
risk-scorer composite, UNION DISTINCT.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import query
from ..functions.scoring import weighted_score
from ._helpers import T, dec, dround


# ---------------------------------------------------------------------------
# q25 — CUBE with grouping markers (§2.A row 21).
# ---------------------------------------------------------------------------
@query(
    "q25_cube_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
      GROUPING(o_orderstatus) AS g_status, GROUPING(o_orderpriority) AS g_prio,
      COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    ORDER BY g_status ASC, g_prio ASC,
      o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """,
)
def q25_cube_orders(spark, sf_dir):
    """All 2^2 grouping combinations in one pass (CUBE)."""
    return (
        T(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").alias("g_status"),
            F.grouping("o_orderpriority").alias("g_prio"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(
            "g_status",
            "g_prio",
            F.asc_nulls_first("o_orderstatus"),
            F.asc_nulls_first("o_orderpriority"),
        )
    )


# ---------------------------------------------------------------------------
# q26 — exact percentiles (linear interpolation; deterministic because
# interpolation consumes the sorted multiset, identical in both).
# ---------------------------------------------------------------------------
@query(
    "q26_price_percentiles",
    oracle="""
    SELECT o_orderstatus,
      CAST(quantile_cont(o_totalprice, 0.25) AS DOUBLE) AS p25,
      CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE) AS median,
      CAST(quantile_cont(o_totalprice, 0.75) AS DOUBLE) AS p75,
      COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus ASC
    """,
)
def q26_price_percentiles(spark, sf_dir):
    """Exact (not approx_*) percentiles per status — the approx
    variants exist but are declared non-oracle per SURVEY §7.3."""
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.percentile("o_totalprice", F.lit(0.25)).alias("p25"),
            F.percentile("o_totalprice", F.lit(0.5)).alias("median"),
            F.percentile("o_totalprice", F.lit(0.75)).alias("p75"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# q27 — LEAD / DENSE_RANK / NTILE (§2.A row 20).
# ---------------------------------------------------------------------------
@query(
    "q27_supplier_rank",
    oracle="""
    SELECT s_suppkey, s_nationkey, s_acctbal,
      DENSE_RANK() OVER (ORDER BY s_acctbal DESC, s_suppkey ASC) AS bal_rank,
      LEAD(s_suppkey) OVER (ORDER BY s_acctbal DESC, s_suppkey ASC) AS next_suppkey,
      NTILE(4) OVER (ORDER BY s_acctbal DESC, s_suppkey ASC) AS quartile
    FROM supplier
    ORDER BY bal_rank ASC, s_suppkey ASC
    """,
)
def q27_supplier_rank(spark, sf_dir):
    w = Window.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (
        T(spark, sf_dir, "supplier")
        .select(
            "s_suppkey",
            "s_nationkey",
            "s_acctbal",
            F.dense_rank().over(w).alias("bal_rank"),
            F.lead("s_suppkey").over(w).alias("next_suppkey"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("bal_rank", "s_suppkey")
    )


# ---------------------------------------------------------------------------
# q28 — date arithmetic (§2.A row 26).
# ---------------------------------------------------------------------------
@query(
    "q28_order_age",
    oracle="""
    SELECT o_orderkey,
      CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS age_days,
      CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS follow_up,
      CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS q
    FROM orders
    WHERE o_orderkey <= 500
    ORDER BY o_orderkey ASC
    """,
)
def q28_order_age(spark, sf_dir):
    """datediff / add_months / quarter on DATE-cast NTZ timestamps
    (all-midnight values → boundary-count == elapsed-days in both
    engines)."""
    d = F.col("o_orderdate").cast("date")
    return (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 500)
        .select(
            "o_orderkey",
            F.datediff(F.lit("2002-01-01").cast("date"), d).cast("bigint").alias("age_days"),
            F.add_months(d, 3).alias("follow_up"),
            F.quarter("o_orderdate").cast("bigint").alias("q"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# q29 — regexp_extract capture groups (§2.A rows 24-25).
# ---------------------------------------------------------------------------
@query(
    "q29_brand_number",
    oracle="""
    SELECT CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS BIGINT) AS brand_num,
      COUNT(*) AS n_parts,
      CAST(ROUND(SUM(CAST(p_retailprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price
    FROM part
    GROUP BY 1
    ORDER BY brand_num ASC NULLS LAST
    """,
)
def q29_brand_number(spark, sf_dir):
    brand_num = F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("bigint")
    return (
        T(spark, sf_dir, "part")
        .groupBy(brand_num.alias("brand_num"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dround(F.sum(dec("p_retailprice"))).alias("total_price"),
        )
        .orderBy(F.asc_nulls_last("brand_num"))
    )


# ---------------------------------------------------------------------------
# q35 — correlated EXISTS with extra predicate (§2.A rows 16, 19).
# ---------------------------------------------------------------------------
@query(
    "q35_suppliers_with_bulk_items",
    oracle="""
    SELECT n.n_name, COUNT(*) AS n_suppliers
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49)
    GROUP BY n.n_name
    ORDER BY n.n_name ASC
    """,
)
def q35_suppliers_with_bulk_items(spark, sf_dir):
    """Correlated EXISTS → pre-filtered semi join (push the inner
    predicate before the join: at 100 TB the filter drops ~96% of
    lineitem before any shuffle)."""
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    bulk = T(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return (
        s.join(bulk, s.s_suppkey == bulk.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# q36 — FULL OUTER join (§2.A row 15).
# ---------------------------------------------------------------------------
@query(
    "q36_customer_vs_supplier_nations",
    oracle="""
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
      COALESCE(c.n_customers, 0) AS n_customers,
      COALESCE(s.n_suppliers, 0) AS n_suppliers
    FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
          FROM customer WHERE c_mktsegment = 'MACHINERY' GROUP BY 1) c
    FULL OUTER JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
                     FROM supplier WHERE s_acctbal > 5000 GROUP BY 1) s
      ON c.nationkey = s.nationkey
    ORDER BY nationkey ASC
    """,
)
def q36_customer_vs_supplier_nations(spark, sf_dir):
    """Full outer of two pre-aggregates (aggregate-then-join keeps the
    outer join tiny at any scale)."""
    c = (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "MACHINERY")
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        T(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        c.join(s, c.c_nk == s.s_nk, "full_outer")
        .select(
            F.coalesce("c_nk", "s_nk").alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# q37 — composite weighted score (§2.A row 37, risk_scorer analog).
# ---------------------------------------------------------------------------
@query(
    "q37_customer_risk_score",
    oracle="""
    SELECT c_custkey,
      ROUND(LEAST(GREATEST(
        (0.7 * LEAST(GREATEST(c_acctbal / 100.0, 0), 100)
         + 0.3 * LEAST(LENGTH(c_name) * 4.0, 100)) / (0.7 + 0.3),
      0), 100), 2) AS risk_score
    FROM customer
    WHERE c_custkey <= 300
    ORDER BY c_custkey ASC
    """,
)
def q37_customer_risk_score(spark, sf_dir):
    """weighted_score() with two deterministic factors; the oracle
    restates the same arithmetic inline (no nulls → dropout path
    inert)."""
    f1 = F.least(F.greatest(F.col("c_acctbal") / 100.0, F.lit(0.0)), F.lit(100.0))
    f2 = F.least(F.length("c_name") * 4.0, F.lit(100.0))
    return (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 300)
        .select(
            "c_custkey",
            weighted_score([(f1, 0.7), (f2, 0.3)]).alias("risk_score"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# q38 — UNION (distinct) (§2.A row 18).
# ---------------------------------------------------------------------------
@query(
    "q38_active_nations",
    oracle="""
    SELECT nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION
      SELECT s_nationkey AS nationkey FROM supplier
    )
    ORDER BY nationkey ASC
    """,
)
def q38_active_nations(spark, sf_dir):
    c = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct().orderBy("nationkey")
