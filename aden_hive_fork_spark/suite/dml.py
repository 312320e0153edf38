"""DML surface: MERGE INTO over the keyed merge-on-read table.

The reference serves point mutations through its generic SQL tier
(reference: core/framework SQL tool surface); the Spark-first
equivalent is ``operators/table.merge_into`` — one left join + one
delta append, never a base rewrite. The suite query proves the full
three-clause semantics (conditional delete, conditional update with
expressions over source AND target, insert-by-default) hash-exactly
against a declarative oracle.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from . import query
from ._helpers import T, dec, dround


def _dml_dir(sf_dir: str, name: str) -> str:
    sf = os.path.basename(sf_dir.rstrip("/"))
    d = os.path.join("/tmp", "spark_graft_dml", sf)
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, name)


# ---------------------------------------------------------------------------
# q158 — MERGE INTO with all three clauses. The target is a keyed
# table of every customer whose key is not divisible by 3 (so the
# source has genuinely unmatched keys); the source is per-customer
# order spend. Matched negative-balance customers are purged, matched
# big spenders get a 1% cashback credit, unmatched spenders are
# inserted as new (segment-less) accounts. Scale shape: one key
# shuffle for the join, delta sized by the action set — a merge
# touching 0.1% of a 100 TB table writes 0.1% worth of delta.
# ---------------------------------------------------------------------------
@query(
    "q158_merge_into",
    oracle="""
    WITH tgt AS (
      SELECT c_custkey, c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % 3 <> 0
    ),
    src AS (
      SELECT o_custkey AS c_custkey,
        CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
          AS c_acctbal
      FROM orders GROUP BY o_custkey
    ),
    kept AS (
      SELECT t.c_custkey,
        CASE WHEN s.c_custkey IS NOT NULL AND NOT (t.c_acctbal < 0)
                  AND s.c_acctbal > 5000
             THEN CAST(ROUND(CAST(t.c_acctbal + s.c_acctbal * 0.01
                                  AS DECIMAL(18,4)), 2) AS DOUBLE)
             ELSE t.c_acctbal END AS c_acctbal,
        t.c_mktsegment
      FROM tgt t LEFT JOIN src s ON s.c_custkey = t.c_custkey
      WHERE NOT (s.c_custkey IS NOT NULL AND t.c_acctbal < 0)
    ),
    ins AS (
      SELECT s.c_custkey, s.c_acctbal, CAST(NULL AS VARCHAR) AS c_mktsegment
      FROM src s LEFT JOIN tgt t ON t.c_custkey = s.c_custkey
      WHERE t.c_custkey IS NULL
    ),
    state AS (
      SELECT * FROM kept UNION ALL SELECT * FROM ins
    )
    SELECT COALESCE(c_mktsegment, '(new)') AS segment,
      COUNT(*) AS n_accounts,
      CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS total_bal,
      CAST(MIN(c_custkey) AS BIGINT) AS min_key
    FROM state
    GROUP BY COALESCE(c_mktsegment, '(new)')
    ORDER BY segment ASC
    """,
)
def q158_merge_into(spark, sf_dir):
    """operators/table.merge_into — delete, conditional update with a
    mixed s./t. expression, and default insert, resolved by one
    merge-on-read read back. The update expression rounds through
    DECIMAL so the merged balance is bit-identical to the oracle's
    CASE arithmetic."""
    from ..operators.table import create_table, merge_into, read_table

    root = _dml_dir(sf_dir, "merge_customers")
    shutil.rmtree(root, ignore_errors=True)
    tgt = (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 3 != 0)
        .select("c_custkey", "c_acctbal", "c_mktsegment")
    )
    create_table(tgt, root, ["c_custkey"])
    src = (
        T(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(dround(F.sum(dec("o_totalprice"))).alias("c_acctbal"))
    )
    merge_into(
        spark,
        root,
        src,
        when_matched_update={
            "c_acctbal": "CAST(ROUND(CAST(t.c_acctbal + s.c_acctbal * 0.01"
            " AS DECIMAL(18,4)), 2) AS DOUBLE)"
        },
        update_condition="s.c_acctbal > 5000",
        when_matched_delete="t.c_acctbal < 0",
    )
    return (
        read_table(spark, root)
        .groupBy(
            F.coalesce(F.col("c_mktsegment"), F.lit("(new)")).alias("segment")
        )
        .agg(
            F.count(F.lit(1)).alias("n_accounts"),
            dround(F.sum(dec("c_acctbal"))).alias("total_bal"),
            F.min("c_custkey").cast("bigint").alias("min_key"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# q169 — change data feed: the Delta-CDF analog. Changes are read
# DIRECTLY from the immutable delta dirs (no diffing, no base scan —
# cost tracks the changes, not the table); the oracle reconstructs
# the same two change batches declaratively.
# ---------------------------------------------------------------------------
@query(
    "q169_change_feed",
    oracle="""
    WITH d0 AS (
      SELECT c_custkey, c_acctbal + 1000.0 AS c_acctbal
      FROM customer WHERE c_custkey % 7 = 0
    ),
    d1 AS (
      SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 11 = 0
    ),
    feed AS (
      SELECT 0 AS seq, 'upsert' AS op, c_custkey, c_acctbal FROM d0
      UNION ALL
      SELECT 1 AS seq, 'delete' AS op, c_custkey, c_acctbal FROM d1
    )
    SELECT CAST(seq AS BIGINT) AS seq, op,
      CAST(COUNT(*) AS BIGINT) AS n_changes,
      CAST(SUM(c_custkey) AS BIGINT) AS sum_key,
      CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS total_bal
    FROM feed GROUP BY seq, op ORDER BY seq ASC
    """,
)
def q169_change_feed(spark, sf_dir):
    """operators/table.table_changes — incremental consumers read the
    delta log itself; each batch surfaces with its _op and _seq."""
    from ..operators.table import create_table, table_changes, upsert

    root = _dml_dir(sf_dir, "cdf_customers")
    shutil.rmtree(root, ignore_errors=True)
    base = T(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    create_table(base, root, ["c_custkey"])
    upsert(
        base.filter(F.col("c_custkey") % 7 == 0).withColumn(
            "c_acctbal", F.col("c_acctbal") + 1000.0
        ),
        root,
        ["c_custkey"],
    )
    upsert(
        base.filter(F.col("c_custkey") % 11 == 0).withColumn(
            "_op", F.lit("delete")
        ),
        root,
        ["c_custkey"],
    )
    return (
        table_changes(spark, root)
        .groupBy(
            F.col("_seq").alias("seq"), F.col("_op").alias("op")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_changes"),
            F.sum("c_custkey").cast("bigint").alias("sum_key"),
            dround(F.sum(dec("c_acctbal"))).alias("total_bal"),
        )
        .orderBy("seq")
    )


# ---------------------------------------------------------------------------
# q222 — incremental materialized join view (operators/ivm.
# refresh_join_view): init from orders⋈customer, one wave of fact
# updates/deletes + dim updates/deletes, ONE incremental refresh —
# the oracle recomputes the final join state from the same sources
# and must agree on the per-segment rollup of the VIEW table.
# ---------------------------------------------------------------------------
@query(
    "q222_incremental_join_view",
    oracle="""
    WITH fact1 AS (
      SELECT o_orderkey AS k, o_custkey AS c,
        CASE WHEN o_orderkey % 7 = 0
             THEN o_totalprice + 100.0 ELSE o_totalprice END AS p
      FROM orders
      WHERE o_orderkey < 2000 AND o_orderkey % 11 <> 0
    ), dim1 AS (
      SELECT c_custkey AS ck,
        CASE WHEN c_custkey % 5 = 0 THEN 'VIP' ELSE c_mktsegment END AS seg
      FROM customer
      WHERE c_custkey % 13 <> 0
    )
    SELECT seg AS segment, COUNT(*) AS n_orders,
      CAST(ROUND(SUM(CAST(p AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price
    FROM fact1 JOIN dim1 ON fact1.c = dim1.ck
    GROUP BY seg
    ORDER BY seg ASC
    """,
)
def q222_incremental_join_view(spark, sf_dir):
    """Materialized orders⋈customer view maintained incrementally:
    after the change wave, refresh work is proportional to the
    affected keys (changed orders + fan-out of changed customers),
    never the table. The per-segment rollup reads the VIEW table, so
    a one-row divergence from true join state flips the hash."""
    from ..operators.ivm import refresh_join_view
    from ..operators.table import create_table, read_table, upsert

    f_root = _dml_dir(sf_dir, "ivm_fact")
    d_root = _dml_dir(sf_dir, "ivm_dim")
    v_root = _dml_dir(sf_dir, "ivm_view")
    for r in (f_root, d_root, v_root):
        shutil.rmtree(r, ignore_errors=True)

    fact = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("c"),
            F.col("o_totalprice").alias("p"),
        )
    )
    dim = T(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"),
        F.col("c_mktsegment").alias("seg"),
    )
    create_table(fact, f_root, ["k"])
    create_table(dim, d_root, ["ck"])
    refresh_join_view(spark, f_root, d_root, v_root, "c")

    upsert(
        fact.filter(F.col("k") % 7 == 0)
        .withColumn("p", F.col("p") + F.lit(100.0))
        .withColumn("_op", F.lit("upsert")),
        f_root,
        ["k"],
    )
    upsert(
        fact.filter(F.col("k") % 11 == 0).withColumn("_op", F.lit("delete")),
        f_root,
        ["k"],
    )
    upsert(
        dim.filter(F.col("ck") % 5 == 0)
        .withColumn("seg", F.lit("VIP"))
        .withColumn("_op", F.lit("upsert")),
        d_root,
        ["ck"],
    )
    upsert(
        dim.filter(F.col("ck") % 13 == 0).withColumn("_op", F.lit("delete")),
        d_root,
        ["ck"],
    )
    refresh_join_view(spark, f_root, d_root, v_root, "c")

    view = read_table(spark, v_root)
    return (
        view.groupBy(F.col("seg").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dround(F.sum(dec("p"))).alias("total_price"),
        )
        .orderBy(F.asc("segment"))
    )


# ---------------------------------------------------------------------------
# q223 — incremental materialized AGGREGATE view (operators/ivm.
# refresh_agg_view): group moves exercise the retraction path (the
# OLD group of a moved row comes from the as-of pre-image, not the
# change feed); the oracle recomputes the end state.
# ---------------------------------------------------------------------------
@query(
    "q223_incremental_agg_view",
    oracle="""
    WITH fact1 AS (
      SELECT
        CASE WHEN o_orderkey % 7 = 0 THEN '0-MOVED' ELSE o_orderpriority END
          AS g,
        o_totalprice AS q
      FROM orders
      WHERE o_orderkey < 4000 AND o_orderkey % 11 <> 0
    )
    SELECT g AS priority, COUNT(*) AS n_orders,
      CAST(ROUND(SUM(CAST(q AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price
    FROM fact1
    GROUP BY g
    ORDER BY g ASC
    """,
)
def q223_incremental_agg_view(spark, sf_dir):
    """Materialized per-priority rollup maintained incrementally: the
    change wave MOVES every 7th order into group '0-MOVED' (old-group
    retraction via the as-of pre-image) and deletes every 11th; one
    refresh re-aggregates only the affected groups. The output reads
    the VIEW table."""
    from ..operators.ivm import refresh_agg_view
    from ..operators.table import create_table, read_table, upsert

    f_root = _dml_dir(sf_dir, "ivm_agg_fact")
    v_root = _dml_dir(sf_dir, "ivm_agg_view")
    for r in (f_root, v_root):
        shutil.rmtree(r, ignore_errors=True)

    fact = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 4000)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderpriority").alias("g"),
            F.col("o_totalprice").alias("q"),
        )
    )
    create_table(fact, f_root, ["k"])
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        dround(F.sum(dec("q"))).alias("total_price"),
    ]
    refresh_agg_view(spark, f_root, v_root, ["g"], aggs)

    upsert(
        fact.filter(F.col("k") % 7 == 0)
        .withColumn("g", F.lit("0-MOVED"))
        .withColumn("_op", F.lit("upsert")),
        f_root,
        ["k"],
    )
    upsert(
        fact.filter(F.col("k") % 11 == 0).withColumn("_op", F.lit("delete")),
        f_root,
        ["k"],
    )
    refresh_agg_view(spark, f_root, v_root, ["g"], aggs)

    return (
        read_table(spark, v_root)
        .select(F.col("g").alias("priority"), "n_orders", "total_price")
        .orderBy(F.asc("priority"))
    )


# ---------------------------------------------------------------------------
# q228 — right-to-erasure (operators/table.erase_keys): tombstone →
# compact → vacuum deltas AND history → audit every surviving parquet
# byte. The oracle is the end state (customers minus the erased keys)
# plus the audit invariant folded into the output: residual_rows must
# be 0, so it rides the hash as a constant column.
# ---------------------------------------------------------------------------
@query(
    "q228_gdpr_erasure",
    oracle="""
    SELECT c_mktsegment,
      CAST(COUNT(*) AS BIGINT) AS n_customers,
      CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS total_balance,
      CAST(0 AS BIGINT) AS residual_rows
    FROM customer
    WHERE c_custkey % 97 <> 13
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment ASC
    """,
)
def q228_gdpr_erasure(spark, sf_dir):
    """Erase every customer with custkey ≡ 13 (mod 97) from a keyed
    table AND its on-disk history, then aggregate the survivors. The
    physical audit (semi-join over every remaining parquet dir)
    reports residual_rows, emitted as a column so the oracle hash
    fails loudly if a single erased byte survives."""
    from ..operators.table import create_table, erase_keys, read_table

    root = _dml_dir(sf_dir, "erase_customers")
    shutil.rmtree(root, ignore_errors=True)
    cust = T(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    create_table(cust, root, ["c_custkey"])
    doomed = cust.filter(F.col("c_custkey") % 97 == 13).select("c_custkey")
    report = erase_keys(spark, root, doomed)
    return (
        read_table(spark, root)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            dround(F.sum(dec("c_acctbal"))).alias("total_balance"),
        )
        .withColumn(
            "residual_rows", F.lit(int(report["residual_rows"])).cast("bigint")
        )
        .orderBy(F.asc("c_mktsegment"))
    )
