"""Fifth batch: as-of join, pivot, FILTERed aggregates, GROUPING SETS,
RANGE-frame windows, listagg, histogram binning, binary/document
metadata, EXISTS decorrelation, and array functions.

These widen SURVEY.md §2.A rows 10/18-21/24/28 plus the §2.D
training-pipeline surface (as-of join is the canonical event-alignment
operator Spark lacks as a primitive; binary metadata is the multimodal
plumbing over the driver's ``documents`` table).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import query
from ._helpers import T, dec, dround


# ---------------------------------------------------------------------------
# q39 — AS-OF JOIN (custom operator, SURVEY.md §2.D): for each purchase
# event, the most recent click (ts <= purchase ts) by the same user.
#
# Spark has no asof-join primitive; the scalable formulation is
# union-tag-and-running-max: one shuffle on user_id, O(n log n) local
# sort, no range join (a naive t1.ts <= t2.ts join is quadratic).
# DuckDB's native analog is ASOF JOIN; the oracle uses a correlated
# MAX subquery instead because ASOF's pick among equal-ts matches is
# unspecified while MAX(ts) is order-free and deterministic.
# ---------------------------------------------------------------------------
@query(
    "q39_asof_join",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
      (SELECT MAX(c.ts) FROM events c
       WHERE c.event_type = 'click' AND c.user_id = p.user_id
         AND c.ts <= p.ts) AS last_click_ts
    FROM events p
    WHERE p.event_type = 'purchase' AND p.user_id < 50
    ORDER BY p.event_id ASC
    """,
)
def q39_asof_join(spark, sf_dir):
    """kind=0 sorts clicks before same-ts purchases, so a click at
    exactly the purchase timestamp is matched (ts <= semantics)."""
    ev = T(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        F.col("ts").alias("click_ts"),
        F.lit(None).cast("bigint").alias("event_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        F.lit(None).cast("timestamp_ntz").alias("click_ts"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("last_click_ts", F.max("click_ts").over(w))
        .filter(F.col("kind") == 1)
        .select("event_id", "user_id", "ts", "last_click_ts")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# q55 — PIVOT (§2.A row 10 widened): order counts per status x priority.
# Explicit pivot value list keeps the output schema static (required
# for a deterministic contract AND for scale: without it Spark runs an
# extra distinct-collect job over the pivot column).
# ---------------------------------------------------------------------------
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRI_ALIAS = ["n_urgent", "n_high", "n_medium", "n_notspec", "n_low"]


@query(
    "q55_pivot_priorities",
    oracle="""
    SELECT o_orderstatus,
      COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
      COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS n_high,
      COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS n_medium,
      COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS n_notspec,
      COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS n_low
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus ASC
    """,
)
def q55_pivot_priorities(spark, sf_dir):
    """df.groupBy().pivot(values=...).count(); empty cells coalesced
    to 0 to match COUNT FILTER semantics."""
    piv = (
        T(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .count()
    )
    cols = [F.col("o_orderstatus")] + [
        F.coalesce(F.col(f"`{v}`"), F.lit(0)).alias(a)
        for v, a in zip(_PRIORITIES, _PRI_ALIAS)
    ]
    return piv.select(*cols).orderBy("o_orderstatus")


# ---------------------------------------------------------------------------
# q59 — FILTERed aggregates (§2.A rows 10/22): conditional counts/sums
# in one pass over customer (no self-join, no second scan).
# ---------------------------------------------------------------------------
@query(
    "q59_filtered_aggregates",
    oracle="""
    SELECT c_mktsegment,
      COUNT(*) AS n_customers,
      COUNT(*) FILTER (WHERE c_acctbal > 5000) AS n_rich,
      CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                 FILTER (WHERE c_acctbal > 5000), 2) AS DOUBLE) AS rich_balance,
      COUNT(*) FILTER (WHERE c_acctbal < 0) AS n_negative
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment ASC
    """,
)
def q59_filtered_aggregates(spark, sf_dir):
    bal = F.col("c_acctbal")
    return (
        T(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.count(F.when(bal > 5000, 1)).alias("n_rich"),
            dround(F.sum(F.when(bal > 5000, dec("c_acctbal")))).alias("rich_balance"),
            F.count(F.when(bal < 0, 1)).alias("n_negative"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# q61 — GROUPING SETS + GROUPING() (§2.A row 21 beyond rollup/cube).
# Shared SQL text: Spark and DuckDB both speak this syntax natively.
# ---------------------------------------------------------------------------
_Q61_SQL = """
    SELECT c_mktsegment, n_name,
      CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_seg,
      CAST(GROUPING(n_name) AS BIGINT) AS g_nat,
      COUNT(*) AS n_customers,
      CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((c_mktsegment, n_name), (c_mktsegment), (n_name), ())
    ORDER BY g_seg ASC, g_nat ASC,
      c_mktsegment ASC NULLS FIRST, n_name ASC NULLS FIRST
"""


@query("q61_grouping_sets", oracle=_Q61_SQL)
def q61_grouping_sets(spark, sf_dir):
    """GROUPING() distinguishes 'aggregated away' from a NULL data
    value — the deterministic way to label subtotal rows. Scale:
    Spark expands grouping sets into one Expand + single shuffle, not
    four scans."""
    from ..catalog import register_views

    register_views(spark, sf_dir, ("customer", "nation"))
    return spark.sql(_Q61_SQL)


# ---------------------------------------------------------------------------
# q62 — RANGE-frame window (§2.A row 20 widened): per-customer rolling
# 30-day spend. RANGE frames are value-based (all peers included), so
# same-day ties don't affect the result — deterministic without a
# unique sort key inside the frame.
# ---------------------------------------------------------------------------
@query(
    "q62_range_window_spend",
    oracle="""
    SELECT o_orderkey, o_custkey,
      CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        PARTITION BY o_custkey
        ORDER BY datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
        RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS spend_30d
    FROM orders
    WHERE o_custkey < 200
    ORDER BY o_orderkey ASC
    """,
)
def q62_range_window_spend(spark, sf_dir):
    day = F.datediff(F.col("o_orderdate").cast("date"), F.to_date(F.lit("1990-01-01")))
    w = Window.partitionBy("o_custkey").orderBy(day).rangeBetween(-30, 0)
    return (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 200)
        .select(
            "o_orderkey",
            "o_custkey",
            dround(F.sum(dec("o_totalprice")).over(w)).alias("spend_30d"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# q63 — sorted-distinct string aggregation (listagg / string_agg,
# §2.A row 24): deterministic via sort-before-concat (bare
# collect_list/string_agg order is execution-dependent — banned).
# ---------------------------------------------------------------------------
@query(
    "q63_nation_segments_listagg",
    oracle="""
    SELECT n_name,
      array_to_string(list_sort(array_agg(DISTINCT c_mktsegment)), ',') AS segments,
      COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name ASC
    """,
)
def q63_nation_segments_listagg(spark, sf_dir):
    cust = T(spark, sf_dir, "customer")
    nat = T(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("c_mktsegment"))).alias(
                "segments"
            ),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# q64 — histogram binning (§2.A row 27): fixed-width buckets via
# floor-division (portable width_bucket; identical IEEE division in
# both engines). MIN/MAX on DECIMAL casts are order-free.
# ---------------------------------------------------------------------------
@query(
    "q64_price_histogram",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
      COUNT(*) AS n_orders,
      CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
      CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
    FROM orders
    GROUP BY 1
    ORDER BY 1 ASC
    """,
)
def q64_price_histogram(spark, sf_dir):
    return (
        T(spark, sf_dir, "orders")
        .groupBy(
            F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min(dec("o_totalprice")).cast("double").alias("min_price"),
            F.max(dec("o_totalprice")).cast("double").alias("max_price"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# q65 — binary/document metadata (§2.D multimodal plumbing over the
# driver's documents table): UTF-8 byte length vs char length diverge
# on non-ASCII text, sha-256 content fingerprint (both engines emit
# lowercase hex). At 100 TB this is the dedup-key projection pass:
# narrow ReadSchema (doc_id, text), no shuffle.
# ---------------------------------------------------------------------------
@query(
    "q65_doc_binary_metadata",
    oracle="""
    SELECT doc_id,
      octet_length(encode(text)) AS n_bytes,
      length(text) AS n_chars_measured,
      sha256(text) AS text_sha256,
      substr(sha256(text), 1, 16) AS sha_prefix
    FROM documents
    WHERE doc_id < 200
    ORDER BY doc_id ASC
    """,
)
def q65_doc_binary_metadata(spark, sf_dir):
    sha = F.sha2(F.col("text"), 256)
    return (
        T(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.octet_length("text").alias("n_bytes"),
            F.length("text").alias("n_chars_measured"),
            sha.alias("text_sha256"),
            F.substring(sha, 1, 16).alias("sha_prefix"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q66 — correlated EXISTS / NOT EXISTS (§2.A rows 16/19) as shared SQL:
# Catalyst decorrelates into left-semi + left-anti joins.
# ---------------------------------------------------------------------------
_Q66_SQL = """
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE c.c_custkey <= 600
      AND EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderstatus = 'F'
                        AND o2.o_totalprice > 450000)
    ORDER BY c.c_custkey ASC
"""


@query("q66_exists_high_value", oracle=_Q66_SQL)
def q66_exists_high_value(spark, sf_dir):
    from ..catalog import register_views

    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_Q66_SQL)


# ---------------------------------------------------------------------------
# q67 — array functions (§2.A surface the SQL passthrough accepts:
# DuckDB LIST ≙ Spark ARRAY): split / size / element_at / contains /
# sort / join.
# ---------------------------------------------------------------------------
@query(
    "q67_type_words_arrays",
    oracle="""
    SELECT p_partkey,
      len(string_split(p_type, ' ')) AS n_words,
      string_split(p_type, ' ')[1] AS first_word,
      list_contains(string_split(p_type, ' '), 'BRUSHED') AS has_brushed,
      array_to_string(list_sort(string_split(p_type, ' ')), '_') AS sorted_words
    FROM part
    WHERE p_partkey <= 300
    ORDER BY p_partkey ASC
    """,
)
def q67_type_words_arrays(spark, sf_dir):
    words = F.split(F.col("p_type"), " ")
    return (
        T(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 300)
        .select(
            "p_partkey",
            F.size(words).alias("n_words"),
            F.element_at(words, 1).alias("first_word"),
            F.array_contains(words, "BRUSHED").alias("has_brushed"),
            F.concat_ws("_", F.array_sort(words)).alias("sorted_words"),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# q70 — MAP functions over the events props JSON (§2.A row 28 widened):
# parse to MAP, enumerate keys, point-lookup a value. The well-formed
# path stays native (from_json / json_keys) — no Python.
# ---------------------------------------------------------------------------
@query(
    "q70_props_map",
    oracle="""
    SELECT event_id,
      array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
      CAST(props->>'k' AS BIGINT) AS k_value
    FROM events
    WHERE event_id < 2000
    ORDER BY event_id ASC
    """,
)
def q70_props_map(spark, sf_dir):
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return (
        T(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)
        .select(
            "event_id",
            F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("keys_csv"),
            F.element_at(m, "k").cast("bigint").alias("k_value"),
        )
        .orderBy("event_id")
    )
