"""Sixth batch: three-valued-logic NULL semantics, ordered-set window
functions, and a second LIVE Structured Streaming query (session
windows) under the driver's oracle gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query
from ._helpers import T


# ---------------------------------------------------------------------------
# q72 — NULL semantics (§2.A row 22 widened): null-safe equality
# (Spark `eqNullSafe` ≙ SQL IS NOT DISTINCT FROM), COALESCE chains,
# IS NULL under outer joins that actually produce NULLs.
# ---------------------------------------------------------------------------
@query(
    "q72_null_semantics",
    oracle="""
    SELECT c.c_custkey,
      a.max_f, b.max_o,
      (a.max_f IS NOT DISTINCT FROM b.max_o) AS same_val,
      COALESCE(a.max_f, b.max_o, 0.0) AS first_non_null,
      (a.max_f IS NULL) AS f_missing
    FROM customer c
    LEFT JOIN (SELECT o_custkey, CAST(MAX(o_totalprice) AS DOUBLE) AS max_f
               FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey) a
      ON a.o_custkey = c.c_custkey
    LEFT JOIN (SELECT o_custkey, CAST(MAX(o_totalprice) AS DOUBLE) AS max_o
               FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey) b
      ON b.o_custkey = c.c_custkey
    WHERE c.c_custkey <= 300
    ORDER BY c.c_custkey ASC
    """,
)
def q72_null_semantics(spark, sf_dir):
    """NULL = NULL is true under null-safe equality, unknown under
    plain `=` — the exact 3VL corner SQL surfaces punt on. MAX over
    raw doubles is order-free (no sum)."""
    cust = T(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
    orders = T(spark, sf_dir, "orders")
    a = (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.max("o_totalprice").cast("double").alias("max_f"))
        .withColumnRenamed("o_custkey", "ck_a")
    )
    b = (
        orders.filter(F.col("o_orderstatus") == "O")
        .groupBy("o_custkey")
        .agg(F.max("o_totalprice").cast("double").alias("max_o"))
        .withColumnRenamed("o_custkey", "ck_b")
    )
    return (
        cust.join(a, cust.c_custkey == F.col("ck_a"), "left")
        .join(b, cust.c_custkey == F.col("ck_b"), "left")
        .select(
            "c_custkey",
            "max_f",
            "max_o",
            F.col("max_f").eqNullSafe(F.col("max_o")).alias("same_val"),
            F.coalesce("max_f", "max_o", F.lit(0.0)).alias("first_non_null"),
            F.col("max_f").isNull().alias("f_missing"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# q73 — window-function breadth (§2.A row 20): percent_rank /
# cume_dist / first_value / nth_value / last_value with an explicit
# full frame. Shared SQL text incl. a named WINDOW clause — both
# engines speak it. Unique order key (acctbal DESC, suppkey) ⇒ every
# rank/navigation value is deterministic.
# ---------------------------------------------------------------------------
_Q73_SQL = """
    SELECT s_suppkey, s_nationkey,
      ROUND(percent_rank() OVER w, 6) AS pr,
      ROUND(cume_dist() OVER w, 6) AS cd,
      first_value(s_suppkey) OVER w AS top_supp,
      nth_value(s_suppkey, 2) OVER w AS second_supp,
      last_value(s_suppkey) OVER (
        PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
      ) AS bottom_supp
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey ASC)
    ORDER BY s_nationkey ASC, s_suppkey ASC
"""


@query("q73_window_breadth", oracle=_Q73_SQL)
def q73_window_breadth(spark, sf_dir):
    """Rank-family values are exact rationals over the same unique
    ordering (one IEEE division each ⇒ identical doubles); navigation
    functions use the default running frame except the explicit
    full-frame last_value. Scale: single shuffle on s_nationkey shared
    by every window in the query."""
    from ..catalog import register_views

    register_views(spark, sf_dir, ("supplier",))
    return spark.sql(_Q73_SQL)


# ---------------------------------------------------------------------------
# q74 — LIVE streaming SESSION windows (§2.C rows 63/67): events
# streamed from parquet (availableNow), session_window(gap=30min) per
# user, COMPLETE-mode memory sink. Complete mode emits every session
# regardless of watermark progress, which is what makes a bounded
# replay hash-matchable: in append mode the final watermark (max event
# time at the EventTimeWatermark node) withholds any session whose
# window end exceeds it, and Catalyst pushes non-event-time filters
# BELOW the watermark node — so a time cutoff silently caps the
# watermark and drops the tail sessions (observed: the last 2 sessions
# before the cutoff). Verified: no exact 30-minute boundary gaps exist
# in the data (the one case where merge semantics could diverge).
# ---------------------------------------------------------------------------
@query(
    "q74_streaming_sessions",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
        CASE WHEN LAG(ts) OVER w IS NULL THEN 1
             WHEN date_diff('microsecond', LAG(ts) OVER w, ts) > 1800000000
               THEN 1 ELSE 0 END AS is_new
      FROM events
      WHERE user_id < 40 AND ts < TIMESTAMP '2024-01-20'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ), grp AS (
      SELECT user_id, ts,
        SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                          ROWS UNBOUNDED PRECEDING) AS g
      FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM grp
    GROUP BY user_id, g
    ORDER BY user_id ASC, session_start ASC
    """,
)
def q74_streaming_sessions(spark, sf_dir):
    import uuid

    # Type-adaptive ts handling (nanos-long vs native timestamp),
    # shared with the batch path via catalog.open_events_stream.
    # ts_wm: LTZ absolute instant (timezone-independent construction);
    # the cutoff filter compares the NTZ value against an NTZ literal —
    # pure value comparison, never an LTZ literal (those shift with
    # the caller's session timezone).
    from ..catalog import open_events_stream

    stream, ts_ntz, ts_wm = open_events_stream(spark, sf_dir)
    ev = stream.withColumn("ts_wm", ts_wm).filter(
        (F.col("user_id") < 40)
        & (ts_ntz < F.lit("2024-01-20").cast("timestamp_ntz"))
    )
    win = ev.groupBy(
        F.session_window("ts_wm", "30 minutes").alias("sw"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    sink = f"q74_sink_{uuid.uuid4().hex[:8]}"
    q = (
        win.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # session_start back to NTZ via absolute micros (timezone-proof)
    start_ntz = F.expr(
        "timestampadd(MICROSECOND, unix_micros(sw.start),"
        " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
    )
    return (
        spark.table(sink)
        .select("user_id", start_ntz.alias("session_start"), "n_events")
        .orderBy("user_id", "session_start")
    )


# ---------------------------------------------------------------------------
# q75 — RANGE JOIN (custom operator, §2.D family with q39): for each
# purchase, how many clicks by the same user in the preceding hour.
# Spark-side: operators.joins.time_range_join — the range predicate
# rewritten as a binned equi-join (one shuffle, constant replication
# factor) instead of a per-key cross join. Oracle: correlated COUNT.
# ---------------------------------------------------------------------------
@query(
    "q75_range_join_clicks",
    oracle="""
    SELECT p.event_id, p.user_id,
      (SELECT COUNT(*) FROM events c
       WHERE c.event_type = 'click' AND c.user_id = p.user_id
         AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts) AS clicks_1h
    FROM events p
    WHERE p.event_type = 'purchase' AND p.user_id < 60
    ORDER BY p.event_id ASC
    """,
)
def q75_range_join_clicks(spark, sf_dir):
    from ..operators.joins import time_range_join

    ev = T(spark, sf_dir, "events").filter(F.col("user_id") < 60)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    hour_us = 3_600_000_000
    pairs = time_range_join(
        purchases,
        clicks,
        keys=["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        lo_offset_us=-hour_us,
        hi_offset_us=0,
    )
    counts = pairs.groupBy("event_id", "user_id").agg(
        F.count(F.lit(1)).alias("clicks_1h")
    )
    return (
        purchases.join(counts, ["event_id", "user_id"], "left")
        .select(
            "event_id",
            "user_id",
            F.coalesce("clicks_1h", F.lit(0)).alias("clicks_1h"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# q76 — hypertable rollup under the oracle gate: materialize the
# hourly continuous aggregate (once per sf, to scratch), then answer a
# RAGGED range query from rollup hours + raw edges. Decomposable
# decimal partials make the merged answer bit-identical to DuckDB's
# direct scan — the materialized view IS correct, not approximately
# correct.
# ---------------------------------------------------------------------------
@query(
    "q76_rollup_range_agg",
    oracle="""
    SELECT event_type,
      COUNT(*) AS n_events,
      CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-02 10:17:23'
      AND ts < TIMESTAMP '2024-01-08 03:40:11'
    GROUP BY event_type
    ORDER BY event_type ASC
    """,
)
def q76_rollup_range_agg(spark, sf_dir):
    import hashlib
    import os
    import tempfile

    from ..operators.rollup import materialize_rollup, rollup_range_agg

    events = T(spark, sf_dir, "events")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"aden_rollup_{tag}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        materialize_rollup(events, path)
    return rollup_range_agg(
        spark, events, path, "2024-01-02 10:17:23", "2024-01-08 03:40:11"
    )
