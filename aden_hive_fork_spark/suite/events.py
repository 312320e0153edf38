"""Event-layer queries (SURVEY.md §2.C, batch analogs).

The reference's event bus exposes ``get_history(event_type, …, limit)``
(most-recent-first) and ``get_stats`` (count by type)
(reference: core/framework/runtime/event_bus.py:1017-1058), plus
filtered subscriptions (:327-349). Here they are batch queries over
the ``events`` table; the live Structured Streaming twins live in
``aden_hive_fork_spark.streaming``.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import query
from ._helpers import T, avg2, dec, dround


# ---------------------------------------------------------------------------
# q20 — get_history: filter → order ts desc → limit (event_bus.py:1017-1046).
# ---------------------------------------------------------------------------
@query(
    "q20_event_history",
    oracle="""
    SELECT event_id, ts, user_id, value
    FROM events
    WHERE event_type = 'click' AND user_id < 100
    ORDER BY ts DESC, event_id DESC
    LIMIT 100
    """,
)
def q20_event_history(spark, sf_dir):
    """Most-recent-first bounded history. LIMIT is deterministic:
    event_id is a unique tie-break under equal timestamps. Scale:
    TakeOrderedAndProject — no global sort materializes."""
    return (
        T(spark, sf_dir, "events")
        .filter((F.col("event_type") == "click") & (F.col("user_id") < 100))
        .select("event_id", "ts", "user_id", "value")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q21 — get_stats: count by type (event_bus.py:1048-1058), widened.
# ---------------------------------------------------------------------------
@query(
    "q21_event_stats",
    oracle="""
    SELECT event_type,
      COUNT(*) AS n_events,
      COUNT(DISTINCT user_id) AS n_users,
      CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value,
      ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 2) AS avg_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type ASC
    """,
)
def q21_event_stats(spark, sf_dir):
    return (
        T(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dround(F.sum(dec("value"))).alias("total_value"),
            avg2(F.sum(dec("value")), F.count(F.lit(1))).alias("avg_value"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q22 — tumbling-window aggregation, batch twin of the streaming op
# (§2.C row 67: the new engine adds event-time windows).
# ---------------------------------------------------------------------------
@query(
    "q22_hourly_event_windows",
    oracle="""
    SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
      COUNT(*) AS n_events,
      CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
    GROUP BY 1, 2
    ORDER BY window_start ASC, event_type ASC
    """,
)
def q22_hourly_event_windows(spark, sf_dir):
    """1-hour tumbling windows over the event stream (batch). The
    date_trunc form is hash-matchable; the streaming twin uses
    window('1 hour') + withWatermark."""
    ev = T(spark, sf_dir, "events").filter(
        (F.col("ts") >= F.lit("2024-01-01").cast("timestamp_ntz"))
        & (F.col("ts") < F.lit("2024-01-08").cast("timestamp_ntz"))
    )
    # Pure-NTZ hour truncation: date_trunc() on NTZ would round-trip
    # through the session timezone (LTZ result) and drift when the
    # caller's session tz is not UTC; integer hour arithmetic is
    # timezone-proof.
    hour_start = F.expr(
        "timestampadd(HOUR, timestampdiff(HOUR, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts),"
        " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
    )
    return (
        ev.groupBy(hour_start.alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(F.sum(dec("value"))).alias("total_value"),
        )
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# q23 — JSON payload extraction (§2.A row 28: find_json_object /
# from_json analog — node.py:33-139).
# ---------------------------------------------------------------------------
@query(
    "q23_event_props_json",
    oracle="""
    SELECT CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT) % 10 AS k_bucket,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT)) AS BIGINT) AS k_sum
    FROM events
    GROUP BY 1
    ORDER BY k_bucket ASC NULLS LAST
    """,
)
def q23_event_props_json(spark, sf_dir):
    """Extract a typed field from the JSON ``props`` payload and
    aggregate on it. Spark uses the native get_json_object (JVM-side
    JSON path); the oracle uses a regex so it needs no DuckDB
    extension — both yield the same integers."""
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        T(spark, sf_dir, "events")
        .groupBy((k % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).cast("bigint").alias("k_sum"),
        )
        .orderBy(F.asc_nulls_last("k_bucket"))
    )


# ---------------------------------------------------------------------------
# q44 — streak detection (gaps-and-islands): the SQL twin of the
# stall/doom-loop detector (§2.B row 55, state/monitor.py) — runs of
# identical consecutive event types per user.
# ---------------------------------------------------------------------------
@query(
    "q44_event_type_streaks",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_type, event_id,
        CASE WHEN LAG(event_type) OVER w IS NULL THEN 1
             WHEN LAG(event_type) OVER w <> event_type THEN 1
             ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    grouped AS (
      SELECT user_id, event_type, event_id,
        SUM(is_new) OVER (PARTITION BY user_id ORDER BY event_id ASC
                          ROWS UNBOUNDED PRECEDING) AS grp
      FROM marked
    )
    SELECT user_id, event_type,
      COUNT(*) AS streak_len,
      CAST(MIN(event_id) AS BIGINT) AS first_event_id
    FROM grouped
    GROUP BY user_id, event_type, grp
    HAVING COUNT(*) >= 4
    ORDER BY streak_len DESC, user_id ASC, first_event_id ASC
    """,
)
def q44_event_type_streaks(spark, sf_dir):
    """Runs of >= 4 identical consecutive event types per user
    (lag-compare + cumulative-sum group ids, the doom-loop detector's
    shape). NB: ordering by (ts, event_id) makes the islands total-
    ordered and the oracle exact."""
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    prev = F.lag("event_type").over(w)
    marked = T(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.when(prev.isNull() | (prev != F.col("event_type")), 1).otherwise(0).alias("is_new"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grouped = marked.withColumn("grp", F.sum("is_new").over(w2))
    return (
        grouped.groupBy("user_id", "event_type", "grp")
        .agg(
            F.count(F.lit(1)).alias("streak_len"),
            F.min("event_id").cast("bigint").alias("first_event_id"),
        )
        .filter(F.col("streak_len") >= 4)
        .drop("grp")
        .orderBy(F.desc("streak_len"), F.asc("user_id"), F.asc("first_event_id"))
    )


# ---------------------------------------------------------------------------
# q24 — sessionization: gap > 30 min starts a new session. Batch twin
# of session_window(); gaps computed in exact integer microseconds.
# ---------------------------------------------------------------------------
@query(
    "q24_user_sessions",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
        CASE WHEN LAG(ts) OVER w IS NULL THEN 1
             WHEN date_diff('microsecond', LAG(ts) OVER w, ts) > 1800000000 THEN 1
             ELSE 0 END AS is_new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    )
    SELECT user_id,
      CAST(SUM(is_new_session) AS BIGINT) AS n_sessions,
      COUNT(*) AS n_events
    FROM marked
    GROUP BY user_id
    ORDER BY user_id ASC
    """,
)
def q24_user_sessions(spark, sf_dir):
    """Per-user session counts with a 30-minute inactivity gap. The gap
    is compared in whole microseconds (exact integers in both engines —
    no calendar-unit truncation ambiguity). Scale: one shuffle on
    user_id; the window and the aggregate share that partitioning."""
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    prev_ts = F.lag("ts").over(w)
    gap_us = F.expr(
        "timestampdiff(MICROSECOND, lag(ts) OVER "
        "(PARTITION BY user_id ORDER BY ts ASC, event_id ASC), ts)"
    )
    marked = T(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(prev_ts.isNull(), 1)
        .when(gap_us > 1_800_000_000, 1)
        .otherwise(0)
        .alias("is_new_session"),
    )
    return (
        marked.groupBy("user_id")
        .agg(
            F.sum("is_new_session").cast("bigint").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q101 — the CUSTOM STATEFUL streaming operator (applyInPandasWithState,
# §2.B keyed state / §2.C live tier) under the driver's oracle gate: a
# full availableNow replay's final per-user state must equal the batch
# aggregate DuckDB computes directly.
# ---------------------------------------------------------------------------
@query(
    "q101_stateful_user_state",
    oracle="""
    WITH ordered AS (
      SELECT user_id, value, event_type,
        ROW_NUMBER() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE user_id < 50
    )
    SELECT o.user_id,
      CAST(COUNT(*) AS BIGINT) AS n_events,
      ROUND(SUM(o.value), 2) AS total_value,
      MAX(CASE WHEN o.rn = 1 THEN o.event_type END) AS last_event_type
    FROM ordered o
    GROUP BY o.user_id
    ORDER BY o.user_id ASC
    """,
)
def q101_stateful_user_state(spark, sf_dir):
    """events streamed (availableNow) through the keyed-state operator
    (streaming/stateful.running_user_state): per-user counters live in
    Spark's state store across micro-batches; the final update per
    user must hash-match the oracle's direct batch aggregate — the
    proof that the custom stateful operator is exact, not just
    plausible. Update-mode memory sink: the LAST update per user is
    the final state (single-source replay emits one)."""
    import uuid

    from ..catalog import open_events_stream
    from ..streaming.stateful import running_user_state

    stream, ts_ntz, _ = open_events_stream(spark, sf_dir)
    ev = (
        stream.withColumn("ts", ts_ntz)
        .filter(F.col("user_id") < 50)
        .select("user_id", "ts", "event_id", "event_type", "value")
    )
    out = running_user_state(ev)
    sink = f"q101_sink_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # update-mode sink may hold one row per (user, batch); the final
    # state per user is the row with the largest n_events.
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        spark.table(sink)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            "n_events",
            F.round("total_value", 2).cast("double").alias("total_value"),
            "last_event_type",
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q103 — EVENT FUNNEL (view -> click -> purchase): the product-analytics
# sequence operator. Stage k's timestamp is the FIRST qualifying event
# strictly after stage k-1; conversion requires completing within 7
# days of the first view. Deterministic (min-timestamps, integer
# microsecond comparisons), so fully oracle-checkable.
# ---------------------------------------------------------------------------
@query(
    "q103_event_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_buy
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_view,
      CAST(COUNT(c.t_click) AS BIGINT) AS n_click,
      CAST(COUNT(p.t_buy) AS BIGINT) AS n_purchase,
      CAST(COUNT(CASE WHEN date_diff('microsecond', v.t_view, p.t_buy)
                       <= 604800000000 THEN 1 END) AS BIGINT) AS n_converted_7d
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON c.user_id = p.user_id
    """,
)
def q103_event_funnel(spark, sf_dir):
    """view→click→purchase funnel with a 7-day conversion window.
    Scale shape: three per-user MIN aggregates sharing the user_id
    partitioning (one shuffle key end-to-end), then two
    aggregate-then-join steps on key-cardinality inputs — never a
    row-level self-join of the raw event log. The 7-day window is
    whole-microsecond integer arithmetic (timezone- and
    calendar-proof)."""
    ev = T(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"))
    )
    funnel = v.join(c, "user_id", "left").join(p, "user_id", "left")
    within = F.expr(
        "timestampdiff(MICROSECOND, t_view, t_buy) <= 604800000000"
    )
    return funnel.agg(
        F.count(F.lit(1)).alias("n_view"),
        F.count("t_click").alias("n_click"),
        F.count("t_buy").alias("n_purchase"),
        F.count(F.when(within, 1)).alias("n_converted_7d"),
    )


# ---------------------------------------------------------------------------
# q105 — LIVE SLIDING windows (§2.C row 67, third window type): 1-hour
# windows sliding every 30 minutes over the event stream. Each event
# belongs to exactly two windows; the oracle enumerates both window
# starts per event with pure epoch-microsecond arithmetic (no
# calendar functions, timezone-proof on both engines).
# ---------------------------------------------------------------------------
@query(
    "q105_streaming_sliding_windows",
    oracle="""
    WITH e AS (
      SELECT event_type,
        date_diff('microsecond', TIMESTAMP '1970-01-01', ts) AS us
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-03'
    ),
    win AS (
      SELECT event_type, ws FROM e
      CROSS JOIN LATERAL (VALUES
        ((us // 1800000000) * 1800000000),
        ((us // 1800000000) * 1800000000 - 1800000000)
      ) AS w(ws)
      WHERE e.us >= w.ws AND e.us < w.ws + 3600000000
    )
    SELECT TIMESTAMP '1970-01-01' + to_microseconds(ws) AS window_start,
      event_type, COUNT(*) AS n_events
    FROM win
    GROUP BY 1, 2
    ORDER BY window_start ASC, event_type ASC
    """,
)
def q105_streaming_sliding_windows(spark, sf_dir):
    """events streamed (availableNow) into watermarked SLIDING windows
    (1h length, 30min slide) — with q60 (tumbling) and q74 (session),
    all three Structured Streaming window types now run LIVE under
    the oracle gate. Window starts are converted back to NTZ via
    absolute microseconds (timezone-proof)."""
    import uuid

    from ..catalog import open_events_stream

    stream, ts_ntz, ts_wm = open_events_stream(spark, sf_dir)
    ev = (
        stream.withColumn("ts_wm", ts_wm)
        .withColumn("ts", ts_ntz)
        .filter(
            (F.col("ts") >= F.lit("2024-01-01").cast("timestamp_ntz"))
            & (F.col("ts") < F.lit("2024-01-03").cast("timestamp_ntz"))
        )
    )
    win = (
        ev.withWatermark("ts_wm", "10 minutes")
        .groupBy(F.window("ts_wm", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    sink = f"q105_sink_{uuid.uuid4().hex[:8]}"
    q = (
        win.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    start_ntz = F.expr(
        "timestampadd(MICROSECOND, unix_micros(w.start),"
        " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
    )
    return (
        spark.table(sink)
        .select(start_ntz.alias("window_start"), "event_type", "n_events")
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# q120 — LIVE STREAM-STREAM JOIN (§2.C extension): view→purchase
# attribution. Two watermarked event streams (views, purchases from
# the same source) joined on user with an event-time range condition —
# the Structured Streaming capability the window family (q60/q74/q105)
# doesn't exercise. Inner join + both-side watermarks bound the state
# store; availableNow replay makes the live run oracle-checkable.
# ---------------------------------------------------------------------------
@query(
    "q120_streaming_stream_join",
    oracle="""
    SELECT DATE_TRUNC('hour', p.ts) AS purchase_hour,
      CAST(COUNT(*) AS BIGINT) AS n_pairs,
      CAST(COUNT(DISTINCT p.event_id) AS BIGINT) AS n_purchases,
      CAST(ROUND(SUM(CAST(p.value AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS attributed_value
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
    WHERE v.ts >= TIMESTAMP '2024-01-01' AND v.ts < TIMESTAMP '2024-01-03'
      AND p.ts >= TIMESTAMP '2024-01-01' AND p.ts < TIMESTAMP '2024-01-03'
    GROUP BY 1
    ORDER BY purchase_hour ASC
    """,
)
def q120_streaming_stream_join(spark, sf_dir):
    """Purchases attributed to prior views of the same user within
    30 minutes, computed as a LIVE stream-stream inner join: both
    sides watermarked 1 hour, join condition carries the event-time
    range so Spark can evict matched state. The memory sink collects
    append-mode pairs; the final (batch) rollup buckets purchases by
    NTZ hour via absolute-micros arithmetic (timezone-proof)."""
    import uuid

    from ..catalog import open_events_stream

    stream, ts_ntz, ts_wm = open_events_stream(spark, sf_dir)
    base = (
        stream.withColumn("ts_ntz", ts_ntz)
        .withColumn("ts_wm", ts_wm)
        .filter(
            (F.col("ts_ntz") >= F.lit("2024-01-01").cast("timestamp_ntz"))
            & (F.col("ts_ntz") < F.lit("2024-01-03").cast("timestamp_ntz"))
        )
    )
    views = (
        base.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts_wm").alias("v_wm"),
        )
        .withWatermark("v_wm", "1 hour")
    )
    purchases = (
        base.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("p_event_id"),
            F.col("value").alias("p_value"),
            F.col("ts_wm").alias("p_wm"),
            F.col("ts_ntz").alias("p_ntz"),
        )
        .withWatermark("p_wm", "1 hour")
    )
    pairs = views.join(
        purchases,
        F.expr(
            "v_user = p_user AND p_wm >= v_wm"
            " AND p_wm <= v_wm + interval 30 minutes"
        ),
        "inner",
    )
    sink = f"q120_sink_{uuid.uuid4().hex[:8]}"
    q = (
        pairs.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    hour_start = F.expr(
        "timestampadd(HOUR, timestampdiff(HOUR,"
        " TIMESTAMP_NTZ '1970-01-01 00:00:00', p_ntz),"
        " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
    )
    return (
        spark.table(sink)
        .groupBy(hour_start.alias("purchase_hour"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.countDistinct("p_event_id").cast("bigint").alias("n_purchases"),
            F.round(F.sum(F.col("p_value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("attributed_value"),
        )
        .orderBy("purchase_hour")
    )


# ---------------------------------------------------------------------------
# q121 — SCD-2 interval build (operators/scd): events as a user-status
# change log → validity intervals with no-op collapse.
# ---------------------------------------------------------------------------
@query(
    "q121_scd2_intervals",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_type,
        LAG(event_type) OVER (
          PARTITION BY user_id ORDER BY ts, event_type
        ) AS prev
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
    ), kept AS (
      SELECT user_id, ts, event_type
      FROM ordered WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id, event_type AS status,
      ts AS valid_from,
      LEAD(ts) OVER (
        PARTITION BY user_id ORDER BY ts, event_type
      ) AS valid_to,
      (LEAD(ts) OVER (
        PARTITION BY user_id ORDER BY ts, event_type
      ) IS NULL) AS is_current,
      CAST(ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts, event_type
      ) AS INT) AS episode
    FROM kept
    ORDER BY user_id ASC, episode ASC
    """,
)
def q121_scd2_intervals(spark, sf_dir):
    """`scd.build_scd2` over the event log (key=user, attr=event_type):
    consecutive duplicate states collapse, each state episode gets
    [valid_from, valid_to) with NULL valid_to marking the current
    state. Both window passes share one hashpartitioning Exchange —
    the build is a single shuffle of the change log."""
    from ..operators.scd import build_scd2

    ev = T(spark, sf_dir, "events").filter(
        (F.col("ts") >= F.lit("2024-01-01").cast("timestamp_ntz"))
        & (F.col("ts") < F.lit("2024-01-08").cast("timestamp_ntz"))
    )
    scd = build_scd2(
        ev.select("user_id", "ts", "event_type"),
        key_col="user_id", ts_col="ts", attr_cols=["event_type"],
    )
    return (
        scd.select(
            "user_id",
            F.col("event_type").alias("status"),
            "valid_from", "valid_to", "is_current", "episode",
        )
        .orderBy("user_id", "episode")
    )


# ---------------------------------------------------------------------------
# q124 — time-bucket gap filling with LOCF (operators/timeseries):
# dense per-user hourly series where silent hours carry the last
# observed hourly total forward.
# ---------------------------------------------------------------------------
@query(
    "q124_gapfill_locf",
    oracle="""
    WITH hourly AS (
      SELECT user_id, DATE_TRUNC('hour', ts) AS bucket,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-03'
        AND user_id < 20
      GROUP BY 1, 2
    ), grid AS (
      SELECT u.user_id, g.bucket
      FROM (SELECT DISTINCT user_id FROM hourly) u
      CROSS JOIN generate_series(
        TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-02 23:00:00',
        INTERVAL 1 HOUR
      ) g(bucket)
    ), joined AS (
      SELECT g.user_id, g.bucket, h.total,
        (h.total IS NULL) AS filled
      FROM grid g LEFT JOIN hourly h
        ON g.user_id = h.user_id AND g.bucket = h.bucket
    )
    , locf AS (
      SELECT user_id, bucket,
        LAST_VALUE(total IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS total,
        filled
      FROM joined
    )
    SELECT user_id, bucket,
      CAST(FLOOR(CAST(total AS DOUBLE) * 1000000 + 0.5) / 1000000
           AS DOUBLE) AS total,
      filled
    FROM locf
    ORDER BY user_id ASC, bucket ASC
    """,
)
def q124_gapfill_locf(spark, sf_dir):
    """`timeseries.gapfill`: per-user hourly spend totals densified
    onto the full 48-hour grid, missing hours carrying the last
    observation forward (leading gaps stay NULL). Grid = keys ×
    sequence (no driver loop); LOCF shares the join's partitioning —
    one co-keyed join + one window pass. Hour buckets via
    absolute-micros arithmetic (timezone-proof)."""
    from ..operators.timeseries import gapfill

    ev = T(spark, sf_dir, "events").filter(
        (F.col("ts") >= F.lit("2024-01-01").cast("timestamp_ntz"))
        & (F.col("ts") < F.lit("2024-01-03").cast("timestamp_ntz"))
        & (F.col("user_id") < 20)
    )
    hour_start = F.expr(
        "timestampadd(HOUR, timestampdiff(HOUR,"
        " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts),"
        " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
    )
    hourly = (
        ev.groupBy("user_id", hour_start.alias("bucket"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("total")
        )
    )
    out = gapfill(
        hourly, "user_id", "bucket", "total",
        start="2024-01-01 00:00:00", end="2024-01-02 23:00:00",
        step="1 hour", fill="locf",
    )
    # LOCF runs on the exact DECIMAL totals; the output is emitted via
    # the driver-green stable_round6 DOUBLE codec (CORRECTNESS_r07
    # adjudicated DECIMAL output columns as the divergent driver
    # codec). Leading-gap NULLs pass through unchanged.
    from ..operators.similarity import stable_round6

    return out.select(
        "user_id",
        "bucket",
        stable_round6(F.col("total").cast("double")).alias("total"),
        "filled",
    ).orderBy("user_id", "bucket")


# ---------------------------------------------------------------------------
# q126 — linear interpolation fill (the hypertable interpolate()
# analog): gaps take the line between the surrounding REAL
# observations; leading/trailing gaps stay NULL.
# ---------------------------------------------------------------------------
@query(
    "q126_gapfill_interpolate",
    oracle="""
    WITH hourly AS (
      SELECT user_id, DATE_TRUNC('hour', ts) AS bucket,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-03'
        AND user_id < 20
      GROUP BY 1, 2
    ), grid AS (
      SELECT u.user_id, g.bucket
      FROM (SELECT DISTINCT user_id FROM hourly) u
      CROSS JOIN generate_series(
        TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-02 23:00:00',
        INTERVAL 1 HOUR
      ) g(bucket)
    ), joined AS (
      SELECT g.user_id, g.bucket, h.total, (h.total IS NULL) AS filled
      FROM grid g LEFT JOIN hourly h
        ON g.user_id = h.user_id AND g.bucket = h.bucket
    ), surrounded AS (
      SELECT user_id, bucket, total, filled,
        LAST_VALUE(CASE WHEN total IS NOT NULL
          THEN {'v': total, 't': bucket} END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev,
        FIRST_VALUE(CASE WHEN total IS NOT NULL
          THEN {'v': total, 't': bucket} END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY bucket
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next
      FROM joined
    )
    SELECT user_id, bucket,
      CAST(ROUND(COALESCE(
        CAST(total AS DOUBLE),
        CASE WHEN prev IS NOT NULL AND next IS NOT NULL THEN
          CAST(prev.v AS DOUBLE)
          + (CAST(next.v AS DOUBLE) - CAST(prev.v AS DOUBLE))
            * date_diff('microsecond', prev.t, bucket)
            / NULLIF(date_diff('microsecond', prev.t, next.t), 0)
        END), 4) AS DOUBLE) AS total,
      filled
    FROM surrounded
    ORDER BY user_id ASC, bucket ASC
    """,
)
def q126_gapfill_interpolate(spark, sf_dir):
    """`timeseries.gapfill(fill='interpolate')`: the slope uses the
    surrounding REAL observation times (carried as (value, bucket)
    structs through ignore-nulls windows), micros arithmetic NTZ-pure.
    Identical expression order on both engines makes the double
    arithmetic bit-equal before the 4-decimal output rounding."""
    from ..operators.timeseries import gapfill

    ev = T(spark, sf_dir, "events").filter(
        (F.col("ts") >= F.lit("2024-01-01").cast("timestamp_ntz"))
        & (F.col("ts") < F.lit("2024-01-03").cast("timestamp_ntz"))
        & (F.col("user_id") < 20)
    )
    hour_start = F.expr(
        "timestampadd(HOUR, timestampdiff(HOUR,"
        " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts),"
        " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
    )
    hourly = (
        ev.groupBy("user_id", hour_start.alias("bucket"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("total")
        )
    )
    out = gapfill(
        hourly, "user_id", "bucket", "total",
        start="2024-01-01 00:00:00", end="2024-01-02 23:00:00",
        step="1 hour", fill="interpolate",
    )
    return (
        out.select(
            "user_id", "bucket",
            F.round(F.col("total"), 4).cast("double").alias("total"),
            "filled",
        )
        .orderBy("user_id", "bucket")
    )


# ---------------------------------------------------------------------------
# q157 — funnel latency: per-user first view → first purchase delay,
# summarized with exact interpolated percentiles in integer seconds
# (NTZ epoch math — timezone-proof, and the percentile inputs are
# exact integers so interpolation is bit-identical across engines).
# One user-keyed aggregate over events + a 1-row summary.
# ---------------------------------------------------------------------------
@query(
    "q157_funnel_latency",
    oracle="""
    WITH f AS (
      SELECT user_id,
        MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
        MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_buy
      FROM events
      GROUP BY user_id
    ),
    conv AS (
      SELECT user_id,
        CAST(date_diff('second', first_view, first_buy) AS BIGINT) AS delay_s
      FROM f
      WHERE first_view IS NOT NULL AND first_buy IS NOT NULL
        AND first_buy >= first_view
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
      CAST(MIN(delay_s) AS BIGINT) AS min_s,
      CAST(ROUND(quantile_cont(delay_s, 0.50), 4) AS DOUBLE) AS p50_s,
      CAST(ROUND(quantile_cont(delay_s, 0.90), 4) AS DOUBLE) AS p90_s,
      CAST(MAX(delay_s) AS BIGINT) AS max_s
    FROM conv
    """,
)
def q157_funnel_latency(spark, sf_dir):
    """Time-to-convert distribution for the view→purchase funnel."""
    e = T(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_buy"
        ),
    )
    conv = f.filter(
        F.col("first_view").isNotNull()
        & F.col("first_buy").isNotNull()
        & (F.col("first_buy") >= F.col("first_view"))
    ).select(
        # DuckDB date_diff('second') counts BOUNDARY crossings, not
        # full elapsed seconds — truncate each side to the second
        # first, then the NTZ-pure diff matches exactly
        F.expr(
            "timestampdiff(SECOND, date_trunc('second', first_view),"
            " date_trunc('second', first_buy))"
        )
        .cast("bigint")
        .alias("delay_s")
    )
    return conv.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.min("delay_s").cast("bigint").alias("min_s"),
        F.round(F.expr("percentile(delay_s, 0.50)"), 4)
        .cast("double")
        .alias("p50_s"),
        F.round(F.expr("percentile(delay_s, 0.90)"), 4)
        .cast("double")
        .alias("p90_s"),
        F.max("delay_s").cast("bigint").alias("max_s"),
    )


# ---------------------------------------------------------------------------
# q269 — sequential trigram motifs: the most frequent ADJACENT
# event-type triples across per-user timelines (q174's transition
# bigrams taken one step deeper) — one window pass with two leads,
# one count aggregate, totally-ordered top-20.
# ---------------------------------------------------------------------------
@query(
    "q269_event_trigrams",
    oracle="""
    WITH seq AS (
      SELECT event_type AS e1,
        LEAD(event_type, 1) OVER w AS e2,
        LEAD(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    )
    SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY e1, e2, e3
    ORDER BY n DESC, e1 ASC, e2 ASC, e3 ASC
    LIMIT 20
    """,
)
def q269_event_trigrams(spark, sf_dir):
    """Adjacent event-type triples per user timeline, top-20."""
    from pyspark.sql import Window

    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = e.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    return (
        seq.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(
            F.desc("n"), F.asc("e1"), F.asc("e2"), F.asc("e3")
        )
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q274 — inter-arrival time analysis per event type (the point-
# process readout): per-user lag deltas in one window pass, then
# exact-integer second diffs feed count / mean / exact median per
# type. Arrival intensity λ ≈ 1/mean.
# ---------------------------------------------------------------------------
@query(
    "q274_interarrival_times",
    oracle="""
    WITH d AS (
      SELECT event_type,
        CAST(date_diff('microsecond',
          LAG(ts) OVER (PARTITION BY user_id, event_type
                        ORDER BY ts ASC, event_id ASC),
          ts) AS BIGINT) // 1000000 AS dt
      FROM events
    )
    SELECT event_type,
      CAST(COUNT(*) AS BIGINT) AS n_gaps,
      CAST(ROUND(CAST(SUM(dt) AS DOUBLE) / COUNT(*), 4) AS DOUBLE)
        AS mean_gap_s,
      ROUND(quantile_cont(CAST(dt AS DOUBLE), 0.5), 4) AS median_gap_s
    FROM d WHERE dt IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type ASC
    """,
)
def q274_interarrival_times(spark, sf_dir):
    """Per-(user, type) inter-arrival gaps in seconds: count, mean,
    exact median per event type."""
    from pyspark.sql import Window

    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    # micros-diff on two NTZ values is pure value arithmetic —
    # timezone-independent (catalog.ts_micros_sql discipline) — and
    # the explicit integer division pins truncation semantics (the
    # engines' second-diffs disagree on sub-second components)
    d = e.select(
        "event_type",
        (
            F.timestamp_diff(
                "MICROSECOND", F.lag("ts").over(w), F.col("ts")
            ).cast("bigint")
            / F.lit(1000000)
        )
        .cast("bigint")
        .alias("_dt0"),
    )
    d = d.filter(F.col("_dt0").isNotNull()).select(
        "event_type", F.col("_dt0").alias("dt")
    )
    g = d
    return (
        g.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.round(
                F.sum("dt").cast("double") / F.count(F.lit(1)), 4
            )
            .cast("double")
            .alias("mean_gap_s"),
            F.round(
                F.expr("percentile(CAST(dt AS DOUBLE), 0.5)"), 4
            ).alias("median_gap_s"),
        )
        .orderBy(F.asc("event_type"))
    )
