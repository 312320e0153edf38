"""Event bus analog: filtered subscriptions, windows, sinks.

Reference event layer (core/framework/runtime/event_bus.py):
- publish/subscribe with conjunctive filters on type / stream_id /
  node_id / execution_id (:232-366, matching :327-349)
- bounded history + stats (:1017-1058)
- JSONL sink, one object per line (:39-56, :302-314)
- graph-scoped stamping (execution_stream.py:38-81)
- NO late/out-of-order handling (§2.C row 67) — the new engine adds
  watermarked event-time windows as capability parity.

Structured Streaming mapping: every subscription is a streaming
filter; windows are tumbling/sliding/session with watermark; sinks
are files (JSONL parity) or foreachBatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The reference AgentEvent shape (event_bus.py:139-162), ts = event time.
EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string, stream_id string, node_id string,"
    " execution_id string"
)


def read_event_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "json",
    schema: str = EVENT_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source event stream. New files in ``path`` are the
    micro-batches (the webhook/timer sources of the reference become
    producers appending here; Kafka swaps in transparently at scale).
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format(fmt).load(path)


def filtered_subscription(
    events: DataFrame,
    event_types: list[str] | None = None,
    stream_id: str | None = None,
    node_id: str | None = None,
    execution_id: str | None = None,
) -> DataFrame:
    """A subscription = conjunctive equality filters (reference
    event_bus.py:327-349). Several subscriptions = several filtered
    queries over one source stream."""
    df = events
    if event_types:
        df = df.filter(F.col("event_type").isin(event_types))
    if stream_id is not None:
        df = df.filter(F.col("stream_id") == stream_id)
    if node_id is not None:
        df = df.filter(F.col("node_id") == node_id)
    if execution_id is not None:
        df = df.filter(F.col("execution_id") == execution_id)
    return df


def tumbling_windows(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    group_extra: list[str] | None = None,
) -> DataFrame:
    """Watermarked tumbling event-time windows: count + value sum.
    The watermark bounds state: windows older than (max event time -
    watermark) finalize and evict — this is the late-data handling the
    reference lacks (§2.C row 67)."""
    groups = [F.window("ts", window).alias("win")] + [
        F.col(c) for c in (group_extra or ["event_type"])
    ]
    return (
        events.withWatermark("ts", watermark)
        .groupBy(*groups)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *[F.col(c) for c in (group_extra or ["event_type"])],
            "n_events",
            "total_value",
        )
    )


def sliding_windows(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding windows (overlapping) per event type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Per-user session windows with an inactivity gap — the streaming
    twin of the batch sessionization query (suite q24)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def event_stats_stream(events: DataFrame) -> DataFrame:
    """get_stats as a continuously-updated aggregate (count by type,
    event_bus.py:1048-1058). Complete-mode query."""
    return events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))


def stamp_graph_id(events: DataFrame, graph_id: str) -> DataFrame:
    """GraphScopedEventBus.publish stamps graph_id
    (execution_stream.py:38-81)."""
    return events.withColumn("graph_id", F.lit(graph_id))


def await_event(
    events: DataFrame,
    timeout_sec: float,
    sink_table: str = "_await_event",
    max_rows: int = 100,
    **filters,
) -> list:
    """wait_for analog (§2.C row 62, event_bus.py:1062-1115): block
    until a matching event arrives on the stream or the timeout
    elapses; returns the matched rows (possibly empty, capped at
    ``max_rows``). Implemented as a filtered streaming query into a
    memory sink polled by the driver; the poll is LIMIT-bounded and the
    query stops at the first match, so a high-rate matching stream
    never accumulates more than one poll interval of rows driver-side."""
    import time as _time

    sub = filtered_subscription(events, **filters)
    q = (
        sub.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("append")
        .start()
    )
    spark = events.sparkSession
    deadline = _time.monotonic() + timeout_sec
    try:
        while _time.monotonic() < deadline:
            rows = spark.sql(
                f"SELECT * FROM {sink_table} LIMIT {int(max_rows)}"
            ).collect()
            if rows:
                return rows
            _time.sleep(0.2)
        return []
    finally:
        q.stop()


def write_jsonl_sink(
    events: DataFrame, path: str, checkpoint: str, trigger_once: bool = True
):
    """JSONL sink parity (event_bus.py:302-314): one JSON object per
    line, append-only, exactly-once via the streaming checkpoint."""
    writer = (
        events.writeStream.format("json")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_stream(
    events: DataFrame,
    key_cols: list[str] | None = None,
    watermark_delay: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup: at-least-once input → exactly-once events.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until
    the watermark passes the key's event time, so state is bounded by
    (keys arriving within the delay window), not the stream's history —
    the property that makes streaming dedup viable on an unbounded
    100 TB event log. Redelivered events (same key, any event time
    within the delay) are suppressed across micro-batches.

    The reference's bus has no dedup (a redelivered webhook double-
    fires — absence noted in SURVEY.md §2.C); this is capability-parity
    plus, same spirit as row 67's watermarks.
    """
    key_cols = key_cols or ["event_id"]
    return events.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        key_cols
    )
