"""Hypertable-style continuous aggregate (hourly rollup) over events.

The classic time-series warehouse pattern (TimescaleDB continuous
aggregates, druid/pinot rollup segments — public designs): maintain an
hourly pre-aggregate partitioned by date; answer wide time-range
aggregations from the rollup (hours × types ≪ raw events) and touch
raw data only for the partial-hour edges of the requested range.

At 100 TB this converts "scan a month of events" into "scan 720
rollup rows per group + two partial hours of raw" — the rollup table
is date-partitioned so the read is partition-pruned on both sides.

All rollup aggregates are decomposable (COUNT/SUM on decimal): merging
hourly partials is exact, so rollup-served answers are bit-identical
to raw scans (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"
_HOUR_US = 3_600_000_000


def _hour_bucket(ts_col: str = "ts") -> F.Column:
    """NTZ-pure hour truncation (timezone-independent)."""
    return F.expr(
        f"timestampadd(HOUR, timestampdiff(HOUR, {_EPOCH}, `{ts_col}`), {_EPOCH})"
    )


def materialize_rollup(events: DataFrame, path: str) -> None:
    """Write the hourly rollup: one row per (hour, event_type) with
    decomposable partials, partitioned by event date for pruning.
    Re-running refreshes idempotently (overwrite by partition dir)."""
    rollup = (
        events.groupBy(
            _hour_bucket("ts").alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users_hour"),
            F.hll_sketch_agg("user_id").alias("users_hll"),
        )
        .withColumn("event_date", F.to_date("hour_start"))
    )
    rollup.write.mode("overwrite").partitionBy("event_date").parquet(path)


def rollup_range_agg(
    spark: SparkSession,
    events: DataFrame,
    rollup_path: str,
    lo_iso: str,
    hi_iso: str,
) -> DataFrame:
    """COUNT/SUM per event_type over [lo, hi): whole hours served from
    the rollup, partial edge hours from the raw table, merged exactly.

    n_users is intentionally NOT served this way — exact
    COUNT(DISTINCT) is not decomposable from per-hour partials. The
    rollup stores per-hour exact counts for per-hour queries, plus a
    mergeable HLL sketch per hour: ``rollup_range_users`` unions the
    sketches for an estimated range-wide distinct count (the sketch IS
    the decomposable form — see rollup_range_users).
    """
    lo = F.lit(lo_iso).cast("timestamp_ntz")
    hi = F.lit(hi_iso).cast("timestamp_ntz")
    lo_hour_end = F.least(
        F.expr(
            f"timestampadd(HOUR, timestampdiff(HOUR, {_EPOCH},"
            f" timestampadd(MICROSECOND, {_HOUR_US - 1},"
            f" CAST('{lo_iso}' AS TIMESTAMP_NTZ))), {_EPOCH})"
        ),
        hi,
    )  # lo rounded UP to the next hour boundary, clamped to hi
    hi_hour_start = F.greatest(
        F.expr(
            f"timestampadd(HOUR, timestampdiff(HOUR, {_EPOCH},"
            f" CAST('{hi_iso}' AS TIMESTAMP_NTZ)), {_EPOCH})"
        ),
        lo,
    )  # hi rounded DOWN, clamped to lo (sub-hour ranges never escape)

    rollup = spark.read.parquet(rollup_path).filter(
        (F.col("hour_start") >= lo_hour_end) & (F.col("hour_start") < hi_hour_start)
    )
    from_rollup = rollup.select(
        "event_type", "n_events", F.col("sum_value").alias("sv")
    )
    raw_edges = (
        events.filter(
            ((F.col("ts") >= lo) & (F.col("ts") < lo_hour_end))
            | ((F.col("ts") >= hi_hour_start) & (F.col("ts") < hi))
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
        )
    )
    return (
        from_rollup.unionByName(raw_edges)
        .groupBy("event_type")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.round(F.sum("sv"), 2).cast("double").alias("total_value"),
        )
        .orderBy("event_type")
    )


def rollup_range_users(
    spark: SparkSession,
    rollup_path: str,
    lo_hour_iso: str,
    hi_hour_iso: str,
) -> DataFrame:
    """Estimated distinct users per event_type over whole hours
    [lo, hi): merge the per-hour HLL sketches (hll_union_agg) and
    estimate once — the decomposable answer to the COUNT(DISTINCT)
    rollup gap. Approximate by construction (declared non-oracle);
    relative error is the standard HLL ~1.6% at lgConfigK=12.
    """
    rollup = spark.read.parquet(rollup_path).filter(
        (F.col("hour_start") >= F.lit(lo_hour_iso).cast("timestamp_ntz"))
        & (F.col("hour_start") < F.lit(hi_hour_iso).cast("timestamp_ntz"))
    )
    return (
        rollup.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("users_hll"))
            .cast("bigint")
            .alias("est_users"),
            F.sum("n_events").cast("bigint").alias("n_events"),
        )
        .orderBy("event_type")
    )
