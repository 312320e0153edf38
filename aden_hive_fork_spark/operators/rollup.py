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

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"
_HOUR_US = 3_600_000_000


def _hour_bucket(ts_col: str = "ts") -> F.Column:
    """NTZ-pure hour truncation (timezone-independent)."""
    return F.expr(
        f"timestampadd(HOUR, timestampdiff(HOUR, {_EPOCH}, `{ts_col}`), {_EPOCH})"
    )


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    """Resolve a rollup store to a DataFrame. A streaming-maintained
    store is versioned (``_current.json`` pointer + immutable ``v=<n>``
    generations — see streaming/rollup_stream.py): resolve the pointer
    and read that generation. A batch-materialized store (plain
    partitioned parquet, no pointer) reads directly — both write paths
    share this one read path, and partition pruning on event_date works
    identically in both layouts."""
    from .layout import read_pointer

    import os

    ptr = read_pointer(rollup_path)
    if ptr.get("path"):
        vdir = os.path.join(rollup_path, ptr["path"])
        return spark.read.option("basePath", vdir).parquet(vdir)
    return spark.read.parquet(rollup_path)


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

    rollup = read_rollup(spark, rollup_path).filter(
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


# ---------------------------------------------------------------------------
# Mergeable percentile sketch: per-hour LOG-BUCKET HISTOGRAMS.
#
# percentile_approx is per-group only — two groups' digests cannot be
# merged SQL-side, so it cannot serve range queries from hourly
# partials. A log-bucketed histogram CAN (HdrHistogram / Prometheus
# native-histogram public design): counts are plain rows, merging is
# SUM over (event_type, bucket), and the estimate's RELATIVE error is
# bounded by the bucket growth factor: value v lands in bucket
# floor(log_g(v)), the estimate is the bucket's geometric midpoint
# g^(b+0.5), so est/true ∈ (g^-1/2, g^1/2] — ≤ ~2.5% at g=1.05 —
# regardless of how many hours were merged.
# ---------------------------------------------------------------------------
HIST_GROWTH = 1.05


def _hist_bucket(value_col: str, growth: float = HIST_GROWTH) -> F.Column:
    """Log-bucket index (positive values; non-positive → NULL bucket,
    counted separately by callers that need them)."""
    v = F.col(value_col).cast("double")
    return F.when(v > 0, F.floor(F.log(v) / math.log(growth)).cast("int"))


def materialize_value_hist(events: DataFrame, path: str) -> None:
    """Hourly value histogram: one row per (hour, event_type, bucket),
    date-partitioned like the main rollup. Mergeable by construction —
    any time range's histogram is a SUM over its hours' rows."""
    hist = (
        events.groupBy(
            _hour_bucket("ts").alias("hour_start"),
            "event_type",
            _hist_bucket("value").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("event_date", F.to_date("hour_start"))
    )
    hist.write.mode("overwrite").partitionBy("event_date").parquet(path)


def hist_range_percentiles(
    spark: SparkSession,
    hist_path: str,
    lo_hour_iso: str,
    hi_hour_iso: str,
    quantiles: tuple[float, ...] = (0.5, 0.95),
    growth: float = HIST_GROWTH,
) -> DataFrame:
    """Approximate per-type percentiles over whole hours [lo, hi),
    served ENTIRELY from merged hourly histograms: sum counts per
    (type, bucket), cumulative-sum in bucket order, take the first
    bucket whose cumulative count reaches ceil(q·total) (the type-1
    empirical percentile's bucket), estimate its geometric midpoint.
    Returns (event_type, quantile, est_value, n_values) — declared
    approximate (relative error ≤ g^1/2 − 1)."""
    from pyspark.sql import Window

    hist = spark.read.parquet(hist_path).filter(
        (F.col("hour_start") >= F.lit(lo_hour_iso).cast("timestamp_ntz"))
        & (F.col("hour_start") < F.lit(hi_hour_iso).cast("timestamp_ntz"))
        & F.col("bucket").isNotNull()
    )
    merged = hist.groupBy("event_type", "bucket").agg(F.sum("n").alias("n"))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cum = merged.withColumn("cum", F.sum("n").over(w_cum)).withColumn(
        "total", F.sum("n").over(w_all)
    )
    picks = []
    for q in quantiles:
        k = F.ceil(F.lit(q) * F.col("total"))
        picks.append(
            cum.filter(F.col("cum") >= k)
            .groupBy("event_type")
            .agg(F.min("bucket").alias("bucket"), F.max("total").alias("n_values"))
            .withColumn("quantile", F.lit(q))
        )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    est = F.pow(F.lit(growth), F.col("bucket") + F.lit(0.5))
    return out.select(
        "event_type",
        "quantile",
        est.alias("est_value"),
        "n_values",
    ).orderBy("event_type", "quantile")


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
    rollup = read_rollup(spark, rollup_path).filter(
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
