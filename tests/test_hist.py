"""Mergeable log-bucket histograms: bounded-error range percentiles
and sum-merge exactness."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aden_hive_fork_spark.catalog import load_table
from aden_hive_fork_spark.operators.rollup import (
    HIST_GROWTH,
    _hist_bucket,
    _hour_bucket,
    hist_range_percentiles,
    materialize_value_hist,
)

SF = "/root/testdata/sf0.001"
LO, HI = "2024-01-01 00:00:00", "2024-01-03 00:00:00"


def test_range_percentiles_within_bucket_error(spark, tmp_path):
    events = load_table(spark, SF, "events")
    path = str(tmp_path / "hist")
    materialize_value_hist(events, path)
    got = {
        (r["event_type"], r["quantile"]): (r["est_value"], r["n_values"])
        for r in hist_range_percentiles(spark, path, LO, HI).collect()
    }
    in_range = events.filter(
        (F.col("ts") >= F.lit(LO).cast("timestamp_ntz"))
        & (F.col("ts") < F.lit(HI).cast("timestamp_ntz"))
    )
    vals = {}
    for r in in_range.select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    max_rel = math.sqrt(HIST_GROWTH) - 1  # geometric-midpoint bound
    assert got, "no percentile rows"
    for (etype, q), (est, n) in got.items():
        sorted_vals = sorted(vals[etype])
        assert n == len(sorted_vals)
        exact = sorted_vals[math.ceil(q * n) - 1]  # type-1 percentile
        assert abs(est / exact - 1) <= max_rel + 1e-9, (etype, q, est, exact)


def test_histogram_merge_is_sum(spark, tmp_path):
    """Two disjoint halves' histograms summed per (hour, type, bucket)
    equal the whole corpus's histogram — the property that makes
    range queries servable from partials."""
    events = load_table(spark, SF, "events")

    def hist_rows(df):
        return {
            (str(r["hour_start"]), r["event_type"], r["bucket"]): r["n"]
            for r in df.groupBy(
                _hour_bucket("ts").alias("hour_start"),
                "event_type",
                _hist_bucket("value").alias("bucket"),
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    whole = hist_rows(events)
    even = hist_rows(events.filter(F.col("event_id") % 2 == 0))
    odd = hist_rows(events.filter(F.col("event_id") % 2 == 1))
    merged: dict = {}
    for part in (even, odd):
        for k, n in part.items():
            merged[k] = merged.get(k, 0) + n
    assert merged == whole


def test_nonpositive_values_get_null_bucket(spark):
    df = spark.createDataFrame(
        [(0.0,), (-3.5,), (0.01,), (490.0,)], "value double"
    ).select(_hist_bucket("value").alias("b"))
    rows = [r["b"] for r in df.collect()]
    assert rows[0] is None and rows[1] is None
    assert isinstance(rows[2], int) and isinstance(rows[3], int)
    assert rows[2] < rows[3]