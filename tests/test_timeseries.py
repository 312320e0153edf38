"""Gap-filling tests: hand-computed LOCF series, fill modes, leading
gaps, and the shared-partitioning plan guard."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from aden_hive_fork_spark.operators.timeseries import gapfill


def ts(s):
    return datetime.fromisoformat(s)


OBSERVED = [
    ("a", ts("2024-01-01T01:00:00"), 10.0),
    ("a", ts("2024-01-01T03:00:00"), 30.0),
    ("b", ts("2024-01-01T00:00:00"), 5.0),
]
SPAN = dict(start="2024-01-01 00:00:00", end="2024-01-01 03:00:00",
            step="1 hour")


def observed_df(spark):
    return spark.createDataFrame(
        OBSERVED, "k string, bucket timestamp, v double"
    )


def test_gapfill_locf_hand_example(spark):
    out = sorted(
        gapfill(observed_df(spark), "k", "bucket", "v",
                fill="locf", **SPAN).collect(),
        key=lambda r: (r["k"], r["bucket"]),
    )
    got = [(r["k"], r["bucket"].hour, r["v"], r["filled"]) for r in out]
    assert got == [
        ("a", 0, None, True),    # leading gap stays NULL
        ("a", 1, 10.0, False),
        ("a", 2, 10.0, True),    # carried forward
        ("a", 3, 30.0, False),
        ("b", 0, 5.0, False),
        ("b", 1, 5.0, True),
        ("b", 2, 5.0, True),
        ("b", 3, 5.0, True),
    ]


def test_gapfill_zero_and_null_modes(spark):
    zero = {
        (r["k"], r["bucket"].hour): r["v"]
        for r in gapfill(observed_df(spark), "k", "bucket", "v",
                         fill="zero", **SPAN).collect()
    }
    assert zero[("a", 0)] == 0.0 and zero[("a", 2)] == 0.0
    assert zero[("a", 1)] == 10.0
    dense = {
        (r["k"], r["bucket"].hour): r["v"]
        for r in gapfill(observed_df(spark), "k", "bucket", "v",
                         fill="null", **SPAN).collect()
    }
    assert dense[("a", 0)] is None and dense[("a", 1)] == 10.0
    with pytest.raises(ValueError):
        gapfill(observed_df(spark), "k", "bucket", "v",
                fill="bogus", **SPAN)


def test_gapfill_grid_cardinality(spark):
    out = gapfill(observed_df(spark), "k", "bucket", "v",
                  fill="locf", **SPAN)
    assert out.count() == 2 * 4  # keys x buckets, dense
    # observed values never flagged as filled
    obs = out.filter(~F.col("filled")).count()
    assert obs == len(OBSERVED)


def test_gapfill_interpolate(spark):
    rows = [
        ("a", ts("2024-01-01T00:00:00"), 10.0),
        ("a", ts("2024-01-01T03:00:00"), 40.0),   # 3h gap: 20, 30
        ("b", ts("2024-01-01T01:00:00"), 7.0),    # single obs
    ]
    df = spark.createDataFrame(rows, "k string, bucket timestamp, v double")
    out = {
        (r["k"], r["bucket"].hour): (r["v"], r["filled"])
        for r in gapfill(df, "k", "bucket", "v",
                         fill="interpolate", **SPAN).collect()
    }
    assert out[("a", 0)] == (10.0, False)
    assert out[("a", 1)] == (20.0, True)   # linear between 10 and 40
    assert out[("a", 2)] == (30.0, True)
    assert out[("a", 3)] == (40.0, False)
    # no surrounding pair → stays NULL (leading + trailing gaps)
    assert out[("b", 0)] == (None, True)
    assert out[("b", 1)] == (7.0, False)
    assert out[("b", 2)] == (None, True)
    assert out[("b", 3)] == (None, True)
