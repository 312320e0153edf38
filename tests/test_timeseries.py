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


def _hw_model(xs, m, a, b, g):
    l = sum(xs[:m]) / m
    bb = (sum(xs[m:2 * m]) / m - sum(xs[:m]) / m) / m
    sv = [x - l for x in xs[:m]]
    for x in xs[m:]:
        su = sv[0]
        lnew = a * (x - su) + (1 - a) * (l + bb)
        bb = b * (lnew - l) + (1 - b) * bb
        sv = sv[1:] + [g * (x - lnew) + (1 - g) * su]
        l = lnew
    return l, bb, sv


def test_holt_winters_matches_python_model(spark):
    from aden_hive_fork_spark.operators.timeseries import holt_winters

    # 3 weekly seasons with trend + a fixed weekday profile
    profile = [5.0, -3.0, 0.0, 2.0, -1.0, 4.0, -7.0]
    xs = [100.0 + 2.0 * t + profile[t % 7] for t in range(21)]
    df = spark.createDataFrame(
        [("k", t, x) for t, x in enumerate(xs)],
        "k string, t int, v double",
    )
    row = holt_winters(
        df, ["k"], "t", "v", period=7, alpha=0.3, beta=0.1, gamma=0.2,
        horizon=3,
    ).collect()[0]
    l, b, sv = _hw_model(xs, 7, 0.3, 0.1, 0.2)
    assert row["n_obs"] == 21
    assert row["level"] == pytest.approx(round(l, 4))
    assert row["trend"] == pytest.approx(round(b, 4))
    assert row["seasonal_next"] == pytest.approx(round(sv[0], 4))
    assert row["fc_1"] == pytest.approx(round(l + b + sv[0], 4))
    assert row["fc_3"] == pytest.approx(round(l + 3 * b + sv[2], 4))
    # with a clean seasonal+trend signal the 1-step forecast tracks
    # the true next point (x_21 = 147) up to the lag a low-beta
    # smoother carries on a steep trend (~5 here after 3 seasons)
    assert abs(row["fc_1"] - (100.0 + 2.0 * 21 + profile[0])) < 8.0


def test_holt_winters_drops_short_series_and_validates(spark):
    from aden_hive_fork_spark.operators.timeseries import holt_winters

    df = spark.createDataFrame(
        [("k", t, float(t)) for t in range(10)], "k string, t int, v double"
    )
    assert holt_winters(df, ["k"], "t", "v", period=7).count() == 0
    with pytest.raises(ValueError):
        holt_winters(df, ["k"], "t", "v", period=7, horizon=9)
    with pytest.raises(ValueError):
        holt_winters(df, ["k"], "t", "v", period=1)
