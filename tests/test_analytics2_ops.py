"""EWMA, rolling z-score, quantile scores, winsorized stats, touch
attribution — unit-level semantics (suite q160-q164 covers the
cross-engine hash contract)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_ewma_matches_hand_recursion(spark):
    from aden_hive_fork_spark.operators.timeseries import ewma

    rows = [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0),
            ("b", 1, 5.0)]
    df = spark.createDataFrame(rows, "k string, t int, x double")
    got = {r["k"]: (r["n_obs"], r["ewma_level"]) for r in
           ewma(df, ["k"], "t", "x", alpha=0.5).collect()}
    # a: y0=10, y1=.5*20+.5*10=15, y2=.5*30+.5*15=22.5
    assert got["a"] == (3, 22.5)
    assert got["b"] == (1, 5.0)


def test_ewma_order_independent_of_input_partitioning(spark):
    from aden_hive_fork_spark.operators.timeseries import ewma

    rows = [("k", i, float((i * 13) % 97)) for i in range(200)]
    import random

    random.Random(3).shuffle(rows)
    a = spark.createDataFrame(rows, "k string, t int, x double").repartition(7)
    b = spark.createDataFrame(list(reversed(rows)),
                              "k string, t int, x double").repartition(2)
    va = ewma(a, ["k"], "t", "x").collect()[0]["ewma_level"]
    vb = ewma(b, ["k"], "t", "x").collect()[0]["ewma_level"]
    assert va == vb


def test_rolling_zscore_flags_spike_only_with_full_window(spark):
    from aden_hive_fork_spark.operators.timeseries import rolling_zscore

    # 9 flat values then a spike: window=5 → spike z is large; early
    # rows lack a full window and must never be flagged
    rows = [("k", i, 100.0) for i in range(9)] + [("k", 9, 500.0)]
    df = spark.createDataFrame(rows, "k string, t int, x double")
    out = rolling_zscore(df, ["k"], "t", "x", window=5, z_threshold=1.9)
    got = out.collect()
    assert [(r["t"], r["x"]) for r in got] == [(9, 500.0)]
    assert got[0]["z"] == 2.0  # mean 180, popstd 160 → (500-180)/160


def test_quantile_scores_bins_and_nulls(spark):
    from aden_hive_fork_spark.operators.quality import quantile_scores

    rows = [(float(i),) for i in range(1, 101)] + [(None,)]
    df = spark.createDataFrame(rows, "v double")
    out = quantile_scores(df, ["v"], n_bins=5)
    got = dict((r["v"], r["v_score"]) for r in out.collect())
    assert got[1.0] == 1 and got[100.0] == 5
    assert got[50.0] == 3 and got[61.0] == 4
    assert got[None] is None
    # ~20 rows per bin
    from collections import Counter

    c = Counter(v for k, v in got.items() if k is not None)
    assert all(18 <= n <= 22 for n in c.values())


def test_winsorized_stats_clamps_tails(spark):
    from aden_hive_fork_spark.operators.quality import winsorized_stats

    rows = [("g", float(i)) for i in range(1, 100)] + [("g", 1e9)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = winsorized_stats(df, "v", ["g"], lower=0.0, upper=0.9).collect()[0]
    assert r["n"] == 100
    assert r["hi_cap"] < 1000        # the 1e9 outlier got capped
    assert r["w_mean"] < 100


def test_touch_attribution_first_vs_last(spark):
    from aden_hive_fork_spark.operators.attribution import touch_attribution

    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        # user 1: view → click → purchase  (first=view, last=click)
        (1, ts(0), 1, "view"), (2, ts(5), 1, "click"),
        (3, ts(10), 1, "purchase"),
        # user 2: click 8 days before purchase → outside lookback
        (4, t0 - dt.timedelta(days=8), 2, "click"),
        (5, ts(0), 2, "purchase"),
        # user 3: two touches same ts → event_id breaks the tie
        (6, ts(0), 3, "view"), (7, ts(0), 3, "click"),
        (8, ts(1), 3, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp_ntz, user_id bigint,"
        " event_type string"
    )
    got = {r["channel"]: (r["n_first_touch"], r["n_last_touch"])
           for r in touch_attribution(df).collect()}
    # user1: first view / last click; user3: first view(id6) / last click(id7)
    assert got["view"] == (2, 0)
    assert got["click"] == (0, 2)


def test_bfs_hops_min_distance_and_bound(spark):
    from aden_hive_fork_spark.operators.graph_rank import bfs_hops

    # chain 1-2-3-4-5 plus a shortcut 1-4
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4)], "src bigint, dst bigint"
    )
    und = edges.union(edges.selectExpr("dst as src", "src as dst"))
    seeds = spark.createDataFrame([(1,)], "id bigint")
    got = {r["id"]: r["hops"] for r in
           bfs_hops(und, seeds, max_hops=10).collect()}
    assert got == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2}  # shortcut wins
    # bounded: max_hops=1 reaches only direct neighbors
    got1 = {r["id"]: r["hops"] for r in
            bfs_hops(und, seeds, max_hops=1).collect()}
    assert got1 == {1: 0, 2: 1, 4: 1}


def test_bfs_hops_multi_source_and_isolated_seed(spark):
    from aden_hive_fork_spark.operators.graph_rank import bfs_hops

    edges = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    seeds = spark.createDataFrame([(2,), (99,)], "id bigint")  # 99 isolated
    got = {r["id"]: r["hops"] for r in
           bfs_hops(edges, seeds, max_hops=3).collect()}
    assert got == {2: 0, 99: 0}  # directed: 2 has no outgoing edge


def test_l_diversity_homogeneous_class_flagged(spark):
    from aden_hive_fork_spark.operators.pii import l_diversity_report

    rows = [("a", 1, "x"), ("a", 1, "y"), ("a", 1, "z"),
            ("b", 2, "x"), ("b", 2, "x")]   # class (b,2): 1 distinct
    df = spark.createDataFrame(rows, "q1 string, q2 int, sens string")
    r = l_diversity_report(df, ["q1", "q2"], "sens", l=2).collect()[0]
    assert r["n_rows"] == 5 and r["n_classes"] == 2
    assert r["min_diversity"] == 1
    assert r["n_weak_classes"] == 1 and r["exposed_rows"] == 2
    assert r["exposed_frac"] == 0.4


def test_holt_matches_hand_recursion(spark):
    from aden_hive_fork_spark.operators.timeseries import holt

    xs = [10.0, 12.0, 11.0, 15.0, 18.0]
    a, b = 0.3, 0.1
    l, bb = xs[0], xs[1] - xs[0]
    for x in xs[1:]:
        ln = a * x + (1.0 - a) * (l + bb)
        bn = b * (ln - l) + (1.0 - b) * bb
        l, bb = ln, bn
    df = spark.createDataFrame(
        [("k", i, x) for i, x in enumerate(xs)] + [("solo", 0, 1.0)],
        "k string, t int, x double",
    )
    rows = holt(df, ["k"], "t", "x", alpha=a, beta=b).collect()
    assert len(rows) == 1  # <2 observations -> dropped
    r = rows[0]
    assert r["level"] == round(l, 6)
    assert r["trend"] == round(bb, 6)
    assert r["forecast_1"] == round(l + bb, 6)


def test_holt_tracks_linear_trend(spark):
    from aden_hive_fork_spark.operators.timeseries import holt

    df = spark.createDataFrame(
        [("k", i, 100.0 + 5.0 * i) for i in range(50)],
        "k string, t int, x double",
    )
    r = holt(df, ["k"], "t", "x").collect()[0]
    # a perfectly linear series: level = last value, trend = slope
    assert abs(r["level"] - 345.0) < 1e-6
    assert abs(r["trend"] - 5.0) < 1e-6
    assert abs(r["forecast_1"] - 350.0) < 1e-6


def test_cusum_detects_mean_shift(spark):
    from aden_hive_fork_spark.operators.timeseries import cusum

    # 40 points around 100, then 40 points around 130 — a real shift
    rows = [("s", i, 100.0 + (i % 5)) for i in range(40)]
    rows += [("s", 40 + i, 130.0 + (i % 5)) for i in range(40)]
    # control: stationary series
    rows += [("c", i, 100.0 + (i % 5)) for i in range(80)]
    df = spark.createDataFrame(rows, "k string, t int, x double")
    got = {r["k"]: r for r in
           cusum(df, ["k"], "t", "x", slack_sigmas=0.5,
                 threshold_sigmas=4.0).collect()}
    assert got["s"]["shift_detected"] is True
    assert got["c"]["shift_detected"] is False
    assert got["s"]["max_pos"] > got["c"]["max_pos"]
    assert got["s"]["n_obs"] == 80
