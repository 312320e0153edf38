"""Unit semantics for the round-7 statistics wave: Mann-Whitney U,
Benjamini-Hochberg FDR, Cohen's d / Hedges' g, CUSUM change-point —
hand-computed fixtures plus the window-free plan discipline."""

from __future__ import annotations

import math


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString().lower()


# ---------------------------------------------------------------------------
# Mann-Whitney U
# ---------------------------------------------------------------------------


def test_mann_whitney_no_ties_hand_value(spark):
    from aden_hive_fork_spark.operators.stats import mann_whitney_u

    rows = [(1.0, "a"), (2.0, "a"), (3.0, "a"),
            (4.0, "b"), (5.0, "b"), (6.0, "b")]
    df = spark.createDataFrame(rows, "v double, g string")
    r = mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    # ranks of a = 1,2,3 → U = 6 − 3·4/2 = 0
    assert r["n_a"] == 3 and r["n_b"] == 3
    assert r["u_stat"] == 0.0
    z = (0.0 - 4.5) / math.sqrt(9.0 / 12.0 * 7.0)
    assert math.isclose(r["z_score"], round(z, 6), abs_tol=1e-9)


def test_mann_whitney_tie_correction(spark):
    from aden_hive_fork_spark.operators.stats import mann_whitney_u

    rows = [(1.0, "a"), (1.0, "a"), (1.0, "b"), (2.0, "b")]
    df = spark.createDataFrame(rows, "v double, g string")
    r = mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    # avg rank of the tied 1.0s is 2 → ΣR_a = 4 → U = 1;
    # var = (4/12)·(5 − 24/12) = 1 → z = (1 − 2)/1 = −1
    assert r["u_stat"] == 1.0
    assert r["z_score"] == -1.0


def test_mann_whitney_all_tied_null_z(spark):
    from aden_hive_fork_spark.operators.stats import mann_whitney_u

    df = spark.createDataFrame(
        [(1.0, "a"), (1.0, "a"), (1.0, "b")], "v double, g string"
    )
    r = mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    assert r["z_score"] is None  # tie correction zeroes the variance


def test_mann_whitney_plan_has_no_window(spark):
    from aden_hive_fork_spark.operators.stats import mann_whitney_u

    df = spark.createDataFrame(
        [(float(i % 9), "a" if i % 2 == 0 else "b") for i in range(50)],
        "v double, g string",
    )
    assert "window" not in _plan(mann_whitney_u(df, "v", "g", "a", "b"))


# ---------------------------------------------------------------------------
# Benjamini-Hochberg
# ---------------------------------------------------------------------------


def test_bh_fdr_basic_rejections(spark):
    from aden_hive_fork_spark.operators.stats import bh_fdr

    df = spark.createDataFrame(
        [(1, 0.01), (2, 0.02), (3, 0.03), (4, 0.2)], "k bigint, p double"
    )
    got = {r["test_id"]: r for r in bh_fdr(df, "k", "p", 0.1).collect()}
    assert [got[i]["rejected"] for i in (1, 2, 3, 4)] == [
        True, True, True, False,
    ]
    assert got[3]["rank"] == 3
    assert math.isclose(got[4]["threshold"], 0.1)


def test_bh_fdr_step_up_rejects_above_own_threshold(spark):
    from aden_hive_fork_spark.operators.stats import bh_fdr

    # p=0.06 exceeds ITS threshold (0.05) but a later test passes
    # (0.07 ≤ 0.075), so the step-up rule rejects it anyway
    df = spark.createDataFrame(
        [(1, 0.01), (2, 0.06), (3, 0.07), (4, 0.2)], "k bigint, p double"
    )
    got = {r["test_id"]: r["rejected"]
           for r in bh_fdr(df, "k", "p", 0.1).collect()}
    assert got == {1: True, 2: True, 3: True, 4: False}


def test_bh_fdr_nothing_rejected_and_null_excluded(spark):
    import pytest

    from aden_hive_fork_spark.operators.stats import bh_fdr

    df = spark.createDataFrame(
        [(1, 0.9), (2, 0.95), (3, None)], "k bigint, p double"
    )
    rows = bh_fdr(df, "k", "p", 0.05).collect()
    assert len(rows) == 2  # NULL p dropped
    assert all(not r["rejected"] for r in rows)
    with pytest.raises(ValueError, match="alpha"):
        bh_fdr(df, "k", "p", 1.5)


def test_bh_fdr_plan_has_no_window(spark):
    from aden_hive_fork_spark.operators.stats import bh_fdr

    df = spark.createDataFrame(
        [(i, i / 100.0) for i in range(1, 40)], "k bigint, p double"
    )
    assert "window" not in _plan(bh_fdr(df, "k", "p", 0.1))


# ---------------------------------------------------------------------------
# effect sizes
# ---------------------------------------------------------------------------


def test_cohens_d_hand_value(spark):
    from aden_hive_fork_spark.operators.stats import cohens_d

    rows = [(1.0, "a"), (2.0, "a"), (3.0, "a"),
            (4.0, "b"), (6.0, "b"), (8.0, "b")]
    df = spark.createDataFrame(rows, "v double, g string")
    r = cohens_d(df, "v", "g").collect()
    assert len(r) == 1
    row = r[0]
    assert (row["group_a"], row["group_b"]) == ("a", "b")
    d = (2.0 - 6.0) / math.sqrt((2 * 1.0 + 2 * 4.0) / 4.0)
    assert math.isclose(row["d"], round(d, 6), abs_tol=1e-9)
    assert math.isclose(row["g"], round(d * 0.8, 6), abs_tol=1e-9)


def test_cohens_d_degenerate_group_null(spark):
    from aden_hive_fork_spark.operators.stats import cohens_d

    df = spark.createDataFrame(
        [(1.0, "a"), (2.0, "a"), (5.0, "b")], "v double, g string"
    )
    row = cohens_d(df, "v", "g").collect()[0]
    assert row["d"] is None and row["g"] is None  # n_b < 2


# ---------------------------------------------------------------------------
# CUSUM change-point
# ---------------------------------------------------------------------------


def test_cusum_level_shift_hand_value(spark):
    from aden_hive_fork_spark.operators.timeseries import cusum_changepoint

    rows = [(i, v) for i, v in enumerate([1.0, 1.0, 1.0, 5.0, 5.0], 1)]
    df = spark.createDataFrame(rows, "t bigint, v double")
    r = cusum_changepoint(df, "t", "v").collect()[0]
    # mean 2.6; cumulative deviations −1.6, −3.2, −4.8, −2.4, 0 →
    # peak |S| = 4.8 at position 3 (the last pre-shift point)
    assert r["n"] == 5
    assert r["cp_rank"] == 3 and r["cp_t"] == 3
    assert r["s_max"] == 4.8
    assert r["mean"] == 2.6


def test_cusum_flat_series_zero(spark):
    from aden_hive_fork_spark.operators.timeseries import cusum_changepoint

    df = spark.createDataFrame(
        [(i, 7.0) for i in range(1, 6)], "t bigint, v double"
    )
    r = cusum_changepoint(df, "t", "v").collect()[0]
    assert r["s_max"] == 0.0 and r["cp_rank"] == 1  # tie → first index


def test_cusum_plan_has_no_window(spark):
    from aden_hive_fork_spark.operators.timeseries import cusum_changepoint

    df = spark.createDataFrame(
        [(i, float(i % 13)) for i in range(100)], "t bigint, v double"
    )
    assert "window" not in _plan(cusum_changepoint(df, "t", "v"))
