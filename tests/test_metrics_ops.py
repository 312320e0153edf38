"""Classifier-eval metrics, PSI drift, bootstrap uplift — unit
semantics against hand values (suite q251-q255 covers the
cross-engine hash contract)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _scored(spark, rows):
    return spark.createDataFrame(rows, "s double, y boolean")


def test_roc_auc_perfect_and_random(spark):
    from aden_hive_fork_spark.operators.metrics import roc_auc

    perfect = _scored(
        spark, [(0.1, False), (0.2, False), (0.8, True), (0.9, True)]
    )
    r = roc_auc(perfect, "s", "y").collect()[0]
    assert (r["n_pos"], r["n_neg"], r["auc"]) == (2, 2, 1.0)
    inverted = _scored(
        spark, [(0.9, False), (0.8, False), (0.2, True), (0.1, True)]
    )
    assert roc_auc(inverted, "s", "y").collect()[0]["auc"] == 0.0


def test_roc_auc_ties_average_ranks(spark):
    from aden_hive_fork_spark.operators.metrics import roc_auc

    # one tie straddling the classes: sklearn roc_auc_score gives 0.875
    df = _scored(
        spark, [(0.1, False), (0.5, False), (0.5, True), (0.9, True)]
    )
    assert roc_auc(df, "s", "y").collect()[0]["auc"] == 0.875


def test_roc_auc_null_on_single_class(spark):
    from aden_hive_fork_spark.operators.metrics import roc_auc

    df = _scored(spark, [(0.1, True), (0.9, True)])
    assert roc_auc(df, "s", "y").collect()[0]["auc"] is None


def test_log_loss_hand_value_and_partition_stability(spark):
    from aden_hive_fork_spark.operators.metrics import log_loss

    rows = [(0.9, True), (0.2, False), (0.7, True), (0.4, False)]
    df = _scored(spark, rows)
    expect = -sum(
        math.log(p) if y else math.log(1 - p) for p, y in rows
    ) / len(rows)
    r = log_loss(df, "s", "y").collect()[0]
    assert abs(r["logloss"] - expect) < 1e-6
    r2 = log_loss(df.repartition(7), "s", "y").collect()[0]
    assert r["logloss"] == r2["logloss"]


def test_pr_at_thresholds_hand_counts(spark):
    from aden_hive_fork_spark.operators.metrics import pr_at_thresholds

    rows = [(0.9, True), (0.8, False), (0.6, True), (0.3, False), (0.2, True)]
    df = _scored(spark, rows)
    out = {
        r["threshold"]: r
        for r in pr_at_thresholds(df, "s", "y", [0.5, 0.95]).collect()
    }
    r5 = out[0.5]
    assert (r5["tp"], r5["fp"], r5["fn"]) == (2, 1, 1)
    assert abs(r5["precision"] - 2 / 3) < 1e-6
    assert abs(r5["recall"] - 2 / 3) < 1e-6
    r95 = out[0.95]
    assert (r95["tp"], r95["fp"], r95["fn"]) == (0, 0, 3)
    assert r95["precision"] is None and r95["recall"] == 0.0


def test_calibration_bins_perfectly_calibrated(spark):
    from aden_hive_fork_spark.operators.metrics import calibration_bins

    # score 0.25 -> 25% positive, score 0.75 -> 75% positive
    rows = [(0.25, i % 4 == 0) for i in range(40)] + [
        (0.75, i % 4 != 0) for i in range(40)
    ]
    df = _scored(spark, rows)
    out = calibration_bins(df, "s", "y", n_bins=2).collect()
    for r in out:
        assert abs(r["mean_score"] - r["pos_rate"]) < 1e-9


def test_psi_drift_identical_distributions_zero(spark):
    from aden_hive_fork_spark.operators.quality import psi_drift

    rows = [("ref", float(i % 50)) for i in range(500)] + [
        ("cur", float(i % 50)) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "per string, v double")
    out = psi_drift(df, "v", "per", "ref", "cur", n_bins=5).collect()
    assert all(r["psi"] == 0.0 for r in out)
    assert all(abs(r["p"] - r["q"]) < 1e-9 for r in out)


def test_psi_drift_detects_shift(spark):
    from aden_hive_fork_spark.operators.quality import psi_drift

    rows = [("ref", float(i % 100)) for i in range(1000)] + [
        ("cur", float(50 + i % 100)) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "per string, v double")
    out = psi_drift(df, "v", "per", "ref", "cur", n_bins=10).collect()
    assert out[0]["psi"] > 0.25  # a half-range shift is a big drift


def test_bootstrap_diff_ci_brackets_true_uplift(spark):
    from aden_hive_fork_spark.operators.bootstrap import (
        poisson_bootstrap_diff_ci,
    )

    rows = [(i, "a", 100.0 + (i * 13) % 20) for i in range(300)] + [
        (i + 1000, "b", 90.0 + (i * 7) % 20) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id bigint, arm string, x double")
    r = poisson_bootstrap_diff_ci(
        df, "id", "x", "arm", "a", "b", replicates=41
    ).collect()[0]
    assert r["n_a"] == 300 and r["n_b"] == 300
    assert r["ci_lo"] <= r["diff"] <= r["ci_hi"]
    assert r["diff"] > 5.0  # true uplift is ~10
    assert r["ci_lo"] > 0.0  # clearly separated arms
