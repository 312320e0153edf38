"""Deterministic distributed logistic regression."""

from __future__ import annotations

from pyspark.sql import functions as F

from aden_hive_fork_spark.operators.logreg import logreg_fit, logreg_score


def test_logreg_learns_separable_data(spark):
    rows = [(float(i) / 10.0, 1.0 if i > 50 else 0.0) for i in range(101)]
    df = spark.createDataFrame(rows, "x double, y double")
    w = logreg_fit(df, ["x"], "y", n_iter=50, lr=1.0)
    scored = logreg_score(df, ["x"], w)
    acc = scored.agg(
        F.avg(
            F.when(
                (F.col("prob") >= 0.5).cast("double") == F.col("y"), 1.0
            ).otherwise(0.0)
        )
    ).collect()[0][0]
    assert acc > 0.9
    assert w[1] > 0  # positive slope on the separating feature


def test_logreg_invariant_to_partitioning(spark):
    rows = [(float((i * 7) % 50) / 10.0, float(i % 2)) for i in range(500)]
    a = spark.createDataFrame(rows, "x double, y double").repartition(3)
    b = spark.createDataFrame(list(reversed(rows)),
                              "x double, y double").repartition(23)
    assert logreg_fit(a, ["x"], "y") == logreg_fit(b, ["x"], "y")


def test_logreg_score_plan_is_mapside(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    plan = (
        logreg_score(df, ["x"], [0.1, 0.2])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "exchange" not in plan.lower()
    assert "join" not in plan.lower()
