"""Data-quality operator tests: profile stats on dirty data, every
constraint kind incl. 3VL null conventions, uniqueness accounting,
and the single-job profile plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aden_hive_fork_spark.operators.quality import (
    check_constraints,
    in_range,
    in_set,
    matches,
    min_fraction,
    not_null,
    profile_table,
    unique,
)

DIRTY = [
    (1, 10.0, "a@x.com", "O"),
    (2, -5.0, "bad-email", "O"),
    (2, 120.0, None, "Z"),
    (None, 50.0, "c@x.com", "F"),
]
SCHEMA = "id bigint, amount double, email string, status string"


def dirty_df(spark):
    return spark.createDataFrame(DIRTY, SCHEMA)


def test_profile_table_stats(spark):
    prof = {r["column"]: r.asDict()
            for r in profile_table(dirty_df(spark)).collect()}
    assert set(prof) == {"id", "amount", "email", "status"}
    assert prof["id"]["n_rows"] == 4
    assert prof["id"]["n_nulls"] == 1
    assert prof["id"]["null_frac"] == 0.25
    assert prof["id"]["n_distinct"] == 2  # 1, 2 (nulls not counted)
    assert prof["id"]["min_value"] == "1" and prof["id"]["max_value"] == "2"
    assert prof["amount"]["mean_value"] == 43.75
    assert prof["email"]["mean_value"] is None  # non-numeric
    assert prof["status"]["n_distinct"] == 3


def test_check_constraints_kinds(spark):
    report = {r["rule"]: r.asDict() for r in check_constraints(
        dirty_df(spark),
        [
            not_null("id"),
            unique("id"),
            in_range("amount", 0, 100),
            matches("email", r"^[^@]+@[^@]+$"),
            in_set("status", ["O", "F"]),
            min_fraction("amount", F.col("amount") > 0, 0.5,
                         name="mostly_positive"),
        ],
    ).collect()}
    nn = report["not_null(id)"]
    assert not nn["passed"] and nn["n_violations"] == 1
    uq = report["unique(id)"]
    assert not uq["passed"]
    assert uq["n_violations"] == 2   # both rows of the duplicated key
    assert uq["metric"] == 1.0       # one duplicated key
    rng = report["in_range(amount,0,100)"]
    assert rng["n_violations"] == 2  # -5 and 120
    # NULL email is NOT a regex violation (3VL: unknown, not invalid)
    assert report["matches(email)"]["n_violations"] == 1
    assert report["in_set(status)"]["n_violations"] == 1  # 'Z'
    mf = report["mostly_positive"]
    assert mf["passed"] and mf["metric"] == 0.25  # one non-positive row


def test_check_constraints_clean_table_passes(spark):
    clean = spark.createDataFrame(
        [(1, 5.0), (2, 6.0)], "id bigint, amount double"
    )
    report = check_constraints(
        clean, [not_null("id"), unique("id"), in_range("amount", 0, 10)]
    ).collect()
    assert all(r["passed"] for r in report)
    assert all(r["n_violations"] == 0 for r in report)
    with pytest.raises(ValueError):
        check_constraints(clean, [])
    with pytest.raises(ValueError):
        check_constraints(clean, [{"rule": "x", "kind": "nope", "col": "id"}])


def test_profile_is_single_job(spark):
    """All per-column stats come from ONE wide aggregate — the plan
    has a single pair of partial/final HashAggregates over the scan,
    not one scan per column."""
    df = dirty_df(spark)
    plan = (
        profile_table(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan ExistingRDD") <= 1


def test_weighted_quantiles_hand_computed(spark):
    from aden_hive_fork_spark.operators.quality import weighted_quantiles

    # values 1..4 with weights 1,1,6,2 (total 10):
    #   q=0.5 → target 5 → first cum>=5 is value 3 (cum 8)
    #   q=0.8 → target 8 → value 3; q=0.9 → target 9 → value 4
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 1.0), (3.0, 6.0), (4.0, 2.0)], "v double, w double"
    )
    out = {r["q"]: r["value"]
           for r in weighted_quantiles(df, "v", "w", [0.5, 0.8, 0.9]).collect()}
    assert out == {0.5: 3.0, 0.8: 3.0, 0.9: 4.0}


def test_weighted_quantiles_ignores_nonpositive_and_validates(spark):
    import pytest

    from aden_hive_fork_spark.operators.quality import weighted_quantiles

    df = spark.createDataFrame(
        [(1.0, 0.0), (2.0, -1.0), (3.0, 5.0), (None, 2.0), (9.0, 1.0)],
        "v double, w double",
    )
    out = {r["q"]: r["value"]
           for r in weighted_quantiles(df, "v", "w", [0.5]).collect()}
    # zero/negative weights and NULL values are all excluded: only
    # (3.0, w=5) and (9.0, w=1) count → target 3 → value 3
    assert out == {0.5: 3.0}
    with pytest.raises(ValueError):
        weighted_quantiles(df, "v", "w", [0.0])
    with pytest.raises(ValueError):
        weighted_quantiles(df, "v", "w", [])


def test_weighted_quantiles_uniform_weights_match_lower_quantile(spark):
    from aden_hive_fork_spark.operators.quality import weighted_quantiles

    vals = [float(x) for x in range(1, 101)]
    df = spark.createDataFrame([(v, 1.0) for v in vals], "v double, w double")
    out = {r["q"]: r["value"]
           for r in weighted_quantiles(df, "v", "w", [0.25, 0.5, 1.0]).collect()}
    assert out == {0.25: 25.0, 0.5: 50.0, 1.0: 100.0}
