"""Scale-join tests: bucketed joins must be shuffle-free (plan-level
assertion), salted joins must equal plain joins exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aden_hive_fork_spark.operators.joins import (
    bucketed_join,
    salted_join,
    skewed_key_stats,
    write_bucketed,
)


def _physical_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple"
    )


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # session-scoped spark already has a default warehouse dir
    return spark


def test_bucketed_join_is_shuffle_free(spark):
    left = spark.range(0, 10000).withColumn("v", F.col("id") % 7)
    right = spark.range(0, 10000).withColumn("w", F.col("id") % 5)
    write_bucketed(left, "t_bleft", "id", num_buckets=4)
    write_bucketed(right, "t_bright", "id", num_buckets=4)
    # force the sort-merge path (what a 100 TB fact⋈fact join takes —
    # locally Catalyst would broadcast these tiny tables instead)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "t_bleft", "t_bright", "id")
        plan = _physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # co-located: no shuffle at all
        assert joined.count() == 10000
        # contrast: the same join on raw (unbucketed) frames DOES shuffle
        raw = left.join(right.withColumnRenamed("w", "w2"), "id")
        assert "Exchange" in _physical_plan(raw)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_equals_plain_join(spark):
    # skewed left: key 0 holds half the rows
    left = spark.range(0, 2000).withColumn(
        "k", F.when(F.col("id") < 1000, 0).otherwise(F.col("id") % 50)
    ).withColumn("lv", F.col("id") * 2)
    right = spark.createDataFrame(
        [(i, f"r{i}") for i in range(50)], "k long, rv string"
    )
    plain = left.join(right, "k").select("id", "k", "lv", "rv")
    salted = salted_join(left, right, "k", salt=8).select("id", "k", "lv", "rv")
    assert plain.count() == salted.count() == 2000
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_outer_join(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (99, "z")], "k long, lv string")
    right = spark.createDataFrame([(1, "x"), (2, "y")], "k long, rv string")
    out = salted_join(left, right, "k", salt=4, how="left").orderBy("k")
    rows = [(r.k, r.lv, r.rv) for r in out.collect()]
    assert rows == [(1, "a", "x"), (2, "b", "y"), (99, "z", None)]


def test_skewed_key_stats(spark):
    df = spark.createDataFrame([(0,)] * 80 + [(i,) for i in range(1, 21)], "k long")
    top = skewed_key_stats(df, "k", top=1).collect()[0]
    assert top.k == 0 and top.n_rows == 80 and top.share == 0.8


def test_cli_smoke(spark, capsys):
    from aden_hive_fork_spark.__main__ import main

    rc = main(["--sql", "SELECT COUNT(*) AS n FROM nation", "--sf-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "n" in out and "25" in out
    rc = main(["--sql", "DROP TABLE nation"])
    assert rc == 2
