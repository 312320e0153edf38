"""Physical-plan guards for the round-4 operator waves: the scale
properties SCALING.md claims are asserted here against the executed
plan, so a refactor that silently reintroduces a cartesian product,
an unbounded broadcast, or a single-task sort fails loudly."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _n_exchanges(plan: str) -> int:
    return len(re.findall(r"\bExchange (hash|range)", plan))


def test_retention_matrix_single_data_shuffle_no_join(spark):
    from aden_hive_fork_spark.catalog import load_table
    from aden_hive_fork_spark.operators.cohorts import retention_matrix

    e = load_table(spark, SF_SMALL, "events")
    plan = _plan(retention_matrix(e, "user_id", "ts", "week"))
    assert "Join" not in plan  # collect_set form needs no join at all
    assert "CartesianProduct" not in plan


def test_basket_pairs_no_cartesian_no_forced_broadcast(spark):
    from aden_hive_fork_spark.catalog import load_table
    from aden_hive_fork_spark.operators.baskets import basket_pairs

    li = load_table(spark, SF_SMALL, "lineitem")
    plan = _plan(basket_pairs(li, "l_orderkey", "l_partkey"))
    assert "CartesianProduct" not in plan
    # the only nested-loop join is the 1-row total broadcast
    assert plan.count("BroadcastNestedLoopJoin") == 1


def test_heavy_hitters_semi_join_is_broadcast(spark):
    from fractions import Fraction

    from aden_hive_fork_spark.catalog import load_table
    from aden_hive_fork_spark.operators.heavy import heavy_hitters

    li = load_table(spark, SF_SMALL, "lineitem")
    plan = _plan(heavy_hitters(li, "l_partkey", Fraction(1, 2000), k=4096))
    # candidate prune must reach the table as a broadcast semi join —
    # the table itself never shuffles before the prune
    assert re.search(r"BroadcastHashJoin .*LeftSemi", plan)


def test_equi_depth_bins_cuts_are_broadcast(spark):
    from aden_hive_fork_spark.catalog import load_table
    from aden_hive_fork_spark.operators.quality import equi_depth_bins

    o = load_table(spark, SF_SMALL, "orders")
    plan = _plan(equi_depth_bins(o, "o_totalprice", 10))
    assert plan.count("BroadcastNestedLoopJoin") == 1  # 1-row cut array
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_ohlc_single_hash_exchange(spark):
    from aden_hive_fork_spark.catalog import load_table
    from aden_hive_fork_spark.operators.timeseries import ohlc_bars

    e = load_table(spark, SF_SMALL, "events")
    bars = ohlc_bars(e, "ts", "value", ["event_type"], "1 hour",
                     tiebreak_col="event_id")
    plan = _plan(bars)
    # windows + aggregate share ONE (key, bucket) hashpartitioning
    assert len(re.findall(r"\bExchange hashpartitioning", plan)) == 1


def test_diff_tables_one_join_no_bnlj(spark):
    from aden_hive_fork_spark.catalog import load_table
    from aden_hive_fork_spark.operators.diff import diff_tables

    o = load_table(spark, SF_SMALL, "orders")
    d = diff_tables(
        o, o.withColumn("o_totalprice", F.col("o_totalprice") + 1),
        ["o_orderkey"],
    )
    plan = _plan(d)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Join") >= 1  # keyed full-outer join present


def test_pii_census_one_exchange(spark):
    from aden_hive_fork_spark.catalog import load_table
    from aden_hive_fork_spark.operators.pii import pii_census

    c = load_table(spark, SF_SMALL, "customer").select(
        F.col("c_mktsegment"), F.col("c_name").alias("text")
    )
    plan = _plan(pii_census(c, "text", ["c_mktsegment"]))
    assert _n_exchanges(plan) == 1  # detection map-side, one aggregate


def test_tfidf_no_second_corpus_scan(spark):
    from aden_hive_fork_spark.catalog import load_table
    from aden_hive_fork_spark.operators.ngram_lm import tfidf

    d = load_table(spark, SF_SMALL, "documents")
    plan = _plan(tfidf(d, "text", "doc_id"))
    # df_t is partial-aggregated (hot-word-safe) at the cost of the
    # tokenize tree planning twice — never more; the N scan is
    # column-pruned to the id (reads no text); and no Window node
    # may reappear (a word-partitioned count window has no partial
    # aggregation and funnels stopwords through one task)
    assert plan.count("documents.parquet") <= 3
    assert "ReadSchema: struct<doc_id:bigint>" in plan
    assert "Window" not in plan
