"""Physical-plan assertions: lock in the scale properties documented
in SCALING.md. A regression here means a query still returns correct
rows locally but would fall over at 100 TB (lost pushdown, lost
broadcast, lost window-group-limit, lost partition pruning).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _plan(df, mode: str = "simple") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


@pytest.fixture(scope="module")
def queries():
    from aden_hive_fork_spark import suite

    return suite.get_queries()


def test_q01_filter_pushed_to_scan(spark, queries):
    plan = _plan(queries["q01_pricing_summary"](spark, SF_SMALL), "formatted")
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].split("]")[0]


def test_q01_reads_only_needed_columns(spark, queries):
    plan = _plan(queries["q01_pricing_summary"](spark, SF_SMALL), "formatted")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # lineitem has 11 columns; q01 needs neither the join keys nor ids
    assert "l_partkey" not in read_schema and "l_suppkey" not in read_schema


def test_q03_dims_broadcast(spark, queries):
    plan = _plan(queries["q03_region_nation_revenue"](spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q02_topk_is_take_ordered(spark, queries):
    plan = _plan(queries["q02_top_revenue_orders"](spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan


def test_q06_rank_filter_has_window_group_limit(spark, queries):
    plan = _plan(queries["q06_top_lineitems_per_part"](spark, SF_SMALL))
    assert "WindowGroupLimit" in plan


def test_q41_no_cartesian_anywhere(spark, queries):
    plan = _plan(queries["q41_ngram_jaccard_pairs"](spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q65_scan_prunes_document_columns(spark, queries):
    plan = _plan(queries["q65_doc_binary_metadata"](spark, SF_SMALL), "formatted")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in read_schema and "lang" not in read_schema


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Write events partitioned by event_type; a filtered read must
    scan only the matching partition directory (PartitionFilters),
    which at 100 TB is the difference between one directory and the
    whole table."""
    from aden_hive_fork_spark.catalog import load_table

    out = str(tmp_path / "events_by_type")
    load_table(spark, SF_SMALL, "events").write.partitionBy("event_type").parquet(out)
    df = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = _plan(df, "formatted")
    pf = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "event_type" in pf
    # and the scan actually returns only that partition
    assert df.select("event_type").distinct().collect()[0][0] == "click"


def test_q30_no_python_in_row_path(spark, queries):
    """Text analysis must stay JVM-side: no Python/Arrow eval nodes."""
    plan = _plan(queries["q30_doc_token_stats"](spark, SF_SMALL))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_q69_no_python_in_row_path(spark, queries):
    plan = _plan(queries["q69_bpe_token_counts"](spark, SF_SMALL))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_q02_q03_eager_aggregation_below_join(spark, queries):
    """The eager-aggregation rewrite must survive: lineitem collapses
    to per-order partials BEFORE the join, so the optimized plan shows
    an aggregate keyed on l_orderkey on the lineitem side of the
    join (for q02 the rewrite removes the outer aggregate entirely),
    and joins stay shuffle/broadcast hash."""
    for q in ("q02_top_revenue_orders", "q03_region_nation_revenue"):
        plan = _plan(queries[q](spark, SF_SMALL))
        assert "HashAggregate(keys=[l_orderkey" in plan, q
        assert "CartesianProduct" not in plan, q
        assert "BroadcastNestedLoopJoin" not in plan, q


def test_zorder_expression_stays_jvm_side(spark):
    """The Morton key must be a pure column expression — a Python UDF
    here would serialize every row through Arrow during a layout
    rewrite of the whole table."""
    from aden_hive_fork_spark.operators.layout import zorder_value

    df = spark.range(1000).select(
        (F.col("id") % 31).alias("x"), (F.col("id") % 37).alias("y")
    )
    z = df.withColumn("z", zorder_value(df, ["x", "y"]))
    plan = _plan(z, "formatted")
    assert "EvalPython" not in plan  # no Batch/ArrowEvalPython stage
    assert "[codegen id :" in plan  # inside a whole-stage codegen span


def test_zorder_clustering_is_range_exchange(spark):
    from aden_hive_fork_spark.operators.layout import zorder_value

    df = spark.range(1000).select(
        (F.col("id") % 31).alias("x"), (F.col("id") % 37).alias("y")
    )
    clustered = (
        df.withColumn("__z__", zorder_value(df, ["x", "y"]))
        .repartitionByRange(4, F.col("__z__"))
        .sortWithinPartitions("__z__")
        .drop("__z__")
    )
    plan = _plan(clustered)
    assert "rangepartitioning" in plan.lower()


def test_hist_bucket_stays_jvm_side(spark):
    from aden_hive_fork_spark.operators.rollup import _hist_bucket

    df = spark.range(1000).select((F.col("id") + 1).cast("double").alias("value"))
    plan = _plan(df.select(_hist_bucket("value").alias("b")))
    assert "EvalPython" not in plan


def test_q238_ann_lsh_is_broadcast_bucket_join(spark, queries):
    """The amplified-LSH ANN: the (tiny) query-bucket side broadcasts;
    the corpus is never self-joined all-pairs; sign computation stays
    JVM-side (literal ±1 arrays inside codegen, no Python eval)."""
    plan = _plan(queries["q238_ann_md5_topk"](spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q239_ivf_seed_scoring_is_broadcast(spark, queries):
    """IVF cell assignment scores the corpus against 16 broadcast
    seeds (BroadcastNestedLoopJoin over a bounded side is the intended
    shape — NOT a CartesianProduct) and the probe join broadcasts."""
    plan = _plan(queries["q239_ivf_md5_topk"](spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bpe_initial_tokens_no_python(spark):
    """BPE training's corpus reduction and char explode are pure JVM
    expressions (sequence/substring/posexplode)."""
    from aden_hive_fork_spark.operators.bpe_train import (
        _initial_tokens,
        bpe_word_freqs,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    plan = _plan(_initial_tokens(bpe_word_freqs(docs)))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # vocabulary cap is a TakeOrdered, not a global Sort+Limit
    assert "TakeOrderedAndProject" in plan


# --- round-6 statistics/eval tier plan guards -------------------------------


def test_q246_target_encode_broadcasts_category_tables(spark, queries):
    plan = _plan(queries["q246_target_encoding"](spark, SF_SMALL))
    # both the category table and the global mean must broadcast —
    # the corpus never shuffles for the encode
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # the 1-row glob


def test_q241_bootstrap_no_cartesian_and_widened(spark, queries):
    df = queries["q241_bootstrap_mean_ci"](spark, SF_SMALL)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    # the explode runs AFTER a hash repartition on narrow inputs
    assert "hashpartitioning" in plan.lower()


def test_q250_sssp_no_global_sort_before_limit(spark, queries):
    plan = _plan(queries["q250_sssp_weighted"](spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan


def test_q247_feature_hash_single_exchange_chain(spark, queries):
    plan = _plan(queries["q247_feature_hashing"](spark, SF_SMALL))
    # vocabulary-free: no join anywhere in the vectorizer
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_q262_ndcg_no_cartesian(spark, queries):
    plan = _plan(queries["q262_bm25_ndcg"](spark, SF_SMALL))
    assert "CartesianProduct" not in plan


def test_q253_auc_single_window_pass(spark, queries):
    plan = _plan(queries["q253_classifier_eval"](spark, SF_SMALL))
    # one rank window + one tie-count window share the ordered pass;
    # no join of the corpus against itself
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") == 0
