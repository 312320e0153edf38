"""Physical-plan guards for the round-5 second/third-wave operators:
the properties that make them safe at 100 TB must be visible in the
executed plan, not just claimed in docstrings."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_kmv_global_sketch_preprunes_before_global_rank(spark):
    from aden_hive_fork_spark.operators.sketch import kmv_sketch

    df = spark.createDataFrame([(i,) for i in range(1000)], "v long")
    plan = _plan(kmv_sketch(df, "v", k=16))
    # stage 1: per-(partition) window keyed by _pid — the pre-prune
    assert "_pid" in plan
    # the final single-partition rank sees only pruned candidates:
    # its input subtree must contain the _r <= k filter from stage 1
    assert plan.count("row_number") >= 2


def test_item_similarity_no_cartesian_or_bnlj(spark):
    from aden_hive_fork_spark.operators.baskets import item_similarity

    rows = [(f"b{i % 7}", i % 13) for i in range(200)]
    df = spark.createDataFrame(rows, "b string, item int")
    plan = _plan(item_similarity(df, "b", "item"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_join_size_profile_prunes_to_key_columns(spark):
    from aden_hive_fork_spark.operators.joins import join_size_profile
    from aden_hive_fork_spark.catalog import load_table

    from tests.conftest import SF_SMALL

    li = load_table(spark, SF_SMALL, "lineitem")
    plan = _plan(join_size_profile(li, li, "l_partkey", "l_partkey"))
    # the scans must read ONLY the key column — a profile that drags
    # l_extendedprice/l_quantity through the shuffle is wrong
    assert "l_extendedprice" not in plan
    assert "l_quantity" not in plan


def test_corr_matrix_single_scan(spark):
    from aden_hive_fork_spark.operators.stats import corr_matrix
    from aden_hive_fork_spark.catalog import load_table

    from tests.conftest import SF_SMALL

    li = load_table(spark, SF_SMALL, "lineitem")
    plan = _plan(corr_matrix(li, ["l_quantity", "l_tax", "l_discount"]))
    # all 6 sufficient-statistic sums from ONE pass over ONE scan
    assert plan.count("Scan parquet") == 1


def test_transition_matrix_single_sequence_shuffle(spark):
    from aden_hive_fork_spark.operators.sequences import transition_matrix

    rows = [(i % 5, i, f"s{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, "u int, t int, s string")
    plan = _plan(transition_matrix(df, ["u"], ["t"], "s"))
    assert "CartesianProduct" not in plan
    # broadcast normalization join — the totals side must broadcast
    assert "BroadcastHashJoin" in plan


def test_kfold_assign_is_map_side_only(spark):
    from aden_hive_fork_spark.operators.sampling import kfold_assign

    df = spark.createDataFrame([(i,) for i in range(100)], "k long")
    plan = _plan(kfold_assign(df, "k", k=5))
    assert "Exchange" not in plan  # pure projection — no shuffle


def test_ref_integrity_null_fks_never_join(spark):
    from aden_hive_fork_spark.operators.quality import ref_integrity

    child = spark.createDataFrame([(1,), (None,)], "fk int")
    parent = spark.createDataFrame([(1,)], "pk int")
    plan = _plan(ref_integrity(child, parent, "fk", "pk"))
    assert "LeftAnti" in plan


def test_tpch_shapes_all_broadcast_no_sortmerge(spark):
    """q191/q192/q193/q196 at gate scale: every join broadcast, zero
    cartesian, selective predicates pushed to the parquet scans —
    the manual plan audit, pinned."""
    from aden_hive_fork_spark import suite
    from tests.conftest import SF_SMALL

    suite.load_all()
    for name, pushed in [
        ("q191_local_supplier_volume", None),
        ("q192_returned_item_customers", "EqualTo(l_returnflag,R)"),
        ("q193_market_share", None),
        ("q196_wealthy_inactive", "EqualTo(o_orderpriority,1-URGENT)"),
    ]:
        plan = _plan(suite.QUERIES[name](spark, SF_SMALL))
        assert "CartesianProduct" not in plan, name
        assert "SortMergeJoin" not in plan, name
        assert "BroadcastHashJoin" in plan, name
        if pushed:
            assert pushed in plan, name


def test_session_paths_single_sequence_shuffle(spark):
    import datetime as dt

    from aden_hive_fork_spark.operators.sequences import session_paths

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i % 5, t0 + dt.timedelta(minutes=i), i, f"s{i % 3}")
            for i in range(100)]
    df = spark.createDataFrame(
        rows, "u long, ts timestamp_ntz, eid long, s string"
    )
    plan = _plan(session_paths(df, ["u"], "ts", ["eid"], "s"))
    # break flag + session id share ONE user-keyed window partitioning:
    # exactly one hashpartitioning on the sequence key feeds both
    assert plan.count("CartesianProduct") == 0
    wins = plan.count("Window")
    assert wins >= 1


def test_pack_token_stream_no_window_no_singlepartition(spark):
    from aden_hive_fork_spark.operators.packing import pack_token_stream

    df = spark.createDataFrame(
        [(i, 10 + i % 50) for i in range(500)], "doc_id long, n_tok int"
    )
    plan = _plan(pack_token_stream(df, "doc_id", "n_tok", capacity=64))
    # the prefix sum must be the range-partitioned two-pass, never a
    # global window (Exchange SinglePartition + whole-input sort)
    assert "Window" not in plan
    assert "SinglePartition" not in plan


def test_domain_mix_single_corpus_aggregate(spark):
    from aden_hive_fork_spark.operators.mixing import domain_mix_report

    df = spark.createDataFrame(
        [(f"s{i % 4}", 10 + i) for i in range(200)],
        "source string, n_tok int",
    )
    rep = domain_mix_report(
        df, "source", "n_tok",
        {"s0": 0.25, "s1": 0.25, "s2": 0.25, "s3": 0.25}, 1000,
    )
    plan = _plan(rep)
    # the corpus total is a 1-row broadcast, not a re-aggregation of
    # the corpus per domain row
    assert "BroadcastExchange" in plan
    assert "Window" not in plan
