"""Incremental join-view maintenance: equality with a batch rebuild
after every wave of changes, bounded work, replay no-ops, and
compaction-survivable watermarks."""

from __future__ import annotations

import pytest

from aden_hive_fork_spark.operators.ivm import refresh_join_view
from aden_hive_fork_spark.operators.table import (
    compact_table,
    create_table,
    read_table,
    upsert,
    vacuum_deltas,
)


def _rows(df, keys):
    return sorted(
        (tuple(r[k] for k in keys), tuple(sorted(r.asDict().items())))
        for r in df.collect()
    )


def _batch_join(spark, f_root, d_root, fk, dk):
    f = read_table(spark, f_root)
    d = read_table(spark, d_root)
    return f.join(d, f[fk] == d[dk], "inner").drop(dk)


@pytest.fixture()
def tables(spark, tmp_path):
    f_root = str(tmp_path / "fact")
    d_root = str(tmp_path / "dim")
    v_root = str(tmp_path / "view")
    fact = spark.createDataFrame(
        [(i, i % 5, float(i)) for i in range(40)],
        "order_id int, cust int, amount double",
    )
    dim = spark.createDataFrame(
        [(c, f"seg{c % 2}") for c in range(5)], "cust_id int, segment string"
    )
    create_table(fact, f_root, ["order_id"])
    create_table(dim, d_root, ["cust_id"])
    return f_root, d_root, v_root


def test_init_equals_batch_join(spark, tables):
    f_root, d_root, v_root = tables
    st = refresh_join_view(spark, f_root, d_root, v_root, "cust")
    assert st["initialized"] and st["n_upserts"] == 40
    view = read_table(spark, v_root)
    want = _batch_join(spark, f_root, d_root, "cust", "cust_id")
    assert _rows(view, ["order_id"]) == _rows(want, ["order_id"])


def test_fact_and_dim_changes_converge(spark, tables):
    f_root, d_root, v_root = tables
    refresh_join_view(spark, f_root, d_root, v_root, "cust")
    # fact: update one, insert one, delete one
    upsert(
        spark.createDataFrame(
            [(3, 4, 999.0, "upsert"), (100, 2, 5.5, "upsert"),
             (7, 2, 0.0, "delete")],
            "order_id int, cust int, amount double, _op string",
        ),
        f_root,
        ["order_id"],
    )
    # dim: rename a segment (fans out to 8 orders), delete a customer
    upsert(
        spark.createDataFrame(
            [(2, "VIP", "upsert"), (4, "", "delete")],
            "cust_id int, segment string, _op string",
        ),
        d_root,
        ["cust_id"],
    )
    st = refresh_join_view(spark, f_root, d_root, v_root, "cust")
    view = read_table(spark, v_root)
    want = _batch_join(spark, f_root, d_root, "cust", "cust_id")
    assert _rows(view, ["order_id"]) == _rows(want, ["order_id"])
    # cust=4 orders (incl. updated order 3) fell out of the inner join
    assert st["n_deletes"] >= 8
    # bounded work: affected = cust2 fanout (8+1 new) + order 3 + order 7
    assert st["n_upserts"] + st["n_deletes"] <= 20


def test_refresh_replay_is_noop_and_compaction_safe(spark, tables):
    f_root, d_root, v_root = tables
    refresh_join_view(spark, f_root, d_root, v_root, "cust")
    upsert(
        spark.createDataFrame(
            [(0, 1, 42.0, "upsert")],
            "order_id int, cust int, amount double, _op string",
        ),
        f_root,
        ["order_id"],
    )
    st1 = refresh_join_view(spark, f_root, d_root, v_root, "cust")
    assert st1["n_upserts"] == 1
    st2 = refresh_join_view(spark, f_root, d_root, v_root, "cust")
    assert st2["n_upserts"] == 0 and st2["n_deletes"] == 0
    # compact+vacuum the view: watermark folds into the manifest
    compact_table(spark, v_root)
    vacuum_deltas(v_root)
    st3 = refresh_join_view(spark, f_root, d_root, v_root, "cust")
    assert st3["n_upserts"] == 0 and st3["n_deletes"] == 0
    view = read_table(spark, v_root)
    want = _batch_join(spark, f_root, d_root, "cust", "cust_id")
    assert _rows(view, ["order_id"]) == _rows(want, ["order_id"])


def test_overlapping_schemas_rejected(spark, tmp_path):
    f_root = str(tmp_path / "f")
    d_root = str(tmp_path / "d")
    create_table(
        spark.createDataFrame([(1, 2)], "id int, name int"), f_root, ["id"]
    )
    create_table(
        spark.createDataFrame([(2, 3)], "cust int, name int"), d_root, ["cust"]
    )
    with pytest.raises(ValueError, match="share column names"):
        refresh_join_view(spark, f_root, d_root, str(tmp_path / "v"), "name")


def test_cdc_stream_feeds_ivm_view(spark, tmp_path):
    """Composition: a streaming CDC feed upserts the fact table
    (exactly-once cdc_upsert_sink), then one incremental refresh
    brings the join view to parity with a batch rebuild — the full
    stream→table→view path."""
    import json as _json
    import os as _os

    from aden_hive_fork_spark.streaming.cdc_sink import cdc_upsert_sink

    f_root = str(tmp_path / "fact")
    d_root = str(tmp_path / "dim")
    v_root = str(tmp_path / "view")
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    create_table(
        spark.createDataFrame(
            [(i, i % 3, float(i)) for i in range(10)],
            "order_id int, cust int, amount double",
        ),
        f_root,
        ["order_id"],
    )
    create_table(
        spark.createDataFrame(
            [(c, f"seg{c}") for c in range(3)], "cust_id int, segment string"
        ),
        d_root,
        ["cust_id"],
    )
    refresh_join_view(spark, f_root, d_root, v_root, "cust")

    _os.makedirs(in_dir, exist_ok=True)
    changes = [
        {"order_id": 3, "cust": 2, "amount": 500.0, "_op": "upsert", "seq": 1},
        {"order_id": 50, "cust": 0, "amount": 7.0, "_op": "upsert", "seq": 2},
        {"order_id": 4, "cust": 1, "amount": 0.0, "_op": "delete", "seq": 3},
    ]
    with open(f"{in_dir}/c1.json", "w") as fh:
        for c in changes:
            fh.write(_json.dumps(c) + "\n")
    schema = "order_id int, cust int, amount double, _op string, seq int"
    q = cdc_upsert_sink(
        spark.readStream.schema(schema).json(in_dir),
        f_root,
        ["order_id"],
        ckpt,
        seq_col="seq",
    )
    q.awaitTermination(120)

    refresh_join_view(spark, f_root, d_root, v_root, "cust")
    view = read_table(spark, v_root)
    want = _batch_join(spark, f_root, d_root, "cust", "cust_id")
    assert _rows(view, ["order_id"]) == _rows(want, ["order_id"])
    ids = {r["order_id"] for r in view.collect()}
    assert 50 in ids and 4 not in ids


def test_agg_view_moves_deletes_and_empties_groups(spark, tmp_path):
    from pyspark.sql import functions as F

    from aden_hive_fork_spark.operators.ivm import refresh_agg_view

    f_root = str(tmp_path / "fact")
    v_root = str(tmp_path / "aggview")
    create_table(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 5.0), (4, "c", 7.0)],
            "id int, grp string, amount double",
        ),
        f_root,
        ["id"],
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("amount").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("total"),
    ]
    st = refresh_agg_view(spark, f_root, v_root, ["grp"], aggs)
    assert st["initialized"] and st["n_upserts"] == 3

    # move row 2 from a→b (retraction of OLD group 'a' required),
    # delete row 4 (group c becomes empty → tombstone)
    upsert(
        spark.createDataFrame(
            [(2, "b", 20.0, "upsert"), (4, "c", 0.0, "delete")],
            "id int, grp string, amount double, _op string",
        ),
        f_root,
        ["id"],
    )
    st = refresh_agg_view(spark, f_root, v_root, ["grp"], aggs)
    view = {r["grp"]: (r["n"], float(r["total"]))
            for r in read_table(spark, v_root).collect()}
    assert view == {"a": (1, 10.0), "b": (2, 25.0)}
    assert st["n_deletes"] == 1  # group c tombstoned
    # bounded work: only groups a, b, c touched — but a/b/c is all
    # groups here; the point is the recompute ran per affected group
    assert st["n_upserts"] == 2

    # replay no-op
    st2 = refresh_agg_view(spark, f_root, v_root, ["grp"], aggs)
    assert st2["n_upserts"] == 0 and st2["n_deletes"] == 0


def test_agg_view_bounded_work_and_batch_equality(spark, tmp_path):
    from pyspark.sql import functions as F

    from aden_hive_fork_spark.operators.ivm import refresh_agg_view

    f_root = str(tmp_path / "fact")
    v_root = str(tmp_path / "aggview")
    create_table(
        spark.createDataFrame(
            [(i, f"g{i % 20}", float(i)) for i in range(200)],
            "id int, grp string, amount double",
        ),
        f_root,
        ["id"],
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("amount").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("total"),
    ]
    refresh_agg_view(spark, f_root, v_root, ["grp"], aggs)
    # touch only 2 of 20 groups
    upsert(
        spark.createDataFrame(
            [(0, "g1", 1000.0, "upsert"), (7, "g7", 0.0, "delete")],
            "id int, grp string, amount double, _op string",
        ),
        f_root,
        ["id"],
    )
    st = refresh_agg_view(spark, f_root, v_root, ["grp"], aggs)
    # affected groups: g0 (old of id 0), g1 (new of id 0), g7 → ≤3
    assert st["n_upserts"] + st["n_deletes"] <= 3
    want = {
        r["grp"]: (r["n"], float(r["total"]))
        for r in read_table(spark, f_root)
        .groupBy("grp")
        .agg(*aggs)
        .collect()
    }
    got = {r["grp"]: (r["n"], float(r["total"]))
           for r in read_table(spark, v_root).collect()}
    assert got == want


def test_agg_view_asof_retention_contract(spark, tmp_path):
    from pyspark.sql import functions as F

    from aden_hive_fork_spark.operators.ivm import refresh_agg_view

    f_root = str(tmp_path / "fact")
    v_root = str(tmp_path / "aggview")
    create_table(
        spark.createDataFrame([(1, "a", 1.0)], "id int, grp string, amount double"),
        f_root,
        ["id"],
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    refresh_agg_view(spark, f_root, v_root, ["grp"], aggs)
    upsert(
        spark.createDataFrame(
            [(1, "b", 1.0, "upsert")], "id int, grp string, amount double, _op string"
        ),
        f_root,
        ["id"],
    )
    # fold the unapplied delta into the base: the pre-image is gone
    compact_table(spark, f_root)
    vacuum_deltas(f_root)
    with pytest.raises(ValueError, match="compacted through"):
        refresh_agg_view(spark, f_root, v_root, ["grp"], aggs)


def test_watermark_monotone_after_source_compact_vacuum(spark, tables):
    """Regression: a compliant refresh→compact→vacuum on one source
    must not regress the view's persisted watermark when a LATER
    refresh is driven by the other side — and the refresh after THAT
    must not trip the fold-past guard (the view would be permanently
    blocked)."""
    f_root, d_root, v_root = tables
    refresh_join_view(spark, f_root, d_root, v_root, "cust")

    # advance + drain the FACT side, then compact+vacuum it:
    # its live delta seqs are now gone (max(_delta_seqs) == -1)
    upsert(
        spark.createDataFrame(
            [(200, 1, 42.0, "upsert")],
            "order_id int, cust int, amount double, _op string",
        ),
        f_root,
        ["order_id"],
    )
    refresh_join_view(spark, f_root, d_root, v_root, "cust")
    compact_table(spark, f_root)
    vacuum_deltas(f_root)

    # a refresh driven by the DIM side must keep the fact watermark
    upsert(
        spark.createDataFrame(
            [(1, "GOLD", "upsert")], "cust_id int, segment string, _op string"
        ),
        d_root,
        ["cust_id"],
    )
    st = refresh_join_view(spark, f_root, d_root, v_root, "cust")
    assert st["fact_seq"] >= 0, "fact watermark regressed to -1"

    # and the NEXT refresh (any side) must not raise the fold-past guard
    upsert(
        spark.createDataFrame(
            [(2, "SILVER", "upsert")], "cust_id int, segment string, _op string"
        ),
        d_root,
        ["cust_id"],
    )
    st = refresh_join_view(spark, f_root, d_root, v_root, "cust")
    view = read_table(spark, v_root)
    want = _batch_join(spark, f_root, d_root, "cust", "cust_id")
    assert _rows(view, ["order_id"]) == _rows(want, ["order_id"])


def test_agg_view_watermark_monotone_after_compact_vacuum(spark, tmp_path):
    from pyspark.sql import functions as F

    from aden_hive_fork_spark.operators.ivm import refresh_agg_view
    from aden_hive_fork_spark.operators.table import _delta_seqs

    f_root = str(tmp_path / "fact")
    v_root = str(tmp_path / "aggview")
    create_table(
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0)], "id int, grp string, amount double"
        ),
        f_root,
        ["id"],
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    refresh_agg_view(spark, f_root, v_root, ["grp"], aggs)
    upsert(
        spark.createDataFrame(
            [(3, "a", 3.0, "upsert")], "id int, grp string, amount double, _op string"
        ),
        f_root,
        ["id"],
    )
    st = refresh_agg_view(spark, f_root, v_root, ["grp"], aggs)
    applied = st["fact_seq"]
    # drain → compact → vacuum: live deltas gone, folded_through advanced
    compact_table(spark, f_root)
    vacuum_deltas(f_root)
    assert _delta_seqs(f_root) == []
    # a no-change refresh must NOT raise and must NOT regress
    st = refresh_agg_view(spark, f_root, v_root, ["grp"], aggs)
    assert st["fact_seq"] >= applied
    assert st["n_upserts"] == 0 and st["n_deletes"] == 0
