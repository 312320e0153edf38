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
