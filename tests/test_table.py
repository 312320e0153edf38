"""Merge-on-read keyed table: upsert/delete resolution, latest-wins
across batches, compaction equivalence, vacuum discipline."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aden_hive_fork_spark.operators.table import (
    compact_table,
    create_table,
    read_table,
    upsert,
    vacuum_deltas,
)


def _rows(spark, root):
    return {
        r["doc_id"]: (r["score"], r["label"])
        for r in read_table(spark, root).collect()
    }


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, float(i), "keep") for i in range(10)],
        "doc_id long, score double, label string",
    )
    create_table(base, root, ["doc_id"])
    return root


def test_upsert_insert_update_delete(spark, table):
    updates = spark.createDataFrame(
        [
            (3, 99.0, "rescored", "upsert"),   # update
            (42, 1.0, "new", "upsert"),        # insert
            (7, 0.0, "", "delete"),            # tombstone
        ],
        "doc_id long, score double, label string, _op string",
    )
    upsert(updates, table, ["doc_id"])
    got = _rows(spark, table)
    assert got[3] == (99.0, "rescored")
    assert got[42] == (1.0, "new")
    assert 7 not in got
    assert len(got) == 10  # 10 base - 1 delete + 1 insert


def test_latest_batch_wins(spark, table):
    for val in (10.0, 20.0, 30.0):
        upsert(
            spark.createDataFrame(
                [(5, val, "v")], "doc_id long, score double, label string"
            ),
            table,
            ["doc_id"],
        )
    assert _rows(spark, table)[5] == (30.0, "v")
    # a later tombstone beats every earlier upsert
    upsert(
        spark.createDataFrame(
            [(5, 0.0, "", "delete")],
            "doc_id long, score double, label string, _op string",
        ),
        table,
        ["doc_id"],
    )
    assert 5 not in _rows(spark, table)


def test_duplicate_keys_in_batch_rejected(spark, table):
    dup = spark.createDataFrame(
        [(1, 1.0, "a"), (1, 2.0, "b")], "doc_id long, score double, label string"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        upsert(dup, table, ["doc_id"])


def test_compact_preserves_resolution_and_vacuum(spark, table):
    upsert(
        spark.createDataFrame(
            [(0, 100.0, "x")], "doc_id long, score double, label string"
        ),
        table,
        ["doc_id"],
    )
    upsert(
        spark.createDataFrame(
            [(1, 0.0, "", "delete")],
            "doc_id long, score double, label string, _op string",
        ),
        table,
        ["doc_id"],
    )
    before = _rows(spark, table)
    v = compact_table(spark, table)
    assert _rows(spark, table) == before
    assert vacuum_deltas(table) == [0, 1]
    assert _rows(spark, table) == before  # folded state independent of deltas
    # post-compaction upserts start a fresh delta generation
    upsert(
        spark.createDataFrame(
            [(2, -1.0, "y")], "doc_id long, score double, label string"
        ),
        table,
        ["doc_id"],
    )
    after = _rows(spark, table)
    assert after[2] == (-1.0, "y")
    assert os.path.isdir(os.path.join(table, f"v={v}"))


def test_compact_without_deltas_is_noop(spark, table):
    from aden_hive_fork_spark.operators.layout import current_version

    v0 = current_version(table)
    assert compact_table(spark, table) == v0


def test_torn_delta_never_visible(spark, table):
    """A crashed delta write (temp dir left behind) is invisible to
    readers and doesn't block the next upsert."""
    os.makedirs(os.path.join(table, "_delta", "d=0.__tmp__"), exist_ok=True)
    before = _rows(spark, table)
    assert len(before) == 10
    upsert(
        spark.createDataFrame(
            [(50, 5.0, "z")], "doc_id long, score double, label string"
        ),
        table,
        ["doc_id"],
    )
    assert _rows(spark, table)[50] == (5.0, "z")

# ---------------------------------------------------------------------------
# merge_into
# ---------------------------------------------------------------------------


def _mk_table(spark, tmp_path, rows):
    from aden_hive_fork_spark.operators.table import create_table

    root = str(tmp_path / "merge_tbl")
    df = spark.createDataFrame(rows, "id bigint, score double, tag string")
    create_table(df, root, ["id"])
    return root


def _snap(spark, root):
    from aden_hive_fork_spark.operators.table import read_table

    return {
        r["id"]: (r["score"], r["tag"])
        for r in read_table(spark, root).collect()
    }


def test_merge_into_three_clauses(spark, tmp_path):
    from aden_hive_fork_spark.operators.table import merge_into

    root = _mk_table(
        spark, tmp_path,
        [(1, 10.0, "keep"), (2, 20.0, "upd"), (3, 30.0, "del"),
         (4, 40.0, "upd")],
    )
    src = spark.createDataFrame(
        [(2, 21.0), (3, 0.0), (4, 39.0), (5, 50.0)],
        "id bigint, score double",
    )
    stats = merge_into(
        spark, root, src,
        when_matched_update={"score": "s.score", "tag": "'merged'"},
        update_condition="s.score > t.score",
        when_matched_delete="t.tag = 'del'",
    )
    assert stats == {"inserted": 1, "updated": 1, "deleted": 1}
    snap = _snap(spark, root)
    assert snap[1] == (10.0, "keep")          # untouched by source
    assert snap[2] == (21.0, "merged")        # update cond true
    assert 3 not in snap                      # delete clause wins
    assert snap[4] == (40.0, "upd")           # update cond false → no-op
    assert snap[5] == (50.0, None)            # insert, tag absent → NULL


def test_merge_into_default_update_overwrites_source_cols(spark, tmp_path):
    from aden_hive_fork_spark.operators.table import merge_into

    root = _mk_table(spark, tmp_path, [(1, 1.0, "a"), (2, 2.0, "b")])
    src = spark.createDataFrame([(1, 9.0), (7, 70.0)],
                                "id bigint, score double")
    stats = merge_into(spark, root, src)
    assert stats == {"inserted": 1, "updated": 1, "deleted": 0}
    snap = _snap(spark, root)
    assert snap[1] == (9.0, "a")   # score from source, tag preserved
    assert snap[7] == (70.0, None)


def test_merge_into_no_insert_clause(spark, tmp_path):
    from aden_hive_fork_spark.operators.table import merge_into

    root = _mk_table(spark, tmp_path, [(1, 1.0, "a")])
    src = spark.createDataFrame([(1, 5.0), (9, 9.0)],
                                "id bigint, score double")
    stats = merge_into(spark, root, src, when_not_matched_insert=False)
    assert stats == {"inserted": 0, "updated": 1, "deleted": 0}
    snap = _snap(spark, root)
    assert 9 not in snap and snap[1] == (5.0, "a")


def test_merge_into_missing_keys_raises(spark, tmp_path):
    import pytest as _pytest

    from aden_hive_fork_spark.operators.table import merge_into

    root = _mk_table(spark, tmp_path, [(1, 1.0, "a")])
    src = spark.createDataFrame([(5.0,)], "score double")
    with _pytest.raises(ValueError, match="key columns"):
        merge_into(spark, root, src)


# ---------------------------------------------------------------------------
# table_changes (change data feed)
# ---------------------------------------------------------------------------


def test_table_changes_feed_and_range(spark, tmp_path):
    from aden_hive_fork_spark.operators.table import (
        create_table,
        table_changes,
        upsert,
    )

    root = str(tmp_path / "cdf")
    base = spark.createDataFrame([(1, 1.0)], "id bigint, v double")
    create_table(base, root, ["id"])
    upsert(spark.createDataFrame([(2, 2.0)], "id bigint, v double"),
           root, ["id"])
    upsert(
        spark.createDataFrame([(1, 0.0)], "id bigint, v double")
        .selectExpr("id", "v", "'delete' AS _op"),
        root, ["id"],
    )
    feed = table_changes(spark, root).collect()
    assert [(r["_seq"], r["id"], r["_op"]) for r in
            sorted(feed, key=lambda r: r["_seq"])] == [
        (0, 2, "upsert"), (1, 1, "delete")]
    # high-water-mark consumption: only changes after seq 0
    tail = table_changes(spark, root, from_seq=0).collect()
    assert [(r["_seq"], r["_op"]) for r in tail] == [(1, "delete")]
    # bounded upper end
    head = table_changes(spark, root, to_seq=0).collect()
    assert [(r["_seq"], r["_op"]) for r in head] == [(0, "upsert")]


def test_table_changes_empty_and_post_vacuum(spark, tmp_path):
    from aden_hive_fork_spark.operators.table import (
        compact_table,
        create_table,
        table_changes,
        upsert,
        vacuum_deltas,
    )

    root = str(tmp_path / "cdf2")
    base = spark.createDataFrame([(1, 1.0)], "id bigint, v double")
    create_table(base, root, ["id"])
    assert table_changes(spark, root).count() == 0
    upsert(spark.createDataFrame([(2, 2.0)], "id bigint, v double"),
           root, ["id"])
    assert table_changes(spark, root).count() == 1
    # retention contract: folded+vacuumed deltas leave the feed
    compact_table(spark, root)
    vacuum_deltas(root)
    assert table_changes(spark, root).count() == 0


def test_erase_keys_removes_all_traces(spark, table):
    import glob

    from aden_hive_fork_spark.operators.table import erase_keys

    # history: an update to doc 3 (so its value exists in base AND a
    # delta), then erase docs 3 and 7
    upsert(
        spark.createDataFrame(
            [(3, 33.0, "updated")], "doc_id long, score double, label string"
        ),
        table,
        ["doc_id"],
    )
    keys = spark.createDataFrame([(3,), (7,)], "doc_id long")
    report = erase_keys(spark, table, keys)
    assert report["n_keys"] == 2
    assert report["residual_rows"] == 0
    # logical state: erased keys gone, everything else intact
    state = _rows(spark, table)
    assert 3 not in state and 7 not in state
    assert len(state) == 8 and state[4] == (4.0, "keep")
    # physical state: every remaining parquet file is free of the keys
    residual = 0
    for f in glob.glob(os.path.join(table, "**", "*.parquet"),
                       recursive=True):
        pdf = spark.read.parquet(f).toPandas()
        if "doc_id" in pdf.columns:
            residual += int(pdf["doc_id"].isin([3, 7]).sum())
    assert residual == 0
    # history is gone by contract: only one version remains
    from aden_hive_fork_spark.operators.layout import list_versions

    assert len(list_versions(table)) == 1


def test_erase_keys_refuses_null_keys_and_keeps_history_opt(spark, table):
    from aden_hive_fork_spark.operators.layout import list_versions
    from aden_hive_fork_spark.operators.table import erase_keys

    with pytest.raises(ValueError):
        erase_keys(
            spark, table, spark.createDataFrame([(None,)], "doc_id long")
        )
    # vacuum_history=False keeps old versions (caller manages later)
    keys = spark.createDataFrame([(1,)], "doc_id long")
    report = erase_keys(spark, table, keys, vacuum_history=False)
    assert report["vacuumed_versions"] == []
    assert len(list_versions(table)) >= 2
    # the audit correctly reports the residue still in old versions
    assert report["residual_rows"] > 0
