"""Incremental rollup maintenance: streamed merges must equal the
batch rebuild, replays must be no-ops, untouched date partitions must
not be rewritten (carried forward by link), and a crash between data
write and commit must leave readers on a consistent (marker, data)
pair — the versioned-pointer publish closes that window."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from aden_hive_fork_spark.operators.layout import read_pointer
from aden_hive_fork_spark.streaming.rollup_stream import (
    _committed_batch,
    maintain_rollup,
    merge_batch,
    read_rollup,
    vacuum_rollup,
)

SCHEMA = "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"


def _write_events(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


BATCH1 = [
    {"event_id": i, "ts": f"2024-01-01T{h:02d}:15:00", "user_id": i % 5,
     "event_type": t, "value": float(i)}
    for i, (h, t) in enumerate(
        [(0, "click"), (0, "click"), (0, "view"), (1, "click"), (2, "view"),
         (2, "view"), (3, "click")]
    )
]
BATCH2 = [
    {"event_id": 100 + i, "ts": ts, "user_id": 100 + i, "event_type": t,
     "value": 10.0 + i}
    for i, (ts, t) in enumerate(
        [("2024-01-02T00:30:00", "click"),   # new date
         ("2024-01-02T00:45:00", "click"),
         ("2024-01-02T05:00:00", "view")]
    )
]


def _run_stream(spark, in_dir, rollup, ckpt):
    ev = spark.readStream.schema(SCHEMA).json(in_dir)
    q = maintain_rollup(ev, rollup, ckpt)
    q.awaitTermination(120)


def _rollup_rows(spark, rollup):
    return {
        (str(r["hour_start"]), r["event_type"]): (r["n_events"], float(r["sum_value"]))
        for r in read_rollup(spark, rollup).collect()
    }


def test_streamed_rollup_equals_batch_rebuild(spark, tmp_path):
    in_dir, rollup, ckpt = (str(tmp_path / d) for d in ("in", "rollup", "ckpt"))
    _write_events(in_dir, "b1.json", BATCH1)
    _run_stream(spark, in_dir, rollup, ckpt)
    _write_events(in_dir, "b2.json", BATCH2)
    _run_stream(spark, in_dir, rollup, ckpt)  # same checkpoint: only b2 is new

    # batch ground truth over ALL events, same mergeable aggregates
    from aden_hive_fork_spark.streaming.rollup_stream import batch_partials

    all_ev = spark.read.schema(SCHEMA).json(in_dir)
    want = {
        (str(r["hour_start"]), r["event_type"]): (r["n_events"], float(r["sum_value"]))
        for r in batch_partials(all_ev).collect()
    }
    assert _rollup_rows(spark, rollup) == want

    # HLL sketches merged across batches still estimate exactly on tiny data
    est = {
        r["event_type"]: r["est"]
        for r in read_rollup(spark, rollup)
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("users_hll")).alias("est"))
        .collect()
    }
    truth = {
        r["event_type"]: r["n"]
        for r in all_ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert est == truth


def test_replayed_batch_is_noop(spark, tmp_path):
    in_dir, rollup = str(tmp_path / "in"), str(tmp_path / "rollup")
    _write_events(in_dir, "b1.json", BATCH1)
    batch = spark.read.schema(SCHEMA).json(in_dir)
    os.makedirs(rollup, exist_ok=True)
    merge_batch(batch, 0, rollup)
    before = _rollup_rows(spark, rollup)
    merge_batch(batch, 0, rollup)  # replay of an already-committed batch
    assert _rollup_rows(spark, rollup) == before
    assert _committed_batch(rollup) == 0
    merge_batch(batch, 1, rollup)  # a genuinely new batch DOES merge
    after = _rollup_rows(spark, rollup)
    assert after != before
    assert all(after[k][0] == 2 * before[k][0] for k in before)


def test_untouched_partitions_carried_forward_by_link(spark, tmp_path):
    in_dir, rollup, ckpt = (str(tmp_path / d) for d in ("in", "rollup", "ckpt"))
    _write_events(in_dir, "b1.json", BATCH1)  # only 2024-01-01
    _run_stream(spark, in_dir, rollup, ckpt)
    v1 = os.path.join(rollup, read_pointer(rollup)["path"])
    day1_v1 = os.path.join(v1, "event_date=2024-01-01")
    inodes_v1 = {
        f: os.stat(os.path.join(day1_v1, f)).st_ino
        for f in os.listdir(day1_v1) if not f.startswith((".", "_"))
    }
    _write_events(in_dir, "b2.json", BATCH2)  # only 2024-01-02
    _run_stream(spark, in_dir, rollup, ckpt)
    v2 = os.path.join(rollup, read_pointer(rollup)["path"])
    assert v2 != v1
    assert os.path.isdir(os.path.join(v2, "event_date=2024-01-02"))
    # day-1 data files were LINKED forward, not rewritten: same inodes
    day1_v2 = os.path.join(v2, "event_date=2024-01-01")
    inodes_v2 = {
        f: os.stat(os.path.join(day1_v2, f)).st_ino
        for f in os.listdir(day1_v2) if not f.startswith((".", "_"))
    }
    assert inodes_v1 == inodes_v2


def test_crash_between_data_write_and_commit_is_safe(spark, tmp_path, monkeypatch):
    """Kill the publish between the generation write and the pointer
    flip: readers must keep seeing the previous consistent (batch_id,
    data) pair, and the replayed batch must merge exactly once."""
    import aden_hive_fork_spark.streaming.rollup_stream as rs

    in_dir, rollup = str(tmp_path / "in"), str(tmp_path / "rollup")
    _write_events(in_dir, "b1.json", BATCH1)
    batch = spark.read.schema(SCHEMA).json(in_dir)
    merge_batch(batch, 0, rollup)
    committed = _rollup_rows(spark, rollup)
    ptr_before = read_pointer(rollup)

    def _boom(*a, **kw):
        raise RuntimeError("simulated crash before pointer flip")

    monkeypatch.setattr(rs, "write_pointer", _boom)
    with pytest.raises(RuntimeError):
        merge_batch(batch, 1, rollup)  # data written, commit never lands
    monkeypatch.undo()

    # reader view is untouched: old pointer, old batch_id, old rows
    assert read_pointer(rollup) == ptr_before
    assert _committed_batch(rollup) == 0
    assert _rollup_rows(spark, rollup) == committed

    # the replay (driver restarts, batch 1 redelivered) merges ONCE —
    # the orphan generation from the crashed attempt is overwritten
    merge_batch(batch, 1, rollup)
    after = _rollup_rows(spark, rollup)
    assert _committed_batch(rollup) == 1
    assert all(after[k][0] == 2 * committed[k][0] for k in committed)


def test_vacuum_keeps_current_generation_readable(spark, tmp_path):
    in_dir, rollup = str(tmp_path / "in"), str(tmp_path / "rollup")
    _write_events(in_dir, "b1.json", BATCH1)
    batch = spark.read.schema(SCHEMA).json(in_dir)
    for b in range(4):  # four generations
        merge_batch(batch, b, rollup)
    want = _rollup_rows(spark, rollup)
    removed = vacuum_rollup(rollup, keep=1)
    assert removed == [0, 1, 2]
    # hardlinked carry-forward files survive vacuum of their origin
    assert _rollup_rows(spark, rollup) == want
