"""Incremental rollup maintenance: streamed merges must equal the
batch rebuild, replays must be no-ops, and untouched date partitions
must not be rewritten."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from aden_hive_fork_spark.streaming.rollup_stream import (
    _read_commit,
    maintain_rollup,
    merge_batch,
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
        for r in spark.read.parquet(rollup).collect()
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
        for r in spark.read.parquet(rollup)
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
    assert _read_commit(rollup) == 0
    merge_batch(batch, 1, rollup)  # a genuinely new batch DOES merge
    after = _rollup_rows(spark, rollup)
    assert after != before
    assert all(after[k][0] == 2 * before[k][0] for k in before)


def test_untouched_partitions_not_rewritten(spark, tmp_path):
    in_dir, rollup, ckpt = (str(tmp_path / d) for d in ("in", "rollup", "ckpt"))
    _write_events(in_dir, "b1.json", BATCH1)  # only 2024-01-01
    _run_stream(spark, in_dir, rollup, ckpt)
    day1 = os.path.join(rollup, "event_date=2024-01-01")
    stamps = {
        f: os.path.getmtime(os.path.join(day1, f)) for f in os.listdir(day1)
    }
    _write_events(in_dir, "b2.json", BATCH2)  # only 2024-01-02
    _run_stream(spark, in_dir, rollup, ckpt)
    assert os.path.isdir(os.path.join(rollup, "event_date=2024-01-02"))
    # dynamic partition overwrite left day-1 files byte-for-byte alone
    assert stamps == {
        f: os.path.getmtime(os.path.join(day1, f)) for f in os.listdir(day1)
    }
