"""Streaming PSI drift monitor: frozen reference, live bin counts,
replay idempotence, streamed-equals-batch, drift detection."""

from __future__ import annotations

import json
import os

import pytest

from aden_hive_fork_spark.streaming.drift_stream import (
    freeze_reference,
    maintain_drift,
    merge_drift_batch,
    read_drift,
)

SCHEMA = "id long, v double"


def _write_jsonl(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _ref_df(spark):
    return spark.createDataFrame(
        [(i, float(i % 100)) for i in range(1000)], SCHEMA
    )


def test_freeze_then_stable_stream_near_zero_psi(spark, tmp_path):
    path, ckpt, in_dir = (str(tmp_path / d) for d in ("drift", "ckpt", "in"))
    cuts = freeze_reference(_ref_df(spark), "v", path, n_bins=5)
    assert len(cuts) == 4
    # stream data drawn from the SAME distribution
    _write_jsonl(
        in_dir, "b1.json", [{"id": i, "v": float(i % 100)} for i in range(500)]
    )
    st = spark.readStream.schema(SCHEMA).json(in_dir)
    maintain_drift(st, path, ckpt, "v").awaitTermination(120)
    out = read_drift(spark, path).collect()
    assert len(out) == 5
    assert all(abs(r["psi"]) < 0.01 for r in out)


def test_shifted_stream_detects_drift_and_replay_is_noop(spark, tmp_path):
    path, ckpt, in_dir = (str(tmp_path / d) for d in ("drift", "ckpt", "in"))
    freeze_reference(_ref_df(spark), "v", path, n_bins=5)
    shifted = [{"id": i, "v": float(60 + i % 40)} for i in range(500)]
    _write_jsonl(in_dir, "b1.json", shifted)
    st = spark.readStream.schema(SCHEMA).json(in_dir)
    maintain_drift(st, path, ckpt, "v").awaitTermination(120)
    out = read_drift(spark, path).collect()
    psi = out[0]["psi"]
    assert psi > 0.25  # top-two-quintile-only stream is a big shift
    # replaying the same batch id must not change anything
    batch = spark.createDataFrame(
        [(i, float(60 + i % 40)) for i in range(500)], SCHEMA
    )
    merge_drift_batch(batch, 0, path, "v")
    assert read_drift(spark, path).collect()[0]["psi"] == psi


def test_streamed_counts_equal_batch_rebuild(spark, tmp_path):
    path, ckpt, in_dir = (str(tmp_path / d) for d in ("drift", "ckpt", "in"))
    freeze_reference(_ref_df(spark), "v", path, n_bins=5)
    b1 = [{"id": i, "v": float(i % 100)} for i in range(200)]
    b2 = [{"id": 1000 + i, "v": float(50 + i % 50)} for i in range(300)]
    _write_jsonl(in_dir, "b1.json", b1)
    st = spark.readStream.schema(SCHEMA).json(in_dir)
    maintain_drift(st, path, ckpt, "v").awaitTermination(120)
    _write_jsonl(in_dir, "b2.json", b2)
    st = spark.readStream.schema(SCHEMA).json(in_dir)
    maintain_drift(st, path, ckpt, "v").awaitTermination(120)
    streamed = {
        r["bin"]: r["n_cur"] for r in read_drift(spark, path).collect()
    }
    # batch twin over the union
    path2 = str(tmp_path / "drift2")
    freeze_reference(_ref_df(spark), "v", path2, n_bins=5)
    allrows = spark.createDataFrame(
        [(r["id"], r["v"]) for r in b1 + b2], SCHEMA
    )
    merge_drift_batch(allrows, 0, path2, "v")
    rebuilt = {
        r["bin"]: r["n_cur"] for r in read_drift(spark, path2).collect()
    }
    assert streamed == rebuilt


def test_merge_without_reference_raises(spark, tmp_path):
    batch = spark.createDataFrame([(1, 1.0)], SCHEMA)
    with pytest.raises(FileNotFoundError):
        merge_drift_batch(batch, 0, str(tmp_path / "nope"), "v")
