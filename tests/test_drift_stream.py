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


# --- streaming exact 1-Wasserstein (round 8) --------------------------------


def test_wasserstein_streamed_equals_batch_bitexact(spark, tmp_path):
    from aden_hive_fork_spark.operators.stats import wasserstein_1d
    from aden_hive_fork_spark.streaming.drift_stream import (
        freeze_wasserstein_reference,
        maintain_wasserstein,
        read_wasserstein,
    )

    path, ckpt, in_dir = (str(tmp_path / d) for d in ("w1", "ckpt", "in"))
    ref_rows = [(i, round(i % 100 + 0.25, 2)) for i in range(400)]
    freeze_wasserstein_reference(
        spark.createDataFrame(ref_rows, SCHEMA), "v", path, scale=2
    )
    b1 = [{"id": i, "v": round(30 + i % 70 + 0.5, 2)} for i in range(250)]
    b2 = [{"id": 900 + i, "v": round(i % 40 + 0.75, 2)} for i in range(150)]
    _write_jsonl(in_dir, "b1.json", b1)
    st = spark.readStream.schema(SCHEMA).json(in_dir)
    maintain_wasserstein(st, path, ckpt, "v").awaitTermination(120)
    _write_jsonl(in_dir, "b2.json", b2)
    st = spark.readStream.schema(SCHEMA).json(in_dir)
    maintain_wasserstein(st, path, ckpt, "v").awaitTermination(120)
    streamed = read_wasserstein(spark, path).collect()[0]

    # batch twin: wasserstein_1d over ref ∪ stream with group labels
    both = spark.createDataFrame(
        [(float(v), "ref") for _, v in ref_rows]
        + [(r["v"], "cur") for r in b1 + b2],
        "v double, g string",
    )
    batch = wasserstein_1d(both, "v", "g", "ref", "cur", scale=2).collect()[0]
    assert streamed["n_a"] == batch["n_a"] == 400
    assert streamed["n_b"] == batch["n_b"] == 400
    assert streamed["w1"] == batch["w1"]  # bit-exact, not approx


def test_wasserstein_replay_is_noop_and_identity_is_zero(spark, tmp_path):
    from aden_hive_fork_spark.streaming.drift_stream import (
        freeze_wasserstein_reference,
        merge_wasserstein_batch,
        read_wasserstein,
    )

    path = str(tmp_path / "w1")
    ref = spark.createDataFrame(
        [(i, float(i % 50)) for i in range(500)], SCHEMA
    )
    freeze_wasserstein_reference(ref, "v", path, scale=2)
    merge_wasserstein_batch(ref, 0, path, "v")  # identical distribution
    out = read_wasserstein(spark, path).collect()[0]
    assert out["w1"] == 0.0
    # replaying the committed batch id changes nothing
    shifted = spark.createDataFrame([(1, 999.0)], SCHEMA)
    merge_wasserstein_batch(shifted, 0, path, "v")
    assert read_wasserstein(spark, path).collect()[0]["w1"] == 0.0


def test_wasserstein_merge_without_reference_raises(spark, tmp_path):
    from aden_hive_fork_spark.streaming.drift_stream import (
        merge_wasserstein_batch,
    )

    batch = spark.createDataFrame([(1, 1.0)], SCHEMA)
    with pytest.raises(FileNotFoundError):
        merge_wasserstein_batch(batch, 0, str(tmp_path / "nope"), "v")
