"""Streaming sequence packing (streaming/packing_stream): streamed
layout == batch pack_token_stream bit-exact, window continuation
across batch boundaries, replay idempotence."""

from __future__ import annotations

import json
import os

import pytest

from aden_hive_fork_spark.operators.packing import pack_token_stream
from aden_hive_fork_spark.streaming.packing_stream import (
    init_packing,
    maintain_packing,
    merge_packing_batch,
    read_packed,
)

SCHEMA = "doc_id bigint, n_tok int"


def _write_jsonl(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as fh:
        for doc_id, n in rows:
            fh.write(json.dumps({"doc_id": doc_id, "n_tok": n}) + "\n")


def _rows(df):
    return sorted(
        (r["doc_id"], r["window_id"], r["doc_offset"], r["win_offset"],
         r["n_tokens"])
        for r in df.collect()
    )


def test_streamed_equals_batch_bitexact_across_boundaries(spark, tmp_path):
    path, ckpt, in_dir = (str(tmp_path / d) for d in ("pack", "ckpt", "in"))
    init_packing(spark, path, capacity=16)
    # batch 1 ends mid-window (7+9+10 = 26 tokens -> window 1 is half
    # full); batch 2 must CONTINUE window 1, not restart it
    b1 = [(1, 7), (2, 9), (3, 10)]
    b2 = [(4, 3), (5, 20)]
    _write_jsonl(in_dir, "b1.json", b1)
    st = spark.readStream.schema(SCHEMA).json(in_dir)
    maintain_packing(st, path, ckpt, "doc_id", "n_tok").awaitTermination(120)
    _write_jsonl(in_dir, "b2.json", b2)
    st = spark.readStream.schema(SCHEMA).json(in_dir)
    maintain_packing(st, path, ckpt, "doc_id", "n_tok").awaitTermination(120)

    streamed = _rows(read_packed(spark, path))
    batch = _rows(
        pack_token_stream(
            spark.createDataFrame(b1 + b2, SCHEMA), "doc_id", "n_tok", 16
        )
    )
    assert streamed == batch
    # doc 4 (first of batch 2) starts at stream pos 26 -> window 1
    doc4 = [r for r in streamed if r[0] == 4]
    assert doc4 == [(4, 1, 0, 10, 3)]


def test_replay_is_noop_and_offset_advances(spark, tmp_path):
    path = str(tmp_path / "pack")
    init_packing(spark, path, capacity=8)
    b = spark.createDataFrame([(1, 5), (2, 6)], SCHEMA)
    merge_packing_batch(b, 0, path, "doc_id", "n_tok")
    once = _rows(read_packed(spark, path))
    merge_packing_batch(b, 0, path, "doc_id", "n_tok")  # replay
    assert _rows(read_packed(spark, path)) == once
    # a NEW batch id appends at the committed offset (11 tokens so far)
    merge_packing_batch(
        spark.createDataFrame([(3, 4)], SCHEMA), 1, path, "doc_id", "n_tok"
    )
    rows = {r[0]: r for r in _rows(read_packed(spark, path))}
    assert rows[3] == (3, 1, 0, 3, 4)  # starts at pos 11 -> window 1


def test_merge_without_init_raises(spark, tmp_path):
    b = spark.createDataFrame([(1, 5)], SCHEMA)
    with pytest.raises(FileNotFoundError):
        merge_packing_batch(b, 0, str(tmp_path / "nope"), "doc_id", "n_tok")


def test_capacity_validation(spark, tmp_path):
    with pytest.raises(ValueError):
        init_packing(spark, str(tmp_path / "p"), capacity=0)
