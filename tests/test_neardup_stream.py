"""Incremental streaming near-dup filter: batch-internal min-id
canonicalization, history suppression across batches, replay
idempotence — the crawl-ingestion dedup contract."""

from __future__ import annotations

import json
import os


SCHEMA = "doc_id long, text string"

_BASE = ("the quick brown fox jumps over the lazy dog while the band "
         "plays on and the crowd cheers loudly tonight")
_OTHER = ("completely different content about distributed query "
          "engines shuffling partitions across executors at scale")


def _mutate(text, n):
    words = text.split()
    for i in range(n):
        words[3 + i] = f"mut{i}"
    return " ".join(words)


def _write_jsonl(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/{name}", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _run(spark, in_dir, dd_dir, ckpt):
    from aden_hive_fork_spark.streaming.neardup_stream import (
        maintain_neardup_filter,
    )

    q = maintain_neardup_filter(
        spark.readStream.schema(SCHEMA).json(in_dir), dd_dir, ckpt,
        "doc_id", "text", threshold=0.5,
    )
    q.awaitTermination(120)


def test_streamed_neardup_filters_within_and_across_batches(
    spark, tmp_path
):
    from aden_hive_fork_spark.streaming.neardup_stream import read_accepted

    in_dir, dd_dir, ckpt = (str(tmp_path / d) for d in ("in", "dd", "ck"))
    # batch 1: original + its in-batch near-dup + an unrelated doc
    b1 = [
        {"doc_id": 1, "text": _BASE},
        {"doc_id": 2, "text": _mutate(_BASE, 1)},   # near-dup of 1
        {"doc_id": 3, "text": _OTHER},
    ]
    _write_jsonl(in_dir, "b1.json", b1)
    _run(spark, in_dir, dd_dir, ckpt)
    acc1 = {r["doc_id"] for r in read_accepted(spark, dd_dir).collect()}
    assert acc1 == {1, 3}  # min id survives the in-batch cluster

    # batch 2: a near-dup of HISTORY (doc 1) + a genuinely new doc
    b2 = [
        {"doc_id": 10, "text": _mutate(_BASE, 2)},  # near-dup of history
        {"doc_id": 11, "text": _OTHER.replace("engines", "systems")
                               + " with brand new additional words here"},
    ]
    _write_jsonl(in_dir, "b2.json", b2)
    _run(spark, in_dir, dd_dir, ckpt)
    acc2 = {r["doc_id"] for r in read_accepted(spark, dd_dir).collect()}
    assert 10 not in acc2           # suppressed by the persisted index
    assert acc2 == {1, 3, 11}


def test_neardup_batch_replay_is_noop(spark, tmp_path):
    from aden_hive_fork_spark.operators.layout import read_pointer
    from aden_hive_fork_spark.streaming.neardup_stream import (
        neardup_filter_batch, read_accepted,
    )

    dd_dir = str(tmp_path / "dd")
    os.makedirs(dd_dir, exist_ok=True)
    b = spark.createDataFrame(
        [(1, _BASE), (2, _OTHER)], SCHEMA
    )
    neardup_filter_batch(b, 0, dd_dir, "doc_id", "text")
    v0 = read_pointer(dd_dir)["version"]
    acc0 = sorted(r["doc_id"] for r in read_accepted(spark, dd_dir).collect())
    neardup_filter_batch(b, 0, dd_dir, "doc_id", "text")  # replay
    assert read_pointer(dd_dir)["version"] == v0
    assert sorted(
        r["doc_id"] for r in read_accepted(spark, dd_dir).collect()
    ) == acc0 == [1, 2]
