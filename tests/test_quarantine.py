"""Streaming dead-letter split tests: valid/reject routing with
reasons, replay idempotence via batch-keyed overwrite, multi-batch
accumulation."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from aden_hive_fork_spark.streaming.quarantine import (
    quarantined_sink,
    read_quarantine,
    read_valid,
)

SCHEMA = "id bigint, amount double, label string"


def write_jsonl(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def start(spark, src, out):
    stream = (
        spark.readStream.schema("id string, amount string, label string")
        .json(src)
    )
    return quarantined_sink(
        stream, SCHEMA,
        valid_dir=f"{out}/valid",
        quarantine_dir=f"{out}/quarantine",
        checkpoint_dir=f"{out}/ckpt",
        required=["id", "amount"],
    )


def test_quarantine_split_and_reasons(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    write_jsonl(f"{src}/a.jsonl", [
        {"id": "1", "amount": "10.5", "label": "ok"},
        {"id": "2", "amount": "not-a-number", "label": "bad-amount"},
        {"id": None, "amount": "3.0", "label": "bad-id"},
    ])
    q = start(spark, src, out)
    q.awaitTermination(120)

    valid = read_valid(spark, f"{out}/valid").collect()
    assert len(valid) == 1
    assert valid[0]["id"] == 1 and valid[0]["amount"] == 10.5

    bad = {r["label"]: r for r in
           read_quarantine(spark, f"{out}/quarantine").collect()}
    assert set(bad) == {"bad-amount", "bad-id"}
    # originals preserved + field-level reasons
    assert bad["bad-amount"]["amount"] == "not-a-number"
    assert any("amount" in r for r in bad["bad-amount"]["_reasons"])
    assert any("id" in r for r in bad["bad-id"]["_reasons"])


def test_quarantine_multi_batch_and_idempotent_replay(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    write_jsonl(f"{src}/a.jsonl", [
        {"id": "1", "amount": "1.0", "label": "a"},
        {"id": "x", "amount": "1.0", "label": "bad"},
    ])
    q = start(spark, src, out)
    q.awaitTermination(120)
    # second file → second batch under the SAME checkpoint
    write_jsonl(f"{src}/b.jsonl", [
        {"id": "2", "amount": "2.0", "label": "b"},
    ])
    q = start(spark, src, out)
    q.awaitTermination(120)
    ids = sorted(r["id"] for r in read_valid(spark, f"{out}/valid").collect())
    assert ids == [1, 2]
    assert read_quarantine(spark, f"{out}/quarantine").count() == 1

    # replay: restart with the SAME checkpoint and no new data —
    # batch-keyed overwrite must leave contents unchanged
    q = start(spark, src, out)
    q.awaitTermination(120)
    assert sorted(
        r["id"] for r in read_valid(spark, f"{out}/valid").collect()
    ) == [1, 2]
    assert read_quarantine(spark, f"{out}/quarantine").count() == 1
