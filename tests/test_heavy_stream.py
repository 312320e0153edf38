"""Streaming Misra-Gries maintenance: the summary must hold every
truly-frequent value with weights within the n/(k+1) undercount
bound, survive replays as no-ops, and track n_total in the pointer."""

from __future__ import annotations

import json
import os


SCHEMA = "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"


def _write_jsonl(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/{name}", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _ev(i, t):
    return {"event_id": i, "ts": "2024-01-01T00:00:00", "user_id": i,
            "event_type": t, "value": 1.0}


def _df(spark, rows):
    import datetime as dt

    typed = [dict(r, ts=dt.datetime.fromisoformat(r["ts"])) for r in rows]
    return spark.createDataFrame(typed, SCHEMA)


def test_streamed_heavy_holds_frequent_values(spark, tmp_path):
    from aden_hive_fork_spark.operators.layout import read_pointer
    from aden_hive_fork_spark.streaming.heavy_stream import (
        maintain_heavy, read_heavy,
    )

    in_dir, hh_dir, ckpt = (str(tmp_path / d) for d in ("in", "hh", "ck"))
    # "hot" appears 300× across two batches among 200 singletons;
    # k=8 → undercount bound n/(k+1) = 500/9 ≈ 55 — hot must survive
    b1 = [_ev(i, "hot") for i in range(150)] + [
        _ev(1000 + i, f"rare{i}") for i in range(100)
    ]
    b2 = [_ev(i, "hot") for i in range(150)] + [
        _ev(2000 + i, f"solo{i}") for i in range(100)
    ]
    _write_jsonl(in_dir, "b1.json", b1)
    q = maintain_heavy(
        spark.readStream.schema(SCHEMA).json(in_dir), hh_dir, ckpt,
        "event_type", k=8,
    )
    q.awaitTermination(120)
    _write_jsonl(in_dir, "b2.json", b2)
    q = maintain_heavy(
        spark.readStream.schema(SCHEMA).json(in_dir), hh_dir, ckpt,
        "event_type", k=8,
    )
    q.awaitTermination(120)

    summary = {r["value"]: r["weight"]
               for r in read_heavy(spark, hh_dir).collect()}
    ptr = read_pointer(hh_dir)
    assert ptr["n_total"] == 500
    assert len(summary) <= 8
    assert "hot" in summary
    # weight is a lower bound within the MG undercount envelope
    assert 300 - 500 // 9 - 1 <= summary["hot"] <= 300


def test_heavy_batch_replay_is_noop(spark, tmp_path):
    from aden_hive_fork_spark.operators.layout import read_pointer
    from aden_hive_fork_spark.streaming.heavy_stream import (
        merge_heavy_batch, read_heavy,
    )

    hh_dir = str(tmp_path / "hh")
    os.makedirs(hh_dir, exist_ok=True)
    b = _df(spark, [_ev(i, "x") for i in range(50)])
    merge_heavy_batch(b, 0, hh_dir, "event_type", 4)
    v0 = read_pointer(hh_dir)
    w0 = read_heavy(spark, hh_dir).collect()[0]["weight"]
    merge_heavy_batch(b, 0, hh_dir, "event_type", 4)  # replay
    assert read_pointer(hh_dir)["version"] == v0["version"]
    assert read_pointer(hh_dir)["n_total"] == 50
    assert read_heavy(spark, hh_dir).collect()[0]["weight"] == w0
