"""Streaming rolling z-score: live twin of the batch operator."""

from __future__ import annotations

import json
import os


def _write_jsonl(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _series():
    # flat series with two spikes; keys interleaved
    rows = []
    for i in range(30):
        v = 100.0
        if i == 20:
            v = 500.0
        rows.append({"k": "a", "t": f"{i:04d}", "x": v})
        rows.append({"k": "b", "t": f"{i:04d}", "x": 50.0 if i != 25 else 9.0})
    return rows


def test_streaming_zscore_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from aden_hive_fork_spark.operators.timeseries import rolling_zscore
    from aden_hive_fork_spark.streaming.anomaly import streaming_zscore

    rows = _series()
    src = str(tmp_path / "src")
    _write_jsonl(f"{src}/a.jsonl", rows[: len(rows) // 2])
    _write_jsonl(f"{src}/b.jsonl", rows[len(rows) // 2:])

    stream = spark.readStream.schema("k string, t string, x double").json(src)
    flagged = streaming_zscore(stream, "k", "t", "x", window=5,
                               z_threshold=1.5)
    q = (
        flagged.writeStream.format("memory").queryName("anoms")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["k"], r["t"]): (r["value"], r["z"])
           for r in spark.sql("SELECT * FROM anoms").collect()}

    batch = spark.createDataFrame(
        [(r["k"], r["t"], r["x"]) for r in rows], "k string, t string, x double"
    )
    expected = {
        (r["k"], r["t"]): (r["x"], r["z"])
        for r in rolling_zscore(batch, ["k"], "t", "x", window=5,
                                z_threshold=1.5).collect()
    }
    assert set(got) == set(expected)          # same anomaly set
    for key in got:
        assert got[key][0] == expected[key][0]
        assert abs(got[key][1] - expected[key][1]) < 1e-6
    assert ("a", "0020") in got and ("b", "0025") in got


def test_streaming_zscore_state_bounded_across_batches(spark, tmp_path):
    from aden_hive_fork_spark.streaming.anomaly import streaming_zscore

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    # batch 1: warm-up only, no anomaly
    _write_jsonl(f"{src}/a.jsonl",
                 [{"k": "a", "t": f"{i:04d}", "x": 10.0} for i in range(6)])

    def run():
        stream = spark.readStream.schema(
            "k string, t string, x double").json(src)
        flagged = streaming_zscore(stream, "k", "t", "x", window=4,
                                   z_threshold=1.0)
        q = (flagged.writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run()
    assert spark.read.parquet(out).count() == 0
    # batch 2: the spike arrives later — the state store carried the
    # trailing window across the restart
    _write_jsonl(f"{src}/b.jsonl", [{"k": "a", "t": "0006", "x": 99.0}])
    run()
    rows = spark.read.parquet(out).collect()
    assert [(r["k"], r["t"]) for r in rows] == [("a", "0006")]
