"""Streaming telemetry rollup (streaming/telemetry_stream): streamed
L2 state == batch aggregate_l3_to_l2 bit-exact, merge across batch
boundaries, replay idempotence, builder analytics on live state."""

from __future__ import annotations

import json
import os

import pytest

from aden_hive_fork_spark.state.logstore import aggregate_l3_to_l2
from aden_hive_fork_spark.streaming.telemetry_stream import (
    init_telemetry,
    maintain_telemetry,
    merge_telemetry_batch,
    read_node_detail,
)

L3_SCHEMA = (
    "run_id string, node_id string, step_index int, llm_text string,"
    " input_tokens long, output_tokens long, latency_ms long,"
    " verdict string, error string"
)


def _steps(run, node, specs):
    # specs: list of (step_index, verdict, error, in_tok, out_tok, ms)
    return [
        (run, node, i, f"txt{i}", it, ot, ms, v, e)
        for (i, v, e, it, ot, ms) in specs
    ]


def _write_jsonl(path, name, rows):
    os.makedirs(path, exist_ok=True)
    cols = [c.split()[0] for c in L3_SCHEMA.split(", ")]
    with open(os.path.join(path, name), "w") as fh:
        for r in rows:
            fh.write(json.dumps(dict(zip(cols, r))) + "\n")


ALL_STEPS = (
    # run1/plan: 2 ACCEPT steps, no error
    _steps("run1", "plan", [(1, "ACCEPT", None, 10, 5, 100),
                            (2, "ACCEPT", None, 12, 6, 110)])
    # run1/act: error at step 3 then RETRY at 4 with another error —
    # first_error must stay step 3's even when step 4 arrives in an
    # EARLIER micro-batch
    + _steps("run1", "act", [(4, "RETRY", "late error", 1, 1, 50)])
    + _steps("run1", "act", [(3, "ESCALATE", "early error", 2, 2, 60)])
    + _steps("run2", "plan", [(1, "CONTINUE", None, 7, 3, 80)])
)


def test_streamed_state_equals_batch_rollup_bitexact(spark, tmp_path):
    path, ckpt, in_dir = (str(tmp_path / d) for d in ("tel", "ckpt", "in"))
    init_telemetry(spark, path)
    # split so run1/act's steps 4 and 3 land in DIFFERENT batches,
    # with the later step_index arriving first
    _write_jsonl(in_dir, "b1.json", ALL_STEPS[:3])  # plan x2 + act step4
    st = spark.readStream.schema(L3_SCHEMA).json(in_dir)
    maintain_telemetry(st, path, ckpt).awaitTermination(120)
    _write_jsonl(in_dir, "b2.json", ALL_STEPS[3:])  # act step3 + run2
    st = spark.readStream.schema(L3_SCHEMA).json(in_dir)
    maintain_telemetry(st, path, ckpt).awaitTermination(120)

    streamed = {
        (r["run_id"], r["node_id"]): r.asDict()
        for r in read_node_detail(spark, path).collect()
    }
    batch = {
        (r["run_id"], r["node_id"]): r.asDict()
        for r in aggregate_l3_to_l2(
            spark.createDataFrame(ALL_STEPS, L3_SCHEMA)
        ).collect()
    }
    assert streamed == batch  # every column, bit for bit
    act = streamed[("run1", "act")]
    assert act["first_error"] == "early error"  # min across batches
    assert act["total_steps"] == 2
    assert act["escalate_count"] == 1 and act["retry_count"] == 1


def test_replay_is_noop(spark, tmp_path):
    path = str(tmp_path / "tel")
    init_telemetry(spark, path)
    b = spark.createDataFrame(ALL_STEPS[:3], L3_SCHEMA)
    merge_telemetry_batch(b, 0, path)
    before = sorted(
        map(str, read_node_detail(spark, path).collect())
    )
    merge_telemetry_batch(b, 0, path)  # same batch id
    after = sorted(map(str, read_node_detail(spark, path).collect()))
    assert before == after


def test_merge_without_init_raises(spark, tmp_path):
    b = spark.createDataFrame(ALL_STEPS[:1], L3_SCHEMA)
    with pytest.raises(FileNotFoundError):
        merge_telemetry_batch(b, 0, str(tmp_path / "nope"))


def test_builder_analytics_on_live_state(spark, tmp_path):
    """get_node_performance consumes the streamed L2 directly."""
    from aden_hive_fork_spark.state.builder_query import get_node_performance

    path = str(tmp_path / "tel")
    init_telemetry(spark, path)
    merge_telemetry_batch(
        spark.createDataFrame(ALL_STEPS, L3_SCHEMA), 0, path
    )
    # success derived the logstore way: no escalations and no error
    from pyspark.sql import functions as F

    l2 = read_node_detail(spark, path).withColumn(
        "success",
        (F.col("escalate_count") == 0) & F.col("first_error").isNull(),
    )
    perf = {r["node_id"]: r for r in get_node_performance(l2).collect()}
    assert perf["plan"]["total_decisions"] == 2  # two runs' plan rows
    assert perf["plan"]["success_rate"] == pytest.approx(1.0)
    assert perf["act"]["success_rate"] == 0.0
