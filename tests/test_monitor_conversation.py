"""Tests: conversation store/compaction/handoff, stall + doom-loop
detection, rule-based judge, await_event."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from aden_hive_fork_spark.state.conversation import (
    CONVERSATION_SCHEMA,
    append_messages,
    compact_conversation,
    context_handoff,
)
from aden_hive_fork_spark.state.monitor import (
    detect_doom_loops,
    detect_stalls,
    judge_nodes,
)


@pytest.fixture(scope="module")
def convo(spark):
    rows = [
        # c1: 10 messages x 100 tokens = 1000 (vs budget 1000 -> tier 2)
        *[("c1", i, "user" if i % 2 else "assistant", "text", f"msg {i}", 100)
          for i in range(1, 11)],
        # c2: small, under budget -> untouched
        ("c2", 1, "user", "text", "hello", 10),
        ("c2", 2, "assistant", "text", "hi", 10),
        # c3: 85% of budget with tool results -> tier 1
        *[("c3", i, "assistant", "tool_result" if i <= 4 else "text",
           f"payload {i}", 100) for i in range(1, 9)],
        ("c3", 9, "user", "text", "latest", 50),
    ]
    return spark.createDataFrame(rows, CONVERSATION_SCHEMA)


def test_append_messages_renumbers(spark, convo):
    new = spark.createDataFrame(
        [("c2", 1, "user", "text", "more", 5), ("c2", 2, "assistant", "text", "sure", 5)],
        CONVERSATION_SCHEMA,
    )
    out = append_messages(convo, new)
    seqs = [r.seq for r in out.filter("conv_id = 'c2'").orderBy("seq").collect()]
    assert seqs == [1, 2, 3, 4]  # continued, not colliding


def test_compaction_tiers(convo):
    out = compact_conversation(convo, token_budget=1000, keep_recent=4)
    by_conv = {}
    for r in out.collect():
        by_conv.setdefault(r.conv_id, []).append(r)
    # c2 untouched
    assert sorted(r.seq for r in by_conv["c2"]) == [1, 2]
    # c1 at 100% -> tier 2: last 2 kept + 1 summary
    c1 = sorted(by_conv["c1"], key=lambda r: r.seq)
    assert [r.seq for r in c1] == [0, 9, 10]
    assert c1[0].kind == "summary" and "msg 1" in c1[0].content
    # c3 at 85% -> tier 1: last 4 kept, old tool_results DROPPED from summary
    c3 = sorted(by_conv["c3"], key=lambda r: r.seq)
    assert [r.seq for r in c3] == [0, 6, 7, 8, 9]
    assert "payload 3" not in c3[0].content   # tool_result pruned
    assert "payload 5" in c3[0].content       # old text folded in


def test_compaction_emergency(spark):
    rows = [("cx", i, "user", "text", f"m{i}", 500) for i in range(1, 5)]  # 200%
    conv = spark.createDataFrame(rows, CONVERSATION_SCHEMA)
    out = compact_conversation(conv, token_budget=1000).collect()
    seqs = sorted(r.seq for r in out)
    assert seqs == [0, 4]  # keep-1 + summary


def test_context_handoff(convo):
    h = {(r.conv_id, r.role): r for r in context_handoff(convo, head=3, tail=3).collect()}
    assert h[("c1", "assistant")].seq == 10
    assert h[("c2", "user")].summary == "hello"
    long = h[("c1", "user")]
    assert " … " not in long.summary or len(long.summary) <= 9 + 3


def test_detect_stalls(spark):
    from aden_hive_fork_spark.state.logstore import L3_SCHEMA

    rows = [
        ("r1", "n1", 0, "same answer", 1, 1, 1, "CONTINUE", None),
        ("r1", "n1", 1, "same answer", 1, 1, 1, "CONTINUE", None),
        ("r1", "n1", 2, "same answer", 1, 1, 1, "CONTINUE", None),
        ("r1", "n1", 3, "different", 1, 1, 1, "ACCEPT", None),
        ("r1", "n2", 0, "same answer", 1, 1, 1, "CONTINUE", None),  # different node
        ("r2", "n1", 0, "a", 1, 1, 1, "CONTINUE", None),
        ("r2", "n1", 1, "b", 1, 1, 1, "CONTINUE", None),
    ]
    l3 = spark.createDataFrame(rows, L3_SCHEMA)
    stalls = detect_stalls(l3, threshold=3).collect()
    assert len(stalls) == 1
    s = stalls[0]
    assert (s.run_id, s.node_id, s.streak_len, s.first_step, s.last_step) == ("r1", "n1", 3, 0, 2)


def test_detect_doom_loops(spark):
    rows = [
        ("r1", "n1", 0, "search", '{"q": "x"}'),
        ("r1", "n1", 1, "search", '{"q": "x"}'),
        ("r1", "n1", 2, "search", '{"q": "x"}'),
        ("r1", "n1", 3, "search", '{"q": "y"}'),  # different input breaks streak
    ]
    tc = spark.createDataFrame(
        rows, "run_id string, node_id string, step_index int, tool_name string, tool_input string"
    )
    loops = detect_doom_loops(tc, threshold=3).collect()
    assert len(loops) == 1 and loops[0].streak_len == 3 and loops[0].tool_name == "search"


def test_judge_nodes(spark):
    from aden_hive_fork_spark.state.logstore import L2_SCHEMA

    rows = [
        ("r1", "ok", 0, "t", True, None, 3, 1, 1, 1, 1, "success", False, []),
        ("r1", "retry", 1, "t", False, "e", 3, 1, 1, 1, 1, "failure", False, []),
        ("r1", "esc", 2, "t", False, "e", 3, 1, 1, 1, 3, "failure", False, []),
    ]
    import pyspark.sql.functions as F
    l2 = spark.createDataFrame(rows, L2_SCHEMA).withColumn(
        "retry_count", F.when(F.col("node_id") == "esc", 3).otherwise(1)
    ).withColumn("escalate_count", F.lit(0))
    v = {r.node_id: r.verdict for r in judge_nodes(l2).collect()}
    assert v == {"ok": "ACCEPT", "retry": "RETRY", "esc": "ESCALATE"}


def test_await_event(spark, tmp_path):
    from aden_hive_fork_spark.streaming import await_event, read_event_stream

    src = tmp_path / "src"
    src.mkdir()
    with open(src / "b.json", "w") as fh:
        fh.write(json.dumps({
            "event_id": 1, "ts": "2024-01-01 10:00:00", "user_id": 1,
            "event_type": "done", "value": 1.0, "props": "{}",
            "stream_id": "s1", "node_id": "n", "execution_id": "e"}) + "\n")
    stream = read_event_stream(spark, str(src))
    rows = await_event(stream, timeout_sec=60, event_types=["done"])
    assert rows and rows[0].event_id == 1
    rows = await_event(stream, timeout_sec=2, sink_table="_await2",
                       event_types=["never_happens"])
    assert rows == []
