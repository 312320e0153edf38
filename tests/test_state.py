"""Framework-analog layer tests: shared state hierarchy, log-store
star schema (incl. the L1=agg(L2) invariant), outcome metrics,
checkpoints, dataflow graphs."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from aden_hive_fork_spark.state import (
    aggregate_l2_to_l1,
    aggregate_l3_to_l2,
    criterion_progress,
    latest_state,
    list_checkpoints,
    list_runs,
    load_checkpoint,
    node_drilldown,
    outcome_metrics,
    prune_checkpoints,
    read_resolved,
    recent_changes,
    recent_decisions,
    relevance_pairs,
    save_checkpoint,
)
from aden_hive_fork_spark.state.shared_state import CHANGELOG_SCHEMA


# ---------------------------------------------------------------------------
# shared state
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def changelog(spark):
    rows = [
        ("global", "", "model", "m1", 1),
        ("global", "", "budget", "100", 2),
        ("stream", "s1", "model", "m2", 3),
        ("execution", "e1", "model", "m3", 4),
        ("global", "", "model", "m1b", 5),        # later global write
        ("execution", "e1", "model", "m3b", 6),   # later exec write
        ("stream", "s1", "topic", "news", 7),
    ]
    return spark.createDataFrame(rows, CHANGELOG_SCHEMA)


def test_latest_state(changelog):
    latest = {
        (r.scope, r.scope_id, r.key): r.value for r in latest_state(changelog).collect()
    }
    assert latest[("execution", "e1", "model")] == "m3b"
    assert latest[("global", "", "model")] == "m1b"
    assert len(latest) == 5


def test_read_resolution_hierarchy(changelog):
    # execution -> stream -> global (shared_state.py:152-182 semantics)
    got = {r.key: (r.value, r.resolved_scope)
           for r in read_resolved(changelog, "e1", "s1").collect()}
    assert got["model"] == ("m3b", "execution")
    assert got["topic"] == ("news", "stream")
    assert got["budget"] == ("100", "global")
    # different execution: falls back to stream
    got = {r.key: (r.value, r.resolved_scope)
           for r in read_resolved(changelog, "eX", "s1").collect()}
    assert got["model"] == ("m2", "stream")
    # no stream either: global
    got = {r.key: (r.value, r.resolved_scope)
           for r in read_resolved(changelog, "eX", "sX").collect()}
    assert got["model"] == ("m1b", "global")


def test_recent_changes_audit(changelog):
    changes = recent_changes(changelog, limit=3).collect()
    assert [c.seq for c in changes] == [7, 6, 5]
    by_seq = {c.seq: c for c in changes}
    assert by_seq[6].old == "m3" and by_seq[6].new == "m3b"
    assert by_seq[7].old is None


# ---------------------------------------------------------------------------
# log store
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def l3(spark):
    rows = [
        ("r1", "plan", 0, "think", 10, 5, 100, "CONTINUE", None),
        ("r1", "plan", 1, "done", 20, 8, 120, "ACCEPT", None),
        ("r1", "act", 0, "do", 30, 12, 300, "RETRY", "tool failed"),
        ("r1", "act", 1, "do2", 15, 6, 200, "ACCEPT", None),
        ("r2", "plan", 0, "think", 5, 2, 80, "ACCEPT", None),
    ]
    from aden_hive_fork_spark.state.logstore import L3_SCHEMA

    return spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4], r[5], r[6], r[7], r[8]) for r in rows], L3_SCHEMA
    )


def test_l3_to_l2(l3):
    l2 = {(r.run_id, r.node_id): r for r in aggregate_l3_to_l2(l3).collect()}
    act = l2[("r1", "act")]
    assert act.total_steps == 2 and act.input_tokens == 45
    assert act.retry_count == 1 and act.accept_count == 1
    assert act.first_error == "tool failed"
    assert l2[("r1", "plan")].first_error is None


def test_l2_to_l1_invariant(spark):
    from aden_hive_fork_spark.state.logstore import L2_SCHEMA

    l2_rows = [
        ("r1", "plan", 0, "event_loop", True, None, 2, 30, 13, 220, 1, "success", False, []),
        ("r1", "act", 1, "event_loop", False, "boom", 2, 45, 18, 500, 2, "failure", True, ["err"]),
    ]
    l2 = spark.createDataFrame(l2_rows, L2_SCHEMA)
    l1 = aggregate_l2_to_l1(l2).collect()[0]
    assert l1.total_nodes_executed == 2
    assert l1.node_path == ["plan", "act"]          # ordered by node_seq
    assert l1.total_input_tokens == 75               # L1 == sum(L2)
    assert l1.status == "failure"
    assert l1.needs_attention is True
    assert l1.attention_reasons == ["err"]


def test_list_runs_filters(spark):
    from aden_hive_fork_spark.state.logstore import L1_SCHEMA

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("r1", "a", "success", 1, ["n"], 1, 1, False, [], t0, 10),
        ("r2", "a", "failure", 1, ["n"], 1, 1, True, ["x"], t0 + dt.timedelta(hours=1), 10),
        ("r3", "a", "success", 1, ["n"], 1, 1, False, [], t0 + dt.timedelta(hours=2), 10),
    ]
    l1 = spark.createDataFrame(rows, L1_SCHEMA)
    assert [r.run_id for r in list_runs(l1).collect()] == ["r3", "r2", "r1"]
    assert [r.run_id for r in list_runs(l1, status="success").collect()] == ["r3", "r1"]
    assert [r.run_id for r in list_runs(l1, needs_attention=True).collect()] == ["r2"]
    assert len(list_runs(l1, limit=2).collect()) == 2


def test_node_drilldown(l3):
    steps = node_drilldown(l3, "r1", "act").collect()
    assert [s.step_index for s in steps] == [0, 1]
    steps = node_drilldown(l3, "r1", "plan", step_from=1).collect()
    assert [s.step_index for s in steps] == [1]


# ---------------------------------------------------------------------------
# outcomes
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def decisions(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, "s1", "e1", "accuracy", True, t0, "improve response accuracy"),
        (2, "s1", "e1", "accuracy", False, t0 + dt.timedelta(minutes=1), "accuracy regression found"),
        (3, "s2", "e2", "accuracy", True, t0 + dt.timedelta(minutes=2), "verified accuracy improve"),
        (4, "s2", "e3", "latency", True, t0 + dt.timedelta(minutes=3), "reduce tail latency"),
    ]
    return spark.createDataFrame(
        rows,
        "decision_id long, stream_id string, execution_id string, criterion string,"
        " success boolean, ts timestamp_ntz, text string",
    )


def test_outcome_metrics(decisions):
    m = {r.criterion: r for r in outcome_metrics(decisions).collect()}
    assert m["accuracy"].successes == 2 and m["accuracy"].failures == 1
    assert m["accuracy"].success_rate == pytest.approx(0.6667)
    assert m["accuracy"].streams_active == 2
    assert m["accuracy"].executions_total == 2
    assert m["latency"].success_rate == 1.0


def test_criterion_progress(spark):
    crit = spark.createDataFrame(
        [("a", 2.0, 1.0), ("b", 1.0, 0.5), ("c", 1.0, 1.5)],  # c over-credit clamps
        "criterion string, weight double, progress double",
    )
    row = criterion_progress(crit).collect()[0]
    assert row.overall_progress == pytest.approx(0.875)  # (2*1 + 1*.5 + 1*1)/4
    assert row.n_met == 2


def test_relevance_pairs(decisions, spark):
    crit = spark.createDataFrame(
        [("improve response accuracy",), ("reduce tail latency",)], "criterion string"
    )
    pairs = {(r.decision_id, r.criterion) for r in relevance_pairs(decisions, crit).collect()}
    assert (1, "improve response accuracy") in pairs  # 3-token overlap
    assert (4, "reduce tail latency") in pairs
    assert (4, "improve response accuracy") not in pairs


def test_recent_decisions(decisions):
    assert [r.decision_id for r in recent_decisions(decisions, 2).collect()] == [4, 3]


# ---------------------------------------------------------------------------
# checkpoints
# ---------------------------------------------------------------------------
def test_checkpoint_roundtrip(spark, tmp_path):
    ck = str(tmp_path / "ck")
    df1 = spark.range(5)
    df2 = spark.range(10)
    assert save_checkpoint(df1, ck) == 1
    assert save_checkpoint(df2, ck) == 2
    assert list_checkpoints(ck) == [1, 2]
    assert load_checkpoint(spark, ck).count() == 10          # latest
    assert load_checkpoint(spark, ck, version=1).count() == 5
    assert save_checkpoint(df1, ck) == 3
    assert prune_checkpoints(ck, keep_last=2) == [1]
    assert list_checkpoints(ck) == [2, 3]
    with pytest.raises(FileNotFoundError):
        load_checkpoint(spark, ck, version=1)


# ---------------------------------------------------------------------------
# dataflow graph
# ---------------------------------------------------------------------------
def test_pipeline_routing_fanout_fanin(spark):
    from aden_hive_fork_spark.plans import Edge, Node, Pipeline

    df = spark.createDataFrame(
        [(1, 700.0, "EU"), (2, 80.0, "EU"), (3, 900.0, "US"), (4, 50.0, "US")],
        "id long, amount double, region string",
    )
    pipe = Pipeline(
        nodes=[
            Node("ingest"),
            Node("big", lambda d: d.withColumn("tier", F.lit("big"))),
            Node("small", lambda d: d.withColumn("tier", F.lit("small"))),
            Node("sink"),
        ],
        edges=[
            Edge("ingest", "big", condition="amount > 500"),
            Edge("ingest", "small", condition="amount <= 500"),
            Edge("big", "sink"),
            Edge("small", "sink"),
        ],
        entry="ingest",
        terminals=["sink"],
    )
    out = pipe.run(df)["sink"]
    got = {(r.id, r.tier) for r in out.collect()}
    assert got == {(1, "big"), (3, "big"), (2, "small"), (4, "small")}


def test_pipeline_input_mapping_and_priority(spark):
    from aden_hive_fork_spark.plans import Edge, Node, Pipeline

    df = spark.createDataFrame([(1, "x")], "id long, payload string")
    pipe = Pipeline(
        nodes=[Node("a"), Node("hi"), Node("lo")],
        edges=[
            Edge("a", "hi", condition="id >= 0", priority=2,
                 input_mapping={"out_id": "id"}),
            Edge("a", "lo", condition="always", priority=1),
        ],
        entry="a",
        terminals=["hi", "lo"],
    )
    out = pipe.run(df)
    assert "lo" not in out                      # lower priority suppressed
    assert out["hi"].columns == ["out_id"]      # mapping applied


def test_pipeline_cycle_guard(spark):
    from aden_hive_fork_spark.plans import Edge, Node, Pipeline

    df = spark.createDataFrame([(1,)], "id long")
    pipe = Pipeline(
        nodes=[Node("loop", lambda d: d.withColumn("id", F.col("id") + 1)), Node("end")],
        edges=[Edge("loop", "loop", condition="id < 100"), Edge("loop", "end", condition="id >= 100")],
        entry="loop",
        terminals=["end"],
        max_visits=5,
    )
    out = pipe.run(df)
    assert "end" not in out or out["end"].count() == 0  # bounded, no infinite loop


def test_pipeline_validation(spark):
    from aden_hive_fork_spark.plans import Edge, GraphValidationError, Node, Pipeline

    with pytest.raises(GraphValidationError):
        Pipeline([Node("a")], [], entry="missing", terminals=["a"])
    with pytest.raises(GraphValidationError):
        Pipeline([Node("a"), Node("orphan")], [], entry="a", terminals=["a"])
    with pytest.raises(GraphValidationError):
        Pipeline([Node("a"), Node("b")], [Edge("a", "nope")], entry="a", terminals=["b"])


def _fan_pipeline(b=None, c=None, edges=None, entry_points=None):
    from aden_hive_fork_spark.plans import Edge, Node, Pipeline

    b = b or Node("b")
    c = c or Node("c")
    return Pipeline(
        [Node("a"), b, c, Node("t")],
        edges
        or [Edge("a", "b"), Edge("a", "c"), Edge("b", "t"), Edge("c", "t")],
        entry="a",
        terminals=["t"],
        entry_points=entry_points,
    )


def test_fan_out_single_client_facing_branch_ok():
    from aden_hive_fork_spark.plans import Node

    _fan_pipeline(b=Node("b", client_facing=True))  # validates


def test_fan_out_two_client_facing_branches_rejected():
    from aden_hive_fork_spark.plans import GraphValidationError, Node

    with pytest.raises(GraphValidationError, match="client-facing"):
        _fan_pipeline(
            b=Node("b", client_facing=True), c=Node("c", client_facing=True)
        )


def test_fan_out_client_facing_different_priorities_ok():
    """Edges of different priorities are ALTERNATIVES (run() keeps
    only the top-priority matching group), not parallel branches —
    two client-facing targets across priority levels must validate."""
    from aden_hive_fork_spark.plans import Edge, Node

    _fan_pipeline(
        b=Node("b", client_facing=True),
        c=Node("c", client_facing=True),
        edges=[
            Edge("a", "b", priority=1),
            Edge("a", "c", priority=0),
            Edge("b", "t"),
            Edge("c", "t"),
        ],
    )


def test_fan_out_overlapping_output_keys_rejected():
    from aden_hive_fork_spark.plans import GraphValidationError, Node

    with pytest.raises(GraphValidationError, match="output_key 'x'"):
        _fan_pipeline(
            b=Node("b", output_keys=("x", "y")),
            c=Node("c", output_keys=("x",)),
        )


def test_fan_out_disjoint_output_keys_ok():
    from aden_hive_fork_spark.plans import Node

    _fan_pipeline(
        b=Node("b", output_keys=("x",)), c=Node("c", output_keys=("y",))
    )


def test_duplicate_entry_point_ids_rejected():
    from aden_hive_fork_spark.plans import EntryPoint, GraphValidationError

    with pytest.raises(GraphValidationError, match="duplicate entry point"):
        _fan_pipeline(
            entry_points=[EntryPoint("hook", "b"), EntryPoint("hook", "c")]
        )


def test_entry_point_missing_node_rejected():
    from aden_hive_fork_spark.plans import EntryPoint, GraphValidationError

    with pytest.raises(GraphValidationError, match="missing node"):
        _fan_pipeline(entry_points=[EntryPoint("hook", "nope")])


def test_entry_point_makes_node_reachable():
    """A node reachable only through a declared entry point is legal
    (the reference's pause/resume + async entry architecture)."""
    from aden_hive_fork_spark.plans import Edge, EntryPoint, Node, Pipeline

    Pipeline(
        [Node("a"), Node("side"), Node("t")],
        [Edge("a", "t"), Edge("side", "t")],
        entry="a",
        terminals=["t"],
        entry_points=[EntryPoint("webhook", "side")],
    )  # validates: 'side' is an entry-point root
