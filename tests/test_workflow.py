"""state/workflow — the phased GraphBuilder lifecycle: phase gates,
per-step validation, approval requirements, test gating on
final_approve, export to plans.Pipeline, JSON session resume."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aden_hive_fork_spark.plans.deep_research import Goal, SuccessCriterion
from aden_hive_fork_spark.state.testcase import TestCase, TestResult
from aden_hive_fork_spark.state.workflow import (
    PHASE_ADDING_EDGES,
    PHASE_ADDING_NODES,
    PHASE_APPROVED,
    PHASE_EXPORTED,
    PHASE_GOAL_APPROVED,
    PHASE_GOAL_DRAFT,
    PHASE_TESTING,
    EdgeDraft,
    GraphBuilder,
    NodeDraft,
    PhaseError,
)


def _goal(**over):
    kw = dict(
        id="g1",
        name="Test Goal",
        description="builds a thing",
        success_criteria=(
            SuccessCriterion("c1", "works end to end", "works", "true", 1.0),
        ),
        constraints=("stay deterministic",),
    )
    kw.update(over)
    return Goal(**kw)


def _builder_through_nodes():
    b = GraphBuilder("demo")
    b.set_goal(_goal())
    assert b.approve("goal ok")
    b.add_node(NodeDraft("intake", name="Intake", description="d"))
    b.approve("node ok")
    b.add_node(NodeDraft("report", name="Report", description="d"))
    b.approve("node ok")
    return b


def test_happy_path_phases_advance():
    b = GraphBuilder("demo")
    assert b.phase == "init"
    v = b.set_goal(_goal())
    assert v.valid and b.phase == PHASE_GOAL_DRAFT
    assert b.approve("lgtm") and b.phase == PHASE_GOAL_APPROVED
    assert b.add_node(NodeDraft("a", name="A", description="d")).valid
    assert b.phase == PHASE_ADDING_NODES
    b.approve("ok")
    b.add_node(NodeDraft("b", name="B", description="d"))
    b.approve("ok")
    assert b.add_edge(EdgeDraft("e1", "a", "b")).valid
    assert b.phase == PHASE_ADDING_EDGES
    b.approve("ok")
    assert b.final_approve("ship it")
    assert b.phase == PHASE_APPROVED


def test_phase_gates_raise():
    b = GraphBuilder("demo")
    with pytest.raises(PhaseError, match="adding_nodes"):
        b.add_node(NodeDraft("a", name="A"))  # no goal yet
    b.set_goal(_goal())
    with pytest.raises(PhaseError):
        b.add_edge(EdgeDraft("e", "a", "b"))  # goal not approved
    # approve() without pending validation
    b2 = GraphBuilder("other")
    with pytest.raises(PhaseError, match="Nothing to approve"):
        b2.approve("?")


def test_goal_validation_rules():
    b = GraphBuilder("demo")
    v = b.set_goal(_goal(description="", success_criteria=()))
    assert not v.valid
    assert "Goal must have a description" in v.errors
    assert "Goal must have at least one success criterion" in v.errors
    assert not b.approve("try anyway")  # invalid validation blocks approval
    # warning (not error) for missing constraints
    v2 = b.set_goal(_goal(constraints=()))
    assert v2.valid
    assert any("constraints" in w for w in v2.warnings)


def test_node_validation_rules():
    b = GraphBuilder("demo")
    b.set_goal(_goal())
    b.approve("ok")
    dup = NodeDraft("n1", name="N1", description="d")
    assert b.add_node(dup).valid
    v = b.add_node(NodeDraft("n1", name="again"))
    assert not v.valid and "already exists" in v.errors[0]
    v2 = b.add_node(NodeDraft("r1", name="Router", node_type="router"))
    assert not v2.valid
    assert "must specify routes" in v2.errors[0]
    v3 = b.add_node(
        NodeDraft(
            "el",
            name="Loop",
            description="d",
            node_type="event_loop",
            tools=("search",),
        )
    )
    assert v3.valid
    assert any("system_prompt" in w for w in v3.warnings)
    assert any("output_keys" in s for s in v3.suggestions)


def test_update_and_remove_node():
    b = _builder_through_nodes()
    v = b.update_node("intake", description="better")
    assert v.valid
    assert b.nodes[0].description == "better"
    assert not b.update_node("nope", name="x").valid
    b.add_edge(EdgeDraft("e1", "intake", "report"))
    b.approve("ok")
    # removal blocked while an edge references the node — and remove
    # is only legal in the adding_nodes phase (reference :289)
    with pytest.raises(PhaseError):
        b.remove_node("intake")


def test_edge_validation_rules():
    b = _builder_through_nodes()
    v = b.add_edge(EdgeDraft("e1", "intake", "missing"))
    assert not v.valid and "not found in nodes" in v.errors[0]
    v2 = b.add_edge(EdgeDraft("e2", "intake", "report", condition="conditional"))
    assert v2.valid
    assert any("condition_expr" in w for w in v2.warnings)
    v3 = b.add_edge(EdgeDraft("e2", "intake", "report"))
    assert not v3.valid and "already exists" in v3.errors[0]


def test_whole_graph_validation_reachability():
    b = _builder_through_nodes()
    b.add_node(NodeDraft("island", name="I", description="d"))
    b.approve("ok")
    b.add_edge(EdgeDraft("e1", "intake", "report"))
    b.approve("ok")
    v = b.validate()
    # island has no incoming edges -> it is ALSO an entry candidate
    # (multi-entry reachability, reference :396-405), so the graph is
    # valid but flags multiple entries
    assert v.valid
    assert any("Multiple entry candidates" in w for w in v.warnings)


def test_final_approve_requires_passing_tests():
    b = _builder_through_nodes()
    b.add_edge(EdgeDraft("e1", "intake", "report"))
    b.approve("ok")
    b.add_test(
        TestCase(
            id="t1", goal_id="g1", parent_criteria_id="c1",
            test_type="outcome", test_name="works", description="d",
        )
    )
    failing = lambda bld, t: TestResult(test_id=t.id, passed=False)  # noqa: E731
    b.run_all_tests(failing)
    assert b.phase == PHASE_TESTING
    assert not b.final_approve("ship")
    assert "Failed tests" in b._pending_validation.errors[0]
    # rerun green -> approvable
    b.test_results = []
    passing = lambda bld, t: TestResult(test_id=t.id, passed=True)  # noqa: E731
    b.run_all_tests(passing)
    assert b.final_approve("ship")


def test_export_builds_runnable_pipeline(spark):
    b = _builder_through_nodes()
    b.add_edge(EdgeDraft("e1", "intake", "report"))
    b.approve("ok")
    assert b.final_approve("ship")
    pipe = b.export(
        impl_registry={
            "intake": lambda df: df.withColumn("stage", F.lit("in")),
            "report": lambda df: df.withColumn("done", F.lit(True)),
        }
    )
    assert b.phase == PHASE_EXPORTED
    out = pipe.run(spark.createDataFrame([(1,)], "x bigint"))
    rows = out["report"].collect()
    assert rows[0]["stage"] == "in" and rows[0]["done"]


def test_session_persistence_roundtrip(tmp_path):
    b = GraphBuilder("persisted", storage_path=str(tmp_path))
    b.set_goal(_goal())
    b.approve("ok")
    b.add_node(
        NodeDraft(
            "a", name="A", description="d", output_keys=("k",),
            client_facing=True,
        )
    )
    b.approve("ok")
    b.add_edge(EdgeDraft("e1", "a", "a", condition="conditional",
                         condition_expr="x > 1"))
    b.approve("ok")
    # resume in a NEW builder from the saved JSON
    b2 = GraphBuilder(
        "ignored", storage_path=str(tmp_path), session_id=b.session_id
    )
    assert b2.phase == b.phase == PHASE_ADDING_EDGES
    assert b2.goal.id == "g1"
    assert b2.nodes[0].output_keys == ("k",)
    assert b2.nodes[0].client_facing
    assert b2.edges[0].condition_expr == "x > 1"
    assert len(b2.approvals) == 3
