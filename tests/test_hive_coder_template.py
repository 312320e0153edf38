"""Integration test: the reference's hive_coder agent-builder
template (core/framework/agents/hive_coder/) on plans.Pipeline with
the MockLLMBackend — generate -> validate -> fix loop, the
no-fabricated-tools constraint, the independent queen triage graph,
and success-criteria evaluation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def registry(spark):
    # the DISCOVERED tool registry (reference discover_mcp_tools —
    # dynamic data, not code)
    return spark.createDataFrame(
        [("search",), ("write_file",), ("run_tests",), ("edit_file",)],
        "tool_name string",
    )


@pytest.fixture()
def backend():
    from aden_hive_fork_spark.functions.llm_tier import MockLLMBackend

    return MockLLMBackend(
        rules=[
            # clean design: every tool exists in the registry
            ("research agent", "plan uses tool:search and tool:write_file"),
            # fabricated design: deploy_rocket is not a real tool
            ("deploy agent", "plan uses tool:search and tool:deploy_rocket"),
        ],
        default="plain design with no tools",
    )


def _run(spark, registry, backend, specs):
    from aden_hive_fork_spark.plans.hive_coder import (
        build_hive_coder_pipeline,
    )

    pipe = build_hive_coder_pipeline(registry, backend)
    df = spark.createDataFrame([(s,) for s in specs], "request string")
    return pipe, pipe.run(df)


def test_clean_spec_validates_first_pass(spark, registry, backend):
    pipe, results = _run(spark, registry, backend, ["research agent"])
    rows = results["package"].collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["validation_pass"]
    assert r["validation_result"] == "pass"
    assert r["file_count"] == 6
    assert r["agent_name"] == "research_agent"
    assert sorted(r["declared_tools"]) == ["search", "write_file"]


def test_fabricated_tool_fails_then_fix_loop_repairs(
    spark, registry, backend
):
    """The no-fabricated-tools constraint: deploy_rocket is not in the
    registry, so round 1 fails validation with the fix hint; the
    coder's fix round drops it and round 2 passes — the reference's
    'read error, fix with edit_file, re-validate' loop."""
    pipe, results = _run(spark, registry, backend, ["deploy agent"])
    rows = results["package"].collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["validation_pass"]
    assert r["declared_tools"] == ["search"]  # deploy_rocket dropped


def test_node_path_includes_fix_loop(spark, registry, backend):
    pipe, results = _run(
        spark, registry, backend, ["research agent", "deploy agent"]
    )
    results["package"].collect()
    # lazy guards keep enqueueing (possibly empty) frames until
    # max_visits cuts the cycle — coder appears exactly max_visits
    # times (the reference's 'Up to 3x' self-verification bound)
    assert pipe.last_trace[:3] == ["intake", "coder", "validate"]
    assert pipe.last_trace.count("coder") == 3
    assert pipe.last_trace.count("package") >= 1


def test_mixed_batch_row_routing(spark, registry, backend):
    """Row routing: the clean spec exits on round 1 while the
    fabricated spec loops — both must land in the same terminal with
    correct per-row results."""
    _, results = _run(
        spark, registry, backend, ["research agent", "deploy agent"]
    )
    rows = {r["request"]: r for r in results["package"].collect()}
    assert set(rows) == {"research agent", "deploy agent"}
    assert all(r["validation_pass"] for r in rows.values())
    assert rows["deploy agent"]["declared_tools"] == ["search"]


def test_registry_join_is_broadcast(spark, registry, backend):
    from aden_hive_fork_spark.plans.hive_coder import (
        build_hive_coder_pipeline,
    )

    pipe = build_hive_coder_pipeline(registry, backend)
    df = spark.createDataFrame([("research agent",)], "request string")
    out = pipe.run(df)["package"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_queen_triage_rules(spark):
    from aden_hive_fork_spark.plans.hive_coder import build_queen_pipeline

    pipe = build_queen_pipeline()
    tickets = spark.createDataFrame(
        [
            (1, "a", "critical", "oom loop"),
            (2, "b", "warning", "repeated failure in node x"),
            (3, "c", "info", "slow but progressing"),
        ],
        "ticket_id bigint, agent_name string, severity string, reason string",
    )
    out = {r["ticket_id"]: r for r in pipe.run(tickets)["queen"].collect()}
    assert out[1]["intervention_decision"] == "halt"
    assert out[2]["intervention_decision"] == "restart"
    assert out[3]["intervention_decision"] == "monitor"
    assert pipe.last_trace == ["queen"]


def test_success_criteria_weighted_progress(spark, registry, backend):
    from aden_hive_fork_spark.plans.hive_coder import (
        GOAL,
        evaluate_success_criteria,
    )

    _, results = _run(
        spark, registry, backend, ["research agent", "deploy agent"]
    )
    crit = {
        r["criterion_id"]: r
        for r in evaluate_success_criteria(results["package"]).collect()
    }
    assert set(crit) == {c.id for c in GOAL.success_criteria}
    for cid in crit:
        assert crit[cid]["progress"] == pytest.approx(1.0), cid
    total = sum(r["weight"] * r["progress"] for r in crit.values())
    assert total == pytest.approx(1.0)


def test_goal_metadata_parity():
    from aden_hive_fork_spark.plans.hive_coder import GOAL, QUEEN_GOAL

    assert GOAL.id == "agent-builder"
    assert len(GOAL.success_criteria) == 4
    assert sum(c.weight for c in GOAL.success_criteria) == pytest.approx(1.0)
    assert len(GOAL.constraints) == 4
    assert QUEEN_GOAL.id == "queen-manager"
    assert QUEEN_GOAL.success_criteria == ()  # reference: empty


def test_coder_node_declares_reference_nodespec_fields():
    from aden_hive_fork_spark.plans.hive_coder import coder_node

    n = coder_node()
    assert n.client_facing
    assert n.output_keys == ("agent_name", "validation_result")
