"""Unit tests for the builder run-analysis layer (state/builder_query)
and ErrorCategorizer (state/categorizer) — the reference's
framework/builder/query.py + framework/testing/categorizer.py surface,
exercised on a hand-built run log with known answers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

L2_COLS = (
    "run_id string, node_id string, node_seq int, node_type string,"
    " success boolean, error string, latency_ms long, input_tokens long,"
    " output_tokens long"
)


@pytest.fixture()
def runlog(spark):
    # run1 (goalA): plan -> fetch(FAIL) -> write(FAIL)
    # run2 (goalA): plan -> fetch -> write          (all ok)
    # run3 (goalB): plan -> review(FAIL)
    rows = [
        ("run1", "plan", 1, "llm", True, None, 100, 10, 5),
        ("run1", "fetch", 2, "tool", False, "timeout waiting", 900, 20, 0),
        ("run1", "write", 3, "tool", False, "KeyError: missing", 50, 5, 0),
        ("run2", "plan", 1, "llm", True, None, 110, 10, 6),
        ("run2", "fetch", 2, "tool", True, None, 300, 20, 8),
        ("run2", "write", 3, "tool", True, None, 60, 5, 2),
        ("run3", "plan", 1, "llm", True, None, 120, 10, 7),
        ("run3", "review", 2, "llm", False, "timeout waiting", 800, 30, 0),
    ]
    l2 = spark.createDataFrame(rows, L2_COLS)
    l1 = spark.createDataFrame(
        [
            ("run1", "goalA", "failure"),
            ("run2", "goalA", "success"),
            ("run3", "goalB", "failure"),
        ],
        "run_id string, agent_id string, status string",
    )
    return l2, l1


def test_failure_analysis_first_failure_and_chain(spark, runlog):
    from aden_hive_fork_spark.state.builder_query import failure_analysis

    l2, _ = runlog
    out = {r["run_id"]: r for r in failure_analysis(l2).collect()}
    assert set(out) == {"run1", "run3"}  # run2 succeeded -> absent
    r1 = out["run1"]
    assert r1["failure_point"] == "fetch"
    assert r1["root_cause"] == "timeout waiting"
    assert r1["decision_chain"] == ["plan", "fetch"]  # stops AT failure
    assert r1["chain_len"] == 2
    assert r1["n_failed_nodes"] == 2
    r3 = out["run3"]
    assert r3["failure_point"] == "review"
    assert r3["decision_chain"] == ["plan", "review"]


def test_find_patterns_bundle(spark, runlog):
    from aden_hive_fork_spark.state.builder_query import find_patterns

    l2, l1 = runlog
    p = find_patterns(l2, l1, goal_col="agent_id", threshold=0.1)
    goals = {r["goal_id"]: r for r in p["goals"].collect()}
    assert goals["goalA"]["run_count"] == 2
    assert goals["goalA"]["success_rate"] == pytest.approx(0.5)
    assert goals["goalB"]["success_rate"] == 0.0

    pn = {
        (r["goal_id"], r["node_id"]): r
        for r in p["problematic_nodes"].collect()
    }
    # fetch under goalA: 1 failure / 2 decisions = 0.5 -> flagged
    assert pn[("goalA", "fetch")]["failure_rate"] == pytest.approx(0.5)
    assert pn[("goalA", "fetch")]["problematic"]
    assert not pn[("goalA", "plan")]["problematic"]

    cf = p["common_failures"].collect()
    top_a = [r for r in cf if r["goal_id"] == "goalA" and r["rank"] == 1]
    assert len(top_a) == 1  # deterministic tie-break on error text
    dt = {
        (r["goal_id"], r["node_type"]): r["n"]
        for r in p["decision_types"].collect()
    }
    assert dt[("goalA", "tool")] == 4
    assert dt[("goalB", "llm")] == 2


def test_get_node_performance(spark, runlog):
    from aden_hive_fork_spark.state.builder_query import get_node_performance

    l2, _ = runlog
    perf = {r["node_id"]: r for r in get_node_performance(l2).collect()}
    fetch = perf["fetch"]
    assert fetch["n_runs"] == 2
    assert fetch["total_decisions"] == 2
    assert fetch["success_rate"] == pytest.approx(0.5)
    assert fetch["avg_latency_ms"] == pytest.approx(600.0)
    assert fetch["total_input_tokens"] == 40


def test_compare_runs_divergence_and_node_sets(spark, runlog):
    from aden_hive_fork_spark.state.builder_query import compare_runs

    l2, l1 = runlog
    l1 = l1.withColumn("total_nodes_executed", F.lit(None).cast("int"))
    l1 = l1.withColumn(
        "total_nodes_executed",
        F.when(F.col("run_id") == "run1", 3)
        .when(F.col("run_id") == "run2", 3)
        .otherwise(2),
    )
    row = compare_runs(l2, l1, "run1", "run3").collect()[0]
    assert row["status_a"] == "failure" and row["status_b"] == "failure"
    assert row["n_nodes_a"] == 3 and row["n_nodes_b"] == 2
    assert row["diverged_at_seq"] == 2  # fetch vs review
    assert row["nodes_only_in_a"] == ["fetch", "write"]
    assert row["nodes_only_in_b"] == ["review"]

    same = compare_runs(l2, l1, "run1", "run2").collect()[0]
    assert same["diverged_at_seq"] is None  # identical node paths


def test_suggest_improvements_rules(spark, runlog):
    from aden_hive_fork_spark.state.builder_query import suggest_improvements

    l2, l1 = runlog
    out = suggest_improvements(l2, l1, goal_col="agent_id").collect()
    types = {(r["suggestion_type"], r["goal_id"], r["target"]) for r in out}
    # timeout occurred twice under... goalA has it once, goalB once —
    # below error_min_count per goal, so no error_handling rows
    assert not any(t[0] == "error_handling" for t in types)
    # goalA success rate 0.5 < 0.8 and goalB 0.0 -> architecture rows
    assert ("architecture", "goalA", "goalA") in types
    assert ("architecture", "goalB", "goalB") in types
    # fetch/write under goalA flagged with priority high (rate 0.5>0.3)
    high = {
        r["target"]: r["priority"]
        for r in out
        if r["suggestion_type"] == "node_improvement"
        and r["goal_id"] == "goalA"
    }
    assert high["fetch"] == "high" and high["write"] == "high"


# --- ErrorCategorizer ------------------------------------------------------


def _categorize_one(spark, text):
    from aden_hive_fork_spark.state.categorizer import categorize_errors

    df = spark.createDataFrame([(text,)], "error string")
    return categorize_errors(df, "error").collect()[0]


def test_categorizer_logic_precedence(spark):
    # logic + impl hits in one string -> logic wins (reference priority)
    r = _categorize_one(
        spark, "TypeError after goal not achieved: criteria not met"
    )
    assert r["category"] == "logic_error"


def test_categorizer_impl_default_on_no_match(spark):
    r = _categorize_one(spark, "something nobody has seen before")
    assert r["category"] == "implementation_error"
    assert r["confidence"] == pytest.approx(0.3)
    assert "Fix the code" in r["fix_suggestion"]


def test_categorizer_cross_category_confidence(spark):
    # 1 impl hit + 1 edge hit -> impl wins ties, conf = 0.5 + 0.5*0.4
    r = _categorize_one(spark, "ValueError: empty result")
    assert r["category"] == "implementation_error"
    assert r["confidence"] == pytest.approx(0.7)


def test_categorizer_pure_edge(spark):
    r = _categorize_one(spark, "request timeout; rate limit hit")
    assert r["category"] == "edge_case"
    assert r["confidence"] == pytest.approx(0.9)
    assert "edge-case" in r["fix_suggestion"]


def test_categorizer_null_passthrough(spark):
    r = _categorize_one(spark, None)
    assert r["category"] is None
    assert r["confidence"] is None
    assert r["fix_suggestion"] is None


def test_categorizer_confidence_cap(spark):
    # many impl hits, zero elsewhere -> dominant/total = 1 -> capped 0.9
    r = _categorize_one(
        spark, "TypeError KeyError ValueError tool call failed"
    )
    assert r["category"] == "implementation_error"
    assert r["confidence"] == pytest.approx(0.9)
