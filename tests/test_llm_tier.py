"""Pluggable LLM tier (functions/llm_tier): the three reference seams
— LLM_DECIDE routing, judge escalation, output-cleaner repair — each
proven end-to-end through a deterministic MockLLMBackend, plus the
rules-first discipline (the backend is only consulted where the
deterministic tier could not settle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aden_hive_fork_spark.functions.llm_tier import (
    MockLLMBackend,
    _parse_choice,
    judge_with_llm,
    llm_route,
    repair_rejects,
)


def test_parse_choice_order_and_fallback():
    assert _parse_choice("I pick beta over alpha", ["alpha", "beta"], "alpha") == "beta"
    assert _parse_choice("alpha... no wait, beta", ["alpha", "beta"], "x") == "alpha"
    assert _parse_choice("no idea", ["alpha", "beta"], "alpha") == "alpha"
    assert _parse_choice(None, ["a"], "a") == "a"


def test_mock_backend_rules():
    b = MockLLMBackend([("refund", "billing"), ("crash", "engineering")], default="triage")
    assert b.complete(["customer wants a REFUND", "app crash on boot", "hello"]) == [
        "billing",
        "engineering",
        "triage",
    ]


def test_llm_route_partitions_rows(spark):
    df = spark.createDataFrame(
        [
            (1, "please refund my order"),
            (2, "segfault crash in parser"),
            (3, "general question"),
        ],
        "id long, body string",
    )
    backend = MockLLMBackend(
        [("refund", "route to billing"), ("crash", "route to engineering")],
        default="gibberish",  # unparseable -> fallback = choices[0]
    )
    out = llm_route(df, ["triage", "billing", "engineering"], "route tickets", backend)
    got = {r.id: r._route for r in out.collect()}
    assert got == {1: "billing", 2: "engineering", 3: "triage"}


def test_llm_route_composes_with_pipeline(spark):
    """The reference LLM_DECIDE edge shape: llm_route as a node
    transform, CONDITIONAL edges filtering on _route."""
    from aden_hive_fork_spark.plans.graph import Edge, Node, Pipeline

    backend = MockLLMBackend([("refund", "billing")], default="other")
    df = spark.createDataFrame(
        [(1, "refund please"), (2, "hi there")], "id long, body string"
    )
    p = Pipeline(
        nodes=[
            Node("ingest", lambda d: llm_route(
                d, ["other", "billing"], "route", backend)),
            Node("billing"),
            Node("other"),
        ],
        edges=[
            Edge("ingest", "billing", condition="_route == 'billing'"),
            Edge("ingest", "other", condition="_route == 'other'"),
        ],
        entry="ingest",
        terminals=["billing", "other"],
    )
    res = p.run(df)
    assert [r.id for r in res["billing"].collect()] == [1]
    assert [r.id for r in res["other"].collect()] == [2]


def test_judge_llm_only_touches_continue(spark):
    rows = [
        # run, node, success, exit, retries, escalate, steps
        ("r1", "a", True, "success", 0, 0, 10),   # rule: ACCEPT
        ("r1", "b", False, "failed", 1, 0, 10),   # rule: RETRY
        ("r1", "c", False, "running", 3, 0, 10),  # rule: ESCALATE (retries)
        ("r1", "d", True, "running", 0, 0, 10),   # rule: CONTINUE -> LLM
    ]
    df = spark.createDataFrame(
        rows,
        "run_id string, node_id string, success boolean, exit_status string,"
        " retry_count int, escalate_count int, total_steps int",
    )
    backend = MockLLMBackend([("node d", "ACCEPT")], default="")
    got = {r.node_id: r.verdict for r in judge_with_llm(df, backend).collect()}
    assert got == {"a": "ACCEPT", "b": "RETRY", "c": "ESCALATE", "d": "ACCEPT"}


def test_judge_unparseable_reply_keeps_continue(spark):
    df = spark.createDataFrame(
        [("r1", "d", True, "running", 0, 0, 10)],
        "run_id string, node_id string, success boolean, exit_status string,"
        " retry_count int, escalate_count int, total_steps int",
    )
    got = judge_with_llm(df, MockLLMBackend([], default="shrug")).collect()
    assert got[0].verdict == "CONTINUE"


def test_repair_heuristic_tier(spark):
    """Currency/whitespace/JSON-trap rows repair WITHOUT a backend."""
    from aden_hive_fork_spark.functions.validate import enforce_schema

    schema = "id bigint, amount double, label string"
    df = spark.createDataFrame(
        [
            ("1", " $1,234.50 ", "ok"),              # currency + spaces
            ("2", '{"amount": 7.5}', "json trap"),   # nested-JSON promotion
            ("3", "notanumber", "hopeless"),
        ],
        "id string, amount string, label string",
    )
    valid, rejects = enforce_schema(df, schema)
    assert valid.count() == 0 and rejects.count() == 3
    fixed, still = repair_rejects(rejects, schema)
    got = {r.id: r.amount for r in fixed.collect()}
    assert got == {1: 1234.5, 2: 7.5}
    assert [r.id for r in still.collect()] == ["3"]


def test_repair_llm_tier_revalidates(spark):
    """Backend replies repair the hopeless row; the repair is accepted
    only because REVALIDATION passes (and a bad reply still rejects)."""
    from aden_hive_fork_spark.functions.validate import enforce_schema

    schema = "id bigint, amount double"
    df = spark.createDataFrame(
        [("3", "three dollars"), ("4", "garbage")], "id string, amount string"
    )
    _, rejects = enforce_schema(df, schema)
    # note: phase-1 numeric de-formatting strips spaces before the
    # backend sees the value, so the rule keys on the cleaned form
    backend = MockLLMBackend(
        [("threedollars", "amount=3.0"), ("garbage", "amount=still garbage")]
    )
    fixed, still = repair_rejects(rejects, schema, backend=backend)
    assert {(r.id, r.amount) for r in fixed.collect()} == {(3, 3.0)}
    assert [r.id for r in still.collect()] == ["4"]


def test_repair_llm_tier_multi_reason_rows(spark):
    """Rows with 2+ validation reasons must not crash the repair job
    (Arrow hands array<string> cells over as numpy arrays whose
    truthiness raises) — review finding r3."""
    from aden_hive_fork_spark.functions.validate import enforce_schema

    schema = "id bigint, amount double"
    df = spark.createDataFrame([("xx", "yy")], "id string, amount string")
    _, rejects = enforce_schema(df, schema)
    backend = MockLLMBackend([("xx", "id=7\namount=1.5")])
    fixed, still = repair_rejects(rejects, schema, backend=backend)
    assert [(r.id, r.amount) for r in fixed.collect()] == [(7, 1.5)]
    assert still.count() == 0


def test_llm_route_rejects_existing_route_col(spark):
    df = spark.createDataFrame([("x", "a")], "body string, _route string")
    backend = MockLLMBackend([], default="triage")
    import pytest

    with pytest.raises(ValueError, match="_route"):
        llm_route(df, ["triage"], "route", backend)
