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


# ---------------------------------------------------------------------------
# MessagesApiBackend (VERDICT r3 #6): real-API-shaped adapter with
# record/replay fixtures; routing behavior unchanged vs the mock.
# ---------------------------------------------------------------------------
def _recorded(prompt_to_reply: dict, backend_kw=None):
    """Build a MessagesApiBackend whose fixtures answer exactly the
    given prompts with messages-API-shaped JSON bodies."""
    import json

    from aden_hive_fork_spark.functions.llm_tier import (
        FixtureLLMTransport,
        MessagesApiBackend,
    )

    b = MessagesApiBackend(FixtureLLMTransport(), **(backend_kw or {}))
    for prompt, reply in prompt_to_reply.items():
        body = json.dumps(
            {
                "id": "msg_fixture",
                "content": [{"type": "text", "text": reply}],
                "stop_reason": "end_turn",
            }
        ).encode()
        b.transport.fixtures[FixtureLLMTransport.key(b._request(prompt))] = (
            200,
            body,
        )
    return b


def test_messages_backend_replays_fixtures():
    b = _recorded({"hello": "world", "ping": "pong"})
    assert b.complete(["hello", "ping", "never-recorded"]) == ["world", "pong", ""]


def test_messages_backend_parses_chat_completions_shape():
    import json

    from aden_hive_fork_spark.functions.llm_tier import (
        FixtureLLMTransport,
        MessagesApiBackend,
    )

    b = MessagesApiBackend(FixtureLLMTransport())
    body = json.dumps(
        {"choices": [{"message": {"role": "assistant", "content": "alt"}}]}
    ).encode()
    b.transport.fixtures[FixtureLLMTransport.key(b._request("q"))] = (200, body)
    assert b.complete(["q"]) == ["alt"]


def test_messages_backend_error_yields_fallback_tier(spark):
    """A failing provider (HTTP 500) yields "" replies, and llm_route
    falls back to choices[0] instead of wedging."""
    from aden_hive_fork_spark.functions.llm_tier import (
        MessagesApiBackend,
        llm_route,
    )

    backend = MessagesApiBackend(lambda req: (500, b"boom"))
    df = spark.createDataFrame([("any text",)], "body string")
    out = llm_route(df, ["triage", "billing"], "route", backend).collect()
    assert out[0]["_route"] == "triage"


def test_messages_backend_drives_llm_route(spark):
    """Recorded replies route rows exactly like the mock backend —
    same seam, real wire shape."""
    from aden_hive_fork_spark.functions.llm_tier import llm_route

    df = spark.createDataFrame(
        [("refund please",), ("app crashes",)], "body string"
    )
    goal = "route tickets"
    choices = ["triage", "billing", "engineering"]

    def prompt_for(text):
        return (
            f"Goal: {goal}\nChoices: {', '.join(choices)}\n"
            + f"body: {text}"
            + "\nAnswer with exactly one choice."
        )

    b = _recorded(
        {
            prompt_for("refund please"): "billing",
            prompt_for("app crashes"): "engineering",
        }
    )
    got = {r.body: r["_route"] for r in llm_route(df, choices, goal, b).collect()}
    assert got == {"refund please": "billing", "app crashes": "engineering"}


def test_fixture_llm_transport_record_mode():
    import json

    from aden_hive_fork_spark.functions.llm_tier import (
        FixtureLLMTransport,
        MessagesApiBackend,
    )

    calls = []

    def live(req):
        calls.append(req)
        return 200, json.dumps(
            {"content": [{"type": "text", "text": "live!"}]}
        ).encode()

    rec = FixtureLLMTransport(live=live)
    b = MessagesApiBackend(rec, model="m1", system="be terse")
    assert b.complete(["x"]) == ["live!"]
    assert calls[0]["model"] == "m1" and calls[0]["system"] == "be terse"
    assert calls[0]["messages"] == [{"role": "user", "content": "x"}]
    # replay offline from the captured fixtures
    b2 = MessagesApiBackend(
        FixtureLLMTransport(fixtures=rec.fixtures), model="m1", system="be terse"
    )
    assert b2.complete(["x"]) == ["live!"]
    assert len(calls) == 1


# ---------------------------------------------------------------------------
# ChatCompletionsBackend (VERDICT r5 #9): the OpenAI-compatible chat
# wire beside the messages wire — llm_route/judge/repair run against
# BOTH adapters with identical routing behavior.
# ---------------------------------------------------------------------------
def _chat_recorded(prompt_to_reply: dict, backend_kw=None):
    """Build a ChatCompletionsBackend whose fixtures answer exactly
    the given prompts with chat-completions-shaped JSON bodies."""
    import json

    from aden_hive_fork_spark.functions.llm_tier import (
        ChatCompletionsBackend,
        FixtureLLMTransport,
    )

    b = ChatCompletionsBackend(FixtureLLMTransport(), **(backend_kw or {}))
    for prompt, reply in prompt_to_reply.items():
        body = json.dumps(
            {
                "id": "chatcmpl_fixture",
                "choices": [
                    {"index": 0, "finish_reason": "stop",
                     "message": {"role": "assistant", "content": reply}}
                ],
            }
        ).encode()
        b.transport.fixtures[FixtureLLMTransport.key(b._request(prompt))] = (
            200,
            body,
        )
    return b


def test_chat_backend_request_wire_shape():
    from aden_hive_fork_spark.functions.llm_tier import (
        ChatCompletionsBackend,
    )

    b = ChatCompletionsBackend(lambda req: (200, b"{}"), model="m2",
                               system="be terse", temperature=0.5)
    req = b._request("hello")
    # system prompt is a leading MESSAGE in the chat dialect
    assert req["messages"][0] == {"role": "system", "content": "be terse"}
    assert req["messages"][1] == {"role": "user", "content": "hello"}
    assert req["model"] == "m2" and req["temperature"] == 0.5


def test_chat_backend_replays_and_error_fallback():
    b = _chat_recorded({"ping": "pong"})
    assert b.complete(["ping", "never-recorded"]) == ["pong", ""]
    from aden_hive_fork_spark.functions.llm_tier import (
        ChatCompletionsBackend,
    )

    failing = ChatCompletionsBackend(lambda req: (500, b"boom"))
    assert failing.complete(["x"]) == [""]
    raising = ChatCompletionsBackend(
        lambda req: (_ for _ in ()).throw(OSError("net down"))
    )
    assert raising.complete(["x"]) == [""]


def test_chat_backend_drives_llm_route(spark):
    from aden_hive_fork_spark.functions.llm_tier import llm_route

    df = spark.createDataFrame(
        [("refund my order",), ("just saying hi",)], "text string"
    )
    goal = "Route the message"
    choices = ["billing", "smalltalk"]

    def prompt_for(text):
        return (
            f"Goal: {goal}\nChoices: {', '.join(choices)}\n"
            f"text: {text}\nAnswer with exactly one choice."
        )

    b = _chat_recorded({
        prompt_for("refund my order"): "billing",
        prompt_for("just saying hi"): "smalltalk",
    })
    out = {r["text"]: r["_route"]
           for r in llm_route(df, choices, goal, b).collect()}
    assert out == {"refund my order": "billing",
                   "just saying hi": "smalltalk"}


def test_chat_http_transport_bearer_header():
    from aden_hive_fork_spark.functions.llm_tier import chat_http_transport

    send = chat_http_transport("http://127.0.0.1:1/v1/chat", "sk-test")
    # connection refused → urlerror propagates to the backend, which
    # turns it into "" — here we just confirm the callable exists and
    # raises a transport-level error, not a request-building one
    try:
        send({"model": "m", "messages": []})
        raised = False
    except Exception:
        raised = True
    assert raised
