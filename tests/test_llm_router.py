"""Router/fallback-chain + stream-event tests (reference litellm.py
and stream_events.py analogs)."""

from __future__ import annotations

import pytest

from aden_hive_fork_spark.functions.llm_router import (
    FinishEvent,
    ProviderSpec,
    ReasoningDeltaEvent,
    ReasoningStartEvent,
    RouterBackend,
    TextDeltaEvent,
    TextEndEvent,
    ToolCallEvent,
    classify_stream_error,
    events_from_chunks,
    router_from_registry,
)
from aden_hive_fork_spark.functions.llm_tier import (
    ChatCompletionsBackend,
    FixtureLLMTransport,
    MessagesApiBackend,
    MockLLMBackend,
    llm_route,
)


class FlakyBackend:
    """Fails (returns "") for the first ``fail_n`` complete() calls."""

    def __init__(self, fail_n: int, reply: str = "ok"):
        self.fail_n = fail_n
        self.calls = 0
        self.reply = reply

    def complete(self, prompts):
        self.calls += 1
        if self.calls <= self.fail_n:
            return [""] * len(prompts)
        return [self.reply] * len(prompts)


def test_router_retries_then_succeeds_same_provider():
    slept = []
    b = FlakyBackend(fail_n=2, reply="alpha")
    r = RouterBackend(
        [ProviderSpec("p1", b, max_retries=2)],
        backoff_base=1.0,
        sleep=slept.append,
    )
    assert r.complete(["x", "y"]) == ["alpha", "alpha"]
    # two retries → exponential schedule 1.0, 2.0
    assert slept == [1.0, 2.0]
    assert b.calls == 3


def test_router_falls_back_to_next_provider():
    trace = []
    dead = FlakyBackend(fail_n=99)
    alive = MockLLMBackend([], default="from-p2")
    r = RouterBackend(
        [ProviderSpec("p1", dead, max_retries=1),
         ProviderSpec("p2", alive)],
        sleep=lambda s: None,
        trace=lambda *a: trace.append(a),
    )
    assert r.complete(["q"]) == ["from-p2"]
    assert [t[0] for t in trace] == ["p1", "p1", "p2"]


def test_router_partial_fallback_only_for_empty_rows():
    # p1 answers prompts containing "easy", leaves the rest empty
    p1 = MockLLMBackend([("easy", "p1-reply")], default="")
    p2 = MockLLMBackend([], default="p2-reply")
    r = RouterBackend(
        [ProviderSpec("p1", p1, max_retries=0), ProviderSpec("p2", p2)],
        sleep=lambda s: None,
    )
    assert r.complete(["easy one", "hard one"]) == ["p1-reply", "p2-reply"]


def test_router_exhausted_chain_yields_empty():
    r = RouterBackend(
        [ProviderSpec("p1", FlakyBackend(99), max_retries=1)],
        sleep=lambda s: None,
    )
    assert r.complete(["q"]) == [""]


def test_router_backoff_cap_and_provider_exception():
    class Boom:
        def complete(self, prompts):
            raise RuntimeError("wire down")

    slept = []
    r = RouterBackend(
        [ProviderSpec("p1", Boom(), max_retries=6),
         ProviderSpec("p2", MockLLMBackend([], default="saved"))],
        backoff_base=8.0,
        max_delay=20.0,
        sleep=slept.append,
    )
    assert r.complete(["q"]) == ["saved"]
    assert max(slept) == 20.0  # capped, exceptions treated as empty


def test_router_from_registry_validates_names():
    reg = {"mock": MockLLMBackend([], default="m")}
    with pytest.raises(ValueError, match="unknown providers"):
        router_from_registry(reg, ["mock", "nope"])
    r = router_from_registry(reg, ["mock"], sleep=lambda s: None)
    assert r.complete(["x"]) == ["m"]


def test_router_chains_all_three_backend_families():
    """messages-wire (429) → chat-wire (500) → mock: the fallback
    chain spans every shipped backend family and lands on the last."""
    msg_backend = MessagesApiBackend(
        FixtureLLMTransport({}), model="m1"
    )  # no fixtures → 404 → ""
    chat_backend = ChatCompletionsBackend(
        FixtureLLMTransport({}), model="m2"
    )
    r = router_from_registry(
        {
            "messages": msg_backend,
            "chat": chat_backend,
            "mock": MockLLMBackend([("route", "triage")], default="triage"),
        },
        ["messages", "chat", "mock"],
        sleep=lambda s: None,
    )
    assert r.complete(["please route this"]) == ["triage"]


def test_llm_route_accepts_router_backend(spark):
    """The distributed seams are parametrized over ANY LLMBackend —
    a router drops in unchanged (fallback-on-error end to end)."""
    df = spark.createDataFrame(
        [("billing problem",), ("broken build",)], "text string"
    )

    class DeadBackend:  # local class → cloudpickle ships it by value
        def complete(self, prompts):
            return [""] * len(prompts)

    router = RouterBackend(
        [
            ProviderSpec("dead", DeadBackend(), max_retries=0),
            ProviderSpec(
                "mock",
                MockLLMBackend(
                    [("billing problem", "billing"),
                     ("broken build", "engineering")],
                    default="triage",
                ),
            ),
        ],
        sleep=lambda s: None,
    )
    out = {
        r["text"]: r["_route"]
        for r in llm_route(
            df, ["triage", "billing", "engineering"], "route", router
        ).collect()
    }
    assert out == {
        "billing problem": "billing",
        "broken build": "engineering",
    }


# ---------------------------------------------------------------------------
# stream events
# ---------------------------------------------------------------------------


def test_stream_text_snapshot_and_end():
    ev = events_from_chunks([
        {"type": "text", "text": "Hel"},
        {"type": "text", "text": "lo"},
        {"type": "finish", "stop_reason": "end_turn", "input_tokens": 3,
         "output_tokens": 2, "model": "m"},
    ])
    assert ev[0] == TextDeltaEvent(content="Hel", snapshot="Hel")
    assert ev[1] == TextDeltaEvent(content="lo", snapshot="Hello")
    assert ev[2] == TextEndEvent(full_text="Hello")
    assert ev[3] == FinishEvent(stop_reason="end_turn", input_tokens=3,
                                output_tokens=2, model="m")


def test_stream_tool_call_partial_json_assembly():
    ev = events_from_chunks([
        {"type": "tool_call", "id": "t1", "name": "search",
         "input_json": '{"q": "sp'},
        {"type": "tool_call", "id": "t1", "input_json": 'ark"}'},
        {"type": "tool_result", "id": "t1", "content": "42"},
    ])
    assert ev[0] == ToolCallEvent(tool_use_id="t1", tool_name="search",
                                  tool_input={"q": "spark"})
    assert ev[1].type == "tool_result" and ev[1].content == "42"


def test_stream_reasoning_block_events():
    ev = events_from_chunks([
        {"type": "reasoning", "text": "think"},
        {"type": "reasoning", "text": " more"},
        {"type": "text", "text": "answer"},
        {"type": "finish"},
    ])
    assert ev[0] == ReasoningStartEvent()
    assert ev[1] == ReasoningDeltaEvent(content="think")
    assert ev[2] == ReasoningDeltaEvent(content=" more")
    assert ev[3].type == "text_delta"
    # text closes before finish
    assert [e.type for e in ev[4:]] == ["text_end", "finish"]


def test_stream_error_classification():
    assert classify_stream_error("HTTP 503 server overloaded").recoverable
    assert classify_stream_error("connection reset by peer").recoverable
    assert not classify_stream_error("invalid api key").recoverable
    ev = events_from_chunks([
        {"type": "text", "text": "par"},
        {"type": "error", "message": "request timed out"},
    ])
    assert ev[-1].recoverable is True
    # the open text block is closed before the error event
    assert [e.type for e in ev] == ["text_delta", "text_end", "error"]


def test_stream_unterminated_text_closes_at_eof():
    ev = events_from_chunks([{"type": "text", "text": "tail"}])
    assert [e.type for e in ev] == ["text_delta", "text_end"]
    assert ev[-1].full_text == "tail"


def test_short_reply_list_falls_through_chain(monkeypatch):
    """A backend returning the WRONG NUMBER of replies must be treated
    like an exception: every pending prompt stays pending and falls to
    the next provider (ADVICE r7 — previously tail prompts were
    silently dropped)."""
    from aden_hive_fork_spark.functions.llm_router import (
        ProviderSpec,
        RouterBackend,
    )

    class ShortBackend:
        def complete(self, prompts):
            return ["only-one"]  # wrong length for 2+ prompts

    class GoodBackend:
        def complete(self, prompts):
            return [f"ok:{p}" for p in prompts]

    router = RouterBackend(
        [
            ProviderSpec("short", ShortBackend(), max_retries=0),
            ProviderSpec("good", GoodBackend(), max_retries=0),
        ],
        sleep=lambda s: None,
    )
    out = router.complete(["a", "b", "c"])
    assert out == ["ok:a", "ok:b", "ok:c"]
