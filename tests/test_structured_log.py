"""Structured logging (state/structured_log): context propagation,
JSON/human formatters, ANSI stripping, and the Spark reader bridging
emitted logs into the L3 node-step schema."""

from __future__ import annotations

import io
import json
import logging

import pytest

from aden_hive_fork_spark.state.structured_log import (
    HumanReadableFormatter,
    clear_trace_context,
    configure_logging,
    get_trace_context,
    logs_to_node_steps,
    read_structured_logs,
    set_trace_context,
    strip_ansi,
    trace_context,
)


@pytest.fixture(autouse=True)
def _clean_context():
    clear_trace_context()
    yield
    clear_trace_context()


def _emit(buf, **extra):
    logger = configure_logging(
        json_mode=True, stream=buf, logger_name="t.structured"
    )
    logger.info("hello \x1b[32mgreen\x1b[0m world", extra=extra)
    return [json.loads(line) for line in buf.getvalue().splitlines()]


def test_json_entry_carries_context_and_extras():
    set_trace_context(trace_id="t-123", agent_id="a1")
    set_trace_context(execution_id="run-9")  # merges, not replaces
    buf = io.StringIO()
    (entry,) = _emit(buf, latency_ms=42, node_id="fetch", model="m")
    assert entry["message"] == "hello green world"  # ANSI stripped
    assert entry["trace_id"] == "t-123"
    assert entry["agent_id"] == "a1"
    assert entry["execution_id"] == "run-9"
    assert entry["latency_ms"] == 42
    assert entry["node_id"] == "fetch"
    assert entry["level"] == "info"


def test_scoped_context_restores_on_exit():
    set_trace_context(trace_id="outer")
    with trace_context(node_id="n1"):
        assert get_trace_context() == {"trace_id": "outer", "node_id": "n1"}
    assert get_trace_context() == {"trace_id": "outer"}


def test_exception_text_included():
    buf = io.StringIO()
    logger = configure_logging(
        json_mode=True, stream=buf, logger_name="t.exc"
    )
    try:
        raise ValueError("boom")
    except ValueError:
        logger.exception("failed")
    entry = json.loads(buf.getvalue())
    assert entry["level"] == "error"
    assert "ValueError: boom" in entry["exception"]


def test_human_formatter_has_trace_prefix_and_color():
    set_trace_context(trace_id="abcdef0123456789")
    rec = logging.LogRecord("x", logging.WARNING, "f", 1, "msg", None, None)
    out = HumanReadableFormatter().format(rec)
    assert "[abcdef01]" in out
    assert "\x1b[33m" in out  # warning color
    assert strip_ansi(out).count("WARNING") == 1


def test_reconfigure_is_idempotent():
    buf = io.StringIO()
    configure_logging(json_mode=True, stream=buf, logger_name="t.idem")
    logger = configure_logging(
        json_mode=True, stream=buf, logger_name="t.idem"
    )
    logger.info("once")
    assert len(buf.getvalue().splitlines()) == 1  # one handler, one line


def test_spark_reader_and_l3_bridge(spark, tmp_path):
    buf = io.StringIO()
    logger = configure_logging(
        json_mode=True, stream=buf, logger_name="t.bridge"
    )
    with trace_context(trace_id="tr", execution_id="runA", agent_id="g"):
        with trace_context(node_id="plan"):
            logger.info("step one", extra={"latency_ms": 10})
            logger.info("step two", extra={"tokens_used": 7})
        with trace_context(node_id="act"):
            try:
                raise RuntimeError("tool exploded")
            except RuntimeError:
                logger.exception("act failed")
    log_file = tmp_path / "logs.jsonl"
    log_file.write_text(buf.getvalue())

    logs = read_structured_logs(spark, str(log_file))
    steps = logs_to_node_steps(logs).collect()
    by_node = {}
    for r in steps:
        by_node.setdefault(r["node_id"], []).append(r)
    assert {r["run_id"] for r in steps} == {"runA"}
    plan = sorted(by_node["plan"], key=lambda r: r["step_index"])
    assert [r["llm_text"] for r in plan] == ["step one", "step two"]
    assert plan[0]["latency_ms"] == 10 and plan[1]["output_tokens"] == 7
    (act,) = by_node["act"]
    assert act["verdict"] == "ESCALATE"
    assert "RuntimeError: tool exploded" in act["error"]

    # the bridge feeds the real rollup: L3 -> L2
    from aden_hive_fork_spark.state.logstore import aggregate_l3_to_l2

    l2 = {r["node_id"]: r for r in
          aggregate_l3_to_l2(logs_to_node_steps(logs)).collect()}
    assert l2["plan"]["total_steps"] == 2
    assert l2["plan"]["accept_count"] == 2
    assert l2["act"]["escalate_count"] == 1
    assert "RuntimeError" in l2["act"]["first_error"]
