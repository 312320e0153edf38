"""Structured logging with automatic trace-context propagation, plus
the Spark side that makes the logs queryable.

Reference parity: core/framework/observability/logging.py (302 LoC) —
ContextVar-propagated trace context (trace_id → execution_id →
agent_id → node_id set once per layer, merged into every record),
dual formatters (JSON lines for production, colorized human-readable
for development), ANSI stripping, and the well-known extra fields
(event, latency_ms, tokens_used, node_id, model).

Engine-side addition (the reason this is data-plane here, not just
control-plane): ``read_structured_logs`` loads the emitted JSONL into
a typed DataFrame, and ``logs_to_node_steps`` projects it onto the
L3 node-step schema of state.logstore — so the builder analytics
(state/builder_query) and the L3→L2→L1 rollups run directly over what
the logger wrote. At scale the JSONL lands partitioned by date and the
reader is one schema-applied scan.
"""

from __future__ import annotations

import json
import logging
import re
from contextlib import contextmanager
from contextvars import ContextVar
from datetime import datetime, timezone
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_trace_context: ContextVar[dict[str, Any] | None] = ContextVar(
    "aden_trace_context", default=None
)

_ANSI_RE = re.compile(r"\x1b\[[0-9;]*m")

# extra attributes lifted off LogRecords into first-class JSON fields
_KNOWN_EXTRAS = ("event", "latency_ms", "tokens_used", "node_id", "model")


def strip_ansi(text: str) -> str:
    """Drop ANSI color escapes so JSON logs stay machine-parseable."""
    return _ANSI_RE.sub("", text)


def set_trace_context(**fields: Any) -> None:
    """Merge fields into the ambient trace context (ContextVar-based:
    thread- and async-safe; each layer adds its key once and every
    log call below inherits the union)."""
    current = dict(_trace_context.get() or {})
    current.update(fields)
    _trace_context.set(current)


def get_trace_context() -> dict[str, Any]:
    return dict(_trace_context.get() or {})


def clear_trace_context() -> None:
    _trace_context.set(None)


@contextmanager
def trace_context(**fields: Any):
    """Scoped variant: restores the previous context on exit (the
    executor enters one per node; nested scopes nest naturally)."""
    token = _trace_context.set({**(_trace_context.get() or {}), **fields})
    try:
        yield
    finally:
        _trace_context.reset(token)


class StructuredFormatter(logging.Formatter):
    """One JSON object per line: timestamp/level/logger/message, the
    ambient trace context, the known extras, and exception text —
    everything ANSI-stripped."""

    def format(self, record: logging.LogRecord) -> str:
        entry: dict[str, Any] = {
            "timestamp": datetime.now(timezone.utc).isoformat(),
            "level": record.levelname.lower(),
            "logger": record.name,
            "message": strip_ansi(record.getMessage()),
        }
        entry.update(_trace_context.get() or {})
        for key in _KNOWN_EXTRAS:
            val = getattr(record, key, None)
            if val is not None:
                entry[key] = strip_ansi(val) if isinstance(val, str) else val
        if record.exc_info:
            entry["exception"] = strip_ansi(
                self.formatException(record.exc_info)
            )
        return json.dumps(entry, default=str)


class HumanReadableFormatter(logging.Formatter):
    """Colorized development output with a trace_id correlation
    prefix."""

    COLORS = {
        "DEBUG": "\x1b[36m",
        "INFO": "\x1b[32m",
        "WARNING": "\x1b[33m",
        "ERROR": "\x1b[31m",
        "CRITICAL": "\x1b[35m",
    }
    RESET = "\x1b[0m"

    def format(self, record: logging.LogRecord) -> str:
        ctx = _trace_context.get() or {}
        trace = ctx.get("trace_id")
        prefix = f"[{str(trace)[:8]}] " if trace else ""
        color = self.COLORS.get(record.levelname, "")
        ts = datetime.now(timezone.utc).strftime("%H:%M:%S")
        return (
            f"{ts} {color}{record.levelname:<8}{self.RESET} "
            f"{prefix}{record.name}: {record.getMessage()}"
        )


def configure_logging(
    json_mode: bool = True,
    level: int = logging.INFO,
    stream=None,
    logger_name: str = "aden_hive_fork_spark",
) -> logging.Logger:
    """Install one handler with the chosen formatter on the package
    logger (idempotent — reconfiguring replaces the handler)."""
    logger = logging.getLogger(logger_name)
    for h in list(logger.handlers):
        logger.removeHandler(h)
    handler = logging.StreamHandler(stream)
    handler.setFormatter(
        StructuredFormatter() if json_mode else HumanReadableFormatter()
    )
    logger.addHandler(handler)
    logger.setLevel(level)
    logger.propagate = False
    return logger


# ---------------------------------------------------------------------------
# Spark side: logs as a table
# ---------------------------------------------------------------------------

LOG_SCHEMA = (
    "timestamp string, level string, logger string, message string,"
    " trace_id string, execution_id string, agent_id string,"
    " node_id string, event string, latency_ms long, tokens_used long,"
    " model string, exception string"
)


def read_structured_logs(spark: SparkSession, path: str) -> DataFrame:
    """Load StructuredFormatter JSONL into a typed DataFrame (explicit
    schema — no inference scan; extra ad-hoc fields are dropped, which
    is the stable-contract tradeoff)."""
    return spark.read.schema(LOG_SCHEMA).json(path).withColumn(
        "ts", F.to_timestamp(F.col("timestamp"))
    )


def logs_to_node_steps(logs: DataFrame) -> DataFrame:
    """Project log rows onto state.logstore's L3 node-step shape so
    the L3→L2→L1 rollups and builder analytics run over emitted logs:
    one step per (execution_id, node_id) log row carrying latency or
    tokens; step_index is the per-node arrival order (ts, then
    message as the deterministic tie-break)."""
    from pyspark.sql.window import Window

    steps = logs.filter(
        F.col("execution_id").isNotNull() & F.col("node_id").isNotNull()
    )
    w = Window.partitionBy("execution_id", "node_id").orderBy(
        F.col("ts").asc(), F.col("message").asc()
    )
    return steps.select(
        F.col("execution_id").alias("run_id"),
        "node_id",
        F.row_number().over(w).cast("int").alias("step_index"),
        F.col("message").alias("llm_text"),
        F.lit(None).cast("long").alias("input_tokens"),
        F.coalesce(F.col("tokens_used"), F.lit(0))
        .cast("long")
        .alias("output_tokens"),
        F.coalesce(F.col("latency_ms"), F.lit(0))
        .cast("long")
        .alias("latency_ms"),
        F.when(F.col("level").isin("error", "critical"), "ESCALATE")
        .otherwise("ACCEPT")
        .alias("verdict"),
        F.when(
            F.col("level").isin("error", "critical"),
            F.coalesce(F.col("exception"), F.col("message")),
        ).alias("error"),
    )
