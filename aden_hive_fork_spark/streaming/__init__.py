"""Event/streaming layer on Structured Streaming (SURVEY.md §2.C)."""

from .events import (
    EVENT_SCHEMA,
    await_event,
    event_stats_stream,
    filtered_subscription,
    read_event_stream,
    session_windows,
    sliding_windows,
    stamp_graph_id,
    tumbling_windows,
    write_jsonl_sink,
)
from .rollup_stream import maintain_rollup, merge_batch, read_rollup, vacuum_rollup
from .stateful import running_user_state

__all__ = [
    "EVENT_SCHEMA",
    "await_event",
    "read_event_stream",
    "filtered_subscription",
    "tumbling_windows",
    "sliding_windows",
    "session_windows",
    "event_stats_stream",
    "stamp_graph_id",
    "write_jsonl_sink",
    "running_user_state",
    "maintain_rollup",
    "merge_batch",
    "read_rollup",
    "vacuum_rollup",
]
