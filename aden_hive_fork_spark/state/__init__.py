"""Framework-analog state layer (SURVEY.md §2.B).

Keyed shared state with the reference's scope hierarchy, CDC-style
change audit, run-telemetry (L1/L2/L3) analytics, outcome
aggregation, and versioned checkpoint snapshots.
"""

from .checkpoint import list_checkpoints, load_checkpoint, prune_checkpoints, save_checkpoint
from .conversation import append_messages, compact_conversation, context_handoff
from .monitor import detect_doom_loops, detect_stalls, judge_nodes
from .logstore import (
    L1_SCHEMA,
    L2_SCHEMA,
    L3_SCHEMA,
    aggregate_l2_to_l1,
    aggregate_l3_to_l2,
    list_runs,
    node_drilldown,
)
from .outcome import (
    criterion_progress,
    decisions_by_key,
    outcome_metrics,
    recent_decisions,
    relevance_pairs,
)
from .shared_state import StateChange, latest_state, read_resolved, recent_changes

__all__ = [
    "append_messages",
    "compact_conversation",
    "context_handoff",
    "detect_doom_loops",
    "detect_stalls",
    "judge_nodes",
    "save_checkpoint",
    "load_checkpoint",
    "list_checkpoints",
    "prune_checkpoints",
    "L1_SCHEMA",
    "L2_SCHEMA",
    "L3_SCHEMA",
    "aggregate_l2_to_l1",
    "aggregate_l3_to_l2",
    "list_runs",
    "node_drilldown",
    "outcome_metrics",
    "criterion_progress",
    "relevance_pairs",
    "decisions_by_key",
    "recent_decisions",
    "StateChange",
    "latest_state",
    "read_resolved",
    "recent_changes",
]
