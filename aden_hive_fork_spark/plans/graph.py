"""DataFrame dataflow graphs with predicate-guarded routing.

The reference executes an agent graph: nodes transform a payload,
edges route it onward guarded by ALWAYS / ON_SUCCESS / ON_FAILURE /
CONDITIONAL(expr) conditions with priorities, fan-out runs parallel
branches, fan-in converges them, and a per-node visit cap guards
loops (reference: core/framework/graph/edge.py:39-46 conditions,
:107-204 should_traverse, :276-303 input mapping, :506-540 fan-out/
convergence, :574-698 validation; executor.py:590+ interpreter loop,
:646-672 visit guard, :1853-2082 parallel branches).

Spark-first re-expression: a node is a DataFrame -> DataFrame
transform; an edge is a *row-level* filter (the compiled safe_eval
condition) plus an optional column mapping. Routing therefore
partitions the DATA, not the control flow: every branch's filter is
part of one lazily-built logical plan, so Catalyst sees the whole
graph and fan-out branches share the cached parent scan. Only
iterative feedback edges remain driver-side control flow (bounded by
``max_visits`` like the reference's max_node_visits).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.safe_eval_compiler import compile_expr


class GraphValidationError(ValueError):
    pass


@dataclass
class Node:
    """A named DataFrame transform. ``fn=None`` is identity (router /
    terminal nodes).

    client_facing: marks a node that talks to the user (reference
    NodeSpec.client_facing) — at most ONE branch of any fan-out may
    carry it (edge.py:668-679).
    output_keys: the shared-state keys (columns) the node writes
    (reference NodeSpec.output_keys) — parallel fan-out branches must
    declare DISJOINT keys or a last-wins race loses data
    (edge.py:681-698).
    """

    name: str
    fn: Callable[[DataFrame], DataFrame] | None = None
    client_facing: bool = False
    output_keys: tuple[str, ...] = ()

    def apply(self, df: DataFrame) -> DataFrame:
        return self.fn(df) if self.fn is not None else df


@dataclass
class EntryPoint:
    """A named alternative entry (reference AsyncEntryPoint,
    edge.py:~520): ``id`` must be unique across the pipeline and
    ``node`` must exist; entry-point nodes are reachability roots."""

    id: str
    node: str


@dataclass
class Edge:
    """source -> target, guarded.

    condition: "always" | a safe_eval expression over the source
    node's output columns (compiled to a Spark Column filter).
    input_mapping: {target_col: source_col} projection/rename
    (reference EdgeSpec.map_inputs, edge.py:276-303).
    priority: among CONDITIONAL edges from one source, only the
    matching edges of the highest priority fire (edge.py:506-523).
    """

    source: str
    target: str
    condition: str = "always"
    input_mapping: dict[str, str] = field(default_factory=dict)
    priority: int = 0

    def guard(self, df: DataFrame) -> DataFrame:
        if self.condition == "always":
            return df
        return df.filter(compile_expr(self.condition, df.schema))

    def map_inputs(self, df: DataFrame) -> DataFrame:
        if not self.input_mapping:
            return df
        return df.select(
            *[F.col(src).alias(tgt) for tgt, src in self.input_mapping.items()]
        )


class Pipeline:
    """A validated node/edge graph executable over DataFrames."""

    def __init__(
        self,
        nodes: list[Node],
        edges: list[Edge],
        entry: str,
        terminals: list[str],
        max_visits: int = 3,
        entry_points: list[EntryPoint] | None = None,
    ):
        self.nodes = {n.name: n for n in nodes}
        self.edges = edges
        self.entry = entry
        self.terminals = list(terminals)
        self.max_visits = max_visits
        self.entry_points = list(entry_points or [])
        self.validate()

    # -- validation (reference GraphSpec.validate, edge.py:574-698) ----
    def validate(self) -> None:
        if len(self.nodes) != len({n for n in self.nodes}):
            raise GraphValidationError("duplicate node names")
        if self.entry not in self.nodes:
            raise GraphValidationError(f"entry node '{self.entry}' not defined")
        missing = [t for t in self.terminals if t not in self.nodes]
        if missing:
            raise GraphValidationError(f"terminal nodes not defined: {missing}")
        for e in self.edges:
            if e.source not in self.nodes or e.target not in self.nodes:
                raise GraphValidationError(f"edge references unknown node: {e}")
        # alternative entry points: unique ids, known nodes
        # (reference async_entry_points validation, edge.py:582-604)
        seen_entry_ids: set[str] = set()
        for ep in self.entry_points:
            if ep.id in seen_entry_ids:
                raise GraphValidationError(
                    f"duplicate entry point id: '{ep.id}'"
                )
            seen_entry_ids.add(ep.id)
            if ep.node not in self.nodes:
                raise GraphValidationError(
                    f"entry point '{ep.id}' references missing node "
                    f"'{ep.node}'"
                )
        # reachability from the entry AND every declared entry point
        adj: dict[str, list[str]] = {}
        for e in self.edges:
            adj.setdefault(e.source, []).append(e.target)
        roots = [self.entry] + [ep.node for ep in self.entry_points]
        seen = set(roots)
        stack = list(roots)
        while stack:
            for nxt in adj.get(stack.pop(), []):
                if nxt not in seen:
                    seen.add(nxt)
                    stack.append(nxt)
        unreachable = sorted(set(self.nodes) - seen)
        if unreachable:
            raise GraphValidationError(f"unreachable nodes: {unreachable}")
        unreachable_terminals = [t for t in self.terminals if t not in seen]
        if unreachable_terminals:
            raise GraphValidationError(f"terminals unreachable: {unreachable_terminals}")
        self._validate_fan_out()

    def _validate_fan_out(self) -> None:
        """Fan-out legality (reference edge.py:668-698). A fan-out is
        a (source, priority) edge group with >1 edge — the edges that
        can FIRE TOGETHER under this executor's priority grouping
        (run() keeps only the top-priority matching group, so edges of
        different priorities are alternatives, not parallel branches).

        Rule 1: at most one branch may target a client_facing node —
        two user-visible branches of one fan-out race for the
        conversation.
        Rule 2: parallel branches that declare output_keys must be
        DISJOINT — concurrent writers to one shared-state key are a
        last-wins data loss. (The reference scopes this to event_loop
        nodes; here every node that declares output_keys participates,
        since the Spark analog has one node kind.)
        """
        groups: dict[tuple[str, int], list[str]] = {}
        for e in self.edges:
            groups.setdefault((e.source, e.priority), []).append(e.target)
        for (source, _prio), targets in sorted(groups.items()):
            if len(targets) <= 1:
                continue
            client = sorted(
                t for t in set(targets) if self.nodes[t].client_facing
            )
            if len(client) > 1:
                raise GraphValidationError(
                    f"fan-out from '{source}' has multiple client-facing "
                    f"branches: {client}; only one branch may be "
                    f"client-facing"
                )
            writers: dict[str, str] = {}
            for t in sorted(set(targets)):
                for key in self.nodes[t].output_keys:
                    if key in writers and writers[key] != t:
                        raise GraphValidationError(
                            f"fan-out from '{source}': nodes "
                            f"'{writers[key]}' and '{t}' both write "
                            f"output_key '{key}'; parallel branches must "
                            f"have disjoint output_keys"
                        )
                    writers[key] = t

    # -- execution -----------------------------------------------------
    def run(self, df: DataFrame, cache_fanout: bool = True) -> dict[str, DataFrame]:
        """Push rows through the graph; returns {terminal: DataFrame}.

        Fan-out: all matching edges fire, each on its guarded subset
        (parent cached so branches share the scan). Fan-in: arrivals
        at the same node union by name. Cycles execute at most
        ``max_visits`` times per node (reference max_node_visits,
        node.py:217-224).
        """
        visits: dict[str, int] = {}
        results: dict[str, DataFrame] = {}
        # executed node sequence, for tests/diagnostics (the
        # reference's decision-trace analog)
        self.last_trace: list[str] = []
        # (node, frame) worklist; deterministic FIFO order
        work: list[tuple[str, DataFrame]] = [(self.entry, df)]
        while work:
            name, frame = work.pop(0)
            visits[name] = visits.get(name, 0) + 1
            if visits[name] > self.max_visits:
                continue
            self.last_trace.append(name)
            out = self.nodes[name].apply(frame)
            if name in self.terminals:
                results[name] = (
                    results[name].unionByName(out) if name in results else out
                )
                continue
            outgoing = [e for e in self.edges if e.source == name]
            # priority grouping among conditional edges (edge.py:506-523)
            if outgoing:
                top = max(e.priority for e in outgoing)
                outgoing = [e for e in outgoing if e.priority == top]
            if len(outgoing) > 1 and cache_fanout:
                out = out.cache()
            for e in outgoing:
                work.append((e.target, e.map_inputs(e.guard(out))))
        return results
