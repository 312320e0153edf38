"""Phased graph-building workflow with validation gates and HITL
approval — the build lifecycle goal -> nodes -> edges -> test ->
approve -> export.

Reference parity: core/framework/builder/workflow.py (BuildPhase
:29-40, ValidationResult :42-49, BuildSession :71-100, GraphBuilder
:102-830 — set_goal/_validate_goal :162-208, add/update/remove_node
:216-303, add_edge/_validate_edge :314-357, whole-graph validate
:361-420 incl. multi-entry reachability, approve :540-568,
final_approve :571-601, export/_build_graph :614-655). Every phase
gate, validation rule, and approval requirement is mirrored; what
changes is the TARGET — the builder assembles DRAFT specs and exports
a ``plans.Pipeline`` (DataFrame dataflow), with node IMPLEMENTATIONS
resolved from a registry at export time (a Spark transform is code,
not serializable session state; the reference stores NodeSpec configs
and resolves executors the same way).

The session persists as plain JSON after every approved step
(reference _save_session) so a build survives process restarts —
the checkpoint/resume discipline of state/checkpoint.py applied to
the build control plane.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field
from typing import Any, Callable

from ..plans.deep_research import Goal
from ..plans.graph import Edge, Node, Pipeline
from .testcase import TestCase, TestResult

# BuildPhase (reference :29-40, verbatim values)
PHASE_INIT = "init"
PHASE_GOAL_DRAFT = "goal_draft"
PHASE_GOAL_APPROVED = "goal_approved"
PHASE_ADDING_NODES = "adding_nodes"
PHASE_ADDING_EDGES = "adding_edges"
PHASE_TESTING = "testing"
PHASE_APPROVED = "approved"
PHASE_EXPORTED = "exported"


class PhaseError(RuntimeError):
    """Raised on an action attempted in a disallowed phase."""


@dataclass
class ValidationResult:
    valid: bool
    errors: list[str] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)
    suggestions: list[str] = field(default_factory=list)


@dataclass
class NodeDraft:
    """Declarative node spec under construction (reference NodeSpec
    surface relevant to validation)."""

    id: str
    name: str = ""
    description: str = ""
    node_type: str = "transform"  # transform | event_loop | router
    system_prompt: str = ""
    tools: tuple[str, ...] = ()
    routes: dict[str, str] = field(default_factory=dict)
    input_keys: tuple[str, ...] = ()
    output_keys: tuple[str, ...] = ()
    client_facing: bool = False


@dataclass
class EdgeDraft:
    """Declarative edge spec (reference EdgeSpec surface)."""

    id: str
    source: str
    target: str
    condition: str = "always"  # always | conditional
    condition_expr: str = ""
    input_mapping: dict[str, str] = field(default_factory=dict)
    priority: int = 0


class GraphBuilder:
    """Enforced incremental graph building with approval gates
    (reference GraphBuilder :102-160 usage contract)."""

    def __init__(
        self,
        name: str,
        storage_path: str | None = None,
        session_id: str | None = None,
    ):
        self.storage_path = storage_path
        if storage_path:
            os.makedirs(storage_path, exist_ok=True)
        self.name = name
        self.session_id = session_id or f"build_{name}"
        self.phase = PHASE_INIT
        self.goal: Goal | None = None
        self.nodes: list[NodeDraft] = []
        self.edges: list[EdgeDraft] = []
        self.test_cases: list[TestCase] = []
        self.test_results: list[TestResult] = []
        self.approvals: list[dict[str, Any]] = []
        self._pending_validation: ValidationResult | None = None
        if session_id and storage_path:
            self._load_session()

    # -- phase gate (reference :745-751) --------------------------------
    def _require_phase(self, allowed: list[str]) -> None:
        if self.phase not in allowed:
            raise PhaseError(
                f"Cannot perform this action in phase '{self.phase}'. "
                f"Allowed phases: {allowed}"
            )

    # -- PHASE 1: GOAL (reference :158-208) -----------------------------
    def set_goal(self, goal: Goal) -> ValidationResult:
        self._require_phase([PHASE_INIT, PHASE_GOAL_DRAFT])
        self.goal = goal
        self.phase = PHASE_GOAL_DRAFT
        v = self._validate_goal(goal)
        self._pending_validation = v
        self._save_session()
        return v

    @staticmethod
    def _validate_goal(goal: Goal) -> ValidationResult:
        errors, warnings = [], []
        if not goal.id:
            errors.append("Goal must have an id")
        if not goal.name:
            errors.append("Goal must have a name")
        if not goal.description:
            errors.append("Goal must have a description")
        if not goal.success_criteria:
            errors.append("Goal must have at least one success criterion")
        else:
            for sc in goal.success_criteria:
                if not sc.description:
                    errors.append(
                        f"Success criterion '{sc.id}' needs a description"
                    )
        if not goal.constraints:
            warnings.append("Consider adding constraints to define boundaries")
        return ValidationResult(not errors, errors, warnings)

    # -- PHASE 2: NODES (reference :216-303) -----------------------------
    def add_node(self, node: NodeDraft) -> ValidationResult:
        self._require_phase([PHASE_GOAL_APPROVED, PHASE_ADDING_NODES])
        if any(n.id == node.id for n in self.nodes):
            return ValidationResult(
                False, [f"Node with id '{node.id}' already exists"]
            )
        self.nodes.append(node)
        self.phase = PHASE_ADDING_NODES
        v = self._validate_node(node)
        self._pending_validation = v
        self._save_session()
        return v

    @staticmethod
    def _validate_node(node: NodeDraft) -> ValidationResult:
        errors, warnings, suggestions = [], [], []
        if not node.id:
            errors.append("Node must have an id")
        if not node.name:
            errors.append("Node must have a name")
        if not node.description:
            warnings.append(f"Node '{node.id}' should have a description")
        if node.node_type == "event_loop":
            if node.tools and not node.system_prompt:
                warnings.append(
                    f"Event loop node '{node.id}' should have a system_prompt"
                )
        if node.node_type == "router" and not node.routes:
            errors.append(f"Router node '{node.id}' must specify routes")
        if not node.input_keys:
            suggestions.append(f"Consider specifying input_keys for '{node.id}'")
        if not node.output_keys:
            suggestions.append(
                f"Consider specifying output_keys for '{node.id}'"
            )
        return ValidationResult(not errors, errors, warnings, suggestions)

    def update_node(self, node_id: str, **updates: Any) -> ValidationResult:
        self._require_phase([PHASE_ADDING_NODES])
        for i, node in enumerate(self.nodes):
            if node.id == node_id:
                d = asdict(node)
                d.update(updates)
                d["tools"] = tuple(d["tools"])
                d["input_keys"] = tuple(d["input_keys"])
                d["output_keys"] = tuple(d["output_keys"])
                updated = NodeDraft(**d)
                self.nodes[i] = updated
                v = self._validate_node(updated)
                self._pending_validation = v
                self._save_session()
                return v
        return ValidationResult(False, [f"Node '{node_id}' not found"])

    def remove_node(self, node_id: str) -> ValidationResult:
        self._require_phase([PHASE_ADDING_NODES])
        for e in self.edges:
            if e.source == node_id or e.target == node_id:
                return ValidationResult(
                    False,
                    [
                        f"Cannot remove node '{node_id}': referenced by "
                        f"edge '{e.id}'"
                    ],
                )
        self.nodes = [n for n in self.nodes if n.id != node_id]
        self._save_session()
        return ValidationResult(True)

    # -- PHASE 3: EDGES (reference :314-357) ------------------------------
    def add_edge(self, edge: EdgeDraft) -> ValidationResult:
        self._require_phase([PHASE_ADDING_NODES, PHASE_ADDING_EDGES])
        if any(e.id == edge.id for e in self.edges):
            return ValidationResult(
                False, [f"Edge with id '{edge.id}' already exists"]
            )
        self.edges.append(edge)
        self.phase = PHASE_ADDING_EDGES
        v = self._validate_edge(edge)
        self._pending_validation = v
        self._save_session()
        return v

    def _validate_edge(self, edge: EdgeDraft) -> ValidationResult:
        errors, warnings = [], []
        if not edge.id:
            errors.append("Edge must have an id")
        if not any(n.id == edge.source for n in self.nodes):
            errors.append(f"Edge source '{edge.source}' not found in nodes")
        if not any(n.id == edge.target for n in self.nodes):
            errors.append(f"Edge target '{edge.target}' not found in nodes")
        if edge.condition == "conditional" and not edge.condition_expr:
            warnings.append(
                f"Conditional edge '{edge.id}' has no condition_expr"
            )
        return ValidationResult(not errors, errors, warnings)

    # -- whole-graph validation (reference :361-420) -----------------------
    def validate(self) -> ValidationResult:
        errors, warnings = [], []
        if not self.goal:
            return ValidationResult(False, ["No goal defined"])
        if not self.nodes:
            errors.append("No nodes defined")
        entry_candidates = [
            n.id
            for n in self.nodes
            if not any(e.target == n.id for e in self.edges)
        ]
        if not entry_candidates and self.nodes:
            errors.append("No entry node found (all nodes have incoming edges)")
        elif len(entry_candidates) > 1:
            warnings.append(
                f"Multiple entry candidates: {entry_candidates}. Specify one."
            )
        terminal_candidates = [
            n.id
            for n in self.nodes
            if not any(e.source == n.id for e in self.edges)
        ]
        if not terminal_candidates and self.nodes:
            warnings.append(
                "No terminal nodes found (all nodes have outgoing edges)"
            )
        # reachability from ALL entry candidates (async entry points
        # mean several no-incoming roots — reference :396-405)
        if entry_candidates and self.nodes:
            reachable: set[str] = set()
            for c in entry_candidates:
                reachable |= self._compute_reachable(c)
            unreachable = [n.id for n in self.nodes if n.id not in reachable]
            if unreachable:
                errors.append(f"Unreachable nodes: {unreachable}")
        v = ValidationResult(not errors, errors, warnings)
        self._pending_validation = v
        return v

    def _compute_reachable(self, start: str) -> set[str]:
        reachable: set[str] = set()
        stack = [start]
        while stack:
            cur = stack.pop()
            if cur in reachable:
                continue
            reachable.add(cur)
            for e in self.edges:
                if e.source == cur:
                    stack.append(e.target)
            for n in self.nodes:  # router routes are edges too
                if n.id == cur and n.routes:
                    stack.extend(n.routes.values())
        return reachable

    # -- testing (reference :437-534) --------------------------------------
    def add_test(self, test: TestCase) -> None:
        self.test_cases.append(test)
        self._save_session()

    def run_test(
        self,
        test: TestCase,
        executor: Callable[["GraphBuilder", TestCase], TestResult],
    ) -> TestResult:
        self._require_phase(
            [PHASE_ADDING_NODES, PHASE_ADDING_EDGES, PHASE_TESTING]
        )
        self.phase = PHASE_TESTING
        result = executor(self, test)
        self.test_results.append(result)
        self._save_session()
        return result

    def run_all_tests(
        self, executor: Callable[["GraphBuilder", TestCase], TestResult]
    ) -> list[TestResult]:
        return [self.run_test(t, executor) for t in self.test_cases]

    # -- approval (reference :540-601) --------------------------------------
    def approve(self, comment: str) -> bool:
        if self._pending_validation is None:
            raise PhaseError("Nothing to approve. Run validation first.")
        if not self._pending_validation.valid:
            return False
        self.approvals.append(
            {
                "phase": self.phase,
                "comment": comment,
                "validation": asdict(self._pending_validation),
            }
        )
        if self.phase == PHASE_GOAL_DRAFT:
            self.phase = PHASE_GOAL_APPROVED
        self._pending_validation = None
        self._save_session()
        return True

    def final_approve(self, comment: str) -> bool:
        v = self.validate()
        if not v.valid:
            self._pending_validation = v
            return False
        if self.test_cases:
            failed = [r for r in self.test_results if not r.passed]
            if failed:
                self._pending_validation = ValidationResult(
                    False,
                    [f"Failed tests: {[r.test_id for r in failed]}"],
                )
                return False
        self.phase = PHASE_APPROVED
        self.approvals.append({"phase": "final", "comment": comment})
        self._save_session()
        return True

    # -- export (reference :614-655) ------------------------------------------
    def export(
        self,
        impl_registry: dict[str, Callable] | None = None,
        max_visits: int = 3,
    ) -> Pipeline:
        """Build the executable ``plans.Pipeline`` from the approved
        drafts; node transforms resolve from ``impl_registry``
        (id -> DataFrame transform; missing ids become identity
        nodes — routers/terminals). Requires final approval."""
        self._require_phase([PHASE_APPROVED])
        impls = impl_registry or {}
        entry = next(
            (
                n.id
                for n in self.nodes
                if not any(e.target == n.id for e in self.edges)
            ),
            None,
        )
        terminals = [
            n.id
            for n in self.nodes
            if not any(e.source == n.id for e in self.edges)
        ]
        nodes = [
            Node(
                n.id,
                impls.get(n.id),
                client_facing=n.client_facing,
                output_keys=tuple(n.output_keys),
            )
            for n in self.nodes
        ]
        edges = [
            Edge(
                e.source,
                e.target,
                condition=(
                    e.condition_expr
                    if e.condition == "conditional"
                    else "always"
                ),
                input_mapping=dict(e.input_mapping),
                priority=e.priority,
            )
            for e in self.edges
        ]
        pipe = Pipeline(
            nodes,
            edges,
            entry=entry or "",
            terminals=terminals,
            max_visits=max_visits,
        )
        self.phase = PHASE_EXPORTED
        self._save_session()
        return pipe

    # -- persistence (reference _save_session/_load_session) -----------------
    def _session_path(self) -> str | None:
        if not self.storage_path:
            return None
        return os.path.join(self.storage_path, f"{self.session_id}.json")

    def _save_session(self) -> None:
        path = self._session_path()
        if not path:
            return
        goal = None
        if self.goal:
            goal = {
                "id": self.goal.id,
                "name": self.goal.name,
                "description": self.goal.description,
                "success_criteria": [asdict(c) for c in self.goal.success_criteria],
                "constraints": list(self.goal.constraints),
            }
        doc = {
            "id": self.session_id,
            "name": self.name,
            "phase": self.phase,
            "goal": goal,
            "nodes": [asdict(n) for n in self.nodes],
            "edges": [asdict(e) for e in self.edges],
            "approvals": self.approvals,
            "test_results": [
                {"test_id": r.test_id, "passed": r.passed,
                 "error_message": r.error_message}
                for r in self.test_results
            ],
        }
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(doc, fh, indent=2)
        os.replace(tmp, path)  # atomic publish (pointer discipline)

    def _load_session(self) -> None:
        from ..plans.deep_research import SuccessCriterion

        path = self._session_path()
        if not path or not os.path.exists(path):
            raise FileNotFoundError(f"no build session at {path}")
        with open(path) as fh:
            doc = json.load(fh)
        self.name = doc["name"]
        self.phase = doc["phase"]
        if doc.get("goal"):
            g = doc["goal"]
            self.goal = Goal(
                id=g["id"],
                name=g["name"],
                description=g["description"],
                success_criteria=tuple(
                    SuccessCriterion(**c) for c in g["success_criteria"]
                ),
                constraints=tuple(g["constraints"]),
            )
        self.nodes = [
            NodeDraft(
                **{
                    **n,
                    "tools": tuple(n.get("tools", ())),
                    "input_keys": tuple(n.get("input_keys", ())),
                    "output_keys": tuple(n.get("output_keys", ())),
                }
            )
            for n in doc.get("nodes", [])
        ]
        self.edges = [EdgeDraft(**e) for e in doc.get("edges", [])]
        self.approvals = doc.get("approvals", [])
        self.test_results = [
            TestResult(
                test_id=r["test_id"],
                passed=r["passed"],
                error_message=r.get("error_message"),
            )
            for r in doc.get("test_results", [])
        ]
