"""Hive Coder Agent — the reference's agent-builder template executed
hermetically on this engine's §2.B surface (the second capstone; the
first is plans/deep_research.py).

Reference parity: core/framework/agents/hive_coder/agent.py (goal
:23-100, single client-facing event_loop coder node :98-116 with
output_keys ["agent_name", "validation_result"] per
nodes/__init__.py:661-674, queen graph :140-168 as an INDEPENDENT
executor) and nodes/__init__.py (the coder's self-verification loop
:454-464 — "If anything fails: read error, fix with edit_file,
re-validate. Up to 3x"; required files list :288-300; the
validate_agent_tools / no-fabricated-tools constraint :37,89).

The reference folds generate -> validate -> fix into ONE LLM node's
internal loop; this port decomposes that loop into graph nodes so the
pipeline surface (fan-out guards, feedback edge, max_visits bound,
client_facing / output_keys legality) does the work:

- **intake** — natural-language spec -> design brief via the
  pluggable LLM backend (MockLLMBackend in tests), plus the
  deterministic agent_name slug.
- **coder** (client_facing=True, output_keys=("agent_name",
  "validation_result") — the reference NodeSpec fields, now enforced
  by Pipeline._validate_fan_out) — emits the package manifest: the
  generated file list and the declared tool references. On fix
  rounds (fix_hint non-NULL, the nullable_output_keys discipline) it
  drops fabricated tool references — the reference's "read error,
  fix, re-validate".
- **validate** — the reference's structural validation as
  DataFrame rules: required-files completeness (array_except),
  non-empty valid-python check, and the no-fabricated-tools
  constraint as an explode + broadcast ANTI-join against the
  discovered tool registry (reference validate_agent_tools;
  dynamic-tool-discovery means the registry is DATA, not code).
- fan-out: failing packages loop back to coder with the fix hint;
  passing packages exit to **package** (terminal). max_visits bounds
  the loop exactly like the reference's "Up to 3x".
- **queen** — the reference queen runs as an independent
  GraphExecutor, NOT inside the coder graph (agent.py:136-139,
  "ticket_receiver is no longer needed"); mirrored here as a
  SEPARATE single-node Pipeline whose escalation-ticket triage is a
  deterministic rule over ticket rows.

At 100 TB scale nothing here collects: specs are rows, package
manifests are arrays carried in columns, and the only join is the
tool-registry ANTI-join against a broadcast dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.llm_tier import LLMBackend
from .deep_research import Goal, SuccessCriterion, _complete_column
from .graph import Edge, Node, Pipeline

# ---------------------------------------------------------------------------
# Goal definition (reference agent.py:23-100, verbatim WHAT)
# ---------------------------------------------------------------------------

GOAL = Goal(
    id="agent-builder",
    name="Hive Agent Builder",
    description=(
        "Build complete, validated Hive agent packages from natural "
        "language specifications. Produces production-ready Python "
        "packages with goals, nodes, edges, system prompts, MCP "
        "configuration, and tests."
    ),
    success_criteria=(
        SuccessCriterion(
            "valid-package",
            "Generated agent package passes structural validation",
            "validation_pass", "true", 0.30,
        ),
        SuccessCriterion(
            "complete-files",
            "All required files generated",
            "file_count", ">=6", 0.25,
        ),
        SuccessCriterion(
            "user-satisfaction",
            "User reviews and approves the generated agent",
            "user_approval", "true", 0.25,
        ),
        SuccessCriterion(
            "framework-compliance",
            "Generated code follows framework patterns",
            "pattern_compliance", "100%", 0.20,
        ),
    ),
    constraints=(
        "dynamic-tool-discovery: discover available tools before "
        "referencing them in agent designs",
        "no-fabricated-tools: only reference tools that exist in the "
        "discovered registry",
        "valid-python: all generated files must be syntactically correct",
        "self-verification: run validation after writing code; fix "
        "errors before presenting",
    ),
)

# reference nodes/__init__.py:288-300 — the required package files
REQUIRED_FILES = (
    "agent.py",
    "config.py",
    "nodes/__init__.py",
    "__init__.py",
    "__main__.py",
    "mcp_servers.json",
)


# ---------------------------------------------------------------------------
# Nodes
# ---------------------------------------------------------------------------


def intake_node(backend: LLMBackend):
    """Spec -> design brief (LLM tier) + deterministic agent_name
    slug; fix_hint starts NULL (reference nullable_output_keys)."""

    def fn(df: DataFrame) -> DataFrame:
        out = _complete_column(df, "request", "design_brief", backend)
        return out.withColumn(
            "agent_name",
            F.regexp_replace(
                F.lower(F.trim(F.col("request"))), r"[^a-z0-9]+", "_"
            ),
        ).withColumn("fix_hint", F.lit(None).cast("string"))

    return Node("intake", fn)


def coder_node():
    """Generate the package manifest from the brief. Tool references
    are every ``tool:<name>`` token in the brief; a fix round
    (fix_hint non-NULL) drops the ones validation flagged — the
    reference's edit_file repair. client_facing + output_keys are the
    reference NodeSpec fields (nodes/__init__.py:661-674)."""

    def fn(df: DataFrame) -> DataFrame:
        tools = F.array_distinct(
            F.expr(
                r"transform(filter(split(design_brief, '\\s+'), "
                "t -> t LIKE 'tool:%'), t -> substring(t, 6))"
            )
        )
        # fix round: remove the fabricated tools named in the hint
        # (comma-separated list after 'drop:')
        flagged = F.split(
            F.regexp_extract(F.coalesce("fix_hint", F.lit("")), r"drop:(.*)", 1),
            ",",
        )
        tools = F.when(
            F.col("fix_hint").isNotNull(),
            F.array_except(tools, flagged),
        ).otherwise(tools)
        files = F.transform(
            F.array(*[F.lit(p) for p in REQUIRED_FILES]),
            lambda p: F.struct(
                p.alias("path"),
                F.concat(
                    F.lit("# generated for "),
                    F.col("agent_name"),
                    F.lit(" :: "),
                    p,
                ).alias("content"),
            ),
        )
        return df.select(
            "request",
            "design_brief",
            "agent_name",
            "fix_hint",
            files.alias("files"),
            tools.alias("declared_tools"),
        )

    return Node(
        "coder",
        fn,
        client_facing=True,
        output_keys=("agent_name", "validation_result"),
    )


def validate_node(tool_registry: DataFrame):
    """Structural validation (reference default_agent.validate() +
    validate_agent_tools, nodes/__init__.py:437-464):

    - complete-files: every REQUIRED_FILES path present,
    - valid-python: every generated file has content,
    - no-fabricated-tools: declared tools not in the DISCOVERED
      registry (broadcast anti-join semantics via explode + left
      join) fail the package and become the fix hint.

    Emits ``validation_result`` ('pass' | 'fail: ...'), the
    fabricated-tool list, and ``needs_fix``.
    """
    registry = F.broadcast(
        tool_registry.select(F.col("tool_name").cast("string")).distinct()
    )

    def fn(df: DataFrame) -> DataFrame:
        sdf = df.withColumn(
            "_missing",
            F.array_except(
                F.array(*[F.lit(p) for p in REQUIRED_FILES]),
                F.transform(F.col("files"), lambda s: s.getField("path")),
            ),
        ).withColumn(
            "_empty_files",
            F.size(
                F.filter(
                    F.col("files"),
                    lambda s: F.length(s.getField("content")) == 0,
                )
            ),
        )
        # fabricated tools: declared minus registry (explode + left
        # join + re-aggregate keeps the registry broadcast and the
        # spec side shuffle-free beyond its own key). Keyed by the
        # ORIGINAL request, not agent_name — two different requests
        # can slug to the same agent_name and must not cross-match.
        decl = sdf.select(
            "request", F.explode_outer("declared_tools").alias("tool_name")
        )
        fab = (
            decl.join(
                registry.withColumn("_known", F.lit(True)),
                "tool_name",
                "left",
            )
            .filter(F.col("tool_name").isNotNull() & F.col("_known").isNull())
            .groupBy("request")
            .agg(F.array_sort(F.collect_list("tool_name")).alias("_fabricated"))
        )
        out = (
            sdf.join(fab, "request", "left")
            .withColumn(
                "_fabricated",
                F.coalesce(
                    F.col("_fabricated"), F.array().cast("array<string>")
                ),
            )
            .withColumn(
                "validation_result",
                F.when(
                    F.size("_missing") > 0,
                    F.concat(
                        F.lit("fail: missing files "),
                        F.array_join("_missing", ","),
                    ),
                )
                .when(
                    F.col("_empty_files") > 0,
                    F.lit("fail: empty file content"),
                )
                .when(
                    F.size("_fabricated") > 0,
                    F.concat(
                        F.lit("fail: fabricated tools "),
                        F.array_join("_fabricated", ","),
                    ),
                )
                .otherwise(F.lit("pass")),
            )
            .withColumn(
                "needs_fix", F.col("validation_result") != F.lit("pass")
            )
            .withColumn(
                "fix_hint",
                F.when(
                    F.size("_fabricated") > 0,
                    F.concat(
                        F.lit("drop:"), F.array_join("_fabricated", ",")
                    ),
                ).otherwise(F.col("fix_hint")),
            )
        )
        return out.drop("_missing", "_empty_files", "_fabricated")

    return Node("validate", fn)


def package_node():
    """Terminal: the exported package row (reference export step)."""

    def fn(df: DataFrame) -> DataFrame:
        return df.select(
            "request",
            "agent_name",
            "validation_result",
            F.size("files").cast("int").alias("file_count"),
            F.transform(F.col("files"), lambda s: s.getField("path")).alias(
                "file_paths"
            ),
            "declared_tools",
            (F.col("validation_result") == "pass").alias("validation_pass"),
        )

    return Node("package", fn)


# ---------------------------------------------------------------------------
# Graph assembly (reference agent.py:98-116; the internal 3x
# self-verification loop surfaces as the validate->coder edge)
# ---------------------------------------------------------------------------


def build_hive_coder_pipeline(
    tool_registry: DataFrame, backend: LLMBackend, max_fix_rounds: int = 3
) -> Pipeline:
    nodes = [
        intake_node(backend),
        coder_node(),
        validate_node(tool_registry),
        package_node(),
    ]
    edges = [
        Edge("intake", "coder", condition="always", priority=1),
        Edge("coder", "validate", condition="always", priority=1),
        # self-verification fix loop ("Up to 3x", nodes/__init__.py:464)
        Edge(
            "validate",
            "coder",
            condition="needs_fix == True",
            input_mapping={
                "request": "request",
                "design_brief": "design_brief",
                "agent_name": "agent_name",
                "fix_hint": "fix_hint",
            },
            priority=1,
        ),
        Edge(
            "validate",
            "package",
            condition="needs_fix == False",
            priority=1,
        ),
    ]
    return Pipeline(
        nodes,
        edges,
        entry="intake",
        terminals=["package"],
        max_visits=max_fix_rounds,
    )


# ---------------------------------------------------------------------------
# Queen — independent executor (reference agent.py:136-168): triages
# judge escalation tickets into intervention decisions by rule.
# ---------------------------------------------------------------------------

QUEEN_GOAL = Goal(
    id="queen-manager",
    name="Queen Manager",
    description=(
        "Manage the worker agent lifecycle and serve as the user's "
        "primary interactive interface. Triage health escalations "
        "from the judge."
    ),
)


def build_queen_pipeline() -> Pipeline:
    """Single client-facing queen node, its own graph (the reference
    queen_graph has no edges and no terminals; batch semantics make
    the node its own terminal). Ticket rows carry ``ticket_id,
    agent_name, severity, reason``; the triage rule mirrors the
    escalation ladder: critical -> halt, repeated failure -> restart,
    else monitor."""

    def fn(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "intervention_decision",
            F.when(F.col("severity") == "critical", F.lit("halt"))
            .when(
                F.col("reason").contains("repeated"), F.lit("restart")
            )
            .otherwise(F.lit("monitor")),
        )

    queen = Node("queen", fn, client_facing=True)
    return Pipeline([queen], [], entry="queen", terminals=["queen"])


def evaluate_success_criteria(packages: DataFrame) -> DataFrame:
    """Weighted criterion progress over exported package rows (the
    deep_research evaluator discipline). user-satisfaction is
    structural in batch semantics: a package presented for review is
    one that validated."""
    checks = {
        "valid-package": F.col("validation_pass"),
        "complete-files": F.col("file_count") >= len(REQUIRED_FILES),
        "user-satisfaction": F.col("validation_pass"),
        "framework-compliance": F.size("file_paths")
        == F.size(F.array_distinct("file_paths")),
    }
    weights = {c.id: c.weight for c in GOAL.success_criteria}
    rows = [
        packages.agg(
            (
                F.sum(F.when(cond, 1).otherwise(0)) / F.count(F.lit(1))
            ).alias("progress")
        ).select(
            F.lit(cid).alias("criterion_id"),
            F.lit(weights[cid]).alias("weight"),
            "progress",
        )
        for cid, cond in checks.items()
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
