"""Three-layer system-prompt composition for LLM nodes (the "onion
model"): identity (static) -> narrative (generated from state) ->
focus (per-node directive), plus phase-transition markers.

Reference parity: core/framework/graph/prompt_composer.py
(compose_system_prompt :138-173, build_narrative :176-221,
build_transition_marker :224-306, build_accounts_prompt :37-135,
_with_datetime :30-34). The reference composes one prompt per live
conversation; this port keeps byte-compatible SCALAR builders for the
driver-side LLM tiers AND a column form (``compose_prompt_col``) so a
BATCH of agent states composes prompts in one whole-stage-codegen
pass before hitting the Arrow-batched LLM seam
(functions/llm_tier.py) — at 100 TB of conversation state the
composition is a map-side expression, never a Python loop.

Determinism: the reference stamps ``datetime.now()``; here the
timestamp is an INJECTED argument (``now=None`` omits the stamp) so
composed prompts are reproducible in tests and replays.
"""

from __future__ import annotations

from datetime import datetime
from typing import Any, Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "build_accounts_prompt",
    "build_narrative",
    "build_transition_marker",
    "compose_prompt_col",
    "compose_system_prompt",
]

_NARRATIVE_HDR = "--- Context (what has happened so far) ---"
_FOCUS_HDR = "--- Current Focus ---"


def _stamp(prompt: str, now: datetime | None) -> str:
    """Reference _with_datetime, with the clock injected."""
    if now is None:
        return prompt
    stamp = (
        "Current date and time: "
        + now.strftime("%Y-%m-%d %H:%M %Z (UTC%z)").strip()
    )
    return f"{prompt}\n\n{stamp}" if prompt else stamp


def compose_system_prompt(
    identity_prompt: str | None,
    focus_prompt: str | None,
    narrative: str | None = None,
    accounts_prompt: str | None = None,
    now: datetime | None = None,
) -> str:
    """Layer 1 (identity) + accounts + Layer 2 (narrative) + Layer 3
    (focus) — reference compose_system_prompt :138-173, identical
    separators."""
    parts: list[str] = []
    if identity_prompt:
        parts.append(identity_prompt)
    if accounts_prompt:
        parts.append(f"\n{accounts_prompt}")
    if narrative:
        parts.append(f"\n{_NARRATIVE_HDR}\n{narrative}")
    if focus_prompt:
        parts.append(f"\n{_FOCUS_HDR}\n{focus_prompt}")
    return _stamp("\n".join(parts) if parts else "", now)


def compose_prompt_col(
    identity: str,
    focus_col: Column | str,
    narrative_col: Column | str | None = None,
    accounts_col: Column | str | None = None,
) -> Column:
    """The column form: compose one prompt PER ROW of agent state —
    byte-identical to ``compose_system_prompt(identity, focus,
    narrative, accounts)`` with no timestamp (tests pin the
    equality). NULL/empty layers drop out exactly like the scalar's
    falsy checks."""

    def _c(col):
        return F.col(col) if isinstance(col, str) else col

    def _layer(col, prefix: str) -> Column:
        if col is None:
            return F.lit(None).cast("string")
        c = _c(col)
        return F.when(
            c.isNotNull() & (F.length(c) > 0), F.concat(F.lit(prefix), c)
        )

    parts = [
        F.lit(identity) if identity else F.lit(None).cast("string"),
        _layer(accounts_col, "\n"),
        _layer(narrative_col, f"\n{_NARRATIVE_HDR}\n"),
        _layer(focus_col, f"\n{_FOCUS_HDR}\n"),
    ]
    return F.concat_ws("\n", *parts)


def build_accounts_prompt(
    accounts: Sequence[Mapping[str, Any]],
    tool_provider_map: Mapping[str, str] | None = None,
    node_tool_names: Sequence[str] | None = None,
) -> str:
    """Connected-accounts block (reference :37-135): flat format
    without a tool map; grouped-by-provider with tool lists when the
    map is given; filtered to the node's tools when those are given."""
    if not accounts:
        return ""
    if tool_provider_map is None:
        lines = [
            "Connected accounts (use the alias as the `account` parameter "
            "when calling tools to target a specific account):"
        ]
        for acct in accounts:
            provider = acct.get("provider", "unknown")
            alias = acct.get("alias", "unknown")
            identity = acct.get("identity", {}) or {}
            detail_parts = [f"{k}: {v}" for k, v in identity.items() if v]
            detail = f" ({', '.join(detail_parts)})" if detail_parts else ""
            lines.append(f"- {provider}/{alias}{detail}")
        return "\n".join(lines)

    provider_tools: dict[str, list[str]] = {}
    for tool_name, provider in tool_provider_map.items():
        provider_tools.setdefault(provider, []).append(tool_name)
    node_tool_set = set(node_tool_names) if node_tool_names else None

    provider_accounts: dict[str, list[Mapping[str, Any]]] = {}
    for acct in accounts:
        provider_accounts.setdefault(
            acct.get("provider", "unknown"), []
        ).append(acct)

    sections: list[str] = ["Connected accounts:"]
    for provider in sorted(provider_accounts):
        tools = sorted(provider_tools.get(provider, []))
        if node_tool_set is not None and not (set(tools) & node_tool_set):
            continue
        sections.append(f"\n{provider}:")
        for acct in provider_accounts[provider]:
            alias = acct.get("alias", "unknown")
            identity = acct.get("identity", {}) or {}
            detail_parts = [f"{k}: {v}" for k, v in identity.items() if v]
            detail = f" ({', '.join(detail_parts)})" if detail_parts else ""
            sections.append(f"- alias: {alias}{detail}")
        if tools:
            shown = tools if node_tool_set is None else sorted(
                set(tools) & node_tool_set
            )
            if shown:
                sections.append(f"  tools: {', '.join(shown)}")
    return "\n".join(sections) if len(sections) > 1 else ""


def build_narrative(
    memory: Mapping[str, Any],
    execution_path: Sequence[str],
    node_descriptions: Mapping[str, str] | None = None,
) -> str:
    """Layer 2 from structured state (reference :176-221):
    deterministic, no LLM call. ``memory`` is the shared-state
    read_all() dict; values over 200 chars truncate with '...'."""
    parts: list[str] = []
    if execution_path:
        descs = node_descriptions or {}
        lines = [
            f"- {n}: {descs[n]}" if n in descs else f"- {n}"
            for n in execution_path
        ]
        parts.append("Phases completed:\n" + "\n".join(lines))
    if memory:
        mem_lines = []
        for key, value in memory.items():
            if value is None:
                continue
            val_str = str(value)
            if len(val_str) > 200:
                val_str = val_str[:200] + "..."
            mem_lines.append(f"- {key}: {val_str}")
        if mem_lines:
            parts.append("Current state:\n" + "\n".join(mem_lines))
    return "\n\n".join(parts) if parts else ""


def build_transition_marker(
    previous_node: str,
    next_node: str,
    memory: Mapping[str, Any],
    cumulative_tool_names: Sequence[str],
    node_descriptions: Mapping[str, str] | None = None,
    adapt_content: str | None = None,
) -> str:
    """'State of the World' phase-transition marker (reference
    :224-306, minus the local-filesystem data-dir listing — spillover
    files are a control-plane concern; the engine's shared state IS
    the memory dict). Values over 300 chars truncate."""
    descs = node_descriptions or {}
    sections: list[str] = [
        f"--- PHASE TRANSITION: {previous_node} → {next_node} ---",
        f"\nCompleted: {previous_node}",
    ]
    if previous_node in descs:
        sections.append(f"  {descs[previous_node]}")
    if memory:
        mem_lines = []
        for key, value in memory.items():
            if value is None:
                continue
            val_str = str(value)
            if len(val_str) > 300:
                val_str = val_str[:300] + "..."
            mem_lines.append(f"  {key}: {val_str}")
        if mem_lines:
            sections.append("\nOutputs available:\n" + "\n".join(mem_lines))
    if adapt_content:
        sections.append(f"\n--- Agent Memory ---\n{adapt_content}")
    if cumulative_tool_names:
        sections.append(
            "\nAvailable tools: " + ", ".join(sorted(cumulative_tool_names))
        )
    sections.append(f"\nNow entering: {next_node}")
    if next_node in descs:
        sections.append(f"  {descs[next_node]}")
    sections.append(
        "\nBefore proceeding, briefly reflect: what went well in the "
        "previous phase? Are there any gaps or surprises worth noting?"
    )
    sections.append("\n--- END TRANSITION ---")
    return "\n".join(sections)
