"""Pluggable LLM tier — the plug-in half of the hermetic seams
declared across the engine (SURVEY §7.5), covering the reference's
three LLM touchpoints:

- LLM_DECIDE edge routing (core/framework/graph/edge.py:39-46: the
  ``LLM_DECIDE`` EdgeCondition lets a model pick the outgoing edge);
- conversation judge (core/framework/graph/conversation_judge.py:
  verdict escalation beyond the deterministic rules);
- output cleaner (core/framework/graph/output_cleaner.py:64-338:
  heuristic repair first, fast-LLM repair second, revalidate).

The seam is one method: ``LLMBackend.complete(prompts) -> replies``.
Anything satisfying it plugs in — a real provider client in a
networked deployment, or the shipped ``MockLLMBackend`` (deterministic
keyword rules) in tests and this sandbox. Every operator below runs
the DETERMINISTIC tier first and touches the backend only for rows
the rules could not settle, mirroring the reference's
"heuristics, then fast LLM" order and keeping model calls off the
hot path.

Distribution shape: decisions are Arrow-batched ``mapInPandas`` — the
backend is invoked once per batch with a LIST of prompts (providers
batch; per-row calls would be the classic slow path). Backends must
pickle by value or be importable on executors; package-defined
classes like ``MockLLMBackend`` are fine.
"""

from __future__ import annotations

from typing import Iterator, Protocol, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class LLMBackend(Protocol):
    def complete(self, prompts: Sequence[str]) -> list[str]: ...


class MockLLMBackend:
    """Deterministic stand-in: first (keyword, reply) rule whose
    keyword appears in the prompt wins; ``default`` otherwise. Enough
    to exercise every seam end-to-end without a network."""

    def __init__(self, rules: list[tuple[str, str]], default: str = ""):
        self.rules = list(rules)
        self.default = default

    def complete(self, prompts: Sequence[str]) -> list[str]:
        out = []
        for p in prompts:
            low = p.lower()
            out.append(
                next((r for k, r in self.rules if k.lower() in low), self.default)
            )
        return out


class MessagesApiBackend:
    """Real-provider adapter for the ``LLMBackend`` seam, speaking the
    public chat/messages JSON wire shape (request: ``{"model",
    "max_tokens", "messages": [{"role": "user", "content": ...}]}``;
    response: ``{"content": [{"type": "text", "text": ...}], ...}`` —
    the reference ships equivalent litellm/provider adapters in
    core/framework/llm/).

    ``transport(request_json: dict) -> (status_code, body_bytes)`` is
    pluggable, so the SAME request-building and reply-parsing runs
    against a live HTTP endpoint (``messages_http_transport``) or
    recorded fixtures (``FixtureLLMTransport``) — record/replay keeps
    routing/judge/repair behavior testable offline, and the adapter is
    the drop-in for a networked deployment.

    Error discipline mirrors the deterministic-first contract: a
    failed call yields "" for that prompt (callers' fallback tiers —
    ``_parse_choice`` fallback, heuristic repair — absorb it; a flaky
    provider must not wedge a pipeline stage).
    """

    def __init__(
        self,
        transport,
        model: str = "default-model",
        max_tokens: int = 256,
        system: str | None = None,
    ):
        self.transport = transport
        self.model = model
        self.max_tokens = max_tokens
        self.system = system

    def _request(self, prompt: str) -> dict:
        req = {
            "model": self.model,
            "max_tokens": self.max_tokens,
            "messages": [{"role": "user", "content": prompt}],
        }
        if self.system:
            req["system"] = self.system
        return req

    @staticmethod
    def _parse_reply(status: int, body: bytes) -> str:
        import json

        if status != 200:
            return ""
        try:
            data = json.loads(body)
        except ValueError:
            return ""
        content = data.get("content")
        if isinstance(content, list):  # messages-shaped
            return "".join(
                blk.get("text", "")
                for blk in content
                if isinstance(blk, dict) and blk.get("type") == "text"
            )
        # chat-completions-shaped fallback
        choices = data.get("choices")
        if isinstance(choices, list) and choices:
            msg = choices[0].get("message", {})
            return msg.get("content", "") or ""
        return ""

    def complete(self, prompts: Sequence[str]) -> list[str]:
        out = []
        for p in prompts:
            try:
                status, body = self.transport(self._request(p))
            except Exception:
                out.append("")
                continue
            out.append(self._parse_reply(status, body))
        return out


class ChatCompletionsBackend:
    """OpenAI-compatible chat-completions adapter for the
    ``LLMBackend`` seam — the second provider wire beside
    ``MessagesApiBackend`` (the reference routes multiple provider
    dialects through core/framework/llm/litellm.py; these two
    adapters cover both public wire families).

    Request: ``{"model", "max_tokens", "messages": [{"role":
    "system"|"user", "content": ...}], "temperature"}`` — system
    prompt rides as a leading message (the chat dialect), not a
    top-level field (the messages dialect). Response:
    ``choices[0].message.content``.

    Same transport seam and error discipline as MessagesApiBackend:
    ``transport(request_json) -> (status, body)``, failures yield ""
    so callers' deterministic fallbacks absorb them.
    """

    def __init__(
        self,
        transport,
        model: str = "default-model",
        max_tokens: int = 256,
        system: str | None = None,
        temperature: float = 0.0,
    ):
        self.transport = transport
        self.model = model
        self.max_tokens = max_tokens
        self.system = system
        self.temperature = temperature

    def _request(self, prompt: str) -> dict:
        messages = []
        if self.system:
            messages.append({"role": "system", "content": self.system})
        messages.append({"role": "user", "content": prompt})
        return {
            "model": self.model,
            "max_tokens": self.max_tokens,
            "messages": messages,
            "temperature": self.temperature,
        }

    @staticmethod
    def _parse_reply(status: int, body: bytes) -> str:
        import json

        if status != 200:
            return ""
        try:
            data = json.loads(body)
        except ValueError:
            return ""
        choices = data.get("choices")
        if isinstance(choices, list) and choices:
            msg = choices[0].get("message", {})
            if isinstance(msg, dict):
                return msg.get("content", "") or ""
        return ""

    def complete(self, prompts: Sequence[str]) -> list[str]:
        out = []
        for p in prompts:
            try:
                status, body = self.transport(self._request(p))
            except Exception:
                out.append("")
                continue
            out.append(self._parse_reply(status, body))
        return out


def chat_http_transport(url: str, api_key: str, timeout: float = 60.0):
    """Live transport for the chat-completions dialect: Bearer auth
    (vs the messages dialect's x-api-key). Same stdlib urllib shape
    as ``messages_http_transport``; exercised via fixtures here."""

    def send(req: dict):
        import json
        import urllib.error
        import urllib.request

        r = urllib.request.Request(
            url,
            data=json.dumps(req).encode(),
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {api_key}",
            },
        )
        try:
            with urllib.request.urlopen(r, timeout=timeout) as resp:
                return resp.status, resp.read()
        except urllib.error.HTTPError as e:
            return e.code, e.read()

    return send


def messages_http_transport(url: str, api_key: str, timeout: float = 60.0):
    """Live transport (stdlib urllib; exercised via recorded fixtures
    in this sandbox — the request/parse layers are transport-agnostic)."""

    def send(req: dict):
        import json
        import urllib.error
        import urllib.request

        r = urllib.request.Request(
            url,
            data=json.dumps(req).encode(),
            headers={
                "Content-Type": "application/json",
                "x-api-key": api_key,
            },
        )
        try:
            with urllib.request.urlopen(r, timeout=timeout) as resp:
                return resp.status, resp.read()
        except urllib.error.HTTPError as e:
            return e.code, e.read()

    return send


class FixtureLLMTransport:
    """Record/replay transport: responses keyed by sha256 of the
    canonical request JSON. With ``live`` set, unseen requests pass
    through and are recorded; without it, unseen requests return 404
    (→ "" reply → the caller's deterministic fallback)."""

    def __init__(self, fixtures: dict | None = None, live=None):
        self.fixtures: dict[str, tuple[int, bytes]] = dict(fixtures or {})
        self.live = live

    @staticmethod
    def key(req: dict) -> str:
        import hashlib
        import json

        return hashlib.sha256(
            json.dumps(req, sort_keys=True).encode()
        ).hexdigest()[:16]

    def __call__(self, req: dict):
        k = self.key(req)
        if k in self.fixtures:
            return self.fixtures[k]
        if self.live is not None:
            resp = self.live(req)
            self.fixtures[k] = resp
            return resp
        return 404, b"{}"


def _parse_choice(reply: str, choices: Sequence[str], fallback: str) -> str:
    """First declared choice mentioned in the reply; declared order
    breaks ties; unparseable replies take the fallback (the
    reference's fallback_to_raw discipline: a confused model must not
    wedge the pipeline)."""
    low = (reply or "").lower()
    hits = [(low.find(c.lower()), c) for c in choices if c.lower() in low]
    if not hits:
        return fallback
    hits.sort(key=lambda h: h[0])
    return hits[0][1]


# ---------------------------------------------------------------------------
# LLM_DECIDE edge routing
# ---------------------------------------------------------------------------
def llm_route(
    df: DataFrame,
    choices: list[str],
    goal: str,
    backend: LLMBackend,
    text_cols: list[str] | None = None,
    route_col: str = "_route",
) -> DataFrame:
    """Row-level LLM_DECIDE: append ``route_col`` holding one of
    ``choices`` per row, decided by the backend from ``goal`` plus the
    row's ``text_cols`` rendered into the prompt.

    Composes with ``plans.graph``: run this as a Node transform, then
    CONDITIONAL edges filter ``_route == 'x'`` — the same structure as
    the reference's LLM_DECIDE edge, re-expressed as data routing
    (the engine's edges partition rows, not control flow). Fallback is
    ``choices[0]``.
    """
    from pyspark.sql.types import StringType, StructField, StructType

    if not choices:
        raise ValueError("llm_route needs at least one choice")
    if route_col in df.columns:
        raise ValueError(
            f"llm_route: route_col {route_col!r} already exists in the "
            "input DataFrame — pass a different route_col or drop it first"
        )
    text_cols = text_cols or [c for c, t in df.dtypes if t == "string"]
    # fresh StructType: StructType.add would MUTATE df's cached schema
    out_schema = StructType(
        list(df.schema.fields) + [StructField(route_col, StringType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            prompts = [
                (
                    f"Goal: {goal}\nChoices: {', '.join(choices)}\n"
                    + "\n".join(f"{c}: {r.get(c, '')}" for c in text_cols)
                    + "\nAnswer with exactly one choice."
                )
                for r in pdf.to_dict("records")
            ]
            replies = backend.complete(prompts)
            pdf = pdf.copy()
            pdf[route_col] = [
                _parse_choice(rep, choices, choices[0]) for rep in replies
            ]
            yield pdf

    return df.mapInPandas(run, out_schema)


# ---------------------------------------------------------------------------
# judge escalation tier
# ---------------------------------------------------------------------------
def judge_with_llm(
    node_detail: DataFrame,
    backend: LLMBackend,
    max_retries: int = 3,
    max_steps: int = 100,
) -> DataFrame:
    """Two-tier judge: the deterministic rules
    (state/monitor.judge_nodes) settle everything they can; only rows
    left CONTINUE are put to the backend for ACCEPT/RETRY/ESCALATE/
    CONTINUE — the reference's rule-first, model-second escalation.
    An unparseable reply keeps CONTINUE (rules remain authoritative).
    """
    from ..state.monitor import judge_nodes

    ruled = judge_nodes(node_detail, max_retries=max_retries, max_steps=max_steps)
    verdicts = ["ACCEPT", "RETRY", "ESCALATE", "CONTINUE"]
    schema = ruled.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mask = pdf["verdict"] == "CONTINUE"
            if mask.any():
                sub = pdf[mask]
                prompts = [
                    (
                        f"Judge node {r['node_id']} of run {r['run_id']}: "
                        f"{r['total_steps']} steps, {r['retry_count']} retries. "
                        f"Verdict (ACCEPT, RETRY, ESCALATE or CONTINUE)?"
                    )
                    for r in sub.to_dict("records")
                ]
                replies = backend.complete(prompts)
                pdf = pdf.copy()
                pdf.loc[mask, "verdict"] = [
                    _parse_choice(rep, verdicts, "CONTINUE") for rep in replies
                ]
            yield pdf

    return ruled.mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# output cleaner: heuristics, then LLM, then revalidate
# ---------------------------------------------------------------------------
def repair_rejects(
    rejects: DataFrame,
    schema,
    backend: LLMBackend | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Repair rows rejected by ``functions.validate.enforce_schema``
    and revalidate: returns (repaired_valid, still_rejected).

    Phase 1 — deterministic heuristics as pure column expressions
    (no model, no Python), mirroring output_cleaner.py's fast tier:
    - JSON-promotion for the reference's "parsing trap": a string cell
      holding ``{"field": value}`` where ``field`` is the cell's own
      column yields the nested value (get_json_object);
    - whitespace trim and numeric de-formatting (currency symbols,
      thousands separators) so '" 1,234 "' casts cleanly.

    Phase 2 — rows still failing go to the backend (one prompt per
    row, batched), expected to reply with the corrected raw value per
    field; no backend → phase 1 only.

    Both phases feed back through ``enforce_schema`` — repaired rows
    are only accepted by REVALIDATION, never by trusting the repair.
    """
    from pyspark.sql.types import NumericType, StructType

    from .validate import enforce_schema

    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    src = rejects.drop("_reasons")

    fixed = src
    for f_def in schema.fields:
        name = f_def.name
        if name not in src.columns or dict(src.dtypes).get(name) != "string":
            continue
        c = F.col(name)
        promoted = F.coalesce(F.get_json_object(c, f"$.{name}"), c)
        cleaned = F.trim(promoted)
        if isinstance(f_def.dataType, NumericType):
            cleaned = F.regexp_replace(cleaned, r"[$€£,](?!\d*\.)|,", "")
            cleaned = F.regexp_replace(cleaned, r"[$€£ ]", "")
        fixed = fixed.withColumn(name, cleaned)

    valid1, rej1 = enforce_schema(fixed, schema)
    if backend is None:
        return valid1, rej1

    out_schema = rej1.drop("_reasons").schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = pdf.to_dict("records")
            # Arrow hands array<string> cells over as numpy arrays,
            # whose truthiness raises on len > 1 — never `or []` them.
            prompts = [
                (
                    "Repair this record to satisfy its schema; reply as "
                    + "field=value lines. Problems: "
                    + ",".join(
                        list(r["_reasons"]) if r.get("_reasons") is not None else []
                    )
                    + " Record: "
                    + "; ".join(
                        f"{k}={r.get(k)}" for k in pdf.columns if k != "_reasons"
                    )
                )
                for r in recs
            ]
            replies = backend.complete(prompts)
            rows = []
            for r, rep in zip(recs, replies):
                row = {k: v for k, v in r.items() if k != "_reasons"}
                for line in (rep or "").splitlines():
                    if "=" in line:
                        k, _, v = line.partition("=")
                        if k.strip() in row:
                            row[k.strip()] = v.strip()
                rows.append(row)
            yield pd.DataFrame(rows, columns=[c for c in pdf.columns if c != "_reasons"])

    repaired = rej1.mapInPandas(run, out_schema)
    valid2, rej2 = enforce_schema(repaired, schema)
    return valid1.unionByName(valid2), rej2
