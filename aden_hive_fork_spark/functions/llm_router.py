"""LLM provider router + streaming-event surface — the engine-side
analogs of the reference's multi-provider LLM layer.

Reference parity (behavior, not code):

- ``core/framework/llm/litellm.py:259-713`` (LiteLLMProvider): one
  configured model routes to whichever provider dialect serves it,
  with rate-limit retry (exponential backoff capped at a max delay,
  empty responses treated like rate limits) and model fallbacks.
  Here that becomes :class:`RouterBackend` — an ``LLMBackend`` built
  from an ORDERED provider chain, so it drops into every existing
  seam (``llm_route`` / ``judge_with_llm`` / ``repair_rejects`` take
  any LLMBackend and therefore take a router unchanged).
- ``core/framework/llm/stream_events.py:1-96``: the discriminated
  union of frozen stream-event dataclasses that the provider layer,
  event bus, and monitoring all share. Here the same contract is
  :data:`StreamEvent` plus :func:`events_from_chunks`, a fold from
  provider wire deltas to typed events (snapshot accumulation, text
  end, finish with token counts, transient-vs-fatal error
  classification per litellm.py:230-258's taxonomy).

Distribution shape: a router IS a backend, so it rides the same
Arrow-batched ``mapInPandas`` tier — one complete() per batch, the
fallback chain local to the executor, no extra shuffle. Providers
must pickle by value (fixture transports and mock backends do).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Literal, Sequence

from .llm_tier import LLMBackend


# ---------------------------------------------------------------------------
# provider router / fallback chain
# ---------------------------------------------------------------------------
@dataclass
class ProviderSpec:
    """One entry in the fallback chain: a named backend plus its
    retry budget. ``max_retries`` re-asks THIS provider for prompts
    that came back empty (the litellm empty-response-as-rate-limit
    rule) before the chain moves on."""

    name: str
    backend: LLMBackend
    max_retries: int = 1


class RouterBackend:
    """Ordered fallback chain over ``LLMBackend`` providers, itself an
    ``LLMBackend``.

    Per batch: ask the first provider for ALL prompts; retry its
    empty replies up to ``max_retries`` with exponential backoff
    (``backoff_base * 2^attempt``, capped at ``max_delay`` — the
    litellm.py:174-228 schedule, with the Retry-After branch elided
    because the ``complete`` seam exposes no headers); prompts still
    empty fall through to the next provider with a fresh budget.
    Prompts empty after the whole chain stay "" — the callers'
    deterministic tiers absorb them, per the module contract.

    ``sleep`` is injectable so tests run instantly; ``trace`` (when
    set) receives ``(provider_name, attempt, n_pending)`` per try —
    the monitoring hook the reference feeds from its retry logger.
    """

    def __init__(
        self,
        providers: Sequence[ProviderSpec],
        backoff_base: float = 1.0,
        max_delay: float = 30.0,
        sleep: Callable[[float], None] | None = None,
        trace: Callable[[str, int, int], None] | None = None,
    ):
        if not providers:
            raise ValueError("RouterBackend needs at least one provider")
        self.providers = list(providers)
        self.backoff_base = float(backoff_base)
        self.max_delay = float(max_delay)
        self.sleep = sleep if sleep is not None else __import__("time").sleep
        self.trace = trace

    def _delay(self, attempt: int) -> float:
        return min(self.backoff_base * (2 ** attempt), self.max_delay)

    def complete(self, prompts: Sequence[str]) -> list[str]:
        out: list[str] = [""] * len(prompts)
        pending = list(range(len(prompts)))
        for spec in self.providers:
            if not pending:
                break
            for attempt in range(spec.max_retries + 1):
                if not pending:
                    break
                if self.trace:
                    self.trace(spec.name, attempt, len(pending))
                if attempt > 0:
                    self.sleep(self._delay(attempt - 1))
                try:
                    replies = spec.backend.complete(
                        [prompts[i] for i in pending]
                    )
                    # a misbehaving backend returning the wrong count
                    # would silently drop tail prompts from retries
                    # AND the rest of the chain (ADVICE r7) — treat a
                    # length mismatch exactly like an exception
                    if len(replies) != len(pending):
                        replies = [""] * len(pending)
                except Exception:
                    replies = [""] * len(pending)
                still: list[int] = []
                for i, reply in zip(pending, replies):
                    if reply:
                        out[i] = reply
                    else:
                        still.append(i)
                pending = still
        return out


def router_from_registry(
    registry: dict[str, LLMBackend],
    chain: Sequence[str],
    **kwargs: Any,
) -> RouterBackend:
    """Build a fallback router from a provider registry and an
    ordered chain of names — the litellm "model list + fallbacks"
    configuration shape. Unknown names raise immediately (a typo in a
    fallback chain must not surface as silent "")."""
    missing = [n for n in chain if n not in registry]
    if missing:
        raise ValueError(f"unknown providers in chain: {missing}")
    return RouterBackend(
        [ProviderSpec(n, registry[n]) for n in chain], **kwargs
    )


# ---------------------------------------------------------------------------
# streaming events (reference stream_events.py contract)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class TextDeltaEvent:
    type: Literal["text_delta"] = "text_delta"
    content: str = ""
    snapshot: str = ""


@dataclass(frozen=True)
class TextEndEvent:
    type: Literal["text_end"] = "text_end"
    full_text: str = ""


@dataclass(frozen=True)
class ToolCallEvent:
    type: Literal["tool_call"] = "tool_call"
    tool_use_id: str = ""
    tool_name: str = ""
    tool_input: dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class ToolResultEvent:
    type: Literal["tool_result"] = "tool_result"
    tool_use_id: str = ""
    content: str = ""
    is_error: bool = False


@dataclass(frozen=True)
class ReasoningStartEvent:
    type: Literal["reasoning_start"] = "reasoning_start"


@dataclass(frozen=True)
class ReasoningDeltaEvent:
    type: Literal["reasoning_delta"] = "reasoning_delta"
    content: str = ""


@dataclass(frozen=True)
class FinishEvent:
    type: Literal["finish"] = "finish"
    stop_reason: str = ""
    input_tokens: int = 0
    output_tokens: int = 0
    model: str = ""


@dataclass(frozen=True)
class StreamErrorEvent:
    type: Literal["error"] = "error"
    error: str = ""
    recoverable: bool = False


StreamEvent = (
    TextDeltaEvent
    | TextEndEvent
    | ToolCallEvent
    | ToolResultEvent
    | ReasoningStartEvent
    | ReasoningDeltaEvent
    | FinishEvent
    | StreamErrorEvent
)

# transient-error taxonomy (litellm.py:230-258): network/server/
# timeout/rate-limit shapes are recoverable, auth/validation are not
_TRANSIENT_MARKERS = (
    "timeout", "timed out", "connection", "temporarily", "rate limit",
    "429", "500", "502", "503", "504", "overloaded", "server error",
)


def classify_stream_error(message: str) -> StreamErrorEvent:
    low = (message or "").lower()
    return StreamErrorEvent(
        error=message,
        recoverable=any(m in low for m in _TRANSIENT_MARKERS),
    )


def events_from_chunks(chunks: Sequence[dict]) -> list[StreamEvent]:
    """Fold a provider's streamed wire deltas into the typed event
    sequence. Chunk dialect (the public messages-stream shape):

    - ``{"type": "text", "text": ...}`` → TextDeltaEvent with an
      accumulated snapshot; a TextEndEvent is emitted when the first
      non-text chunk (or the end of stream) closes the text block.
    - ``{"type": "reasoning", "text": ...}`` → ReasoningStartEvent on
      the first chunk of a block, then ReasoningDeltaEvents.
    - ``{"type": "tool_call", "id", "name", "input_json": <str>}`` —
      partial-JSON tool input arrives across chunks keyed by id; the
      ToolCallEvent is emitted when the accumulated input parses.
    - ``{"type": "finish", "stop_reason", "input_tokens",
      "output_tokens", "model"}`` → FinishEvent.
    - ``{"type": "error", "message"}`` → StreamErrorEvent with the
      transient/fatal classification.
    """
    import json

    events: list[StreamEvent] = []
    snapshot = ""
    text_open = False
    reasoning_open = False
    tool_buf: dict[str, dict] = {}

    def close_text():
        nonlocal text_open
        if text_open:
            events.append(TextEndEvent(full_text=snapshot))
            text_open = False

    for ch in chunks:
        kind = ch.get("type")
        if kind == "text":
            reasoning_open = False
            snapshot += ch.get("text", "")
            text_open = True
            events.append(
                TextDeltaEvent(content=ch.get("text", ""), snapshot=snapshot)
            )
        elif kind == "reasoning":
            close_text()
            if not reasoning_open:
                events.append(ReasoningStartEvent())
                reasoning_open = True
            events.append(ReasoningDeltaEvent(content=ch.get("text", "")))
        elif kind == "tool_call":
            close_text()
            reasoning_open = False
            tid = ch.get("id", "")
            buf = tool_buf.setdefault(
                tid, {"name": ch.get("name", ""), "json": ""}
            )
            if ch.get("name"):
                buf["name"] = ch["name"]
            buf["json"] += ch.get("input_json", "")
            try:
                parsed = json.loads(buf["json"]) if buf["json"] else {}
            except ValueError:
                continue  # partial JSON — keep accumulating
            events.append(
                ToolCallEvent(
                    tool_use_id=tid,
                    tool_name=buf["name"],
                    tool_input=parsed if isinstance(parsed, dict) else {},
                )
            )
            del tool_buf[tid]
        elif kind == "tool_result":
            events.append(
                ToolResultEvent(
                    tool_use_id=ch.get("id", ""),
                    content=ch.get("content", ""),
                    is_error=bool(ch.get("is_error")),
                )
            )
        elif kind == "finish":
            close_text()
            events.append(
                FinishEvent(
                    stop_reason=ch.get("stop_reason", ""),
                    input_tokens=int(ch.get("input_tokens", 0)),
                    output_tokens=int(ch.get("output_tokens", 0)),
                    model=ch.get("model", ""),
                )
            )
        elif kind == "error":
            close_text()
            events.append(classify_stream_error(ch.get("message", "")))
    close_text()
    return events
