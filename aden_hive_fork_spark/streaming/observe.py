"""Pipeline observability: row-level quality metrics collected AS A
SIDE EFFECT of the job that's already running — zero extra passes.

The reference's runtime surfaces per-step outcome counters from its
event loop; the Spark-first equivalent is ``Dataset.observe``:
metrics are accumulator-backed aggregate expressions evaluated
inline with the action, so a 100 TB write reports its row count,
null rate, and PII hits without a second scan (contrast
``check_constraints``, which is a deliberate separate audit pass).

Batch: ``observed(df, name, metrics)`` → (df, Observation); read
``obs.get`` after the action. Streaming: the SAME call, then
``last_observed(query, name)`` pulls the metrics from the most
recent micro-batch's StreamingQueryProgress — per-batch quality
telemetry with no extra state.

Restriction (Spark's, not ours): observation metrics must be
aggregates over the observed plan node and cannot reference
attributes added later — declare them on the frame you sink.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed(
    df: DataFrame, name: str, metrics: dict[str, Column]
) -> tuple[DataFrame, Observation | None]:
    """Attach named aggregate metrics to the frame. For a BATCH frame
    returns (df, Observation) — call ``obs.get`` after the action.
    For a STREAMING frame returns (df, None) — streaming observations
    are read from query progress via ``last_observed`` (Spark's
    Observation helper is batch-only)."""
    if not metrics:
        raise ValueError("metrics must be non-empty")
    aggs = [c.alias(n) for n, c in metrics.items()]
    if df.isStreaming:
        return df.observe(name, *aggs), None
    obs = Observation(name)
    return df.observe(obs, *aggs), obs


def last_observed(query, name: str) -> dict | None:
    """The named observation from the most recent micro-batch with
    one (progress objects only carry batches that saw data)."""
    for progress in reversed(query.recentProgress):
        om = progress.observedMetrics or {}
        if name in om:
            return om[name].asDict()
    return None
