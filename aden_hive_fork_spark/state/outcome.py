"""Outcome aggregation (SURVEY.md §2.B rows 45-47).

Reference metrics (core/framework/runtime/outcome_aggregator.py):
- success_rate = successes / max(1, successes+failures) (:125-180)
- streams_active / executions_total = distinct counts (:225-311)
- weighted criterion progress = met_weight / total_weight with
  partial credit (:225-311)
- decision↔criterion relevance: >= 2 lowercase-token overlaps (:376-383)
- filter-by-key + recent-N queries (:413-431)

decisions schema: (decision_id, stream_id, execution_id, criterion,
success boolean, ts timestamp_ntz, text string)
criteria schema: (criterion, weight double, progress double)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def outcome_metrics(decisions: DataFrame) -> DataFrame:
    """Per-criterion success metrics with the reference's max(1, n)
    denominator guard."""
    succ = F.sum(F.when(F.col("success"), 1).otherwise(0))
    fail = F.sum(F.when(~F.col("success"), 1).otherwise(0))
    return decisions.groupBy("criterion").agg(
        succ.alias("successes"),
        fail.alias("failures"),
        F.round(
            succ.cast("double") / F.greatest(F.lit(1), succ + fail).cast("double"), 4
        ).alias("success_rate"),
        F.countDistinct("stream_id").alias("streams_active"),
        F.countDistinct("stream_id", "execution_id").alias("executions_total"),
    )


def criterion_progress(criteria: DataFrame) -> DataFrame:
    """Weighted overall progress = sum(weight*progress)/sum(weight),
    progress clamped to [0,1] (partial credit)."""
    p = F.least(F.greatest(F.col("progress"), F.lit(0.0)), F.lit(1.0))
    return criteria.agg(
        F.round(
            F.sum(F.col("weight") * p) / F.nullif(F.sum("weight"), F.lit(0.0)), 4
        ).alias("overall_progress"),
        F.count(F.lit(1)).alias("n_criteria"),
        F.sum(F.when(p >= 1.0, 1).otherwise(0)).alias("n_met"),
    )


def _token_set(col: str) -> F.Column:
    return F.array_distinct(F.split(F.lower(F.trim(F.col(col))), r"\s+"))


def relevance_pairs(
    decisions: DataFrame, criteria: DataFrame, min_overlap: int = 2
) -> DataFrame:
    """decision↔criterion relation by keyword overlap: related iff
    >= min_overlap common lowercase tokens (reference
    outcome_aggregator.py:376-383). Expressed as a cross of decisions
    with the (small, broadcast) criteria table + array_intersect."""
    d = decisions.select(
        "decision_id", _token_set("text").alias("d_tokens")
    )
    c = criteria.select(
        F.col("criterion"), _token_set("criterion").alias("c_tokens")
    )
    overlap = F.size(F.array_intersect("d_tokens", "c_tokens"))
    return (
        d.crossJoin(F.broadcast(c))
        .withColumn("overlap", overlap)
        .filter(F.col("overlap") >= min_overlap)
        .select("decision_id", "criterion", "overlap")
    )


def decisions_by_key(
    decisions: DataFrame,
    stream_id: str | None = None,
    execution_id: str | None = None,
) -> DataFrame:
    """get_decisions_by_stream / by_execution (outcome_aggregator.py:413-431)."""
    df = decisions
    if stream_id is not None:
        df = df.filter(F.col("stream_id") == stream_id)
    if execution_id is not None:
        df = df.filter(F.col("execution_id") == execution_id)
    return df


def recent_decisions(decisions: DataFrame, limit: int = 10) -> DataFrame:
    """get_recent_decisions: most recent first, unique tie-break."""
    return decisions.orderBy(F.desc("ts"), F.desc("decision_id")).limit(limit)
