"""Conversation log: seq-ordered append-only store, tiered compaction,
context handoff (SURVEY.md §2.B rows 53-54).

Reference semantics:
- append-only seq-numbered message parts
  (core/framework/graph/conversation.py:12-127, ordering :246-249;
  storage/conversation_store.py:33-117);
- tiered compaction against a token budget: tier 0 prunes old tool
  results, then summarize-keep-4 (80-100% of budget), keep-2
  (100-120%), emergency keep-1 (>=120%)
  (graph/event_loop_node.py:2265-2433, conversation.py:373-616);
- context handoff: extract each node's latest key outputs, extractive
  summary = first+last 500 chars (graph/context_handoff.py:26-191).

Spark-first: the conversation is a DataFrame ordered by (conv_id,
seq); compaction is a *retention/rollup job* producing a new compact
table (old partitions summarized, recent kept verbatim) — the LLM
summarizer tier is pluggable, the deterministic extractive tier is
the default so everything is hermetically testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# (conv_id, seq, role, kind, content, token_count)
CONVERSATION_SCHEMA = (
    "conv_id string, seq long, role string, kind string, content string,"
    " token_count long"
)


def append_messages(conversation: DataFrame, new_messages: DataFrame) -> DataFrame:
    """Append with per-conversation seq continuation (the store is
    append-only; seq is the total order, conversation.py:246-249)."""
    max_seq = conversation.groupBy("conv_id").agg(F.max("seq").alias("_base"))
    w = Window.partitionBy("conv_id").orderBy("seq")
    renumbered = (
        new_messages.join(max_seq, "conv_id", "left")
        .withColumn("_base", F.coalesce("_base", F.lit(0)))
        .withColumn("seq", F.col("_base") + F.row_number().over(w))
        .drop("_base")
    )
    return conversation.unionByName(renumbered)


def _extractive(col: F.Column, head: int = 500, tail: int = 500) -> F.Column:
    """Deterministic extractive summary: first+last N chars
    (context_handoff.py extractive mode)."""
    short = F.length(col) <= (head + tail)
    return F.when(short, col).otherwise(
        F.concat(
            F.substring(col, 1, head),
            F.lit(" … "),
            F.substring(col, -tail, tail),
        )
    )


def compact_conversation(
    conversation: DataFrame,
    token_budget: int,
    keep_recent: int = 4,
    summarizer=None,
) -> DataFrame:
    """Tiered compaction as a rollup job.

    Tier selection per conversation by budget pressure
    (event_loop_node.py:2273-2277):
      < 80%   -> untouched
      80-100% -> tier 1: drop old tool results, keep last ``keep_recent``
      100-120%-> tier 2: keep last 2
      >= 120% -> tier 3 (emergency): keep last 1
    Everything older than the keep window collapses into one summary
    row (seq 0) via ``summarizer`` (Column -> Column; default
    deterministic extractive first+last-500-chars).
    """
    summarizer = summarizer or _extractive
    totals = conversation.groupBy("conv_id").agg(
        F.sum("token_count").alias("_total")
    )
    pressure = F.col("_total") / F.lit(float(token_budget))
    keep_n = (
        F.when(pressure < 0.8, F.lit(None).cast("int"))
        .when(pressure < 1.0, F.lit(keep_recent))
        .when(pressure < 1.2, F.lit(2))
        .otherwise(F.lit(1))
    )
    w = Window.partitionBy("conv_id").orderBy(F.desc("seq"))
    marked = (
        conversation.join(totals, "conv_id")
        .withColumn("_keep_n", keep_n)
        .withColumn("_recency", F.row_number().over(w))
    )
    untouched = marked.filter(F.col("_keep_n").isNull())
    kept = marked.filter(
        F.col("_keep_n").isNotNull() & (F.col("_recency") <= F.col("_keep_n"))
    )
    # tier-1 nuance: old tool results vanish entirely; other old
    # messages fold into the summary (event_loop_node.py tier 0/1).
    old = marked.filter(
        F.col("_keep_n").isNotNull()
        & (F.col("_recency") > F.col("_keep_n"))
        & (F.col("kind") != "tool_result")
    )
    # Order-correct aggregation: collect (seq, content) structs and
    # array_sort INSIDE the aggregate — Spark does not guarantee
    # collect_list preserves input order through partial/merge
    # aggregation, so a pre-orderBy would be silently discarded.
    ordered_join = F.concat_ws(
        "\n",
        F.transform(
            F.array_sort(F.collect_list(F.struct("seq", "content"))),
            lambda s: s["content"],
        ),
    )
    summaries = (
        old.groupBy("conv_id")
        .agg(
            ordered_join.alias("_joined"),
            F.sum("token_count").alias("_old_tokens"),
        )
        .select(
            "conv_id",
            F.lit(0).cast("long").alias("seq"),
            F.lit("system").alias("role"),
            F.lit("summary").alias("kind"),
            summarizer(F.col("_joined")).alias("content"),
            # summary token accounting: ~1/4 of original (bounded)
            F.least(F.col("_old_tokens"), F.lit(250)).cast("long").alias("token_count"),
        )
    )
    cols = ["conv_id", "seq", "role", "kind", "content", "token_count"]
    return (
        untouched.select(cols)
        .unionByName(kept.select(cols))
        .unionByName(summaries)
    )


def context_handoff(conversation: DataFrame, head: int = 500, tail: int = 500) -> DataFrame:
    """Handoff projection: per (conv_id, role) the most recent message,
    extractively summarized (context_handoff.py:26-191 scans most-
    recent-first; groupBy+max(seq) is the distributed equivalent)."""
    w = Window.partitionBy("conv_id", "role").orderBy(F.desc("seq"))
    latest = (
        conversation.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return latest.select(
        "conv_id",
        "role",
        "seq",
        _extractive(F.col("content"), head, tail).alias("summary"),
    )
