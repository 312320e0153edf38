"""Stall / doom-loop detection + rule-based judge (SURVEY.md §2.B
rows 55, 59).

Reference semantics:
- stall: N identical consecutive responses (threshold 3); doom loop:
  identical tool-call fingerprints over consecutive turns
  (core/framework/graph/event_loop_node.py:2047-2152, config :73-111);
- judge: per-iteration verdict ACCEPT/RETRY/ESCALATE/CONTINUE over
  accumulated outputs + criteria (event_loop_node.py:49-64,1839-1931);
  the LLM tier is pluggable — the deterministic rule tier here is the
  hermetic default (SURVEY §7.5 hard part 5).

Both are window functions over the step log — lag-compare for streak
detection, aggregate-then-classify for the judge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _streaks(df: DataFrame, part: list[str], order: list[str], fingerprint: Column) -> DataFrame:
    """Run-length encode consecutive equal fingerprints per partition
    (gaps-and-islands via lag + cumulative sum)."""
    w = Window.partitionBy(*part).orderBy(*order)
    changed = (
        F.when(F.lag(fingerprint).over(w).isNull(), 1)
        .when(F.lag(fingerprint).over(w) != fingerprint, 1)
        .otherwise(0)
    )
    df = df.withColumn("_fp", fingerprint).withColumn("_new", changed)
    df = df.withColumn("_grp", F.sum("_new").over(w))
    return df


def detect_stalls(
    node_step: DataFrame, threshold: int = 3, text_col: str = "llm_text"
) -> DataFrame:
    """Stalled (run, node) pairs: >= threshold identical consecutive
    responses. Returns (run_id, node_id, fingerprint, streak_len,
    first_step, last_step)."""
    df = _streaks(
        node_step,
        ["run_id", "node_id"],
        ["step_index"],
        F.md5(F.coalesce(F.col(text_col), F.lit(""))),
    )
    return (
        df.groupBy("run_id", "node_id", "_grp", "_fp")
        .agg(
            F.count(F.lit(1)).alias("streak_len"),
            F.min("step_index").alias("first_step"),
            F.max("step_index").alias("last_step"),
        )
        .filter(F.col("streak_len") >= threshold)
        .select(
            "run_id",
            "node_id",
            F.col("_fp").alias("fingerprint"),
            "streak_len",
            "first_step",
            "last_step",
        )
        .orderBy("run_id", "node_id", "first_step")
    )


def detect_doom_loops(
    tool_calls: DataFrame, threshold: int = 3
) -> DataFrame:
    """Doom loops: identical (tool_name, tool_input) fingerprints on
    consecutive steps. tool_calls: (run_id, node_id, step_index,
    tool_name, tool_input)."""
    fp = F.md5(F.concat_ws("\x00", "tool_name", "tool_input"))
    df = _streaks(tool_calls, ["run_id", "node_id"], ["step_index"], fp)
    return (
        df.groupBy("run_id", "node_id", "_grp", "_fp", "tool_name")
        .agg(F.count(F.lit(1)).alias("streak_len"), F.min("step_index").alias("first_step"))
        .filter(F.col("streak_len") >= threshold)
        .select("run_id", "node_id", "tool_name", "streak_len", "first_step")
        .orderBy("run_id", "node_id", "first_step")
    )


def judge_nodes(
    node_detail: DataFrame,
    max_retries: int = 3,
    max_steps: int = 100,
) -> DataFrame:
    """Deterministic rule-based verdict per (run, node) — the
    aggregate-then-classify shape of the reference judge with its
    ON_SUCCESS-style fallback rules:
      ESCALATE if retries exhausted or explicit escalate counts;
      RETRY    if failed with retries left;
      ACCEPT   if succeeded;
      CONTINUE otherwise (budget remaining)."""
    verdict = (
        F.when(
            (F.col("retry_count") >= max_retries) | (F.col("escalate_count") > 0),
            "ESCALATE",
        )
        .when(F.col("success") & (F.col("exit_status") == "success"), "ACCEPT")
        .when(~F.col("success") & (F.col("retry_count") < max_retries), "RETRY")
        .when(F.col("total_steps") >= max_steps, "ESCALATE")
        .otherwise("CONTINUE")
    )
    return node_detail.select(
        "run_id", "node_id", verdict.alias("verdict"), "total_steps", "retry_count"
    )
