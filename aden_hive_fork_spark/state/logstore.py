"""Run-telemetry star schema + analytics (SURVEY.md §2.B rows 48-49).

The reference persists three joinable levels (reference:
core/framework/runtime/runtime_log_store.py:13-22 layout,
runtime_log_schemas.py:19-142 schemas; FIXTURES.md §4):
- L1 run_summary  (one row per run)
- L2 node_detail  (one row per node completion)
- L3 node_step    (one row per LLM/tool step)

with the invariant L1 = aggregate(L2) (= aggregate(aggregate(L3))),
and query surface list_runs(status, needs_attention, limit) +
per-node drill-down (runtime_log_store.py:144-184,
runtime_logs_tool.py:83-232). All of it is groupBy/filter/sort —
native Spark, partition L2/L3 by run date at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

L1_SCHEMA = (
    "run_id string, agent_id string, status string, total_nodes_executed int,"
    " node_path array<string>, total_input_tokens long, total_output_tokens long,"
    " needs_attention boolean, attention_reasons array<string>,"
    " started_at timestamp_ntz, duration_ms long"
)

L2_SCHEMA = (
    "run_id string, node_id string, node_seq int, node_type string, success boolean,"
    " error string, total_steps int, input_tokens long, output_tokens long,"
    " latency_ms long, attempt int, exit_status string, needs_attention boolean,"
    " attention_reasons array<string>"
)

L3_SCHEMA = (
    "run_id string, node_id string, step_index int, llm_text string,"
    " input_tokens long, output_tokens long, latency_ms long, verdict string,"
    " error string"
)


def aggregate_l3_to_l2(node_step: DataFrame) -> DataFrame:
    """Roll steps up to per-node facts: token sums, step count, verdict
    tallies, first error (deterministic: min step with error)."""
    return node_step.groupBy("run_id", "node_id").agg(
        F.count(F.lit(1)).cast("int").alias("total_steps"),
        F.sum("input_tokens").alias("input_tokens"),
        F.sum("output_tokens").alias("output_tokens"),
        F.sum("latency_ms").alias("latency_ms"),
        F.sum(F.when(F.col("verdict") == "ACCEPT", 1).otherwise(0)).cast("int").alias("accept_count"),
        F.sum(F.when(F.col("verdict") == "RETRY", 1).otherwise(0)).cast("int").alias("retry_count"),
        F.sum(F.when(F.col("verdict") == "ESCALATE", 1).otherwise(0)).cast("int").alias("escalate_count"),
        F.min(F.when(F.col("error").isNotNull(), F.struct("step_index", "error"))).alias("_err"),
    ).withColumn("first_error", F.col("_err.error")).drop("_err")


def aggregate_l2_to_l1(node_detail: DataFrame) -> DataFrame:
    """end_run: node details -> run summary (reference
    runtime_log_store.py:93-99). node_path is ordered by node_seq;
    status = failure if any node failed; needs_attention = any()."""
    return node_detail.groupBy("run_id").agg(
        F.count(F.lit(1)).cast("int").alias("total_nodes_executed"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("node_seq", "node_id"))),
            lambda s: s.node_id,
        ).alias("node_path"),
        F.sum("input_tokens").alias("total_input_tokens"),
        F.sum("output_tokens").alias("total_output_tokens"),
        F.when(F.sum(F.when(~F.col("success"), 1).otherwise(0)) > 0, "failure")
        .otherwise("success")
        .alias("status"),
        F.max(F.coalesce("needs_attention", F.lit(False))).alias("needs_attention"),
        F.array_distinct(
            F.flatten(F.collect_list(F.coalesce("attention_reasons", F.array())))
        ).alias("attention_reasons"),
        F.sum("latency_ms").alias("duration_ms"),
    )


def list_runs(
    run_summary: DataFrame,
    status: str | None = None,
    needs_attention: bool | None = None,
    limit: int = 50,
) -> DataFrame:
    """reference list_runs: filter, sort desc by started_at, limit
    (runtime_log_store.py:144-184). run_id desc is the unique
    tie-break for a total order."""
    df = run_summary
    if status is not None:
        df = df.filter(F.col("status") == status)
    if needs_attention is not None:
        df = df.filter(F.col("needs_attention") == needs_attention)
    return df.orderBy(F.desc("started_at"), F.desc("run_id")).limit(limit)


def node_drilldown(
    node_step: DataFrame,
    run_id: str,
    node_id: str | None = None,
    step_from: int | None = None,
    step_to: int | None = None,
) -> DataFrame:
    """Per-node step drill-down with step-range paging (reference
    runtime_logs_tool.py:142-232)."""
    df = node_step.filter(F.col("run_id") == run_id)
    if node_id is not None:
        df = df.filter(F.col("node_id") == node_id)
    if step_from is not None:
        df = df.filter(F.col("step_index") >= step_from)
    if step_to is not None:
        df = df.filter(F.col("step_index") <= step_to)
    return df.orderBy("node_id", "step_index")
