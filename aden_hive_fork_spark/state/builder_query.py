"""Builder run-analysis layer: the "why do runs fail?" query surface
over the L1/L2 run-telemetry star schema (SURVEY.md §2.B rows 48-49).

Reference parity (core/framework/builder/query.py): analyze_failure
(:171), find_patterns (:222), compare_runs (:284), suggest_improvements
(:310), get_node_performance (:366). The reference loads each run's
JSON and loops decisions in Python — one run (or one goal, one node) at
a time. Here every analysis is a DataFrame plan over the whole log
store at once, so "analyze every failed run" is one co-keyed pass
instead of O(runs) file loads:

- failure_analysis: per-FAILED-run first failure + root cause + the
  decision chain up to it — one groupBy(run_id) after a min-struct
  argmin, no per-run driver loop.
- find_patterns / problematic_nodes / common_failures: per-goal
  success rates, node failure rates, and top-k error strings — keyed
  aggregations; the top-k is a goal-partitioned rank over the ALREADY
  AGGREGATED (goal, error) counts, so the window input is bounded by
  distinct error strings, never by corpus rows.
- get_node_performance: per-node stats across all runs in one shuffle
  (reference answers one node_id per call).
- compare_runs: two-run diff (status, decision counts, first diverging
  node_seq, nodes unique to each side).
- suggest_improvements: the reference's three deterministic rule
  families re-expressed as a union of three small aggregate plans.

All inputs use the L1/L2 schemas from state.logstore (L1 run_summary:
run_id/agent_id/status/..., L2 node_detail: run_id/node_id/node_seq/
node_type/success/error/latency_ms/input_tokens/output_tokens/...).
The goal key is a column of L1 (default ``agent_id`` — this repo's
analog of the reference's goal_id).

Scale shape: every function is groupBy/join on run_id or
(goal, node_id) — co-keyed shuffles; nothing collects, nothing loops
runs driver-side. At 100 TB, partition L2 by run date and these plans
prune + shuffle only the keyed columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _with_goal(
    node_detail: DataFrame, run_summary: DataFrame, goal_col: str
) -> DataFrame:
    """Attach the goal key to L2 rows via the run_id co-key."""
    return node_detail.join(
        run_summary.select("run_id", F.col(goal_col).alias("_goal")),
        "run_id",
    )


def failure_analysis(node_detail: DataFrame) -> DataFrame:
    """Distributed analyze_failure (reference builder/query.py:171):
    for EVERY run containing a failed node, emit the first failure
    point, its root-cause error, and the decision chain leading to it.

    Output: run_id, failure_seq, failure_point (node_id), root_cause,
    decision_chain (array<string>, nodes up to and including the
    failure in node_seq order), chain_len, n_failed_nodes.
    """
    failed_first = (
        node_detail.filter(~F.col("success"))
        .groupBy("run_id")
        .agg(
            F.min(
                F.struct("node_seq", "node_id", "error")
            ).alias("_first"),
            F.count(F.lit(1)).cast("int").alias("n_failed_nodes"),
        )
        .select(
            "run_id",
            F.col("_first.node_seq").alias("failure_seq"),
            F.col("_first.node_id").alias("failure_point"),
            F.col("_first.error").alias("root_cause"),
            "n_failed_nodes",
        )
    )
    chain = (
        node_detail.join(failed_first.select("run_id", "failure_seq"), "run_id")
        .filter(F.col("node_seq") <= F.col("failure_seq"))
        .groupBy("run_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("node_seq", "node_id"))),
                lambda s: s.node_id,
            ).alias("decision_chain")
        )
    )
    return failed_first.join(chain, "run_id").select(
        "run_id",
        "failure_seq",
        "failure_point",
        "root_cause",
        "decision_chain",
        F.size("decision_chain").cast("int").alias("chain_len"),
        "n_failed_nodes",
    )


def goal_success_rates(
    run_summary: DataFrame, goal_col: str = "agent_id"
) -> DataFrame:
    """Per-goal run_count + success_rate (the find_patterns header)."""
    return run_summary.groupBy(F.col(goal_col).alias("goal_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("run_count"),
        (
            F.sum(F.when(F.col("status") == "success", 1).otherwise(0))
            / F.count(F.lit(1))
        ).alias("success_rate"),
    )


def problematic_nodes(
    node_detail: DataFrame,
    run_summary: DataFrame,
    goal_col: str = "agent_id",
    threshold: float = 0.1,
) -> DataFrame:
    """Per-(goal, node) failure rates with the reference's >threshold
    flag (builder/query.py:256-268 keeps only flagged nodes; emitting
    all rows with the boolean is strictly richer and lets the caller
    filter)."""
    l2 = _with_goal(node_detail, run_summary, goal_col)
    return (
        l2.groupBy(F.col("_goal").alias("goal_id"), "node_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_decisions"),
            F.sum(F.when(~F.col("success"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_failed"),
        )
        .withColumn(
            "failure_rate", F.col("n_failed") / F.col("n_decisions")
        )
        .withColumn("problematic", F.col("failure_rate") > F.lit(threshold))
    )


def common_failures(
    node_detail: DataFrame,
    run_summary: DataFrame,
    goal_col: str = "agent_id",
    top_k: int = 5,
) -> DataFrame:
    """Per-goal top-k failure error strings by occurrence count
    (builder/query.py:243-249). The rank window runs over the
    pre-aggregated (goal, error) counts — input bounded by distinct
    error strings per goal, not corpus rows."""
    l2 = _with_goal(node_detail, run_summary, goal_col)
    counts = (
        l2.filter(~F.col("success"))
        .withColumn("_err", F.coalesce("error", F.lit("Unknown error")))
        .groupBy(F.col("_goal").alias("goal_id"), F.col("_err").alias("error"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = Window.partitionBy("goal_id").orderBy(F.desc("n"), F.asc("error"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_k)
    )


def find_patterns(
    node_detail: DataFrame,
    run_summary: DataFrame,
    goal_col: str = "agent_id",
    threshold: float = 0.1,
    top_k: int = 5,
) -> dict[str, DataFrame]:
    """The reference PatternAnalysis bundle (builder/query.py:222-283)
    for ALL goals at once: success rates, top-k failures, flagged
    nodes, and the decision-type distribution."""
    l2 = _with_goal(node_detail, run_summary, goal_col)
    decision_types = l2.groupBy(
        F.col("_goal").alias("goal_id"), "node_type"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return {
        "goals": goal_success_rates(run_summary, goal_col),
        "common_failures": common_failures(
            node_detail, run_summary, goal_col, top_k
        ),
        "problematic_nodes": problematic_nodes(
            node_detail, run_summary, goal_col, threshold
        ),
        "decision_types": decision_types,
    }


def get_node_performance(node_detail: DataFrame) -> DataFrame:
    """Per-node performance across ALL runs in one pass (reference
    builder/query.py:366 loads every run for ONE node_id per call).

    Output per node_id: n_runs, total_decisions, success_rate,
    avg_latency_ms, total_input_tokens, total_output_tokens."""
    return node_detail.groupBy("node_id").agg(
        F.countDistinct("run_id").cast("bigint").alias("n_runs"),
        F.count(F.lit(1)).cast("bigint").alias("total_decisions"),
        (
            F.sum(F.when(F.col("success"), 1).otherwise(0))
            / F.count(F.lit(1))
        ).alias("success_rate"),
        (
            F.sum("latency_ms").cast("double") / F.count(F.lit(1))
        ).alias("avg_latency_ms"),
        F.sum("input_tokens").cast("bigint").alias("total_input_tokens"),
        F.sum("output_tokens").cast("bigint").alias("total_output_tokens"),
    )


def compare_runs(
    node_detail: DataFrame,
    run_summary: DataFrame,
    run_a: str,
    run_b: str,
) -> DataFrame:
    """Two-run diff (reference builder/query.py:284-305, :469-501):
    one row with per-run stats, the first diverging node_seq (NULL if
    the common prefix agrees), and the node sets unique to each run."""
    pair = node_detail.filter(F.col("run_id").isin([run_a, run_b]))
    side = F.when(F.col("run_id") == run_a, F.lit("a")).otherwise(F.lit("b"))
    stats = (
        run_summary.filter(F.col("run_id").isin([run_a, run_b]))
        .select(
            F.when(F.col("run_id") == run_a, F.lit("a"))
            .otherwise(F.lit("b"))
            .alias("_side"),
            "status",
            "total_nodes_executed",
        )
        .groupBy()
        .pivot("_side", ["a", "b"])
        .agg(
            F.first("status").alias("status"),
            F.first("total_nodes_executed").alias("n_nodes"),
        )
    )
    # first divergence: align the two runs on node_seq and find the
    # smallest seq where the node ids differ (an inner join — seqs
    # present in only one run are length differences, reported via
    # n_nodes, matching the reference's zip(strict=False))
    a = pair.filter(F.col("run_id") == run_a).select(
        "node_seq", F.col("node_id").alias("_na")
    )
    b = pair.filter(F.col("run_id") == run_b).select(
        "node_seq", F.col("node_id").alias("_nb")
    )
    div = (
        a.join(b, "node_seq")
        .filter(F.col("_na") != F.col("_nb"))
        .agg(F.min("node_seq").alias("diverged_at_seq"))
    )
    nodes = (
        pair.select(side.alias("_side"), "node_id")
        .distinct()
        .groupBy("node_id")
        .agg(F.collect_set("_side").alias("_sides"))
        .agg(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.array_contains("_sides", "a")
                        & ~F.array_contains("_sides", "b"),
                        F.col("node_id"),
                    )
                )
            ).alias("nodes_only_in_a"),
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.array_contains("_sides", "b")
                        & ~F.array_contains("_sides", "a"),
                        F.col("node_id"),
                    )
                )
            ).alias("nodes_only_in_b"),
        )
    )
    return (
        stats.crossJoin(div)
        .crossJoin(nodes)
        .select(
            F.lit(run_a).alias("run_a"),
            F.lit(run_b).alias("run_b"),
            F.col("a_status").alias("status_a"),
            F.col("b_status").alias("status_b"),
            F.col("a_n_nodes").alias("n_nodes_a"),
            F.col("b_n_nodes").alias("n_nodes_b"),
            "diverged_at_seq",
            "nodes_only_in_a",
            "nodes_only_in_b",
        )
    )


def suggest_improvements(
    node_detail: DataFrame,
    run_summary: DataFrame,
    goal_col: str = "agent_id",
    node_threshold: float = 0.1,
    node_high: float = 0.3,
    error_min_count: int = 2,
    error_high_count: int = 5,
    success_floor: float = 0.8,
) -> DataFrame:
    """The reference's three deterministic suggestion rules
    (builder/query.py:310-364) as a union of aggregate plans:

    1. node_improvement — per flagged (goal, node): failure rate above
       ``node_threshold`` (priority high above ``node_high``);
    2. error_handling — per (goal, error) seen >= ``error_min_count``
       times (high at >= ``error_high_count``);
    3. architecture — per goal with success rate < ``success_floor``.

    Output: goal_id, suggestion_type, target, metric (the driving
    number as a double), priority. Numbers stay in their own column —
    no cross-engine float-to-string formatting in ``reason`` strings.
    """
    nodes = problematic_nodes(
        node_detail, run_summary, goal_col, node_threshold
    ).filter(F.col("problematic"))
    s1 = nodes.select(
        "goal_id",
        F.lit("node_improvement").alias("suggestion_type"),
        F.col("node_id").alias("target"),
        F.col("failure_rate").alias("metric"),
        F.when(F.col("failure_rate") > node_high, "high")
        .otherwise("medium")
        .alias("priority"),
    )
    errs = common_failures(
        node_detail, run_summary, goal_col, top_k=1000000
    ).filter(F.col("n") >= error_min_count)
    s2 = errs.select(
        "goal_id",
        F.lit("error_handling").alias("suggestion_type"),
        F.col("error").alias("target"),
        F.col("n").cast("double").alias("metric"),
        F.when(F.col("n") >= error_high_count, "high")
        .otherwise("medium")
        .alias("priority"),
    )
    goals = goal_success_rates(run_summary, goal_col).filter(
        F.col("success_rate") < success_floor
    )
    s3 = goals.select(
        "goal_id",
        F.lit("architecture").alias("suggestion_type"),
        F.col("goal_id").alias("target"),
        F.col("success_rate").alias("metric"),
        F.lit("high").alias("priority"),
    )
    return s1.unionByName(s2).unionByName(s3)
