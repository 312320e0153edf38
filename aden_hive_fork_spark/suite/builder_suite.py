"""Builder run-analysis queries (VERDICT r7 task 3): the reference's
`builder/query.py` analytics (find_patterns / analyze_failure /
get_node_performance / suggest_improvements) and the testing-harness
`ErrorCategorizer`, all under the DuckDB oracle gate.

The run-log fixture is DERIVED from the events parquet with exact
integer arithmetic (identical in both engines and scaling with sf):
one L2 node-detail row per event, run = user, node = event_type,
success/error/latency/tokens all functions of cents =
FLOOR(value*100 + 0.5) and event_id. The five synthetic error strings
are crafted to exercise every categorizer path: pure-impl multi-hit,
pure-edge, pure-logic, impl+edge cross-category (confidence 0.7), and
a zero-match default (confidence 0.3).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.similarity import stable_round6
from ..state.categorizer import (
    EDGE_CASE_PATTERNS,
    IMPLEMENTATION_ERROR_PATTERNS,
    LOGIC_ERROR_PATTERNS,
    categorize_errors,
)
from . import query
from ._helpers import T

# ---------------------------------------------------------------------------
# Shared fixture: events → L2 node_detail (+ L1 run_summary)
# ---------------------------------------------------------------------------

_ERRORS = (
    "TypeError: tool call failed in node executor",
    "timeout waiting for upstream response",
    "goal not achieved: success criteria not met",
    "ValueError: unexpected empty result from connector",
    "mysterious failure with no known signature",
)

_L2_SQL = f"""
    l2 AS (
      SELECT
        'r' || CAST(user_id AS VARCHAR) AS run_id,
        'goal' || CAST(user_id % 3 AS VARCHAR) AS goal_id,
        event_type AS node_id,
        CASE WHEN event_type IN ('purchase', 'signup')
             THEN 'action' ELSE 'observation' END AS node_type,
        CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC) AS INT)
          AS node_seq,
        (cents % 10) < 7 AS success,
        CASE WHEN (cents % 10) >= 7 THEN
          CASE cents % 7
            WHEN 0 THEN '{_ERRORS[0]}'
            WHEN 1 THEN '{_ERRORS[1]}'
            WHEN 2 THEN '{_ERRORS[2]}'
            WHEN 3 THEN '{_ERRORS[3]}'
            ELSE '{_ERRORS[4]}'
          END
        END AS error,
        cents % 5000 AS latency_ms,
        event_id % 1000 AS input_tokens,
        event_id % 347 AS output_tokens
      FROM (SELECT *, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
            FROM events)
    )
"""

_L1_SQL = """
    l1 AS (
      SELECT run_id, MIN(goal_id) AS agent_id,
        CASE WHEN SUM(CASE WHEN success THEN 0 ELSE 1 END) > 0
             THEN 'failure' ELSE 'success' END AS status,
        CAST(COUNT(*) AS BIGINT) AS total_nodes_executed
      FROM l2 GROUP BY run_id
    )
"""


def _runlog(spark, sf_dir):
    """(l2 node_detail, l1 run_summary) derived from events — the
    Spark twin of _L2_SQL/_L1_SQL. L1 goes through the REAL
    logstore.aggregate_l2_to_l1 rollup, then picks up the goal key
    from the functional run→goal map."""
    from ..state.logstore import aggregate_l2_to_l1

    e = T(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    err = (
        F.when(cents % 7 == 0, _ERRORS[0])
        .when(cents % 7 == 1, _ERRORS[1])
        .when(cents % 7 == 2, _ERRORS[2])
        .when(cents % 7 == 3, _ERRORS[3])
        .otherwise(_ERRORS[4])
    )
    l2 = e.select(
        F.concat(F.lit("r"), F.col("user_id").cast("string")).alias("run_id"),
        F.concat(F.lit("goal"), (F.col("user_id") % 3).cast("string")).alias(
            "goal_id"
        ),
        F.col("event_type").alias("node_id"),
        F.when(F.col("event_type").isin("purchase", "signup"), "action")
        .otherwise("observation")
        .alias("node_type"),
        F.row_number().over(w).cast("int").alias("node_seq"),
        (cents % 10 < 7).alias("success"),
        F.when(cents % 10 >= 7, err).alias("error"),
        (cents % 5000).alias("latency_ms"),
        (F.col("event_id") % 1000).alias("input_tokens"),
        (F.col("event_id") % 347).alias("output_tokens"),
    ).withColumn("needs_attention", ~F.col("success")).withColumn(
        "attention_reasons", F.array().cast("array<string>")
    )
    goals = l2.select("run_id", "goal_id").distinct()
    l1 = aggregate_l2_to_l1(l2).join(goals, "run_id").withColumnRenamed(
        "goal_id", "agent_id"
    )
    return l2, l1


# ---------------------------------------------------------------------------
# q306 — find_patterns problematic-nodes report: per-(goal, node)
# failure rates with the reference's >10% flag.
# ---------------------------------------------------------------------------
@query(
    "q306_run_failure_patterns",
    oracle=f"""
    WITH {_L2_SQL.strip()}, {_L1_SQL.strip()}
    SELECT l2.goal_id, l2.node_id,
      CAST(COUNT(*) AS BIGINT) AS n_decisions,
      CAST(SUM(CASE WHEN success THEN 0 ELSE 1 END) AS BIGINT) AS n_failed,
      CAST(FLOOR((CAST(SUM(CASE WHEN success THEN 0 ELSE 1 END) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE)) * 1000000 + 0.5) / 1000000
           AS DOUBLE) AS failure_rate,
      (CAST(SUM(CASE WHEN success THEN 0 ELSE 1 END) AS DOUBLE)
       / CAST(COUNT(*) AS DOUBLE)) > 0.1 AS problematic
    FROM l2
    GROUP BY l2.goal_id, l2.node_id
    ORDER BY goal_id ASC, node_id ASC
    """,
)
def q306_run_failure_patterns(spark, sf_dir):
    """state.builder_query.problematic_nodes (reference
    builder/query.py:222-268) over the derived run log: one keyed
    aggregation per (goal, node), flag = failure_rate > 0.1."""
    from ..state.builder_query import problematic_nodes

    l2, l1 = _runlog(spark, sf_dir)
    pn = problematic_nodes(l2, l1, goal_col="agent_id", threshold=0.1)
    return pn.select(
        "goal_id",
        "node_id",
        "n_decisions",
        "n_failed",
        stable_round6(F.col("failure_rate")).alias("failure_rate"),
        "problematic",
    ).orderBy("goal_id", "node_id")


# ---------------------------------------------------------------------------
# q307 — ErrorCategorizer (reference testing/categorizer.py:16-89):
# deterministic rule classification of every failure's error text,
# JVM-side containment sums; priority logic + confidence formula
# mirrored exactly in the oracle.
# ---------------------------------------------------------------------------


def _sql_list(patterns) -> str:
    inner = ", ".join("'" + p + "'" for p in patterns)
    return f"[{inner}]"


@query(
    "q307_error_categorizer",
    oracle=f"""
    WITH {_L2_SQL.strip()},
    fails AS (
      SELECT lower(error) AS err_l FROM l2 WHERE NOT success
    ),
    hits AS (
      SELECT err_l,
        len(list_filter({_sql_list(LOGIC_ERROR_PATTERNS)},
            p -> contains(err_l, p))) AS n_logic,
        len(list_filter({_sql_list(IMPLEMENTATION_ERROR_PATTERNS)},
            p -> contains(err_l, p))) AS n_impl,
        len(list_filter({_sql_list(EDGE_CASE_PATTERNS)},
            p -> contains(err_l, p))) AS n_edge
      FROM fails
    ),
    scored AS (
      SELECT err_l,
        CASE WHEN n_logic + n_impl + n_edge = 0 THEN 'implementation_error'
             WHEN n_logic >= n_impl AND n_logic >= n_edge THEN 'logic_error'
             WHEN n_impl >= n_edge THEN 'implementation_error'
             ELSE 'edge_case' END AS category,
        CASE WHEN n_logic + n_impl + n_edge = 0 THEN CAST(0.3 AS DOUBLE)
             ELSE LEAST(CAST(0.9 AS DOUBLE),
               CAST(0.5 AS DOUBLE)
               + (CAST(CASE WHEN n_logic >= n_impl AND n_logic >= n_edge
                            THEN n_logic
                            WHEN n_impl >= n_edge THEN n_impl
                            ELSE n_edge END AS DOUBLE)
                  / CAST(n_logic + n_impl + n_edge AS DOUBLE))
                 * CAST(0.4 AS DOUBLE))
        END AS confidence
      FROM hits
    )
    SELECT category,
      CASE category
        WHEN 'logic_error' THEN
          'Review and update success_criteria or constraints in the goal definition.'
        WHEN 'implementation_error' THEN 'Fix the code in agent nodes/edges.'
        ELSE 'Add a new test covering this edge-case scenario.'
      END AS fix_suggestion,
      CAST(FLOOR(confidence * 1000000 + 0.5) / 1000000 AS DOUBLE)
        AS confidence,
      CAST(COUNT(*) AS BIGINT) AS n
    FROM scored
    GROUP BY category, confidence
    ORDER BY category ASC, confidence ASC
    """,
)
def q307_error_categorizer(spark, sf_dir):
    """state.categorizer.categorize_errors over the derived failures:
    counts per (category, confidence tier) with the deterministic fix
    suggestion — the reference's categorize_with_confidence +
    get_fix_suggestion surface in one distributed pass."""
    l2, _ = _runlog(spark, sf_dir)
    cat = categorize_errors(l2.filter(~F.col("success")), "error")
    return (
        cat.groupBy(
            "category",
            "fix_suggestion",
            stable_round6(F.col("confidence")).alias("confidence"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select("category", "fix_suggestion", "confidence", "n")
        .orderBy("category", "confidence")
    )


# ---------------------------------------------------------------------------
# q308 — get_node_performance (reference builder/query.py:366): per-
# node success rate / latency / token totals across ALL runs at once.
# ---------------------------------------------------------------------------
@query(
    "q308_node_performance",
    oracle=f"""
    WITH {_L2_SQL.strip()}
    SELECT node_id,
      CAST(COUNT(DISTINCT run_id) AS BIGINT) AS n_runs,
      CAST(COUNT(*) AS BIGINT) AS total_decisions,
      CAST(FLOOR((CAST(SUM(CASE WHEN success THEN 1 ELSE 0 END) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE)) * 1000000 + 0.5) / 1000000
           AS DOUBLE) AS success_rate,
      CAST(FLOOR((CAST(SUM(latency_ms) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE)) * 1000000 + 0.5) / 1000000
           AS DOUBLE) AS avg_latency_ms,
      CAST(SUM(input_tokens) AS BIGINT) AS total_input_tokens,
      CAST(SUM(output_tokens) AS BIGINT) AS total_output_tokens
    FROM l2
    GROUP BY node_id
    ORDER BY node_id ASC
    """,
)
def q308_node_performance(spark, sf_dir):
    """state.builder_query.get_node_performance — one shuffle for
    every node's stats (the reference loads each run's JSON per
    node_id queried)."""
    from ..state.builder_query import get_node_performance

    l2, _ = _runlog(spark, sf_dir)
    perf = get_node_performance(l2)
    return perf.select(
        "node_id",
        "n_runs",
        "total_decisions",
        stable_round6(F.col("success_rate")).alias("success_rate"),
        stable_round6(F.col("avg_latency_ms")).alias("avg_latency_ms"),
        "total_input_tokens",
        "total_output_tokens",
    ).orderBy("node_id")


# ---------------------------------------------------------------------------
# q309 — analyze_failure, distributed (reference builder/query.py:171):
# every failed run's first failure point + root cause + chain length
# in ONE pass (the reference analyzes one run_id per call).
# ---------------------------------------------------------------------------
@query(
    "q309_failure_analysis",
    oracle=f"""
    WITH {_L2_SQL.strip()},
    firsts AS (
      SELECT run_id,
        MIN(node_seq) AS failure_seq,
        CAST(COUNT(*) AS INT) AS n_failed_nodes
      FROM l2 WHERE NOT success GROUP BY run_id
    )
    SELECT f.run_id,
      f.failure_seq,
      MAX(CASE WHEN l2.node_seq = f.failure_seq THEN l2.node_id END)
        AS failure_point,
      MAX(CASE WHEN l2.node_seq = f.failure_seq THEN l2.error END)
        AS root_cause,
      CAST(SUM(CASE WHEN l2.node_seq <= f.failure_seq THEN 1 ELSE 0 END)
           AS INT) AS chain_len,
      f.n_failed_nodes
    FROM firsts f JOIN l2 ON l2.run_id = f.run_id
    GROUP BY f.run_id, f.failure_seq, f.n_failed_nodes
    ORDER BY f.run_id ASC
    """,
)
def q309_failure_analysis(spark, sf_dir):
    """state.builder_query.failure_analysis: min-struct argmin for the
    first failed decision + co-keyed chain reconstruction, no per-run
    driver loop. decision_chain (array) stays operator-side; the gate
    hashes its length plus the scalar fields."""
    from ..state.builder_query import failure_analysis

    l2, _ = _runlog(spark, sf_dir)
    fa = failure_analysis(l2)
    return fa.select(
        "run_id",
        "failure_seq",
        "failure_point",
        "root_cause",
        "chain_len",
        "n_failed_nodes",
    ).orderBy("run_id")


# ---------------------------------------------------------------------------
# q310 — suggest_improvements (reference builder/query.py:310-364):
# the three deterministic rule families as a unioned report.
# ---------------------------------------------------------------------------
@query(
    "q310_suggest_improvements",
    oracle=f"""
    WITH {_L2_SQL.strip()}, {_L1_SQL.strip()},
    pn AS (
      SELECT goal_id, node_id,
        CAST(SUM(CASE WHEN success THEN 0 ELSE 1 END) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) AS rate
      FROM l2 GROUP BY goal_id, node_id
    ),
    ce AS (
      SELECT goal_id, error, CAST(COUNT(*) AS BIGINT) AS n
      FROM l2 WHERE NOT success GROUP BY goal_id, error
    ),
    gs AS (
      SELECT agent_id AS goal_id,
        CAST(SUM(CASE WHEN status = 'success' THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) AS sr
      FROM l1 GROUP BY agent_id
    ),
    sugg AS (
      SELECT goal_id, 'node_improvement' AS suggestion_type,
        node_id AS target, rate AS metric,
        CASE WHEN rate > 0.3 THEN 'high' ELSE 'medium' END AS priority
      FROM pn WHERE rate > 0.1
      UNION ALL
      SELECT goal_id, 'error_handling', error, CAST(n AS DOUBLE),
        CASE WHEN n >= 5 THEN 'high' ELSE 'medium' END
      FROM ce WHERE n >= 2
      UNION ALL
      SELECT goal_id, 'architecture', goal_id, sr, 'high'
      FROM gs WHERE sr < 0.8
    )
    SELECT goal_id, suggestion_type, target,
      CAST(FLOOR(metric * 1000000 + 0.5) / 1000000 AS DOUBLE) AS metric,
      priority
    FROM sugg
    ORDER BY goal_id ASC, suggestion_type ASC, target ASC
    """,
)
def q310_suggest_improvements(spark, sf_dir):
    """state.builder_query.suggest_improvements: node_improvement /
    error_handling / architecture rules with the reference's
    thresholds (0.1/0.3 failure rate, 2/5 error counts, 0.8 success
    floor)."""
    from ..state.builder_query import suggest_improvements

    l2, l1 = _runlog(spark, sf_dir)
    s = suggest_improvements(l2, l1, goal_col="agent_id")
    return s.select(
        "goal_id",
        "suggestion_type",
        "target",
        stable_round6(F.col("metric")).alias("metric"),
        "priority",
    ).orderBy("goal_id", "suggestion_type", "target")
