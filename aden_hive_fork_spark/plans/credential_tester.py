"""Credential Tester Agent — the reference's credential-verification
template executed hermetically on this engine's surface (third
capstone after deep_research and hive_coder).

Reference parity: core/framework/agents/credential_tester/agent.py
(goal :41-56 — ONE success criterion, api-call-success, weight 1.0,
no constraints; single client-facing event_loop ``tester`` NodeSpec
:397-415 with the get_account_info startup step; the interactive
account pick + "suggest a simple read-only API call to verify the
credential works" loop). The reference tests one credential per
conversation turn; the Spark-first form verifies a TABLE of accounts
in one map-only pass:

- accounts enumerate through the SAME registry surface the reference's
  get_account_info tool exposes (``sources/accounts.py``);
- verification is the connector-tier discipline
  (``sources/rest_connector.py``): a per-executor ``prober_factory``
  (fixture-backed in tests, live transport in production) attempts
  one READ-ONLY call per account and returns the standard envelope —
  a failed credential yields a row with ``error`` set, never an
  exception (per-row error envelopes, the *_table contract);
- the pipeline itself is the reference's shape: one client-facing
  node, no edges (entry == terminal).

At scale the account table is a dimension (thousands of rows, not
billions); the map-only probe pass never shuffles.
"""

from __future__ import annotations

from typing import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

from .deep_research import Goal, SuccessCriterion
from .graph import Node, Pipeline

GOAL = Goal(
    id="credential-tester",
    name="Credential Tester",
    description="Verify that a credential can make real API calls.",
    success_criteria=(
        SuccessCriterion(
            "api-call-success",
            "At least one API call succeeds using the credential",
            "api_call_success", "true", 1.0,
        ),
    ),
    constraints=(),
)

RESULT_SCHEMA = (
    "provider string, account_id string, api_call_success boolean, "
    "detail string, error string"
)


def accounts_df(spark: SparkSession, registry) -> DataFrame:
    """The get_account_info startup step as a DataFrame: one row per
    connected account (reference agent.py system_prompt step 1)."""
    rows = [
        (a["provider"], a["account_id"])
        for a in registry.get_all_account_info()
    ]
    return spark.createDataFrame(rows, "provider string, account_id string")


def verify_accounts_table(
    accounts: DataFrame,
    prober_factory: Callable[[], Callable[[str, str], dict]],
) -> DataFrame:
    """Probe every account with one read-only call — mapInPandas,
    map-only, per-row error envelopes (the *_table connector
    contract). ``prober_factory`` builds the per-executor prober and
    must pickle by value (lambda/closure); the prober takes
    (provider, account_id) and returns the standard envelope:
    ``{"data": ...}`` on success or ``{"error": "..."}``."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        probe = prober_factory()
        for pdf in batches:
            rows = []
            for provider, account_id in zip(
                pdf["provider"], pdf["account_id"]
            ):
                try:
                    env = probe(str(provider), str(account_id))
                except Exception as exc:  # probe itself must not kill the task
                    env = {"error": f"{type(exc).__name__}: {exc}"}
                ok = "error" not in env
                rows.append(
                    {
                        "provider": provider,
                        "account_id": account_id,
                        "api_call_success": ok,
                        "detail": str(env.get("data"))[:200] if ok else None,
                        "error": None if ok else str(env["error"])[:200],
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "provider", "account_id", "api_call_success",
                    "detail", "error",
                ],
            )

    return accounts.mapInPandas(run, RESULT_SCHEMA)


def build_credential_tester_pipeline(
    prober_factory: Callable[[], Callable[[str, str], dict]],
) -> Pipeline:
    """The reference graph shape: ONE client-facing tester node, no
    edges (agent.py:397-415 — a forever-alive event loop; batch
    semantics make it its own terminal)."""
    tester = Node(
        "tester",
        lambda df: verify_accounts_table(df, prober_factory),
        client_facing=True,
    )
    return Pipeline([tester], [], entry="tester", terminals=["tester"])


def evaluate_success_criteria(results: DataFrame) -> DataFrame:
    """Weighted criterion progress: the single api-call-success
    criterion (weight 1.0) reads as the fraction of probed accounts
    whose verification call succeeded."""
    from pyspark.sql import functions as F

    w = GOAL.success_criteria[0].weight
    return results.agg(
        (
            F.sum(F.when(F.col("api_call_success"), 1).otherwise(0))
            / F.count(F.lit(1))
        ).alias("progress")
    ).select(
        F.lit("api-call-success").alias("criterion_id"),
        F.lit(w).alias("weight"),
        "progress",
    )
