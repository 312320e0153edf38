"""Domain-mixture reweighting: given a corpus partitioned into
domains (source column) and a TARGET mixture, compute per-domain
sampling weights, token allocations, and effective epoch counts — the
static data-mixing pass of a pretraining pipeline (the published
DoReMi/The-Pile recipe shape: fixed target shares applied to measured
corpus shares; learning the target is out of scope).

No reference counterpart (driver-mandated training-data extension).
Scale shape: ONE keyed aggregate over the corpus (per-domain doc and
token counts), then all arithmetic on the |domains|-row table — the
corpus is touched once and nothing else grows with it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def domain_mix_report(
    df: DataFrame,
    domain_col: str,
    len_col: str,
    target_shares: dict[str, float],
    token_budget: int,
) -> DataFrame:
    """Per-domain mixing report.

    Output per domain: ``n_docs, n_tokens, current_share`` (measured
    token fraction), ``target_share`` (0.0 for domains absent from
    ``target_shares`` — they are dropped from the mix), ``weight`` =
    target/current (the per-document sampling multiplier; NULL when
    current is 0), ``allocated_tokens`` = floor(budget·target), and
    ``epochs`` = allocated/n_tokens (how many passes over the domain
    the budget implies — >1 flags upsampling/repetition).

    ``target_shares`` must be positive and is validated to sum to 1
    within 1e-9 (the contract that makes allocations a partition of
    the budget up to flooring).
    """
    if token_budget <= 0:
        raise ValueError("token_budget must be positive")
    if not target_shares:
        raise ValueError("target_shares must be non-empty")
    bad = {k: v for k, v in target_shares.items() if not v > 0}
    if bad:
        raise ValueError(f"target shares must be positive: {bad}")
    total = sum(target_shares.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(
            f"target_shares must sum to 1 (got {total!r}) — normalize "
            "upstream so the allocation partitions the budget"
        )
    per_domain = (
        df.filter(F.col(len_col).isNotNull() & (F.col(len_col) > 0))
        .groupBy(F.col(domain_col).alias("domain"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col(len_col).cast("long")).cast("bigint").alias(
                "n_tokens"
            ),
        )
    )
    tot = per_domain.agg(
        F.sum("n_tokens").cast("bigint").alias("_corpus_tokens")
    )
    target = F.create_map(
        *[
            x
            for k, v in sorted(target_shares.items())
            for x in (F.lit(k), F.lit(float(v)))
        ]
    )
    j = per_domain.crossJoin(F.broadcast(tot))
    current = F.col("n_tokens").cast("double") / F.col(
        "_corpus_tokens"
    ).cast("double")
    tshare = F.coalesce(target[F.col("domain")], F.lit(0.0))
    alloc = F.floor(tshare * F.lit(float(token_budget))).cast("bigint")
    return j.select(
        "domain",
        "n_docs",
        "n_tokens",
        current.alias("current_share"),
        tshare.alias("target_share"),
        F.when(F.col("n_tokens") > 0, tshare / current).alias("weight"),
        alloc.alias("allocated_tokens"),
        (alloc.cast("double") / F.col("n_tokens").cast("double")).alias(
            "epochs"
        ),
    )


def apply_domain_weights(
    df: DataFrame, domain_col: str, report: DataFrame
) -> DataFrame:
    """Attach each row's sampling ``weight`` from the report via a
    broadcast join (|domains| rows) — the map-side step a weighted
    sampler (e.g. operators/sampling's Efraimidis-Spirakis tier)
    consumes downstream. Rows from domains outside the target mix get
    weight 0.0."""
    w = report.select(
        F.col("domain").alias(domain_col),
        F.coalesce("weight", F.lit(0.0)).alias("weight"),
    )
    return df.join(F.broadcast(w), domain_col, "left").withColumn(
        "weight", F.coalesce("weight", F.lit(0.0))
    )
