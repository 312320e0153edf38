"""Categorical feature encoding for ML training pipelines.

Target (mean) encoding replaces a high-cardinality categorical with
the target mean of its category — the workhorse encoding for GBDT
features. The naive version leaks the row's own label; the standard
fixes are LEAVE-ONE-OUT (subtract the row's own target before
averaging) and SMOOTHING toward the global mean (so rare categories
don't memorize noise). Both composed here:

    loo(row) = (S_cat − x_row + m·μ) / (n_cat − 1 + m)

with S_cat/n_cat the category sum/count, μ the global target mean,
and m the smoothing pseudo-count.

Scale contract: ONE keyed aggregate builds the category table
(categories ≪ corpus), the global mean is a one-row aggregate, and
both broadcast-join back onto the fact rows — the corpus itself
never shuffles; the encode is map-side arithmetic. Determinism: the
sums are exact DECIMAL, μ and the division are single fixed IEEE
expressions, so DuckDB replays the encode bit for bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    smoothing: float = 10.0,
    scale: int = 2,
    ndigits: int = 6,
    out_col: str = "te_loo",
) -> DataFrame:
    """Append a leave-one-out smoothed target encoding of
    ``cat_col`` to every row. Rows where the category has a single
    occurrence and smoothing is 0 would divide by zero — the
    smoothing pseudo-count keeps the denominator positive for any
    m > 0 (for m = 0 such rows encode as NULL via NULLIF).
    """
    m = float(smoothing)
    v = F.col(target_col).cast(f"decimal(18,{scale})")
    cat = df.groupBy(cat_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_n_cat"),
        F.sum(v).cast("decimal(38,6)").alias("_s_cat"),
    )
    glob = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("_n_all"),
        F.sum(v).cast("decimal(38,6)").alias("_s_all"),
    )
    mu = F.col("_s_all").cast("double") / F.col("_n_all").cast("double")
    num = (
        F.col("_s_cat").cast("double")
        - v.cast("double")
        + F.lit(m) * mu
    )
    den = F.nullif(
        F.col("_n_cat").cast("double") - 1.0 + F.lit(m), F.lit(0.0)
    )
    return (
        df.join(F.broadcast(cat), cat_col)
        .crossJoin(F.broadcast(glob))
        .withColumn(
            out_col, F.round(num / den, ndigits).cast("double")
        )
        .drop("_n_cat", "_s_cat", "_n_all", "_s_all")
    )


def feature_hash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    salt: str = "fh",
) -> DataFrame:
    """Hashing-trick text vectorizer (Weinberger et al. 2009): each
    token hashes to one of ``k`` buckets with a ±1 sign hash, and the
    document's feature vector is the per-bucket signed count — fixed
    dimensionality with no vocabulary table, THE property that makes
    it shardable: any executor can featurize any row with zero
    broadcast state.

    Output: ``id_col, n_tokens, features`` (array<bigint> of length
    k). md5-derived bucket and sign (the hash_bucket idiom) keep it
    DuckDB-replayable; densification is map-side
    (map_from_entries + transform over 0..k-1 — no grid join).
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), " +")
        ).alias("_tok"),
    ).filter(F.col("_tok") != "")
    h = F.md5(F.concat(F.lit(salt), F.col("_tok")))
    bucket = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % k
    ).cast("int")
    sign = F.when(
        F.conv(F.substring(h, 9, 1), 16, 10).cast("int") % 2 == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    per_bucket = (
        toks.select(id_col, bucket.alias("_b"), sign.alias("_sgn"))
        .groupBy(id_col, "_b")
        .agg(
            F.sum("_sgn").cast("bigint").alias("_v"),
            F.count(F.lit(1)).cast("bigint").alias("_n"),
        )
    )
    m = F.map_from_entries(
        F.collect_list(F.struct(F.col("_b"), F.col("_v")))
    )
    return (
        per_bucket.groupBy(id_col)
        .agg(
            F.sum("_n").cast("bigint").alias("n_tokens"),
            m.alias("_m"),
        )
        .select(
            id_col,
            "n_tokens",
            F.transform(
                F.sequence(F.lit(0), F.lit(int(k) - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("_m"), i.cast("int")),
                    F.lit(0).cast("bigint"),
                ),
            ).alias("features"),
        )
    )
