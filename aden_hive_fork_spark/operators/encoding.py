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

from pyspark.sql import DataFrame, Window
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


def decision_stump(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    n_cuts: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """Best single-feature threshold split per feature (a depth-1
    CART node — the primitive under every GBDT/feature-importance
    report): candidate thresholds are the feature's interior
    quantile cuts, split quality is weighted Gini impurity

        G(s) = Σ_{side} (n_s/n)·(1 − (pos_s/n_s)² − (neg_s/n_s)²),

    and the winner per feature is the min-Gini cut (ties → smaller
    cut). Output one row per feature: ``feature, best_cut, gini,
    n_left, n_right, pos_left, pos_right``.

    Plan shape: ONE percentile aggregate per pass computes every
    feature's cut array (broadcast); the corpus amplifies ×cuts
    map-side (posexplode — the bootstrap pattern) and the partial
    aggregate collapses each partition to features×cuts rows before
    the only Exchange. Counts are exact integers; Gini is one fixed
    IEEE expression per (feature, cut).
    """
    if n_cuts < 2:
        raise ValueError("n_cuts must be >= 2")
    fracs = [i / n_cuts for i in range(1, n_cuts)]
    y = F.col(label_col).cast("boolean")
    base = df.filter(y.isNotNull())
    cuts = base.agg(
        *[
            F.transform(
                F.percentile(
                    F.col(c).cast("double"),
                    F.array(*[F.lit(f) for f in fracs]),
                ),
                lambda v: F.round(v, ndigits),
            ).alias(f"_cuts_{c}")
            for c in feature_cols
        ]
    )
    parts = []
    with_cuts = base.crossJoin(F.broadcast(cuts))
    for c in feature_cols:
        parts.append(
            with_cuts.select(
                F.lit(c).alias("feature"),
                F.col(c).cast("double").alias("_x"),
                y.alias("_y"),
                F.explode(F.array_distinct(F.col(f"_cuts_{c}"))).alias(
                    "_cut"
                ),
            )
        )
    expl = parts[0]
    for p in parts[1:]:
        expl = expl.unionByName(p)
    left = F.col("_x") <= F.col("_cut")
    agg = expl.groupBy("feature", "_cut").agg(
        F.sum(F.when(left, 1).otherwise(0)).cast("bigint").alias("n_l"),
        F.sum(F.when(left & F.col("_y"), 1).otherwise(0))
        .cast("bigint")
        .alias("p_l"),
        F.sum(F.when(~left, 1).otherwise(0)).cast("bigint").alias("n_r"),
        F.sum(F.when(~left & F.col("_y"), 1).otherwise(0))
        .cast("bigint")
        .alias("p_r"),
    )

    def side_gini(n_s, p_s):
        nd, pd = n_s.cast("double"), p_s.cast("double")
        return F.when(
            n_s > 0,
            (nd / (F.col("n_l") + F.col("n_r")).cast("double"))
            * (
                1.0
                - (pd / nd) * (pd / nd)
                - ((nd - pd) / nd) * ((nd - pd) / nd)
            ),
        ).otherwise(F.lit(0.0))

    scored = agg.withColumn(
        "_g",
        F.round(
            side_gini(F.col("n_l"), F.col("p_l"))
            + side_gini(F.col("n_r"), F.col("p_r")),
            ndigits,
        ),
    )
    w = Window.partitionBy("feature").orderBy(
        F.col("_g").asc(), F.col("_cut").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "feature",
            F.col("_cut").cast("double").alias("best_cut"),
            F.col("_g").cast("double").alias("gini"),
            F.col("n_l").alias("n_left"),
            F.col("n_r").alias("n_right"),
            F.col("p_l").alias("pos_left"),
            F.col("p_r").alias("pos_right"),
        )
    )
