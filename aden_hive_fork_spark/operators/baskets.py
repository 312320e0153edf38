"""Market-basket co-occurrence: item-pair support and lift.

The association-rule primitive (the counting core of FP-growth /
a-priori) as a relational plan: which items appear together in the
same basket more often than independence predicts. The reference
answers this class of question through ad-hoc SQL over order data
(generic SQL-on-file tier); here it is a first-class operator because
the naive formulation — basket self-join — is the classic quadratic
trap at scale.

Plan shape (all equi-joins, no cross join):

1. distinct (basket, item) — one shuffle on basket.
2. optional **basket cap**: drop baskets with more than ``max_basket``
   items BEFORE pairing. Pair count per basket is C(n,2); one
   million-item basket alone would emit 5e11 pairs. The cap bounds
   the self-join output at C(max_basket,2) × n_baskets — analytic,
   data-independent (same discipline as the stop-shingle DF cutoff in
   dedup.py). The cap is an explicit caller-chosen knob; audit the
   dropped-basket count separately with
   ``items.groupBy(basket).count().filter(count > max_basket)``.
3. self-join on basket with ``item_a < item_b`` — both sides share
   the step-1 partitioning, so AQE plans a single co-partitioned
   hash join; pairs shuffle once on (item_a, item_b) for the count.
4. per-item basket counts (one map-side-combining aggregate) joined
   back onto the pair counts by plain hash join — AQE broadcasts
   them only when the item cardinality is small enough (a forced
   broadcast would be unbounded); with a large vocabulary the pair
   table re-shuffles on item_a then item_b. Lift = support(a,b) · N
   / (support(a) · support(b)); only the 1-row N is force-broadcast.

100 TB: the data-sized shuffles are the distinct, the pair count,
and (for large item vocabularies) the two lift joins; all keyed,
aggregates combine map-side. Lift arithmetic is exact until the
final rounded division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 1,
    max_basket: int | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """(item_a, item_b, pair_count, count_a, count_b, lift) for every
    unordered item pair co-occurring in ≥ ``min_support`` baskets.

    ``lift`` is rounded to ``ndigits`` so ranking on it is stable
    across engines and partitionings.
    """
    items = df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()

    if max_basket is not None:
        sizes = items.groupBy("basket").agg(
            F.count(F.lit(1)).alias("_bsize")
        )
        items = (
            items.join(
                sizes.filter(F.col("_bsize") <= max_basket),
                "basket",
                "inner",
            ).drop("_bsize")
        )

    # 1-row total as a broadcast cross join — keeps everything in ONE
    # Spark job (no driver-side count action splitting the plan).
    n_baskets = items.agg(
        F.countDistinct("basket").cast("double").alias("_n_baskets")
    )

    a = items.select("basket", F.col("item").alias("item_a"))
    b = items.select("basket", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_count"))
        .filter(F.col("pair_count") >= min_support)
    )

    per_item = items.groupBy("item").agg(
        F.count(F.lit(1)).cast("bigint").alias("item_count")
    )

    # per_item is item-cardinality-sized (unbounded at corpus scale)
    # — plain hash joins; AQE broadcasts them only when small enough.
    # Only the 1-row total is force-broadcast.
    out = (
        pairs.join(per_item.withColumnRenamed("item", "item_a"), "item_a")
        .withColumnRenamed("item_count", "count_a")
        .join(per_item.withColumnRenamed("item", "item_b"), "item_b")
        .withColumnRenamed("item_count", "count_b")
        .crossJoin(F.broadcast(n_baskets))
    )
    lift = (
        F.col("pair_count").cast("double")
        * F.col("_n_baskets")
        / (F.col("count_a").cast("double") * F.col("count_b").cast("double"))
    )
    return out.select(
        "item_a",
        "item_b",
        "pair_count",
        "count_a",
        "count_b",
        F.round(lift, ndigits).cast("double").alias("lift"),
    )


def item_similarity(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    top_k: int = 3,
    min_support: int = 1,
    max_basket: int | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """Item-item collaborative filtering over binary co-occurrence:
    for every item, its ``top_k`` most similar items by cosine over
    the basket-membership vectors — cos(i,j) = |B_i ∩ B_j| /
    sqrt(|B_i|·|B_j|), all counts exact integers. Output: ``item,
    neighbor, pair_count, cosine, rank`` (row_number, 1-based).

    The "people who bought X also bought Y" recommender primitive.
    Same scale bounds as ``basket_pairs`` (cap pathological baskets
    with ``max_basket`` — the C(cap,2) discipline). Pairs are built
    DIRECTLY in both orientations (``!=`` residual on the one basket
    self-join) rather than mirroring canonical pairs through a union
    — a union would plan the whole self-join subtree twice (exchange
    reuse does not dedupe it; measured 26 → 15 exchanges here). The
    rank window partitions by item over that item's co-occurring
    neighbors only (≤ degree — hub-safe). Cosine is ROUNDED BEFORE
    ranking and ties break on neighbor id, so the selection is
    deterministic across engines/partitionings.
    """
    from pyspark.sql import Window

    items = df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    if max_basket is not None:
        sizes = items.groupBy("basket").agg(
            F.count(F.lit(1)).alias("_bsize")
        )
        items = items.join(
            sizes.filter(F.col("_bsize") <= max_basket), "basket", "inner"
        ).drop("_bsize")

    a = items.select("basket", F.col("item").alias("item_a"))
    b = items.select("basket", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "basket")
        .filter(F.col("item_a") != F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_count"))
        .filter(F.col("pair_count") >= min_support)
    )
    per_item = items.groupBy("item").agg(
        F.count(F.lit(1)).cast("bigint").alias("item_count")
    )
    both = (
        pairs.join(per_item.withColumnRenamed("item", "item_a"), "item_a")
        .withColumnRenamed("item_count", "count_a")
        .join(per_item.withColumnRenamed("item", "item_b"), "item_b")
        .withColumnRenamed("item_count", "count_b")
    )
    cos = F.round(
        F.col("pair_count").cast("double")
        / F.sqrt(
            F.col("count_a").cast("double") * F.col("count_b").cast("double")
        ),
        ndigits,
    ).cast("double")
    w = Window.partitionBy("item_a").orderBy(
        F.desc("cosine"), F.asc("item_b")
    )
    return (
        both.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            F.col("item_a").alias("item"),
            F.col("item_b").alias("neighbor"),
            "pair_count",
            "cosine",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def als_rank1(
    df: DataFrame,
    user_col: str,
    item_col: str,
    value_col: str,
    iters: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """Rank-1 alternating least squares over the observed
    (user, item, value) cells — the minimal matrix-factorization
    recommender (x̂_ui = u_u·v_i), alternating the closed-form
    per-row least-squares updates

        u_u ← Σ_{i∈obs(u)} x_ui·v_i / Σ_{i∈obs(u)} v_i²
        v_i ← Σ_{u∈obs(i)} x_ui·u_u / Σ_{u∈obs(i)} u_u²

    for a fixed number of rounds from v ≡ 1. Returns (users, items)
    DataFrames: ``(id, score)``.

    Determinism at scale: per-row sums use QUANTIZE-THEN-DECIMAL-SUM
    (the HITS discipline — terms floor-quantize to 9 digits and sum
    as exact DECIMAL, associative at ANY degree, so a power user or
    a hot item can never destabilize the reduction), and each update
    floor-quantizes before the next round. Factor state is
    node-sized and distributed; lineage checkpoint-truncates per
    round. The fixed iteration count + fixed init make the whole fit
    an unrollable-CTE oracle target like kmeans/pagerank/HITS.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    x = df.select(
        F.col(user_col).cast("long").alias("_u"),
        F.col(item_col).cast("long").alias("_i"),
        F.col(value_col).cast("double").alias("_x"),
    ).persist()
    fq = lambda c: F.floor(c * F.lit(1e9)).cast("double") / F.lit(1e9)  # noqa: E731
    dsum = lambda c: F.sum(c.cast("decimal(28,9)")).cast("double")  # noqa: E731
    items = (
        x.select(F.col("_i").alias("id")).distinct()
        .withColumn("v", F.lit(1.0))
        .localCheckpoint(eager=True)
    )
    users = None
    try:
        for _ in range(int(iters)):
            users = (
                x.join(items, x["_i"] == items["id"])
                .groupBy(F.col("_u").alias("id"))
                .agg(
                    fq(
                        dsum(fq(F.col("_x") * F.col("v")))
                        / dsum(fq(F.col("v") * F.col("v")))
                    ).alias("u")
                )
                .localCheckpoint(eager=True)
            )
            items = (
                x.join(users, x["_u"] == users["id"])
                .groupBy(F.col("_i").alias("id"))
                .agg(
                    fq(
                        dsum(fq(F.col("_x") * F.col("u")))
                        / dsum(fq(F.col("u") * F.col("u")))
                    ).alias("v")
                )
                .localCheckpoint(eager=True)
            )
        users = users.select("id", F.col("u").alias("score"))
        items = items.select("id", F.col("v").alias("score"))
    finally:
        x.unpersist()
    return users, items
