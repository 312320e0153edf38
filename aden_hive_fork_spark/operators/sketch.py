"""KMV (k-minimum-values) distinct-count sketch — the mergeable,
DETERMINISTIC alternative to HLL for cardinality estimation.

Where ``approx_count_distinct`` (HLL) is engine-internal and not
hash-checkable, KMV is three relational steps over a content hash:
md5 the value, keep the k smallest distinct hash values per group,
estimate D ≈ (k−1)/U_(k) with U_(k) the k-th minimum normalized to
[0,1). Every step is deterministic and SQL-replayable, so even the
*approximate* tier sits inside the oracle gate (the same trick as the
int8-quantized similarity tier). Standard error ≈ 1/√(k−2).

Mergeability — the property that matters at 100 TB: the k smallest
hashes of a union are computable from the per-partition k smallest
(`merge_kmv` re-ranks the concatenated candidate lists, never the
data). Sketch per day/partition once, merge for any date range —
the same pattern as the rollup HLL columns (operators/rollup), but
hash-checkable.

Shape: one distinct-aggregate shuffle on (group, hash) — the
cardinality-bounded table — then a per-group rank window over
DISTINCT HASHES ONLY (not rows). Hub groups cost their distinct
count, not their row count. 60-bit hashes (15 md5 hex chars) keep
the arithmetic in exact BIGINT range in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 2^60 — the hash-space size for 15 hex chars
_SPACE = float(1 << 60)


def _h60(col: Column, salt: str) -> Column:
    h = F.md5(F.concat(F.lit(salt), col.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 256,
    salt: str = "",
) -> DataFrame:
    """Per-group KMV sketch: ``group_cols…, hashes (array<bigint>, the
    ≤k minimum distinct hash values, sorted), n_kept``. Feed to
    ``kmv_estimate`` for the cardinality, or union several sketch
    tables into ``merge_kmv``."""
    g = group_cols or []
    d = (
        df.filter(F.col(value_col).isNotNull())
        .select(*g, _h60(F.col(value_col), salt).alias("_h"))
        .distinct()
    )
    # Two-stage k-minimum selection: the k smallest of a union are
    # always among each part's k smallest, so first keep k per
    # (group, physical partition) — one task per (group, partition),
    # never a single global sort — then rank the ≤ k·n_partitions
    # survivors per group. Without the pre-prune a LOW-group-count
    # sketch (worst case: the global one) funnels every distinct hash
    # through one window task.
    pre = d.withColumn("_pid", F.spark_partition_id())
    w1 = Window.partitionBy(*g, "_pid").orderBy("_h")
    cand = (
        pre.withColumn("_r", F.row_number().over(w1))
        .filter(F.col("_r") <= k)
        .drop("_pid", "_r")
    )
    w = Window.partitionBy(*g).orderBy("_h")
    topk = cand.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") <= k
    )
    return topk.groupBy(*g).agg(
        F.sort_array(F.collect_list("_h")).alias("hashes"),
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
    )


def kmv_estimate(
    sketch: DataFrame, k: int, group_cols: list[str] | None = None
) -> DataFrame:
    """Cardinality from a sketch: exact ``n_kept`` when the group held
    fewer than k distinct values (the sketch IS the value set), else
    ``floor((k−1)·2^60 / h_(k))``. FLOOR (pure IEEE) rather than
    ROUND keeps the integerization engine-neutral."""
    g = group_cols or []
    kth = F.element_at("hashes", k).cast("double")
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(F.floor(F.lit(float(k - 1)) * F.lit(_SPACE) / kth))
    return sketch.select(
        *g,
        F.col("n_kept"),
        est.cast("bigint").alias("est_distinct"),
    )


def merge_kmv(
    sketches: DataFrame, k: int, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge sketch rows (e.g. one per day-partition) into one sketch
    per group: explode the candidate hash lists, dedup, re-rank, keep
    k smallest — identical output to sketching the unioned raw data,
    at candidate-list cost."""
    g = group_cols or []
    ex = sketches.select(*g, F.explode("hashes").alias("_h")).distinct()
    w = Window.partitionBy(*g).orderBy("_h")
    topk = ex.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") <= k)
    return topk.groupBy(*g).agg(
        F.sort_array(F.collect_list("_h")).alias("hashes"),
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
    )


def kmv_set_estimates(
    sk_a: DataFrame,
    sk_b: DataFrame,
    k: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Union / intersection cardinality estimates from two KMV
    sketches (the theta-sketch trick): merge the candidate lists,
    keep the k smallest of the union — that is exactly the union's
    sketch — and estimate |A∩B| as ρ·|A∪B| where ρ is the fraction
    of the union's k-minimums present in BOTH input sketches.
    Output: ``group_cols…, union_est, intersect_est, jaccard``.

    Set algebra over sketches needs no second data pass — the whole
    computation is array arithmetic over two k-length lists per
    group (pure JVM column expressions), which is what makes
    pre-sketched per-partition cardinality joinable at 100 TB.
    Everything is deterministic (md5-ordered minimums, FLOOR
    integerization), so the estimates sit inside the oracle gate
    like the base sketch.
    """
    g = group_cols or []
    a = sk_a.select(*g, F.col("hashes").alias("_ha"))
    b = sk_b.select(*g, F.col("hashes").alias("_hb"))
    j = a.join(b, g) if g else a.crossJoin(b)
    merged = F.slice(
        F.array_sort(F.array_distinct(F.concat("_ha", "_hb"))), 1, k
    )
    j = j.withColumn("_m", merged)
    m_len = F.size("_m")
    kth = F.element_at("_m", k).cast("double")
    union_est = F.when(m_len < k, m_len.cast("double")).otherwise(
        F.floor(F.lit(float(k - 1)) * F.lit(_SPACE) / kth)
    )
    in_both = F.size(
        F.filter(
            F.col("_m"),
            lambda x: F.array_contains(F.col("_ha"), x)
            & F.array_contains(F.col("_hb"), x),
        )
    )
    rho = in_both.cast("double") / F.least(m_len, F.lit(k)).cast("double")
    return j.select(
        *g,
        union_est.cast("bigint").alias("union_est"),
        F.floor(rho * union_est).cast("bigint").alias("intersect_est"),
        F.round(rho, 6).cast("double").alias("jaccard"),
    )
