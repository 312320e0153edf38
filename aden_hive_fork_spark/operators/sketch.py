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
    w = Window.partitionBy(*g).orderBy("_h")
    topk = d.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") <= k)
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
