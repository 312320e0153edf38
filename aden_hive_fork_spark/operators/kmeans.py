"""Distributed k-means (Lloyd's algorithm), bit-deterministic.

The classic Spark formulation: each iteration is ONE map-side
assignment pass plus ONE keyed aggregate — centroids live in the
plan as literals (k·d doubles, collected to the driver each round,
the same bounded-driver-state discipline as similarity.py's IVF
k-means sample). No cross join ever materializes: the argmin over k
centroids is a single JVM expression (``array_min`` over structs),
so whole-stage codegen fuses assignment into the scan.

Determinism (the property MLlib's KMeans does NOT give you):

- init is content-hash order — the k rows with the smallest
  ``md5(salt || id)`` become centroids 0..k-1 (any executor count,
  any partitioning, and DuckDB can replay it);
- assignment ties break on the lower cluster id (struct comparison
  orders by (distance, cid));
- centroid updates are exact-decimal sums divided once and ROUNDed
  to ``ndigits`` — order-independent, so the next round's distances
  are computed from bit-identical centroids on every engine;
- an emptied cluster keeps its previous centroid.

Scale: per iteration one shuffle of k·d partial sums (map-side
combined), data scanned n_iter times — at 100 TB you cache/persist
the projected feature frame once and the iterations are CPU-bound
scans; nothing else grows with data size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dist2(feature_cols: list[str], center: list[float]) -> Column:
    d = None
    for c, v in zip(feature_cols, center):
        t = (F.col(c) - F.lit(float(v))) * (F.col(c) - F.lit(float(v)))
        d = t if d is None else d + t
    return d


def assign_clusters(
    df: DataFrame, feature_cols: list[str], centroids: list[list[float]]
) -> DataFrame:
    """Append ``cid`` = index of the nearest centroid (squared
    euclidean; ties → lower cid). Pure column expression — no join,
    no shuffle, codegen-fused into whatever scan feeds it."""
    entries = [
        F.struct(
            _dist2(feature_cols, c).alias("d"),
            F.lit(i).cast("int").alias("cid"),
        )
        for i, c in enumerate(centroids)
    ]
    return df.withColumn("cid", F.array_min(F.array(*entries)).getField("cid"))


def kmeans(
    df: DataFrame,
    feature_cols: list[str],
    id_col: str,
    k: int,
    n_iter: int = 3,
    salt: str = "kmeans",
    ndigits: int = 6,
) -> tuple[DataFrame, list[list[float]]]:
    """Run ``n_iter`` Lloyd iterations; returns (assignments, final
    centroids). ``assignments`` is ``df`` + ``cid`` assigned against
    the FINAL centroids' predecessors (i.e. the assignment that
    produced them — re-assign with ``assign_clusters`` for a serving
    pass). Feature columns must be exactly representable at
    DECIMAL(18,2)-scale (prices, balances, counts) for the
    cross-engine determinism contract; see module docstring.
    """
    if k < 1 or n_iter < 1:
        raise ValueError("k and n_iter must be >= 1")
    seed_rows = (
        df.select(
            *feature_cols,
            F.md5(
                F.concat(F.lit(salt), F.col(id_col).cast("string"))
            ).alias("_h"),
            F.col(id_col).alias("_id"),
        )
        .orderBy("_h", "_id")
        .limit(k)
        .collect()
    )
    if len(seed_rows) < k:
        raise ValueError(f"fewer than k={k} rows to seed from")
    centroids = [[float(r[c]) for c in feature_cols] for r in seed_rows]

    assigned = None
    for _ in range(n_iter):
        assigned = assign_clusters(df, feature_cols, centroids)
        # rounded exact-decimal mean computed IN Spark (its ROUND is
        # the half-away-from-zero the oracle contract relies on;
        # Python's round() is banker's and would drift on ties)
        aggs = [
            F.round(
                F.sum(F.col(c).cast("decimal(28,2)")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                ndigits,
            ).alias(f"_m_{c}")
            for c in feature_cols
        ]
        rows = assigned.groupBy("cid").agg(*aggs).collect()
        upd = {
            int(r["cid"]): [float(r[f"_m_{c}"]) for c in feature_cols]
            for r in rows
        }
        centroids = [upd.get(i, centroids[i]) for i in range(k)]
    return assigned, centroids
