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
    return df.withColumn("cid", _argmin_cid(feature_cols, centroids))


def _argmin_cid(feature_cols: list[str], centroids: list[list[float]]) -> Column:
    """Column form of the assignment: index of the nearest centroid
    (squared euclidean, the fixed left-to-right dimension order of
    ``_dist2``; ties → lower cid via struct comparison)."""
    entries = [
        F.struct(
            _dist2(feature_cols, c).alias("d"),
            F.lit(i).cast("int").alias("cid"),
        )
        for i, c in enumerate(centroids)
    ]
    return F.array_min(F.array(*entries)).getField("cid")


def kmeans_keyed(
    df: DataFrame,
    key_col: str,
    feature_cols: list[str],
    id_col: str,
    k: int,
    n_iter: int = 3,
    salt_prefix: str = "kmeans|",
    ndigits: int = 6,
) -> dict[int, list[list[float]]]:
    """Run ``n_keys`` INDEPENDENT k-means fits in ONE Lloyd loop —
    the scale-correct plan for PQ codebook training, where the m
    subspaces would otherwise serialize m×n_iter Spark jobs.

    ``df`` holds every key's points stacked (one row per (key,
    point)); each Lloyd round is ONE assignment pass + ONE
    ``groupBy(key, cid)`` aggregate updating ALL keys' centroids,
    with one driver collect of n_keys·k rows per round. Bit-identical
    to running :func:`kmeans` per key with ``salt =
    salt_prefix + str(key)``:

    - seeds per key = the k rows with the smallest
      ``md5(salt_prefix || key || id)``, selected in TWO PHASES —
      a partition-local top-k per key (Arrow pass, bounded output
      of partitions·keys·k rows) then one small window over the
      survivors. Top-k is partition-invariant, so the selection is
      bit-identical to a per-key global sort-limit, without funneling
      any key's full row set through a single window task;
    - assignment broadcast-joins each key's centroid array (n_keys
      rows) and computes the argmin with a runtime
      ``transform``/``aggregate`` fold — the same left-to-right
      dimension-order IEEE sequence as ``_dist2`` (the fold seeds
      with +0.0, an exact identity for the non-negative squared
      terms) and the same (distance, cid) struct-min tie-break.
      A literal when-chain would re-create ``_dist2`` exactly but
      blows Janino's 64 KB codegen limit at n_keys·k expression
      copies; the array form is O(1) generated code;
    - centroid updates are the same exact-decimal ROUND-``ndigits``
      means, now grouped by (key, cid);
    - an emptied cluster keeps its previous centroid.

    Returns {key: [k centroids]}. Driver state: n_keys·k·d floats.
    ``key_col`` must be integer-typed (its string cast must equal
    Python ``str(key)`` for the seed-hash contract).

    This is a thin wrapper over :func:`kmeans_keyed_array` (packs the
    feature columns into one array<double>) — the array form carries
    the exact same arithmetic with an O(1)-size plan per Lloyd round,
    where the splayed-column form paid ~1.5 s of Catalyst analysis
    per round at d=64 (round-12 measurement; the per-dimension
    aggregate list dominated plan analysis, not execution).
    """
    vec = F.array(*[F.col(c).cast("double") for c in feature_cols])
    packed = df.select(
        F.col(key_col), F.col(id_col), vec.alias("_vec")
    )
    return kmeans_keyed_array(
        packed, key_col, "_vec", id_col, k=k, n_iter=n_iter,
        salt_prefix=salt_prefix, ndigits=ndigits,
        dim=len(feature_cols),
    )


def _assign_cids_hof(
    df: DataFrame,
    key_col: str,
    vec_col: str,
    cents: dict[int, list[list[float]]],
) -> DataFrame:
    """The pre-r13 assignment: broadcast centroid arrays + the
    interpreted left-to-right ``aggregate``/``zip_with``
    squared-euclidean fold with the (distance, cid) struct-min
    tie-break. Kept as the differential reference for
    ``_assign_cids_kernel`` (pinned bit-equal by
    ``test_kmeans_assign_kernel_matches_hof``)."""
    spark = df.sparkSession
    keys = sorted(cents)
    cb = F.broadcast(
        spark.createDataFrame(
            [(key, cents[key]) for key in keys],
            f"{key_col} int, _cents array<array<double>>",
        )
    )
    entries = F.transform(
        F.col("_cents"),
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col), c, lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("d"),
            i.cast("int").alias("cid"),
        ),
    )
    return (
        df.join(cb, key_col)
        .withColumn("cid", F.array_min(entries).getField("cid"))
        .drop("_cents")
    )


def _assign_cids_kernel(
    df: DataFrame,
    key_col: str,
    vec_col: str,
    cents: dict[int, list[list[float]]],
) -> DataFrame:
    """Arrow kernel for the per-round Lloyd assignment (r13): the
    SCALING §29 rule — the interpreted HOF fold never enters
    whole-stage codegen and was the dominant per-round cost
    (n·k·d fused lambdas per row). IEEE-exact replay of the HOF:
    the distance accumulates DIM-SEQUENTIALLY from +0.0 with one
    (a−b)·(a−b) elementwise product per dimension (never a pairwise
    numpy sum — binary64 ops in the fold's exact order), and
    ``np.argmin`` returns the FIRST minimum — the struct-min's
    (distance asc, cid asc) tie-break. Centroids ride the task
    closure (keys·k·d doubles, bounded)."""
    import numpy as np
    import pandas as pd

    bk = {
        int(key): np.array(v, dtype=np.float64)
        for key, v in cents.items()
    }
    key_dt = dict(df.dtypes)[key_col]

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                yield pdf[[key_col, vec_col]].assign(
                    cid=pd.Series([], dtype="int32")
                )
                continue
            keys_arr = pdf[key_col].to_numpy()
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(
                np.float64, copy=False
            )
            cids = np.empty(len(pdf), dtype=np.int32)
            for kv in np.unique(keys_arr):
                m = keys_arr == kv
                cmat = bk[int(kv)]  # (k, d)
                x = mat[m]  # (n, d)
                dist = np.zeros((x.shape[0], cmat.shape[0]))
                for dd in range(cmat.shape[1]):
                    diff = x[:, dd : dd + 1] - cmat[:, dd][None, :]
                    dist += diff * diff
                cids[m] = np.argmin(dist, axis=1)
            yield pdf[[key_col, vec_col]].assign(cid=cids)

    return df.select(key_col, vec_col).mapInPandas(
        run,
        schema=f"{key_col} {key_dt}, {vec_col} array<double>, cid int",
    )


def kmeans_keyed_array(
    df: DataFrame,
    key_col: str,
    vec_col: str,
    id_col: str,
    k: int,
    n_iter: int = 3,
    salt_prefix: str = "kmeans|",
    ndigits: int = 6,
    dim: int | None = None,
) -> dict[int, list[list[float]]]:
    """:func:`kmeans_keyed` on an ``array<double>`` feature column —
    the native form (round 12): every per-dimension surface of the
    splayed-column variant (projection list, aggregate list) is a
    fixed-size expression here, so Catalyst analysis per Lloyd round
    is O(1) in dimension instead of O(d). Arithmetic is identical:

    - seeds: the k smallest ``md5(salt_prefix || key || id)`` rows
      per key (two-phase partition-local top-k, bit-identical);
    - assignment: an Arrow kernel replaying the left-to-right
      squared-euclidean fold bit-for-bit (dim-sequential binary64
      accumulation from +0.0, argmin-first == the (distance, cid)
      struct-min tie-break — r13; the interpreted HOF form is kept
      as ``_assign_cids_hof`` and differentially pinned);
    - centroid update: ``posexplode`` + one exact-decimal mean per
      (key, cid, dimension) — the same DECIMAL(28,2) addends the
      per-column aggregates summed, reduced by the same
      order-independent exact sum and the same Spark ROUND;
    - an emptied cluster keeps its previous centroid (it simply has
      no rows at any dimension).

    ``dim`` (optional) skips the one-row dimension probe. All vectors
    must share one dimension and hold no NULL entries (the
    feature-column contract of the splayed form).
    """
    from pyspark.sql.window import Window

    if k < 1 or n_iter < 1:
        raise ValueError("k and n_iter must be >= 1")
    # Widen narrow inputs once, up front (the bootstrap._widen rule):
    # the per-iteration argmin fold is an interpreted HOF (SCALING
    # §29) evaluated n·k·d times per round, and the typical caller
    # feeds a 1-2-partition checkpointed frame — which serializes
    # every round on one core. Assignment is map-side and the
    # centroid updates are exact-decimal (order-independent), so the
    # spread cannot change any result.
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target, F.col(key_col), F.col(id_col))
    h = F.md5(
        F.concat(
            F.lit(salt_prefix),
            F.col(key_col).cast("string"),
            F.col(id_col).cast("string"),
        )
    )
    base = df.select(
        F.col(key_col),
        F.col(vec_col).alias("_vec"),
        h.alias("_h"),
        F.col(id_col).alias("_id"),
    )

    def _local_topk(batches):
        # Fold Arrow batches incrementally: merge each batch into a
        # running per-key top-k instead of concatenating the whole
        # partition first, so peak executor memory is O(batch +
        # keys*k) rather than partition-sized. Top-k under the total
        # order (_h, _id) is associative, so the selection is
        # bit-identical to the all-at-once form.
        import pandas as pd

        running = None
        for batch in batches:
            merged = (
                batch
                if running is None
                else pd.concat([running, batch], ignore_index=True)
            )
            running = (
                merged.sort_values(["_h", "_id"], kind="mergesort")
                .groupby(key_col, sort=False)
                .head(k)
            )
        if running is not None:
            yield running

    w_seed = Window.partitionBy(key_col).orderBy("_h", "_id")
    seed_rows = (
        base.mapInPandas(_local_topk, schema=base.schema)
        .withColumn("_rn", F.row_number().over(w_seed))
        .filter(F.col("_rn") <= k)
        .collect()
    )
    cents: dict[int, list[list[float]]] = {}
    for r in sorted(seed_rows, key=lambda r: (r[key_col], r["_rn"])):
        cents.setdefault(int(r[key_col]), []).append(
            [float(x) for x in r["_vec"]]
        )
    for key, cs in cents.items():
        if len(cs) < k:
            raise ValueError(f"key {key}: fewer than k={k} rows to seed from")
    keys = sorted(cents)
    if dim is None:
        dim = len(next(iter(cents.values()))[0])

    spark = df.sparkSession
    for _ in range(n_iter):
        assigned = _assign_cids_kernel(
            df.select(key_col, vec_col), key_col, vec_col, cents
        )
        rows = (
            assigned.select(
                F.col(key_col),
                "cid",
                F.posexplode(F.col(vec_col)).alias("_p", "_x"),
            )
            .groupBy(key_col, "cid", "_p")
            .agg(
                F.round(
                    F.sum(F.col("_x").cast("decimal(28,2)")).cast("double")
                    / F.count(F.lit(1)).cast("double"),
                    ndigits,
                ).alias("_m")
            )
            .collect()
        )
        upd: dict[tuple[int, int], list[float]] = {}
        for r in rows:
            vecu = upd.setdefault(
                (int(r[key_col]), int(r["cid"])), [0.0] * dim
            )
            vecu[int(r["_p"])] = float(r["_m"])
        cents = {
            key: [upd.get((key, i), cents[key][i]) for i in range(k)]
            for key in keys
        }
    return cents


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
