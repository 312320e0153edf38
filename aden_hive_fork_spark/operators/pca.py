"""PCA for embedding columns: exact covariance, deterministic
components, map-side projection.

The dimensionality-reduction step of an embedding pipeline (reduce
before ANN indexing / clustering / visualization). Reference analog:
none — this is the driver-mandated similarity-search family
(SURVEY §2.D); built from Spark primitives only.

Scale design:

- ``embedding_covariance`` never self-joins the corpus: each row
  generates its d(d+1)/2 upper-triangle products MAP-SIDE with
  higher-order array functions (pure JVM, no Python), and the
  (i, j) aggregate partial-combines before the shuffle — shuffle
  volume is O(d² × partitions), independent of row count. Products
  are exact DECIMAL (the q50 discipline: float32 → DOUBLE → DECIMAL
  is the portable widening), so the sums are bit-identical to the
  DuckDB oracle's regardless of partitioning.
- The covariance matrix is d² values — driver-sized for any
  embedding dim in practical use (d=4096 → 16M entries, still MBs);
  the eigensolve is a LOCAL numpy operation on that matrix, the same
  bounded-driver-state rule as IVF's k-means sample
  (similarity.py): scale-independent because d does not grow with
  the corpus.
- ``pca_project`` broadcasts the k×d component matrix as literal
  column expressions — projection is one ``zip_with``/``aggregate``
  fold per component per row, map-side, whole-stage codegen, no
  Python in the row path.

Determinism: covariance is exact-decimal (oracle-checkable);
eigenvectors use ``numpy.linalg.eigh`` (LAPACK — deterministic for a
fixed matrix) with a sign convention (the component's
largest-magnitude coordinate is made positive, first-index
tie-break), so components are a pure function of the covariance
matrix. Projections are IEEE doubles downstream of the eigensolve —
reproducible run-to-run, but declared rows-only for the cross-engine
gate (no SQL eigensolver exists to replay them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dim(df: DataFrame, vec_col: str) -> int:
    """The (single) embedding dimensionality; raises on ragged input
    or out-of-range components instead of producing a silently-wrong
    covariance. The exact-sum path quantizes components to
    DECIMAL(10,8), whose domain is |x| < 100 — a component at or
    beyond that would overflow to NULL under non-ANSI Spark and
    silently drop terms from the sums while n still counts the row,
    so it is rejected here, loudly, up front."""
    row = df.agg(
        F.min(F.size(F.col(vec_col))).alias("lo"),
        F.max(F.size(F.col(vec_col))).alias("hi"),
        F.max(
            F.aggregate(
                F.col(vec_col),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
            )
        ).alias("amax"),
    ).collect()[0]
    if row["lo"] is None:
        raise ValueError("embedding_covariance: no rows with embeddings")
    if row["lo"] != row["hi"]:
        raise ValueError(
            f"embedding_covariance: ragged embedding sizes "
            f"[{row['lo']}, {row['hi']}] — fix the corpus first"
        )
    if row["amax"] is not None and row["amax"] >= 100.0:
        raise ValueError(
            f"embedding_covariance: |component| max {row['amax']} exceeds "
            f"the DECIMAL(10,8) exact-sum domain (|x| < 100) — scale the "
            f"embeddings (e.g. L2-normalize) before calling"
        )
    return int(row["hi"])


def embedding_covariance(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Upper-triangle sample covariance of an ``array<float>`` column:
    one row per (i, j), 1-based, i <= j — ``(i, j, n_rows, cov)``
    with cov quantized to 6 decimals by the engine-stable
    FLOOR(x*1e6 + 0.5)/1e6 (ROUND on doubles is not portable).

    cov_ij = (Σ x_i·x_j − Σx_i · Σx_j / n) / (n − 1), the sums exact
    DECIMAL, the final arithmetic a fixed IEEE-double expression —
    bit-identical to a DuckDB replay of the same sums.

    NULL embeddings are excluded; ragged dimensions raise.
    """
    df = df.filter(F.col(vec_col).isNotNull())
    d = _dim(df, vec_col)
    # Exact Gram pass as SCALED-INTEGER numpy (Arrow-batched), not the
    # flatten/explode decimal plan: the JVM path allocates a BigDecimal
    # per product — d(d+1)/2 per row — and measured 70 s on 20k×64 at
    # the 10× stress scale; the integer path is the same arithmetic
    # (X = HALF_UP(x·1e8), Σ X_iX_j / 1e16 ≡ Σ dec(x_i)·dec(x_j)) in
    # ~1 s. Exactness argument, step by step:
    #   - components are float32-sourced: x·1e8 = m24·390625·2^(e+8)
    #     needs ≤ 43 mantissa bits → EXACT in float64 (|x| < 100 is
    #     enforced by _dim, so |x·1e8| < 1e10 < 2^53);
    #   - sign(x)·floor(|x·1e8| + 0.5) is BigDecimal HALF_UP (ties
    #     away from zero), the rounding Spark's double→DECIMAL cast
    #     uses, so X/1e8 is bit-identical to CAST(x AS DECIMAL(10,8));
    #   - block-local X^T X in int64 is overflow-safe by construction
    #     (block height ≤ 2^63 / max|X|²), blocks accumulate into a
    #     Python-int (arbitrary precision) matrix;
    #   - partials ship as DECIMAL(38,16) = S/1e16 exactly; the final
    #     SUM of partials is exact decimal addition, so the total is
    #     the same rational number the all-JVM plan produced.
    # Shuffle volume is unchanged: d(d+1)/2 rows per partition.
    from decimal import Decimal as _Dec

    from pyspark.sql.types import (
        DecimalType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    gram_schema = StructType([
        StructField("i", IntegerType()),
        StructField("j", IntegerType()),
        StructField("sxy", DecimalType(38, 16)),
        StructField("n", LongType()),
    ])
    iu, ju = [list(t) for t in zip(*[
        (a + 1, b + 1) for a in range(d) for b in range(a, d)
    ])]

    def _gram(batches):
        import numpy as np
        import pandas as pd

        total = None
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            arr = np.asarray(pdf[vec_col].to_list(), dtype=np.float64)
            x8 = np.abs(arr) * 1e8
            xq = (np.sign(arr) * np.floor(x8 + 0.5)).astype(np.int64)
            n += xq.shape[0]
            mx = int(np.abs(xq).max()) if xq.size else 0
            blk = max(1, int(9.2e18) // max(1, mx * mx))
            for s in range(0, xq.shape[0], blk):
                b = xq[s:s + blk]
                g = (b.T @ b).astype(object)
                total = g if total is None else total + g
        if total is None:
            return
        sxy = [
            _Dec(int(total[a - 1][b - 1])).scaleb(-16)
            for a, b in zip(iu, ju)
        ]
        yield pd.DataFrame(
            {"i": iu, "j": ju, "sxy": sxy, "n": n}
        )

    partials = df.select(vec_col).mapInPandas(_gram, gram_schema)
    sums = partials.groupBy("i", "j").agg(
        F.sum("sxy").alias("sxy"), F.sum("n").cast("bigint").alias("n")
    )
    dim_sums = (
        df.select(
            F.posexplode(F.col(vec_col)).alias("k0", "x")
        )
        .select(
            (F.col("k0") + 1).alias("k"),
            F.col("x").cast("double").cast("decimal(10,8)").alias("xd"),
        )
        .groupBy("k")
        .agg(F.sum("xd").alias("sx"))
    )
    si = dim_sums.select(F.col("k").alias("i"), F.col("sx").alias("sx_i"))
    sj = dim_sums.select(F.col("k").alias("j"), F.col("sx").alias("sx_j"))
    from .similarity import stable_round6

    cov = (
        F.col("sxy").cast("double")
        - F.col("sx_i").cast("double")
        * F.col("sx_j").cast("double")
        / F.col("n").cast("double")
    ) / (F.col("n").cast("double") - F.lit(1.0))
    return (
        sums.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .select(
            "i",
            "j",
            F.col("n").alias("n_rows"),
            stable_round6(cov).alias("cov"),
        )
    )


def pca_components(df: DataFrame, vec_col: str = "embedding", k: int = 2):
    """Top-``k`` principal components of the embedding column.

    Returns ``(eigvals, components)``: a length-k list of variances
    (descending) and a k×d list-of-lists of unit vectors. The
    covariance is computed distributed (``embedding_covariance``);
    the eigensolve is local on the d×d matrix (driver-bounded state —
    d never grows with the corpus). Sign convention: each component's
    largest-|coordinate| is positive (first index on ties), making
    the decomposition a pure function of the data.
    """
    import numpy as np

    rows = embedding_covariance(df, vec_col).collect()
    d = max(r["j"] for r in rows)
    if not (1 <= k <= d):
        raise ValueError(f"pca_components: k must be in [1, {d}]")
    m = np.zeros((d, d))
    for r in rows:
        m[r["i"] - 1, r["j"] - 1] = r["cov"]
        m[r["j"] - 1, r["i"] - 1] = r["cov"]
    vals, vecs = np.linalg.eigh(m)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for idx in order:
        v = vecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append([float(x) for x in v])
    return [float(vals[i]) for i in order], comps


def pca_project(
    df: DataFrame, components: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Append ``pc1..pck`` projection coordinates, one ``zip_with``
    dot-product fold per component — map-side, whole-stage codegen,
    the component matrix riding in the plan as literals (k×d doubles:
    broadcast-by-construction)."""
    out = df
    for n, comp in enumerate(components, start=1):
        lit_vec = F.array(*[F.lit(float(w)) for w in comp])
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col).cast("array<double>"),
                lit_vec,
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        out = out.withColumn(f"pc{n}", dot)
    return out


_PCA_DRIVER_MAX_DIM = 1024  # d^2 doubles of driver state at most


def _power_rounds_driver(
    rows_up, d: int, iters: int
) -> tuple[list[float], float]:
    """Python replay of the relational power rounds — bit-exact: same
    ascending sort of the term values, same sequential float64 fold
    from +0.0, same floor-1e9 quantization, same division and sign
    convention. Pinned equal to the relational form by
    tests/test_round12_opts.py."""
    import math

    C = [[0.0] * d for _ in range(d)]
    for r in rows_up:
        i, j, c = r["i"] - 1, r["j"] - 1, float(r["cov"])
        C[i][j] = c
        C[j][i] = c

    def fq(x: float) -> float:
        return math.floor(x * 1e9) / 1e9

    def fold(terms) -> float:
        acc = 0.0
        for x in sorted(terms):
            acc = acc + x
        return acc

    v = [1.0] * d
    for _ in range(iters):
        w = [
            fq(fold([C[i][j] * v[j] for j in range(d)]))
            for i in range(d)
        ]
        nn = fq(math.sqrt(fold([x * x for x in w])))
        if nn is None or nn <= 0.0:
            raise ValueError(
                "power_iteration_pc1: ||Cv|| quantized to 0 — the "
                "covariance matrix is degenerate (constant or "
                "near-constant embeddings); PC1 is undefined"
            )
        v = [fq(x / nn) for x in w]
    pivot = max(range(d), key=lambda k: (abs(v[k]), -k))
    if v[pivot] < 0:
        v = [-x for x in v]
    lam = fq(
        fold(
            [
                (v[i] * C[i][j]) * v[j]
                for i in range(d)
                for j in range(d)
            ]
        )
    )
    return v, float(lam)


def power_iteration_pc1(
    df: DataFrame,
    vec_col: str = "embedding",
    iters: int = 6,
) -> tuple[list[float], float]:
    """First principal component by POWER ITERATION with every
    arithmetic step engine-replayable — the hash-gate twin of
    ``pca_components`` (whose LAPACK eigensolve no SQL engine can
    replay): v ← fquant₉(Cv / ‖Cv‖) for a fixed number of rounds
    from the all-ones start, sign fixed by the largest-|coordinate|
    convention. Returns (component, eigenvalue estimate vᵀCv).

    Each round is relational: the matrix-vector product folds the
    d bounded terms per row in SORTED order (det_sum discipline) and
    floor-quantizes to 9 digits, so a DuckDB unroll of the same
    rounds reproduces the component bit for bit. The d-vector
    collects to the driver between rounds (bounded state, kmeans
    centroid precedent) and re-enters as literals — float64
    round-trips exactly.

    Scale: the covariance is computed ONCE (map-side d(d+1)/2
    emission, see embedding_covariance); every round after that
    touches only the d×d relation — corpus-independent.
    """
    # The covariance is the ONLY corpus-sized pass. Materialize the
    # d(d+1)/2-row upper triangle eagerly (localCheckpoint truncates
    # lineage, blocks are ContextCleaner-reclaimed) BEFORE building
    # the symmetric view: a lazy persist on the union would run the
    # corpus pass once per union branch on first materialization —
    # measured 2x the whole operator's cost at the 10x stress scale.
    # Every subsequent round touches only the 2·d² bounded relation.
    up = embedding_covariance(df, vec_col).localCheckpoint(eager=True)
    rows_up = up.select("i", "j", "cov").collect()
    if not rows_up:
        raise ValueError(
            "power_iteration_pc1: empty covariance (no embeddings)"
        )
    d = max(r["j"] for r in rows_up)
    if d <= _PCA_DRIVER_MAX_DIM:
        # DRIVER fast path (r12, the BPE/CC-rounds pattern): the
        # post-covariance rounds touch only the d x d relation, and
        # driver-sequencing them through Spark cost a fixed ~1 s job
        # per round (measured: q260 8.7 s noop with 6 rounds + lam).
        # The Python replay is IEEE-exact: the same ascending
        # value-sort, the same sequential float64 fold from +0.0, the
        # same floor(x*1e9)/1e9 quantization, Math.sqrt == math.sqrt
        # (both correctly rounded). Driver state is d^2 doubles,
        # bounded by the explicit gate; the relational rounds remain
        # below as the differential reference and the >gate path.
        return _power_rounds_driver(rows_up, d, int(iters))
    spark = df.sparkSession
    covf = up.select("i", "j", "cov").unionAll(
        up.filter(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "cov"
        )
    )
    fq = lambda c: F.floor(c * F.lit(1e9)).cast("double") / F.lit(1e9)  # noqa: E731
    v = [1.0] * d
    for _ in range(int(iters)):
        vdf = spark.createDataFrame(
            [(k + 1, float(x)) for k, x in enumerate(v)], "k int, v double"
        )
        w = (
            covf.join(F.broadcast(vdf), covf["j"] == vdf["k"])
            .groupBy("i")
            .agg(
                fq(
                    F.aggregate(
                        F.sort_array(
                            F.collect_list(F.col("cov") * F.col("v"))
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                ).alias("w")
            )
        )
        nn = w.agg(
            fq(
                F.sqrt(
                    F.aggregate(
                        F.sort_array(
                            F.collect_list(F.col("w") * F.col("w"))
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                )
            ).alias("nn")
        )
        nn_val = nn.collect()[0]["nn"]
        if nn_val is None or nn_val <= 0.0:
            # all-constant corpus → zero covariance → ‖Cv‖
            # quantizes to 0; fail loudly HERE instead of letting
            # w/0 propagate NaN/NULL into float() mid-iteration
            # (mirrors the module's DECIMAL(10,8) domain guard)
            raise ValueError(
                "power_iteration_pc1: ||Cv|| quantized to 0 — the "
                "covariance matrix is degenerate (constant or "
                "near-constant embeddings); PC1 is undefined"
            )
        rows = (
            w.crossJoin(F.broadcast(nn))
            .select("i", fq(F.col("w") / F.col("nn")).alias("v"))
            .collect()
        )
        nxt = [0.0] * d
        for r in rows:
            nxt[r["i"] - 1] = float(r["v"])
        v = nxt
    # sign convention: largest-|coordinate| positive, low index ties
    pivot = max(range(d), key=lambda k: (abs(v[k]), -k))
    if v[pivot] < 0:
        v = [-x for x in v]
    vdf = spark.createDataFrame(
        [(k + 1, float(x)) for k, x in enumerate(v)], "k int, v double"
    )
    vi = vdf.select(F.col("k").alias("i"), F.col("v").alias("_vi"))
    vj = vdf.select(F.col("k").alias("j"), F.col("v").alias("_vj"))
    lam = (
        covf.join(F.broadcast(vi), "i")
        .join(F.broadcast(vj), "j")
        .agg(
            fq(
                F.aggregate(
                    F.sort_array(
                        F.collect_list(
                            F.col("_vi") * F.col("cov") * F.col("_vj")
                        )
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ).alias("lam")
        )
        .collect()[0]["lam"]
    )
    return v, float(lam)

