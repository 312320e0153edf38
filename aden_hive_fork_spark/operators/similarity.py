"""Similarity search over embedding columns (SURVEY.md §2.D).

Three paths:

- cosine_topk_exact       — exact-decimal dot product, oracle-matchable
- cosine_topk_vectorized  — Arrow-batched numpy brute force (the
                            single-node throughput path)
- lsh_bucket_candidates   — random-hyperplane LSH bucketing (the
                            100 TB scale path: candidates per bucket,
                            then exact re-rank)
- ivf_*                   — inverted-file index (k-means coarse
                            quantizer, deterministic): train on a
                            bounded sample, assign corpus to cells,
                            probe the n nearest cells per query
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Exact-decimal dot product: float32 elements are widened to DOUBLE
# FIRST, then cast to DECIMAL(10,8), and summed exactly — the only
# floating-point steps are the final sqrt / divide, which are
# IEEE-deterministic on identical inputs.
#
# The double widening is load-bearing: a direct float→DECIMAL cast is
# NOT portable. DuckDB scales the value by 10^scale in FLOAT32
# arithmetic (7 significant digits — at 1e8 scale the low digits are
# garbage: observed 17/128 element mismatches vs Spark on real data),
# while Spark widens to double first. float→double is exact on both
# engines, and double→DECIMAL(10,8) agrees everywhere (verified over
# 128k elements at sf0.1: zero mismatches).
_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(CAST(x AS DOUBLE) AS DECIMAL(10,8))"
    " * CAST(CAST(y AS DOUBLE) AS DECIMAL(10,8))),"
    " CAST(0 AS DECIMAL(30,16)), (acc, v) -> CAST(acc + v AS DECIMAL(30,16)))"
)
_NORM2 = (
    "aggregate(transform({a}, x -> CAST(CAST(x AS DOUBLE) AS DECIMAL(10,8))"
    " * CAST(CAST(x AS DOUBLE) AS DECIMAL(10,8))),"
    " CAST(0 AS DECIMAL(30,16)), (acc, v) -> CAST(acc + v AS DECIMAL(30,16)))"
)


def stable_round6(col):
    """Engine-stable 6-decimal quantization: FLOOR(x*1e6 + 0.5)/1e6.

    ROUND(double, 6) is NOT portable at half-boundaries — Spark rounds
    the exact binary expansion (BigDecimal HALF_UP) while DuckDB
    multiplies and rounds, and a 1-ulp difference in which side of
    .xxxxxx5 the double sits flips the 6th digit (observed on 4 of 840
    cosine pairs at sf0.1). FLOOR(x*1e6 + 0.5) is pure IEEE multiply/
    add/floor — bit-identical on both engines for identical inputs.
    The SQL twin is ``FLOOR(x * 1000000 + 0.5) / 1000000``.
    """
    from pyspark.sql import functions as F

    return (F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)).cast(
        "double"
    )


def cosine_topk_exact(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of one stored vector.

    The 1-row query side is broadcast; scoring is a map-only pass over
    the corpus and top-k compiles to TakeOrderedAndProject — at scale
    this is one full scan, no shuffle.
    """
    q = (
        emb.filter(F.col(id_col) == query_id)
        .select(F.col(vec_col).alias("q_vec"))
        .limit(1)
    )
    dot = F.expr(_DOT.format(a=vec_col, b="q_vec"))
    n_v = F.expr(_NORM2.format(a=vec_col))
    n_q = F.expr(_NORM2.format(a="q_vec"))
    cosine = stable_round6(
        dot.cast("double")
        / F.nullif(F.sqrt(n_v.cast("double")) * F.sqrt(n_q.cast("double")), F.lit(0.0))
    )
    return (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != query_id)
        .select(F.col(id_col), cosine.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def cosine_topk_vectorized(
    emb: DataFrame,
    query_vecs: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k for a batch of query vectors via mapInPandas.

    The query matrix ships to every task (small — it's the broadcast
    side by construction); each Arrow batch of corpus vectors is scored
    against all queries with one BLAS matmul, and only each partition's
    local top-k survives before the final global top-k. This is the
    throughput baseline the IVF/LSH path is measured against.
    """
    import numpy as np

    q_ids = [int(i) for i, _ in query_vecs]
    q_mat = np.asarray([v for _, v in query_vecs], dtype=np.float64)
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    spark = emb.sparkSession
    b_q = spark.sparkContext.broadcast((q_ids, q_norm))

    out_schema = "query_id long, vec_id long, cosine double"

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, qn = b_q.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = (mat / norms) @ qn.T  # (batch, n_queries)
            row_ids = pdf[id_col].to_numpy()
            frames = []
            for qi, qid in enumerate(ids):
                # Mask the query's own corpus row BEFORE the local
                # top-k, else the self-match (cosine 1.0) occupies a
                # slot and the true k-th neighbor can be dropped
                # depending on partitioning.
                col = sims[:, qi].copy()
                col[row_ids == qid] = -np.inf
                top = min(k, col.shape[0])
                idx = np.argpartition(-col, top - 1)[:top]
                idx = idx[np.isfinite(col[idx])]
                if idx.size == 0:
                    continue
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "vec_id": row_ids[idx],
                            "cosine": np.round(col[idx], 6),
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    scored = emb.select(id_col, vec_col).mapInPandas(score, schema=out_schema)
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
        .orderBy("query_id", F.desc("cosine"), "vec_id")
    )


def cosine_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    block_col: str | None = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within blocks.

    Grouped-map applyInPandas: each block (e.g. cluster label, or an
    LSH bucket from lsh_bucket_candidates) computes its pairwise
    cosine matrix with one numpy matmul and emits pairs >= threshold.
    The block is the unit of shuffle — at 100 TB you block first
    (LSH/metadata) precisely so no group is ever large.
    """
    import numpy as np

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        ids = pdf[id_col].to_numpy()
        mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (mat / norms) @ (mat / norms).T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= threshold
        a, b = ids[ia[keep]], ids[ib[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame(
            {"id_a": lo, "id_b": hi, "cosine": np.round(sims[ia[keep], ib[keep]], 6)}
        )

    # grouping by a literal expression trips an internal error in
    # Spark 4.1 flatMapGroupsInPandas; materialize the constant
    # block as a column instead (single global Gram block)
    if block_col is None:
        emb = emb.withColumn("_blk", F.lit(1))
        block_col = "_blk"
    grouped = emb.groupBy(block_col)
    return grouped.applyInPandas(pairs, schema="id_a long, id_b long, cosine double").orderBy(
        F.desc("cosine"), "id_a", "id_b"
    )


def ann_topk(
    emb: DataFrame,
    query_vecs: list[tuple[int, list[float]]],
    k: int = 10,
    num_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed ANN: route each query to its hyperplane bucket,
    exact-rerank only that bucket's candidates.

    The scale path: the corpus is bucketed once (and would be WRITTEN
    bucketed at 100 TB, making this a pruned scan instead of a full
    one); each query touches ~1/2^planes of the data. Recall is
    tunable via num_planes (fewer planes → bigger buckets → higher
    recall, more compute) or multi-probe."""
    import numpy as np

    rng = np.random.RandomState(seed)
    dim = len(query_vecs[0][1])
    planes = rng.standard_normal((num_planes, dim))

    def bucket_of(vec: list[float]) -> int:
        signs = (np.asarray(vec, dtype=np.float64) @ planes.T) > 0
        return int(signs.dot(1 << np.arange(num_planes)))

    buckets = lsh_bucket_candidates(
        emb, num_planes=num_planes, seed=seed, id_col=id_col, vec_col=vec_col
    )
    corpus = emb.join(buckets, id_col)
    spark = emb.sparkSession
    q_rows = [(qid, vec, bucket_of(vec)) for qid, vec in query_vecs]
    q_df = spark.createDataFrame(
        q_rows, f"query_id long, q_vec array<double>, bucket long"
    )
    joined = corpus.join(F.broadcast(q_df), "bucket").filter(
        F.col(id_col) != F.col("query_id")
    )
    dot = F.expr(
        f"aggregate(zip_with({vec_col}, q_vec, (x, y) -> CAST(x AS DOUBLE) * y),"
        " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    n_v = F.expr(
        f"sqrt(aggregate(transform({vec_col}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
        " CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
    )
    n_q = F.expr(
        "sqrt(aggregate(transform(q_vec, x -> x * x),"
        " CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
    )
    cosine = F.round(dot / F.nullif(n_v * n_q, F.lit(0.0)), 6)
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        joined.select("query_id", F.col(id_col), cosine.alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
        .orderBy("query_id", F.desc("cosine"), id_col)
    )


def lsh_bucket_candidates(
    emb: DataFrame,
    num_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane (sign) LSH bucket id per vector.

    Deterministic planes derived from the seed. Vectors sharing a
    bucket are ANN candidates: at 100 TB, the bucket id becomes the
    shuffle/bucketing key so candidate generation is a co-located
    join instead of an all-pairs scan. Re-rank candidates with
    cosine_topk_* for exact scores.
    """
    import numpy as np

    rng = np.random.RandomState(seed)
    dim = len(emb.select(vec_col).first()[0])
    planes = rng.standard_normal((num_planes, dim))
    spark = emb.sparkSession
    b_planes = spark.sparkContext.broadcast(planes)

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pl = b_planes.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            signs = (mat @ pl.T) > 0  # (n, planes)
            bucket = signs.dot(1 << np.arange(pl.shape[0])).astype(np.int64)
            yield pd.DataFrame({id_col: pdf[id_col], "bucket": bucket})

    return emb.select(id_col, vec_col).mapInPandas(
        bucketize, schema=f"{id_col} long, bucket long"
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the classic coarse-quantizer scale path
# (cf. Faiss IVFFlat; public algorithm). Training is driver-side
# spherical k-means over a BOUNDED deterministic sample (independent of
# corpus size), assignment and search are distributed.
# ---------------------------------------------------------------------------
def ivf_train_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    n_iter: int = 10,
    sample_limit: int = 10_000,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Spherical k-means centroids from a deterministic sample.

    The sample is the ``sample_limit`` lowest-id vectors (stable under
    re-partitioning, unlike ``df.sample``), so training cost is bounded
    at any corpus scale. Init is a seeded choice without replacement;
    an empty cell re-seeds to the point farthest from its centroid —
    every step is deterministic for a fixed (data, seed).

    Returns a unit-normalized ``numpy.ndarray`` of shape
    (n_centroids, dim).
    """
    import numpy as np

    rows = emb.select(id_col, vec_col).orderBy(id_col).limit(sample_limit).collect()
    X = np.vstack([r[vec_col] for r in rows]).astype(np.float64)
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    X = X / norms

    rng = np.random.RandomState(seed)
    n_centroids = min(n_centroids, len(X))
    C = X[rng.choice(len(X), n_centroids, replace=False)].copy()
    for _ in range(n_iter):
        sims = X @ C.T  # (n, k) — cosine, everything unit-norm
        assign = np.argmax(sims, axis=1)
        for c in range(n_centroids):
            members = X[assign == c]
            if len(members) == 0:
                # re-seed deterministically: the globally worst-served point
                C[c] = X[np.argmin(np.max(sims, axis=1))]
            else:
                mean = members.mean(axis=0)
                n = np.linalg.norm(mean)
                C[c] = mean / n if n > 0 else C[c]
    return C


def ivf_assign(
    emb: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell) assignment: argmax cosine against the broadcast
    centroid matrix, one BLAS matmul per Arrow batch.

    At 100 TB the corpus is *written* partitioned by ``cell`` — a
    probe then scans only n_probe/n_centroids of the data.
    """
    import numpy as np

    spark = emb.sparkSession
    b_c = spark.sparkContext.broadcast(np.asarray(centroids, dtype=np.float64))

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = b_c.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            n = np.linalg.norm(mat, axis=1, keepdims=True)
            n[n == 0] = 1.0
            cell = np.argmax((mat / n) @ C.T, axis=1).astype(np.int64)
            yield pd.DataFrame({id_col: pdf[id_col], "cell": cell})

    return emb.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} long, cell long"
    )


def ivf_topk(
    emb: DataFrame,
    query_vecs: list[tuple[int, list[float]]],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: probe the ``n_probe`` nearest cells per query,
    exact double-precision re-rank inside the probed cells.

    Each corpus vector lives in exactly one cell, so probes never
    produce duplicate candidates. Recall is tuned by
    n_probe/n_centroids; n_probe = n_centroids degrades gracefully to
    exact brute force. The probe join is a broadcast of the (tiny)
    query×probe table against the cell-partitioned corpus.
    """
    import numpy as np

    C = ivf_train_centroids(
        emb, n_centroids=n_centroids, seed=seed, id_col=id_col, vec_col=vec_col
    )
    corpus = emb.join(ivf_assign(emb, C, id_col=id_col, vec_col=vec_col), id_col)

    spark = emb.sparkSession
    q_rows = []
    for qid, vec in query_vecs:
        v = np.asarray(vec, dtype=np.float64)
        n = np.linalg.norm(v)
        v = v / n if n > 0 else v
        probes = np.argsort(-(C @ v))[: min(n_probe, len(C))]
        for cell in probes:
            q_rows.append((int(qid), [float(x) for x in vec], int(cell)))
    q_df = spark.createDataFrame(
        q_rows, "query_id long, q_vec array<double>, cell long"
    )

    joined = corpus.join(F.broadcast(q_df), "cell").filter(
        F.col(id_col) != F.col("query_id")
    )
    dot = F.expr(
        f"aggregate(zip_with({vec_col}, q_vec, (x, y) -> CAST(x AS DOUBLE) * y),"
        " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    n_v = F.expr(
        f"sqrt(aggregate(transform({vec_col}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
        " CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
    )
    n_q = F.expr(
        "sqrt(aggregate(transform(q_vec, x -> x * x),"
        " CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
    )
    cosine = F.round(dot / F.nullif(n_v * n_q, F.lit(0.0)), 6)
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        joined.select("query_id", F.col(id_col), cosine.alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
        .orderBy("query_id", F.desc("cosine"), id_col)
    )


# ---------------------------------------------------------------------------
# int8 scalar quantization — the storage/bandwidth tier for 100 TB
# similarity: unit-normalize, quantize each component to int8, search
# by INTEGER dot product (≈ cosine × 127²). 4× smaller vectors, exact
# integer arithmetic in the hot loop (no float reduction-order issues
# — which is also what makes the ranking oracle-checkable), and a
# float rerank only for the shortlist if exact scores are needed.
# ---------------------------------------------------------------------------
def quantize_embeddings(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, qvec array<int>): round(127 * v / ||v||) per component.

    Arrow-batched numpy kernel (round 11; was JVM transform/aggregate
    HOFs — which do NOT whole-stage-codegen and evaluated ~0.4 ms/row
    interpreted, 18.6 s for one 50k-row pass at the ×10 stress
    scale). The kernel replays the HOF arithmetic bit-for-bit: the
    norm accumulates SEQUENTIALLY over dimensions (a Python loop of
    vectorized column ops — numpy's pairwise ``sum`` would change the
    IEEE sequence and could flip a .5-boundary round), the scaled
    component is the same (127·x)/nrm float64 expression, and the
    round is HALF-AWAY (Spark ROUND) via copysign(floor(abs+0.5)).
    ``quantize_embeddings_hof`` keeps the original expression form;
    a differential test pins kernel == HOF exactly.

    At 100 TB this is the WRITE-side pass that shrinks the ANN
    working set 4× (int8 vs float32) before bucketed search. An
    all-zero embedding has no direction, so it quantizes to the
    all-zero qvec; NULL embeddings stay NULL."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame({"id": [], "qvec": []})
                continue
            vals = pdf[vec_col]
            mask = vals.notna().to_numpy()
            out: list = [None] * len(pdf)
            if mask.any():
                mat = np.vstack(
                    vals[mask].to_numpy()
                ).astype(np.float64)
                acc = np.zeros(mat.shape[0], dtype=np.float64)
                for d in range(mat.shape[1]):  # sequential: HOF fold
                    x = mat[:, d]
                    acc = acc + x * x
                nrm = np.sqrt(acc)
                with np.errstate(divide="ignore", invalid="ignore"):
                    r = (127.0 * mat) / nrm[:, None]
                q = np.copysign(np.floor(np.abs(r) + 0.5), r)
                # Exact replay of Spark's F.round on DOUBLE (HALF_UP
                # on the shortest-decimal BigDecimal.valueOf repr):
                # floor(abs+0.5) disagrees within ~1 ulp of a .5
                # boundary (e.g. r=0.49999999999999994, where r+0.5
                # IEEE-rounds UP to 1.0 but the decimal HALF_UP of r
                # is 0). Route those few elements through Decimal —
                # Python repr() is the same shortest round-trip
                # decimal as Java's Double.toString.
                frac = np.abs(r) - np.floor(np.abs(r))
                susp = np.isfinite(r) & (np.abs(frac - 0.5) < 1e-9)
                if susp.any():
                    from decimal import ROUND_HALF_UP, Decimal

                    one = Decimal(1)
                    for i, j in zip(*np.nonzero(susp)):
                        q[i, j] = float(
                            Decimal(repr(float(r[i, j]))).quantize(
                                one, rounding=ROUND_HALF_UP
                            )
                        )
                q[nrm == 0.0, :] = 0.0
                qi = q.astype(np.int32)
                for pos, row in zip(np.nonzero(mask)[0], qi):
                    out[pos] = row
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "qvec": pd.Series(out, dtype="object"),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        run, schema="id long, qvec array<int>"
    )


def quantize_embeddings_hof(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """The original JVM higher-order-function form of
    :func:`quantize_embeddings` — kept as the differential-test
    reference (HOFs evaluate interpreted, so the Arrow kernel is the
    production path)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    nrm = F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    q = F.transform(
        F.col(vec_col),
        lambda x: F.when(nrm > 0.0, F.round(F.lit(127.0) * x.cast("double") / nrm))
        .otherwise(F.lit(0.0))
        .cast("int"),
    )
    return emb.select(F.col(id_col).alias("id"), q.alias("qvec"))


def quantized_dot_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k candidates per query vector by int8-quantized dot product.

    The quantized corpus is broadcast-joined against the (tiny)
    quantized query set and scored with an INTEGER zip_with/aggregate
    — deterministic to the bit, so ranking never depends on float
    summation order. Returns (query_id, id, qdot, rank)."""
    from pyspark.sql.window import Window

    q = quantize_embeddings(emb, id_col, vec_col)
    queries = q.filter(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"), F.col("qvec").alias("qv")
    )
    cands = q.filter(~F.col("id").isin(query_ids))
    dot = F.aggregate(
        F.zip_with("qvec", "qv", lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qdot"), F.asc("id"))
    return (
        cands.crossJoin(F.broadcast(queries))
        .select("query_id", "id", dot.alias("qdot"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "qdot", F.col("rank").cast("int").alias("rank"))
        .orderBy("query_id", "rank")
    )


def mmr_rerank(
    candidates: DataFrame,
    k: int = 5,
    lam: float = 0.5,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_col: str = "score",
    ndigits: int = 6,
    normalize: bool = True,
) -> DataFrame:
    """Maximal Marginal Relevance diversification of a per-query
    candidate set: greedily pick argmax of

        lam·relevance − (1−lam)·max_sim(candidate, selected)

    — the standard redundancy-suppressing re-rank over an ANN
    shortlist (run it AFTER cosine_topk/ann_topk/ivf_topk, on the
    few-dozen survivors; the greedy loop is O(k·|candidates|) per
    query over data that already fits a task).

    ``normalize=True`` (default): sim = cosine (unit-normalized dot).
    ``normalize=False``: sim = RAW dot product — the MIPS variant for
    pre-normalized or quantized vectors. With integer-valued vectors
    (e.g. the int8 ``quantize_embeddings`` tier) every dot and every
    greedy comparison is exact integer arithmetic in float64 (all
    partials < 2^53), so the selection is bit-deterministic and
    oracle-replayable — q228 unrolls it as SQL CTEs under the hash
    gate.

    ``applyInPandas`` per query group — the shuffle is keyed by
    query, each group is shortlist-sized. Deterministic: scores and
    similarities are rounded to ``ndigits`` before argmax and ties
    break on ascending id, so the selection is partition- and
    platform-stable. Returns (query, rank 1..k, id, mmr_score).
    """
    import numpy as np
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    # inherit the input's id/query column types — ids need not be
    # integers for the rerank to work
    out_schema = StructType(
        [
            candidates.schema[query_col],
            StructField("mmr_rank", IntegerType()),
            candidates.schema[id_col],
            StructField("mmr_score", DoubleType()),
        ]
    )

    def rerank(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        mat = np.array(pdf[vec_col].tolist(), dtype="float64")
        if normalize:
            nrm = np.linalg.norm(mat, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            unit = mat / nrm
        else:
            unit = mat
        sims = np.round(unit @ unit.T, ndigits)
        rel = np.round(pdf[score_col].to_numpy(dtype="float64"), ndigits)
        ids = pdf[id_col].to_numpy()
        n = len(pdf)
        picked: list[int] = []
        rows = []
        avail = np.ones(n, dtype=bool)
        for rank in range(1, min(k, n) + 1):
            if picked:
                red = sims[:, picked].max(axis=1)
            else:
                red = np.zeros(n)
            mmr = np.round(lam * rel - (1.0 - lam) * red, ndigits)
            mmr_masked = np.where(avail, mmr, -np.inf)
            best = int(np.argmax(mmr_masked))  # ties → lowest index = lowest id
            picked.append(best)
            avail[best] = False
            rows.append(
                (
                    pdf[query_col].iloc[0],
                    rank,
                    ids[best],
                    float(mmr[best]),
                )
            )
        return pd.DataFrame(
            rows, columns=[query_col, "mmr_rank", id_col, "mmr_score"]
        )

    return candidates.groupBy(query_col).applyInPandas(rerank, out_schema)


# ---------------------------------------------------------------------------
# md5-derived deterministic ANN tiers — the engine-replayable twins of
# the seeded LSH (ann_topk) and k-means IVF (ivf_topk) paths. Both
# derive ALL randomness from md5 of small printable strings, so an
# independent SQL engine reproduces the index bit-for-bit, and both
# score in int8-quantized INTEGER arithmetic (quantize_embeddings), so
# ranking never depends on float summation order. Reference parity:
# the vector-search surface of tools/src/aden_tools/tools (vision /
# search tools expose top-k retrieval); the scale shape is standard
# IVF/LSH (Johnson et al., "Billion-scale similarity search").
# ---------------------------------------------------------------------------
def _md5_plane_signs(tag: str, dim: int) -> list[int]:
    """±1 hyperplane components from the SAME hash family the oracle
    uses: sign = +1 iff the first hex digit of md5("<tag>:<i>") is
    < '8' (an unbiased coin). Computed driver-side (dim values per
    plane — index metadata, not data)."""
    import hashlib

    return [
        1 if hashlib.md5(f"{tag}:{i}".encode()).hexdigest()[0] < "8" else -1
        for i in range(dim)
    ]


def ann_md5_buckets(
    emb: DataFrame,
    num_tables: int = 8,
    num_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, qvec, bucket): multi-table sign-hyperplane LSH over the
    int8-quantized vector — ``num_tables`` independent hash tables of
    ``num_planes`` md5-derived ±1 planes each ("t:j" namespace), one
    output row per (vector, table). bucket = "<t>|<bit-string>" of
    sign(plane · qvec). Multiple OR'd tables are what lift recall: a
    neighbor is found if it shares ANY table's bucket (classic LSH
    amplification). At 100 TB this is the WRITE-side pass; search
    touches only the query's buckets.

    Arrow kernel (r12): ONE exact int64 matrix product against the
    (tables·planes, dim) sign matrix; sign(dot) on integers replays
    the expression form bit for bit, and a NULL (or NULL-element)
    qvec yields all-"0" bit strings exactly like ``when(NULL >= 0)``
    falling to the otherwise branch. Honest A/B vs the expression
    form (``ann_md5_buckets_hof``, kept as the differential
    reference): STEADY-STATE the JVM folds are slightly faster (50k
    vectors: 1.06 s vs 1.45 s noop — a single bounded fold per row
    is fine interpreted), but the 32 aggregate trees over 64-element
    literal arrays cost ~3 s of Catalyst ANALYSIS per query
    construction (the round-9 literal-tree rule), which every
    invocation pays: q238 end-to-end 4.35 s (HOF) vs 1.45 s
    (kernel). The kernel's O(1)-size plan wins per invocation."""
    import numpy as np

    q = quantize_embeddings(emb, id_col, vec_col)
    signs = np.array(
        [
            _md5_plane_signs(f"{t}:{j}", dim)
            for t in range(num_tables)
            for j in range(num_planes)
        ],
        dtype=np.int64,
    )
    # vectorized bucket-string build: per table the plane bits pack
    # into an integer code indexing a 2^planes lookup table of bit
    # strings — no per-row Python loop
    lut = np.array(
        [
            "|" + format(c, f"0{num_planes}b")
            for c in range(1 << num_planes)
        ]
    )
    pows = (1 << np.arange(num_planes - 1, -1, -1)).astype(np.int64)
    tpre = np.array([str(t) for t in range(num_tables)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame({"id": [], "qvec": [], "bucket": []})
                continue
            vals = pdf["qvec"]
            ids = pdf["id"].to_numpy()
            # NULL-element lists arrive from Arrow as NaN floats, not
            # None — catch both (e != e is the NaN test), so a null
            # element yields the all-"0" buckets the HOF form's
            # when(NULL >= 0) fallthrough produces
            mask = np.array(
                [
                    v is not None
                    and not any(e is None or e != e for e in v)
                    for v in vals
                ],
                dtype=bool,
            )
            n = len(pdf)
            codes = np.zeros((n, num_tables), dtype=np.int64)
            if mask.any():
                mat = np.vstack(vals[mask].to_numpy()).astype(np.int64)
                bits = (mat @ signs.T) >= 0
                codes[mask] = bits.reshape(
                    -1, num_tables, num_planes
                ) @ pows
            bucket = np.char.add(
                np.broadcast_to(tpre, (n, num_tables)),
                lut[codes],
            ).ravel()
            yield pd.DataFrame(
                {
                    "id": np.repeat(ids, num_tables),
                    "qvec": pd.Series(
                        np.repeat(vals.to_numpy(), num_tables),
                        dtype="object",
                    ),
                    "bucket": bucket,
                }
            )

    return q.mapInPandas(
        run, schema="id long, qvec array<int>, bucket string"
    )


def ann_md5_buckets_hof(
    emb: DataFrame,
    num_tables: int = 8,
    num_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The original JVM expression form of :func:`ann_md5_buckets` —
    kept as the differential-test reference (its per-invocation
    Catalyst analysis of 32 literal-array aggregate trees is the
    slow path; see the kernel docstring for the A/B)."""
    q = quantize_embeddings(emb, id_col, vec_col)
    buckets = []
    for t in range(num_tables):
        bits = []
        for j in range(num_planes):
            sgn = F.array(
                *[F.lit(s) for s in _md5_plane_signs(f"{t}:{j}", dim)]
            )
            dot_j = F.aggregate(
                F.zip_with("qvec", sgn, lambda a, b: (a * b).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(dot_j >= 0, F.lit("1")).otherwise(F.lit("0")))
        buckets.append(F.concat(F.lit(f"{t}|"), *bits))
    return q.select(
        "id", "qvec", F.explode(F.array(*buckets)).alias("bucket")
    )


def ann_md5_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    num_tables: int = 8,
    num_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucketed ANN top-k, deterministic end-to-end: multi-table md5
    sign-plane LSH (ann_md5_buckets) routes each query to its buckets,
    colliding (query, candidate) pairs are deduplicated ACROSS tables
    with a keyed aggregate (not an array-valued distinct), and an
    exact INTEGER-dot rerank ranks them. Candidate generation never
    leaves the buckets — no all-pairs path. Returns
    (query_id, id, qdot, rank)."""
    from pyspark.sql.window import Window

    # b feeds BOTH join sides; materialize the bucket table once
    # (docs × num_tables rows of (id, qvec, bucket) — bounded) so the
    # quantize + bucket kernel doesn't run per consumer (r12)
    b = ann_md5_buckets(
        emb, num_tables, num_planes, dim, id_col, vec_col
    ).localCheckpoint(eager=True)
    queries = b.filter(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"),
        F.col("qvec").alias("qv"),
        "bucket",
    )
    cands = b.filter(~F.col("id").isin(query_ids))
    dot = F.aggregate(
        F.zip_with("qvec", "qv", lambda a, b_: (a * b_).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qdot"), F.asc("id"))
    return (
        cands.join(F.broadcast(queries), "bucket")
        .select("query_id", "id", dot.alias("qdot"))
        # a pair colliding in several tables scores identically each
        # time — max() collapses the duplicates without comparing
        # array columns
        .groupBy("query_id", "id")
        .agg(F.max("qdot").alias("qdot"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "id", "qdot", F.col("rank").cast("int").alias("rank")
        )
        .orderBy("query_id", "rank")
    )


def ivf_md5_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    num_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic IVF: the coarse quantizer's centroids are the
    ``num_cells`` corpus vectors with the lexicographically smallest
    md5(id) — an md5-keyed uniform random sample, the classic
    "centroids from a random sample" IVF bootstrap (no Lloyd
    refinement, so an independent engine replays it exactly). Cell
    assignment = argmax INTEGER dot(qvec, seed qvec), ties to the
    smaller seed id; queries probe their ``n_probe`` best cells and
    rerank only those cells' members. Returns
    (query_id, id, qdot, rank).

    Scale shape: seeds are ``num_cells`` rows (driver-safe collect);
    assignment is a broadcast join + per-id argmax; the probe join
    touches only probed cells. The corpus never self-joins."""
    from pyspark.sql.window import Window

    # materialized ONCE (SCALING §29): the seed cross-join evaluates
    # qvec num_cells times per row
    q = quantize_embeddings(emb, id_col, vec_col).localCheckpoint(
        eager=True
    )
    seeds = (
        q.withColumn("h", F.md5(F.col("id").cast("string")))
        .orderBy("h", "id")
        .limit(num_cells)
        .select(F.col("id").alias("seed_id"), F.col("qvec").alias("seed_qvec"))
    )
    dot_seed = F.aggregate(
        F.zip_with("qvec", "seed_qvec", lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = q.crossJoin(F.broadcast(seeds)).select(
        "id", "qvec", "seed_id", dot_seed.alias("sdot")
    )
    # NOTE (r13): this site keeps the row_number form. The min-struct
    # argmax used at the other three assignment sites was A/B'd here
    # and LOST (q239 1.01 -> 1.32 s): `assigned` must carry the qvec
    # payload, and hauling the 64-int array through the min-struct
    # aggregation buffer costs more than the window's sort.
    w_assign = Window.partitionBy("id").orderBy(
        F.desc("sdot"), F.asc("seed_id")
    )
    assigned = (
        scored.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("id", "qvec", F.col("seed_id").alias("cell"))
    )
    probes = (
        scored.filter(F.col("id").isin(query_ids))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") <= n_probe)
        .select(
            F.col("id").alias("query_id"),
            F.col("qvec").alias("qv"),
            F.col("seed_id").alias("cell"),
        )
    )
    cands = assigned.filter(~F.col("id").isin(query_ids))
    dot = F.aggregate(
        F.zip_with("qvec", "qv", lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qdot"), F.asc("id"))
    return (
        cands.join(F.broadcast(probes), "cell")
        .select("query_id", "id", dot.alias("qdot"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "id", "qdot", F.col("rank").cast("int").alias("rank")
        )
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# exact-integer vectorized tiers (round 7): the q51/q52/q53 family
# moved INSIDE the value-hash gate. Shared arithmetic contract:
# every component quantizes to X = HALF_UP(x·1e8) — BigDecimal
# HALF_UP on a float32-sourced double is exactly sign·floor(|x·1e8|
# + 0.5) in float64 (x·1e8 needs ≤43 mantissa bits; see
# operators/pca.py) — and every cosine is the fixed IEEE sequence
#     FLOOR( D/(sqrt(NA)·sqrt(NB)) · 1e6 + 0.5 ) / 1e6
# over the EXACT int64 sums D = ΣX_aX_b, NA = ΣX_a², NB = ΣX_b²
# (scale factors cancel), each converted to double by ONE correctly-
# rounded cast — so numpy, Spark SQL, and DuckDB produce the same
# bits.
# ---------------------------------------------------------------------------
def _quantize_i64(mat):
    """float64 (from float32) matrix → HALF_UP(x·1e8) int64, with the
    overflow guard that keeps int64 dot products exact."""
    import numpy as np

    xq = (np.sign(mat) * np.floor(np.abs(mat) * 1e8 + 0.5)).astype(np.int64)
    mx = int(np.abs(xq).max()) if xq.size else 0
    if mx and mx * mx * mat.shape[1] >= 2 ** 63:
        raise ValueError(
            "exact-integer cosine: |component| too large for int64 dot "
            "products — L2-normalize the embeddings first"
        )
    return xq


def _qcos(d, na, nq):
    """The shared quantized-cosine IEEE sequence (numpy arrays)."""
    import numpy as np

    denom = np.sqrt(na.astype(np.float64)) * np.sqrt(nq.astype(np.float64))
    with np.errstate(divide="ignore", invalid="ignore"):
        c = d.astype(np.float64) / denom
    c = np.where(denom == 0, -np.inf, c)
    return np.floor(c * 1e6 + 0.5) / 1e6


def cosine_topk_vectorized_exact(
    emb: DataFrame,
    query_vecs: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hash-gated twin of :func:`cosine_topk_vectorized`: the same
    Arrow-batched BLAS-shape batch scorer (one integer matmul per
    batch against the broadcast query matrix, partition-local top-k,
    global top-k merge), but over exact int64 dot products with the
    quantized-cosine contract above — so a DuckDB decimal replay
    hash-matches. Ranking happens on the QUANTIZED value (vec_id
    tie-break), the order the oracle's window uses."""
    import numpy as np

    q_ids = [int(i) for i, _ in query_vecs]
    q_mat = _quantize_i64(
        np.asarray([v for _, v in query_vecs], dtype=np.float64)
    )
    q_norm2 = (q_mat * q_mat).sum(axis=1)  # int64-safe per _quantize_i64
    spark = emb.sparkSession
    b_q = spark.sparkContext.broadcast((q_ids, q_mat, q_norm2))

    out_schema = "query_id long, vec_id long, cosine double"

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        ids, qm, qn2 = b_q.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = _quantize_i64(
                np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            )
            d = mat @ qm.T  # int64 exact: |X| ≤ 1e8ish, dim-bounded
            na = (mat * mat).sum(axis=1)
            row_ids = pdf[id_col].to_numpy()
            frames = []
            for qi, qid in enumerate(ids):
                c = _qcos(d[:, qi], na, np.full(len(na), qn2[qi]))
                c[row_ids == qid] = -np.inf
                keep = np.isfinite(c)
                if not keep.any():
                    continue
                order = np.lexsort((row_ids[keep], -c[keep]))[:k]
                frames.append(pd.DataFrame({
                    "query_id": qid,
                    "vec_id": row_ids[keep][order],
                    "cosine": c[keep][order],
                }))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    scored = emb.select(id_col, vec_col).mapInPandas(score, schema=out_schema)
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
        .orderBy("query_id", F.desc("cosine"), "vec_id")
    )


def cosine_neardup_pairs_exact(
    emb: DataFrame,
    threshold: float,
    block_col: str | None = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hash-gated twin of :func:`cosine_neardup_pairs`: the same
    grouped-map blocked pairwise scorer (block = unit of shuffle),
    with int64 Gram matrices and the quantized-cosine contract, so
    the threshold compares the SAME number the DuckDB oracle
    computes. The trailing orderBy is presentation-only; composition
    callers that only consume the pair SET (SemDeDup's connected
    components) should call
    :func:`cosine_neardup_pairs_exact_unsorted` and skip the global
    sort."""
    return cosine_neardup_pairs_exact_unsorted(
        emb, threshold, block_col, id_col, vec_col
    ).orderBy(F.desc("cosine"), "id_a", "id_b")


def cosine_neardup_pairs_exact_unsorted(
    emb: DataFrame,
    threshold: float,
    block_col: str | None = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """:func:`cosine_neardup_pairs_exact` without the trailing global
    orderBy — same rows, unspecified order. Internal scorer for
    composition sites (SemDeDup) that feed the pairs straight into a
    set-semantics consumer."""
    import numpy as np

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": [], "id_b": [], "cosine": []}
        ).astype({"id_a": "int64", "id_b": "int64", "cosine": "float64"})
        if len(pdf) < 2:
            return empty
        ids = pdf[id_col].to_numpy()
        mat = _quantize_i64(
            np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
        )
        d = mat @ mat.T
        na = (mat * mat).sum(axis=1)
        ia, ib = np.triu_indices(len(ids), k=1)
        c = _qcos(d[ia, ib], na[ia], na[ib])
        keep = np.isfinite(c) & (c >= threshold)
        if not keep.any():
            return empty
        a, b = ids[ia[keep]], ids[ib[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": c[keep]})

    # grouping by a literal expression trips an internal error in
    # Spark 4.1 flatMapGroupsInPandas; materialize the constant
    # block as a column instead (single global Gram block)
    if block_col is None:
        emb = emb.withColumn("_blk", F.lit(1))
        block_col = "_blk"
    grouped = emb.groupBy(block_col)
    return grouped.applyInPandas(
        pairs, schema="id_a long, id_b long, cosine double"
    )


def lsh_buckets_md5(
    emb: DataFrame,
    num_planes: int = 10,
    salt: str = "lsh52",
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hash-gated random-hyperplane LSH bucketing: plane weights are
    md5-derived integers w(p,k) = md5_32('salt|p|k') % 2001 − 1000
    (DuckDB-replayable, the ann_md5_buckets convention), the per-
    plane scores are exact int64 dots of the 1e-8-quantized
    components, and the bucket id packs the sign bits. Entirely
    MAP-SIDE per row (literal weight arrays folded with zip_with —
    no posexplode, no join): the only shuffle is whatever the caller
    aggregates buckets by. Returns (id_col, bucket)."""
    import hashlib

    if dim is None:
        dim = int(
            emb.filter(F.col(vec_col).isNotNull())
            .agg(F.max(F.size(vec_col)))
            .collect()[0][0]
        )
    xq = (
        f"transform({vec_col}, x -> CAST(CAST(CAST(x AS DOUBLE) AS "
        f"DECIMAL(10,8)) * 100000000 AS LONG))"
    )
    rows = emb.filter(F.col(vec_col).isNotNull()).select(
        id_col, F.expr(xq).alias("_xq")
    )
    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        w = [
            int(
                hashlib.md5(f"{salt}|{p}|{k}".encode()).hexdigest()[:8], 16
            ) % 2001 - 1000
            for k in range(1, dim + 1)
        ]
        w_arr = F.array(*[F.lit(x).cast("long") for x in w])
        s = F.aggregate(
            F.zip_with(F.col("_xq"), w_arr, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(s > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return rows.select(id_col, bucket.alias("bucket"))


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN tier — the compression-based scale
# path (Jégou et al., "Product Quantization for Nearest Neighbor
# Search", TPAMI 2011): split the vector into m subspaces, code each
# subvector against a per-subspace codebook, search with asymmetric
# distance (ADC) lookups. A 64-dim float32 vector becomes m=8 bytes —
# a 32× memory cut, the difference between an in-memory and a
# spilled index at 100 TB.
#
# This tier uses md5-HASH-ORDER SAMPLED codebooks (the first k
# vectors by md5(salt||id) — exactly the kmeans c0 init) rather than
# Lloyd-refined ones, the same engine-replayable-twin discipline as
# ann_md5_topk/ivf_md5_topk: every distance is an exact integer on
# the DECIMAL(10,8)→×1e8 grid, so encode, ADC tables, and the final
# ranking all sit under the DuckDB value-hash gate. The production
# path refines the same codebooks with operators/kmeans (driver state
# is m·k·d_sub doubles — scale-independent), changing recall, not
# plumbing.
# ---------------------------------------------------------------------------


def _xq_expr(vec_col: str) -> str:
    return (
        f"transform({vec_col}, x -> CAST(CAST(CAST(x AS DOUBLE) AS "
        f"DECIMAL(10,8)) * 100000000 AS LONG))"
    )


def pq_codebooks_md5(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    salt: str = "pq",
) -> list[list[list[int]]]:
    """Sampled codebooks: the k hash-order vectors' subvectors, as
    exact ×1e8 integers. Returns ``codebooks[j][h] -> list[int]``
    (m × k × d_sub). Driver state is m·k·d_sub ints — the kmeans
    centroid-state discipline; ONE tiny job (k rows collected)."""
    rows = (
        emb.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("_id"), F.expr(_xq_expr(vec_col)).alias("_xq")
        )
        .orderBy(
            F.md5(F.concat(F.lit(salt), F.col("_id").cast("string"))).asc(),
            F.col("_id").asc(),
        )
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"need at least {k} vectors to sample codebooks")
    dim = len(rows[0]["_xq"])
    if dim % m != 0:
        raise ValueError(f"m={m} must divide dim={dim}")
    d_sub = dim // m
    return [
        [
            [int(v) for v in r["_xq"][j * d_sub : (j + 1) * d_sub]]
            for r in rows
        ]
        for j in range(m)
    ]


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): per subspace, the argmin-distance
    codebook entry (ties -> lowest code). The codebooks are literals,
    so encoding is ONE codegen-fused map pass — no join, no shuffle;
    the 100 TB write-side pass that shrinks the index m·8 bits/vector."""
    m = len(codebooks)
    k = len(codebooks[0])
    d_sub = len(codebooks[0][0])
    xq = F.expr(_xq_expr(vec_col))
    codes = []
    for j in range(m):
        sub = F.slice(xq, j * d_sub + 1, d_sub)
        dists = F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        sub,
                        F.array(
                            *[F.lit(int(c)).cast("long")
                              for c in codebooks[j][h]]
                        ),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, v: acc + v,
                )
                for h in range(k)
            ]
        )
        # first position of the min = lowest code on ties
        codes.append(
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        )
    return emb.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.array(*codes).alias("codes")
    )


def pq_adc_topk(
    emb: DataFrame,
    query_ids: list[int],
    k_nn: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    salt: str = "pq",
    codebooks: list[list[list[int]]] | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k: queries stay UNquantized; per query
    the m×k ADC table (exact integer distances query-subvector ->
    centroid) is computed driver-side (m·k ints) and the corpus pays
    m table LOOKUPS per vector — element_at into literal arrays, one
    codegen-fused pass over the ENCODED corpus, then a per-query
    top-k window. Returns (query_id, id, pq_dist, rank), rank by
    (pq_dist asc, id asc), self excluded."""
    from pyspark.sql.window import Window

    spark = emb.sparkSession
    if codebooks is None:
        codebooks = pq_codebooks_md5(emb, id_col, vec_col, m, k, salt)
    m, k = len(codebooks), len(codebooks[0])
    d_sub = len(codebooks[0][0])
    qrows = (
        emb.filter(F.col(id_col).isin([int(q) for q in query_ids]))
        .select(
            F.col(id_col).alias("_id"), F.expr(_xq_expr(vec_col)).alias("_xq")
        )
        .collect()
    )
    # Encode: runtime-HOF argmin over ONE broadcast codebook array
    # (r12; was posexplode -> broadcast join -> (id, j, h) aggregate
    # -> per-(id, j) window — two shuffles and a ×dim row explosion;
    # the literal/HOF form in pq_encode remains the write-side tier,
    # but at m·k=256 aggregate lambdas it costs seconds of Catalyst
    # analysis per action, which is why the codebooks ride as DATA
    # here). The lazy quantize expression is lineage-truncated first
    # so the per-(j, h) slices read a materialized array (SCALING
    # §29), not m·k norm-fold re-computations.
    xqf = (
        emb.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.expr(_xq_expr(vec_col)).alias("_xq"),
        )
        .localCheckpoint(eager=False)
    )
    codes = _pq_codes_kernel(xqf, "_xq", codebooks)
    qtab_rows = []
    for qr in qrows:
        qx = [int(v) for v in qr["_xq"]]
        for j in range(m):
            qsub = qx[j * d_sub : (j + 1) * d_sub]
            for h in range(k):
                t = sum(
                    (a - b) * (a - b)
                    for a, b in zip(qsub, codebooks[j][h])
                )
                qtab_rows.append((int(qr["_id"]), j, h, int(t)))
    qtab = F.broadcast(
        spark.createDataFrame(
            qtab_rows, "query_id long, j int, h int, t long"
        )
    )
    scored = (
        codes.join(qtab, ["j", "h"])
        .filter(F.col("id") != F.col("query_id"))
        .groupBy("query_id", "id")
        .agg(F.sum("t").cast("long").alias("pq_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("pq_dist"), F.asc("id")
    )
    return (
        scored.select(
            F.col("query_id").cast("bigint").alias("query_id"),
            F.col("id").cast("bigint").alias("id"),
            "pq_dist",
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k_nn)
        .orderBy("query_id", "rank")
    )


def pq_rerank_topk(
    emb: DataFrame,
    query_ids: list[int],
    k_nn: int = 10,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 16,
    k: int = 16,
    salt: str = "pq",
    codebooks: list[list[list[int]]] | None = None,
) -> DataFrame:
    """The production PQ pattern: ADC shortlists ``shortlist``
    candidates per query from the CODED corpus (m byte-lookups per
    vector), then only the shortlist pays the exact integer squared
    Euclidean distance (the ×1e8 grid) and the final top-k ranks by
    it — approximate pruning, exact ordering. Returns
    (query_id, id, dist, rank); rank by (dist asc, id asc).

    Scale: the corpus-wide pass touches m smallint codes per vector;
    the exact re-rank touches |queries|·shortlist rows — independent
    of corpus size. Recall is governed by the shortlist width (the
    PQ-paper ADC+R regime), not the final k."""
    from pyspark.sql.window import Window

    cands = pq_adc_topk(
        emb, query_ids, k_nn=shortlist, id_col=id_col, vec_col=vec_col,
        m=m, k=k, salt=salt, codebooks=codebooks,
    ).select("query_id", "id")
    xq = emb.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.expr(_xq_expr(vec_col)).alias("_xq")
    )
    qrows = (
        emb.filter(F.col(id_col).isin([int(q) for q in query_ids]))
        .select(
            F.col(id_col).alias("_id"), F.expr(_xq_expr(vec_col)).alias("_xq")
        )
        .collect()
    )
    qlit = {
        int(r["_id"]): F.array(
            *[F.lit(int(v)).cast("long") for v in r["_xq"]]
        )
        for r in qrows
    }
    joined = cands.join(xq, "id")
    dist = None
    for qid, arr in sorted(qlit.items()):
        d = F.aggregate(
            F.zip_with(F.col("_xq"), arr, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        dist = (
            F.when(F.col("query_id") == qid, d)
            if dist is None
            else dist.when(F.col("query_id") == qid, d)
        )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("id"))
    return (
        joined.select("query_id", "id", dist.alias("dist"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k_nn)
        .orderBy("query_id", "rank")
    )


def pq_codebooks_kmeans(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    salt: str = "pq",
    n_iter: int = 2,
) -> list[list[list[int]]]:
    """Lloyd-REFINED codebooks — the production training path the
    sampled (pq_codebooks_md5) tier stands in for under the oracle
    gate: per subspace, run operators/kmeans over the integer-grid
    subvectors (hash-order init with a per-subspace salt, so the
    refinement STARTS from the sampled codebook's discipline) and
    round the final centroids back onto the grid. The returned shape
    is identical, so pq_encode / pq_adc_topk / pq_rerank_topk consume
    it unchanged — refinement moves recall, not plumbing. Driver
    state: m·k·d_sub ints.

    Scale plan (round 11): the corpus explodes ONCE to (subspace j,
    point, d_sub subvector) rows and ALL m codebooks train in one
    keyed k-means — each Lloyd round is ONE pass + ONE m·k-row
    collect instead of m×n_iter serialized jobs. Bit-identical to the
    per-subspace loop (kmeans_keyed's salt contract replays
    ``salt|j`` seeding), so the q320/q321/q339 oracle hashes do not
    move."""
    base = emb.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("pid"), F.expr(_xq_expr(vec_col)).alias("_xq")
    )
    dim = len(base.select("_xq").first()["_xq"])
    if dim % m != 0:
        raise ValueError(f"m={m} must divide dim={dim}")
    d_sub = dim // m
    cents = _subspace_kmeans(base, "_xq", m, d_sub, k, salt, n_iter)
    return [
        [[int(round(c)) for c in cent] for cent in cents[j]]
        for j in range(m)
    ]


def _subspace_kmeans(
    src: DataFrame,
    arr_col: str,
    m: int,
    d_sub: int,
    k: int,
    salt: str,
    n_iter: int,
) -> dict[int, list[list[float]]]:
    """Explode ``src`` (pid, arr_col: array<long>) to (j, pid,
    d_sub-subvector) rows — ONE map-side pass, no shuffle — and fit
    all m subspace codebooks with operators/kmeans.kmeans_keyed.
    Seed salt per subspace is ``salt|j`` (the historical per-subspace
    contract), so results are bit-identical to m independent fits.
    Subvectors ride as one array<double> column (r12:
    kmeans_keyed_array — same values as the former per-dimension
    ``element_at`` columns via ``slice``, with an O(1)-size plan per
    Lloyd round instead of O(d_sub) expressions)."""
    from .kmeans import kmeans_keyed_array

    sub_structs = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("j"),
                F.transform(
                    F.slice(F.col(arr_col), j * d_sub + 1, d_sub),
                    lambda x: x.cast("double"),
                ).alias("_vec"),
            )
            for j in range(m)
        ]
    )
    exploded = src.select(F.col("pid"), F.inline(sub_structs))
    return kmeans_keyed_array(
        exploded,
        "j",
        "_vec",
        "pid",
        k=k,
        n_iter=n_iter,
        salt_prefix=f"{salt}|",
        dim=d_sub,
    )


def _pq_codes_kernel(
    frame: DataFrame,
    xq_col: str,
    books: list[list[list[int]]],
    id_out: str = "id",
) -> DataFrame:
    """``(id, j, h)`` PQ codes as ONE Arrow kernel (r13) — the
    default encode form at all three sites. The arithmetic is the
    runtime-HOF form's exactly: per (row, subspace) the int64
    Σ(x−c)² over codewords, argmin with ties to the LOWEST code
    (``np.argmin`` returns the first minimum — the HOF's
    (distance asc, code asc) ``array_min`` struct pick). All-integer
    math, so summation order is irrelevant (exact associativity) and
    the kernel is bit-identical to ``_pq_codes_runtime`` by
    construction — pinned by
    ``test_pq_codes_kernel_matches_runtime_hof``, which keeps the HOF
    as the differential reference. Why a kernel (guide §4.2 /
    SCALING §29): the nested ``transform``/``aggregate`` HOF never
    whole-stage-codegens, so encoding paid ~0.6 ms of interpreted
    expression evaluation PER VECTOR (m·k·d_sub fused lambdas);
    measured 1.26 s → ~0.2 s noop on the 2000-vector q339 encode.
    The codebooks ride in the task closure (m·k·d_sub ints —
    bounded, the same boundedness the broadcast join already paid)."""
    import numpy as np

    m = len(books)
    d_sub = len(books[0][0])
    bmat = np.array(books, dtype=np.int64)  # (m, k, d_sub)
    j_col = np.arange(m, dtype=np.int32)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame(
                    {id_out: [], "j": [], "h": []}
                )
                continue
            ids = pdf[id_out].to_numpy()
            mat = np.vstack(pdf[xq_col].to_numpy()).astype(np.int64)
            n = len(pdf)
            hs = np.empty((n, m), dtype=np.int32)
            for j in range(m):
                sub = mat[:, j * d_sub : (j + 1) * d_sub]
                dist = np.zeros((n, bmat.shape[1]), dtype=np.int64)
                for d in range(d_sub):
                    diff = sub[:, d : d + 1] - bmat[j, :, d][None, :]
                    dist += diff * diff
                hs[:, j] = np.argmin(dist, axis=1)
            yield pd.DataFrame(
                {
                    id_out: np.repeat(ids, m),
                    "j": np.tile(j_col, n),
                    "h": hs.ravel(),
                }
            )

    return frame.select(id_out, xq_col).mapInPandas(
        run, schema=f"{id_out} long, j int, h int"
    )


def _pq_codes_runtime(
    frame: DataFrame,
    xq_col: str,
    books: list[list[list[int]]],
    id_out: str = "id",
) -> DataFrame:
    """``(id, j, h)`` PQ codes by a nested runtime HOF over ONE
    broadcast codebook array (r12) — replaces the former
    posexplode → broadcast join → (id, j, h) aggregate → per-(id, j)
    window chain at every encode site. The arithmetic is unchanged:
    the same exact-integer Σ(x−c)² per (subspace, codeword) in the
    same dimension order, the same (distance asc, code asc)
    tie-break (``array_min`` struct == the window's ``row_number``
    pick). What changes is the plan: one map-side expression — no
    ×dim row explosion, no keyed shuffle, no window — and O(1)
    expression count where the literal per-(j, h) form costs seconds
    of Catalyst analysis at m·k aggregate lambdas (the round-9
    rule). ``frame[xq_col]`` must be a MATERIALIZED array<long>
    column (checkpointed upstream — never a lazy quantize
    expression, per SCALING §29)."""
    m = len(books)
    d_sub = len(books[0][0])
    spark = frame.sparkSession
    bk = F.broadcast(
        spark.createDataFrame(
            [([[list(map(int, cent)) for cent in bj] for bj in books],)],
            "_books array<array<array<bigint>>>",
        )
    )
    entry = F.transform(
        F.col("_books"),
        lambda bj, j: F.struct(
            j.cast("int").alias("j"),
            F.array_min(
                F.transform(
                    bj,
                    lambda ch, h: F.struct(
                        F.aggregate(
                            F.zip_with(
                                F.slice(
                                    F.col(xq_col),
                                    j * d_sub + 1,
                                    d_sub,
                                ),
                                ch,
                                lambda a, b: (a - b) * (a - b),
                            ),
                            F.lit(0).cast("long"),
                            lambda acc, v: acc + v,
                        ).alias("d"),
                        h.cast("int").alias("h"),
                    ),
                )
            )
            .getField("h")
            .alias("h"),
        ),
    )
    return frame.crossJoin(bk).select(
        F.col(id_out), F.inline(entry)
    )


def ivf_pq_topk(
    emb: DataFrame,
    query_ids: list[int],
    k_nn: int = 10,
    num_cells: int = 16,
    n_probe: int = 4,
    m: int = 16,
    k_pq: int = 16,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "pq",
    codebooks: list[list[list[int]]] | None = None,
) -> DataFrame:
    """IVF-PQ — the production ANN index architecture (FAISS
    IndexIVFPQ; Jégou et al. 2011 §V): an IVF coarse quantizer routes
    each vector to one cell, PQ codes compress the residual working
    set, queries probe their ``n_probe`` best cells, ADC shortlists
    within the probed cells only, and an exact integer re-rank orders
    the final top-k. Composes this module's two gated tiers
    unchanged: the md5-seeded coarse routing of ``ivf_md5_topk``
    (int8-by-norm grid) and the PQ code/ADC machinery of
    ``pq_adc_topk`` (×1e8 grid) — separate grids exactly as coarse
    quantizer and PQ codebooks are separate in the reference design.

    Every number is an exact integer, so the WHOLE composition sits
    under the value-hash gate (q321). Scale shape: seeds and ADC
    tables broadcast; assignment is broadcast-join + keyed argmax;
    scoring touches only probed cells' members (corpus fraction
    ~n_probe/num_cells); the exact re-rank touches
    |queries|·shortlist rows. The corpus never self-joins.
    """
    from pyspark.sql.window import Window

    spark = emb.sparkSession
    # --- coarse routing (the ivf_md5_topk quantizer, verbatim) -----
    # materialized ONCE (eager checkpoint): the seed cross-join below
    # evaluates qvec num_cells times per row — against the lazy
    # quantize HOF expression that is num_cells full norm-fold
    # re-computations per row (the SCALING §29 rule)
    qn = quantize_embeddings(emb, id_col, vec_col).localCheckpoint(
        eager=True
    )
    seeds = (
        qn.withColumn("h", F.md5(F.col("id").cast("string")))
        .orderBy("h", "id")
        .limit(num_cells)
        .select(
            F.col("id").alias("seed_id"), F.col("qvec").alias("seed_qvec")
        )
    )
    dot_seed = F.aggregate(
        F.zip_with("qvec", "seed_qvec", lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored_seed = qn.crossJoin(F.broadcast(seeds)).select(
        "id", "seed_id", dot_seed.alias("sdot")
    )
    # min-struct top-1 == the old (sdot DESC, seed_id ASC) window
    # pick; partial-aggregates map-side (r13)
    assigned = (
        scored_seed.groupBy("id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("sdot")).alias("_negdot"),
                    F.col("seed_id").alias("seed_id"),
                )
            ).alias("_b")
        )
        .select("id", F.col("_b.seed_id").alias("cell"))
    )
    w_assign = Window.partitionBy("id").orderBy(
        F.desc("sdot"), F.asc("seed_id")
    )
    probes = (
        scored_seed.filter(F.col("id").isin([int(q) for q in query_ids]))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") <= n_probe)
        .select(F.col("id").alias("query_id"), F.col("seed_id").alias("cell"))
    )
    # --- PQ codes + ADC tables (the pq_adc_topk machinery) ---------
    if codebooks is None:
        codebooks = pq_codebooks_md5(emb, id_col, vec_col, m, k_pq, salt)
    m, k_pq = len(codebooks), len(codebooks[0])
    d_sub = len(codebooks[0][0])
    # runtime-HOF encode over the broadcast codebook array (r12 —
    # same exact-integer argmin as the former explode/join/window
    # chain, one map-side pass; lazy quantize lineage-truncated per
    # SCALING §29)
    xqf = (
        emb.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.expr(_xq_expr(vec_col)).alias("_xq"),
        )
        .localCheckpoint(eager=False)
    )
    codes = _pq_codes_kernel(xqf, "_xq", codebooks)
    qrows = (
        emb.filter(F.col(id_col).isin([int(q) for q in query_ids]))
        .select(
            F.col(id_col).alias("_id"), F.expr(_xq_expr(vec_col)).alias("_xq")
        )
        .collect()
    )
    qtab_rows = []
    for qr in qrows:
        qx = [int(v) for v in qr["_xq"]]
        for j in range(m):
            qsub = qx[j * d_sub : (j + 1) * d_sub]
            for h in range(k_pq):
                t = sum(
                    (a - b) * (a - b)
                    for a, b in zip(qsub, codebooks[j][h])
                )
                qtab_rows.append((int(qr["_id"]), j, h, int(t)))
    qtab = F.broadcast(
        spark.createDataFrame(
            qtab_rows, "query_id long, j int, h int, t long"
        )
    )
    # --- ADC within probed cells only -------------------------------
    member = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", "id")
    )
    adc = (
        member.join(codes, "id")
        .join(qtab, ["query_id", "j", "h"])
        .groupBy("query_id", "id")
        .agg(F.sum("t").cast("long").alias("pq_dist"))
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.asc("pq_dist"), F.asc("id")
    )
    cands = (
        adc.withColumn("_rn", F.row_number().over(w_short))
        .filter(F.col("_rn") <= shortlist)
        .select("query_id", "id")
    )
    # --- exact integer re-rank (the pq_rerank_topk tail) -----------
    xq_full = emb.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.expr(_xq_expr(vec_col)).alias("_xq")
    )
    dist = None
    for qr in sorted(qrows, key=lambda r: r["_id"]):
        arr = F.array(*[F.lit(int(v)).cast("long") for v in qr["_xq"]])
        d = F.aggregate(
            F.zip_with(F.col("_xq"), arr, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        qid = int(qr["_id"])
        dist = (
            F.when(F.col("query_id") == qid, d)
            if dist is None
            else dist.when(F.col("query_id") == qid, d)
        )
    w_final = Window.partitionBy("query_id").orderBy(
        F.asc("dist"), F.asc("id")
    )
    return (
        cands.join(xq_full, "id")
        .select(
            F.col("query_id").cast("bigint").alias("query_id"),
            F.col("id").cast("bigint").alias("id"),
            dist.alias("dist"),
        )
        .withColumn("rank", F.row_number().over(w_final).cast("int"))
        .filter(F.col("rank") <= k_nn)
        .orderBy("query_id", "rank")
    )


def default_num_cells(n: int) -> int:
    """The SemDeDup coarse-quantizer operating point: ~sqrt(n) cells
    keeps every within-cell Gram matrix executor-sized (E[cell] =
    sqrt(n) rows → sqrt(n)² = n within-cell dot products corpus-wide,
    linear in the data) — the granularity the paper trains its
    k-means at. Clamped to [2, 65536]."""
    import math

    return max(2, min(65536, _half_away(math.sqrt(max(0, n)))))


def semdedup_verdicts(
    emb: DataFrame,
    threshold: float,
    num_cells: int | None = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup — embedding-cluster semantic deduplication (Abbas et
    al. 2023, "SemDeDup: Data-efficient learning at web-scale through
    semantic deduplication"): route every vector through a coarse
    quantizer, compute pairwise cosines ONLY within each cell, and
    keep one representative per semantic-duplicate cluster — the
    published semantic tier that catches paraphrase-level duplicates
    exact/MinHash text dedup cannot see.

    Deterministic composition of this module's gated tiers:

    1. cells = the ``ivf_md5_topk`` coarse quantizer (md5-seeded
       centroids on the int8-by-norm grid, argmax integer dot, ties
       to the smaller seed id);
    2. within-cell pairwise cosines = ``cosine_neardup_pairs_exact``
       with block = cell (int64 Gram matrices on the ×1e8 grid, the
       shared quantized-cosine IEEE sequence) — candidate pairs are
       BOUNDED BY THE CELL, the corpus never self-joins;
    3. pairs ≥ ``threshold`` → ``operators/dedup
       .connected_components`` (large-star/small-star, O(log n)
       rounds);
    4. representative per cluster = the CENTROID-NEAREST member
       (max integer dot with its cell's seed, ties to the smaller
       id) — the paper's keep-one-per-ε-cluster rule with a
       replayable tie order.

    Returns one row per CLUSTERED vector (members of no pair are
    trivially kept and not emitted): (``id_col`` BIGINT, cell BIGINT,
    comp BIGINT — min-id cluster label, keeper BIGINT, kept INT).

    Scale shape: seeds broadcast (num_cells rows); assignment is a
    broadcast join + keyed argmax; the pairwise stage shuffles once
    on cell and its Gram matrices are cell-bounded (size num_cells to
    ~sqrt(n) so cells stay executor-sized — the paper uses k-means
    cells at the same granularity); CC runs on the pair table only;
    the verdict join touches clustered ids only. ``num_cells=None``
    computes the paper's ~sqrt(n) granularity via
    :func:`default_num_cells` (one count job). For the paper's
    k-means coarse quantizer (Lloyd-refined cells) use
    :func:`semdedup_kmeans_verdicts`. Reference parity:
    the reference has no semantic-dedup surface (SURVEY §2.D
    training-data extension; the suite gates it as q338)."""
    from pyspark.sql.window import Window

    from .dedup import connected_components

    # materialized ONCE (SCALING §29): the seed cross-join evaluates
    # qvec num_cells times per row
    qn = quantize_embeddings(emb, id_col, vec_col).localCheckpoint(
        eager=True
    )
    if num_cells is None:
        num_cells = default_num_cells(qn.count())
    seeds = (
        qn.withColumn("h", F.md5(F.col("id").cast("string")))
        .orderBy("h", "id")
        .limit(num_cells)
        .select(
            F.col("id").alias("seed_id"), F.col("qvec").alias("seed_qvec")
        )
    )
    dot_seed = F.aggregate(
        F.zip_with("qvec", "seed_qvec", lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # min-struct top-1 == the old (sdot DESC, seed_id ASC) window
    # pick; partial-aggregates map-side (r13)
    assigned = (
        qn.crossJoin(F.broadcast(seeds))
        .select("id", "seed_id", dot_seed.alias("sdot"))
        .groupBy("id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("sdot")).alias("_negdot"),
                    F.col("seed_id").alias("seed_id"),
                )
            ).alias("_b")
        )
        .select(
            "id", F.col("_b.seed_id").alias("cell"),
            (-F.col("_b._negdot")).alias("sdot"),
        )
        .localCheckpoint(eager=False)
    )
    blocked = emb.select(
        F.col(id_col).cast("long").alias(id_col), vec_col
    ).join(assigned.withColumnRenamed("id", id_col), id_col)
    pairs = cosine_neardup_pairs_exact_unsorted(
        blocked, threshold=threshold, block_col="cell",
        id_col=id_col, vec_col=vec_col,
    ).select("id_a", "id_b")
    comps = connected_components(pairs)
    members = comps.join(
        assigned.select(
            F.col("id"), F.col("cell"), F.col("sdot")
        ),
        "id",
    )
    w_keep = Window.partitionBy("comp").orderBy(
        F.desc("sdot"), F.asc("id")
    )
    keepers = (
        members.withColumn("krn", F.row_number().over(w_keep))
        .filter(F.col("krn") == 1)
        .select(F.col("comp"), F.col("id").alias("keeper"))
    )
    return (
        members.join(keepers, "comp")
        .select(
            F.col("id").cast("bigint").alias(id_col),
            F.col("cell").cast("bigint").alias("cell"),
            F.col("comp").cast("bigint").alias("comp"),
            F.col("keeper").cast("bigint").alias("keeper"),
            (F.col("id") == F.col("keeper")).cast("int").alias("kept"),
        )
    )


def semdedup_kmeans_verdicts(
    emb: DataFrame,
    threshold: float,
    num_cells: int | None = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "semdedup",
) -> DataFrame:
    """SemDeDup with the PAPER's coarse quantizer — k-means cells
    (Abbas et al. 2023 use k-means clustering of the embeddings; the
    md5-sampled-seed tier of :func:`semdedup_verdicts` is the
    iteration-0 stand-in). Same verdict schema; three refinements:

    1. cells = Lloyd-refined centroids over the int8-by-norm grid
       (operators/kmeans.kmeans_keyed, ``n_iter`` rounds, hash-order
       init ``md5(salt|0 || id)`` — md5 init IS iteration 0, the
       established discipline), centroid updates ROUND-6
       decimal-exact means (the q159 contract);
    2. assignment = argmin squared-euclidean to the final centroids
       (double distances in fixed dimension order, ties → lower cell
       id) — euclidean on the by-norm grid orders like cosine, and
       is the quantity k-means optimizes;
    3. keeper per cluster = the member with the SMALLEST distance to
       its cell centroid (ties → smaller id) — the paper's
       keep-closest-to-centroid rule, now against a true centroid
       rather than a sampled member vector.

    Deterministic end to end (the q341 hash gate): seeds are
    md5-order, every Lloyd round's arithmetic is the replayable
    q159/q339 contract, and the within-cell pairwise stage is the
    shared quantized-cosine machinery of the sampled tier.

    Scale shape: identical to :func:`semdedup_verdicts` — ONE
    assignment pass + one k·d-row collect per Lloyd round (training
    state num_cells·dim doubles, broadcast back), one shuffle on
    cell for the pairwise stage, cell-bounded Gram matrices, CC on
    the pair table only. ``num_cells=None`` computes the paper's
    ~sqrt(n) granularity (:func:`default_num_cells`)."""
    from pyspark.sql.window import Window

    from .dedup import connected_components
    from .kmeans import kmeans_keyed_array

    spark = emb.sparkSession
    # eager checkpoint: the 64 per-dimension feature projections below
    # (and every Lloyd action) would otherwise re-evaluate the whole
    # quantize HOF expression (norm fold + transform) PER COLUMN per
    # pass — measured 54 s → ~2 s at sf0.1 for the training phase
    qn = (
        quantize_embeddings(
            emb.filter(F.col(vec_col).isNotNull()), id_col, vec_col
        )
        .localCheckpoint(eager=True)
    )
    if num_cells is None:
        num_cells = default_num_cells(qn.count())
    first = qn.select("qvec").first()
    if first is None:
        raise ValueError(
            "semdedup_kmeans_verdicts: no non-NULL embeddings to cluster"
        )
    dim = len(first["qvec"])

    # --- Lloyd-refined cells (single-group keyed fit; r12: the
    # quantized grid rides as ONE array<double> column through
    # kmeans_keyed_array — same values the former 64 per-dimension
    # element_at projections carried, with an O(1)-size plan per
    # Lloyd round instead of O(dim) expressions) -------------------
    feats = qn.select(
        F.lit(0).cast("int").alias("j"),
        F.col("id").alias("pid"),
        F.transform(F.col("qvec"), lambda x: x.cast("double")).alias(
            "_vec"
        ),
    )
    cents = kmeans_keyed_array(
        feats,
        "j",
        "_vec",
        "pid",
        k=num_cells,
        n_iter=n_iter,
        salt_prefix=f"{salt}|",
        dim=dim,
    )[0]

    # --- final assignment: argmin euclidean, ties -> lower cell ----
    cbdf = F.broadcast(
        spark.createDataFrame([(cents,)], "_cents array<array<double>>")
    )
    qvd = F.transform(F.col("qvec"), lambda x: x.cast("double"))
    entries = F.transform(
        F.col("_cents"),
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(qvd, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("d"),
            i.cast("int").alias("cid"),
        ),
    )
    best = F.array_min(entries)
    assigned = (
        qn.crossJoin(cbdf)
        .select(
            "id",
            best.getField("cid").cast("long").alias("cell"),
            best.getField("d").alias("fdist"),
        )
        .localCheckpoint(eager=False)
    )

    # --- within-cell pairwise cosines + CC + keepers ----------------
    blocked = emb.select(
        F.col(id_col).cast("long").alias(id_col), vec_col
    ).join(assigned.withColumnRenamed("id", id_col), id_col)
    pairs = cosine_neardup_pairs_exact_unsorted(
        blocked, threshold=threshold, block_col="cell",
        id_col=id_col, vec_col=vec_col,
    ).select("id_a", "id_b")
    comps = connected_components(pairs)
    members = comps.join(
        assigned.select("id", "cell", "fdist"), "id"
    )
    w_keep = Window.partitionBy("comp").orderBy(
        F.asc("fdist"), F.asc("id")
    )
    keepers = (
        members.withColumn("krn", F.row_number().over(w_keep))
        .filter(F.col("krn") == 1)
        .select(F.col("comp"), F.col("id").alias("keeper"))
    )
    return (
        members.join(keepers, "comp")
        .select(
            F.col("id").cast("bigint").alias(id_col),
            F.col("cell").cast("bigint").alias("cell"),
            F.col("comp").cast("bigint").alias("comp"),
            F.col("keeper").cast("bigint").alias("keeper"),
            (F.col("id") == F.col("keeper")).cast("int").alias("kept"),
        )
    )


def _half_away(c: float) -> int:
    """Round half AWAY from zero — Spark's ROUND and DuckDB's
    CAST(double AS BIGINT) semantics (Python's round() is banker's
    and diverges on .5 ties; int(round()) is NOT replayable)."""
    import math

    return int(math.copysign(math.floor(abs(c) + 0.5), c))


def ivf_residual_frame(
    emb: DataFrame,
    num_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """(frame, seed_vecs): the FAISS-style residual working set —
    every vector's coarse cell (the ivf_md5_topk int8 quantizer) and
    its ×1e8-grid residual to the cell seed, as one eagerly
    checkpointed frame (id, cell, xq array<long>, rq array<long>).
    ``seed_vecs`` maps seed_id -> its ×1e8 integer vector (num_cells
    entries, driver-safe). All arithmetic exact integers."""
    from pyspark.sql.window import Window

    # materialized ONCE (eager checkpoint): the seed cross-join below
    # evaluates qvec num_cells times per row — against the lazy
    # quantize HOF expression that is num_cells full norm-fold
    # re-computations per row (the SCALING §29 rule)
    qn = quantize_embeddings(emb, id_col, vec_col).localCheckpoint(
        eager=True
    )
    seeds = (
        qn.withColumn("h", F.md5(F.col("id").cast("string")))
        .orderBy("h", "id")
        .limit(num_cells)
        .select(
            F.col("id").alias("seed_id"), F.col("qvec").alias("seed_qvec")
        )
    )
    dot_seed = F.aggregate(
        F.zip_with("qvec", "seed_qvec", lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # min-struct top-1 == the old (sdot DESC, seed_id ASC) window
    # pick; partial-aggregates map-side (r13)
    assigned = (
        qn.crossJoin(F.broadcast(seeds))
        .select("id", "seed_id", dot_seed.alias("sdot"))
        .groupBy("id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("sdot")).alias("_negdot"),
                    F.col("seed_id").alias("seed_id"),
                )
            ).alias("_b")
        )
        .select("id", F.col("_b.seed_id").alias("cell"))
    )
    xq_full = emb.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.expr(_xq_expr(vec_col)).alias("xq")
    )
    seed_ids = [int(r["seed_id"]) for r in seeds.collect()]
    seed_vecs = {
        int(r["id"]): [int(v) for v in r["xq"]]
        for r in xq_full.filter(F.col("id").isin(seed_ids)).collect()
    }
    spark = emb.sparkSession
    seed_arr = F.broadcast(
        spark.createDataFrame(
            [(sid, vec) for sid, vec in sorted(seed_vecs.items())],
            "cell long, sx array<long>",
        )
    )
    frame = (
        xq_full.join(assigned, "id")
        .join(seed_arr, "cell")
        .select(
            "id",
            "cell",
            "xq",
            F.zip_with("xq", "sx", lambda a, b: a - b).alias("rq"),
        )
        .localCheckpoint(eager=True)
    )
    return frame, seed_vecs


def ivf_pq_residual_topk(
    emb: DataFrame,
    query_ids: list[int],
    k_nn: int = 10,
    num_cells: int = 16,
    n_probe: int = 4,
    m: int = 16,
    k_pq: int = 16,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "pq",
    n_iter: int = 2,
) -> DataFrame:
    """IVF-PQ at the FAISS IndexIVFPQ DEFAULT operating point — the
    q321 composition upgraded with the two production refinements
    (Jégou et al. 2011 §V-A):

    - **residual encoding**: PQ codes the residual x − c(cell) rather
      than x itself, so the codebooks spend their precision on the
      within-cell variation the coarse quantizer leaves behind;
    - **Lloyd-refined codebooks**: per-subspace k-means over the
      residual subvectors (operators/kmeans, ``n_iter`` rounds,
      hash-order init with the per-subspace salt — the md5 codebook
      IS iteration 0), final centroids rounded half-away onto the
      ×1e8 grid so every downstream distance stays an exact int64.

    Determinism contract (hash-gate replayable, suite q339): int8
    coarse routing (q239), exact-integer residuals, Lloyd rounds with
    double distances in FIXED dimension order + ROUND-6 decimal-mean
    updates (the q159 kmeans contract), half-away final rounding
    (``_half_away`` == DuckDB CAST), integer ADC over probed cells,
    exact integer re-rank on the RAW grid.

    Scale shape: unchanged from ivf_pq_topk — seeds/codebooks/ADC
    tables broadcast, scoring touches probed cells only, the corpus
    never self-joins. Codebook training (round 11) is ONE keyed
    k-means over the once-exploded (subspace, point, subvector)
    residual rows — one pass + one m·k_pq-row collect per Lloyd
    round instead of m×n_iter serialized jobs; driver state
    m·k_pq·d_sub ints.
    """
    from pyspark.sql.window import Window

    spark = emb.sparkSession
    frame, seed_vecs = ivf_residual_frame(
        emb, num_cells, id_col, vec_col
    )
    dim = len(next(iter(seed_vecs.values())))
    if dim % m != 0:
        raise ValueError(f"m={m} must divide dim={dim}")
    d_sub = dim // m

    # --- Lloyd-refined residual codebooks (one keyed fit) ----------
    cents = _subspace_kmeans(
        frame.select(F.col("id").alias("pid"), "rq"),
        "rq", m, d_sub, k_pq, salt, n_iter,
    )
    books: list[list[list[int]]] = [
        [[_half_away(c) for c in cent] for cent in cents[j]]
        for j in range(m)
    ]

    # --- encode member residuals (map-side runtime-HOF argmin; the
    # checkpointed frame's rq is already materialized) ---------------
    codes = _pq_codes_kernel(frame.select("id", "rq"), "rq", books)

    # --- probes + per-(query, cell) residual ADC tables -------------
    # lazy is fine HERE: the cross-join below is filtered to
    # |queries| rows first, so qvec evaluates a bounded number of
    # times (the corpus-wide routing already lives in `frame`)
    qn = quantize_embeddings(emb, id_col, vec_col)
    seeds = (
        qn.withColumn("h", F.md5(F.col("id").cast("string")))
        .orderBy("h", "id")
        .limit(num_cells)
        .select(
            F.col("id").alias("seed_id"), F.col("qvec").alias("seed_qvec")
        )
    )
    dot_seed = F.aggregate(
        F.zip_with("qvec", "seed_qvec", lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w_assign = Window.partitionBy("id").orderBy(
        F.desc("sdot"), F.asc("seed_id")
    )
    probes = (
        qn.filter(F.col("id").isin([int(q) for q in query_ids]))
        .crossJoin(F.broadcast(seeds))
        .select("id", "seed_id", dot_seed.alias("sdot"))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") <= n_probe)
        .select(F.col("id").alias("query_id"), F.col("seed_id").alias("cell"))
    )
    qrows = (
        emb.filter(F.col(id_col).isin([int(q) for q in query_ids]))
        .select(
            F.col(id_col).alias("_id"), F.expr(_xq_expr(vec_col)).alias("_xq")
        )
        .collect()
    )
    qx_map = {int(r["_id"]): [int(v) for v in r["_xq"]] for r in qrows}
    probe_rows = [
        (int(r["query_id"]), int(r["cell"])) for r in probes.collect()
    ]
    qtab_rows = []
    for qid, cell in probe_rows:
        qres = [
            a - b for a, b in zip(qx_map[qid], seed_vecs[cell])
        ]
        for j in range(m):
            qsub = qres[j * d_sub : (j + 1) * d_sub]
            for h in range(k_pq):
                t = sum(
                    (a - b) * (a - b) for a, b in zip(qsub, books[j][h])
                )
                qtab_rows.append((qid, cell, j, h, int(t)))
    qtab = F.broadcast(
        spark.createDataFrame(
            qtab_rows, "query_id long, cell long, j int, h int, t long"
        )
    )
    probes_df = F.broadcast(
        spark.createDataFrame(
            probe_rows, "query_id long, cell long"
        )
    )

    # --- ADC within probed cells only --------------------------------
    member = (
        frame.select("id", "cell")
        .join(probes_df, "cell")
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", "cell", "id")
    )
    adc = (
        member.join(codes, "id")
        .join(qtab, ["query_id", "cell", "j", "h"])
        .groupBy("query_id", "id")
        .agg(F.sum("t").cast("long").alias("pq_dist"))
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.asc("pq_dist"), F.asc("id")
    )
    cands = (
        adc.withColumn("_rn", F.row_number().over(w_short))
        .filter(F.col("_rn") <= shortlist)
        .select("query_id", "id")
    )

    # --- exact integer re-rank on the RAW grid -----------------------
    dist = None
    for qid in sorted(qx_map):
        arr = F.array(*[F.lit(int(v)).cast("long") for v in qx_map[qid]])
        d = F.aggregate(
            F.zip_with(F.col("xq"), arr, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        dist = (
            F.when(F.col("query_id") == qid, d)
            if dist is None
            else dist.when(F.col("query_id") == qid, d)
        )
    w_final = Window.partitionBy("query_id").orderBy(
        F.asc("dist"), F.asc("id")
    )
    return (
        cands.join(frame.select("id", "xq"), "id")
        .select(
            F.col("query_id").cast("bigint").alias("query_id"),
            F.col("id").cast("bigint").alias("id"),
            dist.alias("dist"),
        )
        .withColumn("rank", F.row_number().over(w_final).cast("int"))
        .filter(F.col("rank") <= k_nn)
        .orderBy("query_id", "rank")
    )
