"""Similarity-search suite entries (SURVEY.md §2.D).

The single-query exact top-k is oracle-checked (exact-decimal dot
product — see operators.similarity). Round 7 moved the batched numpy
path (q51), the LSH bucket stats (q52), and the blocked near-dup
scorer (q53) inside the gate via the exact-int64 quantized-cosine
tiers and md5-derived hyperplanes; round 8 migrated the last two
routing variants too — q54 (LSH top-k) and q68 (IVF) now run the md5
tiers at second operating points, so the WHOLE family is value-hash
checked. The numpy-seeded originals stay as the production fast paths
(unit-tested).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query
from ..operators.similarity import (
    cosine_neardup_pairs,
    cosine_topk_exact,
)
from ._helpers import T


@query(
    "q50_cosine_topk",
    oracle="""
    WITH q AS (
      SELECT i, CAST(CAST(val AS DOUBLE) AS DECIMAL(10,8)) AS qv
      FROM (SELECT unnest(embedding) AS val, generate_subscripts(embedding, 1) AS i
            FROM embeddings WHERE vec_id = 0)
    ),
    e AS (
      SELECT vec_id, i, CAST(CAST(val AS DOUBLE) AS DECIMAL(10,8)) AS ev
      FROM (SELECT vec_id, unnest(embedding) AS val, generate_subscripts(embedding, 1) AS i
            FROM embeddings)
    ),
    dots AS (
      SELECT e.vec_id,
        SUM(e.ev * q.qv) AS dot,
        SUM(e.ev * e.ev) AS nv,
        SUM(q.qv * q.qv) AS nq
      FROM e JOIN q USING (i)
      GROUP BY e.vec_id
    )
    SELECT vec_id,
      FLOOR(CAST(dot AS DOUBLE)
            / NULLIF(sqrt(CAST(nv AS DOUBLE)) * sqrt(CAST(nq AS DOUBLE)), 0)
            * 1000000 + 0.5) / 1000000 AS cosine
    FROM dots
    WHERE vec_id <> 0
    ORDER BY cosine DESC, vec_id ASC
    LIMIT 10
    """,
)
def q50_cosine_topk(spark, sf_dir):
    """Top-10 cosine neighbors of vector 0, exact-decimal arithmetic
    (both engines sum DECIMAL products exactly; the final sqrt/divide
    are IEEE-identical). LIMIT has the (cosine DESC, vec_id) total
    order."""
    emb = T(spark, sf_dir, "embeddings")
    return cosine_topk_exact(emb, query_id=0, k=10).select(
        F.col("vec_id").cast("bigint").alias("vec_id"), "cosine"
    )


@query(
    "q51_cosine_topk_batch",
    oracle="""
    WITH qv AS (
      SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8
    ),
    fe AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        CAST(CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(10,8))
             * 100000000 AS BIGINT) AS x
      FROM embeddings
    ),
    fq AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        CAST(CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(10,8))
             * 100000000 AS BIGINT) AS x
      FROM qv
    ),
    dots AS (
      SELECT q.vec_id AS query_id, e.vec_id,
        SUM(e.x * q.x) AS d, SUM(e.x * e.x) AS na, SUM(q.x * q.x) AS nq
      FROM fe e JOIN fq q USING (i)
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT query_id, vec_id,
        FLOOR(CAST(d AS DOUBLE)
              / NULLIF(sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nq AS DOUBLE)),
                       0)
              * 1000000 + 0.5) / 1000000 AS cosine
      FROM dots
      WHERE query_id <> vec_id
    ),
    ranked AS (
      SELECT query_id, vec_id, cosine,
        ROW_NUMBER() OVER (PARTITION BY query_id
                           ORDER BY cosine DESC, vec_id ASC) AS rn
      FROM scored WHERE cosine IS NOT NULL
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
      CAST(vec_id AS BIGINT) AS vec_id, CAST(cosine AS DOUBLE) AS cosine
    FROM ranked WHERE rn <= 5
    ORDER BY query_id ASC, cosine DESC, vec_id ASC
    """,
)
def q51_cosine_topk_batch(spark, sf_dir):
    """Batched brute-force ANN baseline: top-5 neighbors for the first
    8 stored vectors via one Arrow/numpy INTEGER matmul per partition
    (mapInPandas). Hash-gated since round 7: the vectorized path runs
    on exact int64 dot products of 1e-8-quantized components with the
    shared quantized-cosine IEEE sequence, so the DuckDB decimal
    replay matches bit for bit (the raw-double variant remains
    available as operators/similarity.cosine_topk_vectorized)."""
    from ..operators.similarity import cosine_topk_vectorized_exact

    emb = T(spark, sf_dir, "embeddings")
    queries = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in emb.orderBy("vec_id").limit(8).collect()
    ]
    return cosine_topk_vectorized_exact(emb, queries, k=5)


@query(
    "q53_embedding_neardup",
    oracle="""
    WITH fe AS (
      SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
        CAST(CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(10,8))
             * 100000000 AS BIGINT) AS x
      FROM embeddings
    ),
    dots AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        SUM(a.x * b.x) AS d, SUM(a.x * a.x) AS na, SUM(b.x * b.x) AS nb
      FROM fe a JOIN fe b ON a.i = b.i AND a.label = b.label
                          AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT id_a, id_b,
        FLOOR(CAST(d AS DOUBLE)
              / NULLIF(sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)),
                       0)
              * 1000000 + 0.5) / 1000000 AS cosine
      FROM dots
    )
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
      CAST(cosine AS DOUBLE) AS cosine
    FROM scored WHERE cosine >= 0.3
    ORDER BY cosine DESC, id_a ASC, id_b ASC
    """,
)
def q53_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs within label blocks (grouped-
    map numpy pairwise). Threshold 0.3 sits just under the synthetic
    corpus's max within-label cosine (~0.47 at sf0.01), so the query
    returns a non-trivial pair set. Hash-gated since round 7: the
    blocked pairwise scorer computes exact int64 Gram matrices and
    thresholds the quantized cosine — the same number the oracle's
    decimal join produces (blocking still bounds the candidate set by
    construction)."""
    from ..operators.similarity import cosine_neardup_pairs_exact

    emb = T(spark, sf_dir, "embeddings")
    return cosine_neardup_pairs_exact(emb, threshold=0.3, block_col="label")


# q54_ann_lsh_topk: migrated into the hash gate in round 8 — defined
# below q239 with the md5-oracle machinery it shares.


@query(
    "q52_lsh_bucket_stats",
    oracle="""
    WITH w AS (
      SELECT p.p, k.k,
        CAST(CAST(('0x' || substr(md5('lsh52|' || CAST(p.p AS VARCHAR)
          || '|' || CAST(k.k AS VARCHAR)), 1, 8)) AS UBIGINT) % 2001
          AS BIGINT) - 1000 AS w
      FROM (SELECT unnest(range(0, 10)) AS p) p
      CROSS JOIN (SELECT unnest(range(1, 65)) AS k) k
    ),
    fe AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS k,
        CAST(CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(10,8))
             * 100000000 AS BIGINT) AS x
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    s AS (
      SELECT f.vec_id, w.p, SUM(f.x * w.w) AS s
      FROM fe f JOIN w ON w.k = f.k
      GROUP BY 1, 2
    ),
    b AS (
      SELECT vec_id,
        CAST(SUM(CASE WHEN s > 0 THEN CAST(POWER(2, p) AS BIGINT)
                 ELSE 0 END) AS BIGINT) AS bucket
      FROM s GROUP BY 1
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM b GROUP BY bucket
    ORDER BY n_vectors DESC, bucket ASC
    """,
)
def q52_lsh_bucket_stats(spark, sf_dir):
    """Random-hyperplane LSH bucket occupancy — the ANN scale path's
    candidate-generation stage. Hash-gated since round 7: plane
    weights are md5-derived integers (the ann_md5_buckets
    convention), per-plane scores exact int64 dots folded MAP-SIDE
    with zip_with literal weight arrays (no explode, no join), bucket
    ids pack the sign bits — every number DuckDB-replayable. The
    numpy-seeded variant remains as
    operators/similarity.lsh_bucket_candidates (q54's routing)."""
    from ..operators.similarity import lsh_buckets_md5

    emb = T(spark, sf_dir, "embeddings")
    buckets = lsh_buckets_md5(emb, num_planes=10, salt="lsh52")
    return (
        buckets.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vectors"))
        .orderBy(F.desc("n_vectors"), "bucket")
    )


# q68_ivf_ann_topk: migrated into the hash gate in round 8 — defined
# below q239 with the md5-oracle machinery it shares.


@query(
    "q71_cosine_neardup_exact",
    oracle="""
    WITH e AS (
      SELECT vec_id, label, i, CAST(CAST(val AS DOUBLE) AS DECIMAL(10,8)) AS v
      FROM (SELECT vec_id, label, unnest(embedding) AS val,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings)
    ),
    dots AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        SUM(a.v * b.v) AS dot, SUM(a.v * a.v) AS na, SUM(b.v * b.v) AS nb
      FROM e a JOIN e b ON a.i = b.i AND a.label = b.label
                        AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT id_a, id_b,
        FLOOR(CAST(dot AS DOUBLE)
              / NULLIF(sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)), 0)
              * 1000000 + 0.5) / 1000000 AS cosine
      FROM dots
    )
    SELECT id_a, id_b, cosine FROM scored
    WHERE cosine >= 0.32
    ORDER BY cosine DESC, id_a ASC, id_b ASC
    """,
)
def q71_cosine_neardup_exact(spark, sf_dir):
    """ORACLE-checked embedding-cosine near-dup pairs, two-tier:

    1. CANDIDATES — the vectorized blocked scorer (numpy matmul per
       label block, ``cosine_neardup_pairs``) at a slightly LOWER
       threshold (0.32 - 1e-4). The decimal path quantizes each
       element at 1e-8 (DECIMAL(10,8)), so its cosine can drift from
       the raw-double matmul by at most ~64×1e-8 ≈ 1e-6 — two orders
       under the 1e-4 margin, so no exact-passing pair is ever
       pre-filtered out.
    2. RESCORE — only the surviving pairs are re-scored with the
       exact-decimal dot product (same determinism rules as q50) and
       the final threshold applies to the rounded exact score, exactly
       as the oracle's WHERE clause does.

    This keeps the oracle-exact result while doing the O(pairs) heavy
    arithmetic in BLAS instead of an interpreted decimal higher-order
    expression per pair — the same candidates→rescore shape the ANN
    tiers use, so it scales identically (block = unit of shuffle)."""
    from ..operators.similarity import _DOT, _NORM2

    emb = T(spark, sf_dir, "embeddings")
    cand = cosine_neardup_pairs(emb, threshold=0.32 - 1e-4, block_col="label").select(
        "id_a", "id_b"
    )
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    j = cand.join(a, "id_a").join(b, "id_b")
    from ..operators.similarity import stable_round6

    dot = F.expr(_DOT.format(a="va", b="vb"))
    na = F.expr(_NORM2.format(a="va"))
    nb = F.expr(_NORM2.format(a="vb"))
    cosine = stable_round6(
        dot.cast("double")
        / F.nullif(F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double")), F.lit(0.0))
    )
    return (
        j.select("id_a", "id_b", cosine.alias("cosine"))
        .filter(F.col("cosine") >= 0.32)
        .orderBy(F.desc("cosine"), "id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# q79 — embedding-cosine near-dup clusters: q71's exact pairs fed
# through large-star/small-star connected components (same clustering
# operator as q77, different pair source — text shingles there,
# embedding geometry here). Oracle: recursive-CTE closure over the
# q71 pair SQL.
# ---------------------------------------------------------------------------
@query(
    "q79_cosine_neardup_clusters",
    oracle="""
    WITH RECURSIVE e AS (
      SELECT vec_id, label, i, CAST(CAST(val AS DOUBLE) AS DECIMAL(10,8)) AS v
      FROM (SELECT vec_id, label, unnest(embedding) AS val,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings)
    ),
    dots AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        SUM(a.v * b.v) AS dot, SUM(a.v * a.v) AS na, SUM(b.v * b.v) AS nb
      FROM e a JOIN e b ON a.i = b.i AND a.label = b.label
                        AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM dots
      WHERE FLOOR(CAST(dot AS DOUBLE)
                  / NULLIF(sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)), 0)
                  * 1000000 + 0.5) / 1000000 >= 0.32
    ),
    sym AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM sym
      UNION
      SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u WHERE s.v <> r.u
    ),
    lab AS (
      SELECT u AS id, LEAST(u, MIN(v)) AS comp FROM reach GROUP BY u
    )
    SELECT CAST(comp AS BIGINT) AS comp, COUNT(*) AS n_vecs
    FROM lab GROUP BY comp ORDER BY comp ASC
    """,
)
def q79_cosine_neardup_clusters(spark, sf_dir):
    """Embedding near-dup clusters: exact label-blocked cosine pairs
    (q71's plan) labeled by min-vec-id connected component — the
    semantic-dedup pass of a training pipeline (drop all but one of a
    cluster of near-identical embeddings)."""
    from ..operators.dedup import connected_components

    pairs = q71_cosine_neardup_exact(spark, sf_dir)
    comps = connected_components(pairs)
    return (
        comps.groupBy(F.col("comp").cast("bigint").alias("comp"))
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .orderBy("comp")
    )


# ---------------------------------------------------------------------------
# q106 — int8-quantized inner-product search (§2.D similarity scale
# tier): unit-normalize → round(127·v) → INTEGER dot ranking. Exact
# integer arithmetic end-to-end after quantization, so the oracle
# replays the ranking bit-for-bit (no float summation-order hazard).
# ---------------------------------------------------------------------------
_Q106_QUERY_IDS = (0, 1, 2)

_Q106_SQL = f"""
    WITH q AS (
      SELECT vec_id,
        list_transform(embedding, x -> CAST(round(127
               * CAST(x AS DOUBLE)
               / sqrt(list_sum(list_transform(embedding,
                   y -> CAST(y AS DOUBLE) * y)))) AS BIGINT)) AS qvec
      FROM embeddings
    ),
    queries AS (
      SELECT vec_id AS query_id, qvec AS qv FROM q
      WHERE vec_id IN {_Q106_QUERY_IDS}
    ),
    cands AS (
      SELECT vec_id AS id, qvec FROM q
      WHERE vec_id NOT IN {_Q106_QUERY_IDS}
    ),
    scored AS (
      SELECT query_id, id,
        list_sum(list_transform(range(1, len(qvec) + 1), i -> qvec[i] * qv[i])) AS qdot
      FROM cands CROSS JOIN queries
    ),
    ranked AS (
      SELECT query_id, id, qdot,
        ROW_NUMBER() OVER (PARTITION BY query_id
                           ORDER BY qdot DESC, id ASC) AS rank
      FROM scored
    )
    SELECT CAST(query_id AS BIGINT) AS query_id, CAST(id AS BIGINT) AS id,
      CAST(qdot AS BIGINT) AS qdot, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 5
    ORDER BY query_id ASC, rank ASC
"""


@query("q106_quantized_dot_topk", oracle=_Q106_SQL)
def q106_quantized_dot_topk(spark, sf_dir):
    """Top-5 per query by int8-quantized dot product
    (operators/similarity.quantized_dot_topk): the 4×-smaller-vectors
    storage tier of similarity search, ranked in exact integer
    arithmetic — deterministic to the bit on both engines."""
    from ..operators.similarity import quantized_dot_topk

    emb = T(spark, sf_dir, "embeddings")
    out = quantized_dot_topk(emb, list(_Q106_QUERY_IDS), k=5)
    return out.select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("id").cast("bigint").alias("id"),
        F.col("qdot").cast("bigint").alias("qdot"),
        "rank",
    ).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# q218 — exact embedding covariance (operators/pca.embedding_
# covariance): the distributed half of PCA under the oracle gate.
# Map-side upper-triangle products, shuffle = d² rows per partition.
# ---------------------------------------------------------------------------
@query(
    "q218_embedding_covariance",
    oracle="""
    WITH flat AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(10,8)) AS x
      FROM embeddings WHERE embedding IS NOT NULL
    ), sums AS (
      SELECT a.i, b.i AS j, SUM(a.x * b.x) AS sxy,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM flat a JOIN flat b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY 1, 2
    ), dsum AS (
      SELECT i AS k, SUM(x) AS sx FROM flat GROUP BY 1
    )
    SELECT s.i, s.j, s.n AS n_rows,
      FLOOR((
        (CAST(s.sxy AS DOUBLE)
         - CAST(di.sx AS DOUBLE) * CAST(dj.sx AS DOUBLE)
           / CAST(s.n AS DOUBLE))
        / (CAST(s.n AS DOUBLE) - 1.0)
      ) * 1000000.0 + 0.5) / 1000000.0 AS cov
    FROM sums s
    JOIN dsum di ON di.k = s.i
    JOIN dsum dj ON dj.k = s.j
    ORDER BY s.i ASC, s.j ASC
    """,
)
def q218_embedding_covariance(spark, sf_dir):
    """Sample covariance of the 64-dim embedding corpus, exact
    decimal sums quantized with the engine-stable FLOOR round. The
    Spark plan never self-joins the corpus: each row emits its
    d(d+1)/2 products map-side and the (i,j) aggregate partial-
    combines before its d²-sized shuffle."""
    from ..operators.pca import embedding_covariance

    emb = T(spark, sf_dir, "embeddings")
    return embedding_covariance(emb, "embedding").orderBy(
        F.asc("i"), F.asc("j")
    )


# ---------------------------------------------------------------------------
# q219 — PCA projection (operators/pca.pca_components/pca_project):
# rows-only by contract (no SQL eigensolver exists to replay the
# LAPACK step); invariants are pinned in tests/test_pca.py instead.
# ---------------------------------------------------------------------------
@query("q219_pca_projection")
def q219_pca_projection(spark, sf_dir):
    """Top-2 principal coordinates per vector. The eigensolve is
    local on the d×d covariance (driver-bounded — d does not grow
    with the corpus); the projection is a map-side zip_with fold with
    the component matrix as plan literals. Deterministic end-to-end
    (exact-decimal covariance, LAPACK eigh, fixed sign convention) —
    but not SQL-replayable, hence rows-only."""
    from ..operators.pca import pca_components, pca_project
    from ..operators.similarity import stable_round6

    emb = T(spark, sf_dir, "embeddings")
    _, comps = pca_components(emb, "embedding", k=2)
    return (
        pca_project(emb, comps, "embedding")
        .select(
            "vec_id",
            "label",
            stable_round6(F.col("pc1")).alias("pc1"),
            stable_round6(F.col("pc2")).alias("pc2"),
        )
        .orderBy(F.asc("vec_id"))
    )


# ---------------------------------------------------------------------------
# q228 — MMR diversification under the oracle gate: the greedy rerank
# runs on the int8-quantized tier (integer dots — no float summation-
# order hazard), so DuckDB replays the k greedy steps as unrolled
# CTEs bit-for-bit. Companion to rows-only q148 (cosine MMR): same
# operator, exact tier.
# ---------------------------------------------------------------------------
_Q228_IDS = (0, 1, 2)
_Q228_DOT = ("list_sum(list_transform(range(1, len(a.qvec) + 1), "
             "i -> a.qvec[i] * b.qvec[i]))")

_Q237_SQL = f"""
    WITH q AS (
      SELECT vec_id,
        list_transform(embedding, x -> CAST(round(127
               * CAST(x AS DOUBLE)
               / sqrt(list_sum(list_transform(embedding,
                   y -> CAST(y AS DOUBLE) * y)))) AS BIGINT)) AS qvec
      FROM embeddings
    ),
    queries AS (
      SELECT vec_id AS query_id, qvec AS qv FROM q
      WHERE vec_id IN {_Q228_IDS}
    ),
    scored AS (
      SELECT query_id, c.vec_id AS id, c.qvec,
        list_sum(list_transform(range(1, len(c.qvec) + 1),
                 i -> c.qvec[i] * qv[i]))
          AS qdot
      FROM q c CROSS JOIN queries
      WHERE c.vec_id NOT IN {_Q228_IDS}
    ),
    short AS (
      SELECT * FROM scored
      QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY qdot DESC, id ASC) <= 10
    ),
    pair AS (
      SELECT a.query_id, a.id AS ia, b.id AS ib, {_Q228_DOT} AS dot
      FROM short a JOIN short b ON a.query_id = b.query_id
    ),
    pick1 AS (
      SELECT query_id, id, 0.5 * qdot AS mmr FROM short
      QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY 0.5 * qdot DESC, id ASC) = 1
    ),
    rem1 AS (
      SELECT s.* FROM short s
      ANTI JOIN pick1 p ON s.query_id = p.query_id AND s.id = p.id
    ),
    sc2 AS (
      SELECT r.query_id, r.id,
        0.5 * r.qdot - 0.5 * p.dot AS mmr
      FROM rem1 r
      JOIN pick1 p1 ON r.query_id = p1.query_id
      JOIN pair p ON p.query_id = r.query_id AND p.ia = r.id
        AND p.ib = p1.id
    ),
    pick2 AS (
      SELECT query_id, id, mmr FROM sc2
      QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY mmr DESC, id ASC) = 1
    ),
    rem2 AS (
      SELECT r.* FROM rem1 r
      ANTI JOIN pick2 p ON r.query_id = p.query_id AND r.id = p.id
    ),
    sc3 AS (
      SELECT r.query_id, r.id,
        0.5 * r.qdot - 0.5 * GREATEST(pa.dot, pb.dot) AS mmr
      FROM rem2 r
      JOIN pick1 p1 ON r.query_id = p1.query_id
      JOIN pick2 p2 ON r.query_id = p2.query_id
      JOIN pair pa ON pa.query_id = r.query_id AND pa.ia = r.id
        AND pa.ib = p1.id
      JOIN pair pb ON pb.query_id = r.query_id AND pb.ia = r.id
        AND pb.ib = p2.id
    ),
    pick3 AS (
      SELECT query_id, id, mmr FROM sc3
      QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY mmr DESC, id ASC) = 1
    ),
    final AS (
      SELECT query_id, 1 AS mmr_rank, id, mmr FROM pick1
      UNION ALL SELECT query_id, 2, id, mmr FROM pick2
      UNION ALL SELECT query_id, 3, id, mmr FROM pick3
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
      CAST(mmr_rank AS INT) AS mmr_rank,
      CAST(id AS BIGINT) AS id,
      CAST(mmr AS DOUBLE) AS mmr_score
    FROM final
    ORDER BY query_id ASC, mmr_rank ASC
"""


@query("q237_mmr_quantized_rerank", oracle=_Q237_SQL)
def q237_mmr_quantized_rerank(spark, sf_dir):
    """MMR (k=3, λ=0.5) over the top-10 int8-quantized shortlist per
    query (operators/similarity.mmr_rerank, normalize=False): every
    relevance and redundancy term is an exact integer dot, so the
    greedy selection — the part q148 declares rows-only — sits fully
    inside the value-hash gate, unrolled as chained CTEs on the
    oracle side (the q159 kmeans discipline)."""
    from ..operators.similarity import (
        mmr_rerank,
        quantize_embeddings,
        quantized_dot_topk,
    )

    emb = T(spark, sf_dir, "embeddings")
    short = quantized_dot_topk(emb, list(_Q228_IDS), k=10)
    qv = quantize_embeddings(emb)
    cand = short.join(qv, "id").select(
        "query_id", "id", "qvec", F.col("qdot").cast("double").alias("qdot")
    )
    out = mmr_rerank(
        cand, k=3, lam=0.5, query_col="query_id", id_col="id",
        vec_col="qvec", score_col="qdot", normalize=False,
    )
    return out.select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("mmr_rank").cast("int").alias("mmr_rank"),
        F.col("id").cast("bigint").alias("id"),
        F.col("mmr_score").cast("double").alias("mmr_score"),
    ).orderBy("query_id", "mmr_rank")


# ---------------------------------------------------------------------------
# q238 / q239 — the md5-deterministic ANN tiers, INSIDE the hash gate:
# engine-replayable twins of rows-only q54 (seeded LSH) and q68
# (k-means IVF). All randomness from md5, all scoring in int8 INTEGER
# dots, so DuckDB reproduces bucketing, probing AND ranking
# bit-for-bit.
# ---------------------------------------------------------------------------
_ANN_QUERY_IDS = (0, 1, 2, 3)
_ANN_TABLES = 8
_ANN_PLANES = 4
_ANN_DIM = 64

_QUANT_CTE = """
      SELECT vec_id,
        list_transform(embedding, x -> CAST(round(127
               * CAST(x AS DOUBLE)
               / sqrt(list_sum(list_transform(embedding,
                   y -> CAST(y AS DOUBLE) * y)))) AS BIGINT)) AS qvec
      FROM embeddings
"""

def _ann_md5_sql(
    tables: int, planes: int, dim: int, qids: tuple, k: int = 5
) -> str:
    """Parameterized oracle for ann_md5_topk (shared by q238 and the
    round-8-migrated q54 — two amplification regimes, one SQL)."""
    return f"""
    WITH q AS ({_QUANT_CTE}),
    planes AS (
      SELECT t.t, p.j, i.i,
        CASE WHEN substr(md5(CAST(t.t AS VARCHAR) || ':'
                             || CAST(p.j AS VARCHAR) || ':'
                             || CAST(i.i AS VARCHAR)), 1, 1) < '8'
             THEN 1 ELSE -1 END AS s
      FROM (SELECT unnest(range(0, {tables})) AS t) t
      CROSS JOIN (SELECT unnest(range(0, {planes})) AS j) p
      CROSS JOIN (SELECT unnest(range(0, {dim})) AS i) i
    ),
    comps AS (
      SELECT vec_id, i.i AS i, qvec[i.i + 1] AS c
      FROM q CROSS JOIN (SELECT unnest(range(0, {dim})) AS i) i
    ),
    dots AS (
      SELECT vec_id, t, j, SUM(s * c) AS d
      FROM comps JOIN planes USING (i)
      GROUP BY vec_id, t, j
    ),
    buck AS (
      SELECT vec_id,
        CAST(t AS VARCHAR) || '|' ||
        string_agg(CASE WHEN d >= 0 THEN '1' ELSE '0' END, '' ORDER BY j)
          AS bucket
      FROM dots GROUP BY vec_id, t
    ),
    qb AS (
      SELECT vec_id AS query_id, bucket FROM buck
      WHERE vec_id IN {qids}
    ),
    cb AS (
      SELECT vec_id AS id, bucket FROM buck
      WHERE vec_id NOT IN {qids}
    ),
    pairs AS (
      SELECT DISTINCT query_id, id FROM cb JOIN qb USING (bucket)
    ),
    scored AS (
      SELECT p.query_id, p.id,
        list_sum(list_transform(range(1, len(a.qvec) + 1),
                 i -> a.qvec[i] * b.qvec[i])) AS qdot
      FROM pairs p
      JOIN q a ON a.vec_id = p.id
      JOIN q b ON b.vec_id = p.query_id
    ),
    ranked AS (
      SELECT query_id, id, qdot,
        ROW_NUMBER() OVER (PARTITION BY query_id
                           ORDER BY qdot DESC, id ASC) AS rank
      FROM scored
    )
    SELECT CAST(query_id AS BIGINT) AS query_id, CAST(id AS BIGINT) AS id,
      CAST(qdot AS BIGINT) AS qdot, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {k}
    ORDER BY query_id ASC, rank ASC
"""


_Q238_SQL = _ann_md5_sql(_ANN_TABLES, _ANN_PLANES, _ANN_DIM, _ANN_QUERY_IDS)


@query("q238_ann_md5_topk", oracle=_Q238_SQL)
def q238_ann_md5_topk(spark, sf_dir):
    """operators/similarity.ann_md5_topk: 8-table sign-hyperplane LSH
    on the md5 plane family over int8-quantized vectors, OR'd
    bucket-routed candidates, INTEGER-dot rerank — the full
    amplified-LSH ANN plan value-hash checked against DuckDB (the
    rows-only seeded twin is q54). Measured recall@5 vs the exact
    integer-dot ranking: 0.75 at sf0.001 (tests/test_ann_md5.py pins
    >= 0.6)."""
    from ..operators.similarity import ann_md5_topk

    emb = T(spark, sf_dir, "embeddings")
    return ann_md5_topk(
        emb, query_ids=list(_ANN_QUERY_IDS), k=5,
        num_tables=_ANN_TABLES, num_planes=_ANN_PLANES, dim=_ANN_DIM,
    ).select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("id").cast("bigint").alias("id"),
        F.col("qdot").cast("bigint").alias("qdot"),
        F.col("rank").cast("int").alias("rank"),
    )


_IVF_CELLS = 16
_IVF_PROBE = 6


def _ivf_md5_sql(cells: int, probe: int, qids: tuple, k: int = 5) -> str:
    """Parameterized oracle for ivf_md5_topk (shared by q239 and the
    round-8-migrated q68 — two cell/probe regimes, one SQL)."""
    return f"""
    WITH q AS ({_QUANT_CTE}),
    seeds AS (
      SELECT vec_id AS seed_id, qvec AS seed_qvec
      FROM q
      ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
      LIMIT {cells}
    ),
    scored_seed AS (
      SELECT q.vec_id AS id, q.qvec, s.seed_id,
        list_sum(list_transform(range(1, len(q.qvec) + 1),
                 i -> q.qvec[i] * s.seed_qvec[i])) AS sdot
      FROM q CROSS JOIN seeds s
    ),
    assigned AS (
      SELECT id, qvec, seed_id AS cell FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                    ORDER BY sdot DESC, seed_id ASC) AS rn
        FROM scored_seed) WHERE rn = 1
    ),
    probes AS (
      SELECT id AS query_id, qvec AS qv, seed_id AS cell FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                    ORDER BY sdot DESC, seed_id ASC) AS rn
        FROM scored_seed WHERE id IN {qids})
      WHERE rn <= {probe}
    ),
    scored AS (
      SELECT p.query_id, c.id,
        list_sum(list_transform(range(1, len(c.qvec) + 1),
                 i -> c.qvec[i] * p.qv[i])) AS qdot
      FROM assigned c JOIN probes p ON c.cell = p.cell
      WHERE c.id NOT IN {qids}
    ),
    ranked AS (
      SELECT query_id, id, qdot,
        ROW_NUMBER() OVER (PARTITION BY query_id
                           ORDER BY qdot DESC, id ASC) AS rank
      FROM scored
    )
    SELECT CAST(query_id AS BIGINT) AS query_id, CAST(id AS BIGINT) AS id,
      CAST(qdot AS BIGINT) AS qdot, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {k}
    ORDER BY query_id ASC, rank ASC
"""


_Q239_SQL = _ivf_md5_sql(_IVF_CELLS, _IVF_PROBE, _ANN_QUERY_IDS)


@query("q239_ivf_md5_topk", oracle=_Q239_SQL)
def q239_ivf_md5_topk(spark, sf_dir):
    """operators/similarity.ivf_md5_topk: IVF with md5-sampled seed
    centroids, INTEGER-dot cell assignment, 6-of-16 probing, and
    in-cell rerank — the full IVF plan value-hash checked against
    DuckDB (the rows-only k-means twin is q68). Measured recall@5 vs
    exact: 0.65 at sf0.001 (tests/test_ann_md5.py pins >= 0.5)."""
    from ..operators.similarity import ivf_md5_topk

    emb = T(spark, sf_dir, "embeddings")
    return ivf_md5_topk(
        emb, query_ids=list(_ANN_QUERY_IDS), k=5,
        num_cells=_IVF_CELLS, n_probe=_IVF_PROBE,
    ).select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("id").cast("bigint").alias("id"),
        F.col("qdot").cast("bigint").alias("qdot"),
        F.col("rank").cast("int").alias("rank"),
    )


# ---------------------------------------------------------------------------
# q54 / q68 — MIGRATED INTO THE HASH GATE in round 8 (VERDICT r7 task
# 6): formerly the numpy-seeded rows-only variants, now the md5 tiers
# at a SECOND operating point each (q54: 4 tables × 6 planes — deeper,
# narrower buckets than q238's 8×4; q68: 12 cells / 3 probes vs q239's
# 16/6 — a stricter probe budget), different query vectors. The seeded
# originals (operators/similarity.ann_topk / ivf_topk) remain the
# production paths, exercised by unit tests.
# ---------------------------------------------------------------------------
_Q54_TABLES = 4
_Q54_PLANES = 6
_Q54_QUERY_IDS = (4, 5, 6, 7)


@query(
    "q54_ann_lsh_topk",
    oracle=_ann_md5_sql(_Q54_TABLES, _Q54_PLANES, _ANN_DIM, _Q54_QUERY_IDS),
)
def q54_ann_lsh_topk(spark, sf_dir):
    """LSH-bucketed ANN top-5: md5 sign-plane routing (4×6 — the
    few-tables/many-planes amplification regime) + exact int8 integer
    rerank, DuckDB-replayable end to end."""
    from ..operators.similarity import ann_md5_topk

    emb = T(spark, sf_dir, "embeddings")
    return ann_md5_topk(
        emb, query_ids=list(_Q54_QUERY_IDS), k=5,
        num_tables=_Q54_TABLES, num_planes=_Q54_PLANES, dim=_ANN_DIM,
    ).select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("id").cast("bigint").alias("id"),
        F.col("qdot").cast("bigint").alias("qdot"),
        F.col("rank").cast("int").alias("rank"),
    )


_Q68_CELLS = 12
_Q68_PROBE = 3


@query(
    "q68_ivf_ann_topk",
    oracle=_ivf_md5_sql(_Q68_CELLS, _Q68_PROBE, _Q54_QUERY_IDS),
)
def q68_ivf_ann_topk(spark, sf_dir):
    """IVF ANN top-5: md5-sampled coarse centroids, integer-dot cell
    assignment, 3-of-12 probing (the strict-probe-budget regime next
    to q239's 6-of-16), in-cell exact rerank — value-hash checked."""
    from ..operators.similarity import ivf_md5_topk

    emb = T(spark, sf_dir, "embeddings")
    return ivf_md5_topk(
        emb, query_ids=list(_Q54_QUERY_IDS), k=5,
        num_cells=_Q68_CELLS, n_probe=_Q68_PROBE,
    ).select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("id").cast("bigint").alias("id"),
        F.col("qdot").cast("bigint").alias("qdot"),
        F.col("rank").cast("int").alias("rank"),
    )


# ---------------------------------------------------------------------------
# q260 — first principal component by POWER ITERATION, fully inside
# the hash gate (the rows-only q219 eigensolve's replayable twin):
# exact-decimal covariance → 6 relational v ← Cv/‖Cv‖ rounds (sorted
# folds, floor-quantized) → sign convention → corpus projection.
# Every round is corpus-independent (d×d relation only).
# ---------------------------------------------------------------------------
_Q260_ITERS = 6
_Q260_D = 64


def _q260_oracle() -> str:
    sql = f"""
    WITH flat AS MATERIALIZED (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(10,8)) AS x
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    sums AS MATERIALIZED (
      SELECT a.i, b.i AS j, SUM(a.x * b.x) AS sxy,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM flat a JOIN flat b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY 1, 2
    ),
    dsum AS MATERIALIZED (
      SELECT i AS k, SUM(x) AS sx FROM flat GROUP BY 1
    ),
    covu AS MATERIALIZED (
      SELECT s.i, s.j,
        FLOOR((
          (CAST(s.sxy AS DOUBLE)
           - CAST(di.sx AS DOUBLE) * CAST(dj.sx AS DOUBLE)
             / CAST(s.n AS DOUBLE))
          / (CAST(s.n AS DOUBLE) - 1.0)
        ) * 1000000.0 + 0.5) / 1000000.0 AS cov
      FROM sums s
      JOIN dsum di ON di.k = s.i
      JOIN dsum dj ON dj.k = s.j
    ),
    covf AS MATERIALIZED (
      SELECT i, j, cov FROM covu
      UNION ALL SELECT j AS i, i AS j, cov FROM covu WHERE i <> j
    ),
    v0 AS MATERIALIZED (
      SELECT unnest(range(1, {_Q260_D + 1})) AS k, CAST(1.0 AS DOUBLE) AS v
    )"""
    for t in range(1, _Q260_ITERS + 1):
        sql += f""",
    w{t} AS MATERIALIZED (
      SELECT c.i AS k,
        FLOOR(list_sum(list_sort(list(c.cov * p.v))) * 1e9) / 1e9 AS w
      FROM covf c JOIN v{t - 1} p ON p.k = c.j GROUP BY c.i
    ),
    n{t} AS MATERIALIZED (
      SELECT FLOOR(sqrt(list_sum(list_sort(list(w * w)))) * 1e9) / 1e9
        AS nn
      FROM w{t}
    ),
    v{t} AS MATERIALIZED (
      SELECT k, FLOOR(w / nn * 1e9) / 1e9 AS v
      FROM w{t} CROSS JOIN n{t}
    )"""
    sql += f""",
    piv AS MATERIALIZED (
      SELECT CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS sgn
      FROM v{_Q260_ITERS} ORDER BY ABS(v) DESC, k ASC LIMIT 1
    ),
    vs AS MATERIALIZED (
      SELECT k, v * sgn AS v FROM v{_Q260_ITERS} CROSS JOIN piv
    ),
    lamt AS MATERIALIZED (
      SELECT FLOOR(list_sum(list_sort(list(v1.v * c.cov * v2.v))) * 1e9)
        / 1e9 AS lam
      FROM covf c JOIN vs v1 ON v1.k = c.i JOIN vs v2 ON v2.k = c.j
    ),
    flat2 AS MATERIALIZED (
      SELECT vec_id, label, generate_subscripts(embedding, 1) AS k,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    proj AS MATERIALIZED (
      SELECT f.vec_id, f.label,
        FLOOR(list_sum(list_sort(list(f.x * vs.v))) * 1000000.0 + 0.5)
          / 1000000.0 AS score
      FROM flat2 f JOIN vs ON vs.k = f.k
      GROUP BY f.vec_id, f.label
    )
    SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(label AS INT) AS label,
      CAST(score AS DOUBLE) AS score, CAST(lamt.lam AS DOUBLE) AS lam
    FROM proj CROSS JOIN lamt
    ORDER BY score DESC, vec_id ASC
    LIMIT 15
    """
    return sql


@query("q260_pca_power_projection", oracle=_q260_oracle())
def q260_pca_power_projection(spark, sf_dir):
    """operators/pca.power_iteration_pc1 + map-side projection:
    top-15 embeddings along the first principal direction."""
    from ..operators.pca import power_iteration_pc1
    from ..operators.similarity import stable_round6

    emb = T(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    v, lam = power_iteration_pc1(emb, "embedding", iters=_Q260_ITERS)
    vdf = spark.createDataFrame(
        [(k + 1, float(x)) for k, x in enumerate(v)], "k int, v double"
    )
    flat = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("k0", "x")
    ).select(
        "vec_id",
        "label",
        (F.col("k0") + 1).alias("k"),
        F.col("x").cast("double").alias("x"),
    )
    proj = (
        flat.join(F.broadcast(vdf), "k")
        .groupBy("vec_id", "label")
        .agg(
            stable_round6(
                F.aggregate(
                    F.sort_array(F.collect_list(F.col("x") * F.col("v"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ).alias("score")
        )
    )
    return (
        proj.select(
            F.col("vec_id").cast("bigint").alias("vec_id"),
            F.col("label").cast("int").alias("label"),
            F.col("score").cast("double").alias("score"),
            F.lit(float(lam)).cast("double").alias("lam"),
        )
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(15)
    )


# ---------------------------------------------------------------------------
# q320 — product-quantization ANN with exact re-rank (round 9): the
# compression-based scale path (PQ, Jégou et al. 2011). md5-hash-
# order sampled codebooks (the kmeans-c0 discipline), integer encode
# on the ×1e8 grid, ADC table lookups shortlist 100 candidates per
# query, exact integer squared-Euclidean re-ranks the final 10 —
# every distance exact, the whole tier value-hash gated.
# ---------------------------------------------------------------------------
_PQ_M, _PQ_K, _PQ_DSUB, _PQ_SHORT, _PQ_NN = 16, 16, 4, 100, 10
_PQ_QUERIES = (0, 1, 2, 3)


@query(
    "q320_pq_adc_rerank_topk",
    oracle=f"""
    WITH xe AS (
      SELECT vec_id, i,
        CAST(CAST(CAST(val AS DOUBLE) AS DECIMAL(10,8)) * 100000000
             AS BIGINT) AS x
      FROM (SELECT vec_id, unnest(embedding) AS val,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings)
    ),
    cb_ids AS (
      SELECT vec_id,
        row_number() OVER (
          ORDER BY md5('pq' || CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
        ) AS h
      FROM embeddings QUALIFY h <= {_PQ_K}
    ),
    cb AS (
      SELECT c.h, xe.i, xe.x,
        CAST((xe.i - 1) // {_PQ_DSUB} AS INT) AS j
      FROM xe JOIN cb_ids c USING (vec_id)
    ),
    enc AS (
      SELECT e.vec_id, c.j, c.h,
        CAST(SUM((e.x - c.x) * (e.x - c.x)) AS BIGINT) AS d
      FROM xe e JOIN cb c ON c.i = e.i
      GROUP BY 1, 2, 3
    ),
    codes AS (
      SELECT vec_id, j, h FROM (
        SELECT vec_id, j, h,
          row_number() OVER (
            PARTITION BY vec_id, j ORDER BY d ASC, h ASC
          ) AS rn
        FROM enc) WHERE rn = 1
    ),
    qtab AS (
      SELECT qe.vec_id AS query_id, c.j, c.h,
        CAST(SUM((qe.x - c.x) * (qe.x - c.x)) AS BIGINT) AS t
      FROM xe qe JOIN cb c ON c.i = qe.i
      WHERE qe.vec_id IN {_PQ_QUERIES}
      GROUP BY 1, 2, 3
    ),
    adc AS (
      SELECT q.query_id, codes.vec_id,
        CAST(SUM(q.t) AS BIGINT) AS pq_dist
      FROM codes JOIN qtab q ON q.j = codes.j AND q.h = codes.h
      WHERE codes.vec_id <> q.query_id
      GROUP BY 1, 2
    ),
    short AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
          row_number() OVER (
            PARTITION BY query_id ORDER BY pq_dist ASC, vec_id ASC
          ) AS rn
        FROM adc) WHERE rn <= {_PQ_SHORT}
    ),
    ex AS (
      SELECT s.query_id, s.vec_id,
        CAST(SUM((e.x - qx.x) * (e.x - qx.x)) AS BIGINT) AS dist
      FROM short s
      JOIN xe e ON e.vec_id = s.vec_id
      JOIN xe qx ON qx.vec_id = s.query_id AND qx.i = e.i
      GROUP BY 1, 2
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
      CAST(vec_id AS BIGINT) AS vec_id, dist, CAST(rn AS INT) AS rank
    FROM (
      SELECT query_id, vec_id, dist,
        row_number() OVER (
          PARTITION BY query_id ORDER BY dist ASC, vec_id ASC
        ) AS rn
      FROM ex) WHERE rn <= {_PQ_NN}
    ORDER BY query_id ASC, rank ASC
    """,
)
def q320_pq_adc_rerank_topk(spark, sf_dir):
    """operators/similarity.pq_rerank_topk: PQ-coded shortlist (m=16
    subspaces x 16 codes, sampled codebooks) + exact integer
    re-rank — approximate pruning, exact ordering, fully gated."""
    from ..operators.similarity import pq_rerank_topk

    emb = T(spark, sf_dir, "embeddings")
    out = pq_rerank_topk(
        emb, list(_PQ_QUERIES), k_nn=_PQ_NN, shortlist=_PQ_SHORT,
        m=_PQ_M, k=_PQ_K, salt="pq",
    )
    return out.select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("id").cast("bigint").alias("vec_id"),
        F.col("dist").cast("bigint").alias("dist"),
        F.col("rank").cast("int").alias("rank"),
    ).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# q321 — IVF-PQ (round 9): the production ANN index architecture
# (FAISS IndexIVFPQ) as a COMPOSITION of the two gated tiers — q239's
# md5-seeded IVF coarse routing (int8-by-norm grid) + q320's PQ
# code/ADC machinery (×1e8 grid) + exact integer re-rank. Queries
# probe 4 of 16 cells; ADC shortlists 100 within the probed cells;
# the final 10 rank by exact squared Euclidean. Every number integer.
# ---------------------------------------------------------------------------
_IVFPQ_CELLS, _IVFPQ_PROBE = 16, 4
_IVFPQ_QIDS = (0, 1, 2, 3)


@query(
    "q321_ivf_pq_topk",
    oracle=f"""
    WITH qn AS ({_QUANT_CTE}),
    seeds AS (
      SELECT vec_id AS seed_id, qvec AS seed_qvec
      FROM qn
      ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
      LIMIT {_IVFPQ_CELLS}
    ),
    scored_seed AS (
      SELECT q.vec_id AS id, s.seed_id,
        list_sum(list_transform(range(1, len(q.qvec) + 1),
                 i -> q.qvec[i] * s.seed_qvec[i])) AS sdot
      FROM qn q CROSS JOIN seeds s
    ),
    assigned AS (
      SELECT id, seed_id AS cell FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                    ORDER BY sdot DESC, seed_id ASC) AS rn
        FROM scored_seed) WHERE rn = 1
    ),
    probes AS (
      SELECT id AS query_id, seed_id AS cell FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                    ORDER BY sdot DESC, seed_id ASC) AS rn
        FROM scored_seed WHERE id IN {_IVFPQ_QIDS})
      WHERE rn <= {_IVFPQ_PROBE}
    ),
    xe AS (
      SELECT vec_id, i,
        CAST(CAST(CAST(val AS DOUBLE) AS DECIMAL(10,8)) * 100000000
             AS BIGINT) AS x
      FROM (SELECT vec_id, unnest(embedding) AS val,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings)
    ),
    cb_ids AS (
      SELECT vec_id,
        row_number() OVER (
          ORDER BY md5('pq' || CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
        ) AS h
      FROM embeddings QUALIFY h <= {_PQ_K}
    ),
    cb AS (
      SELECT c.h, xe.i, xe.x,
        CAST((xe.i - 1) // {_PQ_DSUB} AS INT) AS j
      FROM xe JOIN cb_ids c USING (vec_id)
    ),
    enc AS (
      SELECT e.vec_id, c.j, c.h,
        CAST(SUM((e.x - c.x) * (e.x - c.x)) AS BIGINT) AS d
      FROM xe e JOIN cb c ON c.i = e.i
      GROUP BY 1, 2, 3
    ),
    codes AS (
      SELECT vec_id, j, h FROM (
        SELECT vec_id, j, h,
          row_number() OVER (
            PARTITION BY vec_id, j ORDER BY d ASC, h ASC
          ) AS rn
        FROM enc) WHERE rn = 1
    ),
    qtab AS (
      SELECT qe.vec_id AS query_id, c.j, c.h,
        CAST(SUM((qe.x - c.x) * (qe.x - c.x)) AS BIGINT) AS t
      FROM xe qe JOIN cb c ON c.i = qe.i
      WHERE qe.vec_id IN {_IVFPQ_QIDS}
      GROUP BY 1, 2, 3
    ),
    member AS (
      SELECT p.query_id, a.id
      FROM assigned a JOIN probes p ON a.cell = p.cell
      WHERE a.id <> p.query_id
    ),
    adc AS (
      SELECT m.query_id, m.id AS vec_id,
        CAST(SUM(q.t) AS BIGINT) AS pq_dist
      FROM member m
      JOIN codes c ON c.vec_id = m.id
      JOIN qtab q ON q.query_id = m.query_id
                 AND q.j = c.j AND q.h = c.h
      GROUP BY 1, 2
    ),
    short AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
          row_number() OVER (
            PARTITION BY query_id ORDER BY pq_dist ASC, vec_id ASC
          ) AS rn
        FROM adc) WHERE rn <= {_PQ_SHORT}
    ),
    ex AS (
      SELECT s.query_id, s.vec_id,
        CAST(SUM((e.x - qx.x) * (e.x - qx.x)) AS BIGINT) AS dist
      FROM short s
      JOIN xe e ON e.vec_id = s.vec_id
      JOIN xe qx ON qx.vec_id = s.query_id AND qx.i = e.i
      GROUP BY 1, 2
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
      CAST(vec_id AS BIGINT) AS vec_id, dist, CAST(rn AS INT) AS rank
    FROM (
      SELECT query_id, vec_id, dist,
        row_number() OVER (
          PARTITION BY query_id ORDER BY dist ASC, vec_id ASC
        ) AS rn
      FROM ex) WHERE rn <= {_PQ_NN}
    ORDER BY query_id ASC, rank ASC
    """,
)
def q321_ivf_pq_topk(spark, sf_dir):
    """operators/similarity.ivf_pq_topk: coarse IVF routing + PQ ADC
    within probed cells + exact re-rank — the full FAISS-style
    composition, value-hash gated end to end."""
    from ..operators.similarity import ivf_pq_topk

    emb = T(spark, sf_dir, "embeddings")
    out = ivf_pq_topk(
        emb, list(_IVFPQ_QIDS), k_nn=_PQ_NN,
        num_cells=_IVFPQ_CELLS, n_probe=_IVFPQ_PROBE,
        m=_PQ_M, k_pq=_PQ_K, shortlist=_PQ_SHORT, salt="pq",
    )
    return out.select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("id").cast("bigint").alias("vec_id"),
        F.col("dist").cast("bigint").alias("dist"),
        F.col("rank").cast("int").alias("rank"),
    ).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# q338 — SemDeDup (round 10): embedding-cluster SEMANTIC dedup (Abbas
# et al. 2023) — md5-seeded coarse cells route the corpus, pairwise
# quantized cosines run WITHIN cells only, >= 0.3 pairs close into
# clusters, and the centroid-nearest member survives. The oracle
# replays the whole composition: int8 cell assignment (the q239/q321
# quantizer), ×1e8 integer Gram cosines (the q53 contract), the
# q77/q333 recursive reachability closure, and the (sdot DESC, id)
# keeper argmax.
# ---------------------------------------------------------------------------
_Q338_THRESHOLD = 0.3
_Q338_CELLS = 16


@query(
    "q338_semdedup_verdicts",
    oracle=f"""
    WITH RECURSIVE qn AS ({_QUANT_CTE}),
    seeds AS (
      SELECT vec_id AS seed_id, qvec AS seed_qvec
      FROM qn
      ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
      LIMIT {_Q338_CELLS}
    ),
    sc AS (
      SELECT q.vec_id AS id, s.seed_id,
        list_sum(list_transform(range(1, len(q.qvec) + 1),
                 i -> q.qvec[i] * s.seed_qvec[i])) AS sdot
      FROM qn q CROSS JOIN seeds s
    ),
    asg AS (
      SELECT id, seed_id AS cell, sdot FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                    ORDER BY sdot DESC, seed_id ASC) AS rn
        FROM sc) WHERE rn = 1
    ),
    fe AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        CAST(CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(10,8))
             * 100000000 AS BIGINT) AS x
      FROM embeddings
    ),
    feq AS (
      SELECT fe.vec_id, fe.i, fe.x, a.cell
      FROM fe JOIN asg a ON a.id = fe.vec_id
    ),
    dots AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        SUM(a.x * b.x) AS d, SUM(a.x * a.x) AS na, SUM(b.x * b.x) AS nb
      FROM feq a JOIN feq b ON a.i = b.i AND a.cell = b.cell
                            AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    ),
    prs AS (
      SELECT id_a, id_b FROM (
        SELECT id_a, id_b,
          FLOOR(CAST(d AS DOUBLE)
                / NULLIF(sqrt(CAST(na AS DOUBLE))
                         * sqrt(CAST(nb AS DOUBLE)), 0)
                * 1000000 + 0.5) / 1000000 AS cosine
        FROM dots)
      WHERE cosine >= {_Q338_THRESHOLD}
    ),
    sym AS (
      SELECT id_a AS u, id_b AS v FROM prs
      UNION
      SELECT id_b AS u, id_a AS v FROM prs
    ),
    reach(u, v) AS (
      SELECT u, v FROM sym
      UNION
      SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
      WHERE s.v <> r.u
    ),
    lab AS (
      SELECT u AS id, LEAST(u, MIN(v)) AS comp FROM reach GROUP BY u
    ),
    mem AS (
      SELECT l.id, l.comp, a.cell, a.sdot
      FROM lab l JOIN asg a ON a.id = l.id
    ),
    keep AS (
      SELECT comp, id AS keeper FROM (
        SELECT comp, id, ROW_NUMBER() OVER (PARTITION BY comp
                    ORDER BY sdot DESC, id ASC) AS rn
        FROM mem) WHERE rn = 1
    )
    SELECT CAST(m.id AS BIGINT) AS vec_id,
      CAST(m.cell AS BIGINT) AS cell,
      CAST(m.comp AS BIGINT) AS comp,
      CAST(k.keeper AS BIGINT) AS keeper,
      CAST(CASE WHEN m.id = k.keeper THEN 1 ELSE 0 END AS INT) AS kept
    FROM mem m JOIN keep k USING (comp)
    ORDER BY vec_id ASC
    """,
)
def q338_semdedup_verdicts(spark, sf_dir):
    """operators/similarity.semdedup_verdicts over embeddings:
    per-clustered-vector semantic-dedup verdicts (cell, cluster
    label, centroid-nearest keeper, kept flag) at cosine >= 0.3 with
    16 md5-seeded coarse cells."""
    from ..operators.similarity import semdedup_verdicts

    emb = T(spark, sf_dir, "embeddings")
    return semdedup_verdicts(
        emb, threshold=_Q338_THRESHOLD, num_cells=_Q338_CELLS
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# q339 — IVF-PQ at the FAISS DEFAULT operating point (round 10,
# VERDICT r9 task 7): residual encoding + Lloyd-refined codebooks.
# The oracle replays the ENTIRE training + search pipeline: int8
# coarse routing (q239), exact-integer residuals to the cell seed,
# per-subspace Lloyd rounds UNROLLED as CTEs (the q159 kmeans
# contract: fixed-order double distances, ROUND-6 decimal means,
# hash-order init with the per-subspace salt), half-away final
# rounding onto the ×1e8 grid (CAST AS BIGINT == operators
# _half_away), integer ADC over probed cells, exact integer re-rank.
# ---------------------------------------------------------------------------
_Q339_ITERS = 2


def _q339_oracle() -> str:
    m, k, d_sub = _PQ_M, _PQ_K, _PQ_DSUB
    dist4 = " + ".join(
        f"(p.x{d} - c.x{d}) * (p.x{d} - c.x{d})" for d in range(d_sub)
    )
    pivot = ", ".join(
        f"MAX(CASE WHEN (i - 1) % {d_sub} = {d} "
        f"THEN CAST(r AS DOUBLE) END) AS x{d}"
        for d in range(d_sub)
    )
    means = ", ".join(
        f"ROUND(CAST(SUM(CAST(x{d} AS DECIMAL(28,2))) AS DOUBLE)"
        f" / CAST(COUNT(*) AS DOUBLE), 6) AS x{d}"
        for d in range(d_sub)
    )
    carry = ", ".join(
        f"COALESCE(u.x{d}, p.x{d}) AS x{d}" for d in range(d_sub)
    )
    unpivot = "\n      UNION ALL\n".join(
        f"      SELECT j, cid AS h, j * {d_sub} + {d} + 1 AS i, "
        f"CAST(x{d} AS BIGINT) AS c FROM kc{_Q339_ITERS}"
        for d in range(d_sub)
    )
    sql = f"""
    WITH qn AS MATERIALIZED ({_QUANT_CTE}),
    seeds AS MATERIALIZED (
      SELECT vec_id AS seed_id, qvec AS seed_qvec
      FROM qn
      ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
      LIMIT {_IVFPQ_CELLS}
    ),
    sc AS MATERIALIZED (
      SELECT q.vec_id AS id, s.seed_id,
        list_sum(list_transform(range(1, len(q.qvec) + 1),
                 i -> q.qvec[i] * s.seed_qvec[i])) AS sdot
      FROM qn q CROSS JOIN seeds s
    ),
    asg AS MATERIALIZED (
      SELECT id, seed_id AS cell FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                    ORDER BY sdot DESC, seed_id ASC) AS rn
        FROM sc) WHERE rn = 1
    ),
    probes AS MATERIALIZED (
      SELECT id AS query_id, seed_id AS cell FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                    ORDER BY sdot DESC, seed_id ASC) AS rn
        FROM sc WHERE id IN {_IVFPQ_QIDS})
      WHERE rn <= {_IVFPQ_PROBE}
    ),
    xe AS MATERIALIZED (
      SELECT vec_id, i,
        CAST(CAST(CAST(val AS DOUBLE) AS DECIMAL(10,8)) * 100000000
             AS BIGINT) AS x
      FROM (SELECT vec_id, unnest(embedding) AS val,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings)
    ),
    res AS MATERIALIZED (
      SELECT a.id AS vec_id, a.cell, e.i, e.x - sx.x AS r
      FROM asg a
      JOIN xe e ON e.vec_id = a.id
      JOIN xe sx ON sx.vec_id = a.cell AND sx.i = e.i
    ),
    rp AS MATERIALIZED (
      SELECT vec_id, CAST((i - 1) // {d_sub} AS INT) AS j, {pivot}
      FROM res GROUP BY 1, 2
    ),
    kc0 AS MATERIALIZED (
      SELECT j, (ROW_NUMBER() OVER (PARTITION BY j ORDER BY
          md5('pq|' || CAST(j AS VARCHAR) || CAST(vec_id AS VARCHAR))
          ASC, vec_id ASC)) - 1 AS cid,
        {", ".join(f"x{d}" for d in range(d_sub))}
      FROM rp
      QUALIFY cid < {k}
    )"""
    for it in range(1, _Q339_ITERS + 1):
        sql += f""",
    ka{it} AS MATERIALIZED (
      SELECT j, vec_id, cid FROM (
        SELECT p.j, p.vec_id, c.cid,
          ROW_NUMBER() OVER (PARTITION BY p.j, p.vec_id
            ORDER BY {dist4} ASC, c.cid ASC) AS rn
        FROM rp p JOIN kc{it - 1} c ON c.j = p.j
      ) WHERE rn = 1
    ),
    ku{it} AS MATERIALIZED (
      SELECT a.j, a.cid, {means}
      FROM ka{it} a JOIN rp p ON p.j = a.j AND p.vec_id = a.vec_id
      GROUP BY a.j, a.cid
    ),
    kc{it} AS MATERIALIZED (
      SELECT p.j, p.cid, {carry}
      FROM kc{it - 1} p
      LEFT JOIN ku{it} u ON u.j = p.j AND u.cid = p.cid
    )"""
    sql += f""",
    cbr AS MATERIALIZED (
{unpivot}
    ),
    enc AS MATERIALIZED (
      SELECT r.vec_id, c.j, c.h,
        CAST(SUM((r.r - c.c) * (r.r - c.c)) AS BIGINT) AS d
      FROM res r JOIN cbr c ON c.i = r.i
      GROUP BY 1, 2, 3
    ),
    codes AS MATERIALIZED (
      SELECT vec_id, j, h FROM (
        SELECT vec_id, j, h,
          ROW_NUMBER() OVER (PARTITION BY vec_id, j
                             ORDER BY d ASC, h ASC) AS rn
        FROM enc) WHERE rn = 1
    ),
    qres AS MATERIALIZED (
      SELECT p.query_id, p.cell, e.i, e.x - sx.x AS r
      FROM probes p
      JOIN xe e ON e.vec_id = p.query_id
      JOIN xe sx ON sx.vec_id = p.cell AND sx.i = e.i
    ),
    qtab AS MATERIALIZED (
      SELECT q.query_id, q.cell, c.j, c.h,
        CAST(SUM((q.r - c.c) * (q.r - c.c)) AS BIGINT) AS t
      FROM qres q JOIN cbr c ON c.i = q.i
      GROUP BY 1, 2, 3, 4
    ),
    member AS MATERIALIZED (
      SELECT p.query_id, p.cell, a.id
      FROM asg a JOIN probes p ON a.cell = p.cell
      WHERE a.id <> p.query_id
    ),
    adc AS MATERIALIZED (
      SELECT m.query_id, m.id AS vec_id,
        CAST(SUM(q.t) AS BIGINT) AS pq_dist
      FROM member m
      JOIN codes c ON c.vec_id = m.id
      JOIN qtab q ON q.query_id = m.query_id AND q.cell = m.cell
                 AND q.j = c.j AND q.h = c.h
      GROUP BY 1, 2
    ),
    short AS MATERIALIZED (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
          ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY pq_dist ASC, vec_id ASC) AS rn
        FROM adc) WHERE rn <= {_PQ_SHORT}
    ),
    ex AS MATERIALIZED (
      SELECT s.query_id, s.vec_id,
        CAST(SUM((e.x - qx.x) * (e.x - qx.x)) AS BIGINT) AS dist
      FROM short s
      JOIN xe e ON e.vec_id = s.vec_id
      JOIN xe qx ON qx.vec_id = s.query_id AND qx.i = e.i
      GROUP BY 1, 2
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
      CAST(vec_id AS BIGINT) AS vec_id, dist, CAST(rn AS INT) AS rank
    FROM (
      SELECT query_id, vec_id, dist,
        ROW_NUMBER() OVER (PARTITION BY query_id
                           ORDER BY dist ASC, vec_id ASC) AS rn
      FROM ex) WHERE rn <= {_PQ_NN}
    ORDER BY query_id ASC, rank ASC
    """
    return sql


@query("q339_ivf_pq_residual_topk", oracle=_q339_oracle())
def q339_ivf_pq_residual_topk(spark, sf_dir):
    """operators/similarity.ivf_pq_residual_topk: the FAISS-default
    IVF-PQ — Lloyd-refined codebooks trained on cell residuals, ADC
    within probed cells, exact re-rank — hash-gated end to end
    including the codebook TRAINING (unrolled Lloyd in the oracle)."""
    from ..operators.similarity import ivf_pq_residual_topk

    emb = T(spark, sf_dir, "embeddings")
    out = ivf_pq_residual_topk(
        emb, list(_IVFPQ_QIDS), k_nn=_PQ_NN,
        num_cells=_IVFPQ_CELLS, n_probe=_IVFPQ_PROBE,
        m=_PQ_M, k_pq=_PQ_K, shortlist=_PQ_SHORT, salt="pq",
        n_iter=_Q339_ITERS,
    )
    return out.select(
        "query_id",
        F.col("id").cast("bigint").alias("vec_id"),
        F.col("dist").cast("bigint").alias("dist"),
        "rank",
    ).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# q341 — SemDeDup with the PAPER's k-means coarse quantizer (round 11,
# VERDICT r10 task 3): the q338 composition with Lloyd-refined cells
# (md5 init IS iteration 0), argmin-euclidean assignment, and the
# closest-to-centroid keeper rule. The oracle replays the ENTIRE
# chain: int8 quantization, the unrolled q159-contract Lloyd rounds
# (fixed-order double distances over all 64 dims, ROUND-6 decimal
# means, hash-order init), final argmin assignment with its fdist,
# ×1e8 integer Gram cosines within cells, the recursive reachability
# closure, and the (fdist ASC, id ASC) keeper argmin.
# ---------------------------------------------------------------------------
_Q341_THRESHOLD = 0.3
_Q341_CELLS = 16
_Q341_ITERS = 2


def _q341_oracle() -> str:
    dim, k = _ANN_DIM, _Q341_CELLS
    xs = ", ".join(
        f"CAST(qvec[{d + 1}] AS DOUBLE) AS x{d}" for d in range(dim)
    )
    dist = " + ".join(
        f"(p.x{d} - c.x{d}) * (p.x{d} - c.x{d})" for d in range(dim)
    )
    means = ", ".join(
        f"ROUND(CAST(SUM(CAST(x{d} AS DECIMAL(28,2))) AS DOUBLE)"
        f" / CAST(COUNT(*) AS DOUBLE), 6) AS x{d}"
        for d in range(dim)
    )
    carry = ", ".join(
        f"COALESCE(u.x{d}, p.x{d}) AS x{d}" for d in range(dim)
    )
    sql = f"""
    WITH RECURSIVE qn AS MATERIALIZED ({_QUANT_CTE}),
    rp AS MATERIALIZED (SELECT vec_id, {xs} FROM qn),
    kc0 AS MATERIALIZED (
      SELECT (ROW_NUMBER() OVER (ORDER BY
          md5('semdedup|0' || CAST(vec_id AS VARCHAR)) ASC,
          vec_id ASC)) - 1 AS cid,
        {", ".join(f"x{d}" for d in range(dim))}
      FROM rp
      QUALIFY cid < {k}
    )"""
    for it in range(1, _Q341_ITERS + 1):
        sql += f""",
    ka{it} AS MATERIALIZED (
      SELECT vec_id, cid FROM (
        SELECT p.vec_id, c.cid,
          ROW_NUMBER() OVER (PARTITION BY p.vec_id
            ORDER BY {dist} ASC, c.cid ASC) AS rn
        FROM rp p CROSS JOIN kc{it - 1} c
      ) WHERE rn = 1
    ),
    ku{it} AS MATERIALIZED (
      SELECT a.cid, {means}
      FROM ka{it} a JOIN rp p ON p.vec_id = a.vec_id
      GROUP BY a.cid
    ),
    kc{it} AS MATERIALIZED (
      SELECT p.cid, {carry}
      FROM kc{it - 1} p
      LEFT JOIN ku{it} u ON u.cid = p.cid
    )"""
    sql += f""",
    fa AS MATERIALIZED (
      SELECT vec_id, cid AS cell, dist AS fdist FROM (
        SELECT p.vec_id, c.cid, {dist} AS dist,
          ROW_NUMBER() OVER (PARTITION BY p.vec_id
            ORDER BY {dist} ASC, c.cid ASC) AS rn
        FROM rp p CROSS JOIN kc{_Q341_ITERS} c
      ) WHERE rn = 1
    ),
    fe AS MATERIALIZED (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        CAST(CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(10,8))
             * 100000000 AS BIGINT) AS x
      FROM embeddings
    ),
    feq AS MATERIALIZED (
      SELECT fe.vec_id, fe.i, fe.x, a.cell
      FROM fe JOIN fa a ON a.vec_id = fe.vec_id
    ),
    dots AS MATERIALIZED (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        SUM(a.x * b.x) AS d, SUM(a.x * a.x) AS na, SUM(b.x * b.x) AS nb
      FROM feq a JOIN feq b ON a.i = b.i AND a.cell = b.cell
                            AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    ),
    prs AS MATERIALIZED (
      SELECT id_a, id_b FROM (
        SELECT id_a, id_b,
          FLOOR(CAST(d AS DOUBLE)
                / NULLIF(sqrt(CAST(na AS DOUBLE))
                         * sqrt(CAST(nb AS DOUBLE)), 0)
                * 1000000 + 0.5) / 1000000 AS cosine
        FROM dots)
      WHERE cosine >= {_Q341_THRESHOLD}
    ),
    sym AS (
      SELECT id_a AS u, id_b AS v FROM prs
      UNION
      SELECT id_b AS u, id_a AS v FROM prs
    ),
    reach(u, v) AS (
      SELECT u, v FROM sym
      UNION
      SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
      WHERE s.v <> r.u
    ),
    lab AS (
      SELECT u AS id, LEAST(u, MIN(v)) AS comp FROM reach GROUP BY u
    ),
    mem AS (
      SELECT l.id, l.comp, a.cell, a.fdist
      FROM lab l JOIN fa a ON a.vec_id = l.id
    ),
    keep AS (
      SELECT comp, id AS keeper FROM (
        SELECT comp, id, ROW_NUMBER() OVER (PARTITION BY comp
                    ORDER BY fdist ASC, id ASC) AS rn
        FROM mem) WHERE rn = 1
    )
    SELECT CAST(m.id AS BIGINT) AS vec_id,
      CAST(m.cell AS BIGINT) AS cell,
      CAST(m.comp AS BIGINT) AS comp,
      CAST(k.keeper AS BIGINT) AS keeper,
      CAST(CASE WHEN m.id = k.keeper THEN 1 ELSE 0 END AS INT) AS kept
    FROM mem m JOIN keep k USING (comp)
    ORDER BY vec_id ASC
    """
    return sql


@query("q341_semdedup_kmeans_verdicts", oracle=_q341_oracle())
def q341_semdedup_kmeans_verdicts(spark, sf_dir):
    """operators/similarity.semdedup_kmeans_verdicts over embeddings:
    the SemDeDup paper's k-means coarse quantizer — Lloyd-refined
    cells (2 rounds, md5-order init), argmin-euclidean assignment,
    within-cell quantized cosines >= 0.3, closest-to-centroid
    keepers — hash-gated end to end including the cell TRAINING."""
    from ..operators.similarity import semdedup_kmeans_verdicts

    emb = T(spark, sf_dir, "embeddings")
    return semdedup_kmeans_verdicts(
        emb, threshold=_Q341_THRESHOLD, num_cells=_Q341_CELLS,
        n_iter=_Q341_ITERS,
    ).orderBy("vec_id")
