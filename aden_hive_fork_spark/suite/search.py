"""Search-tier declared queries (§2.A row 35 provider layer).

q93 is the distributed twin of the provider clients in
``sources/search_source.py``: a query TABLE scored against the
documents corpus with identical relevance semantics (distinct-term
overlap), proven against a DuckDB oracle that computes the same
list-intersection arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import query
from ._helpers import T

_Q93_QUERIES = [
    (1, "hash join merge"),
    (2, "slow scan table"),
    (3, "batch value part row"),
    (4, "zz-no-such-term"),
]

_Q93_VALUES = ", ".join(f"({i}, '{q}')" for i, q in _Q93_QUERIES)

_Q93_SQL = f"""
    WITH q(qid, query) AS (VALUES {_Q93_VALUES}),
    d AS (
      SELECT doc_id,
        list_distinct(string_split_regex(lower(trim(text)), ' +')) AS toks
      FROM documents
    ),
    qq AS (
      SELECT qid, query,
        list_distinct(string_split_regex(lower(trim(query)), ' +')) AS qt
      FROM q
    ),
    scored AS (
      SELECT qq.qid, qq.query, d.doc_id,
        len(list_intersect(d.toks, qq.qt)) AS score
      FROM d CROSS JOIN qq
    ),
    ranked AS (
      SELECT qid, query, doc_id, score,
        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC)
          AS rank
      FROM scored
      WHERE score > 0
    )
    SELECT qid, query, doc_id, CAST(score AS INT) AS score,
      CAST(rank AS INT) AS rank
    FROM ranked
    WHERE rank <= 5
    ORDER BY qid ASC, rank ASC
"""


@query("q93_keyword_search", oracle=_Q93_SQL)
def q93_keyword_search(spark, sf_dir):
    """Batch keyword search: 4 queries (one with zero hits) against
    the documents corpus, top-5 per query. The corpus is never
    shuffled — the query table broadcasts and scoring is map-side
    codegen'd column arithmetic; the only exchange is the per-query
    top-k window on the filtered match set
    (sources/search_source.keyword_search)."""
    from ..sources.search_source import keyword_search

    docs = T(spark, sf_dir, "documents")
    queries = spark.createDataFrame(_Q93_QUERIES, "qid int, query string")
    out = keyword_search(docs, queries, k=5)
    return out.select(
        "qid",
        "query",
        "doc_id",
        F.col("score").cast("int").alias("score"),
        F.col("rank").cast("int").alias("rank"),
    ).orderBy("qid", "rank")


_Q99_QUERIES = [
    (1, "hash join merge"),
    (2, "slow scan table"),
    (3, "batch value part row"),
]

_Q99_VALUES = ", ".join(f"({i}, '{q}')" for i, q in _Q99_QUERIES)

_Q99_SQL = f"""
    WITH q(qid, query) AS (VALUES {_Q99_VALUES}),
    toks AS (
      SELECT doc_id,
        unnest(string_split_regex(lower(trim(text)), ' +')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
    qt AS (
      SELECT qid, query,
        unnest(list_distinct(string_split_regex(lower(trim(query)), ' +')))
          AS term
      FROM q
    ),
    dft AS (
      SELECT term, COUNT(*) AS df_t FROM tf
      WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1
    ),
    scored AS (
      SELECT qt.qid, qt.query, tf.doc_id,
        ROUND(SUM(
          ln((s.n_docs - dft.df_t + 0.5) / (dft.df_t + 0.5) + 1.0)
          * (tf.tf * (1.2 + 1)) /
            (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))
        ), 4) AS score
      FROM qt
      JOIN tf USING (term)
      JOIN dft USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN stats s
      GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT qid, query, doc_id, score,
        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC)
          AS rank
      FROM scored
    )
    SELECT qid, query, doc_id, CAST(score AS DOUBLE) AS score,
      CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 5
    ORDER BY qid ASC, rank ASC
"""


@query("q99_bm25_search", oracle=_Q99_SQL)
def q99_bm25_search(spark, sf_dir):
    """Okapi BM25 top-5 per query over the documents corpus
    (sources/search_source.bm25_search). The oracle replays the exact
    scoring arithmetic — IDF, length normalization, rounded-score
    ranking — so this is a full-fidelity relevance-ranking check, not
    a smoke test."""
    from ..sources.search_source import bm25_search

    docs = T(spark, sf_dir, "documents")
    queries = spark.createDataFrame(_Q99_QUERIES, "qid int, query string")
    out = bm25_search(docs, queries, k=5)
    return out.select(
        "qid",
        "query",
        "doc_id",
        F.col("score").cast("double").alias("score"),
        F.col("rank").cast("int").alias("rank"),
    ).orderBy("qid", "rank")


# ---------------------------------------------------------------------------
# q220 — hybrid search: BM25 lexical ranks fused with exact-cosine
# semantic ranks via reciprocal-rank fusion
# (sources/search_source.rrf_fuse). The oracle replays BOTH rankers
# and the fusion arithmetic end-to-end.
# ---------------------------------------------------------------------------
_Q220_SQL = """
    WITH toks AS (
      SELECT doc_id,
        unnest(string_split_regex(lower(trim(text)), ' +')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
    qt AS (
      SELECT unnest(list_distinct(
        string_split_regex(lower(trim('hash join merge')), ' +'))) AS term
    ),
    dft AS (
      SELECT term, COUNT(*) AS df_t FROM tf
      WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1
    ),
    lex_scored AS (
      SELECT tf.doc_id,
        ROUND(SUM(
          ln((s.n_docs - dft.df_t + 0.5) / (dft.df_t + 0.5) + 1.0)
          * (tf.tf * (1.2 + 1)) /
            (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))
        ), 4) AS score
      FROM qt
      JOIN tf USING (term)
      JOIN dft USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN stats s
      GROUP BY 1
    ),
    lex_ranked AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC)
        AS rank
      FROM lex_scored
    ),
    qv AS (
      SELECT i, CAST(CAST(val AS DOUBLE) AS DECIMAL(10,8)) AS qv
      FROM (SELECT unnest(embedding) AS val,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings WHERE vec_id = 0)
    ),
    ev AS (
      SELECT vec_id, i, CAST(CAST(val AS DOUBLE) AS DECIMAL(10,8)) AS ev
      FROM (SELECT vec_id, unnest(embedding) AS val,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings)
    ),
    dots AS (
      SELECT ev.vec_id,
        SUM(ev.ev * qv.qv) AS dot,
        SUM(ev.ev * ev.ev) AS nv,
        SUM(qv.qv * qv.qv) AS nq
      FROM ev JOIN qv USING (i)
      GROUP BY 1
    ),
    sem_scored AS (
      SELECT vec_id,
        FLOOR(CAST(dot AS DOUBLE)
              / NULLIF(sqrt(CAST(nv AS DOUBLE)) * sqrt(CAST(nq AS DOUBLE)), 0)
              * 1000000 + 0.5) / 1000000 AS cosine
      FROM dots WHERE vec_id <> 0
    ),
    sem_ranked AS (
      SELECT vec_id AS doc_id,
        ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id ASC) AS rank
      FROM sem_scored
    ),
    fused AS (
      SELECT id, SUM(1.0 / (60.0 + CAST(rank AS DOUBLE))) AS s,
        CAST(COUNT(*) AS INT) AS n_lists
      FROM (
        SELECT doc_id AS id, rank FROM lex_ranked WHERE rank <= 20
        UNION ALL
        SELECT doc_id AS id, rank FROM sem_ranked WHERE rank <= 20
      )
      GROUP BY id
    )
    SELECT id AS doc_id,
      FLOOR(s * 1000000.0 + 0.5) / 1000000.0 AS rrf_score, n_lists
    FROM fused
    ORDER BY rrf_score DESC, doc_id ASC
    LIMIT 10
"""


@query("q220_hybrid_search_rrf", oracle=_Q220_SQL)
def q220_hybrid_search_rrf(spark, sf_dir):
    """Hybrid retrieval: BM25 top-20 for 'hash join merge' fused with
    the exact-cosine top-20 around vector 0 by reciprocal-rank fusion
    (k=60). Both rankers stay top-k-truncated (TakeOrderedAndProject)
    so the fusion aggregate sees 40 rows regardless of corpus size;
    the oracle replays both rankers AND the fusion arithmetic."""
    from ..operators.similarity import cosine_topk_exact
    from ..sources.search_source import bm25_search, rrf_fuse

    docs = T(spark, sf_dir, "documents")
    emb = T(spark, sf_dir, "embeddings")
    queries = spark.createDataFrame([(1, "hash join merge")], "qid int, query string")
    lex = bm25_search(docs, queries, k=20).select("doc_id", "rank")
    sem = (
        cosine_topk_exact(emb, query_id=0, k=20)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
            ),
        )
        .select(F.col("vec_id").alias("doc_id"), "rank")
    )
    return rrf_fuse([lex, sem], k=60, topk=10)


# ---------------------------------------------------------------------------
# q262 — NDCG@10 of the BM25 ranker against graded term-frequency
# relevance (operators/metrics.ndcg_at_k): linear-gain DCG with
# floor-quantized log2 discounts, ideal ordering tie-broken on doc
# id. The oracle replays the BM25 ranking (the q99 arithmetic), the
# relevance table, and the NDCG folds end to end.
# ---------------------------------------------------------------------------
_Q262_SQL = f"""
    WITH q(qid, query) AS (VALUES {_Q99_VALUES}),
    toks AS (
      SELECT doc_id,
        unnest(string_split_regex(lower(trim(text)), ' +')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
    qt AS (
      SELECT qid, query,
        unnest(list_distinct(string_split_regex(lower(trim(query)), ' +')))
          AS term
      FROM q
    ),
    dft AS (
      SELECT term, COUNT(*) AS df_t FROM tf
      WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1
    ),
    scored AS (
      SELECT qt.qid, tf.doc_id,
        ROUND(SUM(
          ln((s.n_docs - dft.df_t + 0.5) / (dft.df_t + 0.5) + 1.0)
          * (tf.tf * (1.2 + 1)) /
            (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))
        ), 4) AS score
      FROM qt
      JOIN tf USING (term)
      JOIN dft USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN stats s
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT qid, doc_id, score,
        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC,
                           doc_id ASC) AS rank
      FROM scored
    ),
    rel AS (
      SELECT qt.qid, tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS rel
      FROM qt JOIN tf USING (term)
      GROUP BY 1, 2
    ),
    dcg AS (
      SELECT r.qid,
        ROUND(list_sum(list_sort(list(
          FLOOR(COALESCE(CAST(rel.rel AS DOUBLE), 0.0)
                / log2(CAST(r.rank AS DOUBLE) + 1.0) * 1e9) / 1e9
        ))), 6) AS dcg
      FROM ranked r LEFT JOIN rel
        ON rel.qid = r.qid AND rel.doc_id = r.doc_id
      WHERE r.rank <= 10
      GROUP BY r.qid
    ),
    ideal AS (
      SELECT qid,
        ROUND(list_sum(list_sort(list(
          FLOOR(CAST(rel AS DOUBLE)
                / log2(CAST(irank AS DOUBLE) + 1.0) * 1e9) / 1e9
        ))), 6) AS idcg
      FROM (
        SELECT qid, rel,
          ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rel DESC,
                             doc_id ASC) AS irank
        FROM rel WHERE rel > 0
      ) WHERE irank <= 10
      GROUP BY qid
    )
    SELECT dcg.qid,
      CAST(dcg.dcg AS DOUBLE) AS dcg,
      CAST(ideal.idcg AS DOUBLE) AS idcg,
      CAST(ROUND(CASE WHEN ideal.idcg > 0 THEN dcg.dcg / ideal.idcg END,
        6) AS DOUBLE) AS ndcg
    FROM dcg LEFT JOIN ideal ON ideal.qid = dcg.qid
    ORDER BY dcg.qid ASC
"""


@query("q262_bm25_ndcg", oracle=_Q262_SQL)
def q262_bm25_ndcg(spark, sf_dir):
    """operators/metrics.ndcg_at_k over the q99 BM25 ranker, graded
    by summed query-term frequency."""
    from ..operators.metrics import ndcg_at_k
    from ..sources.search_source import _WS, bm25_search

    # NOT widened (r13 — reverting the r12 widen): the VERDICT-flagged
    # cross-session discrepancy re-checked as a real loss with a
    # repeated same-session A/B (widen 3.05/2.81 s vs plain
    # 2.52/2.41 s noop): split-tokenize is light per row here, so the
    # full-text shuffle costs more than the extra cores buy —
    # matching bm25_search's own standalone wash (search_source note)
    docs = T(spark, sf_dir, "documents")
    queries = spark.createDataFrame(_Q99_QUERIES, "qid int, query string")
    ranking = bm25_search(docs, queries, k=10)
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), _WS)).alias(
            "term"
        ),
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    qt = queries.select(
        "qid",
        F.explode(
            F.array_distinct(
                F.split(F.lower(F.trim(F.col("query"))), _WS)
            )
        ).alias("term"),
    )
    rel = (
        qt.join(tf, "term")
        .groupBy("qid", "doc_id")
        .agg(F.sum("tf").cast("bigint").alias("rel"))
    )
    return ndcg_at_k(ranking, rel, k=10).orderBy(F.asc("qid"))
