"""Search-tier declared queries (§2.A row 35 provider layer).

q93 is the distributed twin of the provider clients in
``sources/search_source.py``: a query TABLE scored against the
documents corpus with identical relevance semantics (distinct-term
overlap), proven against a DuckDB oracle that computes the same
list-intersection arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

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
