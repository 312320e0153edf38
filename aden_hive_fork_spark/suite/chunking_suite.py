"""Chunking + Bloom-prune batch: RAG document chunking (char and
token windows) and the exact Bloom-prefiltered semi-join, all under
the DuckDB oracle gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query
from ._helpers import T


# ---------------------------------------------------------------------------
# q114 — character-window chunking with overlap (operators/chunking).
# ---------------------------------------------------------------------------
@query(
    "q114_doc_chunking",
    oracle="""
    WITH starts AS (
      SELECT doc_id, text,
             unnest(generate_series(0, length(text)-1, 160)) AS chunk_start
      FROM documents
      WHERE text IS NOT NULL AND length(text) > 0
    )
    SELECT doc_id,
      CAST(chunk_start // 160 AS INT) AS chunk_id,
      CAST(chunk_start AS INT) AS chunk_start,
      CAST(length(substr(text, CAST(chunk_start+1 AS INT), 200)) AS INT)
        AS chunk_len,
      substr(text, CAST(chunk_start+1 AS INT), 200) AS chunk_text
    FROM starts
    ORDER BY doc_id ASC, chunk_id ASC
    """,
)
def q114_doc_chunking(spark, sf_dir):
    """200-char windows every 160 chars (40-char overlap) over the
    corpus — `chunking.chunk_documents`. Map-only: sequence +
    posexplode + substring in whole-stage codegen, no shuffle except
    the output sort required by the determinism contract."""
    from ..operators.chunking import chunk_documents

    docs = T(spark, sf_dir, "documents")
    return chunk_documents(
        docs, id_col="doc_id", text_col="text", chunk_size=200, overlap=40
    ).orderBy("doc_id", "chunk_id")


# ---------------------------------------------------------------------------
# q115 — token-window chunking (the RAG-standard unit).
# ---------------------------------------------------------------------------
@query(
    "q115_token_chunking",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      FROM documents
      WHERE text IS NOT NULL AND length(trim(text)) > 0
    ), starts AS (
      SELECT doc_id, t,
             unnest(generate_series(1, len(t), 24)) AS token_start
      FROM toks
    )
    SELECT doc_id,
      CAST((token_start - 1) // 24 AS INT) AS chunk_id,
      CAST(token_start AS INT) AS token_start,
      CAST(len(t[CAST(token_start AS INT):CAST(token_start+31 AS INT)])
           AS INT) AS n_tokens,
      array_to_string(
        t[CAST(token_start AS INT):CAST(token_start+31 AS INT)], ' '
      ) AS chunk_text
    FROM starts
    ORDER BY doc_id ASC, chunk_id ASC
    """,
)
def q115_token_chunking(spark, sf_dir):
    """32-token windows every 24 tokens (8-token overlap) —
    `chunking.chunk_tokens`: split/slice/array_join, pure JVM,
    exact token offsets for span-to-document mapping."""
    from ..operators.chunking import chunk_tokens

    docs = T(spark, sf_dir, "documents")
    return chunk_tokens(
        docs, id_col="doc_id", text_col="text", chunk_tokens=32, overlap=8
    ).orderBy("doc_id", "chunk_id")


# ---------------------------------------------------------------------------
# q116 — Bloom-prefiltered semi-join (exact by construction).
# ---------------------------------------------------------------------------
@query(
    "q116_bloom_semi_join",
    oracle="""
    SELECT l_returnflag,
      CAST(COUNT(*) AS BIGINT) AS n_items,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2))
        AS sum_qty,
      CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
    FROM lineitem
    WHERE l_partkey IN (
      SELECT p_partkey FROM part WHERE p_size <= 5
    )
    GROUP BY l_returnflag
    ORDER BY l_returnflag ASC
    """,
)
def q116_bloom_semi_join(spark, sf_dir):
    """`bloom.bloom_semi_join`: Bloom filter built over the small key
    set (parts with p_size <= 5), corpus pruned MAP-SIDE by k
    codegen'd bit probes, then a confirming broadcast semi-join over
    the survivors only — bitwise-exact vs the plain semi-join oracle
    because Bloom filters have no false negatives and the confirm join
    removes false positives."""
    from ..operators.bloom import bloom_semi_join

    li = T(spark, sf_dir, "lineitem")
    small = (
        T(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 5)
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    hits = bloom_semi_join(li, small, "l_partkey", fpp=0.01)
    return (
        hits.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("sum_qty"),
            F.countDistinct("l_partkey").cast("bigint").alias("n_parts"),
        )
        .orderBy("l_returnflag")
    )
