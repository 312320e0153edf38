"""Document chunking for RAG / context-window preparation.

The reference prepares retrieval context by slicing documents into
fixed windows before embedding (the byte-paginated reads of
data_tools and the retrieval tools' snippeting are the closest
analogs); training-data pipelines need the same pass to split long
documents into model-window-sized pieces with overlap so no span is
lost at a boundary.

Both chunkers are pure JVM column expressions — ``sequence`` +
``posexplode`` + ``substring``/``slice`` — so chunking a 100 TB corpus
is map-side work inside whole-stage codegen: no shuffle, no Python,
output partitioning inherits the scan. Both are exactly replayable in
SQL (DuckDB ``unnest(generate_series(...))``), so they sit under the
oracle gate (q114/q115).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Character-window chunking: windows of ``chunk_size`` chars
    starting every ``chunk_size - overlap`` chars, so consecutive
    chunks share ``overlap`` chars and every char belongs to at least
    one chunk. Empty/NULL texts produce no chunks.

    Output: ``id_col, chunk_id, chunk_start, chunk_len, chunk_text``
    (chunk_start is 0-based; the final chunk may be shorter).
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    stride = chunk_size - overlap
    text = F.col(text_col)
    starts = F.sequence(
        F.lit(0), F.length(text) - 1, F.lit(stride)
    )
    exploded = (
        df.filter(text.isNotNull() & (F.length(text) > 0))
        .select(id_col, text_col, F.posexplode(starts).alias("chunk_id", "chunk_start"))
    )
    chunk = F.substring(F.col(text_col), F.col("chunk_start") + 1, chunk_size)
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("chunk_start").cast("int").alias("chunk_start"),
        F.length(chunk).cast("int").alias("chunk_len"),
        chunk.alias("chunk_text"),
    )


def chunk_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Token-window chunking (the RAG-standard unit): whitespace
    tokens, windows of ``chunk_tokens`` starting every
    ``chunk_tokens - overlap`` tokens, chunk text rebuilt with single
    spaces. Exact token offsets come out with each chunk so downstream
    packing/citation can map back into the document.

    Output: ``id_col, chunk_id, token_start, n_tokens, chunk_text``
    (token_start is 1-based, matching ``slice`` semantics).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    with_toks = (
        df.filter(F.col(text_col).isNotNull() & (F.length(F.trim(F.col(text_col))) > 0))
        .select(id_col, toks.alias("_toks"))
        .withColumn("_n", F.size("_toks"))
    )
    starts = F.sequence(F.lit(1), F.col("_n"), F.lit(stride))
    exploded = with_toks.select(
        id_col,
        "_toks",
        "_n",
        F.posexplode(starts).alias("chunk_id", "token_start"),
    )
    # slice clamps past the array end in both Spark and DuckDB
    window = F.slice(F.col("_toks"), F.col("token_start"), chunk_tokens)
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("token_start").cast("int").alias("token_start"),
        F.size(window).cast("int").alias("n_tokens"),
        F.array_join(window, " ").alias("chunk_text"),
    )
