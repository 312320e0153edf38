"""Sequence packing for LLM pretraining batches: lay the corpus out
as one concatenated token stream and chunk it into fixed-capacity
context windows (the GPT-style "concat and chunk" packing — documents
straddle window boundaries and are split, nothing is padded away).

No reference counterpart (driver-mandated training-data extension,
SURVEY §2.D family): this is the step between curation/dedup and the
trainer — given per-document token counts, decide which tokens of
which document land in which context window.

Relation to ``operators/sampling.pack_sequences`` (q100): that
operator reports each document's STARTING chunk/offset in the stream
(the shard-layout view); this one emits the full (document, window)
coverage — straddling documents appear once per window they touch,
with exact per-window token spans — plus the fill diagnostic
(``packing_stats``). Train-loader code needs the latter to build
attention-reset batches.

Scale shape: one exclusive prefix sum over the docs in a DETERMINISTIC
total order (operators/ids.running_totals — range shuffle + partition
offsets, no single-task window), then pure per-row arithmetic: a doc
spanning tokens [s, e) of the stream covers windows
floor(s/C) .. floor((e-1)/C), exploded with ``sequence()`` (bounded by
ceil(len/C)+1 per doc — map-side). The corpus is touched once; there
is no pairwise or bin-search path, so the plan is identical at 100 TB
with more range partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_token_stream(
    df: DataFrame,
    id_col: str,
    len_col: str,
    capacity: int,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Assign every document's token span to context windows.

    Output one row per (document, window) it overlaps:
    ``<id_col>, window_id, doc_offset, win_offset, n_tokens`` where
    ``doc_offset`` is the first packed token's index WITHIN the
    document, ``win_offset`` its position within the window, and
    windows are filled gaplessly (every window except the last holds
    exactly ``capacity`` tokens — Σ n_tokens per window == capacity).

    ``order_cols`` (default ``[id_col]``) fixes the stream order and
    must be a unique key; zero/NULL-length docs are excluded.
    """
    from .ids import running_totals

    if capacity <= 0:
        raise ValueError("capacity must be positive")
    order_cols = order_cols or [id_col]
    base = df.filter(
        F.col(len_col).isNotNull() & (F.col(len_col) > 0)
    ).select(*dict.fromkeys([id_col, len_col, *order_cols]))
    cum = running_totals(base, order_cols, len_col, cum_col="_e")
    spans = cum.select(
        id_col,
        F.col(len_col).cast("long").alias("_len"),
        (F.col("_e") - F.col(len_col)).cast("long").alias("_s"),
        F.col("_e").cast("long").alias("_e"),
    )
    c = F.lit(int(capacity)).cast("long")
    w_lo = F.floor(F.col("_s") / c)
    w_hi = F.floor((F.col("_e") - 1) / c)
    exploded = spans.select(
        id_col,
        "_len",
        "_s",
        "_e",
        F.explode(F.sequence(w_lo, w_hi)).alias("window_id"),
    )
    win_start = F.col("window_id") * c
    pack_start = F.greatest(F.col("_s"), win_start)
    pack_end = F.least(F.col("_e"), win_start + c)
    return exploded.select(
        id_col,
        F.col("window_id").cast("bigint").alias("window_id"),
        (pack_start - F.col("_s")).cast("bigint").alias("doc_offset"),
        (pack_start - win_start).cast("bigint").alias("win_offset"),
        (pack_end - pack_start).cast("bigint").alias("n_tokens"),
    )


def packing_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """Per-window packing report from :func:`pack_token_stream`'s
    output: ``window_id, n_docs, n_tokens, n_boundary_docs, fill``
    (n_boundary_docs = docs whose span reaches exactly the window's
    end — a SUPERSET of true cross-window splits, since it also counts
    docs that happen to end flush at the boundary without continuing;
    fill = n_tokens/capacity as a double). The training-batch
    diagnostic: every window but the last should show fill = 1.0."""
    return (
        packed.groupBy("window_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum(
                F.when(
                    F.col("win_offset") + F.col("n_tokens")
                    == F.lit(int(capacity)),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_boundary_docs"),
        )
        .withColumn(
            "fill",
            F.col("n_tokens").cast("double") / F.lit(float(capacity)),
        )
    )
