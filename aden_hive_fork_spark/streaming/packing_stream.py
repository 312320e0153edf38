"""Incremental (streaming) sequence packing: documents arriving on a
stream are appended to the global token stream and chunked into
fixed-capacity context windows — the live-ingestion form of
operators/packing.pack_token_stream (GPT-style concat-and-chunk),
bit-exact with the batch layout over the same document order.

Why it composes exactly: window assignment depends only on each doc's
ABSOLUTE token offset in the stream, and the committed pointer carries
``stream_offset`` (total tokens packed so far). A micro-batch computes
its docs' offsets as offset + within-batch prefix sum, so a window
that straddles a batch boundary is continued, not restarted — the
batch rebuild over the concatenated arrivals produces the same
(doc, window, offsets) rows bit for bit (pinned by tests).

State shape: each batch APPENDS its packed rows as an immutable
``part=<version>`` directory; the pointer (operators/layout.py)
commits (version, batch_id, stream_offset) atomically, so replays are
no-ops and readers union only committed parts. Nothing is rewritten —
maintenance cost is the batch's own rows, independent of corpus size.

Ordering contract: within a micro-batch, docs enter the stream in
``order_cols`` order; across batches, arrival order rules (the stream
IS the order). The batch twin for verification is pack_token_stream
over the arrival-ordered union.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.layout import read_pointer, write_pointer

__all__ = [
    "init_packing",
    "maintain_packing",
    "merge_packing_batch",
    "read_packed",
]


def init_packing(spark: SparkSession, path: str, capacity: int) -> None:
    """Publish generation 0: empty stream, capacity in the pointer
    payload (the contract — windows are only meaningful for one C)."""
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    os.makedirs(path, exist_ok=True)
    # parts live under parts/; v=0 holds no rows
    shutil.rmtree(os.path.join(path, "parts"), ignore_errors=True)
    os.makedirs(os.path.join(path, "parts"), exist_ok=True)
    write_pointer(path, 0, batch_id=-1, capacity=capacity, stream_offset=0)


def merge_packing_batch(
    batch: DataFrame,
    batch_id: int,
    path: str,
    id_col: str,
    len_col: str,
    order_cols: list[str] | None = None,
) -> None:
    """Pack one micro-batch's documents onto the end of the stream
    (idempotent per batch_id)."""
    from ..operators.ids import running_totals

    ptr = read_pointer(path)
    if ptr.get("version") is None:
        raise FileNotFoundError(
            f"no packing state at {path} — call init_packing first"
        )
    committed = ptr.get("batch_id")
    if isinstance(committed, int) and batch_id <= committed:
        return  # replay
    capacity = int(ptr["capacity"])
    offset = int(ptr["stream_offset"])
    order_cols = order_cols or [id_col]
    base = batch.filter(
        F.col(len_col).isNotNull() & (F.col(len_col) > 0)
    ).select(*dict.fromkeys([id_col, len_col, *order_cols]))
    if base.isEmpty():
        return
    cum = running_totals(base, order_cols, len_col, cum_col="_e")
    c = F.lit(capacity).cast("long")
    spans = cum.select(
        id_col,
        (F.col("_e") - F.col(len_col) + F.lit(offset)).cast("long").alias("_s"),
        (F.col("_e") + F.lit(offset)).cast("long").alias("_e"),
    )
    exploded = spans.select(
        id_col,
        "_s",
        "_e",
        F.explode(
            F.sequence(F.floor(F.col("_s") / c), F.floor((F.col("_e") - 1) / c))
        ).alias("window_id"),
    )
    win_start = F.col("window_id") * c
    pack_start = F.greatest(F.col("_s"), win_start)
    pack_end = F.least(F.col("_e"), win_start + c)
    packed = exploded.select(
        id_col,
        F.col("window_id").cast("bigint").alias("window_id"),
        (pack_start - F.col("_s")).cast("bigint").alias("doc_offset"),
        (pack_start - win_start).cast("bigint").alias("win_offset"),
        (pack_end - pack_start).cast("bigint").alias("n_tokens"),
    )
    batch_tokens = int(
        base.agg(F.sum(F.col(len_col).cast("long"))).collect()[0][0]
    )
    version = ptr.get("version", 0) + 1
    pdir = os.path.join(path, "parts", f"part={version}")
    shutil.rmtree(pdir, ignore_errors=True)
    packed.write.mode("overwrite").parquet(pdir)
    write_pointer(
        path,
        version,
        batch_id=batch_id,
        capacity=capacity,
        stream_offset=offset + batch_tokens,
    )


def maintain_packing(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    id_col: str,
    len_col: str,
    order_cols: list[str] | None = None,
    available_now: bool = True,
):
    """Attach the packing sink; state must be initialized first."""
    writer = stream.writeStream.foreachBatch(
        lambda b, i: merge_packing_batch(
            b, i, path, id_col, len_col, order_cols
        )
    ).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_packed(spark: SparkSession, path: str) -> DataFrame:
    """All committed (doc, window) rows — identical to the batch
    pack_token_stream over the arrival-ordered corpus. Before the
    first merge the empty result uses the default ``doc_id`` id-column
    name (the stored parts carry whatever id_col the sink was given).
    """
    ptr = read_pointer(path)
    version = ptr.get("version")
    if version is None:
        raise FileNotFoundError(f"no packing state at {path}")
    dirs = [
        os.path.join(path, "parts", f"part={v}")
        for v in range(1, version + 1)
        if os.path.isdir(os.path.join(path, "parts", f"part={v}"))
    ]
    if not dirs:
        return spark.createDataFrame(
            [],
            "doc_id bigint, window_id bigint, doc_offset bigint,"
            " win_offset bigint, n_tokens bigint",
        )
    return spark.read.parquet(*dirs)
