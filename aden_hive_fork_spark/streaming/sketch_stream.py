"""Incremental (streaming) maintenance of KMV cardinality sketches —
the write path of ``operators/sketch.py`` (continuous distinct-count
monitoring: unique users per event type, unique keys per tenant,
updated per micro-batch without ever rescanning history).

Per micro-batch: sketch ONLY the batch (``kmv_sketch`` — one distinct
aggregate over batch rows), merge with the current sketch table via
``merge_kmv`` (candidate-list re-rank — the merge is exactly the
sketch of the union, by the k-minimum property), publish as a new
immutable generation through the versioned-pointer protocol of
``operators/layout.py``. The sketch table is (groups × k) longs —
rewriting it whole per generation is cheaper than any partial scheme.

Exactly-once: ``foreachBatch`` replays on restart, and sketch merges
are idempotent for identical input but NOT for reordered replays
interleaved with other batches, so the committed ``batch_id`` rides
in the pointer payload and flips atomically with the data (the
rollup_stream discipline — no marker/data crash window).

Scale: per-batch work is bounded by batch size; merge work by
(groups × 2k). Because merged sketches equal raw-data sketches
EXACTLY (md5-order determinism), the streamed table stays inside the
same oracle-checkable contract as the batch operator, and estimates
from it match a batch rebuild bit-for-bit.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame

from ..operators.layout import read_pointer, write_pointer
from ..operators.sketch import kmv_sketch, merge_kmv

__all__ = ["maintain_kmv", "merge_sketch_batch", "read_kmv"]


def _committed_batch(path: str) -> int:
    b = read_pointer(path).get("batch_id")
    return b if isinstance(b, int) else -1


def read_kmv(spark, path: str) -> DataFrame:
    """Current sketch generation (raises if nothing published yet)."""
    ptr = read_pointer(path)
    if not ptr.get("path"):
        raise FileNotFoundError(f"no published sketch at {path}")
    return spark.read.parquet(os.path.join(path, ptr["path"]))


def merge_sketch_batch(
    batch: DataFrame,
    batch_id: int,
    path: str,
    value_col: str,
    group_cols: list[str] | None,
    k: int,
    salt: str = "",
) -> None:
    """Merge one micro-batch into the sketch table (idempotent per
    batch_id via the pointer payload)."""
    if batch_id <= _committed_batch(path):
        return  # replayed batch — already merged and published
    spark = batch.sparkSession
    partial = kmv_sketch(batch, value_col, group_cols, k, salt)
    if partial.isEmpty():
        return
    ptr = read_pointer(path)
    prev_version = ptr.get("version", -1)
    merged = partial
    if ptr.get("path"):
        prev = spark.read.parquet(os.path.join(path, ptr["path"]))
        merged = merge_kmv(prev.unionByName(partial), k, group_cols)
    version = prev_version + 1
    vdir = os.path.join(path, f"v={version}")
    shutil.rmtree(vdir, ignore_errors=True)  # orphan from a crash
    merged.write.mode("overwrite").parquet(vdir)
    write_pointer(path, version, batch_id=batch_id)


def maintain_kmv(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 256,
    salt: str = "",
    available_now: bool = True,
):
    """Attach the sketch-maintenance sink to a streaming frame.
    Returns the StreamingQuery; ``available_now`` drains pending
    input and stops (test/replay mode)."""
    os.makedirs(path, exist_ok=True)
    writer = stream.writeStream.foreachBatch(
        # by-value closure (pickling pitfall: no module-path imports)
        lambda b, i: merge_sketch_batch(
            b, i, path, value_col, group_cols, k, salt
        )
    ).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
