"""Incremental (streaming) maintenance of exact correlation /
regression sufficient statistics — continuous "is X still tracking
Y?" monitoring (value-vs-hour-of-day drift, price-vs-quantity
coupling per segment) without ever rescanning history.

Per micro-batch: aggregate ONLY the batch to its (n, sx, sy, sxy,
sxx, syy) exact-decimal sufficient statistics
(``operators/stats.suffstats``), sum-merge with the current stats
table (``merge_suffstats`` — decimal addition is exact, associative,
commutative, so the merged table equals a one-pass batch rebuild
BIT-FOR-BIT), publish as a new immutable generation through the
versioned-pointer protocol of ``operators/layout.py``.

Exactly-once: foreachBatch replays on restart; the committed
``batch_id`` rides in the pointer payload and flips atomically with
the data (the sketch_stream/rollup_stream discipline — no
marker-vs-data crash window). A replayed batch id is a no-op.

Scale: per-batch cost is one keyed aggregate over batch rows; the
stats table is |groups| rows of 6 numbers — rewriting it whole per
generation is cheaper than any partial scheme at any realistic group
cardinality, and readers derive correlation or a least-squares fit
from the published stats in O(|groups|).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame

from ..operators.layout import read_pointer, write_pointer
from ..operators.stats import merge_suffstats, suffstats

__all__ = ["maintain_corr_stats", "merge_stats_batch", "read_corr_stats"]


def _committed_batch(path: str) -> int:
    b = read_pointer(path).get("batch_id")
    return b if isinstance(b, int) else -1


def read_corr_stats(spark, path: str) -> DataFrame:
    """Current stats generation (raises if nothing published yet).
    Feed to ``stats.corr_from_stats`` for correlations."""
    ptr = read_pointer(path)
    if not ptr.get("path"):
        raise FileNotFoundError(f"no published stats at {path}")
    return spark.read.parquet(os.path.join(path, ptr["path"]))


def merge_stats_batch(
    batch: DataFrame,
    batch_id: int,
    path: str,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None,
    scale: int = 2,
) -> None:
    """Merge one micro-batch's sufficient statistics into the stats
    table (idempotent per batch_id via the pointer payload)."""
    if batch_id <= _committed_batch(path):
        return  # replayed batch — already merged and published
    spark = batch.sparkSession
    partial = suffstats(batch, x_col, y_col, group_cols, scale)
    if partial.isEmpty():
        return
    ptr = read_pointer(path)
    prev_version = ptr.get("version", -1)
    merged = partial
    if ptr.get("path"):
        prev = spark.read.parquet(os.path.join(path, ptr["path"]))
        merged = merge_suffstats(prev.unionByName(partial), group_cols)
    version = prev_version + 1
    vdir = os.path.join(path, f"v={version}")
    shutil.rmtree(vdir, ignore_errors=True)  # orphan from a crash
    merged.write.mode("overwrite").parquet(vdir)
    write_pointer(path, version, batch_id=batch_id)


def maintain_corr_stats(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
    scale: int = 2,
    available_now: bool = True,
):
    """Attach the stats-maintenance sink to a streaming frame.
    Returns the StreamingQuery; ``available_now`` drains pending
    input and stops (test/replay mode)."""
    os.makedirs(path, exist_ok=True)
    writer = stream.writeStream.foreachBatch(
        # by-value closure (pickling pitfall: no module-path imports)
        lambda b, i: merge_stats_batch(
            b, i, path, x_col, y_col, group_cols, scale
        )
    ).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
