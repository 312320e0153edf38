"""Incremental (streaming) heavy hitters — a Misra-Gries summary
maintained across micro-batches (continuous top-talkers: hottest
keys, noisiest tenants, trending items), the streaming write path of
``operators/heavy.py``.

Per micro-batch: exact value counts of THE BATCH (batch-bounded
aggregate), summed into the running (value, weight) summary, then
the MG decrement — subtract the (k+1)-th largest weight from every
counter and drop non-positives — caps the summary at k rows. By the
MG merge theorem the maintained summary equals a single MG pass over
the concatenated stream: every value with true frequency
> n_total/(k+1) is present, and each kept weight undercounts its
true frequency by at most n_total/(k+1). ``n_total`` rides in the
pointer payload so the error bound — and the soundness threshold for
``min_frac`` queries — is always available without rescanning.

Exactly-once: the committed batch_id flips atomically with the data
through the versioned-pointer protocol (the rollup/sketch_stream
discipline); a replayed batch is a no-op, so counts never double.

Scale: per-batch cost is one batch-sized aggregate plus a
(k + batch-cardinality)-row merge; the k+1-th-largest threshold is a
driver-side top-(k+1) collect over the bounded summary — never the
data. The summary table is k rows total.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.layout import read_pointer, write_pointer

__all__ = ["maintain_heavy", "merge_heavy_batch", "read_heavy"]


def _committed_batch(path: str) -> int:
    b = read_pointer(path).get("batch_id")
    return b if isinstance(b, int) else -1


def read_heavy(spark, path: str) -> DataFrame:
    """Current summary generation: ``value, weight`` (weight is a
    LOWER bound on the value's true count; true ≤ weight +
    n_total/(k+1), n_total from ``read_pointer(path)['n_total']``)."""
    ptr = read_pointer(path)
    if not ptr.get("path"):
        raise FileNotFoundError(f"no published summary at {path}")
    return spark.read.parquet(os.path.join(path, ptr["path"]))


def merge_heavy_batch(
    batch: DataFrame, batch_id: int, path: str, value_col: str, k: int
) -> None:
    """Merge one micro-batch into the MG(k) summary (idempotent per
    batch_id)."""
    if batch_id <= _committed_batch(path):
        return  # replayed batch — already merged and published
    spark = batch.sparkSession
    counts = (
        batch.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("value"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("weight"))
    )
    if counts.isEmpty():
        return
    n_batch = int(
        counts.agg(F.sum("weight")).collect()[0][0]
    )
    ptr = read_pointer(path)
    prev_version = ptr.get("version", -1)
    n_total = int(ptr.get("n_total", 0)) + n_batch
    merged = counts
    if ptr.get("path"):
        prev = spark.read.parquet(os.path.join(path, ptr["path"]))
        merged = (
            prev.unionByName(counts)
            .groupBy("value")
            .agg(F.sum("weight").cast("bigint").alias("weight"))
        )
    # MG decrement: cap at k counters. The summary is ≤ k + batch
    # cardinality rows, so the top-(k+1) collect is bounded.
    top = merged.orderBy(F.desc("weight"), F.asc("value")).limit(k + 1)
    rows = top.collect()
    if len(rows) > k:
        d = rows[-1]["weight"]
        merged = merged.select(
            "value", (F.col("weight") - d).cast("bigint").alias("weight")
        ).filter(F.col("weight") > 0)
    version = prev_version + 1
    vdir = os.path.join(path, f"v={version}")
    shutil.rmtree(vdir, ignore_errors=True)  # orphan from a crash
    merged.write.mode("overwrite").parquet(vdir)
    write_pointer(path, version, batch_id=batch_id, n_total=n_total)


def maintain_heavy(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    value_col: str,
    k: int = 100,
    available_now: bool = True,
):
    """Attach the heavy-hitters maintenance sink to a streaming
    frame. Returns the StreamingQuery; ``available_now`` drains
    pending input and stops (test/replay mode)."""
    os.makedirs(path, exist_ok=True)
    writer = stream.writeStream.foreachBatch(
        # by-value closure (pickling pitfall: no module-path imports)
        lambda b, i: merge_heavy_batch(b, i, path, value_col, k)
    ).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
