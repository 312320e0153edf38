"""Incremental (streaming) maintenance of the run-telemetry star
schema: a live stream of L3 node-step events folds into the L2
node-detail table per micro-batch — the production form of the
reference's incremental runtime logging (runtime_logger.py writes
L3/L2 JSONL incrementally and L1 at end_run; state/logstore.py is the
batch read path).

Shape (the drift_stream discipline):

- each micro-batch pre-aggregates its steps to per-(run, node)
  PARTIALS (map-side combine — the shuffle carries run×node keys, not
  raw steps) using exactly the mergeable pieces of
  ``logstore.aggregate_l3_to_l2``: step/verdict counts and token/
  latency sums add; the first-error argmin is a min-struct, and min
  of per-batch mins is the global min;
- partials sum-merge into the current state table, published as a new
  immutable generation through the versioned pointer with the
  committed ``batch_id`` in the payload (exactly-once: replays are
  no-ops). The state is one row per (run, node) — rewriting it per
  batch costs runs×nodes, never total steps; at larger scale the
  rollup_stream hardlink carry-forward applies unchanged (partition
  state by run date, rewrite only dates the batch touches);
- ``read_node_detail`` returns the L2 view BIT-EQUAL to a batch
  ``aggregate_l3_to_l2`` over every step seen so far (pinned by
  tests), so the builder analytics (state/builder_query) run on live
  state with no rescan of history.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.layout import read_pointer, write_pointer

__all__ = [
    "batch_node_partials",
    "init_telemetry",
    "maintain_telemetry",
    "merge_telemetry_batch",
    "read_node_detail",
]

_STATE_SCHEMA = (
    "run_id string, node_id string, total_steps int,"
    " input_tokens long, output_tokens long, latency_ms long,"
    " accept_count int, retry_count int, escalate_count int,"
    " _err struct<step_index:int, error:string>"
)


def batch_node_partials(batch: DataFrame) -> DataFrame:
    """Per-(run, node) mergeable partials for one micro-batch of L3
    step rows — the same aggregates as logstore.aggregate_l3_to_l2,
    kept in their mergeable form (the first-error argmin stays a
    struct so min() keeps merging)."""
    return batch.groupBy("run_id", "node_id").agg(
        F.count(F.lit(1)).cast("int").alias("total_steps"),
        F.sum("input_tokens").cast("long").alias("input_tokens"),
        F.sum("output_tokens").cast("long").alias("output_tokens"),
        F.sum("latency_ms").cast("long").alias("latency_ms"),
        F.sum(F.when(F.col("verdict") == "ACCEPT", 1).otherwise(0))
        .cast("int")
        .alias("accept_count"),
        F.sum(F.when(F.col("verdict") == "RETRY", 1).otherwise(0))
        .cast("int")
        .alias("retry_count"),
        F.sum(F.when(F.col("verdict") == "ESCALATE", 1).otherwise(0))
        .cast("int")
        .alias("escalate_count"),
        F.min(
            F.when(
                F.col("error").isNotNull(),
                F.struct(
                    F.col("step_index").cast("int").alias("step_index"),
                    F.col("error").alias("error"),
                ),
            )
        ).alias("_err"),
    )


def init_telemetry(spark: SparkSession, path: str) -> None:
    """Publish generation 0 (empty state)."""
    os.makedirs(path, exist_ok=True)
    empty = spark.createDataFrame([], _STATE_SCHEMA)
    vdir = os.path.join(path, "v=0")
    shutil.rmtree(vdir, ignore_errors=True)
    empty.write.mode("overwrite").parquet(vdir)
    write_pointer(path, 0, batch_id=-1)


def merge_telemetry_batch(batch: DataFrame, batch_id: int, path: str) -> None:
    """Sum-merge one micro-batch's node partials into the state
    (idempotent per batch_id via the pointer payload)."""
    ptr = read_pointer(path)
    if not ptr.get("path"):
        raise FileNotFoundError(
            f"no telemetry state at {path} — call init_telemetry first"
        )
    committed = ptr.get("batch_id")
    if isinstance(committed, int) and batch_id <= committed:
        return  # replay
    part = batch_node_partials(batch)
    if part.isEmpty():
        return
    spark = batch.sparkSession
    prev = spark.read.parquet(os.path.join(path, ptr["path"]))
    merged = (
        prev.unionByName(part)
        .groupBy("run_id", "node_id")
        .agg(
            F.sum("total_steps").cast("int").alias("total_steps"),
            F.sum("input_tokens").cast("long").alias("input_tokens"),
            F.sum("output_tokens").cast("long").alias("output_tokens"),
            F.sum("latency_ms").cast("long").alias("latency_ms"),
            F.sum("accept_count").cast("int").alias("accept_count"),
            F.sum("retry_count").cast("int").alias("retry_count"),
            F.sum("escalate_count").cast("int").alias("escalate_count"),
            F.min("_err").alias("_err"),
        )
    )
    version = ptr.get("version", 0) + 1
    vdir = os.path.join(path, f"v={version}")
    shutil.rmtree(vdir, ignore_errors=True)
    merged.write.mode("overwrite").parquet(vdir)
    write_pointer(path, version, batch_id=batch_id)


def maintain_telemetry(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Attach the telemetry sink to an L3 step stream; state must be
    initialized first. Returns the StreamingQuery."""
    writer = stream.writeStream.foreachBatch(
        lambda b, i: merge_telemetry_batch(b, i, path)
    ).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_node_detail(spark: SparkSession, path: str) -> DataFrame:
    """The live L2 node-detail view — identical columns (and bits) to
    ``logstore.aggregate_l3_to_l2`` over all steps merged so far."""
    ptr = read_pointer(path)
    if not ptr.get("path"):
        raise FileNotFoundError(f"no telemetry state at {path}")
    state = spark.read.parquet(os.path.join(path, ptr["path"]))
    return state.withColumn("first_error", F.col("_err.error")).drop("_err")
