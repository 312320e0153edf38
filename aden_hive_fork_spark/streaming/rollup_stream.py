"""Incremental (streaming) maintenance of the hourly rollup — the
write path of the continuous-aggregate pattern (operators/rollup.py is
the read path; TimescaleDB continuous aggregates / Druid ingestion-
time rollup are the public designs).

``maintain_rollup`` attaches a ``foreachBatch`` sink to an event
stream: each micro-batch is pre-aggregated to hourly partials
(map-side combine — the shuffle carries hours × types, not raw
events), merged with the existing rollup rows for the AFFECTED dates
only, and written back with dynamic partition overwrite — untouched
date partitions are never rewritten, so maintenance cost tracks the
batch's time spread, not the rollup's total size.

Maintained aggregates are the MERGEABLE subset:

- ``n_events``   — sum of partial counts (exact),
- ``sum_value``  — sum of decimal partials (exact, associative),
- ``users_hll``  — union of HLL sketches (mergeable by construction;
  estimate error is the standard ~1.6% at lgConfigK=12).

Exact per-hour ``COUNT(DISTINCT user_id)`` is deliberately absent: it
is not decomposable from partials without keeping raw user ids per
hour. The batch rebuild (``materialize_rollup``) provides it; the
streaming twin serves distincts from the sketch (same contract as
``rollup_range_users``).

Exactly-once discipline: ``foreachBatch`` replays batches on restart,
and count/sum merges are NOT idempotent, so a committed-batch marker
(``_last_batch.json`` in the rollup dir) makes replays no-ops. The
remaining crash window — a failure BETWEEN partition commit and
marker write — needs a transactional table format (Delta/Iceberg
MERGE) to close fully; on this engine's plain-parquet store it is
documented rather than hidden.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import _scoped_conf
from ..operators.rollup import _hour_bucket

_MARKER = "_last_batch.json"


def _read_commit(rollup_path: str) -> int:
    try:
        with open(os.path.join(rollup_path, _MARKER)) as fh:
            return json.load(fh)["batch_id"]
    except (OSError, ValueError, KeyError):
        return -1


def _write_commit(rollup_path: str, batch_id: int) -> None:
    tmp = os.path.join(rollup_path, _MARKER + ".tmp")
    with open(tmp, "w") as fh:
        json.dump({"batch_id": batch_id}, fh)
    os.replace(tmp, os.path.join(rollup_path, _MARKER))


def batch_partials(batch: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Hourly partials of ONE micro-batch, in the rollup's mergeable
    schema. The groupBy runs with partial aggregation, so executors
    combine locally before the (hours × types)-sized shuffle."""
    return (
        batch.groupBy(_hour_bucket(ts_col).alias("hour_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
            F.hll_sketch_agg("user_id").alias("users_hll"),
        )
        .withColumn("event_date", F.to_date("hour_start"))
    )


def merge_batch(batch: DataFrame, batch_id: int, rollup_path: str) -> None:
    """Merge one micro-batch into the rollup (idempotent per batch_id).

    Affected dates come from the (tiny) partials frame; only those
    partitions are read back and rewritten. All merge operators are
    associative+commutative, so merging partials is exact regardless
    of batch boundaries.
    """
    if batch_id <= _read_commit(rollup_path):
        return  # replayed batch — already merged
    spark = batch.sparkSession
    partials = batch_partials(batch)
    dates = [r["event_date"] for r in partials.select("event_date").distinct().collect()]
    if not dates:
        return
    existing = None
    if os.path.isdir(rollup_path) and any(
        e.startswith("event_date=") for e in os.listdir(rollup_path)
    ):
        existing = (
            spark.read.option("basePath", rollup_path)
            .parquet(rollup_path)
            .filter(F.col("event_date").isin(dates))
            .select(partials.columns)
        )
    merged = partials if existing is None else existing.unionByName(partials)
    merged = (
        merged.groupBy("hour_start", "event_type")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.hll_union_agg("users_hll").alias("users_hll"),
        )
        .withColumn("event_date", F.to_date("hour_start"))
    )
    with _scoped_conf(spark, "spark.sql.sources.partitionOverwriteMode", "dynamic"):
        merged.write.mode("overwrite").partitionBy("event_date").parquet(rollup_path)
    _write_commit(rollup_path, batch_id)


def maintain_rollup(
    events: DataFrame,
    rollup_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Attach the incremental maintenance sink to a streaming events
    frame (columns: ts, event_type, user_id, value). Returns the
    StreamingQuery; with ``available_now`` the query drains all
    pending input and stops (the test/replay mode)."""
    os.makedirs(rollup_path, exist_ok=True)
    writer = events.writeStream.foreachBatch(
        # by-value closure: executors/driver callbacks must not need
        # to import this module by path (pickling pitfall)
        lambda b, i: merge_batch(b, i, rollup_path)
    ).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
