"""Incremental (streaming) maintenance of the hourly rollup — the
write path of the continuous-aggregate pattern (operators/rollup.py is
the read path; TimescaleDB continuous aggregates / Druid ingestion-
time rollup are the public designs).

``maintain_rollup`` attaches a ``foreachBatch`` sink to an event
stream: each micro-batch is pre-aggregated to hourly partials
(map-side combine — the shuffle carries hours × types, not raw
events), merged with the existing rollup rows for the AFFECTED dates
only, and published as a new immutable generation — untouched date
partitions are carried forward by file link, never rewritten, so
maintenance cost tracks the batch's time spread, not the rollup's
total size.

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
and count/sum merges are NOT idempotent, so each merge publishes
through the versioned-pointer protocol (``operators/layout.py``): the
merged generation lands in a fresh immutable ``v=<n>`` directory
(affected dates written, unaffected date partitions hardlinked from
the previous generation — the Iceberg data-file-reuse design in
miniature), and the ``_current.json`` pointer — which carries the
committed ``batch_id`` IN the same payload — flips in one atomic
replace. A crash anywhere before the flip leaves the pointer on the
old (generation, batch_id) pair, so the replayed batch re-merges into
a fresh generation and readers never observe a torn (marker, data)
state. On an object store without hardlinks the carry-forward is a
server-side copy or a manifest entry; the pointer flip is the same
conditional put.

Reference parity: the reference materializes aggregates inside its
managed stores (Postgres transactional upsert); this module is the
lake-native equivalent with the same exactly-once contract.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.layout import read_pointer, write_pointer
from ..operators.rollup import _hour_bucket, read_rollup

__all__ = [
    "batch_partials",
    "maintain_rollup",
    "merge_batch",
    "read_rollup",
    "vacuum_rollup",
]


def _committed_batch(rollup_path: str) -> int:
    b = read_pointer(rollup_path).get("batch_id")
    return b if isinstance(b, int) else -1


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


def _carry_forward(prev_vdir: str, new_vdir: str, skip_partitions: set[str]) -> None:
    """Link every date-partition dir of the previous generation that
    this merge did NOT touch into the new generation. Hardlinks share
    inodes — zero data copied, and the carried files are byte-for-byte
    the previous generation's (object-store analog: manifest reuse /
    server-side copy)."""
    if not os.path.isdir(prev_vdir):
        return
    for entry in os.listdir(prev_vdir):
        if not entry.startswith("event_date=") or entry in skip_partitions:
            continue
        src = os.path.join(prev_vdir, entry)
        dst = os.path.join(new_vdir, entry)
        os.makedirs(dst, exist_ok=True)
        for f in os.listdir(src):
            if f.startswith(("_", ".")):
                continue
            try:
                os.link(os.path.join(src, f), os.path.join(dst, f))
            except OSError:  # cross-device / store without links: copy
                shutil.copy2(os.path.join(src, f), os.path.join(dst, f))


def merge_batch(batch: DataFrame, batch_id: int, rollup_path: str) -> None:
    """Merge one micro-batch into the rollup (idempotent per batch_id).

    Affected dates come from the (tiny) partials frame; only those
    partitions are read back and rewritten — untouched partitions are
    linked forward. The new generation becomes visible ONLY via the
    atomic pointer flip, whose payload also records ``batch_id``:
    marker and data commit together, closing the replay double-merge
    window a separate marker file would leave. All merge operators are
    associative+commutative, so merging partials is exact regardless
    of batch boundaries.
    """
    if batch_id <= _committed_batch(rollup_path):
        return  # replayed batch — already merged and published
    spark = batch.sparkSession
    partials = batch_partials(batch)
    dates = [r["event_date"] for r in partials.select("event_date").distinct().collect()]
    if not dates:
        return
    ptr = read_pointer(rollup_path)
    prev_version = ptr.get("version", -1)
    prev_vdir = os.path.join(rollup_path, ptr["path"]) if ptr.get("path") else None
    existing = None
    if prev_vdir is not None and os.path.isdir(prev_vdir):
        existing = (
            spark.read.option("basePath", prev_vdir)
            .parquet(prev_vdir)
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
    version = prev_version + 1
    vdir = os.path.join(rollup_path, f"v={version}")
    # a crashed earlier attempt may have left an orphan generation dir
    # (never referenced — the pointer only flips at the end): clear it
    shutil.rmtree(vdir, ignore_errors=True)
    merged.write.mode("overwrite").partitionBy("event_date").parquet(vdir)
    if prev_vdir is not None:
        touched = {f"event_date={d}" for d in dates}
        _carry_forward(prev_vdir, vdir, skip_partitions=touched)
    write_pointer(rollup_path, version, batch_id=batch_id)


def vacuum_rollup(rollup_path: str, keep: int = 2) -> list[int]:
    """Drop all but the newest ``keep`` generations (never the current
    one). Hardlinked files stay alive while ANY retaining generation
    references their inode, so vacuuming old generations never corrupts
    newer ones. Returns removed versions."""
    from ..operators.layout import vacuum_versions

    return vacuum_versions(rollup_path, keep=keep)


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
