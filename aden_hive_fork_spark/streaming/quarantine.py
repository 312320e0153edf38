"""Streaming dead-letter split — validate a live stream and route
valid rows and rejects to SEPARATE sinks, exactly once.

Production ingestion needs the quarantine pattern the batch validator
(functions/validate.enforce_schema) only provides offline: bad
records must not kill the stream (the reference's JSONL readers skip
corrupt lines — q84) but must not vanish either; they land in a
quarantine directory WITH their rejection reasons for replay after a
fix.

Mechanism: ``foreachBatch`` splits each micro-batch with
``enforce_schema`` and writes both halves to hive-style
``batch_id=N`` subdirectories in OVERWRITE mode. A replayed batch
(restart between sink write and checkpoint commit) overwrites its own
directory with identical content instead of appending duplicates —
idempotence comes from the batch-keyed layout, not a side marker
(same reasoning as rollup_stream's pointer payload). Readers see
exactly-once data by construction; ``read_quarantine`` /
``read_valid`` glob the batch dirs back into one DataFrame.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..functions.validate import enforce_schema


def quarantined_sink(
    stream: DataFrame,
    schema,
    valid_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str,
    required: list[str] | None = None,
    trigger_available_now: bool = True,
):
    """Start the split stream. Valid rows (cast to ``schema``) go to
    ``valid_dir``; rejects keep their ORIGINAL values plus the
    ``_reasons`` array naming each offending field and go to
    ``quarantine_dir``. Returns the StreamingQuery."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        valid, rejects = enforce_schema(batch, schema, required=required)
        (
            valid.write.mode("overwrite")
            .parquet(os.path.join(valid_dir, f"batch_id={batch_id}"))
        )
        (
            rejects.write.mode("overwrite")
            .parquet(os.path.join(quarantine_dir, f"batch_id={batch_id}"))
        )

    writer = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _read_batches(spark: SparkSession, root: str) -> DataFrame | None:
    import glob

    dirs = sorted(glob.glob(os.path.join(root, "batch_id=*")))
    dirs = [d for d in dirs if any(
        f.endswith(".parquet") for f in os.listdir(d)
    )]
    if not dirs:
        return None
    return spark.read.option("basePath", root).parquet(*dirs)


def read_valid(spark: SparkSession, valid_dir: str) -> DataFrame | None:
    """All validated rows across batches (None before first batch)."""
    return _read_batches(spark, valid_dir)


def read_quarantine(spark: SparkSession, quarantine_dir: str
                    ) -> DataFrame | None:
    """All quarantined rows with their ``_reasons`` across batches."""
    return _read_batches(spark, quarantine_dir)
