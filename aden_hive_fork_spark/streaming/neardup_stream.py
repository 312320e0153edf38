"""Incremental (streaming) near-duplicate filtering — each arriving
micro-batch of documents is deduplicated against EVERYTHING already
accepted, the production crawl-ingestion pattern: history never
rescans, new data pays only its own sketch cost plus a candidate
join against the persisted index.

Per micro-batch:

1. **Sketch the batch** — bottom-``sketch_k`` md5 shingle minima per
   document (`operators/dedup.kmv_jaccard_pairs`' sketch, built
   batch-locally).
2. **Batch-internal dedup** — KMV-estimated Jaccard pairs within the
   batch → connected components → min-id survivor per cluster (the
   q78 discipline, at batch scale).
3. **History dedup** — the survivors' sketch hashes candidate-join
   the PERSISTED corpus sketch index (hash equality — posting lists,
   never all-pairs); a survivor whose estimated Jaccard against ANY
   accepted document clears ``threshold`` is dropped. First-seen
   wins, which is the deterministic contract batch ordering gives a
   stream (the batch tier's min-id canonicalization is its offline
   analog).
4. **Publish** — accepted ids land in ``accepted/batch=<n>/``
   (per-batch dir: replays overwrite their own directory, so the
   output is idempotent by construction) and the accepted documents'
   sketches merge into a new immutable index generation behind the
   atomic pointer (batch_id in the payload — the rollup/sketch_stream
   exactly-once discipline).

Scale: the index holds docs×sketch_k longs — document length changes
sketch content, not index size. Per-batch cost: batch sketching +
(batch hashes ⋈ index hashes) keyed join. The full-index rewrite per
generation is the simplification here; a production variant
partitions the index by hash prefix and rewrites touched partitions
(the rollup_stream carry-forward pattern applies unchanged).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.layout import read_pointer, write_pointer

__all__ = ["maintain_neardup_filter", "neardup_filter_batch", "read_accepted"]


def _committed_batch(path: str) -> int:
    b = read_pointer(path).get("batch_id")
    return b if isinstance(b, int) else -1


def _batch_sketches(
    batch: DataFrame, id_col: str, text_col: str, k: int, sketch_k: int
) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.dedup import shingles_col
    from ..operators.sketch import _h60

    base = (
        batch.select(
            F.col(id_col).alias("_id"),
            F.explode(shingles_col(text_col, k)).alias("_sh"),
        )
        .withColumn("_h", _h60(F.col("_sh"), ""))
        .select("_id", "_h")
        .distinct()
    )
    w = Window.partitionBy("_id").orderBy("_h")
    return (
        base.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= sketch_k)
        .groupBy("_id")
        .agg(F.sort_array(F.collect_list("_h")).alias("_hs"))
    )


def _est_jaccard(sketch_k: int):
    inter = F.array_intersect("_ha", "_hb")
    ksz = F.least(
        F.lit(sketch_k), F.size("_ha") + F.size("_hb") - F.size(inter)
    )
    thresh = F.element_at(
        F.array_sort(F.array_distinct(F.concat("_ha", "_hb"))), ksz
    )
    num = F.size(F.filter(inter, lambda x: x <= thresh))
    return num.cast("double") / ksz.cast("double")


def read_accepted(spark, path: str) -> DataFrame:
    """All accepted ids across committed batches (``id, batch_id``)."""
    return spark.read.option("basePath", os.path.join(path, "accepted")).parquet(
        os.path.join(path, "accepted")
    )


def neardup_filter_batch(
    batch: DataFrame,
    batch_id: int,
    path: str,
    id_col: str,
    text_col: str,
    k: int = 3,
    sketch_k: int = 32,
    threshold: float = 0.5,
) -> None:
    """Process one micro-batch (idempotent per batch_id)."""
    if batch_id <= _committed_batch(path):
        return  # replayed batch — accepted/ and index already reflect it
    spark = batch.sparkSession
    sk = _batch_sketches(batch, id_col, text_col, k, sketch_k)
    sk = sk.localCheckpoint(eager=True)
    if sk.isEmpty():
        return

    # batch-internal: min-id survivor per near-dup component
    from ..operators.dedup import connected_components

    inv = sk.select("_id", F.explode("_hs").alias("_h"))
    cand = (
        inv.alias("a")
        .join(inv.alias("b"), "_h")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    pairs = (
        cand.join(
            sk.select(F.col("_id").alias("id_a"), F.col("_hs").alias("_ha")),
            "id_a",
        )
        .join(
            sk.select(F.col("_id").alias("id_b"), F.col("_hs").alias("_hb")),
            "id_b",
        )
        .filter(_est_jaccard(sketch_k) >= threshold)
        .select("id_a", "id_b")
    )
    losers = connected_components(pairs).filter(
        F.col("id") != F.col("comp")
    ).select(F.col("id").alias("_id"))
    surv = sk.join(losers, "_id", "left_anti")

    # vs history: drop survivors similar to ANY accepted document
    ptr = read_pointer(path)
    prev_version = ptr.get("version", -1)
    index = None
    if ptr.get("path"):
        index = spark.read.parquet(os.path.join(path, ptr["path"]))
        hist_cand = (
            surv.select("_id", F.explode("_hs").alias("_h"))
            .join(
                index.select(
                    F.col("_id").alias("_hid"), F.explode("_hs").alias("_h")
                ),
                "_h",
            )
            .select("_id", "_hid")
            .distinct()
        )
        dropped = (
            hist_cand.join(
                surv.select("_id", F.col("_hs").alias("_ha")), "_id"
            )
            .join(
                index.select(
                    F.col("_id").alias("_hid"), F.col("_hs").alias("_hb")
                ),
                "_hid",
            )
            .filter(_est_jaccard(sketch_k) >= threshold)
            .select("_id")
            .distinct()
        )
        surv = surv.join(dropped, "_id", "left_anti")
    surv = surv.localCheckpoint(eager=True)

    # publish: accepted ids (per-batch dir — replay-idempotent) then
    # the merged index generation + pointer flip (atomic commit point)
    acc_dir = os.path.join(path, "accepted", f"batch={batch_id}")
    shutil.rmtree(acc_dir, ignore_errors=True)
    surv.select(F.col("_id").alias(id_col)).write.mode("overwrite").parquet(
        acc_dir
    )
    merged = surv if index is None else index.unionByName(surv)
    version = prev_version + 1
    vdir = os.path.join(path, f"v={version}")
    shutil.rmtree(vdir, ignore_errors=True)
    merged.write.mode("overwrite").parquet(vdir)
    write_pointer(path, version, batch_id=batch_id)


def maintain_neardup_filter(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    id_col: str,
    text_col: str,
    k: int = 3,
    sketch_k: int = 32,
    threshold: float = 0.5,
    available_now: bool = True,
):
    """Attach the incremental near-dup filter to a streaming document
    frame. Returns the StreamingQuery."""
    os.makedirs(path, exist_ok=True)
    writer = stream.writeStream.foreachBatch(
        # by-value closure (pickling pitfall: no module-path imports)
        lambda b, i: neardup_filter_batch(
            b, i, path, id_col, text_col, k, sketch_k, threshold
        )
    ).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
