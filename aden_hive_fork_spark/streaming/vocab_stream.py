"""Streaming vocabulary-growth maintenance: the live twin of
operators/quality.vocabulary_growth (q324). Documents keep arriving;
the Heaps'-law saturation curve stays current without rescanning
history.

State is EXACTLY mergeable, so streamed == batch bit-for-bit (the
drift_stream/langid_stream discipline):

- per-bucket counters ``(bucket, n_docs, n_tokens)`` — integer SUM
  merge;
- per-word first occurrence ``(word, first_bucket)`` — MIN merge
  (MIN is associative/commutative and replay-idempotent).

The bucket domain is STATIC, declared at init as the half-open id
range [id_lo, id_hi) — a stream cannot know the final min/max id, so
the twin contract pins the same explicit domain on the batch side
(``vocabulary_growth(..., id_lo=, id_hi=)``). Each generation
publishes immutably through the versioned pointer with the committed
batch_id riding in the payload (exactly-once on replay).
``read_growth`` derives the cumulative curve with the same
buckets-sized window as the batch operator.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.layout import read_pointer, write_pointer

__all__ = [
    "init_vocab_growth",
    "maintain_vocab_growth",
    "merge_vocab_batch",
    "read_growth",
]


def init_vocab_growth(
    spark: SparkSession,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 20,
    id_lo: int = 0,
    id_hi: int = 1,
) -> None:
    """Publish generation 0: empty counter + first-occurrence state
    and the bucket contract (columns, buckets, [id_lo, id_hi)) in the
    pointer payload."""
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    if not id_hi > id_lo:
        raise ValueError("need id_hi > id_lo")
    os.makedirs(path, exist_ok=True)
    vdir = os.path.join(path, "v=0")
    shutil.rmtree(vdir, ignore_errors=True)
    spark.createDataFrame(
        [], "bucket int, n_docs bigint, n_tokens bigint"
    ).write.mode("overwrite").parquet(os.path.join(vdir, "buckets"))
    spark.createDataFrame(
        [], "word string, first_bucket int"
    ).write.mode("overwrite").parquet(os.path.join(vdir, "words"))
    write_pointer(
        path,
        0,
        batch_id=-1,
        vocab_growth=json.dumps(
            {
                "id_col": id_col,
                "text_col": text_col,
                "buckets": int(buckets),
                "id_lo": int(id_lo),
                "id_hi": int(id_hi),
            }
        ),
    )


def _bucket(cfg: dict, id_col: str):
    return F.floor(
        (F.col(id_col) - cfg["id_lo"]).cast("bigint")
        * cfg["buckets"]
        / (cfg["id_hi"] - cfg["id_lo"])
    ).cast("int")


def merge_vocab_batch(batch: DataFrame, batch_id: int, path: str) -> None:
    """Merge one micro-batch: SUM the bucket counters, MIN the
    per-word first bucket (idempotent per batch_id)."""
    ptr = read_pointer(path)
    if not ptr.get("path"):
        raise FileNotFoundError(
            f"no vocab-growth state at {path} — call init_vocab_growth"
        )
    committed = ptr.get("batch_id")
    if isinstance(committed, int) and batch_id <= committed:
        return  # replay
    cfg = json.loads(ptr["vocab_growth"])
    idc, txt = cfg["id_col"], cfg["text_col"]
    base = batch.filter(
        F.col(idc).isNotNull() & F.col(txt).isNotNull()
    ).select(
        _bucket(cfg, idc).alias("bucket"),
        F.split(F.trim(F.col(txt)), " ").alias("_ws"),
    )
    if base.isEmpty():
        return
    bpart = base.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.filter("_ws", lambda w: w != "")))
        .cast("bigint")
        .alias("n_tokens"),
    )
    wpart = (
        base.select("bucket", F.explode("_ws").alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.min("bucket").cast("int").alias("first_bucket"))
    )
    spark = batch.sparkSession
    prev = os.path.join(path, ptr["path"])
    buckets = (
        spark.read.parquet(os.path.join(prev, "buckets"))
        .unionByName(bpart)
        .groupBy("bucket")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
    )
    words = (
        spark.read.parquet(os.path.join(prev, "words"))
        .unionByName(wpart)
        .groupBy("word")
        .agg(F.min("first_bucket").cast("int").alias("first_bucket"))
    )
    version = ptr.get("version", 0) + 1
    vdir = os.path.join(path, f"v={version}")
    shutil.rmtree(vdir, ignore_errors=True)
    buckets.write.mode("overwrite").parquet(os.path.join(vdir, "buckets"))
    words.write.mode("overwrite").parquet(os.path.join(vdir, "words"))
    write_pointer(
        path, version, batch_id=batch_id, vocab_growth=ptr["vocab_growth"]
    )


def maintain_vocab_growth(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Attach the growth sink; state must be initialized first."""
    writer = stream.writeStream.foreachBatch(
        lambda b, i: merge_vocab_batch(b, i, path)
    ).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_growth(spark: SparkSession, path: str) -> DataFrame:
    """The cumulative Heaps curve derived from the live counters —
    the EXACT q324 output shape (bucket, n_docs, tokens_cum,
    vocab_cum), equal to ``vocabulary_growth(union of all batches,
    id_lo=, id_hi=)`` on dict equality."""
    ptr = read_pointer(path)
    if not ptr.get("path"):
        raise FileNotFoundError(f"no vocab-growth state at {path}")
    vdir = os.path.join(path, ptr["path"])
    buckets = spark.read.parquet(os.path.join(vdir, "buckets"))
    words = spark.read.parquet(os.path.join(vdir, "words"))
    firsts = words.groupBy("first_bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("_new_words")
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        buckets.join(
            firsts, buckets["bucket"] == firsts["first_bucket"], "left"
        )
        .select(
            "bucket",
            "n_docs",
            F.sum("n_tokens").over(w).cast("bigint").alias("tokens_cum"),
            F.sum(F.coalesce("_new_words", F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("vocab_cum"),
        )
    )
