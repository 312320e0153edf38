"""Streaming language-profile maintenance: per-(lang, gram) integer
counts folded per micro-batch, ranks derived at read time — the
production form of q317's batch profile build (new labeled corpus
keeps arriving; the classifier's profile table stays current without
rescanning history).

Shape (the drift_stream discipline): gram counts are EXACTLY
sum-mergeable integers, so the streamed state equals a one-pass batch
rebuild bit-for-bit; a new immutable generation publishes through the
versioned pointer with the committed batch_id riding in the payload
(exactly-once on replay). ``read_profiles`` applies the SAME rank
window as ``operators/langid.langid_profiles``, so
``read_profiles(...) == langid_profiles(union of all batches)`` on
dict equality — and the result feeds ``langid_classify`` unchanged.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.langid import _grams, _normalize
from ..operators.layout import read_pointer, write_pointer

__all__ = [
    "init_langid_profiles",
    "maintain_langid_profiles",
    "merge_langid_batch",
    "read_profiles",
]


def init_langid_profiles(
    spark: SparkSession,
    path: str,
    text_col: str = "text",
    lang_col: str = "lang",
    n: int = 3,
    profile_size: int = 300,
) -> None:
    """Publish generation 0: empty count state + the n-gram contract
    (n, profile_size, column names) in the pointer payload."""
    if n < 1:
        raise ValueError("n must be >= 1")
    os.makedirs(path, exist_ok=True)
    empty = spark.createDataFrame([], "lang string, gram string, gram_count bigint")
    vdir = os.path.join(path, "v=0")
    shutil.rmtree(vdir, ignore_errors=True)
    empty.write.mode("overwrite").parquet(vdir)
    write_pointer(
        path,
        0,
        batch_id=-1,
        langid=json.dumps(
            {
                "text_col": text_col,
                "lang_col": lang_col,
                "n": int(n),
                "profile_size": int(profile_size),
            }
        ),
    )


def merge_langid_batch(batch: DataFrame, batch_id: int, path: str) -> None:
    """Sum-merge one micro-batch's (lang, gram) counts (idempotent per
    batch_id; integer addition is exact and associative, so merged
    state == one-pass rebuild bit-for-bit)."""
    ptr = read_pointer(path)
    if not ptr.get("path"):
        raise FileNotFoundError(
            f"no langid profile state at {path} — call init_langid_profiles"
        )
    committed = ptr.get("batch_id")
    if isinstance(committed, int) and batch_id <= committed:
        return  # replay
    cfg = json.loads(ptr["langid"])
    part = (
        batch.filter(
            F.col(cfg["text_col"]).isNotNull()
            & F.col(cfg["lang_col"]).isNotNull()
        )
        .select(
            F.col(cfg["lang_col"]).alias("lang"),
            F.explode(
                _grams(_normalize(cfg["text_col"]), cfg["n"])
            ).alias("gram"),
        )
        .groupBy("lang", "gram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("gram_count"))
    )
    if part.isEmpty():
        return
    spark = batch.sparkSession
    prev = spark.read.parquet(os.path.join(path, ptr["path"]))
    merged = (
        prev.unionByName(part)
        .groupBy("lang", "gram")
        .agg(F.sum("gram_count").cast("bigint").alias("gram_count"))
    )
    version = ptr.get("version", 0) + 1
    vdir = os.path.join(path, f"v={version}")
    shutil.rmtree(vdir, ignore_errors=True)
    merged.write.mode("overwrite").parquet(vdir)
    write_pointer(path, version, batch_id=batch_id, langid=ptr["langid"])


def maintain_langid_profiles(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Attach the profile sink; state must be initialized first."""
    writer = stream.writeStream.foreachBatch(
        lambda b, i: merge_langid_batch(b, i, path)
    ).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_profiles(spark: SparkSession, path: str) -> DataFrame:
    """The ranked profile table derived from the live counts — the
    EXACT q317 rank window (count desc, gram asc; rank <=
    profile_size), so the output plugs straight into
    ``langid_classify`` and equals the batch ``langid_profiles`` over
    the union of every merged batch."""
    ptr = read_pointer(path)
    if not ptr.get("path"):
        raise FileNotFoundError(f"no langid profile state at {path}")
    cfg = json.loads(ptr["langid"])
    counts = spark.read.parquet(os.path.join(path, ptr["path"]))
    w = Window.partitionBy("lang").orderBy(
        F.desc("gram_count"), F.asc("gram")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= cfg["profile_size"])
        .select("lang", "gram", "rank", "gram_count")
    )
