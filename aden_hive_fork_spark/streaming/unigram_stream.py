"""Streaming unigram-LM tokenizer maintenance: the live twin of
operators/unigram_lm (q334/q335). Documents keep arriving; the
(word, freq) corpus reduction stays current as integer SUM state —
exactly mergeable and order-insensitive (the dsir_stream/langid
discipline) — and every published generation can train the FULL
hard-EM model on demand, because everything after the corpus
reduction is vocabulary-sized by design (the q240/q334 shape).

streamed == batch bit-exact BY CONSTRUCTION: the batch trainer's
first step is the same (word, freq) reduction, and `_train_chain_
from_words` is the shared seam — training over the merged live
counts is training over the union of every committed batch. The twin
test pins model AND segmentation on dict equality anyway.

Generations publish immutably through the versioned pointer with the
committed batch_id in the payload (exactly-once on replay).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.layout import read_pointer, write_pointer
from ..operators.unigram_lm import _train_chain_from_words, unigram_words

__all__ = [
    "init_unigram_state",
    "maintain_unigram_state",
    "merge_unigram_batch",
    "read_word_counts",
    "read_model",
    "read_segments",
]


def init_unigram_state(
    spark: SparkSession,
    path: str,
    text_col: str = "text",
    min_occ: int = 50,
    max_piece_len: int = 4,
    em_rounds: int = 2,
) -> None:
    """Publish generation 0: empty (word, freq) state + the training
    contract in the pointer payload."""
    os.makedirs(path, exist_ok=True)
    vdir = os.path.join(path, "v=0")
    shutil.rmtree(vdir, ignore_errors=True)
    spark.createDataFrame([], "word string, freq bigint").write.mode(
        "overwrite"
    ).parquet(vdir)
    write_pointer(
        path,
        0,
        batch_id=-1,
        unigram=json.dumps(
            {
                "text_col": text_col,
                "min_occ": int(min_occ),
                "max_piece_len": int(max_piece_len),
                "em_rounds": int(em_rounds),
            }
        ),
    )


def merge_unigram_batch(batch: DataFrame, batch_id: int, path: str) -> None:
    """Merge one micro-batch: SUM the word counts (idempotent per
    batch_id — replays are no-ops)."""
    ptr = read_pointer(path)
    if not ptr.get("path"):
        raise FileNotFoundError(
            f"no unigram state at {path} — call init_unigram_state"
        )
    committed = ptr.get("batch_id")
    if isinstance(committed, int) and batch_id <= committed:
        return  # replay
    cfg = json.loads(ptr["unigram"])
    part = unigram_words(batch, cfg["text_col"])
    if part.isEmpty():
        return
    spark = batch.sparkSession
    prev = os.path.join(path, ptr["path"])
    merged = (
        spark.read.parquet(prev)
        .unionByName(part)
        .groupBy("word")
        .agg(F.sum("freq").cast("bigint").alias("freq"))
    )
    version = ptr.get("version", 0) + 1
    vdir = os.path.join(path, f"v={version}")
    shutil.rmtree(vdir, ignore_errors=True)
    merged.write.mode("overwrite").parquet(vdir)
    write_pointer(path, version, batch_id=batch_id, unigram=ptr["unigram"])


def maintain_unigram_state(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Attach the counts sink; state must be initialized first."""
    writer = stream.writeStream.foreachBatch(
        lambda b, i: merge_unigram_batch(b, i, path)
    ).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _load(spark: SparkSession, path: str):
    ptr = read_pointer(path)
    if not ptr.get("path"):
        raise FileNotFoundError(f"no unigram state at {path}")
    cfg = json.loads(ptr["unigram"])
    words = spark.read.parquet(os.path.join(path, ptr["path"]))
    return cfg, words


def read_word_counts(spark: SparkSession, path: str) -> DataFrame:
    """The live (word, freq) corpus reduction at the committed
    generation — bit-equal to ``unigram_words`` over the union of
    every merged batch."""
    return _load(spark, path)[1]


def read_model(spark: SparkSession, path: str) -> DataFrame:
    """Train the unigram LM on the LIVE counts: the exact
    ``unigram_lm_train`` output (token, seed_cnt, cnt, logp) for the
    corpus-so-far. Vocabulary-sized work only."""
    cfg, words = _load(spark, path)
    seed, counts, final_vocab, _ = _train_chain_from_words(
        words.localCheckpoint(eager=True),
        cfg["min_occ"], cfg["max_piece_len"], cfg["em_rounds"],
    )
    return (
        seed.join(counts, "token")
        .join(final_vocab, "token")
        .select(
            "token",
            "seed_cnt",
            "cnt",
            F.round("logp", 6).cast("double").alias("logp"),
        )
    )


def read_segments(spark: SparkSession, path: str) -> DataFrame:
    """Viterbi segmentation of every live corpus word under the live
    model — the exact ``unigram_lm_segment`` output."""
    cfg, words = _load(spark, path)
    _, _, _, final_seg = _train_chain_from_words(
        words.localCheckpoint(eager=True),
        cfg["min_occ"], cfg["max_piece_len"], cfg["em_rounds"],
    )
    return final_seg.select(
        "word",
        F.col("freq").alias("word_freq"),
        "pieces",
        "n_pieces",
        F.round("score", 6).cast("double").alias("score"),
    )
