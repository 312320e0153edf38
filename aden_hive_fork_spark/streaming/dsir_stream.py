"""Streaming DSIR model maintenance: the live twin of
operators/sampling.dsir_importance's MODEL half (q326). Labeled
documents keep arriving; the target-vs-raw unigram ratio table stays
current without rescanning history, and scoring any batch of
candidate documents against the live model gives exactly what the
batch operator would compute over the union of every merged batch.

State is the pair of unigram count columns ``(word, c_raw, c_tgt)``
— integer SUM merges, exactly mergeable and order-insensitive, the
langid_stream discipline. The smoothing totals (vocab size, token
totals) are DERIVED at read time from the state itself, so they are
always consistent with the counts. Generations publish immutably
through the versioned pointer with the committed batch_id riding in
the payload (exactly-once on replay).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.layout import read_pointer, write_pointer

__all__ = [
    "init_dsir_model",
    "maintain_dsir_model",
    "merge_dsir_batch",
    "read_ratio_table",
    "score_documents",
]


def init_dsir_model(
    spark: SparkSession,
    path: str,
    text_col: str = "text",
    target_col: str = "tgt",
    ndigits: int = 6,
) -> None:
    """Publish generation 0: empty count state + the column contract
    in the pointer payload."""
    os.makedirs(path, exist_ok=True)
    vdir = os.path.join(path, "v=0")
    shutil.rmtree(vdir, ignore_errors=True)
    spark.createDataFrame(
        [], "word string, c_raw bigint, c_tgt bigint"
    ).write.mode("overwrite").parquet(vdir)
    write_pointer(
        path,
        0,
        batch_id=-1,
        dsir=json.dumps(
            {
                "text_col": text_col,
                "target_col": target_col,
                "ndigits": int(ndigits),
            }
        ),
    )


def merge_dsir_batch(batch: DataFrame, batch_id: int, path: str) -> None:
    """Sum-merge one micro-batch's (word, c_raw, c_tgt) counts
    (idempotent per batch_id)."""
    ptr = read_pointer(path)
    if not ptr.get("path"):
        raise FileNotFoundError(
            f"no dsir model state at {path} — call init_dsir_model"
        )
    committed = ptr.get("batch_id")
    if isinstance(committed, int) and batch_id <= committed:
        return  # replay
    cfg = json.loads(ptr["dsir"])
    part = (
        batch.filter(
            F.col(cfg["text_col"]).isNotNull()
            & F.col(cfg["target_col"]).isNotNull()
        )
        .select(
            F.col(cfg["target_col"]).alias("_tgt"),
            F.explode(
                F.split(F.col(cfg["text_col"]), r"\s+")
            ).alias("word"),
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("c_raw"),
            F.sum(F.when(F.col("_tgt"), 1).otherwise(0))
            .cast("bigint")
            .alias("c_tgt"),
        )
    )
    if part.isEmpty():
        return
    spark = batch.sparkSession
    prev = spark.read.parquet(os.path.join(path, ptr["path"]))
    merged = (
        prev.unionByName(part)
        .groupBy("word")
        .agg(
            F.sum("c_raw").cast("bigint").alias("c_raw"),
            F.sum("c_tgt").cast("bigint").alias("c_tgt"),
        )
    )
    version = ptr.get("version", 0) + 1
    vdir = os.path.join(path, f"v={version}")
    shutil.rmtree(vdir, ignore_errors=True)
    merged.write.mode("overwrite").parquet(vdir)
    write_pointer(path, version, batch_id=batch_id, dsir=ptr["dsir"])


def maintain_dsir_model(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Attach the model sink; state must be initialized first."""
    writer = stream.writeStream.foreachBatch(
        lambda b, i: merge_dsir_batch(b, i, path)
    ).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_ratio_table(spark: SparkSession, path: str) -> DataFrame:
    """The per-word quantized log-ratio table derived from the live
    counts — EXACTLY dsir_importance's internal model (add-one
    smoothed ROUND-``ndigits`` probabilities, ln terms floor-
    quantized 1e-9) over the union of every merged batch.

    Returns (word, term DOUBLE)."""
    from ..operators.stats import fquant

    ptr = read_pointer(path)
    if not ptr.get("path"):
        raise FileNotFoundError(f"no dsir model state at {path}")
    cfg = json.loads(ptr["dsir"])
    nd = cfg["ndigits"]
    counts = spark.read.parquet(os.path.join(path, ptr["path"]))
    totals = counts.agg(
        F.count(F.lit(1)).cast("bigint").alias("_v"),
        F.sum("c_raw").cast("bigint").alias("_n_raw"),
        F.sum("c_tgt").cast("bigint").alias("_n_tgt"),
    )
    # Same probability floor as the batch operator: round-to-nd of
    # 1/(N+V) underflows to 0.0 past ~2*10**nd total tokens and ln(0)
    # would NULL the term — clamp at 10**-nd.
    p_floor = F.lit(10.0**-nd)
    p_t = F.greatest(
        F.round(
            (F.col("c_tgt") + 1).cast("double")
            / (F.col("_n_tgt") + F.col("_v")).cast("double"),
            nd,
        ),
        p_floor,
    )
    p_r = F.greatest(
        F.round(
            (F.col("c_raw") + 1).cast("double")
            / (F.col("_n_raw") + F.col("_v")).cast("double"),
            nd,
        ),
        p_floor,
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "word", fquant(F.log(p_t) - F.log(p_r), 9).alias("term")
    )


def score_documents(
    docs: DataFrame,
    ratio_table: DataFrame,
    id_col: str,
    text_col: str = "text",
    ndigits: int = 6,
) -> DataFrame:
    """Score candidate documents against a live ratio table — the
    scoring half of dsir_importance, factored so the model can come
    from the stream. Same determinism: sorted-fold of the quantized
    terms, ROUND-``ndigits`` output.

    Tokens absent from the model (never seen in any merged batch)
    are DROPPED from the score, exactly as the batch operator's
    inner model join drops nothing only because its model is built
    from the same corpus — callers scoring foreign text should merge
    that text's batch first.

    Returns (``id_col``, n_tokens BIGINT, log_ratio DOUBLE)."""
    from ..operators.stats import det_sum

    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    per = (
        toks.join(ratio_table, "word")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            det_sum(F.col("term"), 9).alias("_s"),
        )
    )
    return per.select(
        F.col("_id").alias(id_col),
        "n_tokens",
        F.round("_s", ndigits).cast("double").alias("log_ratio"),
    )
