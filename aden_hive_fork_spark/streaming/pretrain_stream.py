"""Streaming twin of the pretraining-pipeline capstone (q336):
documents keep arriving; every committed micro-batch publishes a NEW
consistent nine-stage census over the corpus-so-far.

Unlike the counter twins (drift, langid, vocab, DSIR), the pipeline's
stages are corpus-GLOBAL — connected-component dedup, the corpus-
trained langid/DSIR models, the per-source budget prefix — so there
is no exactly-mergeable sufficient statistic for the final census.
The honest streaming semantics (the operators/ivm recompute-by-key
discipline, taken to its whole-corpus limit) is therefore:

- STATE = the accumulated raw corpus, exactly-once by doc id (first
  writer wins; replayed batch_ids are no-ops via the committed
  batch_id in the pointer payload — the cdc_sink marker discipline);
- each commit RECOMPUTES the census with the same batch operator
  (operators/pretrain_pipeline.pretrain_pipeline_census) over the
  merged corpus and publishes it immutably through the versioned
  pointer, so readers always see a census consistent with ONE corpus
  generation, never a half-merged view.

streamed == batch by construction — the recompute IS the batch
operator — and the twin test pins it on dict equality anyway (the
drift_stream discipline), plus replay no-op and duplicate-doc
idempotence.

At 100 TB the same design holds with the recompute throttled to
publication epochs (hourly/daily data drops, not per-micro-batch):
the census is a release artifact, and each stage inside the
recompute is the already-audited scale shape. ``census_every=N``
makes that epoch mode expressible: the corpus still merges
exactly-once per batch, but the nine-stage recompute only runs on
every Nth published generation; the pointer's ``census_version``
records which generation the visible census belongs to, so readers
still never see a half-merged view.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.layout import read_pointer, write_pointer
from ..operators.pretrain_pipeline import pretrain_pipeline_census

__all__ = [
    "init_pretrain_pipeline",
    "merge_pretrain_batch",
    "maintain_pretrain_pipeline",
    "read_corpus",
    "read_census",
]

_CORPUS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, "
    "n_chars bigint"
)
_CENSUS_SCHEMA = "stage string, n_docs bigint, n_tokens bigint"


def init_pretrain_pipeline(spark: SparkSession, path: str) -> None:
    """Publish generation 0: empty corpus, empty census."""
    os.makedirs(path, exist_ok=True)
    vdir = os.path.join(path, "v=0")
    shutil.rmtree(vdir, ignore_errors=True)
    spark.createDataFrame([], _CORPUS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(os.path.join(vdir, "corpus"))
    spark.createDataFrame([], _CENSUS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(os.path.join(vdir, "census"))
    write_pointer(path, 0, batch_id=-1, census_version=0)


def merge_pretrain_batch(
    batch: DataFrame, batch_id: int, path: str, census_every: int = 1
) -> None:
    """Merge one micro-batch of documents (doc_id, text, lang,
    source, n_chars) and publish the recomputed census. Idempotent
    per batch_id; duplicate doc ids (within the batch or vs the
    accumulated corpus) keep the FIRST-committed row.

    ``census_every=N`` throttles the nine-stage recompute (whose cost
    grows with the ACCUMULATED corpus, not the batch) to every Nth
    published generation — the 'publication epoch' mode. Skipped
    generations publish the merged corpus with ``census_version``
    still pointing at the last recomputed census."""
    from ..operators.dedup import exact_dedup

    if census_every < 1:
        raise ValueError("census_every must be >= 1")
    ptr = read_pointer(path)
    if not ptr.get("path"):
        raise FileNotFoundError(
            f"no pipeline state at {path} — call init_pretrain_pipeline"
        )
    committed = ptr.get("batch_id")
    if isinstance(committed, int) and batch_id <= committed:
        return  # replay
    rows = exact_dedup(
        batch.filter(F.col("doc_id").isNotNull()).select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "text",
            "lang",
            "source",
            F.col("n_chars").cast("bigint").alias("n_chars"),
        ),
        ["doc_id"],
        "doc_id",
    )
    spark = batch.sparkSession
    prev = os.path.join(path, ptr["path"])
    old = spark.read.parquet(os.path.join(prev, "corpus"))
    corpus = old.unionByName(
        rows.join(old.select("doc_id"), "doc_id", "left_anti")
    ).localCheckpoint(eager=True)
    version = ptr.get("version", 0) + 1
    vdir = os.path.join(path, f"v={version}")
    shutil.rmtree(vdir, ignore_errors=True)
    corpus.write.mode("overwrite").parquet(os.path.join(vdir, "corpus"))
    if version % census_every == 0:
        # observe=False: this runs inside a foreachBatch sink, where
        # the micro-batch's CLONED SparkSession never fires batch
        # Observation listeners — the direct-aggregate census path is
        # the correct form here (r13)
        census = pretrain_pipeline_census(corpus, observe=False)
        census.write.mode("overwrite").parquet(
            os.path.join(vdir, "census")
        )
        census_version = version
    else:
        census_version = ptr.get("census_version", ptr.get("version", 0))
    write_pointer(
        path, version, batch_id=batch_id, census_version=census_version
    )


def maintain_pretrain_pipeline(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
    census_every: int = 1,
):
    """Attach the pipeline sink; state must be initialized first."""
    writer = stream.writeStream.foreachBatch(
        lambda b, i: merge_pretrain_batch(b, i, path, census_every)
    ).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_corpus(spark: SparkSession, path: str) -> DataFrame:
    """The accumulated raw corpus at the committed generation."""
    ptr = read_pointer(path)
    if not ptr.get("path"):
        raise FileNotFoundError(f"no pipeline state at {path}")
    return spark.read.parquet(
        os.path.join(path, ptr["path"], "corpus")
    )


def read_census(spark: SparkSession, path: str) -> DataFrame:
    """The published nine-stage census at the committed
    ``census_version`` generation — bit-equal to
    ``pretrain_pipeline_census`` over THAT generation's corpus (the
    current generation when ``census_every=1``, the last epoch's
    otherwise)."""
    ptr = read_pointer(path)
    if not ptr.get("path"):
        raise FileNotFoundError(f"no pipeline state at {path}")
    cv = ptr.get("census_version", ptr.get("version", 0))
    return spark.read.parquet(
        os.path.join(path, f"v={cv}", "census")
    )
