"""Streaming PSI drift monitor: a frozen reference distribution,
live bin counts maintained per micro-batch, drift read on demand —
the production form of q252's batch PSI (a model-input monitor that
never rescans history).

Shape (the stats_stream/rollup_stream discipline):

- ``freeze_reference`` runs ONCE over the reference corpus: one
  percentile aggregate for the equi-depth cuts (rounded, stored in
  the pointer payload — they are the CONTRACT; drift is only
  meaningful against fixed bins) and one pass for the reference bin
  counts, published as generation 0.
- Each micro-batch bins its rows against the frozen cuts (map-side
  fold — no state lookup, no shuffle beyond the |bins| aggregate)
  and sum-merges integer counts into the current-counts table; a new
  immutable generation publishes through the versioned pointer, with
  the committed ``batch_id`` riding in the payload so replays are
  no-ops (exactly-once).
- ``read_drift`` derives the per-bin PSI terms and the total from
  the two integer count tables with the exact q252 arithmetic —
  readers never touch raw data.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.layout import read_pointer, write_pointer

__all__ = [
    "freeze_reference",
    "freeze_wasserstein_reference",
    "maintain_drift",
    "maintain_wasserstein",
    "merge_drift_batch",
    "merge_wasserstein_batch",
    "read_drift",
    "read_wasserstein",
]


def _bin_col(value_col: str, cuts: list[float]):
    x = F.col(value_col).cast("double")
    arr = F.array(*[F.lit(float(c)) for c in cuts])
    return (
        F.lit(1)
        + F.aggregate(
            arr, F.lit(0), lambda acc, c: acc + F.when(x > c, 1).otherwise(0)
        )
    ).cast("int")


def _bin_counts(df: DataFrame, value_col: str, cuts: list[float]) -> DataFrame:
    return (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("bin", _bin_col(value_col, cuts))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def freeze_reference(
    ref: DataFrame,
    value_col: str,
    path: str,
    n_bins: int = 10,
    ndigits: int = 6,
) -> list[float]:
    """Publish generation 0: the rounded equi-depth cuts (pointer
    payload) and the reference bin counts. Returns the cuts."""
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    os.makedirs(path, exist_ok=True)
    fracs = [i / n_bins for i in range(1, n_bins)]
    x = F.col(value_col).cast("double")
    row = ref.filter(x.isNotNull()).agg(
        F.transform(
            F.percentile(x, F.array(*[F.lit(f) for f in fracs])),
            lambda v: F.round(v, ndigits),
        ).alias("cuts")
    ).collect()[0]
    if row["cuts"] is None:
        raise ValueError("freeze_reference: reference has no rows")
    cuts = [float(c) for c in row["cuts"]]
    _bin_counts(ref, value_col, cuts).write.mode("overwrite").parquet(
        os.path.join(path, "ref")
    )
    empty = ref.sparkSession.createDataFrame([], "bin int, n bigint")
    vdir = os.path.join(path, "v=0")
    shutil.rmtree(vdir, ignore_errors=True)
    empty.write.mode("overwrite").parquet(vdir)
    write_pointer(path, 0, batch_id=-1, cuts=cuts)
    return cuts


def merge_drift_batch(
    batch: DataFrame, batch_id: int, path: str, value_col: str
) -> None:
    """Sum-merge one micro-batch's bin counts (idempotent per
    batch_id; integer addition is exact and associative, so the
    merged table equals a one-pass rebuild bit-for-bit)."""
    ptr = read_pointer(path)
    if not ptr.get("path"):
        raise FileNotFoundError(
            f"no frozen reference at {path} — call freeze_reference first"
        )
    committed = ptr.get("batch_id")
    if isinstance(committed, int) and batch_id <= committed:
        return  # replay
    cuts = [float(c) for c in ptr["cuts"]]
    spark = batch.sparkSession
    part = _bin_counts(batch, value_col, cuts)
    if part.isEmpty():
        return
    prev = spark.read.parquet(os.path.join(path, ptr["path"]))
    merged = (
        prev.unionByName(part)
        .groupBy("bin")
        .agg(F.sum("n").cast("bigint").alias("n"))
    )
    version = ptr.get("version", 0) + 1
    vdir = os.path.join(path, f"v={version}")
    shutil.rmtree(vdir, ignore_errors=True)
    merged.write.mode("overwrite").parquet(vdir)
    write_pointer(path, version, batch_id=batch_id, cuts=cuts)


def maintain_drift(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    value_col: str,
    available_now: bool = True,
):
    """Attach the drift-monitor sink; reference must be frozen
    first. Returns the StreamingQuery."""
    writer = stream.writeStream.foreachBatch(
        lambda b, i: merge_drift_batch(b, i, path, value_col)
    ).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_drift(spark: SparkSession, path: str, ndigits: int = 6) -> DataFrame:
    """Per-bin drift report + total PSI from the two count tables —
    the exact q252 arithmetic (fquant'd ln, empty bins contribute
    0). Columns: ``bin, n_ref, n_cur, p, q, psi_term, psi``."""
    from ..operators.stats import fquant

    ptr = read_pointer(path)
    if not ptr.get("path"):
        raise FileNotFoundError(f"no drift state at {path}")
    ref = spark.read.parquet(os.path.join(path, "ref")).select(
        "bin", F.col("n").alias("n_ref")
    )
    cur = spark.read.parquet(os.path.join(path, ptr["path"])).select(
        "bin", F.col("n").alias("n_cur")
    )
    j = (
        ref.join(cur, "bin", "full")
        .select(
            "bin",
            F.coalesce(F.col("n_ref"), F.lit(0)).cast("bigint").alias("n_ref"),
            F.coalesce(F.col("n_cur"), F.lit(0)).cast("bigint").alias("n_cur"),
        )
    )
    tot = j.agg(
        F.sum("n_ref").cast("bigint").alias("_tr"),
        F.sum("n_cur").cast("bigint").alias("_tc"),
    )
    jt = j.crossJoin(F.broadcast(tot))
    p = F.col("n_ref").cast("double") / F.col("_tr").cast("double")
    q = F.col("n_cur").cast("double") / F.nullif(
        F.col("_tc").cast("double"), F.lit(0.0)
    )
    term = F.when(
        (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
        (q - p) * fquant(F.log(q / p), 9),
    ).otherwise(F.lit(0.0))
    detail = jt.select(
        "bin",
        "n_ref",
        "n_cur",
        F.round(p, ndigits).cast("double").alias("p"),
        F.round(q, ndigits).cast("double").alias("q"),
        F.round(term, ndigits).cast("double").alias("psi_term"),
    )
    total = detail.agg(
        F.round(
            F.aggregate(
                F.sort_array(F.collect_list("psi_term")),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ),
            ndigits,
        )
        .cast("double")
        .alias("psi")
    )
    return detail.crossJoin(F.broadcast(total))


# ---------------------------------------------------------------------------
# Streaming exact 1-Wasserstein drift (round 8, VERDICT r7 task 7):
# q304's frozen-reference analog on the same pointer-committed
# pattern. State is the per-distinct-scaled-value integer count table
# — exactly sum-mergeable per micro-batch — so the streamed state
# reduces through operators/stats.wasserstein_from_counts to the SAME
# bits as a one-pass batch wasserstein_1d over the union
# (tests/test_drift_stream.py pins streamed == batch).
# ---------------------------------------------------------------------------


def _scaled_value_counts(
    df: DataFrame, value_col: str, scale: int
) -> DataFrame:
    """(_v, n): counts per value quantized to scaled integers — the
    exact q304 quantization (decimal(18,scale) → ×10^scale → long)."""
    mult = 10 ** scale
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            (F.col(value_col).cast(f"decimal(18,{scale})") * mult)
            .cast("long")
            .alias("_v")
        )
        .groupBy("_v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def freeze_wasserstein_reference(
    ref: DataFrame, value_col: str, path: str, scale: int = 2
) -> None:
    """Publish generation 0: the reference's scaled-value counts (one
    pass) plus the quantization scale in the pointer payload (the
    contract — W1 is only meaningful against a fixed grid)."""
    os.makedirs(path, exist_ok=True)
    counts = _scaled_value_counts(ref, value_col, scale)
    if counts.isEmpty():
        raise ValueError("freeze_wasserstein_reference: reference has no rows")
    counts.write.mode("overwrite").parquet(os.path.join(path, "wref"))
    empty = ref.sparkSession.createDataFrame([], "_v long, n bigint")
    vdir = os.path.join(path, "v=0")
    shutil.rmtree(vdir, ignore_errors=True)
    empty.write.mode("overwrite").parquet(vdir)
    write_pointer(path, 0, batch_id=-1, scale=scale)


def merge_wasserstein_batch(
    batch: DataFrame, batch_id: int, path: str, value_col: str
) -> None:
    """Sum-merge one micro-batch's scaled-value counts (idempotent per
    batch_id; integer addition is exact and associative, so merged
    state == one-pass rebuild bit-for-bit)."""
    ptr = read_pointer(path)
    if not ptr.get("path"):
        raise FileNotFoundError(
            f"no frozen wasserstein reference at {path} — call "
            "freeze_wasserstein_reference first"
        )
    committed = ptr.get("batch_id")
    if isinstance(committed, int) and batch_id <= committed:
        return  # replay
    scale = int(ptr["scale"])
    part = _scaled_value_counts(batch, value_col, scale)
    if part.isEmpty():
        return
    spark = batch.sparkSession
    prev = spark.read.parquet(os.path.join(path, ptr["path"]))
    merged = (
        prev.unionByName(part)
        .groupBy("_v")
        .agg(F.sum("n").cast("bigint").alias("n"))
    )
    version = ptr.get("version", 0) + 1
    vdir = os.path.join(path, f"v={version}")
    shutil.rmtree(vdir, ignore_errors=True)
    merged.write.mode("overwrite").parquet(vdir)
    write_pointer(path, version, batch_id=batch_id, scale=scale)


def maintain_wasserstein(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    value_col: str,
    available_now: bool = True,
):
    """Attach the W1 drift sink; reference must be frozen first."""
    writer = stream.writeStream.foreachBatch(
        lambda b, i: merge_wasserstein_batch(b, i, path, value_col)
    ).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_wasserstein(
    spark: SparkSession, path: str, ndigits: int = 6
) -> DataFrame:
    """W1 between the frozen reference and the live distribution,
    derived from the two integer count tables through the EXACT q304
    reduction (operators/stats.wasserstein_from_counts) — readers
    never touch raw data. 1-row output ``n_a, n_b, w1`` (reference is
    side a)."""
    from ..operators.stats import wasserstein_from_counts

    ptr = read_pointer(path)
    if not ptr.get("path"):
        raise FileNotFoundError(f"no wasserstein state at {path}")
    ref = spark.read.parquet(os.path.join(path, "wref")).select(
        "_v", F.col("n").alias("_ca")
    )
    cur = spark.read.parquet(os.path.join(path, ptr["path"])).select(
        "_v", F.col("n").alias("_cb")
    )
    vt = (
        ref.join(cur, "_v", "full")
        .select(
            "_v",
            F.coalesce(F.col("_ca"), F.lit(0)).cast("long").alias("_ca"),
            F.coalesce(F.col("_cb"), F.lit(0)).cast("long").alias("_cb"),
        )
    )
    return wasserstein_from_counts(
        vt, scale=int(ptr["scale"]), ndigits=ndigits
    )
