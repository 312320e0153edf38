"""Streaming Holt-Winters: per-key (level, trend, seasonal-ring)
state carried across micro-batches, bit-exact with the batch
operator (q315's ``operators/timeseries.holt_winters``).

Shape (the drift_stream / packing_stream discipline):

- ``init_holt_winters`` publishes generation 0 with the smoothing
  contract (period m, alpha/beta/gamma) in the pointer payload — the
  recursion is only meaningful under fixed parameters. NULL-key rows
  are excluded from streaming state (the state join is an equi-join;
  canonicalize nullable keys before streaming).
- Each micro-batch appends its per-key observations IN ORDER
  (``order_col`` must be unique per key and batches must arrive in
  order — the packing_stream cross-batch-continuation contract).
  Keys buffer raw (t, x) pairs until 2·m observations exist, then
  initialize with the exact batch formula and fold the remainder;
  initialized keys fold the new values directly onto the carried
  (l, b, s) struct. Both folds reuse the batch operator's OWN
  ``hw_init_struct`` / ``hw_step`` expression builders, so the
  streamed arithmetic is the identical double-op sequence — streamed
  == batch bit-for-bit, not approximately.
- A new immutable generation publishes through the versioned pointer
  with the committed batch_id riding in the payload (exactly-once on
  replay).
- ``read_holt_winters`` renders initialized keys through the batch
  operator's ``hw_outputs`` codec (same rounding, same columns).

State size is |keys| rows × (m+small) doubles — a model-state table,
never a history rescan; each merge touches one micro-batch plus the
state table (keyed join, no window).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.layout import read_pointer, write_pointer
from ..operators.timeseries import hw_init_struct, hw_outputs, hw_step

__all__ = [
    "init_holt_winters",
    "maintain_holt_winters",
    "merge_holt_winters_batch",
    "read_holt_winters",
]

_STATE_SCHEMA_FMT = (
    "{keys}, inited boolean, n_obs bigint, "
    "st struct<l: double, b: double, s: array<double>>, "
    "buf array<struct<t: {ot}, x: double>>"
)


def init_holt_winters(
    spark: SparkSession,
    path: str,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    period: int = 7,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    key_types: str = "bigint",
    order_type: str = "bigint",
) -> None:
    """Publish generation 0: empty state + the smoothing contract.
    ``key_types`` is either one SQL type applied to every key column
    or a comma-separated list matching ``key_cols``."""
    m = int(period)
    if m < 2:
        raise ValueError("period must be >= 2")
    if not 0.0 < float(alpha) <= 1.0:
        raise ValueError("alpha in (0,1] required")
    os.makedirs(path, exist_ok=True)
    types = (
        [t.strip() for t in key_types.split(",")]
        if "," in key_types
        else [key_types] * len(key_cols)
    )
    keys_ddl = ", ".join(f"{k} {t}" for k, t in zip(key_cols, types))
    schema = _STATE_SCHEMA_FMT.format(keys=keys_ddl, ot=order_type)
    empty = spark.createDataFrame([], schema)
    vdir = os.path.join(path, "v=0")
    shutil.rmtree(vdir, ignore_errors=True)
    empty.write.mode("overwrite").parquet(vdir)
    write_pointer(
        path,
        0,
        batch_id=-1,
        hw=json.dumps(
            {
                "key_cols": key_cols,
                "order_col": order_col,
                "value_col": value_col,
                "m": m,
                "alpha": float(alpha),
                "beta": float(beta),
                "gamma": float(gamma),
            }
        ),
    )


def merge_holt_winters_batch(
    batch: DataFrame, batch_id: int, path: str
) -> None:
    """Fold one micro-batch into the per-key HW state (idempotent per
    batch_id). Buffered keys initialize the moment they reach 2·m
    observations; initialized keys continue the recursion with the
    batch operator's exact step closure."""
    ptr = read_pointer(path)
    if not ptr.get("path"):
        raise FileNotFoundError(
            f"no holt-winters state at {path} — call init_holt_winters"
        )
    committed = ptr.get("batch_id")
    if isinstance(committed, int) and batch_id <= committed:
        return  # replay
    cfg = json.loads(ptr["hw"])
    key_cols, m = cfg["key_cols"], cfg["m"]
    a, b_, g = cfg["alpha"], cfg["beta"], cfg["gamma"]
    spark = batch.sparkSession

    # NULL keys are excluded: the state join below is an equi-join and
    # NULL never matches NULL, so a null-key series would fork a new
    # state row every batch instead of continuing one. The batch
    # operator groups NULL keys into their own series; callers with
    # nullable keys must canonicalize (coalesce to a sentinel) before
    # streaming — the same contract the keyed connectors document.
    null_key = None
    for kc in key_cols:
        cond = F.col(kc).isNull()
        null_key = cond if null_key is None else (null_key | cond)
    new = (
        batch.filter(
            F.col(cfg["value_col"]).isNotNull()
            & F.col(cfg["order_col"]).isNotNull()
            & ~null_key
        )
        .groupBy(*key_cols)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(cfg["order_col"]).alias("t"),
                        F.col(cfg["value_col"]).cast("double").alias("x"),
                    )
                )
            ).alias("_new")
        )
    )
    if new.isEmpty():
        return
    prev = spark.read.parquet(os.path.join(path, ptr["path"]))
    empty_buf = F.array().cast(
        prev.schema["buf"].dataType.simpleString()
    )
    j = prev.join(new, key_cols, "full").select(
        *key_cols,
        F.coalesce(F.col("inited"), F.lit(False)).alias("inited"),
        F.coalesce(F.col("n_obs"), F.lit(0)).cast("bigint").alias("n_obs"),
        F.col("st"),
        F.coalesce(F.col("buf"), empty_buf).alias("buf"),
        F.coalesce(F.col("_new"), empty_buf).alias("_new"),
    )
    new_xs = F.transform(F.col("_new"), lambda e: e.getField("x"))
    # continuation fold for already-initialized keys — the batch
    # step closure applied to the carried struct
    cont = F.aggregate(new_xs, F.col("st"), hw_step(m, a, b_, g))
    # buffered keys: full series so far; initialize at >= 2m with the
    # batch init + fold-from-m+1 formula (identical expression tree)
    full = F.array_sort(F.concat(F.col("buf"), F.col("_new")))
    full_xs = F.transform(full, lambda e: e.getField("x"))
    fn = F.size(full_xs)
    boot = F.aggregate(
        F.slice(full_xs, m + 1, fn - m),
        hw_init_struct(full_xs, m),
        hw_step(m, a, b_, g),
    )
    crosses = (~F.col("inited")) & (fn >= 2 * m)
    merged = j.select(
        *key_cols,
        (F.col("inited") | crosses).alias("inited"),
        F.when(F.col("inited"), F.col("n_obs") + F.size("_new"))
        .otherwise(fn.cast("bigint"))
        .cast("bigint")
        .alias("n_obs"),
        F.when(F.col("inited"), cont)
        .when(crosses, boot)
        .otherwise(F.lit(None).cast(prev.schema["st"].dataType.simpleString()))
        .alias("st"),
        F.when(F.col("inited") | crosses, empty_buf)
        .otherwise(full)
        .alias("buf"),
    )
    version = ptr.get("version", 0) + 1
    vdir = os.path.join(path, f"v={version}")
    shutil.rmtree(vdir, ignore_errors=True)
    merged.write.mode("overwrite").parquet(vdir)
    write_pointer(path, version, batch_id=batch_id, hw=ptr["hw"])


def maintain_holt_winters(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Attach the HW sink; state must be initialized first."""
    writer = stream.writeStream.foreachBatch(
        lambda b, i: merge_holt_winters_batch(b, i, path)
    ).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_holt_winters(
    spark: SparkSession, path: str, horizon: int = 3, ndigits: int = 4
) -> DataFrame:
    """Initialized keys rendered through the batch output codec:
    ``<keys>, n_obs, level, trend, seasonal_next, fc_1..fc_h`` —
    column-for-column, bit-for-bit the batch ``holt_winters`` result
    over the same observations."""
    ptr = read_pointer(path)
    if not ptr.get("path"):
        raise FileNotFoundError(f"no holt-winters state at {path}")
    cfg = json.loads(ptr["hw"])
    m = cfg["m"]
    if horizon < 1 or horizon > m:
        raise ValueError("horizon must be in 1..period")
    st = spark.read.parquet(os.path.join(path, ptr["path"]))
    return st.filter(F.col("inited")).select(
        *cfg["key_cols"],
        *hw_outputs(F.col("st"), F.col("n_obs"), m, horizon, ndigits),
    )
