"""Mutable keyed table over immutable parquet: merge-on-read upserts
with periodic compaction (the public Delta/Iceberg/Hudi design in
miniature, built on layout.publish_version's manifest pointer).

Plain parquet is append-only; a training-data pipeline still needs
point mutations — re-score a document, tombstone a near-dup loser,
patch a label. The classic answer is an LSM shape:

- the BASE is an immutable published version (`layout.publish_version`);
- each ``upsert`` batch lands as a new immutable DELTA directory
  ``_delta/d=<seq>`` (written to a hidden temp dir, then atomically
  renamed — readers never see a torn delta);
- ``read_table`` resolves merge-on-read: base ∪ deltas, latest seq
  wins per key, ``_op = 'delete'`` rows are tombstones that suppress
  the key;
- ``compact_table`` folds resolved state into a NEW base version and
  advances the manifest's ``folded_through`` watermark in the same
  atomic pointer flip, after which the folded delta dirs are dead
  (removable by ``vacuum_deltas`` once in-flight readers drain).

Read cost degrades with delta count (one union branch + one window
shuffle), which is why compaction exists; at 100 TB you compact when
deltas exceed a few percent of base — the same trigger Delta's
OPTIMIZE uses. Writer discipline is single-writer (the reference's
stores assume the same); concurrent writers need a coordinator, out
of scope here.

Within one upsert batch, keys must be unique (asserted cheaply at
write time): "latest wins" needs a total order, and seq orders
batches, not rows inside a batch.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .layout import _CURRENT, current_version, publish_version

_DELTA = "_delta"
OP_COL = "_op"  # 'upsert' | 'delete'


def _manifest(root: str) -> dict:
    try:
        with open(os.path.join(root, _CURRENT)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def _delta_seqs(root: str) -> list[int]:
    d = os.path.join(root, _DELTA)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(e.split("=", 1)[1])
        for e in os.listdir(d)
        if e.startswith("d=") and e.split("=", 1)[1].isdigit()
    )


def create_table(df: DataFrame, root: str, key_cols: list[str]) -> int:
    """Publish the initial base version and record the key columns."""
    v = publish_version(df, root)
    man = _manifest(root)
    man.update({"folded_through": -1, "key_cols": list(key_cols)})
    tmp = os.path.join(root, _CURRENT + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(man, fh)
    os.replace(tmp, os.path.join(root, _CURRENT))
    return v


def upsert(
    updates: DataFrame,
    root: str,
    key_cols: list[str],
    marker: dict | None = None,
) -> int:
    """Append one immutable delta batch. Rows carry ``_op`` ('upsert'
    default; 'delete' = tombstone). Keys must be unique in the batch.

    ``marker`` (JSON-able) is written INSIDE the delta dir before the
    atomic rename publishes it — marker visible ⟺ delta visible, the
    hook exactly-once streaming writers (streaming/cdc_sink) use to
    make batch replays no-ops with no commit-window gap."""
    if OP_COL not in updates.columns:
        updates = updates.withColumn(OP_COL, F.lit("upsert"))
    dup = (
        updates.groupBy(*key_cols).count().filter(F.col("count") > 1).limit(1).count()
    )
    if dup:
        raise ValueError("upsert batch has duplicate keys — latest-wins is undefined")
    seqs = _delta_seqs(root)
    # a fresh generation after compact+vacuum must start ABOVE the
    # folded watermark, or the new delta would be filtered as folded
    folded = _manifest(root).get("folded_through", -1)
    seq = max(seqs[-1] + 1 if seqs else 0, folded + 1)
    final = os.path.join(root, _DELTA, f"d={seq}")
    tmp = final + ".__tmp__"
    shutil.rmtree(tmp, ignore_errors=True)
    updates.write.mode("overwrite").parquet(tmp)
    if marker is not None:
        with open(os.path.join(tmp, "_marker.json"), "w") as fh:
            json.dump(marker, fh)
    os.rename(tmp, final)
    return seq


def _live_markers(root: str) -> dict[int, dict]:
    out: dict[int, dict] = {}
    for seq in _delta_seqs(root):
        p = os.path.join(root, _DELTA, f"d={seq}", "_marker.json")
        if os.path.exists(p):
            with open(p) as fh:
                out[seq] = json.load(fh)
    return out


def delta_markers(root: str) -> dict[int, dict]:
    """seq → marker payload for every LIVE delta dir (crash-safe by
    construction: the marker rides the delta's atomic rename).
    Progress of folded-and-vacuumed deltas lives in the manifest's
    bounded ``applied`` map instead — see ``last_applied_epoch``."""
    return _live_markers(root)


def last_applied_epoch(root: str, app_id: str) -> int | None:
    """Highest epoch durably applied by the given streaming lineage —
    max over live delta markers and the manifest ``applied`` entry
    (which ``compact_table`` advances in the same atomic pointer flip
    that folds the deltas, so compact+vacuum can never lose it).
    Epochs are monotonic per lineage, so a single high-water mark is
    a complete replay guard."""
    best = _manifest(root).get("applied", {}).get(str(app_id))
    best = int(best) if best is not None else None
    for m in _live_markers(root).values():
        if m.get("app_id") == app_id and "epoch_id" in m:
            e = int(m["epoch_id"])
            best = e if best is None else max(best, e)
    return best


def reset_applied(root: str, app_id: str) -> bool:
    """Drop a retired lineage's ``applied`` high-water mark from the
    manifest (atomic). Lineage ids include the streaming query id
    (``cdc_lineage_id``), so entries for deleted checkpoints are dead
    weight — this is the manifest-hygiene escape hatch. Returns True
    when an entry was removed. Refuses while a LIVE delta still
    carries the lineage's marker (resetting then would re-apply a
    published epoch on replay)."""
    for m in _live_markers(root).values():
        if m.get("app_id") == app_id:
            raise ValueError(
                f"lineage {app_id!r} still has live delta markers — "
                "compact_table + vacuum_deltas first"
            )
    man = _manifest(root)
    applied = dict(man.get("applied", {}))
    if str(app_id) not in applied:
        return False
    del applied[str(app_id)]
    man["applied"] = applied
    tmp = os.path.join(root, _CURRENT + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(man, fh)
    os.replace(tmp, os.path.join(root, _CURRENT))
    return True


def read_table(spark: SparkSession, root: str) -> DataFrame:
    """Merge-on-read resolution: latest seq wins per key, tombstones
    suppress. Base rows rank below every live delta."""
    return _resolve_upto(spark, root, None)


def read_table_asof(spark: SparkSession, root: str, seq: int) -> DataFrame:
    """Table state as of delta sequence ``seq`` (inclusive) — the
    pre-image readers incremental consumers need (e.g. aggregate-view
    maintenance retracting a row's OLD group). Only states at or
    after the compaction fold are reconstructable: compaction folds
    deltas into the base, so ``seq`` below ``folded_through`` raises
    — the same retention contract as the change feed (drain
    incremental consumers before compact+vacuum)."""
    folded = _manifest(root).get("folded_through", -1)
    if seq < folded:
        raise ValueError(
            f"read_table_asof: seq {seq} predates compaction fold "
            f"{folded} — state no longer reconstructable"
        )
    return _resolve_upto(spark, root, seq)


def _resolve_upto(spark: SparkSession, root: str, upto: int | None) -> DataFrame:
    man = _manifest(root)
    v = current_version(root)
    if v < 0:
        raise FileNotFoundError(f"no table at {root}")
    folded = man.get("folded_through", -1)
    base = spark.read.parquet(os.path.join(root, f"v={v}"))
    if OP_COL not in base.columns:
        base = base.withColumn(OP_COL, F.lit("upsert"))
    out = base.withColumn("_seq", F.lit(-1))
    live = [
        s
        for s in _delta_seqs(root)
        if s > folded and (upto is None or s <= upto)
    ]
    for s in live:
        d = spark.read.parquet(os.path.join(root, _DELTA, f"d={s}"))
        if OP_COL not in d.columns:
            d = d.withColumn(OP_COL, F.lit("upsert"))
        out = out.unionByName(d.withColumn("_seq", F.lit(s)))
    keys = man.get("key_cols") or _infer_keys_error(root)
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.desc("_seq"))
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(OP_COL) != "delete"))
        .drop("_rn", "_seq", OP_COL)
    )


def _infer_keys_error(root: str):
    raise ValueError(
        f"manifest at {root} lacks key_cols — create the table with "
        "set_keys(root, key_cols) or pass them at create time"
    )


def set_keys(root: str, key_cols: list[str]) -> None:
    """Record the table's key columns in the manifest (atomic)."""
    man = _manifest(root)
    man["key_cols"] = list(key_cols)
    tmp = os.path.join(root, _CURRENT + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(man, fh)
    os.replace(tmp, os.path.join(root, _CURRENT))


def compact_table(spark: SparkSession, root: str) -> int:
    """Fold resolved state into a new base version; the pointer flip
    atomically both publishes the new base AND advances
    ``folded_through``, so a crash before the flip leaves the old
    (base, deltas) view fully intact."""
    seqs = _delta_seqs(root)
    if not seqs:
        return current_version(root)
    man = _manifest(root)
    resolved = read_table(spark, root).localCheckpoint(eager=True)
    v = current_version(root) + 1
    vdir = os.path.join(root, f"v={v}")
    resolved.write.mode("overwrite").parquet(vdir)
    # preserve exactly-once progress of the deltas being folded:
    # after vacuum removes their dirs, the manifest copy (flipped in
    # the SAME atomic pointer write) keeps crash-replayed epochs
    # no-ops. Epochs are monotonic per lineage, so retention is
    # BOUNDED: one (app_id → max applied epoch) entry per lineage,
    # not one per micro-batch — the manifest cannot grow with stream
    # lifetime.
    applied = dict(man.get("applied", {}))
    for s, m in _live_markers(root).items():
        if s <= seqs[-1] and "app_id" in m and "epoch_id" in m:
            a = str(m["app_id"])
            applied[a] = max(int(applied.get(a, -1)), int(m["epoch_id"]))
    man.update(
        {
            "version": v,
            "path": f"v={v}",
            "folded_through": seqs[-1],
            "applied": applied,
        }
    )
    tmp = os.path.join(root, _CURRENT + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(man, fh)
    os.replace(tmp, os.path.join(root, _CURRENT))
    return v


def vacuum_deltas(root: str) -> list[int]:
    """Remove delta dirs at or below the folded watermark (run after a
    grace period at scale — same discipline as vacuum_versions)."""
    folded = _manifest(root).get("folded_through", -1)
    dead = [s for s in _delta_seqs(root) if s <= folded]
    for s in dead:
        shutil.rmtree(os.path.join(root, _DELTA, f"d={s}"), ignore_errors=True)
    return dead


def merge_into(
    spark: SparkSession,
    root: str,
    source: DataFrame,
    when_matched_update: dict[str, str] | None = None,
    update_condition: str | None = None,
    when_matched_delete: str | None = None,
    when_not_matched_insert: bool = True,
) -> dict[str, int]:
    """Multi-clause conditional merge of ``source`` into the keyed
    table — the MERGE INTO statement of the Delta/Iceberg surface
    (reference analog: the generic SQL tier's update path), expressed
    as ONE left join plus one delta append.

    Conditions and update expressions are SQL strings over two
    aliases: ``s`` (source row) and ``t`` (current target row).
    Clause order follows the standard: for a matched source row,
    ``when_matched_delete`` is evaluated first, then
    ``when_matched_update`` (condition ``update_condition``, default
    always); an unmatched source row inserts when
    ``when_not_matched_insert``. Source rows matching no clause — and
    every target row the source doesn't touch — are left untouched
    (merge-on-read keeps them without rewriting anything).

    ``when_matched_update`` maps target column → expression (default:
    overwrite every non-key column with the source value). Source
    keys must be unique (``upsert`` enforces) — SQL MERGE's
    one-action-per-target-row cardinality rule.

    Scale: the join shuffles on the table key (broadcast when the
    source measures small — AQE's call); the delta append is sized by
    the ACTION set, not the table. Nothing rewrites the base: a merge
    touching 0.1% of a 100 TB table writes 0.1% worth of delta.
    Returns {'inserted': n, 'updated': n, 'deleted': n} via an
    observe() on the delta write — no second pass over the join.
    """
    man = _manifest(root)
    keys = man.get("key_cols") or _infer_keys_error(root)
    target = read_table(spark, root)
    data_cols = [c for c in target.columns]
    non_keys = [c for c in data_cols if c not in keys]
    missing = [k for k in keys if k not in source.columns]
    if missing:
        raise ValueError(f"source lacks key columns {missing}")

    joined = source.alias("s").join(
        target.select(
            *data_cols, F.lit(True).alias("_matched")
        ).alias("t"),
        on=[F.col(f"s.{k}").eqNullSafe(F.col(f"t.{k}")) for k in keys],
        how="left",
    )
    matched = F.coalesce(F.col("t._matched"), F.lit(False))
    del_cond = (
        matched & F.expr(when_matched_delete)
        if when_matched_delete is not None
        else F.lit(False)
    )
    upd_cond = matched & (
        F.expr(update_condition) if update_condition is not None else F.lit(True)
    )
    if when_matched_update is None and non_keys:
        upd_exprs = {
            c: F.col(f"s.{c}") if c in source.columns else F.col(f"t.{c}")
            for c in non_keys
        }
    else:
        upd_exprs = {
            c: F.expr(when_matched_update[c])
            if when_matched_update and c in when_matched_update
            else F.col(f"t.{c}")
            for c in non_keys
        }
    action = (
        F.when(del_cond, F.lit("delete"))
        .when(upd_cond, F.lit("update"))
        .when(
            ~matched & F.lit(bool(when_not_matched_insert)), F.lit("insert")
        )
    )

    def _out(c: str):
        if c in keys:
            return F.col(f"s.{c}").alias(c)
        ins = (
            F.col(f"s.{c}")
            if c in source.columns
            else F.lit(None).cast(target.schema[c].dataType)
        )
        return (
            F.when(F.col("_action") == "update", upd_exprs[c])
            .when(F.col("_action") == "insert", ins)
            .otherwise(F.col(f"t.{c}"))  # delete: keys matter, rest inert
            .cast(target.schema[c].dataType)
            .alias(c)
        )

    batch = (
        joined.withColumn("_action", action)
        .filter(F.col("_action").isNotNull())
        .select(F.col("_action"), *[_out(c) for c in data_cols])
    )
    batch = batch.withColumn(
        OP_COL,
        F.when(F.col("_action") == "delete", F.lit("delete")).otherwise(
            F.lit("upsert")
        ),
    )
    from ..streaming.observe import observed

    watched, obs = observed(
        batch,
        "merge_stats",
        {
            "inserted": F.sum(F.when(F.col("_action") == "insert", 1).otherwise(0)),
            "updated": F.sum(F.when(F.col("_action") == "update", 1).otherwise(0)),
            "deleted": F.sum(F.when(F.col("_action") == "delete", 1).otherwise(0)),
        },
    )
    upsert(watched.drop("_action"), root, keys)
    got = obs.get
    return {k: int(got[k] or 0) for k in ("inserted", "updated", "deleted")}


def table_changes(
    spark: SparkSession,
    root: str,
    from_seq: int = -1,
    to_seq: int | None = None,
) -> DataFrame:
    """Change data feed (the Delta CDF analog): every change row the
    table accepted with delta sequence in (``from_seq``, ``to_seq``]
    — columns = table schema + ``_op`` ('upsert' | 'delete') +
    ``_seq``. Because upserts land as immutable delta directories,
    the feed is a DIRECT read of those parquet dirs: no diffing, no
    base scan, cost proportional to the changes themselves. Feed a
    downstream incremental consumer by remembering its last ``_seq``
    high-water mark (monotonic). Deltas folded by compaction and
    vacuumed are gone — consumers must drain before ``vacuum_deltas``
    (the same retention contract Delta's CDF has).
    """
    seqs = [
        s
        for s in _delta_seqs(root)
        if s > from_seq and (to_seq is None or s <= to_seq)
    ]
    if not seqs:
        schema = read_table(spark, root).schema
        empty = spark.createDataFrame([], schema)
        return empty.withColumn(OP_COL, F.lit("")).withColumn(
            "_seq", F.lit(0).cast("bigint")
        ).limit(0)
    out = None
    for s in seqs:
        d = spark.read.parquet(os.path.join(root, _DELTA, f"d={s}"))
        if OP_COL not in d.columns:
            d = d.withColumn(OP_COL, F.lit("upsert"))
        d = d.withColumn("_seq", F.lit(s).cast("bigint"))
        out = d if out is None else out.unionByName(d, allowMissingColumns=True)
    return out


def erase_keys(
    spark: SparkSession,
    root: str,
    keys: DataFrame,
    vacuum_history: bool = True,
) -> dict:
    """Right-to-erasure: remove the given keys from the table AND
    from its on-disk history, then prove it. A bare tombstone is not
    erasure — the old bytes survive in the base version, in folded
    deltas, and in every time-travel version until something removes
    the files. This composes the full sequence:

    1. tombstone the keys (one delta; non-key columns written as
       typed NULLs — the erase batch itself never re-materializes
       the data being erased);
    2. ``compact_table`` — the new base is written WITHOUT the
       erased keys;
    3. ``vacuum_deltas`` — folded delta dirs (including historical
       upserts carrying the data) are deleted;
    4. ``vacuum_versions(keep=1)`` when ``vacuum_history`` — every
       pre-erase base version is deleted. This intentionally
       DESTROYS time travel below the erase point: retention and
       erasure are mutually exclusive guarantees, and erasure wins
       here by contract (Delta's VACUUM has the same consequence);
    5. audit — every parquet directory still reachable under the
       root (remaining versions + live deltas) is semi-joined
       against the erased keys; the report counts residual rows,
       which is 0 unless a concurrent writer violated the table's
       single-writer discipline mid-erase.

    Scale: the tombstone is |keys| rows; compaction is the one full
    rewrite (unavoidable — parquet is immutable, removing rows IS
    rewriting); each audit probe is a scan pruned by a key semi-join
    (AQE broadcasts the key set when small). Erasure of DERIVED
    artifacts — materialized views, manifests, checkpoints, exports —
    is the caller's responsibility; this erases the table.

    Returns ``{"n_keys", "residual_rows", "new_version",
    "vacuumed_deltas", "vacuumed_versions"}``. Keys must be non-NULL
    (NULL never equi-matches; such rows could linger silently) —
    raises if any key row carries a NULL.
    """
    from .layout import list_versions, vacuum_versions

    man = _manifest(root)
    key_cols = man.get("key_cols") or _infer_keys_error(root)
    tomb = keys.select(*key_cols).distinct().localCheckpoint(eager=True)
    null_keys = tomb.filter(
        " OR ".join(f"{c} IS NULL" for c in key_cols)
    ).limit(1).count()
    if null_keys:
        raise ValueError("erase_keys: NULL in key columns — refusing "
                         "(NULL never matches; the row would survive)")
    n_keys = tomb.count()
    schema = read_table(spark, root).schema
    batch = tomb
    for f in schema.fields:
        if f.name not in key_cols:
            batch = batch.withColumn(f.name, F.lit(None).cast(f.dataType))
    batch = batch.select(*[f.name for f in schema.fields]).withColumn(
        OP_COL, F.lit("delete")
    )
    upsert(batch, root, key_cols)
    new_v = compact_table(spark, root)
    dead_deltas = vacuum_deltas(root)
    dead_versions = (
        vacuum_versions(root, keep=1) if vacuum_history else []
    )
    residual = 0
    probes = [
        os.path.join(root, f"v={v}") for v in list_versions(root)
    ] + [
        os.path.join(root, _DELTA, f"d={s}") for s in _delta_seqs(root)
    ]
    for p in probes:
        df = spark.read.parquet(p)
        if all(c in df.columns for c in key_cols):
            residual += df.join(tomb, key_cols, "left_semi").count()
    return {
        "n_keys": int(n_keys),
        "residual_rows": int(residual),
        "new_version": int(new_v),
        "vacuumed_deltas": dead_deltas,
        "vacuumed_versions": dead_versions,
    }
