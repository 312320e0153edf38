"""Incremental view maintenance: a materialized inner equi-join view
(fact ⋈ dim) kept current from the tables' change feeds — the
"don't recompute the join of 100 TB because 0.01% changed" engine
capability (classic delta-join IVM, here in recompute-by-key form).

View definition: ``fact INNER JOIN dim ON fact[fk_col] = dim[dk]``,
one output row per fact row (dim is unique-keyed), view keyed by the
fact table's keys. All three tables are ``operators/table``
merge-on-read tables, so the view has snapshots, a CDF of its own,
compaction — views compose.

Refresh algebra (recompute-by-key — simpler than the textbook
ΔF⋈D ∪ F⋈ΔD delta join and immune to its double-counting corner
cases when both sides changed the same key):

    affected = keys(ΔF)  ∪  keys(fact rows whose fk ∈ keys(ΔD))
    produced = (current fact ⋉ affected) ⋈ current dim
    deletes  = affected − keys(produced)     (fact gone, or match gone)

one upsert batch = produced upserts + delete tombstones. Cost is
proportional to the AFFECTED rows, never the table: ΔF drives a
key-list semi join; ΔD drives a broadcast fk-IN-list semi join over
fact (pushdown-eligible; with fk-clustered layout, partition-
pruned). The dim side of the recompute join is the full current dim
— broadcast/AQE territory, never shuffled by this operator.

Exactly-once: the applied (fact_seq, dim_seq) watermark is encoded
as a monotonic epoch riding in the view delta's marker — the SAME
``app_id``/``epoch_id`` protocol the streaming CDC sink uses, so
``compact_table`` folds it into the manifest atomically and
compact+vacuum can never lose progress. Marker visible ⟺ delta
visible: there is no commit window. A refresh observing watermarks
at-or-below the applied epoch is a no-op; a refresh racing new
source deltas stays convergent because recomputation always reads
CURRENT source state and the next refresh re-covers any keys the
watermark says are pending.

Retention contract: like any CDF consumer, refresh before
``vacuum_deltas`` on the sources drops folded changes.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Observation, SparkSession
from pyspark.sql import functions as F

from .layout import _CURRENT
from .table import (
    _delta_seqs,
    read_table_asof,
    _manifest,
    create_table,
    last_applied_epoch,
    read_table,
    table_changes,
    upsert,
)

_APP = "ivm"
_SHIFT = 31  # epoch = (fact_seq+1) << 31 | (dim_seq+1): monotonic


def _encode(f_seq: int, d_seq: int) -> int:
    return ((f_seq + 1) << _SHIFT) | (d_seq + 1)


def _decode(epoch: int | None) -> tuple[int, int]:
    if epoch is None:
        return (-1, -1)
    return ((epoch >> _SHIFT) - 1, (epoch & ((1 << _SHIFT) - 1)) - 1)


def _current_seq(root: str, applied: int = -1) -> int:
    """Effective change-feed watermark of a source table: the newest
    delta seq that is LIVE, or was FOLDED into the base by compaction
    (``folded_through``), or was already APPLIED by this view.

    Raw ``max(_delta_seqs)`` regresses to -1 after a compliant
    refresh→compact→vacuum cycle (the delta dirs are gone); persisting
    that regressed value when a refresh is driven by the OTHER side
    would (a) rewind the view's watermark and (b) make the next
    refresh's fold-past guard misfire forever. Taking the max of all
    three signals makes the watermark monotone by construction."""
    folded = _manifest(root).get("folded_through", -1)
    return max(
        max(_delta_seqs(root), default=-1), int(folded), int(applied)
    )


def _fold_epoch(view_root: str, epoch: int) -> None:
    """Record the applied epoch directly in the manifest (used when
    no delta exists to carry the marker: init, or an empty refresh).
    Same atomic tmp+rename protocol as the table layer."""
    man = _manifest(view_root)
    applied = dict(man.get("applied", {}))
    applied[_APP] = max(int(applied.get(_APP, -1)), int(epoch))
    man["applied"] = applied
    tmp = os.path.join(view_root, _CURRENT + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(man, fh)
    os.replace(tmp, os.path.join(view_root, _CURRENT))


def refresh_join_view(
    spark: SparkSession,
    fact_root: str,
    dim_root: str,
    view_root: str,
    fk_col: str,
) -> dict:
    """Create (first call) or incrementally refresh the materialized
    inner-join view. Returns ``{"fact_seq", "dim_seq", "n_upserts",
    "n_deletes", "initialized"}`` — the watermarks now applied and
    the work done."""
    fact_keys = _manifest(fact_root).get("key_cols")
    dim_keys = _manifest(dim_root).get("key_cols")
    if not fact_keys or not dim_keys:
        raise ValueError("refresh_join_view: fact and dim must be keyed tables")
    if len(dim_keys) != 1:
        raise ValueError("refresh_join_view: dim must have a single key column")
    dk = dim_keys[0]

    f_seq = _current_seq(fact_root)
    d_seq = _current_seq(dim_root)
    fact = read_table(spark, fact_root)
    dim = read_table(spark, dim_root)
    overlap = set(fact.columns) & set(dim.columns)
    if overlap:
        # a shared name would make the joined schema ambiguous (and
        # .drop(dk) on a duplicated name drops BOTH sides) — require
        # disjoint schemas; rename before registering the tables
        raise ValueError(
            f"refresh_join_view: fact and dim share column names "
            f"{sorted(overlap)} — rename them to be disjoint"
        )

    if not os.path.exists(os.path.join(view_root, _CURRENT)):
        # initial build: the view here is CORPUS-sized (unlike the
        # delta-sized incremental frames below), so instead of
        # checkpointing it just to share between count() and the
        # publish write (a storage-doubling materialization at
        # scale), the row count rides the write itself as an
        # observed metric — one pass, no extra copy (r13)
        obs = Observation()
        full = fact.join(dim, fact[fk_col] == dim[dk], "inner").drop(
            dk
        ).observe(obs, F.count(F.lit(1)).alias("n"))
        create_table(full, view_root, fact_keys)
        n = int(obs.get["n"])
        _fold_epoch(view_root, _encode(f_seq, d_seq))
        return {
            "fact_seq": f_seq,
            "dim_seq": d_seq,
            "n_upserts": n,
            "n_deletes": 0,
            "initialized": True,
        }

    f0, d0 = _decode(last_applied_epoch(view_root, _APP))
    _check_not_folded_past(fact_root, f0, "fact")
    _check_not_folded_past(dim_root, d0, "dim")
    # clamp to the applied watermark: a compacted+vacuumed side has no
    # live deltas, but its progress must never be re-encoded lower
    f_seq, d_seq = max(f_seq, f0), max(d_seq, d0)
    if f_seq <= f0 and d_seq <= d0:
        return {
            "fact_seq": f0,
            "dim_seq": d0,
            "n_upserts": 0,
            "n_deletes": 0,
            "initialized": False,
        }

    dF = table_changes(spark, fact_root, from_seq=f0, to_seq=f_seq)
    dD = table_changes(spark, dim_root, from_seq=d0, to_seq=d_seq)
    changed_fact_keys = dF.select(*fact_keys).distinct()
    changed_dim_keys = dD.select(F.col(dk).alias("__dk")).distinct()
    fanout_keys = (
        fact.join(
            F.broadcast(changed_dim_keys),
            fact[fk_col] == F.col("__dk"),
            "left_semi",
        )
        .select(*fact_keys)
        .distinct()
    )
    affected = changed_fact_keys.unionByName(fanout_keys).distinct()

    # materialized once (r12): produced feeds the anti-join, the
    # batch, the dup-check inside upsert, the write, and its count —
    # five replays of the semi+inner join without the checkpoint;
    # both frames are delta-sized
    produced = (
        fact.join(affected, fact_keys, "left_semi")
        .join(dim, fact[fk_col] == dim[dk], "inner")
        .drop(dk)
        .localCheckpoint(eager=True)
    )
    gone = affected.join(
        produced.select(*fact_keys), fact_keys, "left_anti"
    ).localCheckpoint(eager=True)
    tombstones = gone.select(
        *fact_keys,
        *[
            F.lit(None).cast(produced.schema[c].dataType).alias(c)
            for c in produced.columns
            if c not in fact_keys
        ],
    ).withColumn("_op", F.lit("delete"))
    batch = produced.withColumn("_op", F.lit("upsert")).unionByName(tombstones)
    n_up, n_del = produced.count(), gone.count()
    epoch = _encode(f_seq, d_seq)
    if n_up or n_del:
        upsert(
            batch,
            view_root,
            fact_keys,
            marker={"app_id": _APP, "epoch_id": epoch},
        )
    else:
        _fold_epoch(view_root, epoch)
    return {
        "fact_seq": f_seq,
        "dim_seq": d_seq,
        "n_upserts": n_up,
        "n_deletes": n_del,
        "initialized": False,
    }


_APP_AGG = "ivm_agg"


def refresh_agg_view(
    spark: SparkSession,
    fact_root: str,
    view_root: str,
    group_cols: list[str],
    agg_exprs: list,
) -> dict:
    """Create (first call) or incrementally refresh a materialized
    per-group aggregate view of a keyed fact table — recompute-by-
    GROUP: only groups touched by the change feed are re-aggregated.

    The subtle half is retraction: a fact row that MOVED groups (or
    was deleted) must decrement its OLD group, but the change feed
    carries new values only. The pre-image comes from
    ``read_table_asof(fact, last_applied_seq)`` — merge-on-read keeps
    the old deltas until compaction folds them, so the old group
    values of every changed key are an O(|Δ| keys) semi-join away,
    never a snapshot copy. Affected groups = groups of Δ upserts ∪
    OLD groups of all changed keys; each is re-aggregated from the
    CURRENT fact (group-pruned semi join, NULL-safe on group values),
    groups left empty become tombstones.

    Same watermark protocol as the join view (app_id/epoch_id marker,
    epoch = fact seq — compaction-safe); same retention contract
    (refresh before compacting the FACT table past unapplied
    changes, or the pre-image is gone — ``read_table_asof`` raises
    loudly rather than corrupting the view).

    ``agg_exprs``: unbound aggregate Columns (e.g.
    ``F.sum(dec("p")).alias("total")``); the view is keyed by
    ``group_cols``.
    """
    fact_keys = _manifest(fact_root).get("key_cols")
    if not fact_keys:
        raise ValueError("refresh_agg_view: fact must be a keyed table")
    f_seq = _current_seq(fact_root)
    fact = read_table(spark, fact_root)

    if not os.path.exists(os.path.join(view_root, _CURRENT)):
        # initial build: view-sized (can be corpus-scale) — count rides
        # the publish write as an observed metric instead of a
        # storage-doubling checkpoint (r13, mirrors refresh_join_view)
        obs = Observation()
        full = (
            fact.groupBy(*group_cols)
            .agg(*agg_exprs)
            .observe(obs, F.count(F.lit(1)).alias("n"))
        )
        create_table(full, view_root, group_cols)
        n = int(obs.get["n"])
        _fold_epoch_app(view_root, _APP_AGG, f_seq)
        return {"fact_seq": f_seq, "n_upserts": n, "n_deletes": 0,
                "initialized": True}

    f0 = last_applied_epoch(view_root, _APP_AGG)
    f0 = -1 if f0 is None else int(f0)
    _check_not_folded_past(fact_root, f0, "fact")
    f_seq = max(f_seq, f0)
    if f_seq <= f0:
        return {"fact_seq": f0, "n_upserts": 0, "n_deletes": 0,
                "initialized": False}

    dF = table_changes(spark, fact_root, from_seq=f0, to_seq=f_seq)
    new_groups = (
        dF.filter(F.col("_op") != "delete").select(*group_cols).distinct()
    )
    changed_keys = dF.select(*fact_keys).distinct()
    old = read_table_asof(spark, fact_root, f0)
    old_groups = (
        old.join(changed_keys, fact_keys, "left_semi")
        .select(*group_cols)
        .distinct()
    )
    affected = new_groups.unionByName(old_groups).distinct()

    def _gjoin(df, groups, how):
        cond = None
        for g in group_cols:
            c = df[g].eqNullSafe(groups[g])
            cond = c if cond is None else (cond & c)
        return df.join(groups, cond, how)

    # materialized once (r12): see refresh_join_view
    produced = (
        _gjoin(fact, affected, "left_semi")
        .groupBy(*group_cols)
        .agg(*agg_exprs)
        .localCheckpoint(eager=True)
    )
    gone = _gjoin(
        affected, produced.select(*group_cols), "left_anti"
    ).localCheckpoint(eager=True)
    tombstones = gone.select(
        *group_cols,
        *[
            F.lit(None).cast(produced.schema[c].dataType).alias(c)
            for c in produced.columns
            if c not in group_cols
        ],
    ).withColumn("_op", F.lit("delete"))
    batch = produced.withColumn("_op", F.lit("upsert")).unionByName(tombstones)
    n_up, n_del = produced.count(), gone.count()
    if n_up or n_del:
        upsert(
            batch,
            view_root,
            group_cols,
            marker={"app_id": _APP_AGG, "epoch_id": f_seq},
        )
    else:
        _fold_epoch_app(view_root, _APP_AGG, f_seq)
    return {"fact_seq": f_seq, "n_upserts": n_up, "n_deletes": n_del,
            "initialized": False}


def _fold_epoch_app(view_root: str, app: str, epoch: int) -> None:
    man = _manifest(view_root)
    applied = dict(man.get("applied", {}))
    applied[app] = max(int(applied.get(app, -1)), int(epoch))
    man["applied"] = applied
    tmp = os.path.join(view_root, _CURRENT + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(man, fh)
    os.replace(tmp, os.path.join(view_root, _CURRENT))


def _check_not_folded_past(source_root: str, applied_seq: int, side: str) -> None:
    """A source compaction that folded deltas ABOVE the view's applied
    watermark destroyed change feed the view still needs — without
    this guard the empty post-vacuum feed looks like 'no changes' and
    the view silently diverges from the source. Raise loudly instead:
    the operator's retention contract is refresh-before-compact (or
    rebuild the view from scratch)."""
    folded = _manifest(source_root).get("folded_through", -1)
    if folded > applied_seq:
        raise ValueError(
            f"incremental view maintenance: {side} table at {source_root} "
            f"compacted through delta seq {folded}, past the view's applied "
            f"watermark {applied_seq} — the change feed is gone. Refresh "
            f"views before compact/vacuum, or rebuild the view."
        )
