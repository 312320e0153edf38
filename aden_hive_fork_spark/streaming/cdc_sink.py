"""Streaming CDC apply: a change stream upserted into the keyed
merge-on-read table, exactly-once.

Completes the CDC story: ``operators/table`` gives batch upsert with
latest-wins resolution; this wires a Structured Streaming change
feed (insert/update/delete rows) into it via ``foreachBatch``, with
replay idempotence — the missing piece, because foreachBatch is
at-least-once: after a crash between delta publish and checkpoint
commit, the SAME epoch id is re-delivered and a naive sink would
apply the batch twice.

Exactly-once here = the epoch id rides INSIDE the delta directory
(``upsert(marker=...)`` writes ``_marker.json`` before the atomic
rename that publishes the delta — Spark's scan ignores ``_``-prefixed
files). Marker visible ⟺ delta visible, so there is NO commit window:
a re-delivered epoch compares against the lineage's applied
high-water mark (max over live delta markers and the manifest entry
``compact_table`` advances when it folds them — bounded at ONE value
per lineage, epochs being monotonic) and becomes a no-op (the
quarantine/rollup discipline — idempotence by construction, not by
dedup pass).

Scale: each micro-batch costs one append-only delta write; read-side
merge cost grows with delta count, so pair with ``compact_table`` on
a cadence — compaction and the sink both publish through the same
atomic manifest pointer, so neither blocks the other.

Lineage identity: epochs only order batches WITHIN one streaming
query incarnation — Spark restarts batch ids at 0 whenever the
checkpoint directory is recreated. A high-water mark keyed on the
checkpoint *path* alone would therefore swallow all post-recreate
batches numbered below the old mark (silently dropping new data the
reprocess was meant to apply). So the lineage id is
``<checkpoint path>#<query id>``: the query id is the uuid Spark
persists in ``<checkpoint>/metadata``, which survives every genuine
crash/restart (replay stays a no-op) but is regenerated when the
checkpoint is deleted (a fresh checkpoint is a fresh lineage that
re-applies from scratch). The id alone — not the path — is the
lineage key, so a checkpoint restored from backup at a different
path is still the same lineage. Retired lineage entries in the
manifest can be dropped with ``operators.table.reset_applied``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.table import last_applied_epoch, upsert


def cdc_lineage_id(checkpoint_dir: str) -> str:
    """The lineage id a sink on this checkpoint uses for its applied
    high-water mark: ``query:<streaming query id>``. The query id is
    read from the ``metadata`` file Spark writes at query start —
    call only after the query has started (foreachBatch time always
    qualifies)."""
    path = checkpoint_dir
    if path.startswith("file:"):
        path = path[len("file:"):]
    with open(os.path.join(path, "metadata")) as fh:
        qid = json.load(fh)["id"]
    return f"query:{qid}"


def cdc_upsert_sink(
    changes,
    root: str,
    key_cols: list[str],
    checkpoint_dir: str,
    seq_col: str | None = None,
    trigger_available_now: bool = True,
):
    """Start a streaming query applying the change feed to the table
    at ``root``. Rows may carry ``_op`` = 'upsert' | 'delete' (the
    table's tombstone convention); absent column means upsert.
    Returns the StreamingQuery.

    A micro-batch MAY contain several changes for one key (with
    availableNow, the whole backlog can be one batch); ``upsert``
    rejects duplicate keys, and a rejecting batch would be
    re-delivered forever — a poison batch. So the batch is reduced
    to latest-per-key first: by ``seq_col`` descending when given
    (the change feed's own order — LSN, kafka offset), else any one
    row of each key survives BUT only when the duplicates are
    byte-identical. Conflicts with NO defined winner — duplicate
    (key, seq) pairs, or conflicting rows without a sequence column
    — raise immediately (a loud contract error beats a silently
    arbitrary, run-to-run-varying table state)."""

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # resolved lazily: the metadata file exists once the query runs
        app_id = cdc_lineage_id(checkpoint_dir)
        last = last_applied_epoch(root, app_id)
        if last is not None and int(epoch_id) <= last:
            return  # crash-replay of a committed epoch
        if batch_df.isEmpty():
            return
        if seq_col is not None:
            w = Window.partitionBy(*key_cols).orderBy(
                F.col(seq_col).desc_nulls_last()
            )
            wt = Window.partitionBy(*key_cols, seq_col)
            marked = batch_df.withColumn(
                "_rn", F.row_number().over(w)
            ).withColumn("_nties", F.count(F.lit(1)).over(wt))
            poison = (
                marked.filter((F.col("_rn") == 1) & (F.col("_nties") > 1))
                .limit(1)
                .count()
            )
            if poison:
                raise ValueError(
                    "cdc_upsert_sink: duplicate (key, seq) with no "
                    "defined winner — the feed's sequence column must "
                    "totally order changes per key"
                )
            reduced = (
                marked.filter(F.col("_rn") == 1)
                # feed ordering col, not table data
                .drop("_rn", "_nties", seq_col)
            )
        else:
            reduced = batch_df.dropDuplicates()
        upsert(
            reduced,
            root,
            key_cols,
            marker={"epoch_id": int(epoch_id), "app_id": app_id},
        )

    writer = changes.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
