"""Streaming CDC upsert sink: change feed applied to the keyed
merge-on-read table with exactly-once replay semantics (epoch marker
rides the delta's atomic rename — no commit window)."""

from __future__ import annotations

import json
import os
import shutil

from aden_hive_fork_spark.operators.table import (
    create_table,
    delta_markers,
    read_table,
)
from aden_hive_fork_spark.streaming.cdc_sink import cdc_upsert_sink

SCHEMA = "id bigint, score double, _op string"


def _write_jsonl(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(spark, src, root, ckpt):
    stream = spark.readStream.schema(SCHEMA).json(src)
    q = cdc_upsert_sink(stream, root, ["id"], ckpt)
    q.awaitTermination(120)


def _state(spark, root):
    return {
        r["id"]: r["score"]
        for r in read_table(spark, root).select("id", "score").collect()
    }


def test_cdc_apply_and_resolution(spark, tmp_path):
    root = str(tmp_path / "tbl")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    base = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0)], "id bigint, score double"
    )
    create_table(base, root, ["id"])

    _write_jsonl(f"{src}/a.jsonl", [
        {"id": 2, "score": 20.0, "_op": "upsert"},   # update
        {"id": 4, "score": 40.0, "_op": "upsert"},   # insert
        {"id": 3, "score": None, "_op": "delete"},   # tombstone
    ])
    _run(spark, src, root, ckpt)
    assert _state(spark, root) == {1: 1.0, 2: 20.0, 4: 40.0}

    # second batch under the SAME checkpoint: later seq wins
    _write_jsonl(f"{src}/b.jsonl", [
        {"id": 4, "score": 41.0, "_op": "upsert"},
    ])
    _run(spark, src, root, ckpt)
    assert _state(spark, root) == {1: 1.0, 2: 20.0, 4: 41.0}


def _crash_restore(ckpt, epoch=0):
    """Simulate the real at-least-once crash window: the delta
    published but the streaming commit was lost. The checkpoint (and
    with it the persisted query id) survives a crash — only the
    commit record of the in-flight epoch is missing, so on restart
    Spark re-delivers that epoch under the SAME query id. Restored
    to a sibling path (a backup restore) because Spark 4 flags
    in-place external edits of a live commit log as a concurrent
    query; the query id, not the path, is the lineage key."""
    restored = ckpt + ".restored"
    shutil.copytree(ckpt, restored)
    os.remove(os.path.join(restored, "commits", str(epoch)))
    # drop the local-FS checksum sidecar too, or the re-commit's
    # atomic rename fails on the stale crc and is misread as a
    # concurrent query
    crc = os.path.join(restored, "commits", f".{epoch}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    return restored


def test_cdc_replay_is_noop(spark, tmp_path):
    root = str(tmp_path / "tbl")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    base = spark.createDataFrame([(1, 1.0)], "id bigint, score double")
    create_table(base, root, ["id"])
    _write_jsonl(f"{src}/a.jsonl", [
        {"id": 1, "score": 9.0, "_op": "upsert"},
    ])
    _run(spark, src, root, ckpt)
    assert _state(spark, root) == {1: 9.0}
    n_deltas = len(delta_markers(root))
    assert n_deltas == 1

    _run(spark, src, root, _crash_restore(ckpt))
    assert _state(spark, root) == {1: 9.0}
    assert len(delta_markers(root)) == n_deltas  # no duplicate delta


def test_cdc_fresh_checkpoint_is_fresh_lineage(spark, tmp_path):
    # deleting the checkpoint is NOT a crash — it is an intentional
    # reprocess. Batch ids restart at 0, so a replay guard keyed on
    # the checkpoint path alone would silently swallow every new
    # batch numbered <= the old high-water mark. The lineage id folds
    # in the persisted query id, so the restarted stream re-applies.
    root = str(tmp_path / "tbl")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    base = spark.createDataFrame([(1, 1.0)], "id bigint, score double")
    create_table(base, root, ["id"])
    _write_jsonl(f"{src}/a.jsonl", [{"id": 1, "score": 9.0, "_op": "upsert"}])
    _run(spark, src, root, ckpt)
    assert _state(spark, root) == {1: 9.0}

    # operator deletes the checkpoint to reprocess after new source
    # data arrived; the new batch 0 (<= old mark) must NOT be dropped
    shutil.rmtree(ckpt)
    _write_jsonl(f"{src}/b.jsonl", [{"id": 2, "score": 7.0, "_op": "upsert"}])
    _run(spark, src, root, ckpt)
    assert _state(spark, root) == {1: 9.0, 2: 7.0}


def test_cdc_distinct_lineages_both_apply(spark, tmp_path):
    # a DIFFERENT checkpoint is a different lineage: its epoch 0 must
    # NOT be swallowed by the first lineage's marker
    root = str(tmp_path / "tbl")
    src1 = str(tmp_path / "s1")
    src2 = str(tmp_path / "s2")
    base = spark.createDataFrame([(1, 1.0)], "id bigint, score double")
    create_table(base, root, ["id"])
    _write_jsonl(f"{src1}/a.jsonl", [{"id": 1, "score": 5.0, "_op": "upsert"}])
    _run(spark, src1, root, str(tmp_path / "ck1"))
    _write_jsonl(f"{src2}/a.jsonl", [{"id": 2, "score": 7.0, "_op": "upsert"}])
    _run(spark, src2, root, str(tmp_path / "ck2"))
    assert _state(spark, root) == {1: 5.0, 2: 7.0}


# ---------------------------------------------------------------------------
# observation metrics (streaming/observe)
# ---------------------------------------------------------------------------


def test_observed_batch_metrics(spark, tmp_path):
    from pyspark.sql import functions as F

    from aden_hive_fork_spark.operators.pii import pii_count
    from aden_hive_fork_spark.streaming.observe import observed

    df = spark.createDataFrame(
        [(1, "a@b.io"), (2, None), (3, "clean")], "id bigint, text string"
    )
    watched, obs = observed(df, "quality", {
        "n_rows": F.count(F.lit(1)),
        "n_null_text": F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)),
        "n_email_hits": F.sum(pii_count("text", "email")),
    })
    watched.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    assert got == {"n_rows": 3, "n_null_text": 1, "n_email_hits": 1}


def test_observed_streaming_metrics(spark, tmp_path):
    from pyspark.sql import functions as F

    from aden_hive_fork_spark.streaming.observe import last_observed, observed

    src = str(tmp_path / "src")
    _write_jsonl(f"{src}/a.jsonl", [
        {"id": 1, "score": 10.0, "_op": "upsert"},
        {"id": 2, "score": None, "_op": "upsert"},
    ])
    stream = spark.readStream.schema(SCHEMA).json(src)
    watched, obs = observed(stream, "feed", {
        "n_rows": F.count(F.lit(1)),
        "n_null_score": F.sum(
            F.when(F.col("score").isNull(), 1).otherwise(0)
        ),
    })
    assert obs is None  # streaming observations read from progress
    q = (
        watched.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = last_observed(q, "feed")
    assert got == {"n_rows": 2, "n_null_score": 1}


def test_cdc_multi_change_per_key_batch(spark, tmp_path):
    # the whole backlog lands in ONE availableNow batch with two
    # changes for key 1 — the seq_col reduction must pick the latest
    # instead of poisoning the query with a duplicate-key error
    root = str(tmp_path / "tbl")
    src = str(tmp_path / "src")
    base = spark.createDataFrame([(1, 1.0)], "id bigint, score double")
    create_table(base, root, ["id"])
    _write_jsonl(f"{src}/a.jsonl", [
        {"id": 1, "score": 5.0, "_op": "upsert", "seq": 1},
        {"id": 1, "score": 6.0, "_op": "upsert", "seq": 2},
        {"id": 2, "score": 7.0, "_op": "upsert", "seq": 3},
    ])
    stream = spark.readStream.schema(SCHEMA + ", seq bigint").json(src)
    q = cdc_upsert_sink(stream, root, ["id"], str(tmp_path / "ckpt"),
                        seq_col="seq")
    q.awaitTermination(120)
    assert _state(spark, root) == {1: 6.0, 2: 7.0}


def test_cdc_replay_noop_survives_compact_and_vacuum(spark, tmp_path):
    from aden_hive_fork_spark.operators.table import (
        compact_table,
        vacuum_deltas,
    )

    root = str(tmp_path / "tbl")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    base = spark.createDataFrame([(1, 1.0)], "id bigint, score double")
    create_table(base, root, ["id"])
    _write_jsonl(f"{src}/a.jsonl", [{"id": 1, "score": 9.0, "_op": "upsert"}])
    _run(spark, src, root, ckpt)
    assert _state(spark, root) == {1: 9.0}

    # maintenance folds the delta and deletes its directory — the
    # applied high-water mark must survive in the manifest
    from aden_hive_fork_spark.operators.table import last_applied_epoch
    from aden_hive_fork_spark.streaming.cdc_sink import cdc_lineage_id

    lineage = cdc_lineage_id(ckpt)
    compact_table(spark, root)
    vacuum_deltas(root)
    assert not delta_markers(root)  # delta dirs (and markers) gone
    assert last_applied_epoch(root, lineage) == 0  # progress preserved

    # crash-replay of epoch 0 (lost checkpoint commit) stays a no-op
    _run(spark, src, root, _crash_restore(ckpt))
    assert _state(spark, root) == {1: 9.0}
    assert not delta_markers(root)  # no second delta was written


def test_reset_applied_drops_retired_lineage(spark, tmp_path):
    from aden_hive_fork_spark.operators.table import (
        compact_table,
        last_applied_epoch,
        reset_applied,
        vacuum_deltas,
    )
    from aden_hive_fork_spark.streaming.cdc_sink import cdc_lineage_id

    root = str(tmp_path / "tbl")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    base = spark.createDataFrame([(1, 1.0)], "id bigint, score double")
    create_table(base, root, ["id"])
    _write_jsonl(f"{src}/a.jsonl", [{"id": 1, "score": 9.0, "_op": "upsert"}])
    _run(spark, src, root, ckpt)
    lineage = cdc_lineage_id(ckpt)

    # with a LIVE delta marker the reset must refuse (it would make a
    # crash-replay of the published epoch re-apply)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        reset_applied(root, lineage)

    compact_table(spark, root)
    vacuum_deltas(root)
    assert last_applied_epoch(root, lineage) == 0
    assert reset_applied(root, lineage) is True
    assert last_applied_epoch(root, lineage) is None
    assert reset_applied(root, lineage) is False  # already gone


def test_cdc_duplicate_seq_raises(spark, tmp_path):
    # duplicate (key, seq): no defined winner — the sink must refuse
    # loudly rather than pick an arbitrary surviving row
    root = str(tmp_path / "tbl")
    src = str(tmp_path / "src")
    base = spark.createDataFrame([(1, 1.0)], "id bigint, score double")
    create_table(base, root, ["id"])
    _write_jsonl(f"{src}/a.jsonl", [
        {"id": 1, "score": 5.0, "_op": "upsert", "seq": 7},
        {"id": 1, "score": 6.0, "_op": "upsert", "seq": 7},
    ])
    stream = spark.readStream.schema(SCHEMA + ", seq bigint").json(src)
    q = cdc_upsert_sink(stream, root, ["id"], str(tmp_path / "ckpt"),
                        seq_col="seq")
    import pytest as _pytest

    from pyspark.errors import StreamingQueryException

    with _pytest.raises(StreamingQueryException):
        q.awaitTermination(120)
    assert _state(spark, root) == {1: 1.0}  # nothing applied


def test_cdc_null_seq_loses_to_real_seq(spark, tmp_path):
    root = str(tmp_path / "tbl")
    src = str(tmp_path / "src")
    base = spark.createDataFrame([(1, 1.0)], "id bigint, score double")
    create_table(base, root, ["id"])
    _write_jsonl(f"{src}/a.jsonl", [
        {"id": 1, "score": 5.0, "_op": "upsert", "seq": None},
        {"id": 1, "score": 6.0, "_op": "upsert", "seq": 3},
    ])
    stream = spark.readStream.schema(SCHEMA + ", seq bigint").json(src)
    q = cdc_upsert_sink(stream, root, ["id"], str(tmp_path / "ckpt"),
                        seq_col="seq")
    q.awaitTermination(120)
    assert _state(spark, root) == {1: 6.0}


def test_streaming_curation_pipeline_end_to_end(spark, tmp_path):
    """Integration: a document stream is PII-redacted and measured
    (observe) on the way into a parquet sink; the sink is then
    manifested and verified — the full curation path composes from
    the individual operators with no glue code."""
    from pyspark.sql import functions as F

    from aden_hive_fork_spark.operators.manifest import (
        dataset_manifest,
        verify_manifest,
    )
    from aden_hive_fork_spark.operators.pii import detect_pii, redact_pii
    from aden_hive_fork_spark.streaming.observe import last_observed, observed

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    _write_jsonl(f"{src}/a.jsonl", [
        {"doc_id": 1, "text": "contact bob@corp.io for the dataset"},
        {"doc_id": 2, "text": "card 4111-1111-1111-9999 found in dump"},
        {"doc_id": 3, "text": "clean prose only"},
    ])
    stream = spark.readStream.schema("doc_id bigint, text string").json(src)
    curated = detect_pii(stream, "text").withColumn(
        "text", redact_pii("text")
    )
    watched, _ = observed(curated, "curation", {
        "n_docs": F.count(F.lit(1)),
        "docs_with_pii": F.sum(
            F.when(F.col("pii_total") > 0, 1).otherwise(0)
        ),
    })
    q = (
        watched.writeStream.format("parquet")
        .option("path", f"{out}/data")
        .option("checkpointLocation", f"{out}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert last_observed(q, "curation") == {"n_docs": 3, "docs_with_pii": 2}

    rows = {r["doc_id"]: r for r in
            spark.read.parquet(f"{out}/data").collect()}
    assert rows[1]["text"] == "contact [EMAIL] for the dataset"
    assert rows[2]["text"] == "card [CARD] found in dump"
    assert rows[3]["text"] == "clean prose only"

    man = dataset_manifest(spark, f"{out}/data")
    assert sum(r["n_rows"] for r in man.collect()) == 3
    assert verify_manifest(spark, f"{out}/data", man).count() == 0
