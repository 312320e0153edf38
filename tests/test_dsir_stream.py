"""Streaming DSIR model maintenance: streamed model scores ==
batch dsir_importance bit-exact over the union of merged batches,
replay idempotence, readStream end-to-end."""

from __future__ import annotations

import pytest

from aden_hive_fork_spark.operators.sampling import dsir_importance
from aden_hive_fork_spark.streaming.dsir_stream import (
    init_dsir_model,
    merge_dsir_batch,
    read_ratio_table,
    score_documents,
)

SCHEMA = "doc_id bigint, text string, tgt boolean"

_ROWS = [
    (0, "alpha alpha beta gamma", True),
    (1, "alpha beta beta", True),
    (2, "gamma delta gamma delta", False),
    (3, "alpha beta alpha epsilon", False),
    (4, "gamma gamma delta zeta", False),
    (5, "beta epsilon zeta alpha", True),
    (6, "delta delta gamma", False),
]


def _scores(df):
    return {
        r["doc_id"]: (r["n_tokens"], r["log_ratio"])
        for r in df.collect()
    }


def test_streamed_model_scores_equal_batch(spark, tmp_path):
    path = str(tmp_path / "dsir")
    init_dsir_model(spark, path)
    for bid, chunk in enumerate((_ROWS[:2], _ROWS[2:5], _ROWS[5:])):
        merge_dsir_batch(
            spark.createDataFrame(chunk, SCHEMA), bid, path
        )
    all_docs = spark.createDataFrame(_ROWS, SCHEMA)
    streamed = _scores(
        score_documents(
            all_docs, read_ratio_table(spark, path), "doc_id", "text"
        )
    )
    batch = _scores(dsir_importance(all_docs, "doc_id", "text", "tgt"))
    assert streamed == batch  # dict equality: bit-exact


def test_out_of_order_batches_still_match(spark, tmp_path):
    path = str(tmp_path / "dsir")
    init_dsir_model(spark, path)
    for bid, chunk in enumerate((_ROWS[5:], _ROWS[:2], _ROWS[2:5])):
        merge_dsir_batch(
            spark.createDataFrame(chunk, SCHEMA), bid, path
        )
    all_docs = spark.createDataFrame(_ROWS, SCHEMA)
    streamed = _scores(
        score_documents(
            all_docs, read_ratio_table(spark, path), "doc_id", "text"
        )
    )
    batch = _scores(dsir_importance(all_docs, "doc_id", "text", "tgt"))
    assert streamed == batch


def test_replay_is_noop(spark, tmp_path):
    path = str(tmp_path / "dsir")
    init_dsir_model(spark, path)
    df = spark.createDataFrame(_ROWS, SCHEMA)
    merge_dsir_batch(df, 0, path)
    before = {
        r["word"]: r["term"]
        for r in read_ratio_table(spark, path).collect()
    }
    merge_dsir_batch(df, 0, path)  # replay must not double counts
    after = {
        r["word"]: r["term"]
        for r in read_ratio_table(spark, path).collect()
    }
    assert after == before


def test_merge_without_init_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        merge_dsir_batch(
            spark.createDataFrame(_ROWS[:1], SCHEMA),
            0,
            str(tmp_path / "nope"),
        )


def test_streaming_source_end_to_end(spark, tmp_path):
    import json as _json
    import os

    from aden_hive_fork_spark.streaming.dsir_stream import (
        maintain_dsir_model,
    )

    path, ckpt, in_dir = (
        str(tmp_path / d) for d in ("dsir", "ckpt", "in")
    )
    init_dsir_model(spark, path)
    os.makedirs(in_dir, exist_ok=True)
    with open(os.path.join(in_dir, "b1.json"), "w") as fh:
        for doc_id, text, tgt in _ROWS:
            fh.write(
                _json.dumps(
                    {"doc_id": doc_id, "text": text, "tgt": tgt}
                )
                + "\n"
            )
    st = spark.readStream.schema(SCHEMA).json(in_dir)
    maintain_dsir_model(st, path, ckpt).awaitTermination(120)
    all_docs = spark.createDataFrame(_ROWS, SCHEMA)
    live = _scores(
        score_documents(
            all_docs, read_ratio_table(spark, path), "doc_id", "text"
        )
    )
    batch = _scores(dsir_importance(all_docs, "doc_id", "text", "tgt"))
    assert live == batch
