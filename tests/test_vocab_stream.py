"""Streaming vocabulary-growth maintenance: streamed counters ==
batch vocabulary_growth bit-exact under the shared explicit id
domain, replay idempotence, real readStream end-to-end."""

from __future__ import annotations

import pytest

from aden_hive_fork_spark.operators.quality import vocabulary_growth
from aden_hive_fork_spark.streaming.vocab_stream import (
    init_vocab_growth,
    merge_vocab_batch,
    read_growth,
)

SCHEMA = "doc_id bigint, text string"

_ROWS = [
    (0, "the quick brown fox"),
    (1, "the slow brown dog"),
    (2, "a quick red fox jumps"),
    (3, "entirely new words appear here"),
    (4, "the fox and the dog again"),
    (5, "words appear and appear"),
    (6, "final bucket brings closure"),
    (7, "closure brings nothing new"),
]


def _curve(df):
    return {
        r["bucket"]: (r["n_docs"], r["tokens_cum"], r["vocab_cum"])
        for r in df.collect()
    }


def test_streamed_growth_equals_batch(spark, tmp_path):
    path = str(tmp_path / "vg")
    init_vocab_growth(spark, path, buckets=4, id_lo=0, id_hi=8)
    for bid, chunk in enumerate((_ROWS[:3], _ROWS[3:6], _ROWS[6:])):
        merge_vocab_batch(
            spark.createDataFrame(chunk, SCHEMA), bid, path
        )
    streamed = _curve(read_growth(spark, path))
    batch = _curve(
        vocabulary_growth(
            spark.createDataFrame(_ROWS, SCHEMA),
            "doc_id",
            "text",
            buckets=4,
            id_lo=0,
            id_hi=8,
        )
    )
    assert streamed == batch  # dict equality: bit-exact


def test_out_of_order_batches_still_match(spark, tmp_path):
    # MIN/SUM merges are order-insensitive: arrival order must not
    # change the curve (a doc from bucket 3 arriving before bucket 0
    # still first-occurs in its OWN bucket).
    path = str(tmp_path / "vg")
    init_vocab_growth(spark, path, buckets=4, id_lo=0, id_hi=8)
    for bid, chunk in enumerate((_ROWS[6:], _ROWS[:3], _ROWS[3:6])):
        merge_vocab_batch(
            spark.createDataFrame(chunk, SCHEMA), bid, path
        )
    streamed = _curve(read_growth(spark, path))
    batch = _curve(
        vocabulary_growth(
            spark.createDataFrame(_ROWS, SCHEMA),
            "doc_id",
            "text",
            buckets=4,
            id_lo=0,
            id_hi=8,
        )
    )
    assert streamed == batch


def test_replay_is_noop(spark, tmp_path):
    path = str(tmp_path / "vg")
    init_vocab_growth(spark, path, buckets=4, id_lo=0, id_hi=8)
    df = spark.createDataFrame(_ROWS, SCHEMA)
    merge_vocab_batch(df, 0, path)
    before = _curve(read_growth(spark, path))
    merge_vocab_batch(df, 0, path)  # replay must not double-count
    assert _curve(read_growth(spark, path)) == before


def test_merge_without_init_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        merge_vocab_batch(
            spark.createDataFrame(_ROWS[:1], SCHEMA),
            0,
            str(tmp_path / "nope"),
        )


def test_batch_operator_bounds_validation(spark):
    df = spark.createDataFrame(_ROWS, SCHEMA)
    with pytest.raises(ValueError):
        vocabulary_growth(df, "doc_id", "text", buckets=4, id_lo=0)


def test_streaming_source_end_to_end(spark, tmp_path):
    import json as _json
    import os

    from aden_hive_fork_spark.streaming.vocab_stream import (
        maintain_vocab_growth,
    )

    path, ckpt, in_dir = (
        str(tmp_path / d) for d in ("vg", "ckpt", "in")
    )
    init_vocab_growth(spark, path, buckets=4, id_lo=0, id_hi=8)
    os.makedirs(in_dir, exist_ok=True)
    with open(os.path.join(in_dir, "b1.json"), "w") as fh:
        for doc_id, text in _ROWS:
            fh.write(
                _json.dumps({"doc_id": doc_id, "text": text}) + "\n"
            )
    st = spark.readStream.schema(SCHEMA).json(in_dir)
    maintain_vocab_growth(st, path, ckpt).awaitTermination(120)
    live = _curve(read_growth(spark, path))
    batch = _curve(
        vocabulary_growth(
            spark.createDataFrame(_ROWS, SCHEMA),
            "doc_id",
            "text",
            buckets=4,
            id_lo=0,
            id_hi=8,
        )
    )
    assert live == batch
