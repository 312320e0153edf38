"""Streaming unigram-LM twin: streamed model/segments == batch
bit-exact on dict equality, out-of-order invariance, replay no-op,
readStream end-to-end."""

from __future__ import annotations

from aden_hive_fork_spark.operators.layout import read_pointer
from aden_hive_fork_spark.operators.unigram_lm import (
    unigram_lm_segment,
    unigram_lm_train,
)
from aden_hive_fork_spark.streaming.unigram_stream import (
    init_unigram_state,
    maintain_unigram_state,
    merge_unigram_batch,
    read_model,
    read_segments,
    read_word_counts,
)

SCHEMA = "doc_id bigint, text string"
_ROWS = [
    (0, "abab abab cd abab"),
    (1, "abab cd cd ef"),
    (2, "efef abab efef"),
    (3, "cd abab abab"),
    (4, "ef abab cd"),
    (5, "efef cd abab abab"),
]
_KW = dict(min_occ=2, max_piece_len=2, em_rounds=2)


def _model(df_or_rows, spark=None):
    if spark is not None:
        df = spark.createDataFrame(df_or_rows, SCHEMA)
        return {
            r["token"]: (r["seed_cnt"], r["cnt"], r["logp"])
            for r in unigram_lm_train(df, "text", **_KW).collect()
        }
    return {
        r["token"]: (r["seed_cnt"], r["cnt"], r["logp"])
        for r in df_or_rows.collect()
    }


def _segs(df):
    return {
        r["word"]: (r["word_freq"], r["pieces"], r["n_pieces"],
                    r["score"])
        for r in df.collect()
    }


def test_streamed_model_equals_batch_and_replay(spark, tmp_path):
    path = str(tmp_path / "ug")
    init_unigram_state(spark, path, **_KW)
    for bid, chunk in enumerate((_ROWS[:2], _ROWS[2:4], _ROWS[4:])):
        merge_unigram_batch(
            spark.createDataFrame(chunk, SCHEMA), bid, path
        )
    assert _model(read_model(spark, path)) == _model(_ROWS, spark)
    want_segs = _segs(
        unigram_lm_segment(
            spark.createDataFrame(_ROWS, SCHEMA), "text", **_KW
        )
    )
    assert _segs(read_segments(spark, path)) == want_segs

    # replay no-op
    v = read_pointer(path)["version"]
    merge_unigram_batch(
        spark.createDataFrame(_ROWS[:2], SCHEMA), 0, path
    )
    assert read_pointer(path)["version"] == v


def test_out_of_order_batches_match(spark, tmp_path):
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    for p, order in ((pa, (0, 1, 2)), (pb, (2, 0, 1))):
        init_unigram_state(spark, p, **_KW)
        chunks = (_ROWS[:2], _ROWS[2:4], _ROWS[4:])
        for bid, ci in enumerate(order):
            merge_unigram_batch(
                spark.createDataFrame(chunks[ci], SCHEMA), bid, p
            )
    assert (
        {r["word"]: r["freq"]
         for r in read_word_counts(spark, pa).collect()}
        == {r["word"]: r["freq"]
            for r in read_word_counts(spark, pb).collect()}
    )
    assert _model(read_model(spark, pa)) == _model(read_model(spark, pb))


def test_readstream_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(_ROWS, SCHEMA).coalesce(1).write.parquet(src)
    path = str(tmp_path / "ug2")
    init_unigram_state(spark, path, **_KW)
    q = maintain_unigram_state(
        spark.readStream.schema(SCHEMA).parquet(src),
        path,
        str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)
    assert _model(read_model(spark, path)) == _model(_ROWS, spark)
