"""Streaming twin of the pipeline capstone: streamed census ==
batch census on dict equality, replay no-op, duplicate-doc
idempotence, real readStream end-to-end."""

from __future__ import annotations

from aden_hive_fork_spark.operators.layout import read_pointer
from aden_hive_fork_spark.operators.pretrain_pipeline import (
    pretrain_pipeline_census,
)
from aden_hive_fork_spark.streaming.pretrain_stream import (
    init_pretrain_pipeline,
    maintain_pretrain_pipeline,
    merge_pretrain_batch,
    read_census,
    read_corpus,
)

from test_pretrain_pipeline import SCHEMA, _corpus


def _census(df):
    return {
        r["stage"]: (r["n_docs"], r["n_tokens"]) for r in df.collect()
    }


def test_streamed_census_equals_batch_and_replay(spark, tmp_path):
    path = str(tmp_path / "pp")
    init_pretrain_pipeline(spark, path)
    rows = _corpus()
    chunks = (rows[:9], rows[9:17], rows[17:])
    for bid, chunk in enumerate(chunks):
        merge_pretrain_batch(
            spark.createDataFrame(chunk, SCHEMA), bid, path
        )
    streamed = _census(read_census(spark, path))
    batch = _census(
        pretrain_pipeline_census(spark.createDataFrame(rows, SCHEMA))
    )
    assert streamed == batch  # dict equality: bit-exact

    # replay of an already-committed batch is a no-op (no new version)
    v = read_pointer(path)["version"]
    merge_pretrain_batch(
        spark.createDataFrame(chunks[1], SCHEMA), 1, path
    )
    assert read_pointer(path)["version"] == v

    # re-sending already-present doc ids in a NEW batch: first writer
    # wins, corpus and census unchanged
    merge_pretrain_batch(
        spark.createDataFrame(rows[:5], SCHEMA), 99, path
    )
    assert read_corpus(spark, path).count() == len(rows)
    assert _census(read_census(spark, path)) == batch


def test_readstream_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = _corpus()[:12]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(src)
    path = str(tmp_path / "pp2")
    init_pretrain_pipeline(spark, path)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = maintain_pretrain_pipeline(
        stream, path, str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)
    streamed = _census(read_census(spark, path))
    batch = _census(
        pretrain_pipeline_census(spark.createDataFrame(rows, SCHEMA))
    )
    assert streamed == batch
