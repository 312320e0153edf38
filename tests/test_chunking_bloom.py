"""Chunking + Bloom-prune operator tests: hand-computed windows,
coverage properties, bloom sizing math, no-false-negative /
bounded-false-positive behavior, plan guards (map-only prefilter),
and exact semi-join equivalence on testdata."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aden_hive_fork_spark.operators.bloom import (
    bloom_build,
    bloom_filter_rows,
    bloom_params,
    bloom_semi_join,
)
from aden_hive_fork_spark.operators.chunking import (
    chunk_documents,
    chunk_tokens,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------
def test_chunk_documents_hand_example(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "xy"), (3, ""), (4, None)],
        ["doc_id", "text"],
    )
    out = sorted(
        chunk_documents(df, chunk_size=6, overlap=2).collect(),
        key=lambda r: (r["doc_id"], r["chunk_id"]),
    )
    got = [(r["doc_id"], r["chunk_id"], r["chunk_start"], r["chunk_text"])
           for r in out]
    # stride 4: starts 0,4,8 for len 10; empty/null docs drop out
    assert got == [
        (1, 0, 0, "abcdef"),
        (1, 1, 4, "efghij"),
        (1, 2, 8, "ij"),
        (2, 0, 0, "xy"),
    ]
    assert all(r["chunk_len"] == len(r["chunk_text"]) for r in out)


def test_chunk_documents_full_coverage_and_overlap(spark):
    text = "x" * 1003
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, chunk_size=128, overlap=32).collect(),
        key=lambda r: r["chunk_id"],
    )
    covered = set()
    for r in rows:
        covered.update(range(r["chunk_start"],
                             r["chunk_start"] + r["chunk_len"]))
    assert covered == set(range(1003))  # every char in >= 1 chunk
    # consecutive chunks overlap by exactly `overlap` until the tail
    for a, b in zip(rows, rows[1:]):
        assert b["chunk_start"] - a["chunk_start"] == 96


def test_chunk_tokens_hand_example(spark):
    df = spark.createDataFrame(
        [(1, "  t1 t2  t3 t4 t5 t6 t7 t8 t9 t10 "), (2, "   ")],
        ["doc_id", "text"],
    )
    out = sorted(
        chunk_tokens(df, chunk_tokens=4, overlap=1).collect(),
        key=lambda r: (r["doc_id"], r["chunk_id"]),
    )
    got = [(r["chunk_id"], r["token_start"], r["n_tokens"], r["chunk_text"])
           for r in out]
    # stride 3, 10 tokens: starts 1,4,7,10
    assert got == [
        (0, 1, 4, "t1 t2 t3 t4"),
        (1, 4, 4, "t4 t5 t6 t7"),
        (2, 7, 4, "t7 t8 t9 t10"),
        (3, 10, 1, "t10"),
    ]


def test_chunking_validation():
    with pytest.raises(ValueError):
        chunk_documents(None, chunk_size=10, overlap=10)
    with pytest.raises(ValueError):
        chunk_tokens(None, chunk_tokens=4, overlap=9)


def test_chunking_plan_is_map_only(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        chunk_documents(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # sequence+posexplode+substring only


# ---------------------------------------------------------------------------
# bloom
# ---------------------------------------------------------------------------
def test_bloom_params_textbook_sizing():
    m, k = bloom_params(1000, 0.01)
    assert m % 64 == 0
    assert 9576 <= m <= 9664  # -1000 ln .01 / ln2^2 ≈ 9585, word-rounded
    assert k == 7
    with pytest.raises(ValueError):
        bloom_params(0)
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)


def test_bloom_no_false_negatives_bounded_false_positives(spark):
    members = spark.range(0, 1000).select(F.col("id").alias("k"))
    bloom = bloom_build(members, "k", expected_n=1000, fpp=0.01)
    assert len(bloom["words"]) == bloom["n_bits"] // 64

    # every member passes
    probe_members = bloom_filter_rows(members, "k", bloom)
    assert probe_members.count() == 1000

    # non-members pass at ~fpp (allow 3x headroom on 10k probes)
    others = spark.range(100_000, 110_000).select(F.col("id").alias("k"))
    fp = bloom_filter_rows(others, "k", bloom).count()
    assert fp < 10_000 * 0.03


def test_bloom_prefilter_plan_is_map_side(spark):
    """The probed table must not shuffle: the only exchange in the
    prefilter plan is the one-row broadcast of the word array."""
    big = spark.range(0, 10_000).select(F.col("id").alias("k"))
    bloom = bloom_build(
        spark.range(0, 100).select(F.col("id").alias("k")), "k",
        expected_n=100,
    )
    plan = (
        bloom_filter_rows(big, "k", bloom)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastExchange" in plan
    assert "hashpartitioning" not in plan  # no shuffle of `big`


def test_bloom_semi_join_exact_vs_plain(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    small = (
        spark.read.parquet(f"{SF}/part.parquet")
        .filter(F.col("p_size") <= 5)
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    via_bloom = bloom_semi_join(li, small, "l_partkey", fpp=0.01)
    plain = li.join(small.distinct(), "l_partkey", "left_semi")
    assert via_bloom.count() == plain.count()
    assert via_bloom.exceptAll(plain).count() == 0
    assert plain.exceptAll(via_bloom).count() == 0


def test_bloom_dict_is_persistable(spark):
    """The built filter is a plain dict — JSON round-trip and reuse
    in a later 'session' (the benchmark-membership pattern)."""
    import json

    members = spark.range(0, 500).select(F.col("id").alias("k"))
    bloom = bloom_build(members, "k", expected_n=500)
    restored = json.loads(json.dumps(bloom))
    survivors = bloom_filter_rows(members, "k", restored).count()
    assert survivors == 500


def test_bloom_and_chunking_run_on_streams(spark, tmp_path):
    """bloom_filter_rows (map + one-row broadcast) and chunk_documents
    (stateless generator projection) run UNCHANGED on Structured
    Streaming — the incremental-curation shape: prune and chunk new
    files as they land. availableNow replay must equal batch."""
    import os
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(tmp_path, "docs")
    os.makedirs(d)
    rows = [(i, f"tok{i} " * (5 + i % 7)) for i in range(40)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1].strip() for r in rows]),
            }
        ),
        os.path.join(d, "part.parquet"),
    )
    batch = spark.read.parquet(d)
    keep = spark.createDataFrame(
        [(i,) for i in range(0, 40, 3)], ["doc_id"]
    )
    bloom = bloom_build(keep, "doc_id", expected_n=14)

    def pipeline(df):
        return chunk_documents(
            bloom_filter_rows(df, "doc_id", bloom),
            chunk_size=20, overlap=5,
        )

    stream = spark.readStream.schema(batch.schema).parquet(d)
    sink = f"bl_{uuid.uuid4().hex[:8]}"
    q = (
        pipeline(stream)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.doc_id, r.chunk_id, r.chunk_text)
        for r in spark.table(sink).collect()
    }
    batched = {
        (r.doc_id, r.chunk_id, r.chunk_text)
        for r in pipeline(batch).collect()
    }
    assert streamed == batched
    # bloom kept (at least) the 14 member docs; chunking multiplied rows
    assert {r[0] for r in streamed} >= set(range(0, 40, 3))
