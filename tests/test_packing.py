"""Sequence-packing invariants (operators/packing): gapless coverage,
per-doc conservation, capacity exactness, split accounting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def docs(spark):
    # lengths chosen to force straddles: 7+9=16 fills window 0 (C=16),
    # 30 spans windows 1..2, 3 rides window 2, 20 spans 3..4
    rows = [(1, 7), (2, 9), (3, 30), (4, 3), (5, 20)]
    return spark.createDataFrame(rows, "doc_id bigint, n_tok int")


def _pack(docs, cap=16):
    from aden_hive_fork_spark.operators.packing import pack_token_stream

    return pack_token_stream(docs, "doc_id", "n_tok", capacity=cap)


def test_per_doc_token_conservation(spark, docs):
    out = _pack(docs).groupBy("doc_id").agg(
        F.sum("n_tokens").alias("packed")
    )
    got = {r["doc_id"]: r["packed"] for r in out.collect()}
    assert got == {1: 7, 2: 9, 3: 30, 4: 3, 5: 20}


def test_windows_fill_exactly_to_capacity(spark, docs):
    rows = _pack(docs).collect()
    per_win = {}
    for r in rows:
        per_win.setdefault(r["window_id"], 0)
        per_win[r["window_id"]] += r["n_tokens"]
    # total stream = 69 tokens -> windows 0..3 full (16), window 4 has 5
    assert per_win == {0: 16, 1: 16, 2: 16, 3: 16, 4: 5}


def test_offsets_are_gapless_within_windows(spark, docs):
    rows = sorted(
        _pack(docs).collect(),
        key=lambda r: (r["window_id"], r["win_offset"]),
    )
    pos = {}
    for r in rows:
        expect = pos.get(r["window_id"], 0)
        assert r["win_offset"] == expect, r
        pos[r["window_id"]] = expect + r["n_tokens"]


def test_straddling_doc_offsets(spark, docs):
    # doc 3 (len 30) starts at stream pos 16: window 1 gets doc
    # tokens [0,16), window 2 gets [16,30)
    rows = {
        (r["doc_id"], r["window_id"]): r
        for r in _pack(docs).collect()
    }
    a = rows[(3, 1)]
    assert (a["doc_offset"], a["win_offset"], a["n_tokens"]) == (0, 0, 16)
    b = rows[(3, 2)]
    assert (b["doc_offset"], b["win_offset"], b["n_tokens"]) == (16, 0, 14)


def test_zero_and_null_lengths_excluded(spark):
    docs = spark.createDataFrame(
        [(1, 5), (2, 0), (3, None), (4, 11)], "doc_id bigint, n_tok int"
    )
    out = _pack(docs, cap=8).select("doc_id").distinct().collect()
    assert sorted(r["doc_id"] for r in out) == [1, 4]


def test_stats_fill_and_boundary_docs(spark, docs):
    from aden_hive_fork_spark.operators.packing import packing_stats

    stats = {
        r["window_id"]: r
        for r in packing_stats(_pack(docs), capacity=16).collect()
    }
    assert stats[0]["n_docs"] == 2 and stats[0]["fill"] == 1.0
    assert stats[4]["fill"] == pytest.approx(5 / 16)
    # window 0: doc 2 ends exactly at the boundary
    assert stats[0]["n_boundary_docs"] == 1


def test_capacity_validation(spark, docs):
    from aden_hive_fork_spark.operators.packing import pack_token_stream

    with pytest.raises(ValueError):
        pack_token_stream(docs, "doc_id", "n_tok", capacity=0)
