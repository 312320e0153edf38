"""Recall-vs-exact bounds for the md5-deterministic ANN tiers
(VERDICT r5 "Next round" #5): q238's sign-hyperplane LSH and q239's
md5-seeded IVF measured against the exact int8-dot top-k ground truth
on the sf0.001 embeddings table. Both tiers are bit-deterministic
(md5-derived randomness, integer scoring), so these bounds are stable
assertions, not flaky statistics.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aden_hive_fork_spark.operators.similarity import (
    ann_md5_buckets,
    ann_md5_topk,
    ivf_md5_topk,
    quantized_dot_topk,
)

SF_DIR = "/root/testdata/sf0.001"
QUERY_IDS = [0, 1, 2, 3]
K = 5

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/embeddings.parquet"),
    reason="testdata not present",
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["id"])
    return out


@pytest.fixture(scope="module")
def exact_sets(emb):
    return _topk_sets(quantized_dot_topk(emb, QUERY_IDS, k=K))


def _mean_recall(approx_sets, exact_sets):
    recalls = [
        len(approx_sets.get(q, set()) & ids) / len(ids)
        for q, ids in exact_sets.items()
    ]
    return sum(recalls) / len(recalls)


def test_ann_md5_recall_bound(emb, exact_sets):
    approx = _topk_sets(
        ann_md5_topk(emb, QUERY_IDS, k=K, num_tables=8, num_planes=4)
    )
    # 8 OR'd tables of 4 planes each (LSH amplification): a true
    # neighbor is missed only if it disagrees with the query in EVERY
    # table — measured 0.75 at sf0.001, pinned as >= 0.6
    assert _mean_recall(approx, exact_sets) >= 0.6


def test_ivf_md5_recall_bound(emb, exact_sets):
    approx = _topk_sets(
        ivf_md5_topk(emb, QUERY_IDS, k=K, num_cells=16, n_probe=6)
    )
    # probing 6 of 16 random-seed cells; measured 0.65 at sf0.001
    assert _mean_recall(approx, exact_sets) >= 0.5


def test_ann_md5_buckets_partition_corpus(emb):
    b = ann_md5_buckets(emb, num_tables=8, num_planes=4).cache()
    try:
        n_vec = emb.count()
        # one row per (vector, table)
        assert b.count() == n_vec * 8
        per_table = {
            r["t"]: r["c"]
            for r in b.groupBy(
                F.split("bucket", "\\|")[0].alias("t")
            ).agg(F.count("*").alias("c")).collect()
        }
        assert len(per_table) == 8
        assert all(c == n_vec for c in per_table.values())
        # within a table: 16 possible buckets; the index must actually
        # partition (no table degenerates to a single bucket)
        t0 = b.filter(F.col("bucket").startswith("0|"))
        occupied = t0.select("bucket").distinct().count()
        assert 2 <= occupied <= 16
        top = max(
            r["c"]
            for r in t0.groupBy("bucket").agg(F.count("*").alias("c")).collect()
        )
        assert top < n_vec
    finally:
        b.unpersist()


# ---------------------------------------------------------------------------
# round-7 exact-integer vectorized tiers (q51/q52/q53 hash-gate move)
# ---------------------------------------------------------------------------


def test_cosine_topk_vectorized_exact_matches_exact_scorer(spark):
    from aden_hive_fork_spark.catalog import load_table
    from aden_hive_fork_spark.operators.similarity import (
        cosine_topk_exact,
        cosine_topk_vectorized_exact,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    q = [(int(r["vec_id"]), list(r["embedding"]))
         for r in emb.orderBy("vec_id").limit(2).collect()]
    got = cosine_topk_vectorized_exact(emb, q, k=5).collect()
    for qid, _vec in q:
        mine = [(r["vec_id"], r["cosine"]) for r in got
                if r["query_id"] == qid]
        ref = [(r["vec_id"], r["cosine"])
               for r in cosine_topk_exact(emb, query_id=qid, k=5).collect()]
        # same neighbor set and same quantized values (both paths are
        # the shared FLOOR(d/(sqrt·sqrt)·1e6+0.5)/1e6 contract)
        assert mine == ref


def test_quantize_i64_overflow_guard(spark):
    import numpy as np
    import pytest

    from aden_hive_fork_spark.operators.similarity import _quantize_i64

    ok = _quantize_i64(np.array([[0.5, -0.25]]))
    assert ok.tolist() == [[50000000, -25000000]]
    with pytest.raises(ValueError, match="int64"):
        _quantize_i64(np.full((1, 64), 99.0))


def test_lsh_buckets_md5_deterministic_and_bounded(spark):
    from aden_hive_fork_spark.catalog import load_table
    from aden_hive_fork_spark.operators.similarity import lsh_buckets_md5

    emb = load_table(spark, SF_DIR, "embeddings").limit(200)
    b1 = {r["vec_id"]: r["bucket"]
          for r in lsh_buckets_md5(emb, num_planes=6).collect()}
    b2 = {r["vec_id"]: r["bucket"]
          for r in lsh_buckets_md5(emb, num_planes=6).collect()}
    assert b1 == b2 and b1
    assert all(0 <= v < 64 for v in b1.values())
    # different salt → different partition of the space
    b3 = {r["vec_id"]: r["bucket"]
          for r in lsh_buckets_md5(emb, num_planes=6, salt="other").collect()}
    assert b3 != b1


def test_cosine_neardup_pairs_exact_symmetric_ids(spark):
    from aden_hive_fork_spark.operators.similarity import (
        cosine_neardup_pairs_exact,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0], "a"), (2, [1.0, 0.01], "a"), (3, [0.0, 1.0], "a"),
         (4, [1.0, 0.0], "b")],
        "vec_id bigint, embedding array<float>, label string",
    )
    got = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in cosine_neardup_pairs_exact(df, 0.9, "label").collect()}
    assert set(got) == {(1, 2)}  # blocked: 4 never compares to 1
    assert got[(1, 2)] > 0.99
