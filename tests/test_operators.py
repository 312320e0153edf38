"""Semantic unit tests for the custom operators (dedup / similarity),
in the reference's per-tool golden style (SURVEY.md §5.1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aden_hive_fork_spark.operators.dedup import (
    exact_dedup,
    minhash_neardup_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_neardup_pairs,
)
from aden_hive_fork_spark.operators.similarity import (
    cosine_topk_exact,
    cosine_topk_vectorized,
    lsh_bucket_candidates,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "a"),
        (2, "the quick brown fox jumps over the lazy cat", "a"),  # near-dup of 1
        (3, "the quick brown fox jumps over the lazy dog", "a"),  # exact dup of 1
        (4, "completely different text about spark sql engines here", "a"),
        (5, "unrelated short text", "b"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_exact_dedup_keeps_min(spark):
    df = spark.createDataFrame(
        [(1, "x", 10), (1, "x", 5), (2, "y", 7)], "k long, v string, ord long"
    )
    out = exact_dedup(df, ["k", "v"], "ord").orderBy("k").collect()
    assert [(r.k, r.ord) for r in out] == [(1, 5), (2, 7)]


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", block_cols=["source"], k=3, threshold=0.2
    ).collect()
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    assert got[(1, 3)] == 1.0  # exact dup
    assert 0.5 <= got[(1, 2)] < 1.0  # near dup
    assert (1, 4) not in got


def test_minhash_neardup(docs):
    pairs = minhash_neardup_pairs(docs, "doc_id", k=3).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 3) in got  # exact dup always collides
    assert (1, 2) in got  # near dup at distance < 0.8


def test_simhash_exact_dup_distance_zero(docs):
    fps = {r.id: r.simhash for r in simhash_fingerprints(docs, "doc_id").collect()}
    assert fps[1] == fps[3]
    pairs = simhash_neardup_pairs(docs, "doc_id", max_hamming=3).collect()
    assert (1, 3) in {(r.id_a, r.id_b) for r in pairs}


@pytest.fixture(scope="module")
def emb(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # close to 0
        (2, [0.0, 1.0, 0.0]),   # orthogonal
        (3, [-1.0, 0.0, 0.0]),  # opposite
        (4, [0.8, 0.2, 0.1]),   # close-ish
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_exact_order(emb):
    out = cosine_topk_exact(emb, query_id=0, k=3).collect()
    assert [r.vec_id for r in out] == [1, 4, 2]
    assert out[0].cosine > 0.99
    assert abs(out[2].cosine) < 1e-9


def test_cosine_topk_vectorized_matches_exact(emb):
    q = [(0, [1.0, 0.0, 0.0])]
    out = cosine_topk_vectorized(emb, q, k=3).collect()
    assert [r.vec_id for r in out] == [1, 4, 2]


def test_lsh_buckets_deterministic(emb):
    b1 = {r.vec_id: r.bucket for r in lsh_bucket_candidates(emb, seed=7).collect()}
    b2 = {r.vec_id: r.bucket for r in lsh_bucket_candidates(emb, seed=7).collect()}
    assert b1 == b2
    # identical direction vectors must share a bucket
    df2 = emb.sparkSession.createDataFrame(
        [(10, [1.0, 1.0, 0.0]), (11, [2.0, 2.0, 0.0])], "vec_id long, embedding array<float>"
    )
    b3 = {r.vec_id: r.bucket for r in lsh_bucket_candidates(df2, seed=7).collect()}
    assert b3[10] == b3[11]


def test_shingles_short_doc_empty(spark):
    from aden_hive_fork_spark.operators.dedup import shingles_col

    df = spark.createDataFrame([("one two",)], "text string")
    assert df.select(shingles_col("text", 3).alias("s")).first().s == []


def test_cosine_neardup_pairs(spark):
    from aden_hive_fork_spark.operators.similarity import cosine_neardup_pairs

    rows = [
        (0, [1.0, 0.0], 1), (1, [0.99, 0.14], 1), (2, [0.0, 1.0], 1),
        (3, [1.0, 0.01], 2),  # other block: never pairs with 0/1
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    pairs = {(r.id_a, r.id_b) for r in cosine_neardup_pairs(emb, 0.9, "label").collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (0, 3) not in pairs


def test_ann_topk_finds_bucket_neighbors(spark):
    import numpy as np
    from aden_hive_fork_spark.operators.similarity import ann_topk, cosine_topk_exact

    rng = np.random.RandomState(0)
    base = rng.standard_normal((10, 8))
    rows = []
    for i, v in enumerate(base):
        rows.append((2 * i, [float(x) for x in v]))
        rows.append((2 * i + 1, [float(x) for x in v + rng.standard_normal(8) * 0.01]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [(0, rows[0][1])]
    got = ann_topk(emb, q, k=1, num_planes=4).collect()
    # the near-twin (id 1) lands in the same bucket and ranks first
    assert got and got[0].vec_id == 1 and got[0].cosine > 0.99
    exact = cosine_topk_exact(emb, 0, k=1).collect()
    assert exact[0].vec_id == got[0].vec_id


def test_ivf_topk_recall_and_determinism(spark):
    import numpy as np
    from aden_hive_fork_spark.operators.similarity import (
        cosine_topk_vectorized,
        ivf_topk,
    )

    # 4 well-separated clusters of 12 points each
    rng = np.random.RandomState(1)
    centers = np.eye(4).repeat(2, axis=1) * 10  # (4, 8)
    rows = []
    for c in range(4):
        for j in range(12):
            v = centers[c] + rng.standard_normal(8)
            rows.append((c * 12 + j, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = [(0, rows[0][1]), (13, rows[13][1])]

    got = ivf_topk(emb, queries, k=3, n_centroids=4, n_probe=1, seed=3)
    res = got.collect()
    exact = cosine_topk_vectorized(emb, queries, k=3).collect()
    # with one probe on well-separated clusters, IVF == exact top-3
    assert {(r.query_id, r.vec_id) for r in res} == {
        (r.query_id, r.vec_id) for r in exact
    }
    # deterministic: identical output across runs
    res2 = ivf_topk(emb, queries, k=3, n_centroids=4, n_probe=1, seed=3).collect()
    assert [tuple(r) for r in res] == [tuple(r) for r in res2]


def test_ivf_full_probe_equals_bruteforce(spark):
    import numpy as np
    from aden_hive_fork_spark.operators.similarity import (
        cosine_topk_vectorized,
        ivf_topk,
    )

    rng = np.random.RandomState(2)
    rows = [(i, [float(x) for x in rng.standard_normal(6)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = [(5, rows[5][1])]
    # n_probe == n_centroids ⇒ every cell probed ⇒ exact
    approx = ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=8).collect()
    exact = cosine_topk_vectorized(emb, queries, k=5).collect()
    assert [(r.vec_id, r.cosine) for r in approx] == [
        (r.vec_id, r.cosine) for r in exact
    ]


def test_time_range_join_matches_naive(spark):
    """Binned equi-join rewrite must equal the naive range join
    exactly, including ranges that straddle bins and negative offsets."""
    import datetime as dt

    from aden_hive_fork_spark.operators.joins import time_range_join

    base = dt.datetime(2024, 1, 1)
    lrows = [
        (i, 1, base + dt.timedelta(minutes=7 * i)) for i in range(30)
    ]
    rrows = [
        (j, 1, base + dt.timedelta(minutes=3 * j)) for j in range(70)
    ]
    left = spark.createDataFrame(lrows, "lid long, k long, lts timestamp_ntz")
    right = spark.createDataFrame(rrows, "rid long, k long, rts timestamp_ntz")
    lo, hi = -25 * 60_000_000, 10 * 60_000_000  # [-25 min, +10 min)
    got = time_range_join(
        left, right, ["k"], "lts", "rts", lo, hi, bin_us=13 * 60_000_000
    )
    naive = left.join(right, "k").filter(
        (F.col("rts") >= F.expr(f"lts + INTERVAL {lo} MICROSECOND"))
        & (F.col("rts") < F.expr(f"lts + INTERVAL {hi} MICROSECOND"))
    )
    g = sorted((r.lid, r.rid) for r in got.collect())
    n = sorted((r.lid, r.rid) for r in naive.collect())
    assert g == n and len(g) > 0
    # each pair exactly once (no replica duplicates)
    assert len(g) == len(set(g))


def test_rollup_range_agg_matches_raw(spark, tmp_path):
    """Rollup-served range aggregation must equal the direct raw scan
    exactly (decomposable decimal partials), across whole-hour,
    ragged-edge, and sub-hour ranges."""
    from aden_hive_fork_spark.catalog import load_table
    from aden_hive_fork_spark.operators.rollup import (
        materialize_rollup,
        rollup_range_agg,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    path = str(tmp_path / "rollup")
    materialize_rollup(events, path)

    def direct(lo, hi):
        return (
            events.filter(
                (F.col("ts") >= F.lit(lo).cast("timestamp_ntz"))
                & (F.col("ts") < F.lit(hi).cast("timestamp_ntz"))
            )
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_events"),
                F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
                .cast("double")
                .alias("total_value"),
            )
            .orderBy("event_type")
        )

    ranges = [
        ("2024-01-02 00:00:00", "2024-01-05 00:00:00"),   # whole hours
        ("2024-01-02 10:17:23", "2024-01-08 03:40:11"),   # ragged edges
        ("2024-01-03 11:05:00", "2024-01-03 11:25:00"),   # sub-hour
    ]
    for lo, hi in ranges:
        got = [tuple(r) for r in rollup_range_agg(spark, events, path, lo, hi).collect()]
        want = [tuple(r) for r in direct(lo, hi).collect()]
        assert got == want, (lo, hi)


def test_rollup_is_partition_pruned(spark, tmp_path):
    from aden_hive_fork_spark.catalog import load_table
    from aden_hive_fork_spark.operators.rollup import materialize_rollup

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    path = str(tmp_path / "rollup")
    materialize_rollup(events, path)
    df = spark.read.parquet(path).filter(F.col("event_date") == "2024-01-03")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "event_date" in plan.split("PartitionFilters:")[1].split("]")[0]


def test_rollup_hll_users_estimate(spark, tmp_path):
    """Merged per-hour HLL sketches estimate range-wide distinct users
    within HLL tolerance of the exact answer."""
    from aden_hive_fork_spark.catalog import load_table
    from aden_hive_fork_spark.operators.rollup import (
        materialize_rollup,
        rollup_range_users,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    path = str(tmp_path / "rollup_hll")
    materialize_rollup(events, path)
    lo, hi = "2024-01-02 00:00:00", "2024-01-10 00:00:00"
    est = {
        r.event_type: r.est_users
        for r in rollup_range_users(spark, path, lo, hi).collect()
    }
    exact = {
        r.event_type: r.n
        for r in events.filter(
            (F.col("ts") >= F.lit(lo).cast("timestamp_ntz"))
            & (F.col("ts") < F.lit(hi).cast("timestamp_ntz"))
        )
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for t in exact:
        assert abs(est[t] - exact[t]) <= max(3, 0.05 * exact[t]), (t, est[t], exact[t])


def _union_find_components(edges, nodes):
    """Reference oracle: plain union-find, min-id representative."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_connected_components_differential(spark):
    """large-star/small-star labels == union-find labels on seeded
    random graphs, a worst-case chain, and a singleton-free edge list."""
    import random

    from aden_hive_fork_spark.operators.dedup import connected_components

    rng = random.Random(7)
    cases = []
    for n, m in [(30, 15), (60, 40), (80, 120)]:
        cases.append(
            [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        )
    cases.append([(i, i + 1) for i in range(40)])  # one long chain
    cases.append([(5, 5), (9, 2)])  # self-loop edge must not crash
    for edges in cases:
        edges = [(a, b) for a, b in edges if True]
        df = spark.createDataFrame(
            [(a, b) for a, b in edges], "id_a long, id_b long"
        )
        got = {
            r.id: r.comp
            for r in connected_components(df, max_iter=25).collect()
        }
        nodes = {x for e in edges for x in e}
        want = _union_find_components(
            [(a, b) for a, b in edges if a != b], nodes
        )
        assert got == want


def test_dedup_by_components_keeps_canonical(spark):
    from aden_hive_fork_spark.operators.dedup import dedup_by_components

    docs = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (6, 7)], "id_a long, id_b long"
    )
    kept = sorted(
        r.doc_id for r in dedup_by_components(docs, pairs, "doc_id").collect()
    )
    # clusters {1,3,5} -> keep 1; {6,7} -> keep 6; singletons kept
    assert kept == [0, 1, 2, 4, 6]


def test_ngram_jaccard_stop_shingle_default_is_noop(docs):
    """At the default cap the pair set (and every score) is identical
    to the uncapped run on honest data — the cutoff only exists to
    bound degenerate posting lists (VERDICT r2 next-round #3)."""
    base = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, "doc_id", block_cols=["source"], k=3, threshold=0.2,
            max_shingle_df=None,
        ).collect()
    }
    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, "doc_id", block_cols=["source"], k=3, threshold=0.2
        ).collect()
    }
    assert base == capped and len(base) > 0


def test_ngram_jaccard_stop_shingle_bounds_degenerate(spark):
    """A shingle shared by EVERY document is excluded when the cap
    triggers: docs whose only overlap is the hot shingle produce no
    pair, while genuinely near-dup docs still pair up."""
    common = "alpha beta gamma"  # one shared 3-shingle across all docs
    rows = [
        (1, f"{common} one two three four"),
        (2, f"{common} five six seven eight"),
        (3, f"{common} one two three four"),  # exact dup of 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(
            df, "doc_id", k=3, threshold=0.1, max_shingle_df=2
        ).collect()
    }
    assert (1, 3) in got  # still found via their non-hot shingles
    assert (1, 2) not in got  # hot-shingle-only overlap suppressed


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir switches localCheckpoint -> reliable checkpoint;
    labels are identical and checkpoint files land in the dir."""
    import os

    from aden_hive_fork_spark.operators.dedup import connected_components

    edges = [(i, i + 1) for i in range(12)] + [(20, 25), (25, 21)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    ckdir = os.path.join(tmp_path, "cc_ckpt")
    got = {
        r.id: r.comp
        for r in connected_components(
            df, max_iter=25, checkpoint_dir=ckdir
        ).collect()
    }
    local = {
        r.id: r.comp for r in connected_components(df, max_iter=25).collect()
    }
    assert got == local
    assert any(os.scandir(ckdir))  # reliable checkpoint materialized


def test_pagerank_matches_python_power_iteration(spark):
    from aden_hive_fork_spark.operators.graph_rank import pagerank

    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 3), (5, 3), (1, 3)]
    # node 6: dangling (appears only as dst via 3->6)
    edges.append((3, 6))
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.rank for r in pagerank(df, iterations=8, damping=0.85).collect()}

    # independent model
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    out = {}
    for s, d in set(edges):
        out.setdefault(s, set()).add(d)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(8):
        dangling = sum(rank[v] for v in nodes if v not in out)
        new = {}
        for v in nodes:
            in_mass = sum(
                rank[u] / len(out[u]) for u in nodes if u in out and v in out[u]
            )
            new[v] = (1 - 0.85) / n + 0.85 * (dangling / n + in_mass)
        rank = new
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - rank[v]) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved


def test_quantized_dot_tracks_true_cosine(spark):
    """est_cos = qdot/127^2 stays within the scalar-quantization error
    envelope (~2·sqrt(d)/127) of the true cosine, and ranking is pure
    integer arithmetic (bit-deterministic)."""
    import math
    import random

    from aden_hive_fork_spark.operators.similarity import quantized_dot_topk

    rng = random.Random(3)
    dim = 64
    vecs = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(40)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    out = quantized_dot_topk(df, [0], k=10).collect()

    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return sum(x * y for x, y in zip(a, b)) / (na * nb)

    bound = 2.0 * math.sqrt(dim) / 127.0
    for r in out:
        true = cos(vecs[0], vecs[r.id])
        assert abs(r.qdot / (127.0 * 127.0) - true) < bound
    # deterministic across runs
    again = quantized_dot_topk(df, [0], k=10).collect()
    assert [(r.id, r.qdot) for r in out] == [(r.id, r.qdot) for r in again]


def test_pagerank_empty_graph(spark):
    from aden_hive_fork_spark.operators.graph_rank import pagerank

    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty, iterations=3).collect() == []


def test_exact_dedup_tied_order_keeps_exactly_one(spark):
    """Contract: exactly one survivor per key even when rows tie on
    (key, order_col) — the tie-break walks the remaining columns."""
    df = spark.createDataFrame(
        [(1, 10, "b"), (1, 10, "a"), (1, 10, "a"), (2, 7, "z")],
        "k long, ord long, payload string",
    )
    out = exact_dedup(df, ["k"], "ord").orderBy("k").collect()
    assert [(r.k, r.ord, r.payload) for r in out] == [(1, 10, "a"), (2, 7, "z")]


def test_no_module_level_dataframe_caches(spark):
    """r13: the round-3-era inverted-index persist LRU (_INV_CACHE)
    was cross-invocation result caching — removed in favour of a
    per-invocation localCheckpoint. Pin that no module-level
    DataFrame cache comes back, and that the index-backed operator
    still produces the right pairs per invocation."""
    import inspect

    from aden_hive_fork_spark.operators import dedup as dmod

    assert not hasattr(dmod, "_INV_CACHE")
    assert not hasattr(dmod, "_cached_inverted_index")
    assert ".persist(" not in inspect.getsource(dmod)

    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c d e f"),
            (3, "x y z w q r"),
        ],
        "doc_id long, text string",
    )
    pairs = dmod.ngram_jaccard_pairs(
        df, "doc_id", "text", k=3, threshold=0.5
    ).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in pairs] == [(1, 2, 1.0)]


def test_quantize_zero_norm_embedding_is_all_zero(spark):
    from aden_hive_fork_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [3.0, 4.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r.id: r.qvec for r in quantize_embeddings(df).collect()}
    assert out[1] == [0, 0, 0]  # no null/NaN components
    assert out[2] == [76, 102, 0]  # round(127 * [0.6, 0.8, 0])


def test_pagerank_restores_checkpoint_dir(spark, tmp_path):
    from aden_hive_fork_spark.operators.graph_rank import pagerank

    sc = spark.sparkContext
    sc.setCheckpointDir(str(tmp_path / "prior_ckpt"))
    # Spark resolves the dir to <path>/<uuid>; capture the resolved form
    prior_resolved = sc._jsc.sc().getCheckpointDir().get()
    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    pagerank(edges, iterations=2, checkpoint_dir=str(tmp_path / "pr_ckpt"))
    cur = sc._jsc.sc().getCheckpointDir()
    # setCheckpointDir always nests a fresh uuid, so 'restored'
    # means: subsequent checkpoints land back under the caller's
    # prior tree, not in pagerank's dir.
    assert cur.isDefined() and cur.get().startswith(prior_resolved)


def test_triangle_count_hand_graphs(spark):
    from aden_hive_fork_spark.operators.graph_rank import triangle_count

    def tri(edges):
        df = spark.createDataFrame(edges, ["src", "dst"])
        return triangle_count(df).collect()[0].asDict()

    # K4: 4 triangles, 6 edges (given with mixed orientations + dup)
    k4 = [(1, 2), (1, 3), (1, 4), (3, 2), (2, 4), (4, 3), (2, 1)]
    assert tri(k4) == {"n_nodes": 4, "n_edges": 6, "n_triangles": 4}
    # path graph: none
    assert tri([(1, 2), (2, 3), (3, 4)])["n_triangles"] == 0
    # star hub: none (orientation must not explode or miscount)
    star = [(0, i) for i in range(1, 8)]
    assert tri(star) == {"n_nodes": 8, "n_edges": 7, "n_triangles": 0}
    # triangle + pendant; self-loops dropped
    assert tri([(1, 2), (2, 3), (1, 3), (3, 4), (4, 4)]) == {
        "n_nodes": 4, "n_edges": 4, "n_triangles": 1
    }
