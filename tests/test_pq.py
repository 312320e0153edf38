"""operators/similarity PQ tier: encode determinism (literal-HOF
write-side form ≡ the relational join form inside ADC), recall pins
for the shortlist+exact-rerank pattern, tie-breaks, and plan guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")


def test_encode_forms_agree(spark, emb):
    """pq_encode (literal/HOF, the write-side pass) and the join
    formulation inside pq_adc_topk must produce the SAME codes — a
    differential between two independent implementations of the
    argmin."""
    from aden_hive_fork_spark.operators.similarity import (
        _xq_expr,
        pq_codebooks_md5,
        pq_encode,
    )
    from pyspark.sql.window import Window

    m, k = 8, 16
    sample = emb.filter(F.col("vec_id") < 40)
    codebooks = pq_codebooks_md5(emb, m=m, k=k)
    d_sub = len(codebooks[0][0])
    lit_codes = {
        r["id"]: list(r["codes"])
        for r in pq_encode(sample, codebooks).collect()
    }
    cb_rows = [
        (j, h, j * d_sub + d + 1, int(codebooks[j][h][d]))
        for j in range(m)
        for h in range(k)
        for d in range(d_sub)
    ]
    cb = spark.createDataFrame(cb_rows, "j int, h int, i int, c long")
    xdim = sample.select(
        F.col("vec_id").alias("id"),
        F.posexplode(F.expr(_xq_expr("embedding"))).alias("_pos", "x"),
    ).select("id", (F.col("_pos") + 1).alias("i"), "x")
    enc = (
        xdim.join(cb, "i")
        .groupBy("id", "j", "h")
        .agg(
            F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")))
            .cast("long").alias("d")
        )
    )
    wj = Window.partitionBy("id", "j").orderBy(F.asc("d"), F.asc("h"))
    join_codes: dict[int, dict[int, int]] = {}
    for r in (
        enc.withColumn("_rn", F.row_number().over(wj))
        .filter(F.col("_rn") == 1)
        .collect()
    ):
        join_codes.setdefault(r["id"], {})[r["j"]] = r["h"]
    assert set(lit_codes) == set(join_codes)
    for vid, codes in lit_codes.items():
        assert codes == [join_codes[vid][j] for j in range(m)], vid


def test_rerank_recall_pin(spark, emb):
    """Deterministic recall of the PQ shortlist + exact re-rank vs
    brute-force exact Euclidean top-10 (m=16, shortlist=100 over the
    500-vector sf0.001 corpus — measured 9/6/6/8; isotropic synthetic
    data is PQ's worst case, real clustered embeddings do better)."""
    from aden_hive_fork_spark.operators.similarity import pq_rerank_topk

    rows = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    out = pq_rerank_topk(emb, [0, 1, 2, 3], k_nn=10, shortlist=100, m=16)
    got: dict[int, set[int]] = {}
    for r in out.collect():
        got.setdefault(r["query_id"], set()).add(r["id"])
    total = 0
    for qid in (0, 1, 2, 3):
        q = rows[qid]
        exact = sorted(
            (sum((a - b) ** 2 for a, b in zip(v, q)), vid)
            for vid, v in rows.items()
            if vid != qid
        )[:10]
        overlap = len(got[qid] & {vid for _, vid in exact})
        assert overlap >= 6, (qid, overlap)
        total += overlap
    assert total >= 29  # 9+6+6+8 measured; deterministic


def test_rerank_orders_by_exact_distance(spark, emb):
    """Within the returned top-k the ordering must be the EXACT
    integer distance (approximate pruning, exact ordering)."""
    from aden_hive_fork_spark.operators.similarity import pq_rerank_topk

    out = pq_rerank_topk(emb, [0], k_nn=10, shortlist=100, m=16).collect()
    dists = [r["dist"] for r in sorted(out, key=lambda r: r["rank"])]
    assert dists == sorted(dists)
    assert all(r["id"] != 0 for r in out)  # self excluded


def test_codebook_validation(spark, emb):
    from aden_hive_fork_spark.operators.similarity import pq_codebooks_md5

    with pytest.raises(ValueError, match="must divide"):
        pq_codebooks_md5(emb, m=7)
    with pytest.raises(ValueError, match="at least"):
        pq_codebooks_md5(emb.limit(3), m=8, k=16)


def test_adc_plan_broadcasts_dimensions(spark, emb):
    from aden_hive_fork_spark.operators.similarity import pq_adc_topk

    out = pq_adc_topk(emb, [0, 1], k_nn=5, m=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # centroid + ADC tables


def test_kmeans_refined_codebooks_plug_in(spark, emb):
    """pq_codebooks_kmeans returns the same shape (m x k x d_sub ints
    on the grid) and plugs into the rerank path unchanged; refinement
    must not REGRESS recall vs the sampled codebooks for the pinned
    query (isotropic data caps the upside, but the plumbing and the
    non-regression are what this pins)."""
    from aden_hive_fork_spark.operators.similarity import (
        pq_codebooks_kmeans,
        pq_rerank_topk,
    )

    m = 8
    books = pq_codebooks_kmeans(emb, m=m, k=16, n_iter=1)
    assert len(books) == m and len(books[0]) == 16
    assert all(isinstance(v, int) for v in books[0][0])

    rows = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    q = rows[0]
    exact_ids = {
        vid
        for _, vid in sorted(
            (sum((a - b) ** 2 for a, b in zip(v, q)), vid)
            for vid, v in rows.items()
            if vid != 0
        )[:10]
    }
    sampled = {
        r["id"]
        for r in pq_rerank_topk(
            emb, [0], k_nn=10, shortlist=100, m=m
        ).collect()
    }
    refined = {
        r["id"]
        for r in pq_rerank_topk(
            emb, [0], k_nn=10, shortlist=100, m=m, codebooks=books
        ).collect()
    }
    assert len(refined & exact_ids) >= len(sampled & exact_ids)


def test_ivf_pq_composition_recall_pin(spark, emb):
    """IVF-PQ: probing 4 of 16 cells prunes ~75% of the corpus, so
    recall must sit at-or-below the unpruned PQ rerank for the same
    codebooks (7/4/5/5 measured on the isotropic fixture) while every
    returned distance stays the exact integer Euclidean."""
    from aden_hive_fork_spark.operators.similarity import ivf_pq_topk

    rows = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    out = ivf_pq_topk(
        emb, [0, 1, 2, 3], k_nn=10, num_cells=16, n_probe=4, m=16,
        shortlist=100,
    )
    got: dict[int, list] = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append(r)
    total = 0
    for qid in (0, 1, 2, 3):
        q = rows[qid]
        exact = sorted(
            (sum((a - b) ** 2 for a, b in zip(v, q)), vid)
            for vid, v in rows.items()
            if vid != qid
        )[:10]
        ids = {r["id"] for r in got[qid]}
        overlap = len(ids & {vid for _, vid in exact})
        assert overlap >= 4, (qid, overlap)
        total += overlap
        # returned dists are the exact integers, ordered
        dists = [r["dist"] for r in sorted(got[qid], key=lambda r: r["rank"])]
        assert dists == sorted(dists)
    assert total >= 21  # 7+4+5+5 measured; deterministic


def test_ivf_pq_no_cartesian_broadcast_dims(spark, emb):
    from aden_hive_fork_spark.operators.similarity import ivf_pq_topk

    out = ivf_pq_topk(emb, [0], k_nn=5, num_cells=16, n_probe=4, m=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def _recall_at_10(rows: dict, out) -> int:
    got: dict[int, set] = {}
    for r in out.collect():
        got.setdefault(r["query_id"], set()).add(r["id"])
    total = 0
    for qid in (0, 1, 2, 3):
        q = rows[qid]
        exact = {
            vid
            for _, vid in sorted(
                (sum((a - b) ** 2 for a, b in zip(v, q)), vid)
                for vid, v in rows.items()
                if vid != qid
            )[:10]
        }
        total += len(got.get(qid, set()) & exact)
    return total


def test_ivf_pq_residual_recall_not_below_md5_tier(spark, emb):
    """The FAISS-default operating point (q339: Lloyd-refined
    residual codebooks) must never recall WORSE than the md5-sampled
    tier at the same (cells, probes, shortlist) — on the isotropic
    fixture recall is probe-bound so they tie at 21/40; the clustered
    fixture below is where refinement separates."""
    from aden_hive_fork_spark.operators.similarity import (
        ivf_pq_residual_topk,
        ivf_pq_topk,
    )

    rows = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    kw = dict(k_nn=10, num_cells=16, n_probe=4, m=16, shortlist=100)
    md5_total = _recall_at_10(rows, ivf_pq_topk(emb, [0, 1, 2, 3], **kw))
    res_total = _recall_at_10(
        rows, ivf_pq_residual_topk(emb, [0, 1, 2, 3], n_iter=2, **kw)
    )
    assert res_total >= md5_total  # measured 21 == 21 (probe-bound)
    assert res_total >= 21


def test_ivf_pq_residual_beats_md5_on_clustered_data(spark):
    """Where the data HAS cluster structure (the case residual coding
    exists for), the refined tier must strictly beat the raw-vector
    md5 codebooks under a tight shortlist: PQ on raw vectors wastes
    its precision re-encoding the cluster offset that the coarse
    quantizer already captured. Measured 38 vs 34 of 40."""
    from aden_hive_fork_spark.operators.similarity import (
        ivf_pq_residual_topk,
        ivf_pq_topk,
    )

    data = []
    vid = 0
    for c in range(20):
        center = [((c * 37 + d * 13) % 200 - 100) / 100.0 for d in range(64)]
        for _ in range(40):
            v = [
                center[d] + (((vid * 31 + d * 7) % 21) - 10) / 1000.0
                for d in range(64)
            ]
            data.append((vid, [float(x) for x in v]))
            vid += 1
    emb2 = spark.createDataFrame(
        data, "vec_id bigint, embedding array<float>"
    )
    rows = {r[0]: r[1] for r in data}
    kw = dict(k_nn=10, num_cells=16, n_probe=4, m=16, shortlist=30)
    md5_total = _recall_at_10(rows, ivf_pq_topk(emb2, [0, 1, 2, 3], **kw))
    res_total = _recall_at_10(
        rows, ivf_pq_residual_topk(emb2, [0, 1, 2, 3], n_iter=2, **kw)
    )
    assert res_total > md5_total, (res_total, md5_total)
    assert res_total >= 36  # measured 38


def test_half_away_rounding_contract():
    """_half_away == DuckDB CAST(double AS BIGINT) on ties — the
    contract that makes the trained codebooks replayable (Python's
    int(round()) is banker's and diverges at x.5)."""
    import duckdb

    from aden_hive_fork_spark.operators.similarity import _half_away

    cases = [2.5, 3.5, -2.5, -3.5, 0.5, -0.5, 2.4999, 1e8 + 0.5]
    got = [_half_away(c) for c in cases]
    want = [
        r[0]
        for c in cases
        for r in duckdb.sql(f"SELECT CAST({c!r} AS BIGINT)").fetchall()
    ]
    assert got == want


def test_quantize_kernel_matches_hof_exactly(spark):
    """The Arrow quantize kernel (round 11) must equal the original
    JVM higher-order-function expression BIT-FOR-BIT — the norm
    accumulates dim-sequentially (numpy pairwise sum would change the
    IEEE sequence), the round is half-away, zero-norm rows quantize
    to zeros, NULL embeddings stay NULL."""
    from aden_hive_fork_spark.operators.similarity import (
        quantize_embeddings,
        quantize_embeddings_hof,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = {
        r["id"]: (list(r["qvec"]) if r["qvec"] is not None else None)
        for r in quantize_embeddings(emb).collect()
    }
    b = {
        r["id"]: (list(r["qvec"]) if r["qvec"] is not None else None)
        for r in quantize_embeddings_hof(emb).collect()
    }
    assert a == b and len(a) > 0
    edge = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, None), (3, [1.5, -2.5, 0.5])],
        "vec_id bigint, embedding array<float>",
    )
    ka = [
        (r["id"], list(r["qvec"]) if r["qvec"] is not None else None)
        for r in quantize_embeddings(edge).orderBy("id").collect()
    ]
    assert ka == [(1, [0, 0, 0]), (2, None), (3, [64, -107, 21])]


def test_quantize_kernel_half_up_boundary(spark):
    """r = 0.49999999999999994 (largest double < 0.5): the fast path
    floor(abs+0.5) yields 1 (the IEEE sum r+0.5 rounds UP to 1.0) but
    Spark's F.round — HALF_UP on the shortest-decimal BigDecimal —
    yields 0. The kernel must side with Spark; this input is solved
    so that 127*x/nrm lands EXACTLY on that boundary double."""
    from aden_hive_fork_spark.operators.similarity import (
        quantize_embeddings,
        quantize_embeddings_hof,
    )

    emb = spark.createDataFrame(
        [(1, [0.012795374755288127, 3.25]),
         (2, [0.024606489914015626, 6.25])],
        "vec_id bigint, embedding array<double>",
    )
    k = {r["id"]: list(r["qvec"])
         for r in quantize_embeddings(emb).collect()}
    h = {r["id"]: list(r["qvec"])
         for r in quantize_embeddings_hof(emb).collect()}
    assert k == h
    assert k[1][0] == 0 and k[2][0] == 0  # not the fast-path 1


def test_pq_codes_kernel_matches_runtime_hof(spark):
    """r13: the Arrow encode kernel must be BIT-identical to the
    runtime-HOF form (kept as the differential reference) — same
    int64 sum-of-squares, same (distance asc, code asc) tie-break.
    Random grids plus a duplicate-codeword book to force real ties."""
    import random

    from pyspark.sql import functions as F

    from aden_hive_fork_spark.operators.similarity import (
        _pq_codes_kernel,
        _pq_codes_runtime,
    )

    rng = random.Random(99)
    m, k, d_sub = 4, 5, 3
    books = [
        [[rng.randint(-50, 50) for _ in range(d_sub)] for _ in range(k)]
        for _ in range(m)
    ]
    # force exact ties: codeword 3 duplicates codeword 1 in every
    # subspace — the argmin must pick the LOWER code (1)
    for j in range(m):
        books[j][3] = list(books[j][1])
    rows = [
        (i, [rng.randint(-60, 60) for _ in range(m * d_sub)])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, xq array<long>")
    kern = {
        (r["id"], r["j"]): r["h"]
        for r in _pq_codes_kernel(df, "xq", books).collect()
    }
    hof = {
        (r["id"], r["j"]): r["h"]
        for r in _pq_codes_runtime(df, "xq", books).collect()
    }
    assert kern == hof
    assert any(h == 1 for h in kern.values())  # ties were exercised
    assert not any(h == 3 for h in kern.values())  # never the dup
