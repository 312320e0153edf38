"""PCA invariants: covariance vs numpy, component orthonormality,
variance ordering, sign determinism, projection-variance identity."""

from __future__ import annotations

import math

import numpy as np
import pytest

from aden_hive_fork_spark.operators.pca import (
    embedding_covariance,
    pca_components,
    pca_project,
)


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.RandomState(7)
    # anisotropic cloud: variance concentrated along a known axis
    base = rng.randn(200, 4) * np.array([3.0, 1.0, 0.5, 0.1])
    rows = [(i, [float(x) for x in base[i]]) for i in range(200)]
    return spark.createDataFrame(rows, "vec_id int, embedding array<float>")


def test_covariance_matches_numpy(spark, emb_df):
    got = {
        (r["i"], r["j"]): r["cov"]
        for r in embedding_covariance(emb_df).collect()
    }
    data = np.array(
        [r["embedding"] for r in emb_df.orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    ref = np.cov(data, rowvar=False, ddof=1)
    assert len(got) == 4 * 5 / 2
    for (i, j), v in got.items():
        # float32 storage quantizes inputs; tolerance covers that
        assert abs(v - ref[i - 1, j - 1]) < 1e-4, (i, j)


def test_components_orthonormal_and_ordered(spark, emb_df):
    vals, comps = pca_components(emb_df, k=4)
    assert vals == sorted(vals, reverse=True)
    m = np.array(comps)
    gram = m @ m.T
    assert np.allclose(gram, np.eye(4), atol=1e-9)
    # dominant axis is e1 (variance 9 vs 1): |first comp| points there
    assert abs(comps[0][0]) > 0.99
    # sign convention: largest-|coordinate| positive
    for c in comps:
        assert c[int(np.argmax(np.abs(c)))] > 0


def test_projection_variance_equals_eigenvalue(spark, emb_df):
    vals, comps = pca_components(emb_df, k=2)
    proj = pca_project(emb_df, comps).select("pc1", "pc2").collect()
    p1 = [r["pc1"] for r in proj]
    p2 = [r["pc2"] for r in proj]

    def var(xs):
        mu = sum(xs) / len(xs)
        return sum((x - mu) ** 2 for x in xs) / (len(xs) - 1)

    # covariance is 6-decimal quantized before the eigensolve
    assert math.isclose(var(p1), vals[0], rel_tol=1e-3)
    assert math.isclose(var(p2), vals[1], rel_tol=1e-3)


def test_full_rank_projection_preserves_total_variance(spark, emb_df):
    vals, _ = pca_components(emb_df, k=4)
    cov_diag = {
        r["i"]: r["cov"]
        for r in embedding_covariance(emb_df).filter("i = j").collect()
    }
    assert math.isclose(sum(vals), sum(cov_diag.values()), rel_tol=1e-6)


def test_ragged_and_empty_raise(spark):
    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0])], "vec_id int, embedding array<float>"
    )
    with pytest.raises(ValueError, match="ragged"):
        embedding_covariance(ragged)
    empty = spark.createDataFrame([], "vec_id int, embedding array<float>")
    with pytest.raises(ValueError, match="no rows"):
        embedding_covariance(empty)


def test_k_validation(spark, emb_df):
    with pytest.raises(ValueError):
        pca_components(emb_df, k=0)
    with pytest.raises(ValueError):
        pca_components(emb_df, k=5)
