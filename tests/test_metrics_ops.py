"""Classifier-eval metrics, PSI drift, bootstrap uplift — unit
semantics against hand values (suite q251-q255 covers the
cross-engine hash contract)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _scored(spark, rows):
    return spark.createDataFrame(rows, "s double, y boolean")


def test_roc_auc_perfect_and_random(spark):
    from aden_hive_fork_spark.operators.metrics import roc_auc

    perfect = _scored(
        spark, [(0.1, False), (0.2, False), (0.8, True), (0.9, True)]
    )
    r = roc_auc(perfect, "s", "y").collect()[0]
    assert (r["n_pos"], r["n_neg"], r["auc"]) == (2, 2, 1.0)
    inverted = _scored(
        spark, [(0.9, False), (0.8, False), (0.2, True), (0.1, True)]
    )
    assert roc_auc(inverted, "s", "y").collect()[0]["auc"] == 0.0


def test_roc_auc_ties_average_ranks(spark):
    from aden_hive_fork_spark.operators.metrics import roc_auc

    # one tie straddling the classes: sklearn roc_auc_score gives 0.875
    df = _scored(
        spark, [(0.1, False), (0.5, False), (0.5, True), (0.9, True)]
    )
    assert roc_auc(df, "s", "y").collect()[0]["auc"] == 0.875


def test_roc_auc_null_on_single_class(spark):
    from aden_hive_fork_spark.operators.metrics import roc_auc

    df = _scored(spark, [(0.1, True), (0.9, True)])
    assert roc_auc(df, "s", "y").collect()[0]["auc"] is None


def test_log_loss_hand_value_and_partition_stability(spark):
    from aden_hive_fork_spark.operators.metrics import log_loss

    rows = [(0.9, True), (0.2, False), (0.7, True), (0.4, False)]
    df = _scored(spark, rows)
    expect = -sum(
        math.log(p) if y else math.log(1 - p) for p, y in rows
    ) / len(rows)
    r = log_loss(df, "s", "y").collect()[0]
    assert abs(r["logloss"] - expect) < 1e-6
    r2 = log_loss(df.repartition(7), "s", "y").collect()[0]
    assert r["logloss"] == r2["logloss"]


def test_pr_at_thresholds_hand_counts(spark):
    from aden_hive_fork_spark.operators.metrics import pr_at_thresholds

    rows = [(0.9, True), (0.8, False), (0.6, True), (0.3, False), (0.2, True)]
    df = _scored(spark, rows)
    out = {
        r["threshold"]: r
        for r in pr_at_thresholds(df, "s", "y", [0.5, 0.95]).collect()
    }
    r5 = out[0.5]
    assert (r5["tp"], r5["fp"], r5["fn"]) == (2, 1, 1)
    assert abs(r5["precision"] - 2 / 3) < 1e-6
    assert abs(r5["recall"] - 2 / 3) < 1e-6
    r95 = out[0.95]
    assert (r95["tp"], r95["fp"], r95["fn"]) == (0, 0, 3)
    assert r95["precision"] is None and r95["recall"] == 0.0


def test_calibration_bins_perfectly_calibrated(spark):
    from aden_hive_fork_spark.operators.metrics import calibration_bins

    # score 0.25 -> 25% positive, score 0.75 -> 75% positive
    rows = [(0.25, i % 4 == 0) for i in range(40)] + [
        (0.75, i % 4 != 0) for i in range(40)
    ]
    df = _scored(spark, rows)
    out = calibration_bins(df, "s", "y", n_bins=2).collect()
    for r in out:
        assert abs(r["mean_score"] - r["pos_rate"]) < 1e-9


def test_psi_drift_identical_distributions_zero(spark):
    from aden_hive_fork_spark.operators.quality import psi_drift

    rows = [("ref", float(i % 50)) for i in range(500)] + [
        ("cur", float(i % 50)) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "per string, v double")
    out = psi_drift(df, "v", "per", "ref", "cur", n_bins=5).collect()
    assert all(r["psi"] == 0.0 for r in out)
    assert all(abs(r["p"] - r["q"]) < 1e-9 for r in out)


def test_psi_drift_detects_shift(spark):
    from aden_hive_fork_spark.operators.quality import psi_drift

    rows = [("ref", float(i % 100)) for i in range(1000)] + [
        ("cur", float(50 + i % 100)) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "per string, v double")
    out = psi_drift(df, "v", "per", "ref", "cur", n_bins=10).collect()
    assert out[0]["psi"] > 0.25  # a half-range shift is a big drift


def test_bootstrap_diff_ci_brackets_true_uplift(spark):
    from aden_hive_fork_spark.operators.bootstrap import (
        poisson_bootstrap_diff_ci,
    )

    rows = [(i, "a", 100.0 + (i * 13) % 20) for i in range(300)] + [
        (i + 1000, "b", 90.0 + (i * 7) % 20) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id bigint, arm string, x double")
    r = poisson_bootstrap_diff_ci(
        df, "id", "x", "arm", "a", "b", replicates=41
    ).collect()[0]
    assert r["n_a"] == 300 and r["n_b"] == 300
    assert r["ci_lo"] <= r["diff"] <= r["ci_hi"]
    assert r["diff"] > 5.0  # true uplift is ~10
    assert r["ci_lo"] > 0.0  # clearly separated arms


def test_conformal_coverage_on_linear_data(spark):
    from aden_hive_fork_spark.operators.conformal import (
        split_conformal_linear,
    )

    # y = 2x + noise bounded by ±3: q_hat must be <= 3 and coverage
    # on the test split must be high (the band contains the truth)
    rows = [
        (i, float(i % 100), 2.0 * (i % 100) + ((i * 37) % 7 - 3))
        for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "k bigint, x double, y double")
    r = split_conformal_linear(df, "k", "x", "y", alpha=0.1).collect()[0]
    assert r["n_train"] + r["n_cal"] + r["n_test"] == 1000
    assert 0.0 < r["q_hat"] <= 3.5
    assert r["coverage"] >= 0.85
    assert abs(r["slope"] - 2.0) < 0.1


def test_conformal_rejects_no_test_split(spark):
    import pytest as _pytest

    from aden_hive_fork_spark.operators.conformal import (
        split_conformal_linear,
    )

    df = spark.createDataFrame([(1, 1.0, 1.0)], "k bigint, x double, y double")
    with _pytest.raises(ValueError):
        split_conformal_linear(df, "k", "x", "y", train_pct=80, cal_pct=20)


def test_randomization_test_detects_separation(spark):
    from aden_hive_fork_spark.operators.bootstrap import (
        randomization_test_diff,
    )

    # hugely separated arms: p-value at its add-one floor
    rows = [(i, "a", 100.0 + i % 5) for i in range(200)] + [
        (i + 1000, "b", 10.0 + i % 5) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id bigint, arm string, x double")
    r = randomization_test_diff(
        df, "id", "x", "arm", "a", "b", replicates=99
    ).collect()[0]
    assert r["diff_obs"] == 90.0
    assert r["p_value"] == round(1.0 / (r["n_replicates"] + 1), 6)


def test_randomization_test_null_effect_large_p(spark):
    from aden_hive_fork_spark.operators.bootstrap import (
        randomization_test_diff,
    )

    # identical distributions split arbitrarily: p should be large
    rows = [
        (i, "a" if i % 2 == 0 else "b", float((i // 2) % 10))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id bigint, arm string, x double")
    r = randomization_test_diff(
        df, "id", "x", "arm", "a", "b", replicates=99
    ).collect()[0]
    assert r["p_value"] > 0.2


def test_local_clustering_hand_graph(spark):
    from aden_hive_fork_spark.operators.graph_rank import local_clustering

    # K4 on {1,2,3,4} plus pendant 5-1: every K4 node is in 3
    # triangles; node 1 has deg 4 (3 tri of 6 pairs -> lcc 0.5)
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(k4 + [(1, 5)], "src long, dst long")
    out = {r["id"]: r for r in local_clustering(edges).collect()}
    assert out[1]["triangles"] == 3 and out[1]["deg"] == 4
    assert out[1]["lcc"] == 0.5
    for v in (2, 3, 4):
        assert out[v]["triangles"] == 3 and out[v]["lcc"] == 1.0
    assert out[5]["triangles"] == 0 and out[5]["lcc"] is None


def test_power_iteration_matches_numpy_pc1(spark):
    import numpy as np

    from aden_hive_fork_spark.operators.pca import power_iteration_pc1

    rng = [(i * 37 % 17, i * 53 % 13, i * 29 % 11) for i in range(60)]
    data = [
        (i, [(a - 8.0) / 10.0, (b - 6.0) / 10.0, (a - 8.0) / 10.0 * 0.9 + (c - 5.0) / 50.0])
        for i, (a, b, c) in enumerate(rng)
    ]
    df = spark.createDataFrame(data, "vec_id int, embedding array<double>")
    v, lam = power_iteration_pc1(df, "embedding", iters=25)
    m = np.cov(np.array([r[1] for r in data]).T, ddof=1)
    vals, vecs = np.linalg.eigh(m)
    top = vecs[:, int(np.argmax(vals))]
    pivot = int(np.argmax(np.abs(top)))
    if top[pivot] < 0:
        top = -top
    assert abs(lam - float(np.max(vals))) < 1e-2
    assert max(abs(a - b) for a, b in zip(v, top)) < 1e-2


def test_log_rank_identical_arms_zero(spark):
    from aden_hive_fork_spark.operators.survival import log_rank

    # identical survival in both arms: O-E exactly 0
    rows = []
    for g in ("a", "b"):
        for t, ev in [(1, 1), (2, 1), (3, 0), (4, 1), (5, 0)]:
            rows.append((g, t, ev))
    df = spark.createDataFrame(rows, "arm string, t int, ev int")
    r = log_rank(df, "t", "ev", "arm", "a", "b").collect()[0]
    assert r["n_a"] == 5 and r["n_b"] == 5 and r["n_events"] == 6
    assert r["o_minus_e"] == 0.0
    assert r["z"] == 0.0


def test_log_rank_hand_value(spark):
    from aden_hive_fork_spark.operators.survival import log_rank

    # arm a dies at t=1,2; arm b dies at t=3,4 (all events)
    rows = [("a", 1, 1), ("a", 2, 1), ("b", 3, 1), ("b", 4, 1)]
    df = spark.createDataFrame(rows, "arm string, t int, ev int")
    r = log_rank(df, "t", "ev", "arm", "a", "b").collect()[0]
    # t=1: n=4, na=2, d=1, E=0.5, V=0.25; t=2: n=3, na=1, E=1/3, V=2/9
    # t=3: n=2, na=0 -> E=0, V=0; t=4: n=1 -> V=0 (skipped via n>1)
    oe = (1 - 0.5) + (1 - 1 / 3) + 0.0 + 0.0
    v = 0.25 + 2 / 9
    assert abs(r["o_minus_e"] - oe) < 1e-6
    assert abs(r["var_o"] - v) < 1e-6


def test_ndcg_perfect_and_inverted(spark):
    from aden_hive_fork_spark.operators.metrics import ndcg_at_k

    rel = spark.createDataFrame(
        [(1, 10, 3), (1, 11, 2), (1, 12, 1)], "qid int, doc_id int, rel int"
    )
    perfect = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "qid int, doc_id int, rank int",
    )
    r = ndcg_at_k(perfect, rel, k=3).collect()[0]
    assert r["ndcg"] == 1.0
    inverted = spark.createDataFrame(
        [(1, 12, 1), (1, 11, 2), (1, 10, 3)],
        "qid int, doc_id int, rank int",
    )
    r2 = ndcg_at_k(inverted, rel, k=3).collect()[0]
    assert 0.0 < r2["ndcg"] < 1.0
    import math

    dcg = 1 / math.log2(2) + 2 / math.log2(3) + 3 / math.log2(4)
    idcg = 3 / math.log2(2) + 2 / math.log2(3) + 1 / math.log2(4)
    assert abs(r2["ndcg"] - dcg / idcg) < 1e-5


def test_ndcg_null_without_relevant_docs(spark):
    from aden_hive_fork_spark.operators.metrics import ndcg_at_k

    rel = spark.createDataFrame(
        [(1, 99, 0)], "qid int, doc_id int, rel int"
    )
    ranking = spark.createDataFrame(
        [(1, 10, 1)], "qid int, doc_id int, rank int"
    )
    assert ndcg_at_k(ranking, rel, k=3).collect()[0]["ndcg"] is None


def test_decision_stump_separable_split(spark):
    from aden_hive_fork_spark.operators.encoding import decision_stump

    # y perfectly separable at x = 50: best cut must land between
    rows = [(float(i), i >= 50) for i in range(100)]
    df = spark.createDataFrame(rows, "x double, y boolean")
    r = decision_stump(df, ["x"], "y", n_cuts=10).collect()[0]
    assert r["feature"] == "x"
    assert 40.0 <= r["best_cut"] < 50.0  # deciles of 0..99
    assert r["gini"] <= 0.1
    assert r["pos_left"] == 0 and r["pos_right"] == 50


def test_hits_bipartite_hand_graph(spark):
    from aden_hive_fork_spark.operators.graph_rank import hits

    # star: hub 1 points to authorities 10, 11, 12; hub 2 -> 10
    edges = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 10)], "src long, dst long"
    )
    out = {r["id"]: r for r in hits(edges, iters=4).collect()}
    # node 10 has two in-links: the top authority
    assert out[10]["authority"] > out[11]["authority"]
    assert out[11]["authority"] == out[12]["authority"]
    # hub 1 links to more/better authorities than hub 2
    assert out[1]["hub"] > out[2]["hub"]
    # authorities have no out-edges -> zero hub score
    assert out[10]["hub"] == 0.0 and out[1]["authority"] == 0.0
    # L2 normalization: each side's norm ~ 1
    a2 = sum(r["authority"] ** 2 for r in out.values())
    h2 = sum(r["hub"] ** 2 for r in out.values())
    assert abs(a2 - 1.0) < 1e-6 and abs(h2 - 1.0) < 1e-6


def test_als_rank1_recovers_rank1_structure(spark):
    from aden_hive_fork_spark.operators.baskets import als_rank1

    # exactly rank-1 matrix x_ui = a_u * b_i: one round already fits
    # it perfectly; factor RATIOS must match b (scale is arbitrary)
    a = {1: 2.0, 2: 5.0, 3: 1.0}
    b = {10: 3.0, 11: 1.0, 12: 4.0}
    rows = [(u, i, a[u] * b[i]) for u in a for i in b]
    df = spark.createDataFrame(rows, "u long, i long, x double")
    users, items = als_rank1(df, "u", "i", "x", iters=3)
    iv = {r["id"]: r["score"] for r in items.collect()}
    uv = {r["id"]: r["score"] for r in users.collect()}
    assert abs(iv[10] / iv[11] - 3.0) < 1e-6
    assert abs(iv[12] / iv[11] - 4.0) < 1e-6
    assert abs(uv[2] / uv[1] - 2.5) < 1e-6
    # reconstruction is exact on a rank-1 matrix
    for u in a:
        for i in b:
            assert abs(uv[u] * iv[i] - a[u] * b[i]) < 1e-4


def test_kruskal_wallis_matches_scipy_formula(spark):
    from aden_hive_fork_spark.operators.stats import kruskal_wallis

    groups = {"a": [1.0, 2.0, 3.0], "b": [4.0, 5.0, 6.0], "c": [7.0, 8.0, 9.0]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    r = kruskal_wallis(df, "v", "g").collect()[0]
    # no ties: H = 12/(N(N+1)) * sum(Rg^2/ng) - 3(N+1)
    ranks = {"a": [1, 2, 3], "b": [4, 5, 6], "c": [7, 8, 9]}
    n = 9
    t1 = sum(sum(rs) ** 2 / len(rs) for rs in ranks.values())
    h = 12.0 / (n * (n + 1)) * t1 - 3.0 * (n + 1)
    assert r["k_groups"] == 3 and r["n_rows"] == 9
    assert abs(r["h_stat"] - h) < 1e-6


def test_kruskal_wallis_null_on_constant_values(spark):
    from aden_hive_fork_spark.operators.stats import kruskal_wallis

    df = spark.createDataFrame(
        [("a", 5.0), ("b", 5.0), ("a", 5.0)], "g string, v double"
    )
    assert kruskal_wallis(df, "v", "g").collect()[0]["h_stat"] is None
