"""Round-6 statistics/ML-prep operators — unit semantics against
hand-computed values (suite q241-q250 covers the cross-engine hash
contract): Poisson bootstrap, Markov stationary, ANOVA, Holt,
seasonal decomposition, target encoding, feature hashing, Spearman,
CUPED, weighted SSSP."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_poisson1_weight_inverse_cdf(spark):
    from aden_hive_fork_spark.operators.bootstrap import (
        POISSON1_CDF,
        poisson1_weight,
    )

    # probe just below/above each threshold
    probes = []
    for k, c in enumerate(POISSON1_CDF):
        probes.append((c - 1e-12, k))
        probes.append((c + 1e-12, k + 1))
    df = spark.createDataFrame(probes, "u double, expect int")
    got = df.select("expect", poisson1_weight(F.col("u")).alias("w")).collect()
    for r in got:
        assert r["w"] == r["expect"]


def test_poisson_bootstrap_ci_brackets_mean(spark):
    from aden_hive_fork_spark.operators.bootstrap import (
        poisson_bootstrap_mean_ci,
    )

    rows = [(i, "g", float(100 + (i * 37) % 50)) for i in range(400)]
    df = spark.createDataFrame(rows, "id bigint, g string, x double")
    r = poisson_bootstrap_mean_ci(
        df, "id", "x", ["g"], replicates=41, lo_p=0.025, hi_p=0.975
    ).collect()[0]
    assert r["n_rows"] == 400 and r["n_replicates"] == 41
    assert r["ci_lo"] <= r["mean"] <= r["ci_hi"]
    # bootstrap spread of a 400-row mean of a ~[100,150) variable is
    # well under +-5
    assert r["ci_hi"] - r["ci_lo"] < 10.0


def test_poisson_bootstrap_rejects_fractional_percentile_index(spark):
    from aden_hive_fork_spark.operators.bootstrap import (
        poisson_bootstrap_mean_ci,
    )

    df = spark.createDataFrame([(1, "g", 1.0)], "id bigint, g string, x double")
    with pytest.raises(ValueError):
        poisson_bootstrap_mean_ci(df, "id", "x", ["g"], replicates=100)


def test_markov_transitions_rows_sum_to_one(spark):
    from aden_hive_fork_spark.operators.markov import event_transitions

    rows = []
    seq = ["a", "b", "a", "c", "a", "b", "c", "a"]
    for i, s in enumerate(seq):
        rows.append((1, i, i, s))
    df = spark.createDataFrame(rows, "u int, ts int, eid int, state string")
    t = event_transitions(df, "u", "ts", "state", "eid")
    sums = t.groupBy("src").agg(F.sum("p").alias("s")).collect()
    for r in sums:
        assert abs(r["s"] - 1.0) < 1e-12


def test_markov_stationary_two_state_equilibrium(spark):
    from aden_hive_fork_spark.operators.markov import (
        event_transitions,
        stationary_distribution,
    )

    # chain a->b always, b->a always: stationary = (0.5, 0.5)
    rows = [(1, i, i, "a" if i % 2 == 0 else "b") for i in range(40)]
    df = spark.createDataFrame(rows, "u int, ts int, eid int, state string")
    t = event_transitions(df, "u", "ts", "state", "eid")
    pi = {r["state"]: r["pi"] for r in stationary_distribution(t, 10).collect()}
    assert abs(pi["a"] - 0.5) < 1e-6 and abs(pi["b"] - 0.5) < 1e-6


def test_anova_f_matches_formula(spark):
    from aden_hive_fork_spark.operators.stats import anova_f

    groups = {"a": [1.0, 2.0, 3.0], "b": [2.0, 4.0, 6.0], "c": [5.0, 5.0, 8.0]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, x double")
    r = anova_f(df, "x", "g").collect()[0]
    allv = [v for vs in groups.values() for v in vs]
    gm = sum(allv) / len(allv)
    ssb = sum(len(vs) * (sum(vs) / len(vs) - gm) ** 2 for vs in groups.values())
    ssw = sum(
        (v - sum(vs) / len(vs)) ** 2 for vs in groups.values() for v in vs
    )
    f = (ssb / 2) / (ssw / 6)
    assert r["k_groups"] == 3 and r["n_rows"] == 9
    assert abs(r["f_stat"] - f) < 1e-5
    assert abs(r["eta_sq"] - ssb / (ssb + ssw)) < 1e-5


def test_anova_f_null_when_single_group(spark):
    from aden_hive_fork_spark.operators.stats import anova_f

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0)], "g string, x double"
    )
    r = anova_f(df, "x", "g").collect()[0]
    assert r["f_stat"] is None


def test_holt_linear_matches_manual_recursion(spark):
    from aden_hive_fork_spark.operators.timeseries import holt_linear

    xs = [10.0, 12.0, 11.0, 15.0, 14.0]
    df = spark.createDataFrame(
        [(1, i, x) for i, x in enumerate(xs)], "k int, t int, x double"
    )
    r = holt_linear(df, ["k"], "t", "x", alpha=0.3, beta=0.2).collect()[0]
    l, b = xs[0], 0.0
    for x in xs[1:]:
        l1 = 0.3 * x + 0.7 * (l + b)
        b1 = 0.2 * (l1 - l) + 0.8 * b
        l, b = l1, b1
    assert r["n_obs"] == 5
    assert abs(r["level"] - l) < 1e-4 and abs(r["trend"] - b) < 1e-4
    assert abs(r["fc_2"] - (l + 2 * b)) < 1e-3


def test_seasonal_decompose_flat_series_zero_seasonal(spark):
    import datetime as dt

    from aden_hive_fork_spark.operators.timeseries import seasonal_decompose

    base = dt.date(2024, 1, 1)
    rows = [
        ("g", base + dt.timedelta(days=i), 100.0) for i in range(56)
    ]
    df = spark.createDataFrame(rows, "g string, d date, v double")
    out = seasonal_decompose(df, ["g"], "d", "v").collect()
    assert len(out) == 7
    for r in out:
        assert abs(r["seasonal"]) < 1e-9


def test_target_encode_loo_hand_value(spark):
    from aden_hive_fork_spark.operators.encoding import target_encode_loo

    # cat A targets [10, 20, 30]; global mean over all 5 rows = 22
    rows = [
        (1, "A", 10.0),
        (2, "A", 20.0),
        (3, "A", 30.0),
        (4, "B", 20.0),
        (5, "B", 30.0),
    ]
    df = spark.createDataFrame(rows, "id int, c string, y double")
    out = {
        r["id"]: r["te_loo"]
        for r in target_encode_loo(df, "c", "y", smoothing=2.0).collect()
    }
    mu = 110.0 / 5.0
    expect_1 = (60.0 - 10.0 + 2.0 * mu) / (3.0 - 1.0 + 2.0)
    assert abs(out[1] - expect_1) < 1e-9
    # leave-one-out: rows of the same category with different targets
    # get different encodings
    assert out[1] != out[3]


def test_feature_hash_shape_and_determinism(spark):
    from aden_hive_fork_spark.operators.encoding import feature_hash

    docs = [(1, "alpha beta gamma alpha"), (2, "delta  epsilon")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    a = {r["doc_id"]: r for r in feature_hash(df, "doc_id", "text", k=8).collect()}
    assert a[1]["n_tokens"] == 4 and a[2]["n_tokens"] == 2
    assert len(a[1]["features"]) == 8
    # signed counts are bounded by token count
    assert sum(abs(v) for v in a[1]["features"]) <= 4
    b = {
        r["doc_id"]: r
        for r in feature_hash(
            df.repartition(5), "doc_id", "text", k=8
        ).collect()
    }
    assert a[1]["features"] == b[1]["features"]


def test_spearman_perfect_monotone_and_ties(spark):
    from aden_hive_fork_spark.operators.stats import spearman_corr

    mono = spark.createDataFrame(
        [(float(i), float(i * i)) for i in range(1, 9)], "x double, y double"
    )
    r = spearman_corr(mono, "x", "y").collect()[0]
    assert r["spearman_rho"] == 1.0
    rev = spark.createDataFrame(
        [(float(i), float(-i)) for i in range(1, 9)], "x double, y double"
    )
    assert spearman_corr(rev, "x", "y").collect()[0]["spearman_rho"] == -1.0
    # hand-checked tied case: x = [1,2,2,3], y = [1,3,2,4]
    tied = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 3.0), (2.0, 2.0), (3.0, 4.0)],
        "x double, y double",
    )
    rho = spearman_corr(tied, "x", "y").collect()[0]["spearman_rho"]
    # average ranks: rx = [1, 2.5, 2.5, 4], ry = [1, 3, 2, 4]
    rx, ry = [1.0, 2.5, 2.5, 4.0], [1.0, 3.0, 2.0, 4.0]
    n = 4
    mx, my = sum(rx) / n, sum(ry) / n
    cov = sum(a * b for a, b in zip(rx, ry)) / n - mx * my
    vx = sum(a * a for a in rx) / n - mx * mx
    vy = sum(b * b for b in ry) / n - my * my
    assert abs(rho - cov / math.sqrt(vx * vy)) < 1e-6


def test_cuped_constant_covariate_is_identity(spark):
    from aden_hive_fork_spark.operators.stats import cuped_adjust

    rows = [("t", 5.0, float(10 + i)) for i in range(4)] + [
        ("c", 5.0, float(20 + i)) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "arm string, x double, y double")
    out = {r["arm"]: r for r in cuped_adjust(df, "x", "y", "arm").collect()}
    for arm in ("t", "c"):
        assert out[arm]["mean_y_cuped"] == out[arm]["mean_y"]


def test_cuped_matches_hand_theta(spark):
    from aden_hive_fork_spark.operators.stats import cuped_adjust

    data = [("t", 1.0, 2.0), ("t", 2.0, 4.0), ("c", 3.0, 5.0), ("c", 4.0, 8.0)]
    df = spark.createDataFrame(data, "arm string, x double, y double")
    xs = [r[1] for r in data]
    ys = [r[2] for r in data]
    n = len(data)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    xbar = sx / n
    out = {r["arm"]: r for r in cuped_adjust(df, "x", "y", "arm").collect()}
    for arm in ("t", "c"):
        axs = [r[1] for r in data if r[0] == arm]
        ays = [r[2] for r in data if r[0] == arm]
        adj = [y - theta * (x - xbar) for x, y in zip(axs, ays)]
        assert abs(out[arm]["mean_y_cuped"] - sum(adj) / len(adj)) < 1e-4


def test_sssp_weighted_hand_graph(spark):
    from aden_hive_fork_spark.operators.graph_rank import sssp_weighted

    # 1 -2-> 2 -2-> 3 ; 1 -5-> 3 : shortest 1->3 is 4 via 2
    edges = spark.createDataFrame(
        [(1, 2, 2), (2, 3, 2), (1, 3, 5), (3, 4, 1)],
        "src long, dst long, w long",
    )
    seeds = spark.createDataFrame([(1,)], "id long")
    d = {
        r["id"]: r["dist"]
        for r in sssp_weighted(edges, seeds, rounds=3).collect()
    }
    assert d == {1: 0, 2: 2, 3: 4, 4: 5}


def test_sssp_unit_weights_equal_bfs_hops(spark):
    from aden_hive_fork_spark.operators.graph_rank import (
        bfs_hops,
        sssp_weighted,
    )

    e = [(1, 2), (2, 3), (3, 4), (1, 5), (5, 4), (9, 10)]
    edges = spark.createDataFrame(e, "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "id long")
    hops = {
        r["id"]: r["hops"]
        for r in bfs_hops(edges, seeds, max_hops=3).collect()
    }
    d = {
        r["id"]: r["dist"]
        for r in sssp_weighted(
            edges.withColumn("w", F.lit(1)), seeds, rounds=3
        ).collect()
    }
    assert d == hops


# ---------------------------------------------------------------------------
# round-7 ADVICE fixes: NULL discipline, markov closure, pca guard
# ---------------------------------------------------------------------------


def test_bootstrap_mean_excludes_null_metrics(spark):
    from aden_hive_fork_spark.operators.bootstrap import (
        poisson_bootstrap_mean_ci,
    )

    df = spark.createDataFrame(
        [(1, 10.0, "g"), (2, 20.0, "g"), (3, None, "g"), (4, 30.0, "g")],
        "k bigint, v double, g string",
    )
    r = poisson_bootstrap_mean_ci(df, "k", "v", ["g"], replicates=41).collect()[0]
    # mean over the 3 NON-NULL rows, and n_rows counts only them —
    # not sum(non-null)/count(all) = 15.0
    assert r["n_rows"] == 3
    assert r["mean"] == 20.0


def test_randomization_test_excludes_null_metrics(spark):
    from aden_hive_fork_spark.operators.bootstrap import (
        randomization_test_diff,
    )

    rows = [(i, 10.0 + (i % 3), "a" if i % 2 == 0 else "b") for i in range(40)]
    rows += [(100, None, "a"), (101, None, "b")]
    df = spark.createDataFrame(rows, "k bigint, v double, arm string")
    r = randomization_test_diff(df, "k", "v", "arm", "a", "b", replicates=19)
    row = r.collect()[0]
    assert row["n_a"] == 20 and row["n_b"] == 20  # NULL rows dropped


def test_cuped_excludes_null_covariate_rows(spark):
    from aden_hive_fork_spark.operators.stats import cuped_adjust

    rows = [(float(i), float(2 * i + 1), "a" if i % 2 == 0 else "b")
            for i in range(1, 11)]
    rows += [(None, 99.0, "a"), (5.0, None, "b")]
    df = spark.createDataFrame(rows, "x double, y double, arm string")
    got = {r["arm"]: r for r in cuped_adjust(df, "x", "y", "arm").collect()}
    # pooled n excludes the two NULL rows → 5 per arm
    assert got["a"]["n"] == 5 and got["b"]["n"] == 5
    # mean_y over non-null rows only
    ya = [2 * i + 1 for i in range(1, 11) if i % 2 == 0]
    assert got["a"]["mean_y"] == round(sum(ya) / len(ya), 4)


def test_markov_cascading_dead_end_closure(spark):
    from aden_hive_fork_spark.operators.markov import (
        event_transitions,
        stationary_distribution,
    )

    # chain per key: a -> b -> sink. Single-pass closure would keep
    # the a->b row (b IS a source) even though b's only out-edge dies
    # with the sink — leaving b substochastic. Fixed point must drop
    # both a->b and b->sink here, keeping only the a<->c cycle.
    rows = []
    for k, seq in enumerate([
        ["a", "b", "sink"],
        ["a", "c", "a", "c"],
        ["c", "a", "c"],
    ]):
        rows += [(k, i, s) for i, s in enumerate(seq)]
    df = spark.createDataFrame(rows, "k bigint, t bigint, s string")
    trans = event_transitions(df, "k", "t", "s", "t")
    got = {(r["src"], r["dst"]): r["p"] for r in trans.collect()}
    assert set(got) == {("a", "c"), ("c", "a")}
    assert got[("a", "c")] == 1.0 and got[("c", "a")] == 1.0
    # and the stationary distribution conserves mass
    pi = {r["state"]: r["pi"] for r in
          stationary_distribution(trans).collect()}
    assert abs(sum(pi.values()) - 1.0) < 1e-6


def test_markov_all_dead_ends_empty_matrix(spark):
    from aden_hive_fork_spark.operators.markov import event_transitions

    # strict DAG: a -> b -> c, no cycles → closure empties the chain
    df = spark.createDataFrame(
        [(1, 0, "a"), (1, 1, "b"), (1, 2, "c")], "k bigint, t bigint, s string"
    )
    out = event_transitions(df, "k", "t", "s", "t")
    assert out.count() == 0
    assert out.columns == ["src", "dst", "n", "p"]


def test_stationary_rejects_substochastic_input(spark):
    import pytest

    from aden_hive_fork_spark.operators.markov import (
        stationary_distribution,
    )

    trans = spark.createDataFrame(
        [("a", "b", 1, 1.0)], "src string, dst string, n bigint, p double"
    )
    with pytest.raises(ValueError, match="substochastic"):
        stationary_distribution(trans)


def test_power_iteration_rejects_degenerate_covariance(spark):
    import pytest

    from aden_hive_fork_spark.operators.pca import power_iteration_pc1

    df = spark.createDataFrame(
        [(i, [1.0, 1.0, 1.0]) for i in range(8)],
        "id bigint, embedding array<double>",
    )
    with pytest.raises(ValueError, match="degenerate"):
        power_iteration_pc1(df, "embedding", iters=2)
