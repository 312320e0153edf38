"""Welch t-test, mutual information, Benford, transition matrix,
FD audit, Gini — unit semantics against hand-computed values (suite
q171-q176 covers the cross-engine hash contract)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_welch_ttest_matches_scipy_formula(spark):
    from aden_hive_fork_spark.operators.stats import welch_ttest

    a = [10.0, 12.0, 14.0, 16.0]
    b = [20.0, 21.0, 22.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, x double")
    r = welch_ttest(df, "x", "g", "a", "b").collect()[0]
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    va = sum((v - ma) ** 2 for v in a) / (len(a) - 1)
    vb = sum((v - mb) ** 2 for v in b) / (len(b) - 1)
    se2 = va / len(a) + vb / len(b)
    t = (ma - mb) / math.sqrt(se2)
    dof = se2 * se2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert (r["n_a"], r["n_b"]) == (4, 3)
    assert abs(r["t_stat"] - t) < 1e-5
    assert abs(r["dof_welch"] - dof) < 1e-5
    assert r["mean_a"] == 13.0 and r["mean_b"] == 21.0


def test_welch_ttest_null_on_degenerate_group(spark):
    from aden_hive_fork_spark.operators.stats import welch_ttest

    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("b", 3.0)], "g string, x double"
    )
    r = welch_ttest(df, "x", "g", "a", "b").collect()[0]
    assert r["t_stat"] is None and r["dof_welch"] is None


def test_mutual_information_independent_vs_dependent(spark):
    from aden_hive_fork_spark.operators.stats import mutual_information

    # perfectly dependent: b == a → MI == H(A) == ln 2, NMI == 1
    dep = spark.createDataFrame(
        [("x", "x")] * 5 + [("y", "y")] * 5, "a string, b string"
    )
    r = mutual_information(dep, "a", "b").collect()[0]
    assert abs(r["mi"] - math.log(2)) < 1e-5
    assert abs(r["nmi"] - 1.0) < 1e-5
    # independent uniform 2×2 → MI 0
    ind = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "uv" for _ in range(3)],
        "a string, b string",
    )
    r2 = mutual_information(ind, "a", "b").collect()[0]
    assert abs(r2["mi"]) < 1e-5
    assert abs(r2["h_a"] - math.log(2)) < 1e-5


def test_mutual_information_partitioning_invariant(spark):
    from aden_hive_fork_spark.operators.stats import mutual_information

    rows = [(f"a{i % 3}", f"b{(i * 7) % 4}") for i in range(100)]
    d1 = spark.createDataFrame(rows, "a string, b string").repartition(13)
    d2 = spark.createDataFrame(list(reversed(rows)), "a string, b string")
    r1 = mutual_information(d1, "a", "b").collect()[0]
    r2 = mutual_information(d2, "a", "b").collect()[0]
    assert r1 == r2


def test_benford_digit_extraction_and_expected(spark):
    from aden_hive_fork_spark.operators.quality import benford_deviation

    # 0.05 → leading digit 5; 1234.00 → 1; negatives/zero dropped
    df = spark.createDataFrame(
        [(0.05,), (1234.0,), (190.0,), (-7.0,), (0.0,), (None,)],
        "x double",
    )
    out = {r["digit"]: r for r in benford_deviation(df, "x").collect()}
    assert set(out) == {1, 5}
    assert out[1]["n_obs"] == 2  # 1234.00 and 190.00
    assert out[5]["n_obs"] == 1
    assert abs(out[1]["exp_frac"] - math.log10(2)) < 1e-6


def test_transition_matrix_hand_counts(spark):
    from aden_hive_fork_spark.operators.sequences import transition_matrix

    rows = [
        ("u1", 1, "a"), ("u1", 2, "b"), ("u1", 3, "a"), ("u1", 4, "b"),
        ("u2", 1, "a"), ("u2", 2, "b"),
        ("u3", 1, "c"),  # single event: no transitions
    ]
    df = spark.createDataFrame(rows, "u string, t int, s string")
    got = {
        (r["from_state"], r["to_state"]): (r["n_transitions"], r["prob"])
        for r in transition_matrix(df, ["u"], ["t"], "s").collect()
    }
    assert got[("a", "b")] == (3, 1.0)
    assert got[("b", "a")] == (1, 1.0)
    assert ("c", None) not in got and len(got) == 2


def test_transition_matrix_tie_break_deterministic(spark):
    from aden_hive_fork_spark.operators.sequences import transition_matrix

    # equal timestamps: id tie-break orders (t=1,id=1,a) before
    # (t=1,id=2,b) → a→b, b→c
    rows = [("u", 1, 2, "b"), ("u", 1, 1, "a"), ("u", 2, 3, "c")]
    df = spark.createDataFrame(rows, "u string, t int, id int, s string")
    got = {
        (r["from_state"], r["to_state"])
        for r in transition_matrix(df, ["u"], ["t", "id"], "s").collect()
    }
    assert got == {("a", "b"), ("b", "c")}


def test_fd_violations_holding_and_failing(spark):
    from aden_hive_fork_spark.operators.quality import fd_violations

    rows = [
        (1, "x", 10), (1, "x", 11),   # a=1 → b='x' consistent
        (2, "y", 12), (2, "z", 13),   # a=2 → two b values: violated
        (3, None, 14),                # NULL rhs dropped
    ]
    df = spark.createDataFrame(rows, "a int, b string, c int")
    out = {r["fd"]: r for r in
           fd_violations(df, [(["a"], "b"), (["c"], "b")]).collect()}
    fd_ab = out["a->b"]
    assert fd_ab["n_lhs_values"] == 2          # a=3 dropped (NULL b)
    assert fd_ab["n_violating_lhs"] == 1
    assert fd_ab["max_distinct_rhs"] == 2
    assert fd_ab["violating_rows"] == 2
    assert fd_ab["violation_frac"] == 0.5
    assert out["c->b"]["n_violating_lhs"] == 0  # c unique per row


def test_gini_uniform_zero_and_concentrated_high(spark):
    from aden_hive_fork_spark.operators.stats import gini_coefficient

    eq = spark.createDataFrame(
        [(i, 10.0) for i in range(8)], "id int, x double"
    )
    assert gini_coefficient(eq, "x", "id").collect()[0]["gini"] == 0.0
    # one entity owns everything: G = (n-1)/n
    conc = spark.createDataFrame(
        [(0, 100.0)] + [(i, 0.0) for i in range(1, 5)], "id int, x double"
    )
    assert gini_coefficient(conc, "x", "id").collect()[0]["gini"] == 0.8


def test_item_similarity_hand_cosine(spark):
    from aden_hive_fork_spark.operators.baskets import item_similarity

    # baskets: {1,2} ×2, {1,3} ×1 → cos(1,2)=2/sqrt(3*2), cos(1,3)=1/sqrt(3)
    rows = [("b1", 1), ("b1", 2), ("b2", 1), ("b2", 2), ("b3", 1), ("b3", 3)]
    df = spark.createDataFrame(rows, "b string, item int")
    got = {(r["item"], r["neighbor"]): r
           for r in item_similarity(df, "b", "item", top_k=2).collect()}
    import math
    assert abs(got[(1, 2)]["cosine"] - 2 / math.sqrt(6)) < 1e-6
    assert abs(got[(1, 3)]["cosine"] - 1 / math.sqrt(3)) < 1e-6
    assert got[(1, 2)]["rank"] == 1 and got[(1, 3)]["rank"] == 2
    # symmetric orientation exists too
    assert got[(2, 1)]["pair_count"] == 2


def test_doc_avg_nll_hand_model(spark):
    from aden_hive_fork_spark.operators.ngram_lm import doc_avg_nll

    # corpus: "a b" ×3 and "a c" ×1 → P(b|a)=0.75, P(c|a)=0.25
    rows = [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a c")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc"]: r for r in
           doc_avg_nll(df, "text", "doc_id", n=2).collect()}
    import math
    assert got[1]["n_ngrams"] == 1
    assert abs(got[1]["avg_nll"] - (-math.log(0.75))) < 1e-5
    assert abs(got[4]["avg_nll"] - (-math.log(0.25))) < 1e-5
    # rarer continuation scores MORE surprising
    assert got[4]["avg_nll"] > got[1]["avg_nll"]


def test_doc_avg_nll_short_docs_absent(spark):
    from aden_hive_fork_spark.operators.ngram_lm import doc_avg_nll

    df = spark.createDataFrame(
        [(1, "only"), (2, "two words")], "doc_id int, text string"
    )
    got = doc_avg_nll(df, "text", "doc_id", n=2).collect()
    assert [r["doc"] for r in got] == [2]


def test_join_size_profile_hand_counts(spark):
    from aden_hive_fork_spark.operators.joins import join_size_profile

    left = spark.createDataFrame(
        [(1,), (1,), (2,), (3,), (None,)], "k int"
    )
    right = spark.createDataFrame([(1,), (2,), (2,), (9,)], "k int")
    r = join_size_profile(left, right, "k", "k").collect()[0]
    assert r["n_keys_left"] == 3 and r["n_keys_right"] == 3
    assert r["n_matched_keys"] == 2
    # 1: 2*1=2; 2: 1*2=2; 3 and 9 unmatched → 0
    assert r["output_rows"] == 4
    assert r["max_key_output"] == 2
    assert r["amplification"] == 1.0  # 4 rows out / 4 non-null left rows


def test_seasonal_index_weekday_profile(spark):
    import datetime as dt

    from aden_hive_fork_spark.operators.timeseries import seasonal_index

    # two Mondays at 20, one Tuesday at 10 → overall mean 50/3;
    # Monday index = 20/(50/3) = 1.2, Tuesday = 0.6
    rows = [
        ("g", dt.date(2024, 1, 1), 20.0),   # Monday
        ("g", dt.date(2024, 1, 8), 20.0),   # Monday
        ("g", dt.date(2024, 1, 2), 10.0),   # Tuesday
    ]
    df = spark.createDataFrame(rows, "g string, d date, v double")
    got = {r["isodow"]: r for r in
           seasonal_index(df, ["g"], "d", "v").collect()}
    assert got[1]["n_days"] == 2 and got[1]["dow_mean"] == 20.0
    assert got[1]["seasonal_index"] == 1.2
    assert got[2]["seasonal_index"] == 0.6


def test_kfold_partitions_and_key_consistency(spark):
    from aden_hive_fork_spark.operators.sampling import kfold_assign

    df = spark.createDataFrame([(i,) for i in range(500)], "k long")
    folds = kfold_assign(df, "k", k=5)
    got = folds.groupBy("fold").count().collect()
    assert {r["fold"] for r in got} == {0, 1, 2, 3, 4}
    # every key in exactly one fold; roughly balanced (binomial)
    assert sum(r["count"] for r in got) == 500
    assert all(abs(r["count"] - 100) < 50 for r in got)
    # same key → same fold in a DIFFERENT table (join-consistency)
    other = kfold_assign(
        spark.createDataFrame([(i, "x") for i in range(500)],
                              "k long, pad string"),
        "k", k=5,
    )
    j = folds.withColumnRenamed("fold", "f1").join(
        other.select("k", F.col("fold").alias("f2")), "k"
    )
    assert j.filter(F.col("f1") != F.col("f2")).count() == 0


def test_corr_matrix_matches_exact_corr_pairwise(spark):
    from aden_hive_fork_spark.operators.stats import corr_matrix, exact_corr

    rows = [(float(i), float(i * 2 + (i % 3)), float(10 - i))
            for i in range(50)]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    m = {(r["col_a"], r["col_b"]): r["corr"]
         for r in corr_matrix(df, ["a", "b", "c"]).collect()}
    for a, b in [("a", "b"), ("a", "c"), ("b", "c")]:
        single = exact_corr(df, a, b).collect()[0]["corr"]
        assert m[(a, b)] == single
    # perfect anti-correlation a vs c
    assert m[("a", "c")] == -1.0


def test_acf_perfect_periodicity(spark):
    from aden_hive_fork_spark.operators.timeseries import acf

    # period-2 alternating series: lag-2 acf = 1, lag-1 acf = -1
    rows = [("k", i, 10.0 if i % 2 == 0 else 20.0) for i in range(40)]
    df = spark.createDataFrame(rows, "k string, t int, x double")
    got = {r["lag"]: r for r in acf(df, ["k"], "t", "x", 2).collect()}
    assert got[1]["n_pairs"] == 39 and got[2]["n_pairs"] == 38
    assert got[2]["acf"] == 1.0
    assert got[1]["acf"] < -0.99


def test_acf_constant_series_null(spark):
    from aden_hive_fork_spark.operators.timeseries import acf

    df = spark.createDataFrame([("k", i, 5.0) for i in range(10)],
                               "k string, t int, x double")
    got = acf(df, ["k"], "t", "x", 1).collect()
    assert got[0]["acf"] is None and got[0]["n_pairs"] == 9


def test_ref_integrity_orphans_and_nulls(spark):
    from aden_hive_fork_spark.operators.quality import ref_integrity

    child = spark.createDataFrame(
        [(1,), (1,), (2,), (99,), (99,), (98,), (None,)], "fk int"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    r = ref_integrity(child, parent, "fk", "pk").collect()[0]
    assert r["n_child_rows"] == 7
    assert r["n_null_fk"] == 1
    assert r["n_orphan_rows"] == 3       # 99, 99, 98
    assert r["n_orphan_keys"] == 2
    assert r["orphan_frac"] == 0.5       # 3 of 6 non-null FKs


def test_session_paths_hand_sessions(spark):
    import datetime as dt

    from aden_hive_fork_spark.operators.sequences import session_paths

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(u, minutes, eid, s):
        return (u, t0 + dt.timedelta(minutes=minutes), eid, s)

    rows = [
        # u1 session 1: a,b,c,d (only first 3 kept) — gap — session 2: b
        ev(1, 0, 1, "a"), ev(1, 5, 2, "b"), ev(1, 10, 3, "c"),
        ev(1, 12, 4, "d"),
        ev(1, 100, 5, "b"),
        # u2 one session: a,b,c
        ev(2, 0, 6, "a"), ev(2, 1, 7, "b"), ev(2, 2, 8, "c"),
    ]
    df = spark.createDataFrame(
        rows, "u long, ts timestamp_ntz, eid long, s string"
    )
    got = {r["path"]: r["n_sessions"] for r in session_paths(
        df, ["u"], "ts", ["eid"], "s", gap_minutes=30, max_steps=3
    ).collect()}
    assert got == {"a>b>c": 2, "b": 1}


def test_growth_accounting_identity_and_kinds(spark):
    import datetime as dt

    from aden_hive_fork_spark.operators.cohorts import growth_accounting

    w0 = dt.datetime(2024, 1, 1)          # a Monday
    w1 = w0 + dt.timedelta(days=7)
    w3 = w0 + dt.timedelta(days=21)

    rows = (
        # u1 active w0, w1 (retained), absent w2, back w3 (resurrected)
        [(1, w0), (1, w1), (1, w3)]
        # u2 active w0 only (churns after w0)
        + [(2, w0)]
        # u3 first appears w1
        + [(3, w1), (3, w3)]
    )
    df = spark.createDataFrame(rows, "u long, ts timestamp_ntz")
    got = {r["period_start"]: r for r in
           growth_accounting(df, "u", "ts", "week").collect()}
    p0, p1, p3 = sorted(got)
    assert got[p0]["n_new"] == 2 and got[p0]["wau"] == 2
    assert got[p1]["n_new"] == 1 and got[p1]["n_retained"] == 1
    # churned after w0: u2 (u1 retained) → reported AT w1
    assert got[p1]["n_churned_prev"] == 1
    assert got[p3]["n_resurrected"] == 2 and got[p3]["n_new"] == 0
    for r in got.values():
        assert r["wau"] == r["n_new"] + r["n_retained"] + r["n_resurrected"]


def test_rolling_median_odd_even_frames(spark):
    from aden_hive_fork_spark.operators.timeseries import rolling_median

    rows = [("k", 1, 10.0), ("k", 2, 30.0), ("k", 3, 20.0), ("k", 4, 90.0)]
    df = spark.createDataFrame(rows, "k string, t int, x double")
    got = {r["t"]: r for r in
           rolling_median(df, ["k"], "t", "x", window=3).collect()}
    assert got[1]["roll_median"] == 10.0          # [10]
    assert got[2]["roll_median"] == 20.0          # [10,30] → mean
    assert got[3]["roll_median"] == 20.0          # [10,20,30]
    assert got[4]["roll_median"] == 30.0          # [20,30,90]
    assert got[4]["n_window"] == 3


def test_mann_kendall_hand_computed(spark):
    from aden_hive_fork_spark.operators.stats import mann_kendall

    # strictly increasing series: S = C(5,2) = 10, sen = median slope
    rows = [("g", t, float(2 * t + 1)) for t in range(5)]
    df = spark.createDataFrame(rows, "g string, t int, y double")
    out = mann_kendall(df, "t", "y", ["g"]).collect()[0]
    assert out["n"] == 5 and out["s_stat"] == 10
    # all pairwise slopes are exactly 2.0
    assert out["sen_slope"] == 2.0
    # z = (S-1)/sqrt(n(n-1)(2n+5)/18) = 9/sqrt(16.666..)
    import math
    assert math.isclose(out["z"], 9 / math.sqrt(5 * 4 * 15 / 18), abs_tol=1e-6)


def test_mann_kendall_outlier_robust_vs_linear_fit(spark):
    from aden_hive_fork_spark.operators.stats import linear_fit, mann_kendall

    rows = [("g", t, float(t)) for t in range(20)]
    rows[19] = ("g", 19, 1000.0)  # poison point at max leverage
    df = spark.createDataFrame(rows, "g string, t int, y double")
    mk = mann_kendall(df, "t", "y", ["g"]).collect()[0]
    lf = linear_fit(df, "t", "y", ["g"], scale=2).collect()[0]
    # Sen slope stays ~1; least squares is dragged far off
    assert abs(mk["sen_slope"] - 1.0) < 0.2
    assert abs(lf["slope"] - 1.0) > 1.0


def test_mann_kendall_constant_series_and_ties(spark):
    from aden_hive_fork_spark.operators.stats import mann_kendall

    const = spark.createDataFrame(
        [("g", t, 5.0) for t in range(6)], "g string, t int, y double"
    )
    out = mann_kendall(const, "t", "y", ["g"]).collect()[0]
    # all pairs tie: S = 0; tie correction kills the variance → z NULL
    assert out["s_stat"] == 0 and out["z"] is None
    assert out["sen_slope"] == 0.0


def test_ks_test_hand_computed_separated_samples(spark):
    from aden_hive_fork_spark.operators.stats import ks_test

    # fully separated: D = 1.0 exactly (CDFs never overlap)
    rows = [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)]
    df = spark.createDataFrame(rows, "s string, v double")
    r = ks_test(df, "v", "s", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"]) == (2, 2)
    assert r["d_stat"] == 1.0
    assert r["p_value"] < 0.2  # strong evidence of shift


def test_ks_test_interleaved_and_identical(spark):
    from aden_hive_fork_spark.operators.stats import ks_test

    # identical samples: D = 0, p = 1 (the series sums to 2-2+2-2+2
    # = 2, clamped to 1)
    rows = [("a", float(v)) for v in range(10)] + [
        ("b", float(v)) for v in range(10)
    ]
    df = spark.createDataFrame(rows, "s string, v double")
    r = ks_test(df, "v", "s", "a", "b").collect()[0]
    assert r["d_stat"] == 0.0 and r["p_value"] == 1.0

    # hand case: a=[1,2,3,4], b=[3,4,5,6] → max gap at x=2:
    # F_a=0.5, F_b=0 → D=0.5
    rows = [("a", v) for v in [1.0, 2.0, 3.0, 4.0]] + [
        ("b", v) for v in [3.0, 4.0, 5.0, 6.0]
    ]
    df = spark.createDataFrame(rows, "s string, v double")
    r = ks_test(df, "v", "s", "a", "b").collect()[0]
    assert r["d_stat"] == 0.5


def test_ks_test_empty_side_and_groups(spark):
    from aden_hive_fork_spark.operators.stats import ks_test

    rows = [
        ("g1", "a", 1.0), ("g1", "a", 2.0), ("g1", "b", 9.0),
        ("g2", "a", 1.0),  # no b rows in g2
    ]
    df = spark.createDataFrame(rows, "g string, s string, v double")
    out = {r["g"]: r for r in ks_test(df, "v", "s", "a", "b", ["g"]).collect()}
    assert out["g1"]["d_stat"] == 1.0
    assert out["g2"]["n_b"] == 0
    assert out["g2"]["d_stat"] is None and out["g2"]["p_value"] is None
