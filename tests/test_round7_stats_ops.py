"""Unit semantics for the round-7 statistics wave: Mann-Whitney U,
Benjamini-Hochberg FDR, Cohen's d / Hedges' g, CUSUM change-point —
hand-computed fixtures plus the window-free plan discipline."""

from __future__ import annotations

import math


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString().lower()


# ---------------------------------------------------------------------------
# Mann-Whitney U
# ---------------------------------------------------------------------------


def test_mann_whitney_no_ties_hand_value(spark):
    from aden_hive_fork_spark.operators.stats import mann_whitney_u

    rows = [(1.0, "a"), (2.0, "a"), (3.0, "a"),
            (4.0, "b"), (5.0, "b"), (6.0, "b")]
    df = spark.createDataFrame(rows, "v double, g string")
    r = mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    # ranks of a = 1,2,3 → U = 6 − 3·4/2 = 0
    assert r["n_a"] == 3 and r["n_b"] == 3
    assert r["u_stat"] == 0.0
    z = (0.0 - 4.5) / math.sqrt(9.0 / 12.0 * 7.0)
    assert math.isclose(r["z_score"], round(z, 6), abs_tol=1e-9)


def test_mann_whitney_tie_correction(spark):
    from aden_hive_fork_spark.operators.stats import mann_whitney_u

    rows = [(1.0, "a"), (1.0, "a"), (1.0, "b"), (2.0, "b")]
    df = spark.createDataFrame(rows, "v double, g string")
    r = mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    # avg rank of the tied 1.0s is 2 → ΣR_a = 4 → U = 1;
    # var = (4/12)·(5 − 24/12) = 1 → z = (1 − 2)/1 = −1
    assert r["u_stat"] == 1.0
    assert r["z_score"] == -1.0


def test_mann_whitney_all_tied_null_z(spark):
    from aden_hive_fork_spark.operators.stats import mann_whitney_u

    df = spark.createDataFrame(
        [(1.0, "a"), (1.0, "a"), (1.0, "b")], "v double, g string"
    )
    r = mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    assert r["z_score"] is None  # tie correction zeroes the variance


def test_mann_whitney_plan_has_no_window(spark):
    from aden_hive_fork_spark.operators.stats import mann_whitney_u

    df = spark.createDataFrame(
        [(float(i % 9), "a" if i % 2 == 0 else "b") for i in range(50)],
        "v double, g string",
    )
    assert "window" not in _plan(mann_whitney_u(df, "v", "g", "a", "b"))


# ---------------------------------------------------------------------------
# Benjamini-Hochberg
# ---------------------------------------------------------------------------


def test_bh_fdr_basic_rejections(spark):
    from aden_hive_fork_spark.operators.stats import bh_fdr

    df = spark.createDataFrame(
        [(1, 0.01), (2, 0.02), (3, 0.03), (4, 0.2)], "k bigint, p double"
    )
    got = {r["test_id"]: r for r in bh_fdr(df, "k", "p", 0.1).collect()}
    assert [got[i]["rejected"] for i in (1, 2, 3, 4)] == [
        True, True, True, False,
    ]
    assert got[3]["rank"] == 3
    assert math.isclose(got[4]["threshold"], 0.1)


def test_bh_fdr_step_up_rejects_above_own_threshold(spark):
    from aden_hive_fork_spark.operators.stats import bh_fdr

    # p=0.06 exceeds ITS threshold (0.05) but a later test passes
    # (0.07 ≤ 0.075), so the step-up rule rejects it anyway
    df = spark.createDataFrame(
        [(1, 0.01), (2, 0.06), (3, 0.07), (4, 0.2)], "k bigint, p double"
    )
    got = {r["test_id"]: r["rejected"]
           for r in bh_fdr(df, "k", "p", 0.1).collect()}
    assert got == {1: True, 2: True, 3: True, 4: False}


def test_bh_fdr_nothing_rejected_and_null_excluded(spark):
    import pytest

    from aden_hive_fork_spark.operators.stats import bh_fdr

    df = spark.createDataFrame(
        [(1, 0.9), (2, 0.95), (3, None)], "k bigint, p double"
    )
    rows = bh_fdr(df, "k", "p", 0.05).collect()
    assert len(rows) == 2  # NULL p dropped
    assert all(not r["rejected"] for r in rows)
    with pytest.raises(ValueError, match="alpha"):
        bh_fdr(df, "k", "p", 1.5)


def test_bh_fdr_plan_has_no_window(spark):
    from aden_hive_fork_spark.operators.stats import bh_fdr

    df = spark.createDataFrame(
        [(i, i / 100.0) for i in range(1, 40)], "k bigint, p double"
    )
    assert "window" not in _plan(bh_fdr(df, "k", "p", 0.1))


# ---------------------------------------------------------------------------
# effect sizes
# ---------------------------------------------------------------------------


def test_cohens_d_hand_value(spark):
    from aden_hive_fork_spark.operators.stats import cohens_d

    rows = [(1.0, "a"), (2.0, "a"), (3.0, "a"),
            (4.0, "b"), (6.0, "b"), (8.0, "b")]
    df = spark.createDataFrame(rows, "v double, g string")
    r = cohens_d(df, "v", "g").collect()
    assert len(r) == 1
    row = r[0]
    assert (row["group_a"], row["group_b"]) == ("a", "b")
    d = (2.0 - 6.0) / math.sqrt((2 * 1.0 + 2 * 4.0) / 4.0)
    assert math.isclose(row["d"], round(d, 6), abs_tol=1e-9)
    assert math.isclose(row["g"], round(d * 0.8, 6), abs_tol=1e-9)


def test_cohens_d_degenerate_group_null(spark):
    from aden_hive_fork_spark.operators.stats import cohens_d

    df = spark.createDataFrame(
        [(1.0, "a"), (2.0, "a"), (5.0, "b")], "v double, g string"
    )
    row = cohens_d(df, "v", "g").collect()[0]
    assert row["d"] is None and row["g"] is None  # n_b < 2


# ---------------------------------------------------------------------------
# CUSUM change-point
# ---------------------------------------------------------------------------


def test_cusum_level_shift_hand_value(spark):
    from aden_hive_fork_spark.operators.timeseries import cusum_changepoint

    rows = [(i, v) for i, v in enumerate([1.0, 1.0, 1.0, 5.0, 5.0], 1)]
    df = spark.createDataFrame(rows, "t bigint, v double")
    r = cusum_changepoint(df, "t", "v").collect()[0]
    # mean 2.6; cumulative deviations −1.6, −3.2, −4.8, −2.4, 0 →
    # peak |S| = 4.8 at position 3 (the last pre-shift point)
    assert r["n"] == 5
    assert r["cp_rank"] == 3 and r["cp_t"] == 3
    assert r["s_max"] == 4.8
    assert r["mean"] == 2.6


def test_cusum_flat_series_zero(spark):
    from aden_hive_fork_spark.operators.timeseries import cusum_changepoint

    df = spark.createDataFrame(
        [(i, 7.0) for i in range(1, 6)], "t bigint, v double"
    )
    r = cusum_changepoint(df, "t", "v").collect()[0]
    assert r["s_max"] == 0.0 and r["cp_rank"] == 1  # tie → first index


def test_cusum_plan_has_no_window(spark):
    from aden_hive_fork_spark.operators.timeseries import cusum_changepoint

    df = spark.createDataFrame(
        [(i, float(i % 13)) for i in range(100)], "t bigint, v double"
    )
    assert "window" not in _plan(cusum_changepoint(df, "t", "v"))


# ---------------------------------------------------------------------------
# Brown-Forsythe
# ---------------------------------------------------------------------------


def test_brown_forsythe_equal_spread_zero_f(spark):
    from aden_hive_fork_spark.operators.stats import brown_forsythe

    rows = [(1.0, "a"), (2.0, "a"), (3.0, "a"),
            (4.0, "b"), (5.0, "b"), (6.0, "b")]
    df = spark.createDataFrame(rows, "v double, g string")
    r = brown_forsythe(df, "v", "g").collect()[0]
    # identical deviation patterns [1,0,1] per group → SSB = 0
    assert r["k_groups"] == 2 and r["n_rows"] == 6
    assert r["f_stat"] == 0.0


def test_brown_forsythe_detects_spread_difference(spark):
    from aden_hive_fork_spark.operators.stats import brown_forsythe

    rows = [(0.0, "a"), (10.0, "a"), (1.0, "a"),
            (5.0, "b"), (5.0, "b"), (6.0, "b")]
    df = spark.createDataFrame(rows, "v double, g string")
    r = brown_forsythe(df, "v", "g").collect()[0]
    # z_a = |x−1| = [1,9,0], z_b = |x−5| = [0,0,1]
    za, zb = [1.0, 9.0, 0.0], [0.0, 0.0, 1.0]
    t1 = sum(za) ** 2 / 3 + sum(zb) ** 2 / 3
    ss = sum(x * x for x in za + zb)
    cf = sum(za + zb) ** 2 / 6
    ssb, ssw = t1 - cf, ss - t1
    f = (ssb / 1.0) / (ssw / 4.0)
    assert abs(r["f_stat"] - round(f, 6)) < 1e-6
    assert r["f_stat"] > 0


# ---------------------------------------------------------------------------
# two-proportion z / Wilson
# ---------------------------------------------------------------------------


def test_two_proportion_hand_values(spark):
    from aden_hive_fork_spark.operators.stats import two_proportion_ztest

    rows = [(True, "a")] * 3 + [(False, "a")] + [(True, "b")] + [
        (False, "b")
    ] * 3 + [(None, "a")]
    df = spark.createDataFrame(rows, "c boolean, arm string")
    r = two_proportion_ztest(df, "c", "arm", "a", "b").collect()[0]
    assert (r["n_a"], r["x_a"], r["n_b"], r["x_b"]) == (4, 3, 4, 1)
    assert r["p_a"] == 0.75 and r["p_b"] == 0.25
    z = 0.5 / math.sqrt(0.25 * (0.25 + 0.25))
    assert math.isclose(r["z_score"], round(z, 6), abs_tol=1e-9)
    # Wilson bounds bracket the point estimates and stay in [0,1]
    assert 0.0 <= r["wilson_lo_a"] < 0.75 < r["wilson_hi_a"] <= 1.0
    assert 0.0 <= r["wilson_lo_b"] < 0.25 < r["wilson_hi_b"] <= 1.0
    c = 1.959964
    lo = (0.75 + c * c / 8 - c * math.sqrt(0.75 * 0.25 / 4 + c * c / 64)) / (
        1 + c * c / 4
    )
    assert math.isclose(r["wilson_lo_a"], round(lo, 6), abs_tol=1e-9)


def test_two_proportion_degenerate_null_z(spark):
    from aden_hive_fork_spark.operators.stats import two_proportion_ztest

    df = spark.createDataFrame(
        [(True, "a"), (True, "b")], "c boolean, arm string"
    )
    r = two_proportion_ztest(df, "c", "arm", "a", "b").collect()[0]
    assert r["z_score"] is None  # pooled p = 1 → zero variance


# ---------------------------------------------------------------------------
# exact ACF
# ---------------------------------------------------------------------------


def test_acf_alternating_series(spark):
    import datetime as dt

    from aden_hive_fork_spark.operators.timeseries import acf_exact

    base = dt.date(2024, 1, 1)
    rows = [(base + dt.timedelta(days=i), 1.0 if i % 2 == 0 else 2.0)
            for i in range(8)]
    df = spark.createDataFrame(rows, "day date, v double")
    got = {r["lag"]: r for r in acf_exact(df, "day", "v", max_lag=2).collect()}
    # deviations alternate ±0.5: lag-1 products −0.25×7, lag-2 +0.25×6
    assert got[1]["n_pairs"] == 7 and got[2]["n_pairs"] == 6
    assert got[1]["r"] == -0.875
    assert got[2]["r"] == 0.75


def test_acf_constant_series_null(spark):
    import datetime as dt

    from aden_hive_fork_spark.operators.timeseries import acf_exact

    base = dt.date(2024, 1, 1)
    rows = [(base + dt.timedelta(days=i), 3.0) for i in range(5)]
    df = spark.createDataFrame(rows, "day date, v double")
    for r in acf_exact(df, "day", "v", max_lag=2).collect():
        assert r["r"] is None  # zero variance → undefined, not NaN


def test_acf_plan_has_no_window(spark):
    import datetime as dt

    from aden_hive_fork_spark.operators.timeseries import acf_exact

    base = dt.date(2024, 1, 1)
    rows = [(base + dt.timedelta(days=i), float(i % 5)) for i in range(60)]
    df = spark.createDataFrame(rows, "day date, v double")
    assert "window" not in _plan(acf_exact(df, "day", "v", max_lag=3))


# ---------------------------------------------------------------------------
# Gopher n-gram repetition filters
# ---------------------------------------------------------------------------


def test_ngram_repetition_hand_values(spark):
    from aden_hive_fork_spark.operators.quality import ngram_repetition

    docs = spark.createDataFrame(
        [(1, "a b a b a b"),          # top 2-gram 'a b' x3, no dup 5-grams
         (2, "x y x y x y x y"),      # every 5-gram duplicated
         (3, "a b c")],               # < 5 words → dropped
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in
           ngram_repetition(docs, "doc_id", "text").collect()}
    assert set(got) == {1, 2}
    r1 = got[1]
    assert r1["n_words"] == 6 and r1["top_gram"] == "a b"
    # 3 occurrences x 3 chars / 11 chars, floor-quantized at 1e-6
    import math
    assert math.isclose(r1["top_frac"], 0.818182, abs_tol=1e-9)
    assert r1["dup_frac"] == 0.0
    r2 = got[2]
    # 5-grams: two distinct patterns x2 each → 4 x 9 chars... the two
    # patterns each occur twice: sum c*len = 2*9 + 2*9 = 36; L = 15
    assert r2["dup_frac"] == 2.4  # overlapping n-grams can exceed 1


def test_ngram_repetition_tie_breaks_to_smallest_gram(spark):
    from aden_hive_fork_spark.operators.quality import ngram_repetition

    # 'b c' and 'a b' both appear once... use a text where two grams
    # tie at the max count: "z w z w q a q a" → 'z w' x2 and 'q a' x2
    docs = spark.createDataFrame(
        [(1, "z w z w q a q a")], "doc_id bigint, text string"
    )
    r = ngram_repetition(docs, "doc_id", "text").collect()[0]
    assert r["top_gram"] == "q a"  # lexicographic min among tied max


def test_ngram_repetition_case_and_separators(spark):
    from aden_hive_fork_spark.operators.quality import ngram_repetition

    docs = spark.createDataFrame(
        [(1, "Foo,bar! foo BAR foo bar")], "doc_id bigint, text string"
    )
    r = ngram_repetition(docs, "doc_id", "text").collect()[0]
    # lowercased + non-alnum splits → words all 'foo'/'bar'
    assert r["n_words"] == 6 and r["top_gram"] == "foo bar"


# ---------------------------------------------------------------------------
# corpus-scale exact quantiles
# ---------------------------------------------------------------------------


def test_scalable_quantiles_match_spark_percentile(spark):
    from pyspark.sql import functions as F

    from aden_hive_fork_spark.operators.quality import (
        exact_quantiles_scalable,
    )

    vals = [float(v) for v in [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    probs = [0.0, 0.1, 0.25, 0.5, 0.75, 1.0]
    got = {r["p"]: r["quantile"]
           for r in exact_quantiles_scalable(df, "x", probs).collect()}
    ref = df.agg(
        F.expr(f"percentile(x, array({', '.join(map(str, probs))}))")
    ).collect()[0][0]
    for p, want in zip(probs, ref):
        assert abs(got[p] - want) < 1e-6, (p, got[p], want)


def test_scalable_quantiles_plan_has_no_window_and_validates(spark):
    import pytest

    from aden_hive_fork_spark.operators.quality import (
        exact_quantiles_scalable,
    )

    df = spark.createDataFrame([(float(i % 37),) for i in range(200)],
                               "x double")
    out = exact_quantiles_scalable(df, "x", [0.5])
    plan = out._jdf.queryExecution().executedPlan().toString().lower()
    assert "window" not in plan
    with pytest.raises(ValueError, match="outside"):
        exact_quantiles_scalable(df, "x", [1.5])
    with pytest.raises(ValueError, match="non-empty"):
        exact_quantiles_scalable(df, "x", [])


# ---------------------------------------------------------------------------
# moments / normality + forecast accuracy
# ---------------------------------------------------------------------------


def test_moments_normality_symmetric_fixture(spark):
    from aden_hive_fork_spark.operators.stats import moments_normality

    # symmetric values → skewness 0; two-point ±1 → kurtosis_ex = −2,
    # so JB = n/6 · (0 + 4/4) = n/6
    df = spark.createDataFrame(
        [(v, "g") for v in [-1.0] * 4 + [1.0] * 4], "v double, g string"
    )
    r = moments_normality(df, "v", "g").collect()[0]
    assert r["n"] == 8
    assert r["skewness"] == 0.0
    assert r["kurtosis_ex"] == -2.0
    assert abs(r["jb_stat"] - round(8 / 6, 6)) < 1e-9


def test_moments_normality_constant_null(spark):
    from aden_hive_fork_spark.operators.stats import moments_normality

    df = spark.createDataFrame([(5.0,)] * 4, "v double")
    r = moments_normality(df, "v").collect()[0]
    assert r["skewness"] is None and r["jb_stat"] is None


def test_forecast_accuracy_hand_values(spark):
    from aden_hive_fork_spark.operators.stats import forecast_accuracy

    df = spark.createDataFrame(
        [(10.0, 12.0), (20.0, 18.0), (0.0, 1.0)], "actual double, pred double"
    )
    r = forecast_accuracy(df, "actual", "pred").collect()[0]
    assert r["n"] == 3
    assert r["mae"] == round((2 + 2 + 1) / 3, 6)
    import math
    assert math.isclose(r["rmse"], round(math.sqrt((4 + 4 + 1) / 3), 6),
                        abs_tol=1e-9)
    # MAPE skips the zero-actual row: (0.2 + 0.1)/2 * 100
    assert r["mape"] == 15.0
    # sMAPE uses |a|+|p|: (2/22 + 2/38 + 1/1)/3 * 200
    smape = round((round(2 / 22, 4) + round(2 / 38, 4) + 1.0) / 3 * 200, 6)
    assert abs(r["smape"] - smape) < 1e-6
    assert r["bias"] == round((2 - 2 + 1) / 3, 6)


# ---------------------------------------------------------------------------
# funnel
# ---------------------------------------------------------------------------


def test_funnel_strict_order_semantics(spark):
    import datetime as dt

    from aden_hive_fork_spark.operators.sequences import funnel_steps

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # u1 completes the full funnel in order
        (1, t0, "a"), (1, t0 + dt.timedelta(hours=1), "b"),
        (1, t0 + dt.timedelta(hours=2), "c"),
        # u2 does b BEFORE a → b must not count
        (2, t0 + dt.timedelta(hours=1), "a"), (2, t0, "b"),
        # u3 reaches a and b only
        (3, t0, "a"), (3, t0 + dt.timedelta(minutes=5), "b"),
        # u4 never does a
        (4, t0, "b"), (4, t0 + dt.timedelta(hours=1), "c"),
        # u5: b simultaneous with a → strict > excludes it
        (5, t0, "a"), (5, t0, "b"),
    ]
    df = spark.createDataFrame(rows, "u bigint, ts timestamp_ntz, k string")
    got = {r["step"]: r for r in
           funnel_steps(df, "u", "ts", "k", ["a", "b", "c"]).collect()}
    assert got["a"]["n_users"] == 4   # u1, u2, u3, u5
    assert got["b"]["n_users"] == 2   # u1, u3 (u2 out of order, u5 tie)
    assert got["c"]["n_users"] == 1   # u1
    assert got["b"]["conv_from_prev"] == 0.5
    assert got["c"]["conv_from_first"] == 0.25
    assert got["a"]["conv_from_prev"] == 1.0


def test_funnel_rejects_short_steps(spark):
    import pytest

    from aden_hive_fork_spark.operators.sequences import funnel_steps

    df = spark.createDataFrame([(1, None, "a")], "u bigint, ts timestamp, k string")
    with pytest.raises(ValueError, match="at least 2"):
        funnel_steps(df, "u", "ts", "k", ["a"])


# ---------------------------------------------------------------------------
# word entropy
# ---------------------------------------------------------------------------


def test_word_entropy_hand_values(spark):
    from aden_hive_fork_spark.operators.quality import word_entropy

    docs = spark.createDataFrame(
        [(1, "a a a a"),            # single token → H = 0
         (2, "a b c d"),            # uniform over 4 → H = ln 4
         (3, "x x y y")],           # uniform over 2 → H = ln 2
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in
           word_entropy(docs, "doc_id", "text").collect()}
    assert got[1]["entropy"] == 0.0 and got[1]["n_distinct"] == 1
    assert abs(got[2]["entropy"] - round(math.log(4), 6)) < 2e-6
    assert abs(got[3]["entropy"] - round(math.log(2), 6)) < 2e-6
    assert got[3]["n_words"] == 4 and got[3]["n_distinct"] == 2


# ---------------------------------------------------------------------------
# Wasserstein-1
# ---------------------------------------------------------------------------


def test_wasserstein_identical_samples_zero(spark):
    from aden_hive_fork_spark.operators.stats import wasserstein_1d

    rows = [(float(v), g) for g in ("a", "b") for v in (1, 2, 3, 7)]
    df = spark.createDataFrame(rows, "v double, g string")
    r = wasserstein_1d(df, "v", "g", "a", "b").collect()[0]
    assert r["w1"] == 0.0 and r["n_a"] == 4 and r["n_b"] == 4


def test_wasserstein_shift_equals_offset(spark):
    from aden_hive_fork_spark.operators.stats import wasserstein_1d

    # b = a + 2.5 pointwise → W1 = 2.5 exactly
    a_vals = [1.0, 2.0, 4.0, 8.0]
    rows = [(v, "a") for v in a_vals] + [(v + 2.5, "b") for v in a_vals]
    df = spark.createDataFrame(rows, "v double, g string")
    r = wasserstein_1d(df, "v", "g", "a", "b").collect()[0]
    assert r["w1"] == 2.5


def test_wasserstein_hand_value_unequal_sizes(spark):
    from aden_hive_fork_spark.operators.stats import wasserstein_1d

    # a = {0, 1}, b = {1}: F_a = .5 on [0,1), diff 0 after → W1 = 0.5
    df = spark.createDataFrame(
        [(0.0, "a"), (1.0, "a"), (1.0, "b")], "v double, g string"
    )
    r = wasserstein_1d(df, "v", "g", "a", "b").collect()[0]
    assert r["n_a"] == 2 and r["n_b"] == 1
    assert r["w1"] == 0.5


def test_wasserstein_plan_has_no_window(spark):
    from aden_hive_fork_spark.operators.stats import wasserstein_1d

    df = spark.createDataFrame(
        [(float(i % 17), "a" if i % 2 == 0 else "b") for i in range(60)],
        "v double, g string",
    )
    assert "window" not in _plan(wasserstein_1d(df, "v", "g", "a", "b"))


def test_running_totals_multi_weight(spark):
    from aden_hive_fork_spark.operators.ids import running_totals

    df = spark.createDataFrame(
        [(i, i % 3, (i * 2) % 5) for i in range(30)],
        "k bigint, wa bigint, wb bigint",
    )
    got = {r["k"]: (r["ca"], r["cb"]) for r in running_totals(
        df, ["k"], ["wa", "wb"], cum_col=["ca", "cb"], num_partitions=4
    ).collect()}
    aa = bb = 0
    for i in range(30):
        aa += i % 3
        bb += (i * 2) % 5
        assert got[i] == (aa, bb)


# ---------------------------------------------------------------------------
# Nelson-Aalen
# ---------------------------------------------------------------------------


def test_nelson_aalen_hand_values(spark):
    from aden_hive_fork_spark.operators.survival import nelson_aalen

    # durations 1,2,2,3 — events at 1 and 2 (one censored at 2),
    # censored at 3: n_risk(1)=4, n_risk(2)=3, n_risk(3)=1
    rows = [(1, 1), (2, 1), (2, 0), (3, 0)]
    df = spark.createDataFrame(rows, "t bigint, ev int")
    got = {r["t"]: r for r in nelson_aalen(df, "t", "ev").collect()}
    assert set(got) == {1, 2}  # censored-only times excluded
    assert got[1]["n_risk"] == 4 and got[1]["n_events"] == 1
    assert abs(got[1]["cum_hazard"] - 0.25) < 1e-9
    # H(2) = 1/4 + 1/3 (floor-quantized at 1e-9 then 1e-6)
    assert abs(got[2]["cum_hazard"] - 0.583333) < 1e-9
    # Var(2) = 1/16 + 1/9
    assert abs(got[2]["cum_haz_var"] - round(1 / 16 + 1 / 9, 6)) < 2e-6


def test_nelson_aalen_grouped_independent(spark):
    from aden_hive_fork_spark.operators.survival import nelson_aalen

    rows = [("a", 1, 1), ("a", 2, 1), ("b", 1, 1)]
    df = spark.createDataFrame(rows, "g string, t bigint, ev int")
    got = {(r["g"], r["t"]): r["cum_hazard"]
           for r in nelson_aalen(df, "t", "ev", ["g"]).collect()}
    assert abs(got[("a", 1)] - 0.5) < 1e-9
    assert abs(got[("a", 2)] - 1.5) < 1e-9
    assert abs(got[("b", 1)] - 1.0) < 1e-9
