"""Differential property tests for the round-7 operators: each Spark
result is checked against an independent plain-Python model on
randomized inputs (hypothesis). Spark jobs are slow, so example
counts are small but the models are exact — any partitioning or
arithmetic divergence fails loudly."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pytest


SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def sp():
    from aden_hive_fork_spark.session import build_session

    return build_session(
        app_name="r7-props", cpus=4, shuffle_partitions=5
    )


# ---------------------------------------------------------------------------
# running_totals ≡ sequential prefix sums, any partition count
# ---------------------------------------------------------------------------
@given(
    st.lists(st.integers(0, 50), min_size=1, max_size=40),
    st.integers(1, 7),
)
@settings(**SETTINGS)
def test_running_totals_equals_prefix_sums(sp, weights, nparts):
    from aden_hive_fork_spark.operators.ids import running_totals

    rows = [(i, w) for i, w in enumerate(weights)]
    df = sp.createDataFrame(rows, "k bigint, w bigint")
    got = {
        r["k"]: r["cum"]
        for r in running_totals(
            df, ["k"], "w", num_partitions=nparts
        ).collect()
    }
    acc = 0
    for i, w in enumerate(weights):
        acc += w
        assert got[i] == acc


# ---------------------------------------------------------------------------
# mann_whitney_u ≡ the textbook rank formula
# ---------------------------------------------------------------------------
@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.booleans()),
        min_size=4,
        max_size=30,
    ).filter(
        lambda xs: any(a for _, a in xs) and any(not a for _, a in xs)
    )
)
@settings(**SETTINGS)
def test_mann_whitney_matches_python_model(sp, data):
    from aden_hive_fork_spark.operators.stats import mann_whitney_u

    rows = [(float(v), "a" if is_a else "b") for v, is_a in data]
    df = sp.createDataFrame(rows, "v double, g string")
    r = mann_whitney_u(df, "v", "g", "a", "b").collect()[0]

    vals = sorted(v for v, _ in data)
    # average ranks with ties
    rank_of = {}
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        avg = (i + 1 + j) / 2.0
        rank_of[vals[i]] = avg
        i = j
    ra = sum(rank_of[v] for v, is_a in data if is_a)
    n_a = sum(1 for _, is_a in data if is_a)
    n_b = len(data) - n_a
    u = ra - n_a * (n_a + 1) / 2.0
    assert r["n_a"] == n_a and r["n_b"] == n_b
    assert math.isclose(r["u_stat"], u, abs_tol=1e-9)


# ---------------------------------------------------------------------------
# bh_fdr ≡ the sequential step-up procedure
# ---------------------------------------------------------------------------
@given(
    st.lists(
        st.floats(0.0001, 1.0, allow_nan=False), min_size=1, max_size=25
    ),
    st.sampled_from([0.05, 0.1, 0.25]),
)
@settings(**SETTINGS)
def test_bh_fdr_matches_python_model(sp, ps, alpha):
    from aden_hive_fork_spark.operators.stats import bh_fdr

    rows = [(i, float(p)) for i, p in enumerate(ps)]
    df = sp.createDataFrame(rows, "k bigint, p double")
    got = {r["test_id"]: r["rejected"]
           for r in bh_fdr(df, "k", "p", alpha).collect()}

    order = sorted(range(len(ps)), key=lambda i: (ps[i], i))
    m = len(ps)
    k = 0
    for pos, i in enumerate(order, start=1):
        if ps[i] <= pos * alpha / m:
            k = pos
    expected = {i: (pos <= k) for pos, i in enumerate(order, start=1)}
    assert got == expected


# ---------------------------------------------------------------------------
# exact_quantiles_scalable ≡ Spark percentile (type-7) on any data
# ---------------------------------------------------------------------------
@given(
    st.lists(
        st.integers(-50, 50).map(lambda v: v / 4.0),
        min_size=1,
        max_size=40,
    ),
    st.lists(
        st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.8, 0.95, 1.0]),
        min_size=1,
        max_size=4,
        unique=True,
    ),
)
@settings(**SETTINGS)
def test_scalable_quantiles_match_percentile(sp, vals, probs):
    from pyspark.sql import functions as F

    from aden_hive_fork_spark.operators.quality import (
        exact_quantiles_scalable,
    )

    df = sp.createDataFrame([(float(v),) for v in vals], "x double")
    got = {r["p"]: r["quantile"]
           for r in exact_quantiles_scalable(df, "x", probs).collect()}
    ordered = sorted(set(probs))
    ref = df.agg(
        F.expr(
            "percentile(x, array(%s))" % ", ".join(str(p) for p in ordered)
        )
    ).collect()[0][0]
    for p, want in zip(ordered, ref):
        assert abs(got[p] - want) < 1e-6


# ---------------------------------------------------------------------------
# cusum_changepoint ≡ the sequential deviation scan
# ---------------------------------------------------------------------------
@given(
    st.lists(
        st.integers(-100, 100).map(lambda v: v / 2.0),
        min_size=2,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_cusum_matches_python_model(sp, vals):
    from aden_hive_fork_spark.operators.timeseries import cusum_changepoint

    rows = [(i, float(v)) for i, v in enumerate(vals, 1)]
    df = sp.createDataFrame(rows, "t bigint, v double")
    r = cusum_changepoint(df, "t", "v").collect()[0]

    n = len(vals)
    xs = [round(v * 100) for v in vals]  # exact: halves of cents
    total = sum(xs)
    best = (-1, None)
    cum = 0
    for i, x in enumerate(xs, 1):
        cum += x
        dev = abs(n * cum - i * total)
        if dev > best[0]:
            best = (dev, i)
    assert r["cp_rank"] == best[1]
    assert math.isclose(
        r["s_max"], math.floor(best[0] / (100.0 * n) * 1e6 + 0.5) / 1e6,
        abs_tol=1e-9,
    )
