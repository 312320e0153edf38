"""Differential property tests for the round-8 operators: Spark
results vs exact plain-Python models on randomized inputs (the
round-7 discipline — few examples, exact models, loud failures)."""

from __future__ import annotations

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
        app_name="r8-props", cpus=4, shuffle_partitions=5
    )


# ---------------------------------------------------------------------------
# pack_token_stream ≡ sequential concat-and-chunk
# ---------------------------------------------------------------------------
def _model_pack(lengths, cap):
    out = []
    pos = 0
    for doc_id, n in enumerate(lengths):
        s, e = pos, pos + n
        w = s // cap
        while w * cap < e:
            a, b = max(s, w * cap), min(e, (w + 1) * cap)
            out.append((doc_id, w, a - s, a - w * cap, b - a))
            w += 1
        pos = e
    return sorted(out)


@given(
    st.lists(st.integers(1, 60), min_size=1, max_size=30),
    st.sampled_from([4, 16, 64]),
)
@settings(**SETTINGS)
def test_pack_token_stream_matches_sequential_model(sp, lengths, cap):
    from aden_hive_fork_spark.operators.packing import pack_token_stream

    df = sp.createDataFrame(
        [(i, n) for i, n in enumerate(lengths)], "doc_id bigint, n int"
    )
    got = sorted(
        (r["doc_id"], r["window_id"], r["doc_offset"], r["win_offset"],
         r["n_tokens"])
        for r in pack_token_stream(df, "doc_id", "n", cap).collect()
    )
    assert got == _model_pack(lengths, cap)


# ---------------------------------------------------------------------------
# wasserstein_from_counts ≡ brute-force CDF integral
# ---------------------------------------------------------------------------
@given(
    st.lists(
        st.tuples(st.integers(-50, 50), st.integers(0, 5), st.integers(0, 5)),
        min_size=1,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_wasserstein_from_counts_matches_bruteforce(sp, triples):
    from aden_hive_fork_spark.operators.stats import wasserstein_from_counts

    # dedupe values; need at least one count on each side
    vt = {}
    for v, ca, cb in triples:
        a, b = vt.get(v, (0, 0))
        vt[v] = (a + ca, b + cb)
    na = sum(a for a, _ in vt.values())
    nb = sum(b for _, b in vt.values())
    if na == 0 or nb == 0:
        return  # operator contract: NULL w1 — covered by unit tests
    df = sp.createDataFrame(
        [(v, a, b) for v, (a, b) in vt.items()],
        "_v long, _ca long, _cb long",
    )
    out = wasserstein_from_counts(df, scale=0).collect()
    if len(vt) == 1:
        # documented contract (ADVICE r7): a single merged distinct
        # value has no neighbor segment -> EMPTY result
        assert out == []
        return
    row = out[0]
    # exact rational model: sum |Fa - Fb| * dv over merged values
    vals = sorted(vt)
    from fractions import Fraction

    w1 = Fraction(0)
    cum_a = cum_b = 0
    for v, nxt in zip(vals, vals[1:]):
        cum_a += vt[v][0]
        cum_b += vt[v][1]
        w1 += abs(
            Fraction(cum_a, na) - Fraction(cum_b, nb)
        ) * (nxt - v)
    import math

    expected = math.floor(float(w1) * 1e6 + 0.5) / 1e6  # stable_round6
    assert row["n_a"] == na and row["n_b"] == nb
    assert row["w1"] == pytest.approx(expected, abs=1e-9)


# ---------------------------------------------------------------------------
# domain_mix_report ≡ direct share arithmetic
# ---------------------------------------------------------------------------
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "c", "x"]), st.integers(1, 99)),
        min_size=1,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_domain_mix_matches_model(sp, docs):
    from aden_hive_fork_spark.operators.mixing import domain_mix_report

    target = {"a": 0.5, "b": 0.3, "c": 0.2}
    df = sp.createDataFrame(docs, "source string, n int")
    rep = {
        r["domain"]: r
        for r in domain_mix_report(df, "source", "n", target, 1000).collect()
    }
    total = sum(n for _, n in docs)
    per = {}
    for d, n in docs:
        per[d] = per.get(d, 0) + n
    for d, n in per.items():
        r = rep[d]
        assert r["n_tokens"] == n
        assert r["current_share"] == pytest.approx(n / total)
        t = target.get(d, 0.0)
        assert r["target_share"] == t
        assert r["weight"] == pytest.approx(t / (n / total))
        # allocation is floor(t * budget) exactly
        import math

        assert r["allocated_tokens"] == math.floor(t * 1000.0)


# ---------------------------------------------------------------------------
# categorize_errors ≡ the python single-result twin on random text
# ---------------------------------------------------------------------------
_WORDS = [
    "typeerror", "timeout", "criteria not met", "empty result",
    "banana", "rate limit", "goal not achieved", "valueerror", "xyz",
]


@given(st.lists(st.sampled_from(_WORDS), min_size=1, max_size=5))
@settings(**SETTINGS)
def test_categorizer_distributed_equals_python(sp, words):
    from aden_hive_fork_spark.state.categorizer import categorize_errors
    from aden_hive_fork_spark.state.testcase import (
        TestResult,
        categorize_result,
    )

    text = " ".join(words)
    row = categorize_errors(
        sp.createDataFrame([(text,)], "error string"), "error"
    ).collect()[0]
    cat, conf = categorize_result(
        TestResult(test_id="t", passed=False, error_message=text)
    )
    assert row["category"] == cat
    assert row["confidence"] == pytest.approx(conf, abs=0)
