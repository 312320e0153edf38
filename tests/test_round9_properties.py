"""Differential property tests for the round-9 operators: Spark
results vs exact plain-Python models on randomized inputs (the
round-7/8 discipline — few examples, exact models, loud failures)."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pytest

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def sp():
    from aden_hive_fork_spark.session import build_session

    return build_session(
        app_name="r9-props", cpus=4, shuffle_partitions=5
    )


# ---------------------------------------------------------------------------
# langid ≡ plain-Python Cavnar–Trenkle (profiles AND classification)
# ---------------------------------------------------------------------------


def _norm(t: str) -> str:
    return re.sub(r"\s+", " ", t.lower())


def _grams(t: str, n: int = 3):
    t = _norm(t)
    return [t[i : i + n] for i in range(len(t) - n + 1)] if len(t) >= n else []


def _model_profiles(rows, p):
    from collections import Counter

    by_lang: dict[str, Counter] = {}
    for _id, text, lang in rows:
        by_lang.setdefault(lang, Counter()).update(_grams(text))
    prof = {}
    for lang, cnt in by_lang.items():
        if not cnt:
            continue
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:p]
        prof[lang] = {
            g: (rank + 1, c) for rank, (g, c) in enumerate(ranked)
        }
    return prof


def _model_classify(rows, prof, p):
    from collections import Counter

    out = {}
    langs = sorted(prof)
    for _id, text, _ in rows:
        cnt = Counter(_grams(text))
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:p]
        doc_rank = {g: r + 1 for r, (g, _c) in enumerate(ranked)}
        k = len(doc_rank)
        best = None
        for lang in langs:
            d = sum(
                abs(dr - prof[lang][g][0]) if g in prof[lang] else p
                for g, dr in doc_rank.items()
            )
            if best is None or (d, lang) < best:
                best = (d, lang)
        out[_id] = (best[1], best[0], k)
    return out


_WORDS = st.lists(
    st.text(alphabet="abcdefgé ", min_size=0, max_size=12),
    min_size=1,
    max_size=8,
)


@given(
    st.lists(
        st.tuples(_WORDS, st.sampled_from(["aa", "bb", "cc"])),
        min_size=2,
        max_size=12,
    ),
    st.sampled_from([5, 20]),
)
@settings(**SETTINGS)
def test_langid_matches_python_model(sp, docs, p):
    from aden_hive_fork_spark.operators.langid import (
        langid_classify,
        langid_profiles,
    )

    rows = [
        (i, " ".join(words), lang) for i, (words, lang) in enumerate(docs)
    ]
    df = sp.createDataFrame(rows, "doc_id bigint, text string, lang string")
    prof_model = _model_profiles(rows, p)
    if not prof_model:
        return  # no grams anywhere -> empty profile, nothing to compare
    prof = langid_profiles(df, profile_size=p)
    got_prof = {
        (r["lang"], r["gram"]): (r["rank"], r["gram_count"])
        for r in prof.collect()
    }
    want_prof = {
        (lang, g): rc
        for lang, d in prof_model.items()
        for g, rc in d.items()
    }
    assert got_prof == want_prof

    got = {
        r["doc_id"]: (r["pred_lang"], r["distance"], r["n_doc_grams"])
        for r in langid_classify(df, prof, profile_size=p).collect()
    }
    want = _model_classify(rows, prof_model, p)
    assert got == want


# ---------------------------------------------------------------------------
# streaming Holt-Winters ≡ batch at EVERY split point
# ---------------------------------------------------------------------------
@given(st.integers(8, 24), st.integers(1, 22))
@settings(**SETTINGS)
def test_hw_stream_split_invariance(sp, tmp_path_factory, n, cut):
    from aden_hive_fork_spark.operators.timeseries import holt_winters
    from aden_hive_fork_spark.streaming.hw_stream import (
        init_holt_winters,
        merge_holt_winters_batch,
        read_holt_winters,
    )

    cut = min(cut, n - 1)
    rows = [
        (1, t, 10.0 + 0.3 * t + [1.0, -2.0, 0.5, 3.0][t % 4])
        for t in range(n)
    ]
    path = str(tmp_path_factory.mktemp("hw"))
    init_holt_winters(
        sp, path, ["k"], "t", "x", period=4, alpha=0.4, beta=0.2, gamma=0.3
    )
    schema = "k bigint, t bigint, x double"
    merge_holt_winters_batch(sp.createDataFrame(rows[:cut], schema), 0, path)
    merge_holt_winters_batch(sp.createDataFrame(rows[cut:], schema), 1, path)
    streamed = [
        r.asDict() for r in read_holt_winters(sp, path, horizon=2).collect()
    ]
    batch = [
        r.asDict()
        for r in holt_winters(
            sp.createDataFrame(rows, schema), ["k"], "t", "x",
            period=4, alpha=0.4, beta=0.2, gamma=0.3, horizon=2,
        ).collect()
    ]
    assert streamed == batch
