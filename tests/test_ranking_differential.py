"""Differential tests for the ranking/packing operators: the Spark
plans must agree with independent pure-Python models on randomized
corpora — broader evidence than the single-point oracle queries.

Hypothesis drives corpus shape; each example runs a full Spark job,
so example counts are kept small (the oracle suite and unit tests
carry the volume)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]

doc_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=8).map(" ".join),
    min_size=1,
    max_size=8,
)


def _bm25_python(docs: list[str], query: str, k1=1.2, b=0.75) -> dict[int, float]:
    """Independent BM25 model (plain dicts, no shared code)."""
    toks = [d.split() for d in docs]
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n
    qterms = sorted(set(query.split()))
    scores: dict[int, float] = {}
    for term in qterms:
        df = sum(1 for t in toks if term in t)
        if df == 0:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for i, t in enumerate(toks):
            tf = t.count(term)
            if tf == 0:
                continue
            part = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(t) / avgdl))
            scores[i] = scores.get(i, 0.0) + part
    return {i: round(s, 4) for i, s in scores.items()}


@given(doc_strategy, st.lists(st.sampled_from(WORDS), min_size=1, max_size=3))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bm25_matches_python_model(spark, docs, qwords):
    from aden_hive_fork_spark.sources.search_source import bm25_search

    query = " ".join(qwords)
    ddf = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    qdf = spark.createDataFrame([(1, query)], "qid int, query string")
    got = {
        r.doc_id: r.score
        for r in bm25_search(ddf, qdf, k=len(docs) + 1).collect()
    }
    want = _bm25_python(docs, query)
    assert got == want


@given(
    st.lists(st.integers(1, 50), min_size=1, max_size=12),
    st.integers(8, 64),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pack_sequences_matches_python_model(spark, token_counts, budget):
    from aden_hive_fork_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(i, "s", n) for i, n in enumerate(token_counts)],
        "doc_id long, source string, n long",
    )
    got = {
        r.doc_id: (r.chunk_id, r.chunk_offset)
        for r in pack_sequences(df, "n", budget, ["source"], [F.asc("doc_id")]).collect()
    }
    start = 0
    want = {}
    for i, n in enumerate(token_counts):
        want[i] = (start // budget, start % budget)
        start += n
    assert got == want
