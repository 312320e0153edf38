"""Domain-mixture reweighting (operators/mixing): share math,
validation, weight application."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def corpus(spark):
    rows = (
        [("web", i, 100) for i in range(6)]        # 600 tokens
        + [("code", 100 + i, 150) for i in range(2)]  # 300 tokens
        + [("books", 200, 100)]                    # 100 tokens
        + [("spam", 300, 500)]                     # 500 tokens, not in mix
    )
    return spark.createDataFrame(rows, "source string, doc_id int, n_tok int")


TARGET = {"web": 0.5, "code": 0.3, "books": 0.2}


def test_report_shares_weights_epochs(spark, corpus):
    from aden_hive_fork_spark.operators.mixing import domain_mix_report

    rep = {
        r["domain"]: r
        for r in domain_mix_report(
            corpus, "source", "n_tok", TARGET, token_budget=3000
        ).collect()
    }
    # corpus = 1500 tokens total (spam included in measured shares)
    assert rep["web"]["current_share"] == pytest.approx(600 / 1500)
    assert rep["web"]["weight"] == pytest.approx(0.5 / (600 / 1500))
    assert rep["web"]["allocated_tokens"] == 1500
    assert rep["web"]["epochs"] == pytest.approx(1500 / 600)
    assert rep["spam"]["target_share"] == 0.0
    assert rep["spam"]["weight"] == 0.0
    assert rep["spam"]["allocated_tokens"] == 0
    # allocations partition the budget (up to flooring)
    assert sum(r["allocated_tokens"] for r in rep.values()) <= 3000
    assert sum(r["allocated_tokens"] for r in rep.values()) >= 3000 - 3


def test_zero_and_null_lengths_excluded(spark):
    from aden_hive_fork_spark.operators.mixing import domain_mix_report

    df = spark.createDataFrame(
        [("a", 10), ("a", 0), ("a", None), ("b", 10)],
        "source string, n_tok int",
    )
    rep = {
        r["domain"]: r
        for r in domain_mix_report(
            df, "source", "n_tok", {"a": 0.5, "b": 0.5}, 100
        ).collect()
    }
    assert rep["a"]["n_docs"] == 1 and rep["a"]["n_tokens"] == 10


def test_target_validation(spark, corpus):
    from aden_hive_fork_spark.operators.mixing import domain_mix_report

    with pytest.raises(ValueError, match="sum to 1"):
        domain_mix_report(corpus, "source", "n_tok", {"web": 0.5}, 100)
    with pytest.raises(ValueError, match="positive"):
        domain_mix_report(
            corpus, "source", "n_tok", {"web": 1.5, "code": -0.5}, 100
        )
    with pytest.raises(ValueError, match="token_budget"):
        domain_mix_report(corpus, "source", "n_tok", TARGET, 0)


def test_apply_domain_weights(spark, corpus):
    from aden_hive_fork_spark.operators.mixing import (
        apply_domain_weights,
        domain_mix_report,
    )

    rep = domain_mix_report(corpus, "source", "n_tok", TARGET, 3000)
    out = apply_domain_weights(corpus, "source", rep)
    got = {
        r["source"]: r["weight"]
        for r in out.select("source", "weight").distinct().collect()
    }
    assert got["web"] == pytest.approx(1.25)
    assert got["spam"] == 0.0
    assert out.count() == corpus.count()  # no row loss
