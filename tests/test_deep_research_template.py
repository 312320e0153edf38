"""Integration test: the reference's flagship deep_research_agent
template (examples/templates/deep_research_agent/agent.py) running
end-to-end on plans.Pipeline with the MockLLMBackend — node path,
feedback-loop fan-out, citations, and success-criteria evaluation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "alpha systems overview with engines and pipelines"),
        (2, "alpha pipelines in production systems"),
        (3, "engines and systems design"),
        (4, "quark flavor experiments"),
        (5, "physics newsletters"),
        (6, "introduction to physics"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.fixture()
def backend():
    from aden_hive_fork_spark.functions.llm_tier import MockLLMBackend

    return MockLLMBackend(
        rules=[
            ("alpha", "study alpha systems engines pipelines"),
            ("quark", "quark flavor physics"),
        ],
        default="unknown topic",
    )


def _run(spark, corpus, backend):
    from aden_hive_fork_spark.plans.deep_research import (
        build_deep_research_pipeline,
    )

    pipe = build_deep_research_pipeline(corpus, backend, top_k=5, min_sources=3)
    topics = spark.createDataFrame(
        [("alpha systems",), ("rare quark",)], "topic string"
    )
    results = pipe.run(topics)
    return pipe, results


def test_terminal_report_rows_and_citations(spark, corpus, backend):
    pipe, results = _run(spark, corpus, backend)
    assert set(results) == {"report"}
    rows = {r["topic"]: r for r in results["report"].collect()}
    assert set(rows) == {"alpha systems", "rare quark"}

    alpha = rows["alpha systems"]
    # first pass already strong: 3 docs with >= 2 matching terms,
    # ranked by score desc (d1: 4 terms, d2: 3, d3: 2)
    assert alpha["sources"] == [1, 2, 3]
    assert alpha["n_sources"] == 3
    assert "[1] doc:1" in alpha["report"]
    assert "[3] doc:3" in alpha["report"]
    assert alpha["has_findings"]

    quark = rows["rare quark"]
    # only reachable through the feedback loop: first pass finds just
    # d4 (2 terms); the broadened pass accepts the 1-term docs d5/d6
    assert quark["sources"] == [4, 5, 6]
    assert quark["n_sources"] == 3


def test_node_path_includes_feedback_loop(spark, corpus, backend):
    pipe, results = _run(spark, corpus, backend)
    results["report"].collect()
    # reference flow: intake -> research -> review fan-out (disjoint
    # row subsets): accepted rows -> report, loop rows -> research ->
    # review -> report. Guards are lazy so the loop edge keeps
    # enqueueing (provably empty) frames until max_visits=3 cuts the
    # cycle — the reference max_node_visits bound, visible here as
    # research appearing exactly 3 times and no 4th.
    assert pipe.last_trace == [
        "intake", "research", "review",
        "research", "report",
        "review", "research", "report",
        "review", "report",
    ]
    assert pipe.last_trace.count("research") == 3  # max_visits bound


def test_first_pass_results_survive_null_feedback_join(spark, backend):
    """Regression: the research join-back must not key on feedback —
    feedback is NULL on the first pass and NULL keys never match in a
    Spark equi-join, which silently dropped every first-pass result
    and routed ALL topics through the relaxed (>= 1 term) feedback
    pass. With the fix, a topic with >= min_sources two-term matches
    is accepted on the FIRST pass, so a 1-term doc that only the
    relaxed pass would admit must NOT appear in its sources."""
    from aden_hive_fork_spark.plans.deep_research import (
        build_deep_research_pipeline,
    )

    rows = [
        (1, "alpha systems overview with engines and pipelines"),
        (2, "alpha pipelines in production systems"),
        (3, "engines and systems design"),
        # 1 brief term only ("pipelines") — admissible ONLY under the
        # relaxed feedback pass; must be excluded when the first pass
        # already satisfies min_sources
        (7, "pipelines everywhere newsletter"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id bigint, text string")
    pipe = build_deep_research_pipeline(corpus, backend, top_k=5, min_sources=3)
    topics = spark.createDataFrame([("alpha systems",)], "topic string")
    out = pipe.run(topics)["report"].collect()
    assert len(out) == 1
    assert out[0]["sources"] == [1, 2, 3]  # doc 7 excluded
    assert out[0]["n_sources"] == 3


def test_zero_hit_topic_still_reports(spark, corpus, backend):
    from aden_hive_fork_spark.plans.deep_research import (
        build_deep_research_pipeline,
    )

    pipe = build_deep_research_pipeline(corpus, backend, min_sources=3)
    topics = spark.createDataFrame([("mystery",),], "topic string")
    # default reply "unknown topic" matches no corpus words with >= 4
    # chars except none -> zero sources; the topic loops once, still
    # finds nothing, and the SECOND review pass accepts it (feedback
    # non-null) so the run terminates with an honest empty report
    out = pipe.run(topics)["report"].collect()
    assert len(out) == 1
    assert out[0]["n_sources"] == 0
    assert not out[0]["has_findings"]
    assert "no findings" in out[0]["report"]


def test_success_criteria_weighted_progress(spark, corpus, backend):
    from aden_hive_fork_spark.plans.deep_research import (
        GOAL,
        evaluate_success_criteria,
    )

    _, results = _run(spark, corpus, backend)
    crit = {
        r["criterion_id"]: r for r in
        evaluate_success_criteria(results["report"]).collect()
    }
    assert set(crit) == {c.id for c in GOAL.success_criteria}
    for cid in crit:
        assert crit[cid]["progress"] == pytest.approx(1.0), cid
    total = sum(r["weight"] * r["progress"] for r in crit.values())
    assert total == pytest.approx(1.0)


def test_goal_metadata_parity():
    from aden_hive_fork_spark.plans.deep_research import GOAL

    assert GOAL.id == "rigorous-interactive-research"
    assert len(GOAL.success_criteria) == 4
    assert sum(c.weight for c in GOAL.success_criteria) == pytest.approx(1.0)
    assert len(GOAL.constraints) == 3


def test_pipeline_on_real_corpus(spark):
    """The capstone on the actual documents table (sf0.001): topics
    built from real corpus vocabulary must research end-to-end."""
    from tests.conftest import SF_SMALL

    from aden_hive_fork_spark.catalog import load_table
    from aden_hive_fork_spark.functions.llm_tier import MockLLMBackend
    from aden_hive_fork_spark.plans.deep_research import (
        build_deep_research_pipeline,
        evaluate_success_criteria,
    )

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    # pick four real words from the corpus so the brief has hits
    words = [
        r["w"]
        for r in docs.select(
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w")
        )
        .filter(F.length("w") >= 6)
        .groupBy("w")
        .count()
        .orderBy(F.desc("count"), "w")
        .limit(4)
        .collect()
    ]
    backend = MockLLMBackend(
        rules=[("corpus", " ".join(words))], default="unmatched"
    )
    pipe = build_deep_research_pipeline(docs, backend, top_k=5, min_sources=3)
    topics = spark.createDataFrame([("corpus topic",)], "topic string")
    report = pipe.run(topics)["report"]
    rows = report.collect()
    assert len(rows) == 1
    assert rows[0]["n_sources"] == 5  # common words -> full top-k
    crit = {
        r["criterion_id"]: r["progress"]
        for r in evaluate_success_criteria(report).collect()
    }
    assert crit["source-diversity"] == 1.0
    assert crit["citation-coverage"] == 1.0
