"""Integration test: the reference's tech_news_reporter template on
plans.Pipeline with a hermetic fixture web — front-page scrape, link
ranking, article fetch + VERIFY replacement, recency filter, chunked
HTML report build, success criteria."""

from __future__ import annotations

import os

import pytest

from aden_hive_fork_spark.plans.tech_news_reporter import (
    FRONT_PAGES,
    build_tech_news_pipeline,
    evaluate_success_criteria,
)

AS_OF = "2026-02-06"


def _make_web():
    """A deterministic 12-article web across the 5 reference front
    pages. a9 404s (the VERIFY step must replace it from the spares);
    a11 is stale (published 3 weeks before as_of — the recency
    constraint must drop it)."""

    def art(i, topic_word, date):
        return (
            f"<html><head><title>Story {i}: {topic_word} news</title>"
            f"</head><body><p>{date} — Story {i} reports {topic_word} "
            f"developments in depth. Second sentence with detail {i}. "
            f"Third sentence filler.</p></body></html>"
        )

    topics = ["AI model", "chip fab", "security breach", "robot fleet",
              "startup funding", "AI LLM", "semiconductor gpu",
              "hack vulnerability", "drone autonomous", "venture seed",
              "neural machine learning", "gpt model"]
    pages = {}
    for i, tw in enumerate(topics):
        date = "2026-02-03" if i != 10 else "2026-01-15"  # a10 stale
        pages[f"https://site.example/a{i}"] = art(i, tw, date)
    # distribute links across the 5 reference front pages
    fronts = list(FRONT_PAGES)
    for fi, fp in enumerate(fronts):
        anchors = "".join(
            f"<a href='https://site.example/a{i}'>Story {i} "
            f"{topics[i]}</a>"
            for i in range(len(topics))
            if i % len(fronts) == fi
        )
        pages[fp] = f"<html><body>{anchors}</body></html>"

    def factory():
        def transport(url):
            if url.endswith("/a9"):
                return {"status": 404, "error": "http_404"}
            body = pages.get(url)
            if body is None:
                return {"status": 404, "error": "http_404"}
            return {"status": 200, "content_type": "text/html",
                    "body": body}

        return transport

    return factory


@pytest.fixture()
def reports(spark, tmp_path):
    pipe = build_tech_news_pipeline(_make_web())
    df = spark.createDataFrame(
        [
            (0, "", AS_OF, str(tmp_path / "d0")),
            (1, "artificial intelligence model news", AS_OF,
             str(tmp_path / "d1")),
        ],
        "brief_id long, brief string, as_of string, data_dir string",
    )
    return pipe.run(df)["compile-report"].collect()


def test_reports_built_and_delivered(reports):
    rows = {r["brief_id"]: r for r in reports}
    assert set(rows) == {0, 1}
    for r in rows.values():
        assert r["report_delivered"]
        assert r["n_articles"] >= 5  # sc-find-articles
        assert r["n_topics"] >= 3  # sc-diverse-topics
        assert r["n_with_url"] == r["n_articles"]  # attribution
        assert os.path.exists(r["report_file"])


def test_verify_replaces_dead_link_and_recency_drops_stale(reports):
    html = {
        r["brief_id"]: open(r["report_file"]).read() for r in reports
    }
    for h in html.values():
        assert "site.example/a9" not in h  # 404 never reported
        assert "site.example/a10" not in h  # stale article dropped
        # structured report: header, TOC, topic sections, cards
        assert "<header>" in h and "class='toc'" in h
        assert "topic-section" in h and "article-card" in h
        assert h.rstrip().endswith("</html>")


def test_brief_relevance_changes_selection(reports):
    html = {
        r["brief_id"]: open(r["report_file"]).read() for r in reports
    }
    # the AI-focused brief front-loads AI stories; its article set
    # differs from the general roundup's
    def urls(h):
        import re

        return set(re.findall(r"https://site\.example/a\d+", h))

    assert urls(html[0]) != urls(html[1])
    ai_urls = urls(html[1])
    # the brief's anchor-keyword hits ("model") rank a0/a11 into the
    # AI-focused selection
    assert {"https://site.example/a0",
            "https://site.example/a11"} <= ai_urls


def test_success_criteria(spark, reports):
    df = spark.createDataFrame(reports)
    crits = {
        r["criterion"]: r
        for r in evaluate_success_criteria(df).collect()
    }
    assert len(crits) == 5
    assert all(r["passed"] for r in crits.values()), crits
    assert abs(sum(r["weight"] for r in crits.values()) - 1.0) < 1e-9
