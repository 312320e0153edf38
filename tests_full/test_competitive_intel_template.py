"""Integration test: the reference's competitive_intel_agent template
— the conditional GitHub branch + aggregator fan-in as data routing,
multi-source findings, dedup keeping the most detailed version,
two-cycle historical comparison, digest delivery, criteria."""

from __future__ import annotations

import json
import os

import pytest

from aden_hive_fork_spark.plans.competitive_intel import (
    build_competitive_intel_pipeline,
    evaluate_success_criteria,
)
from aden_hive_fork_spark.sources.search_source import (
    FixtureSearchProvider,
)

SITE_A = "https://acme.example"
SITE_B = "https://beta.example"


def _transport_factory(day2: bool = False):
    extra = (
        "<p>2026-02-05 — Acme launches realtime analytics tier</p>"
        if day2 else ""
    )
    pages = {
        SITE_A: (
            "<html><body>"
            "<p>2026-02-01 — Acme announces new pricing tier</p>"
            "<p>2026-02-02 — Acme adds support for parquet import</p>"
            f"{extra}</body></html>"
        ),
        SITE_B: (
            "<html><body>"
            "<p>2026-02-01 — Beta raised Series B funding</p>"
            "</body></html>"
        ),
    }

    def factory():
        def transport(url):
            body = pages.get(url)
            if body is None:
                return {"status": 404, "error": "http_404"}
            return {"status": 200, "body": body}

        return transport

    return factory


def _provider_factory():
    docs = [
        {"title": "Acme pricing news",
         "url": "https://news.example/acme-pricing",
         # the SAME update as the site, more detailed -> dedup must
         # keep this version and count 2 sources
         "text": "2026-02-01 — Acme announces new pricing tier for "
                 "enterprise customers"},
        {"title": "Beta funding",
         "url": "https://news.example/beta-funding",
         "text": "2026-02-01 — Beta raised Series B funding"},
        {"title": "Unrelated",
         "url": "https://news.example/x",
         "text": "2026-02-01 — Gamma does something else"},
    ]
    return lambda: FixtureSearchProvider(docs)


def _github_factory():
    from aden_hive_fork_spark.sources.github_source import (
        GITHUB_API_BASE,
        GitHubClient,
    )

    def factory():
        def transport(method, url, params=None, json_body=None,
                      headers=None):
            if url == f"{GITHUB_API_BASE}/users/acme-oss/repos":
                return 200, json.dumps([
                    {"name": "engine", "description": "query engine",
                     "html_url": "https://github.com/acme-oss/engine",
                     "pushed_at": "2026-02-03T10:00:00Z"},
                ]).encode()
            return 404, b"{}"

        return GitHubClient("tok", transport)

    return factory


def _run(spark, tmp_path, day2=False):
    pipe = build_competitive_intel_pipeline(
        transport_factory=_transport_factory(day2),
        provider_factory=_provider_factory(),
        github_client_factory=_github_factory(),
    )
    as_of = "2026-02-06" if day2 else "2026-02-04"
    df = spark.createDataFrame(
        [(0, f"Acme={SITE_A} github:acme-oss; Beta={SITE_B}",
          "pricing, funding", as_of, str(tmp_path / "d0"))],
        "run_id long, competitors_input string, focus_areas string, "
        "as_of string, data_dir string",
    )
    return pipe, pipe.run(df)["report"].collect()


def test_first_cycle_findings_and_branch(spark, tmp_path):
    pipe, rows = _run(spark, tmp_path)
    assert len(rows) == 1
    r = rows[0]
    assert r["report_delivered"] and os.path.exists(r["report_file"])
    # web (2 Acme + 1 Beta) + github (1) findings, the duplicated
    # pricing update deduped with the news copy
    assert r["n_findings"] == 4
    assert r["n_structured"] == r["n_findings"]  # structured 100%
    assert r["n_competitors"] == 2 and r["n_github_orgs"] == 1
    # no history on the first cycle
    assert not r["historical_comparison"]
    # the conditional branch executed (github node in the trace)
    assert "github-monitor" in pipe.last_trace
    html = open(r["report_file"]).read()
    # dedup kept the MOST DETAILED version (the news copy) and the
    # digest attributes every finding to a source link
    assert "enterprise customers" in html
    assert html.count("<a href='") >= 4
    assert "[github_activity] pushed engine" in html


def test_second_cycle_uses_history_for_trends(spark, tmp_path):
    _run(spark, tmp_path)  # day 1 writes snapshot_2026-02-04.json
    pipe, rows = _run(spark, tmp_path, day2=True)
    r = rows[0]
    assert r["historical_comparison"]  # prior snapshot loaded
    assert r["n_findings"] == 5  # day-2 launch finding appears
    assert r["n_trends"] >= 1  # Acme product_launch 0 -> 1
    html = open(r["report_file"]).read()
    assert "realtime analytics tier" in html
    # snapshots for both cycles now exist
    files = os.listdir(str(tmp_path / "d0"))
    assert "snapshot_2026-02-04.json" in files
    assert "snapshot_2026-02-06.json" in files


def test_no_github_run_skips_branch(spark, tmp_path):
    pipe = build_competitive_intel_pipeline(
        transport_factory=_transport_factory(),
        provider_factory=_provider_factory(),
        github_client_factory=_github_factory(),
    )
    df = spark.createDataFrame(
        [(1, f"Beta={SITE_B}", "funding", "2026-02-04",
          str(tmp_path / "d1"))],
        "run_id long, competitors_input string, focus_areas string, "
        "as_of string, data_dir string",
    )
    rows = pipe.run(df)["report"].collect()
    assert rows[0]["n_github_orgs"] == 0
    assert rows[0]["n_findings"] == 1  # Beta funding only
    html = open(rows[0]["report_file"]).read()
    assert "github_activity" not in html


def test_success_criteria(spark, tmp_path):
    _run(spark, tmp_path)
    _, rows = _run(spark, tmp_path, day2=True)
    reports = spark.createDataFrame(rows)
    crits = {
        r["criterion"]: r
        for r in evaluate_success_criteria(reports).collect()
    }
    assert len(crits) == 4
    assert all(r["passed"] for r in crits.values()), crits
    assert abs(sum(r["weight"] for r in crits.values()) - 1.0) < 1e-9
