"""Exa + SerpAPI provider conformance tests: POST/GET wire shapes,
error maps, 429 backoff, camelCase filter params, envelope
flattening (exa_search_tool.py / serpapi_tool.py parity)."""

from __future__ import annotations

from aden_hive_fork_spark.sources.exa_source import (
    EXA_API_BASE,
    ExaSearchProvider,
)
from aden_hive_fork_spark.sources.rest_connector import (
    FixtureRestTransport,
    jdump,
)
from aden_hive_fork_spark.sources.serpapi_source import (
    SERPAPI_BASE,
    SerpAPIClient,
)


# ------------------------------------------------------------------ Exa
def _exa(fixtures, **kw):
    return ExaSearchProvider("k", FixtureRestTransport(fixtures),
                             sleep=lambda s: None, **kw)


def test_exa_search_wire_and_envelope():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "POST", f"{EXA_API_BASE}/search", None,
            {"query": "spark aqe", "numResults": 2,
             "contents": {"text": True},
             "type": "neural", "includeDomains": ["apache.org"],
             "startPublishedDate": "2026-01-01"},
        ): (200, jdump({"results": [
            {"title": "AQE deep dive", "url": "https://apache.org/aqe",
             "publishedDate": "2026-02-01", "author": "j",
             "text": "adaptive plans"},
        ]})),
    })
    p = ExaSearchProvider("k", t, sleep=lambda s: None)
    env = p.search("spark aqe", num_results=2, search_type="neural",
                   include_domains=["apache.org"],
                   start_published_date="2026-01-01")
    assert env["provider"] == "exa" and env["total"] == 1
    assert env["results"][0]["text"] == "adaptive plans"
    # wire: x-api-key header
    assert t.requests[0][4]["x-api-key"] == "k"


def test_exa_num_results_clamped_and_query_validated():
    p = _exa({})
    assert "1-500" in p.search("")["error"]
    assert "1-500" in p.search("x" * 501)["error"]
    t = FixtureRestTransport()
    ExaSearchProvider("k", t, sleep=lambda s: None).search("q", num_results=99)
    assert t.requests[0][3]["numResults"] == 20


def test_exa_429_backoff_then_success():
    calls = {"n": 0}
    sleeps = []

    def transport(method, url, params, json_body, headers):
        calls["n"] += 1
        if calls["n"] < 3:
            return 429, b"{}"
        return 200, jdump({"results": []})

    p = ExaSearchProvider("k", transport, sleep=sleeps.append)
    env = p.search("q")
    assert env["total"] == 0 and calls["n"] == 3
    assert sleeps == [1, 2]  # 2**0, 2**1


def test_exa_error_map():
    for status, expect in [(401, "Invalid Exa API key"),
                           (500, "Exa API request failed: HTTP 500")]:
        def transport(m, u, p, j, h, _s=status):
            return _s, b"{}"
        p = ExaSearchProvider("k", transport, sleep=lambda s: None)
        assert p.search("q")["error"] == expect
    # exhausted retries → rate-limit error
    p = ExaSearchProvider("k", lambda *a: (429, b"{}"), max_retries=1,
                          sleep=lambda s: None)
    assert "rate limit" in p.search("q")["error"].lower()


def test_exa_find_similar_contents_answer():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "POST", f"{EXA_API_BASE}/findSimilar", None,
            {"url": "https://a/x", "numResults": 10,
             "contents": {"text": True}},
        ): (200, jdump({"results": [{"title": "sib", "url": "https://a/y"}]})),
        FixtureRestTransport.key(
            "POST", f"{EXA_API_BASE}/contents", None,
            {"ids": ["https://a/x"], "contents": {"text": True}},
        ): (200, jdump({"results": [{"url": "https://a/x", "title": "X",
                                     "text": "body"}]})),
        FixtureRestTransport.key(
            "POST", f"{EXA_API_BASE}/answer", None, {"query": "why"},
        ): (200, jdump({"answer": "because",
                        "citations": [{"title": "src", "url": "https://s",
                                       "publishedDate": "2026-01-01"}]})),
    })
    p = ExaSearchProvider("k", t, sleep=lambda s: None)
    sim = p.find_similar("https://a/x")
    assert sim["source_url"] == "https://a/x" and sim["total"] == 1
    assert p.find_similar("")["error"] == "URL is required"
    con = p.get_contents(["https://a/x"])
    assert con["results"][0]["text"] == "body"
    assert "Maximum 10" in p.get_contents([f"u{i}" for i in range(11)])["error"]
    ans = p.answer("why")
    assert ans["answer"] == "because"
    assert ans["citations"][0]["published_date"] == "2026-01-01"


# -------------------------------------------------------------- SerpAPI
SCHOLAR_BODY = jdump({
    "search_information": {"total_results": 1200},
    "organic_results": [{
        "title": "Attention is all you need",
        "link": "https://scholar/x",
        "snippet": "transformers",
        "result_id": "R1",
        "publication_info": {
            "summary": "A Vaswani - NeurIPS, 2017",
            "authors": [{"name": "A Vaswani", "author_id": "AV1"}],
        },
        "inline_links": {"cited_by": {"total": 100000, "cites_id": "C1"}},
        "resources": [{"link": "https://pdf/x.pdf"}],
    }],
})


def test_scholar_search_shaping_and_params():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "GET", SERPAPI_BASE,
            {"engine": "google_scholar", "q": "attention", "num": 10,
             "start": 0, "as_ylo": 2015, "scisbd": 1},
        ): (200, SCHOLAR_BODY),
    })
    c = SerpAPIClient("sk", t)
    env = c.scholar_search("attention", year_low=2015, sort_by_date=True)
    assert env["total_results"] == 1200 and env["count"] == 1
    r = env["results"][0]
    assert r["cited_by_count"] == 100000 and r["cites_id"] == "C1"
    assert r["authors"] == [{"name": "A Vaswani", "author_id": "AV1"}]
    assert r["pdf_link"] == "https://pdf/x.pdf"
    assert r["publication_info"] == "A Vaswani - NeurIPS, 2017"
    # api_key rode in params but is excluded from the fixture key
    assert t.requests[0][2]["api_key"] == "sk"


def test_serpapi_error_maps_and_inband_error():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "GET", SERPAPI_BASE, {"engine": "google_scholar_cite", "q": "R1"},
        ): (200, jdump({"error": "Google Scholar hasn't returned results"})),
    })
    env = SerpAPIClient("sk", t).scholar_get_citations("R1")
    assert env["error"].startswith("SerpAPI error: Google Scholar")

    def unauthorized(m, u, p, j, h):
        return 401, b"{}"
    env = SerpAPIClient("sk", unauthorized).scholar_get_citations("R1")
    assert env["error"] == "Invalid SerpAPI API key" and "help" in env


def test_scholar_author_metrics_flattening():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "GET", SERPAPI_BASE,
            {"engine": "google_scholar_author", "author_id": "AV1",
             "start": 0, "num": 20, "sort": "citedby"},
        ): (200, jdump({
            "author": {"name": "A Vaswani", "affiliations": "X Lab",
                       "interests": [{"title": "ML"}, {"title": "NLP"}]},
            "cited_by": {"table": [{"citations": {"all": 150000}},
                                   {"h_index": {"all": 60}}]},
            "articles": [{"title": "Attn", "cited_by": {"value": 100000},
                          "year": "2017"}],
        })),
    })
    env = SerpAPIClient("sk", t).scholar_get_author("AV1")
    assert env["metrics"] == {"citations": {"all": 150000},
                              "h_index": {"all": 60}}
    assert env["interests"] == ["ML", "NLP"]
    assert env["articles"][0]["cited_by_count"] == 100000
    assert env["article_count"] == 1


def test_patents_search_priority_dates_and_details():
    t = FixtureRestTransport({
        FixtureRestTransport.key(
            "GET", SERPAPI_BASE,
            {"engine": "google_patents", "q": "lidar", "page": 1,
             "country": "US", "before": "priority:20240101"},
        ): (200, jdump({
            "search_information": {"total_results": 7},
            "organic_results": [{"title": "Lidar thing",
                                 "patent_id": "patent/US1/en",
                                 "publication_number": "US1",
                                 "inventor": "I", "assignee": "A"}],
        })),
        FixtureRestTransport.key(
            "GET", SERPAPI_BASE, {"engine": "google_patents", "q": "US1"},
        ): (200, jdump({"organic_results": [
            {"title": "Lidar thing", "publication_number": "US1",
             "classifications": {"cpc": "G01S"}}]})),
    })
    c = SerpAPIClient("sk", t)
    env = c.patents_search("lidar", country="US", before_date="20240101")
    assert env["total_results"] == 7 and env["page"] == 1
    assert env["results"][0]["publication_number"] == "US1"
    det = c.patents_get_details("US1")
    assert det["classifications"] == {"cpc": "G01S"}
    # no-results details → explicit error
    t2 = FixtureRestTransport({
        FixtureRestTransport.key(
            "GET", SERPAPI_BASE, {"engine": "google_patents", "q": "NOPE"},
        ): (200, jdump({"organic_results": []})),
    })
    assert "No patent found" in SerpAPIClient("sk", t2).patents_get_details(
        "NOPE")["error"]


def test_serpapi_validations():
    c = SerpAPIClient("sk", FixtureRestTransport())
    assert "1-500" in c.scholar_search("")["error"]
    assert "required" in c.scholar_get_citations("")["error"]
    assert "required" in c.scholar_get_author("")["error"]
    assert "required" in c.patents_get_details("")["error"]
