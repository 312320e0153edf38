"""News-tool conformance tests: NewsData/Finlight wire shapes, error
maps, sentiment normalization, provider fallback chaining, and the
distributed query-table tier — all replayed through fixture
transports (news_tool.py parity)."""

from __future__ import annotations

import json
from datetime import date

from aden_hive_fork_spark.sources.news_source import (
    FinlightProvider,
    FixturePostTransport,
    NewsDataProvider,
    NEWSDATA_ARCHIVE_URL,
    NEWSDATA_URL,
    FINLIGHT_URL,
    build_date_range,
    news_by_company,
    news_headlines,
    news_search,
    news_search_table,
    news_sentiment,
    normalize_sentiment,
)
from aden_hive_fork_spark.sources.search_source import FixtureGetTransport

NEWSDATA_BODY = json.dumps(
    {
        "status": "success",
        "results": [
            {
                "title": "Spark 4 released",
                "source_id": "techwire",
                "pubDate": "2026-08-01 10:00:00",
                "link": "https://news.example/spark4",
                "description": "Apache Spark 4 ships AQE improvements.",
            },
            {
                "title": "Lakehouse trends",
                "source_id": "dataweekly",
                "pubDate": "2026-08-02 09:00:00",
                "link": "https://news.example/lakehouse",
                "description": "Open table formats converge.",
            },
        ],
    }
).encode()

FINLIGHT_BODY = json.dumps(
    {
        "articles": [
            {
                "title": "ACME earnings beat",
                "source": "finwire",
                "publishDate": "2026-08-03T12:00:00Z",
                "link": "https://news.example/acme",
                "summary": "ACME posts record quarter.",
                "sentiment": "positive",
            },
            {
                "title": "ACME recall",
                "source": "finwire",
                "published_at": "2026-08-04T12:00:00Z",
                "url": "https://news.example/recall",
                "description": "Widget recall announced.",
                "sentiment_score": -0.6,
            },
        ]
    }
).encode()


def newsdata_fixture(params, status=200, body=NEWSDATA_BODY, archive=False):
    t = FixtureGetTransport()
    url = NEWSDATA_ARCHIVE_URL if archive else NEWSDATA_URL
    t.fixtures[FixtureGetTransport.key(url, params)] = (status, body)
    return t


def finlight_fixture(body_params, status=200, body=FINLIGHT_BODY):
    t = FixturePostTransport()
    t.fixtures[FixturePostTransport.key(FINLIGHT_URL, body_params)] = (
        status, body,
    )
    return t


# ---------------------------------------------------------------------------
# providers
# ---------------------------------------------------------------------------
def test_newsdata_live_url_and_envelope():
    t = newsdata_fixture({"q": "spark", "language": "en", "size": 10})
    p = NewsDataProvider("KEY", t)
    out = p.search(query="spark", language="en", limit=10)
    assert out["provider"] == "newsdata" and out["total"] == 2
    assert out["results"][0] == {
        "title": "Spark 4 released",
        "source": "techwire",
        "date": "2026-08-01 10:00:00",
        "url": "https://news.example/spark4",
        "snippet": "Apache Spark 4 ships AQE improvements.",
    }
    url, params, _ = t.requests[0]
    assert url == NEWSDATA_URL  # no dates → live endpoint
    assert params["apikey"] == "KEY" and "from_date" not in params


def test_newsdata_archive_url_when_dated():
    t = newsdata_fixture(
        {"q": "spark", "from_date": "2026-07-01", "to_date": "2026-07-31",
         "language": "en", "size": 5},
        archive=True,
    )
    out = NewsDataProvider("K", t).search(
        query="spark", from_date="2026-07-01", to_date="2026-07-31",
        language="en", limit=5,
    )
    assert out["total"] == 2
    assert t.requests[0][0] == NEWSDATA_ARCHIVE_URL


def test_newsdata_error_map():
    for status, msg in {
        401: "Invalid NewsData API key",
        429: "NewsData rate limit exceeded. Try again later.",
        500: "NewsData request failed: HTTP 500",
    }.items():
        p = NewsDataProvider(
            "K", lambda u, q, h: (status, b"{}"), sleep=lambda s: None
        )
        assert p.search(query="x") == {"error": msg}
    # 422 carries the API's own message
    detail = json.dumps({"results": {"message": "bad size"}}).encode()
    p = NewsDataProvider("K", lambda u, q, h: (422, detail))
    assert p.search(query="x") == {
        "error": "Invalid NewsData parameters: bad size"
    }


def test_newsdata_retries_429():
    calls, sleeps = {"n": 0}, []

    def t(u, q, h):
        calls["n"] += 1
        return (429, b"{}") if calls["n"] < 3 else (200, NEWSDATA_BODY)

    out = NewsDataProvider("K", t, sleep=sleeps.append).search(query="x")
    assert out["total"] == 2 and sleeps == [1, 2]


def test_finlight_wire_shape_and_sentiment():
    body = {"query": "ACME", "pageSize": 10, "page": 1,
            "countries": ["US"], "sources": ["finwire"]}
    t = finlight_fixture(body)
    p = FinlightProvider("TOKEN", t)
    out = p.search(query="ACME", limit=10, country="us",
                   sources="finwire", include_sentiment=True)
    assert out["provider"] == "finlight" and out["total"] == 2
    # label → 1.0; numeric passthrough; field fallbacks exercised
    assert out["results"][0]["sentiment"] == 1.0
    assert out["results"][1] == {
        "title": "ACME recall", "source": "finwire",
        "date": "2026-08-04T12:00:00Z",
        "url": "https://news.example/recall",
        "snippet": "Widget recall announced.", "sentiment": -0.6,
    }
    url, jbody, headers = t.requests[0]
    assert url == FINLIGHT_URL
    assert jbody == body
    assert headers["X-API-KEY"] == "TOKEN"


def test_finlight_error_map():
    p = FinlightProvider("T", lambda u, b, h: (401, b""))
    assert p.search(query="x") == {"error": "Invalid Finlight API key"}
    detail = json.dumps({"message": "bad page"}).encode()
    p = FinlightProvider("T", lambda u, b, h: (422, detail))
    assert p.search(query="x") == {
        "error": "Invalid Finlight parameters: bad page"
    }


def test_normalize_sentiment_rules():
    assert normalize_sentiment(None) is None
    assert normalize_sentiment(0.4) == 0.4
    assert normalize_sentiment(7) == 1.0  # clamped
    assert normalize_sentiment(-3.5) == -1.0
    assert normalize_sentiment(" Positive ") == 1.0
    assert normalize_sentiment("negative") == -1.0
    assert normalize_sentiment("neutral") == 0.0
    assert normalize_sentiment("meh") is None
    assert normalize_sentiment([1]) is None


# ---------------------------------------------------------------------------
# public envelopes + fallback chaining
# ---------------------------------------------------------------------------
class _StubProvider:
    def __init__(self, result):
        self.result = result
        self.calls = []

    def search(self, **kw):
        self.calls.append(kw)
        if isinstance(self.result, Exception):
            raise self.result
        return dict(self.result)


def ok(provider_name="newsdata"):
    return {"results": [], "total": 0, "provider": provider_name}


def test_news_search_validation_and_fallback():
    assert news_search("") == {"error": "Query is required"}
    out = news_search("x")
    assert out["error"] == "No news credentials configured"

    # primary ok → fallback never called
    p, f = _StubProvider(ok()), _StubProvider(ok("finlight"))
    out = news_search("spark", primary=p, fallback=f)
    assert out["provider"] == "newsdata" and out["query"] == "spark"
    assert f.calls == []

    # primary fails → fallback result
    p = _StubProvider({"error": "boom"})
    out = news_search("spark", primary=p, fallback=f)
    assert out["provider"] == "finlight"

    # both fail → combined envelope
    f2 = _StubProvider(RuntimeError("down"))
    out = news_search("spark", primary=p, fallback=f2)
    assert out["error"] == "All providers failed"
    assert out["providers"]["primary"] == {"error": "boom"}
    assert out["providers"]["fallback"]["error"].startswith("Network error")


def test_news_headlines_envelope():
    assert news_headlines("", "us") == {"error": "Category is required"}
    assert news_headlines("tech", "") == {"error": "Country is required"}
    p = _StubProvider(ok())
    out = news_headlines("tech", "us", primary=p)
    assert out["category"] == "tech" and out["country"] == "us"
    # headlines pass category/country, not query
    assert p.calls[0]["query"] is None
    assert p.calls[0]["category"] == "tech"


def test_news_by_company_date_window():
    assert news_by_company("") == {"error": "Company name is required"}
    assert news_by_company("ACME", days_back=-1) == {
        "error": "days_back must be 0 or greater"
    }
    p = _StubProvider(ok())
    out = news_by_company(
        "ACME Corp", days_back=7, primary=p, today=date(2026, 8, 14)
    )
    assert out["company_name"] == "ACME Corp" and out["days_back"] == 7
    kw = p.calls[0]
    assert kw["query"] == '"ACME Corp"'
    assert kw["from_date"] == "2026-08-07" and kw["to_date"] == "2026-08-14"
    assert build_date_range(0, date(2026, 8, 14)) == (
        "2026-08-14", "2026-08-14"
    )


def test_news_sentiment_finlight_only():
    assert news_sentiment("") == {"error": "Query is required"}
    out = news_sentiment("ACME")
    assert out["error"] == "Finlight credentials not configured"
    body = {"query": "ACME", "pageSize": 10, "page": 1}
    p = FinlightProvider("T", finlight_fixture(body))
    out = news_sentiment("ACME", finlight=p)
    assert out["query"] == "ACME"
    assert [a["sentiment"] for a in out["results"]] == [1.0, -0.6]


def test_post_fixture_record_mode():
    live_calls = []

    def live(url, body, headers):
        live_calls.append(url)
        return 200, FINLIGHT_BODY

    t = FixturePostTransport(live=live)
    p = FinlightProvider("T", t)
    assert p.search(query="q")["total"] == 2
    assert p.search(query="q")["total"] == 2
    assert len(live_calls) == 1  # second call replayed
    # replay under a different credential (key excludes headers)
    replay = FixturePostTransport(fixtures=t.fixtures)
    assert FinlightProvider("OTHER", replay).search(query="q")["total"] == 2


# ---------------------------------------------------------------------------
# distributed tier
# ---------------------------------------------------------------------------
def test_news_search_table(spark):
    queries = spark.createDataFrame(
        [("spark",), ("failing-query",)], ["query"]
    )

    def factory():
        from aden_hive_fork_spark.sources.news_source import NewsDataProvider

        def transport(url, params, headers):
            if params.get("q") == "spark":
                return 200, NEWSDATA_BODY
            return 401, b"{}"

        return NewsDataProvider("K", transport)

    out = news_search_table(queries, factory).collect()
    by_query = {}
    for r in out:
        by_query.setdefault(r["query"], []).append(r.asDict())
    arts = sorted(by_query["spark"], key=lambda r: r["title"])
    assert len(arts) == 2 and arts[1]["title"] == "Spark 4 released"
    assert arts[1]["provider"] == "newsdata" and arts[1]["error"] is None
    fail = by_query["failing-query"]
    assert len(fail) == 1
    assert fail[0]["error"] == "Invalid NewsData API key"
    assert fail[0]["title"] is None
