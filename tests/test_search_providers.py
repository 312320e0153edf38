"""Conformance tests for the concrete live-search provider adapters
(GoogleSearchProvider / BraveSearchProvider) against recorded wire-shape
fixtures — request params, retry-on-429 backoff, status->error mapping,
and response parsing all match the reference client
(web_search_tool.py:30-139), replayed offline through FixtureGetTransport.
"""

from __future__ import annotations

import json

from aden_hive_fork_spark.sources.search_source import (
    BraveSearchProvider,
    FixtureGetTransport,
    GoogleSearchProvider,
    web_search,
)

GOOGLE_BODY = json.dumps(
    {
        "items": [
            {
                "title": "Apache Spark",
                "link": "https://spark.apache.org/",
                "snippet": "Unified engine for large-scale data analytics.",
            },
            {
                "title": "PySpark docs",
                "link": "https://spark.apache.org/docs/latest/api/python/",
                "snippet": "PySpark is the Python API for Apache Spark.",
            },
        ]
    }
).encode()

BRAVE_BODY = json.dumps(
    {
        "web": {
            "results": [
                {
                    "title": "Apache Spark",
                    "url": "https://spark.apache.org/",
                    "description": "Unified analytics engine.",
                },
            ]
        }
    }
).encode()


def google_fixture(status=200, body=GOOGLE_BODY):
    t = FixtureGetTransport()
    t.fixtures[
        FixtureGetTransport.key(
            GoogleSearchProvider.URL,
            {"q": "apache spark", "num": 10, "lr": "lang_en", "gl": "us"},
        )
    ] = (status, body)
    return t


def brave_fixture(status=200, body=BRAVE_BODY):
    t = FixtureGetTransport()
    t.fixtures[
        FixtureGetTransport.key(
            BraveSearchProvider.URL,
            {"q": "apache spark", "count": 10, "country": "us"},
        )
    ] = (status, body)
    return t


def test_google_success_envelope():
    t = google_fixture()
    p = GoogleSearchProvider("KEY", "CSE", t)
    out = p.search("apache spark")
    assert out == {
        "query": "apache spark",
        "results": [
            {
                "title": "Apache Spark",
                "url": "https://spark.apache.org/",
                "snippet": "Unified engine for large-scale data analytics.",
            },
            {
                "title": "PySpark docs",
                "url": "https://spark.apache.org/docs/latest/api/python/",
                "snippet": "PySpark is the Python API for Apache Spark.",
            },
        ],
        "total": 2,
        "provider": "google",
    }
    # request carried the credential + localization params on the wire
    url, params, headers = t.requests[0]
    assert url == GoogleSearchProvider.URL
    assert params == {
        "key": "KEY",
        "cx": "CSE",
        "q": "apache spark",
        "num": 10,
        "lr": "lang_en",
        "gl": "us",
    }


def test_google_num_clamped_to_10():
    t = google_fixture()
    GoogleSearchProvider("K", "C", t).search("apache spark", num_results=10)
    assert t.requests[0][1]["num"] == 10
    t2 = FixtureGetTransport()
    GoogleSearchProvider("K", "C", t2).search("apache spark", num_results=50)
    assert t2.requests[0][1]["num"] == 10  # reference clamp min(num, 10)


def test_google_error_mapping():
    cases = {
        401: "Invalid Google API key",
        403: "Google API key not authorized or quota exceeded",
        500: "Google API request failed: HTTP 500",
    }
    for status, msg in cases.items():
        p = GoogleSearchProvider("K", "C", google_fixture(status, b"{}"))
        assert p.search("apache spark") == {"error": msg}


def test_google_retries_429_then_succeeds():
    calls = {"n": 0}
    sleeps = []

    def transport(url, params, headers):
        calls["n"] += 1
        if calls["n"] < 3:
            return 429, b"{}"
        return 200, GOOGLE_BODY

    p = GoogleSearchProvider("K", "C", transport, sleep=sleeps.append)
    out = p.search("apache spark")
    assert out["total"] == 2
    assert calls["n"] == 3
    assert sleeps == [1, 2]  # 2**0, 2**1 — reference backoff schedule


def test_google_429_exhausted():
    sleeps = []
    p = GoogleSearchProvider(
        "K", "C", lambda u, q, h: (429, b"{}"), sleep=sleeps.append
    )
    out = p.search("apache spark")
    assert out == {"error": "Google rate limit exceeded. Try again later."}
    assert sleeps == [1, 2, 4]  # max_retries=3 backoffs then give up


def test_brave_success_envelope_and_wire_shape():
    t = brave_fixture()
    p = BraveSearchProvider("TOKEN", t)
    out = p.search("apache spark")
    assert out == {
        "query": "apache spark",
        "results": [
            {
                "title": "Apache Spark",
                "url": "https://spark.apache.org/",
                "snippet": "Unified analytics engine.",
            }
        ],
        "total": 1,
        "provider": "brave",
    }
    url, params, headers = t.requests[0]
    assert url == BraveSearchProvider.URL
    assert params == {"q": "apache spark", "count": 10, "country": "us"}
    assert headers == {
        "X-Subscription-Token": "TOKEN",
        "Accept": "application/json",
    }


def test_brave_count_clamped_to_20():
    t = FixtureGetTransport()
    BraveSearchProvider("T", t).search("x", num_results=99)
    assert t.requests[0][1]["count"] == 20


def test_brave_error_mapping():
    assert BraveSearchProvider("T", lambda u, q, h: (401, b"")).search("x") == {
        "error": "Invalid Brave API key"
    }
    assert BraveSearchProvider("T", lambda u, q, h: (503, b"")).search("x") == {
        "error": "Brave API request failed: HTTP 503"
    }


def test_malformed_json_is_an_error_envelope():
    p = GoogleSearchProvider("K", "C", lambda u, q, h: (200, b"not json"))
    assert p.search("x") == {"error": "Malformed API response"}
    b = BraveSearchProvider("T", lambda u, q, h: (200, b"<html>"))
    assert b.search("x") == {"error": "Malformed API response"}


def test_plugs_into_web_search_auto_selection():
    """The concrete adapters satisfy the provider seam: auto picks the
    first configured backend (reference tries Brave first)."""
    providers = {
        "brave": BraveSearchProvider("T", brave_fixture()),
        "google": GoogleSearchProvider("K", "C", google_fixture()),
    }
    out = web_search("apache spark", providers=providers)
    assert out["provider"] == "brave"
    out = web_search("apache spark", provider="google", providers=providers)
    assert out["provider"] == "google"


def test_fixture_transport_record_mode():
    live_calls = []

    def live(url, params, headers):
        live_calls.append(url)
        return 200, BRAVE_BODY

    t = FixtureGetTransport(live=live)
    p = BraveSearchProvider("T", t)
    assert p.search("apache spark")["total"] == 1
    assert p.search("apache spark")["total"] == 1  # replayed, not re-fetched
    assert len(live_calls) == 1
    # recorded fixtures replay with a DIFFERENT credential (key excluded)
    replay = FixtureGetTransport(fixtures=t.fixtures)
    assert BraveSearchProvider("OTHER", replay).search("apache spark")[
        "total"
    ] == 1
