"""News retrieval clients — the reference news tool's dual-provider
stack (NewsData / Finlight) with normalized article envelopes and
sentiment scores.

Reference analogs (envelope parity, verified field-by-field):
tools/src/aden_tools/tools/news_tool/news_tool.py —
``news_search`` (:305-360), ``news_headlines`` (:363-411),
``news_by_company`` (:413-470), ``news_sentiment`` (:472-522);
provider clients ``_search_newsdata`` (:168-216, GET, live vs archive
URL switch) and ``_search_finlight`` (:218-268, POST JSON,
``X-API-KEY``), error maps (:63-89), article normalization (:91-123),
sentiment normalization (:125-142), primary→fallback chaining
(:277-303).

Transports are the pluggable seams shared with the search/vision/LLM
adapters: GET via ``search_source.FixtureGetTransport`` /
``get_http_transport``; POST via this module's
``FixturePostTransport`` / ``post_http_transport``. The SAME request
building, retry, error mapping and parsing code runs against live
HTTP or recorded fixtures.

Two tiers, by cardinality: the driver clients above are the
reference's interactive shape; ``news_search_table`` runs a TABLE of
queries on the executors (``mapInPandas``, map-only, per-row error
envelopes) and yields normal article rows for downstream dedup /
sentiment aggregation.
"""

from __future__ import annotations

import json
from datetime import date, timedelta
from typing import Iterator

from pyspark.sql import DataFrame

NEWSDATA_URL = "https://newsdata.io/api/1/news"
NEWSDATA_ARCHIVE_URL = "https://newsdata.io/api/1/archive"
FINLIGHT_URL = "https://api.finlight.me/v2/articles"


def _normalize_limit(limit: int | None, default: int = 10) -> int:
    if limit is None:
        return default
    return max(limit, 1)


def _clean_params(params: dict) -> dict:
    return {k: v for k, v in params.items() if v not in (None, "")}


def build_date_range(days_back: int, today: date | None = None
                     ) -> tuple[str, str]:
    """from/to ISO dates for the past N days (news_tool.py:57-61);
    ``today`` injectable for deterministic tests."""
    end = today or date.today()
    start = end - timedelta(days=days_back)
    return start.isoformat(), end.isoformat()


def format_article(title: str, source: str, published_at: str, url: str,
                   snippet: str, sentiment=None) -> dict:
    """Normalized article payload (news_tool.py:91-109)."""
    payload = {
        "title": title,
        "source": source,
        "date": published_at,
        "url": url,
        "snippet": snippet,
    }
    if sentiment is not None:
        payload["sentiment"] = sentiment
    return payload


def normalize_sentiment(raw) -> float | None:
    """Sentiment → float in [-1, 1] (news_tool.py:125-142): numeric
    clamped; positive/negative/neutral labels mapped; else None."""
    if raw is None:
        return None
    if isinstance(raw, (int, float)) and not isinstance(raw, bool):
        return max(-1.0, min(1.0, float(raw)))
    if isinstance(raw, str):
        return {"positive": 1.0, "negative": -1.0, "neutral": 0.0}.get(
            raw.strip().lower()
        )
    return None


def _retrying(send, max_retries: int, sleep) -> tuple[int, bytes]:
    status, body = 0, b""
    for attempt in range(max_retries + 1):
        status, body = send()
        if status == 429 and attempt < max_retries:
            sleep(2 ** attempt)
            continue
        break
    return status, body


class NewsDataProvider:
    """NewsData API adapter (news_tool.py:168-216): GET with ``apikey``
    param; the archive URL when a date range is given; 429 backoff;
    ``results[] {title, source_id, pubDate, link, description}``.

    ``transport`` is the GET seam ``(url, params, headers) ->
    (status, body)`` — ``get_http_transport`` live,
    ``FixtureGetTransport`` replay (add "apikey" to its excluded
    credential params via the shared key classmethod)."""

    name = "newsdata"

    def __init__(self, api_key: str, transport, *, max_retries: int = 3,
                 sleep=None):
        self.api_key = api_key
        self.transport = transport
        self.max_retries = max_retries
        self.sleep = sleep if sleep is not None else __import__("time").sleep

    def search(self, query=None, from_date=None, to_date=None, language=None,
               limit=10, sources=None, category=None, country=None,
               **_kw) -> dict:
        use_archive = bool(from_date or to_date)
        url = NEWSDATA_ARCHIVE_URL if use_archive else NEWSDATA_URL
        params = _clean_params(
            {
                "apikey": self.api_key,
                "q": query,
                "from_date": from_date if use_archive else None,
                "to_date": to_date if use_archive else None,
                "language": language,
                "category": category,
                "country": country,
                "size": limit,
            }
        )
        if sources:
            params["sources"] = sources
        status, body = _retrying(
            lambda: self.transport(url, params, {}),
            self.max_retries, self.sleep,
        )
        if status != 200:
            return self._error(status, body)
        try:
            data = json.loads(body)
        except ValueError:
            return {"error": "NewsData request failed: HTTP 200"}
        results = [
            format_article(
                title=item.get("title", ""),
                source=item.get("source_id", ""),
                published_at=item.get("pubDate", ""),
                url=item.get("link", ""),
                snippet=item.get("description", ""),
            )
            for item in (data.get("results") or [])
        ]
        return {"results": results, "total": len(results),
                "provider": self.name}

    # error mapping — news_tool.py:63-75 parity
    @staticmethod
    def _error(status: int, body: bytes) -> dict:
        if status == 401:
            return {"error": "Invalid NewsData API key"}
        if status == 429:
            return {"error": "NewsData rate limit exceeded. Try again later."}
        if status == 422:
            try:
                detail = json.loads(body).get("results", {}).get(
                    "message", body.decode("utf-8", "replace")
                )
            except Exception:
                detail = body.decode("utf-8", "replace")
            return {"error": f"Invalid NewsData parameters: {detail}"}
        return {"error": f"NewsData request failed: HTTP {status}"}


class FinlightProvider:
    """Finlight API adapter (news_tool.py:218-268): POST JSON with
    ``X-API-KEY`` header; sources split to a list, country uppercased
    to ``countries``; 429 backoff; articles parsed from
    ``articles``/``data``/``results`` with publishDate/link/summary
    field fallbacks and optional normalized sentiment.

    ``transport`` is the POST seam ``(url, json_body, headers) ->
    (status, body)``."""

    name = "finlight"

    def __init__(self, api_key: str, transport, *, max_retries: int = 3,
                 sleep=None):
        self.api_key = api_key
        self.transport = transport
        self.max_retries = max_retries
        self.sleep = sleep if sleep is not None else __import__("time").sleep

    def search(self, query=None, from_date=None, to_date=None, language=None,
               limit=10, sources=None, category=None, country=None,
               include_sentiment: bool = False, **_kw) -> dict:
        if not query and category:
            query = category
        body: dict = {
            "query": query,
            "from": from_date,
            "to": to_date,
            "language": language,
            "pageSize": limit,
            "page": 1,
        }
        if sources:
            body["sources"] = [s.strip() for s in sources.split(",")
                               if s.strip()]
        if country:
            body["countries"] = [country.upper()]
        json_body = {k: v for k, v in body.items() if v not in (None, "", [])}
        headers = {"X-API-KEY": self.api_key, "Accept": "application/json"}
        status, raw = _retrying(
            lambda: self.transport(FINLIGHT_URL, json_body, headers),
            self.max_retries, self.sleep,
        )
        if status != 200:
            return self._error(status, raw)
        try:
            data = json.loads(raw)
        except ValueError:
            return {"error": "Finlight request failed: HTTP 200"}
        raw_results = (data.get("articles") or data.get("data")
                       or data.get("results") or [])
        results = []
        for item in raw_results:
            sentiment = None
            if include_sentiment:
                sentiment = normalize_sentiment(
                    item.get("sentiment") or item.get("sentiment_score")
                )
            results.append(
                format_article(
                    title=item.get("title", ""),
                    source=item.get("source", ""),
                    published_at=item.get("publishDate", "")
                    or item.get("published_at", ""),
                    url=item.get("link", "") or item.get("url", ""),
                    snippet=item.get("summary", "")
                    or item.get("description", ""),
                    sentiment=sentiment,
                )
            )
        return {"results": results, "total": len(results),
                "provider": self.name}

    # error mapping — news_tool.py:77-89 parity
    @staticmethod
    def _error(status: int, body: bytes) -> dict:
        if status == 401:
            return {"error": "Invalid Finlight API key"}
        if status == 429:
            return {"error": "Finlight rate limit exceeded. Try again later."}
        if status == 422:
            try:
                detail = json.loads(body).get(
                    "message", body.decode("utf-8", "replace")
                )
            except Exception:
                detail = body.decode("utf-8", "replace")
            return {"error": f"Invalid Finlight parameters: {detail}"}
        return {"error": f"Finlight request failed: HTTP {status}"}


def post_http_transport(timeout: float = 30.0):
    """Live POST-JSON transport (stdlib urllib; fixture-replayed in
    this sandbox — request/parse layers are transport-agnostic)."""

    def send(url: str, json_body: dict, headers: dict) -> tuple[int, bytes]:
        import urllib.error
        import urllib.request

        data = json.dumps(json_body).encode()
        req = urllib.request.Request(
            url, data=data,
            headers={"Content-Type": "application/json", **headers},
        )
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return resp.status, resp.read()
        except urllib.error.HTTPError as e:
            return e.code, e.read()

    return send


class FixturePostTransport:
    """Record/replay POST transport: responses keyed by (url,
    canonical-JSON body). Credential headers are NOT in the key, so
    fixtures recorded under one key replay under any."""

    def __init__(self, fixtures: dict | None = None, live=None):
        self.fixtures: dict[tuple, tuple[int, bytes]] = dict(fixtures or {})
        self.live = live
        self.requests: list[tuple[str, dict, dict]] = []

    @staticmethod
    def key(url: str, json_body: dict) -> tuple:
        return (url, json.dumps(json_body, sort_keys=True))

    def __call__(self, url, json_body, headers) -> tuple[int, bytes]:
        self.requests.append((url, dict(json_body), dict(headers)))
        k = self.key(url, json_body)
        if k in self.fixtures:
            return self.fixtures[k]
        if self.live is not None:
            resp = self.live(url, json_body, headers)
            self.fixtures[k] = resp
            return resp
        return 404, b'{"message": "no fixture for request"}'


# ---------------------------------------------------------------------------
# provider chaining + public envelopes (news_tool.py:270-522)
# ---------------------------------------------------------------------------
_NO_CREDS = {
    "error": "No news credentials configured",
    "help": "Set NEWSDATA_API_KEY or FINLIGHT_API_KEY environment variable",
}


def _try_provider(provider, **kwargs) -> dict:
    try:
        return provider.search(**kwargs)
    except Exception as e:  # transport failures are data, not crashes
        return {"error": f"Network error: {e}"}


def _search_with_fallback(primary, fallback, search_kwargs: dict) -> dict:
    """Primary then fallback chaining (news_tool.py:277-303): the
    fallback runs only when the primary errored; both failing returns
    the combined error envelope."""
    first = (
        _try_provider(primary, **search_kwargs)
        if primary else {"error": "NewsData credentials not configured"}
    )
    if "error" not in first:
        return first
    if not fallback:
        return first
    second = _try_provider(fallback, **search_kwargs)
    if "error" not in second:
        return second
    return {
        "error": "All providers failed",
        "providers": {"primary": first, "fallback": second},
    }


def news_search(query: str, from_date=None, to_date=None, language="en",
                limit=10, sources=None, category=None, country=None,
                primary=None, fallback=None) -> dict:
    """Filtered article search (news_tool.py:305-360)."""
    if not query:
        return {"error": "Query is required"}
    if not primary and not fallback:
        return dict(_NO_CREDS)
    result = _search_with_fallback(
        primary, fallback,
        {
            "query": query, "from_date": from_date, "to_date": to_date,
            "language": language, "limit": _normalize_limit(limit),
            "sources": sources, "category": category, "country": country,
        },
    )
    result["query"] = query
    return result


def news_headlines(category: str, country: str, limit=10,
                   primary=None, fallback=None) -> dict:
    """Top headlines by category/country (news_tool.py:363-411)."""
    if not category:
        return {"error": "Category is required"}
    if not country:
        return {"error": "Country is required"}
    if not primary and not fallback:
        return dict(_NO_CREDS)
    result = _search_with_fallback(
        primary, fallback,
        {
            "query": None, "from_date": None, "to_date": None,
            "language": None, "limit": _normalize_limit(limit),
            "sources": None, "category": category, "country": country,
        },
    )
    result["category"] = category
    result["country"] = country
    return result


def news_by_company(company_name: str, days_back: int = 7, limit=10,
                    language="en", primary=None, fallback=None,
                    today: date | None = None) -> dict:
    """Company-mention news over a trailing window
    (news_tool.py:413-470): exact-phrase query, date range from
    ``days_back``."""
    if not company_name:
        return {"error": "Company name is required"}
    if days_back < 0:
        return {"error": "days_back must be 0 or greater"}
    if not primary and not fallback:
        return dict(_NO_CREDS)
    from_date, to_date = build_date_range(days_back, today=today)
    result = _search_with_fallback(
        primary, fallback,
        {
            "query": f'"{company_name}"', "from_date": from_date,
            "to_date": to_date, "language": language,
            "limit": _normalize_limit(limit), "sources": None,
            "category": None, "country": None,
        },
    )
    result["company_name"] = company_name
    result["days_back"] = days_back
    return result


def news_sentiment(query: str, from_date=None, to_date=None,
                   finlight=None) -> dict:
    """Sentiment-scored news (news_tool.py:472-522) — Finlight only;
    each article carries a normalized sentiment in [-1, 1]."""
    if not query:
        return {"error": "Query is required"}
    if finlight is None:
        return {
            "error": "Finlight credentials not configured",
            "help": "Set FINLIGHT_API_KEY environment variable",
        }
    try:
        result = finlight.search(
            query=query, from_date=from_date, to_date=to_date,
            language=None, limit=_normalize_limit(None), sources=None,
            category=None, country=None, include_sentiment=True,
        )
    except Exception as e:
        return {"error": f"News sentiment failed: {e}"}
    result["query"] = query
    return result


# ---------------------------------------------------------------------------
# distributed tier: a TABLE of queries fanned out on the executors
# ---------------------------------------------------------------------------
NEWS_SCHEMA = (
    "query string, title string, source string, date string, url string,"
    " snippet string, sentiment double, provider string, error string"
)


def news_search_table(queries: DataFrame, provider_factory,
                      query_col: str = "query", limit: int = 10,
                      include_sentiment: bool = False) -> DataFrame:
    """Run a table of news queries ON THE EXECUTORS (``mapInPandas``
    — map-only, no shuffle): one output row per article, per-row
    error envelopes (a failed query yields one row with ``error``
    set). ``provider_factory`` builds the per-executor provider and
    must pickle by value (lambda/closure)."""
    import pandas as pd

    cols = [f.split()[0] for f in NEWS_SCHEMA.split(",")]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        provider = provider_factory()
        for pdf in batches:
            rows = []
            for q in pdf[query_col]:
                kw = {"query": str(q), "limit": limit}
                if include_sentiment:
                    kw["include_sentiment"] = True
                env = _try_provider(provider, **kw)
                if "error" in env:
                    rows.append(
                        {"query": q, "title": None, "source": None,
                         "date": None, "url": None, "snippet": None,
                         "sentiment": None, "provider": None,
                         "error": env["error"]}
                    )
                    continue
                for art in env["results"]:
                    rows.append(
                        {"query": q, "title": art["title"],
                         "source": art["source"], "date": art["date"],
                         "url": art["url"], "snippet": art["snippet"],
                         "sentiment": art.get("sentiment"),
                         "provider": env["provider"], "error": None}
                    )
            yield pd.DataFrame(rows, columns=cols)

    return queries.select(query_col).mapInPandas(run, NEWS_SCHEMA)
