"""Exa search provider — the reference exa tool's four POST
endpoints with envelope parity, on the REST transport seam;
completes the provider family beside Google/Brave/Wikipedia/arXiv
(``search_source``) and NewsData/Finlight (``news_source``).

Reference analogs (tools/src/aden_tools/tools/exa_search_tool/
exa_search_tool.py): ``_make_request`` (:41-82 — POST with x-api-key,
429 exponential backoff, 401/429/!=200 error map); ``exa_search``
(:84-185 — query 1..500, numResults clamp 1..20, camelCase filter
params, ``contents.text/highlights`` flags, flattened
``{query, results[{title,url,published_date,author,...}], total,
provider:'exa'}``); ``exa_find_similar`` (:188-264 — url required,
``{source_url, results, total, provider}``); ``exa_get_contents``
(:268-338 — 1..10 urls via ``ids``); ``exa_answer`` (:340-420 —
``{query, answer, citations[], provider}``).
"""

from __future__ import annotations

import json

EXA_API_BASE = "https://api.exa.ai"

NO_CREDS = {
    "error": "Exa credentials not configured",
    "help": "Set EXA_API_KEY environment variable",
}


class ExaSearchProvider:
    """Exa API client. ``transport(method, url, params, json_body,
    headers) -> (status, bytes)``; ``sleep`` injectable so backoff
    tests run instantly."""

    name = "exa"

    def __init__(self, api_key: str, transport, *, max_retries: int = 3,
                 sleep=None):
        self.api_key = api_key
        self.transport = transport
        self.max_retries = max_retries
        self.sleep = sleep if sleep is not None else __import__("time").sleep

    def _make_request(self, endpoint: str, payload: dict) -> dict:
        status, body = 0, b""
        for attempt in range(self.max_retries + 1):
            status, body = self.transport(
                "POST", f"{EXA_API_BASE}{endpoint}", None, payload,
                {"x-api-key": self.api_key,
                 "Content-Type": "application/json"},
            )
            if status == 429 and attempt < self.max_retries:
                self.sleep(2 ** attempt)
                continue
            break
        if status == 401:
            return {"error": "Invalid Exa API key"}
        if status == 429:
            return {"error": "Exa rate limit exceeded. Try again later."}
        if status != 200:
            return {"error": f"Exa API request failed: HTTP {status}"}
        try:
            return json.loads(body)
        except Exception:
            return {"error": "Exa API request failed: unparseable body"}

    def search(self, query: str, num_results: int = 10,
               search_type: str = "auto", include_domains=None,
               exclude_domains=None, start_published_date=None,
               end_published_date=None, include_text: bool = True,
               include_highlights: bool = False, category=None, **_kw
               ) -> dict:
        if not query or len(query) > 500:
            return {"error": "Query must be 1-500 characters"}
        num_results = max(1, min(num_results, 20))
        payload: dict = {"query": query, "numResults": num_results,
                         "contents": {}}
        if search_type != "auto":
            payload["type"] = search_type
        if include_domains:
            payload["includeDomains"] = include_domains
        if exclude_domains:
            payload["excludeDomains"] = exclude_domains
        if start_published_date:
            payload["startPublishedDate"] = start_published_date
        if end_published_date:
            payload["endPublishedDate"] = end_published_date
        if category:
            payload["category"] = category
        if include_text:
            payload["contents"]["text"] = True
        if include_highlights:
            payload["contents"]["highlights"] = True
        data = self._make_request("/search", payload)
        if "error" in data:
            return data
        results = []
        for item in data.get("results", []):
            result = {
                "title": item.get("title", ""),
                "url": item.get("url", ""),
                "published_date": item.get("publishedDate", ""),
                "author": item.get("author", ""),
            }
            if include_text and "text" in item:
                result["text"] = item["text"]
            if include_highlights and "highlights" in item:
                result["highlights"] = item["highlights"]
            results.append(result)
        return {"query": query, "results": results, "total": len(results),
                "provider": "exa"}

    def find_similar(self, url: str, num_results: int = 10,
                     include_domains=None, exclude_domains=None,
                     include_text: bool = True) -> dict:
        if not url:
            return {"error": "URL is required"}
        num_results = max(1, min(num_results, 20))
        payload: dict = {"url": url, "numResults": num_results,
                         "contents": {}}
        if include_domains:
            payload["includeDomains"] = include_domains
        if exclude_domains:
            payload["excludeDomains"] = exclude_domains
        if include_text:
            payload["contents"]["text"] = True
        data = self._make_request("/findSimilar", payload)
        if "error" in data:
            return data
        results = []
        for item in data.get("results", []):
            result = {
                "title": item.get("title", ""),
                "url": item.get("url", ""),
                "published_date": item.get("publishedDate", ""),
            }
            if include_text and "text" in item:
                result["text"] = item["text"]
            results.append(result)
        return {"source_url": url, "results": results,
                "total": len(results), "provider": "exa"}

    def get_contents(self, urls: list[str], include_text: bool = True,
                     include_highlights: bool = False) -> dict:
        if not urls:
            return {"error": "At least one URL is required"}
        if len(urls) > 10:
            return {"error": "Maximum 10 URLs per request"}
        payload: dict = {"ids": urls}
        contents: dict = {}
        if include_text:
            contents["text"] = True
        if include_highlights:
            contents["highlights"] = True
        if contents:
            payload["contents"] = contents
        data = self._make_request("/contents", payload)
        if "error" in data:
            return data
        results = []
        for item in data.get("results", []):
            result = {"url": item.get("url", ""),
                      "title": item.get("title", "")}
            if include_text and "text" in item:
                result["text"] = item["text"]
            if include_highlights and "highlights" in item:
                result["highlights"] = item["highlights"]
            results.append(result)
        return {"results": results, "total": len(results), "provider": "exa"}

    def answer(self, query: str, include_citations: bool = True) -> dict:
        if not query or len(query) > 500:
            return {"error": "Query must be 1-500 characters"}
        data = self._make_request("/answer", {"query": query})
        if "error" in data:
            return data
        result: dict = {"query": query, "answer": data.get("answer", ""),
                        "provider": "exa"}
        if include_citations:
            result["citations"] = [
                {
                    "title": s.get("title", ""),
                    "url": s.get("url", ""),
                    "published_date": s.get("publishedDate", ""),
                }
                for s in data.get("citations", [])
            ]
        return result


# ----------------------------------------------------------------- table tier
EXA_RESULT_SCHEMA = (
    "query string, rank int, title string, url string, "
    "published_date string, author string, error string"
)


def exa_search_table(queries, client_factory, num_results: int = 10,
                     include_text: bool = False,
                     query_col: str = "query"):
    """Run a TABLE of search queries through the Exa connector on the
    executors (mapInPandas, map-only, per-row error envelopes) — one
    output row per (query, result) with a 1-based rank.
    ``client_factory`` must pickle by value (lambda/closure).

    Reference parity: exa_web_search_tool.py's one-shot search
    consumed as a TABLE (the q233 github_issues_table pattern)."""
    import pandas as pd

    cols = [f.split()[0] for f in EXA_RESULT_SCHEMA.split(",")]

    def run(batches):
        client = client_factory()
        for pdf in batches:
            rows = []
            for q in pdf[query_col]:
                env = client.search(str(q), num_results=num_results,
                                    include_text=include_text)
                if "error" in env:
                    rows.append({"query": q, "rank": None, "title": None,
                                 "url": None, "published_date": None,
                                 "author": None, "error": env["error"]})
                    continue
                for rank, r in enumerate(env["results"], start=1):
                    rows.append({
                        "query": q, "rank": rank,
                        "title": r.get("title"), "url": r.get("url"),
                        "published_date": r.get("published_date"),
                        "author": r.get("author"), "error": None,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return queries.select(query_col).mapInPandas(run, EXA_RESULT_SCHEMA)
