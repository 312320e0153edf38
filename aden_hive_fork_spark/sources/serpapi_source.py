"""SerpAPI provider — Google Scholar & Google Patents search with
envelope parity, on the REST transport seam; completes the provider
family beside Exa/Google/Brave/Wikipedia/arXiv.

Reference analogs (tools/src/aden_tools/tools/serpapi_tool/
serpapi_tool.py): client ``_SerpAPIClient`` (:33-136 — one GET
endpoint ``search.json`` multiplexed by the ``engine`` param;
api_key rides in params; 401/429/>=400 error map plus SerpAPI's
in-band ``{"error": ...}`` body, :39-61); scholar_search params
(:63-85: num clamp 20, as_ylo/as_yhi year filters, scisbd sort);
scholar_cite (:87-89); scholar_author (:91-107, num clamp 100);
patents_search (:109-132: priority:-prefixed before/after);
patents_details (:134-136). Envelope shaping: scholar results
flattening with cited_by/cites_id/authors/pdf_link (:210-244);
author profile with metrics table flattening (:329-363); patents
flattening (:420-447); single-patent details (:457-530).
"""

from __future__ import annotations

import json

SERPAPI_BASE = "https://serpapi.com/search.json"

NO_CREDS = {
    "error": "SerpAPI credentials not configured",
    "help": (
        "Set SERPAPI_API_KEY environment variable or configure via "
        "credential store. Get a key at https://serpapi.com/manage-api-key"
    ),
}


class SerpAPIClient:
    """SerpAPI client. ``transport(method, url, params, json_body,
    headers) -> (status, bytes)`` — api_key is a param, excluded
    from fixture keys by FixtureRestTransport._CRED_PARAMS."""

    name = "serpapi"

    def __init__(self, api_key: str, transport):
        self._api_key = api_key
        self.transport = transport

    def _request(self, params: dict) -> dict:
        params = dict(params)
        params["api_key"] = self._api_key
        status, body = self.transport("GET", SERPAPI_BASE, params, None, {})
        if status == 401:
            return {
                "error": "Invalid SerpAPI API key",
                "help": "Check your key at https://serpapi.com/manage-api-key",
            }
        if status == 429:
            return {"error": "SerpAPI rate limit exceeded. Try again later."}
        if status >= 400:
            try:
                detail = json.loads(body).get(
                    "error", body.decode(errors="replace"))
            except Exception:
                detail = body.decode(errors="replace")
            return {"error": f"SerpAPI error (HTTP {status}): {detail}"}
        try:
            data = json.loads(body)
        except Exception:
            return {"error": "SerpAPI error: unparseable body"}
        if "error" in data:
            return {"error": f"SerpAPI error: {data['error']}"}
        return data

    # --- raw engine calls (serpapi_tool.py:63-136) ---
    def scholar_search_raw(self, query, num=10, start=0, year_low=None,
                           year_high=None, sort_by_date=False) -> dict:
        params: dict = {"engine": "google_scholar", "q": query,
                        "num": min(num, 20), "start": start}
        if year_low is not None:
            params["as_ylo"] = year_low
        if year_high is not None:
            params["as_yhi"] = year_high
        if sort_by_date:
            params["scisbd"] = 1
        return self._request(params)

    def scholar_cite_raw(self, result_id) -> dict:
        return self._request({"engine": "google_scholar_cite",
                              "q": result_id})

    def scholar_author_raw(self, author_id, start=0, num=20,
                           sort_by="citedby") -> dict:
        return self._request({
            "engine": "google_scholar_author", "author_id": author_id,
            "start": start, "num": min(num, 100), "sort": sort_by,
        })

    def patents_search_raw(self, query, page=1, country=None, status=None,
                           before=None, after=None) -> dict:
        params: dict = {"engine": "google_patents", "q": query, "page": page}
        if country:
            params["country"] = country
        if status:
            params["status"] = status
        if before:
            params["before"] = f"priority:{before}"
        if after:
            params["after"] = f"priority:{after}"
        return self._request(params)

    # --- shaped envelopes (serpapi_tool.py:165-530) ---
    def scholar_search(self, query, num_results=10, start=0, year_low=None,
                       year_high=None, sort_by_date=False) -> dict:
        if not query or len(query) > 500:
            return {"error": "Query must be 1-500 characters"}
        data = self.scholar_search_raw(query, num_results, start, year_low,
                                       year_high, sort_by_date)
        if "error" in data:
            return data
        results = []
        for item in data.get("organic_results", []):
            result = {
                "title": item.get("title", ""),
                "link": item.get("link", ""),
                "snippet": item.get("snippet", ""),
                "result_id": item.get("result_id", ""),
                "publication_info": item.get("publication_info", {}).get(
                    "summary", ""),
                "cited_by_count": item.get("inline_links", {}).get(
                    "cited_by", {}).get("total", 0),
                "cites_id": item.get("inline_links", {}).get(
                    "cited_by", {}).get("cites_id", ""),
            }
            authors = item.get("publication_info", {}).get("authors", [])
            if authors:
                result["authors"] = [
                    {"name": a.get("name", ""),
                     "author_id": a.get("author_id", "")}
                    for a in authors
                ]
            resources = item.get("resources", [])
            if resources:
                result["pdf_link"] = resources[0].get("link", "")
            results.append(result)
        return {
            "query": query,
            "total_results": data.get("search_information", {}).get(
                "total_results", 0),
            "results": results,
            "count": len(results),
        }

    def scholar_get_citations(self, result_id) -> dict:
        if not result_id:
            return {"error": "result_id is required"}
        data = self.scholar_cite_raw(result_id)
        if "error" in data:
            return data
        return {"result_id": result_id,
                "citations": data.get("citations", []),
                "links": data.get("links", [])}

    def scholar_get_author(self, author_id, num_articles=20, start=0,
                           sort_by="citedby") -> dict:
        if not author_id:
            return {"error": "author_id is required"}
        data = self.scholar_author_raw(author_id, start, num_articles,
                                       sort_by)
        if "error" in data:
            return data
        author = data.get("author", {})
        metrics: dict = {}
        for entry in data.get("cited_by", {}).get("table", []):
            for key, value in entry.items():
                metrics[key] = value
        articles = [
            {
                "title": a.get("title", ""),
                "authors": a.get("authors", ""),
                "publication": a.get("publication", ""),
                "year": a.get("year", ""),
                "cited_by_count": a.get("cited_by", {}).get("value", 0),
                "citation_id": a.get("citation_id", ""),
            }
            for a in data.get("articles", [])
        ]
        return {
            "author_id": author_id,
            "name": author.get("name", ""),
            "affiliations": author.get("affiliations", ""),
            "email": author.get("email", ""),
            "interests": [i.get("title", "")
                          for i in author.get("interests", [])],
            "thumbnail": author.get("thumbnail", ""),
            "metrics": metrics,
            "articles": articles,
            "article_count": len(articles),
        }

    def patents_search(self, query, page=1, country=None, status=None,
                       before_date=None, after_date=None) -> dict:
        if not query or len(query) > 500:
            return {"error": "Query must be 1-500 characters"}
        data = self.patents_search_raw(query, page, country, status,
                                       before_date, after_date)
        if "error" in data:
            return data
        results = [
            {
                "title": it.get("title", ""),
                "snippet": it.get("snippet", ""),
                "link": it.get("link", ""),
                "patent_id": it.get("patent_id", ""),
                "publication_number": it.get("publication_number", ""),
                "inventor": it.get("inventor", ""),
                "assignee": it.get("assignee", ""),
                "filing_date": it.get("filing_date", ""),
                "grant_date": it.get("grant_date"),
                "publication_date": it.get("publication_date", ""),
                "priority_date": it.get("priority_date", ""),
                "pdf": it.get("pdf", ""),
            }
            for it in data.get("organic_results", [])
        ]
        return {
            "query": query,
            "total_results": data.get("search_information", {}).get(
                "total_results", 0),
            "results": results,
            "count": len(results),
            "page": page,
        }

    def patents_get_details(self, patent_id) -> dict:
        if not patent_id:
            return {"error": "patent_id is required"}
        data = self._request({"engine": "google_patents", "q": patent_id})
        if "error" in data:
            return data
        results = data.get("organic_results", [])
        if not results:
            return {"error": f"No patent found for ID: {patent_id}"}
        patent = results[0]
        return {
            "patent_id": patent_id,
            "title": patent.get("title", ""),
            "snippet": patent.get("snippet", ""),
            "link": patent.get("link", ""),
            "publication_number": patent.get("publication_number", ""),
            "inventor": patent.get("inventor", ""),
            "assignee": patent.get("assignee", ""),
            "filing_date": patent.get("filing_date", ""),
            "grant_date": patent.get("grant_date"),
            "publication_date": patent.get("publication_date", ""),
            "priority_date": patent.get("priority_date", ""),
            "pdf": patent.get("pdf", ""),
            "classifications": patent.get("classifications", {}),
        }


# ----------------------------------------------------------------- table tier
SCHOLAR_RESULT_SCHEMA = (
    "query string, rank int, title string, link string, "
    "cited_by_count bigint, error string"
)


def serpapi_scholar_table(queries, client_factory, num_results: int = 10,
                          query_col: str = "query"):
    """Run a TABLE of Google Scholar queries through the SerpAPI
    connector on the executors (mapInPandas, map-only, per-row error
    envelopes) — one output row per (query, organic result) with a
    1-based rank. ``client_factory`` must pickle by value."""
    import pandas as pd

    cols = [f.split()[0] for f in SCHOLAR_RESULT_SCHEMA.split(",")]

    def run(batches):
        client = client_factory()
        for pdf in batches:
            rows = []
            for q in pdf[query_col]:
                env = client.scholar_search(str(q), num_results=num_results)
                if "error" in env:
                    rows.append({"query": q, "rank": None, "title": None,
                                 "link": None, "cited_by_count": None,
                                 "error": env["error"]})
                    continue
                for rank, r in enumerate(env["results"], start=1):
                    rows.append({
                        "query": q, "rank": rank,
                        "title": r.get("title"), "link": r.get("link"),
                        "cited_by_count": r.get("cited_by_count"),
                        "error": None,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return queries.select(query_col).mapInPandas(run, SCHOLAR_RESULT_SCHEMA)
