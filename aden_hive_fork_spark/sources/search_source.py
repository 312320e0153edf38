"""Search-provider clients — offline-stubbed analogs of the
reference's retrieval APIs, completing the provider layer above the
fetch/extract tier (http_source / html_source).

Reference analogs (envelope parity, verified field-by-field):

- ``web_search``       — tools/src/aden_tools/tools/web_search_tool/
  web_search_tool.py:154-239 (validation, provider auto-selection,
  credential error envelopes, ``{query, results[{title,url,snippet}],
  total, provider}`` success shape).
- ``search_wikipedia`` — wikipedia_tool.py:26-95 (result clamp 1..10,
  HTML-stripped snippets, ``{query, lang, count, results[{title, url,
  description, snippet}]}``).
- ``search_papers`` / ``download_paper`` — arxiv_tool.py:26-127 /
  129-220 (query-or-id_list validation, max_results cap 100, sort
  criteria, ``{success, query, id_list, results[...], total}``; PDF
  download to a managed dir with a cleaned filename).

The reference clients call live HTTP APIs (Google/Brave/Wikipedia/
arXiv). This sandbox has no external network, so the BACKEND is
pluggable: anything with a ``search(query, num_results) -> envelope``
method plugs in, and the shipped ``FixtureSearchProvider`` serves a
local corpus deterministically — unit tests and declared queries run
hermetically, while a networked deployment swaps in a real provider
without touching call sites (same hermetic-seam design as the LLM
tiers, SURVEY §7.5).

Two tiers, by cardinality:

- **Driver-side clients** (this module's ``web_search`` etc.): one
  query, top-k results — the reference's interactive shape. Scoring a
  fixture corpus in-process is fine at client cardinality.
- **Distributed search** (``keyword_search``): a TABLE of queries
  against a TABLE of documents — the 100 TB shape. Queries are tiny →
  broadcast; documents never shuffle; scoring is pure JVM column
  arithmetic (split / array_intersect / size) and per-query top-k is
  one window over the broadcast-joined result. Declared as q93 with a
  DuckDB oracle twin.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_WS = r" +"


def _strip_html(text: str) -> str:
    """Remove HTML tags (wikipedia_tool.py:19-23 analog)."""
    if not text:
        return ""
    return re.sub(r"<[^>]+>", "", text)


def _terms(query: str) -> list[str]:
    return [t for t in re.split(_WS, query.strip().lower()) if t]


def _score(query_terms: list[str], text: str) -> int:
    """Deterministic relevance: count of DISTINCT query terms present
    in the document's token set (same definition as the distributed
    ``keyword_search``, so the two tiers rank identically)."""
    toks = set(_terms(text))
    return sum(1 for t in set(query_terms) if t in toks)


# ---------------------------------------------------------------------------
# provider interface + offline fixture backend
# ---------------------------------------------------------------------------
class FixtureSearchProvider:
    """Offline search backend over a local corpus.

    ``docs``: iterable of dicts with ``title``, ``url``, ``text`` (any
    extra keys ignored). Results are scored by distinct-term overlap,
    ranked (score desc, then url asc for a stable total order), and
    snippeted from the document head — all deterministic.
    """

    def __init__(self, docs, name: str = "fixture", snippet_chars: int = 160):
        self.docs = list(docs)
        self.name = name
        self.snippet_chars = snippet_chars

    def search(self, query: str, num_results: int = 10, **_kw) -> dict:
        qt = _terms(query)
        scored = []
        for d in self.docs:
            s = _score(qt, f"{d.get('title', '')} {d.get('text', '')}")
            if s > 0:
                scored.append((s, d))
        scored.sort(key=lambda p: (-p[0], p[1].get("url", "")))
        results = [
            {
                "title": d.get("title", ""),
                "url": d.get("url", ""),
                "snippet": d.get("text", "")[: self.snippet_chars],
            }
            for _, d in scored[:num_results]
        ]
        return {
            "query": query,
            "results": results,
            "total": len(results),
            "provider": self.name,
        }


def web_search(
    query: str,
    num_results: int = 10,
    country: str = "us",
    language: str = "en",
    provider: str = "auto",
    providers: dict[str, object] | None = None,
) -> dict:
    """Reference ``web_search`` envelope (web_search_tool.py:154-239)
    over pluggable backends.

    ``providers`` maps provider name -> backend (anything with
    ``.search``); None/empty models the no-credentials state. "auto"
    picks the first configured backend in insertion order (the
    reference tries Brave then Google; insertion order is the
    configurable analog).
    """
    if not query or len(query) > 500:
        return {"error": "Query must be 1-500 characters"}
    providers = providers or {}
    try:
        if provider == "auto":
            for backend in providers.values():
                return backend.search(
                    query, num_results=num_results, country=country, language=language
                )
            return {
                "error": "No search credentials configured",
                "help": "Configure at least one search provider backend",
            }
        backend = providers.get(provider)
        if backend is None:
            return {
                "error": f"{provider.capitalize()} credentials not configured",
                "help": f"Configure the {provider!r} provider backend",
            }
        return backend.search(
            query, num_results=num_results, country=country, language=language
        )
    except Exception as e:  # transport parity: errors are data
        return {"error": f"Search failed: {e}"}


# ---------------------------------------------------------------------------
# wikipedia client (wikipedia_tool.py:26-95)
# ---------------------------------------------------------------------------
def search_wikipedia(
    query: str,
    lang: str = "en",
    num_results: int = 3,
    corpus: list[dict] | None = None,
) -> dict:
    """Reference ``search_wikipedia`` envelope over a fixture corpus.

    ``corpus`` entries carry ``title``, ``key``, ``description``,
    ``excerpt`` (excerpt may contain HTML — stripped for the snippet,
    exactly like the live API's ``<span class="searchmatch">``
    markup). Empty description falls back to the reference's literal
    placeholder string.
    """
    if not query:
        return {"error": "Query cannot be empty"}
    num_results = max(1, min(num_results, 10))
    corpus = corpus or []
    qt = _terms(query)
    scored = []
    for page in corpus:
        s = _score(qt, f"{page.get('title', '')} {page.get('excerpt', '')}")
        if s > 0:
            scored.append((s, page))
    scored.sort(key=lambda p: (-p[0], p[1].get("title", "")))
    results = []
    for _, page in scored[:num_results]:
        key = page.get("key", "")
        results.append(
            {
                "title": page.get("title", ""),
                "url": f"https://{lang}.wikipedia.org/wiki/{key}",
                "description": page.get("description") or "No description available.",
                "snippet": _strip_html(page.get("excerpt") or ""),
            }
        )
    return {"query": query, "lang": lang, "count": len(results), "results": results}


# ---------------------------------------------------------------------------
# arXiv client (arxiv_tool.py:26-220)
# ---------------------------------------------------------------------------
def search_papers(
    query: str = "",
    id_list: list[str] | None = None,
    max_results: int = 10,
    sort_by: str = "relevance",
    sort_order: str = "descending",
    corpus: list[dict] | None = None,
) -> dict:
    """Reference ``search_papers`` envelope over a fixture corpus.

    ``corpus`` entries: ``id``, ``title``, ``summary``, ``published``
    (ISO date), ``authors`` (list), ``categories`` (list), optional
    ``pdf`` (bytes, used by ``download_paper``). Sorting mirrors the
    reference criteria: relevance = term-overlap score; the date
    criteria sort on ``published``.
    """
    if not query and not id_list:
        return {
            "success": False,
            "error": "Invalid Request: You must provide either a 'query' or an 'id_list'.",
        }
    max_results = min(max_results, 100)
    corpus = corpus or []
    if id_list:
        by_id = {p.get("id"): p for p in corpus}
        picked = [by_id[i] for i in id_list if i in by_id]
    else:
        qt = _terms(query)
        scored = [
            (s, p)
            for s, p in (
                (_score(qt, f"{p.get('title', '')} {p.get('summary', '')}"), p)
                for p in corpus
            )
            if s > 0
        ]
        desc = sort_order == "descending"
        if sort_by == "relevance":
            scored.sort(key=lambda sp: ((-sp[0] if desc else sp[0]), sp[1].get("id", "")))
        else:  # lastUpdatedDate / submittedDate — fixture carries one date
            scored.sort(key=lambda sp: sp[1].get("published", ""), reverse=desc)
        picked = [p for _, p in scored]
    picked = picked[:max_results]
    results = [
        {
            "id": p.get("id", ""),
            "title": p.get("title", ""),
            "summary": (p.get("summary") or "").replace("\n", " "),
            "published": p.get("published", ""),
            "authors": list(p.get("authors") or []),
            "pdf_url": p.get("pdf_url") or f"https://export.arxiv.org/pdf/{p.get('id', '')}",
            "categories": list(p.get("categories") or []),
        }
        for p in picked
    ]
    return {
        "success": True,
        "query": query,
        "id_list": id_list or [],
        "results": results,
        "total": len(results),
    }


def download_paper(paper_id: str, corpus: list[dict] | None, dest_dir: str) -> dict:
    """Reference ``download_paper`` envelope (arxiv_tool.py:129-220):
    resolve the paper, write its PDF bytes under a cleaned filename,
    return the path. Fixture corpus carries the bytes; a networked
    backend would stream them instead — the filename/error contract is
    the part call sites depend on."""
    corpus = corpus or []
    paper = next((p for p in corpus if p.get("id") == paper_id), None)
    if paper is None:
        return {"success": False, "error": f"No paper found with ID: {paper_id}"}
    pdf = paper.get("pdf")
    if not pdf:
        return {"success": False, "error": "PDF URL not available for this paper."}
    clean_title = re.sub(r"[^\w\s-]", "", paper.get("title", "")).strip().replace(" ", "_")
    clean_id = re.sub(r"[^\w\s-]", "_", paper_id)
    os.makedirs(dest_dir, exist_ok=True)
    local_path = os.path.join(dest_dir, f"{clean_title[:50]}_{clean_id}_.pdf")
    try:
        with open(local_path, "wb") as f:
            f.write(pdf)
    except OSError as e:
        return {"success": False, "error": f"Failed during download or write: {e}"}
    return {"success": True, "file_path": local_path, "paper_id": paper_id}


# ---------------------------------------------------------------------------
# distributed tier: a table of queries against a table of documents
# ---------------------------------------------------------------------------
def keyword_search(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "qid",
    query_col: str = "query",
    k: int = 5,
) -> DataFrame:
    """Top-k documents per query by distinct-term overlap — the
    batch/scale shape of the provider clients above (same score, same
    ranking), as one declarative plan.

    100 TB shape: the query table is broadcast (it is tiny relative to
    the corpus), so documents are scored map-side with zero shuffle of
    the corpus; the only wide exchange is the per-query top-k window,
    which operates on the (already score>0-filtered) match set keyed
    by query id. Tokenization and scoring are built-in column
    functions — whole-stage codegen, no Python.

    Returns (qid, query, doc_id, score, rank) with rank 1..k,
    deterministic tie-break on doc id.
    """
    doc_toks = F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), _WS))
    q_terms = F.array_distinct(F.split(F.lower(F.trim(F.col(query_col))), _WS))
    d = docs.select(F.col(id_col), doc_toks.alias("_toks"))
    q = queries.select(F.col(query_id_col), F.col(query_col), q_terms.alias("_qt"))
    scored = d.join(F.broadcast(q)).select(
        query_id_col,
        query_col,
        id_col,
        F.size(F.array_intersect("_toks", "_qt")).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.asc(id_col)
    )
    return (
        scored.filter(F.col("score") > 0)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, query_col, id_col, "score", "rank")
        .orderBy(query_id_col, "rank")
    )


def results_to_url_table(spark, envelope: dict) -> DataFrame:
    """Lift a provider envelope's results into a DataFrame so they can
    pipe straight into the distributed fetch tier
    (``http_source.crawl_to_text``) — search → crawl → extract as one
    pipeline, the reference's web_search→web_scrape chain."""
    rows = [
        (r.get("title", ""), r.get("url", ""), r.get("snippet", ""))
        for r in envelope.get("results", [])
    ]
    return spark.createDataFrame(rows or [], "title string, url string, snippet string")


def bm25_search(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "qid",
    query_col: str = "query",
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-k per query — the real relevance ranker above
    ``keyword_search``'s binary overlap (Robertson/Sparck Jones; the
    default first-stage ranker in retrieval pipelines).

    score(q,d) = Σ_t IDF(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    IDF(t) = ln((N − df_t + 0.5)/(df_t + 0.5) + 1).

    Scale shape: the corpus is tokenized and aggregated to (doc, term,
    tf) postings EXACTLY ONCE — ``dl`` (doc length) is the per-doc sum
    of tf, not a second pass over the text, and the postings are
    materialized (eager localCheckpoint) because three consumers read
    them (query-term match, df_t, dl); without that, Spark would
    re-run the dominant tokenize+shuffle subtree per consumer. A real
    deployment persists these postings across query batches — this is
    that artifact in-plan. Per-query work is pruned FIRST by a
    broadcast join on the query terms, so only postings for queried
    terms flow into scoring. Corpus-global scalars (N, avgdl) ride a
    1-row broadcast cross join. Ranking sorts on the ROUNDED score
    (4dp) with a doc-id tie-break so float ulp noise can't reorder —
    which also makes the ranking engine-reproducible (the DuckDB
    oracle replays it exactly).
    """
    # NOT widened here (r12 A/B): the split-tokenize is light enough
    # that widening is a wash for q99 standalone (1.74 -> 1.87 s);
    # heavy compositions (q262) widen the docs side at the call site.
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.lower(F.trim(F.col(text_col))), _WS)).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    ).localCheckpoint(eager=True)
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    qterms = queries.select(
        F.col(query_id_col),
        F.col(query_col),
        F.explode(
            F.array_distinct(F.split(F.lower(F.trim(F.col(query_col))), _WS))
        ).alias("term"),
    )
    # prune postings to queried terms before any scoring math
    matched = tf.join(F.broadcast(qterms), "term")
    df_t = (
        tf.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df_t"))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5) + 1.0
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        matched.join(F.broadcast(df_t), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(query_id_col, query_col, id_col)
        .agg(F.round(F.sum(idf * tf_part), 4).alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, query_col, id_col, "score", "rank")
        .orderBy(query_id_col, "rank")
    )


# ---------------------------------------------------------------------------
# Concrete live-provider adapters — the public Google Custom Search and
# Brave Search wire shapes (web_search_tool.py:30-85 / 87-139 parity:
# request params, retry-on-429 with exponential backoff, status->error
# mapping, item->result parsing). Transport is pluggable — the SAME
# request-building and parsing code runs against live HTTP (urllib) or
# recorded fixtures — so the adapters are fully testable offline and a
# networked deployment only supplies `get_http_transport()`.
# ---------------------------------------------------------------------------
class GoogleSearchProvider:
    """Google Custom Search JSON API adapter.

    Wire shape (public API): GET customsearch/v1 with params
    ``key, cx, q, num (<=10), lr=lang_<language>, gl=<country>``;
    response ``{"items": [{"title", "link", "snippet"}, ...]}``.
    Plugs into ``web_search(providers={"google": ...})``.

    ``transport(url, params, headers) -> (status, body_bytes)``.
    """

    URL = "https://www.googleapis.com/customsearch/v1"

    def __init__(self, api_key: str, cse_id: str, transport, *,
                 max_retries: int = 3, sleep=None):
        self.api_key = api_key
        self.cse_id = cse_id
        self.transport = transport
        self.max_retries = max_retries
        self.sleep = sleep if sleep is not None else __import__("time").sleep

    def search(self, query: str, num_results: int = 10, country: str = "us",
               language: str = "en", **_kw) -> dict:
        params = {
            "key": self.api_key,
            "cx": self.cse_id,
            "q": query,
            "num": min(num_results, 10),
            "lr": f"lang_{language}",
            "gl": country,
        }
        status, body = _retrying_get(
            self.transport, self.URL, params, {}, self.max_retries, self.sleep
        )
        # status mapping — web_search_tool.py:57-65 parity
        if status == 401:
            return {"error": "Invalid Google API key"}
        if status == 403:
            return {"error": "Google API key not authorized or quota exceeded"}
        if status == 429:
            return {"error": "Google rate limit exceeded. Try again later."}
        if status != 200:
            return {"error": f"Google API request failed: HTTP {status}"}
        data = _json_body(body)
        if data is None:
            return {"error": "Malformed API response"}
        results = [
            {
                "title": item.get("title", ""),
                "url": item.get("link", ""),
                "snippet": item.get("snippet", ""),
            }
            for item in data.get("items", [])[:num_results]
        ]
        return {"query": query, "results": results, "total": len(results),
                "provider": "google"}


class BraveSearchProvider:
    """Brave Search API adapter.

    Wire shape (public API): GET res/v1/web/search with params
    ``q, count (<=20), country`` and headers ``X-Subscription-Token,
    Accept: application/json``; response ``{"web": {"results":
    [{"title", "url", "description"}, ...]}}``.
    """

    URL = "https://api.search.brave.com/res/v1/web/search"

    def __init__(self, api_key: str, transport, *, max_retries: int = 3,
                 sleep=None):
        self.api_key = api_key
        self.transport = transport
        self.max_retries = max_retries
        self.sleep = sleep if sleep is not None else __import__("time").sleep

    def search(self, query: str, num_results: int = 10, country: str = "us",
               **_kw) -> dict:
        params = {"q": query, "count": min(num_results, 20), "country": country}
        headers = {"X-Subscription-Token": self.api_key,
                   "Accept": "application/json"}
        status, body = _retrying_get(
            self.transport, self.URL, params, headers, self.max_retries,
            self.sleep
        )
        # status mapping — web_search_tool.py:113-118 parity
        if status == 401:
            return {"error": "Invalid Brave API key"}
        if status == 429:
            return {"error": "Brave rate limit exceeded. Try again later."}
        if status != 200:
            return {"error": f"Brave API request failed: HTTP {status}"}
        data = _json_body(body)
        if data is None:
            return {"error": "Malformed API response"}
        results = [
            {
                "title": item.get("title", ""),
                "url": item.get("url", ""),
                "snippet": item.get("description", ""),
            }
            for item in data.get("web", {}).get("results", [])[:num_results]
        ]
        return {"query": query, "results": results, "total": len(results),
                "provider": "brave"}


def _retrying_get(transport, url, params, headers, max_retries, sleep):
    """GET with exponential backoff on 429 (web_search_tool.py:38-55
    retry discipline: up to ``max_retries`` retries, sleep 2**attempt)."""
    status, body = 0, b""
    for attempt in range(max_retries + 1):
        status, body = transport(url, params, headers)
        if status == 429 and attempt < max_retries:
            sleep(2 ** attempt)
            continue
        break
    return status, body


def _json_body(body: bytes):
    import json

    try:
        return json.loads(body)
    except ValueError:
        return None


def get_http_transport(timeout: float = 30.0):
    """Live GET transport (stdlib urllib). The sandbox has no external
    network, so this path is exercised via ``FixtureGetTransport``; the
    request-building and parsing layers above are transport-agnostic."""

    def send(url: str, params: dict, headers: dict) -> tuple[int, bytes]:
        import urllib.error
        import urllib.parse
        import urllib.request

        full = f"{url}?{urllib.parse.urlencode(params)}"
        req = urllib.request.Request(full, headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return resp.status, resp.read()
        except urllib.error.HTTPError as e:
            return e.code, e.read()

    return send


class FixtureGetTransport:
    """Record/replay GET transport: responses keyed by
    (url, sorted(params) minus credential fields). ``record`` mode wraps
    a live transport and stores every response for offline replay (the
    same pattern as FixtureVisionTransport / FixtureLLMTransport).
    Credential params/headers are excluded from the key so fixtures
    recorded with one key replay under any key."""

    _CRED_PARAMS = {"key", "cx", "apikey"}

    def __init__(self, fixtures: dict | None = None, live=None):
        self.fixtures: dict[tuple, tuple[int, bytes]] = dict(fixtures or {})
        self.live = live
        self.requests: list[tuple[str, dict, dict]] = []

    @classmethod
    def key(cls, url: str, params: dict) -> tuple:
        return (url, tuple(sorted(
            (k, str(v)) for k, v in params.items() if k not in cls._CRED_PARAMS
        )))

    def __call__(self, url, params, headers) -> tuple[int, bytes]:
        self.requests.append((url, dict(params), dict(headers)))
        k = self.key(url, params)
        if k in self.fixtures:
            return self.fixtures[k]
        if self.live is not None:  # record mode
            resp = self.live(url, params, headers)
            self.fixtures[k] = resp
            return resp
        return 404, b'{"error": "no fixture for request"}'


def rrf_fuse(
    lists: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked lists — the standard hybrid-
    search combiner (Cormack et al., SIGIR'09): score(d) =
    Σ_lists 1/(k + rank_d), k=60 the conventional damping. Rank-based
    fusion needs no score calibration between heterogeneous rankers
    (BM25 scores and cosine similarities are not comparable; ranks
    are).

    Output: (id, rrf_score, n_lists) top-``topk`` by
    (rrf_score DESC, id ASC) — a total order. Scores are quantized
    with the engine-stable FLOOR round; for two lists the sum of two
    doubles is commutative so the fused score is bit-deterministic
    regardless of aggregation order (with >2 lists the quantization
    absorbs any summation-order ulps).

    Scale: each input list is already top-k-truncated by its ranker
    (TakeOrderedAndProject), so fusion operates on N×k rows — a
    trivially small union + aggregate no matter the corpus size. The
    heavy lifting stays in the rankers, which never materialize more
    than their own top-k.
    """
    if not lists:
        raise ValueError("rrf_fuse: need at least one ranked list")
    from functools import reduce

    from ..operators.similarity import stable_round6

    norm = [
        df.select(
            F.col(id_col).alias("id"), F.col(rank_col).cast("double").alias("r")
        )
        for df in lists
    ]
    u = reduce(lambda a, b: a.unionByName(b), norm)
    fused = u.groupBy("id").agg(
        F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col("r"))).alias("_s"),
        F.count(F.lit(1)).cast("int").alias("n_lists"),
    )
    return (
        fused.select(
            F.col("id").alias(id_col),
            stable_round6(F.col("_s")).alias("rrf_score"),
            "n_lists",
        )
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(topk)
    )
