"""Search-provider clients (sources/search_source) — envelope parity
with the reference tools (web_search_tool.py:154-239,
wikipedia_tool.py:26-95, arxiv_tool.py:26-220), in the reference's
per-tool golden style, plus the search→crawl wiring over a loopback
server (no external network)."""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from aden_hive_fork_spark.sources.search_source import (
    FixtureSearchProvider,
    download_paper,
    keyword_search,
    results_to_url_table,
    search_papers,
    search_wikipedia,
    web_search,
)

WEB_DOCS = [
    {"title": "Spark SQL guide", "url": "http://a.test/spark", "text": "catalyst optimizer and tungsten codegen for spark sql"},
    {"title": "Join strategies", "url": "http://a.test/joins", "text": "broadcast hash join versus sort merge join in spark"},
    {"title": "Cooking pasta", "url": "http://a.test/pasta", "text": "boil water add salt and cook the pasta al dente"},
]

WIKI_CORPUS = [
    {"title": "Apache Spark", "key": "Apache_Spark", "description": "Cluster computing framework",
     "excerpt": 'Apache <span class="searchmatch">Spark</span> is an engine'},
    {"title": "Pasta", "key": "Pasta", "description": "",
     "excerpt": "Pasta is a staple food"},
]

PAPERS = [
    {"id": "2101.00001", "title": "Shuffle Optimization in Dataflow", "summary": "We study\nshuffle plans.",
     "published": "2021-01-05", "authors": ["A. One"], "categories": ["cs.DC"], "pdf": b"%PDF-1.4 fake"},
    {"id": "1903.00002", "title": "Join Reordering Surveys", "summary": "A survey of join reordering.",
     "published": "2019-03-01", "authors": ["B. Two", "C. Three"], "categories": ["cs.DB"], "pdf": b"%PDF-1.4 fake2"},
]


# -- web_search ------------------------------------------------------------
def test_web_search_validation():
    assert web_search("") == {"error": "Query must be 1-500 characters"}
    assert web_search("x" * 501) == {"error": "Query must be 1-500 characters"}


def test_web_search_no_providers_configured():
    out = web_search("spark")
    assert out["error"] == "No search credentials configured"
    assert "help" in out


def test_web_search_named_provider_missing():
    out = web_search("spark", provider="brave", providers={})
    assert out["error"] == "Brave credentials not configured"


def test_web_search_fixture_results_ranked():
    prov = {"fixture": FixtureSearchProvider(WEB_DOCS)}
    out = web_search("spark join", providers=prov, provider="auto")
    assert out["provider"] == "fixture"
    assert out["total"] == len(out["results"])
    urls = [r["url"] for r in out["results"]]
    # both spark docs hit both terms? joins doc has spark+join; guide has spark
    assert urls[0] == "http://a.test/joins"  # 2 terms beats 1
    assert "http://a.test/pasta" not in urls
    assert set(out["results"][0]) == {"title", "url", "snippet"}


def test_web_search_num_results_cap():
    prov = {"fixture": FixtureSearchProvider(WEB_DOCS)}
    out = web_search("spark", providers=prov, num_results=1)
    assert out["total"] == 1


# -- wikipedia -------------------------------------------------------------
def test_wikipedia_empty_query():
    assert search_wikipedia("") == {"error": "Query cannot be empty"}


def test_wikipedia_envelope_and_html_strip():
    out = search_wikipedia("spark engine", corpus=WIKI_CORPUS)
    assert out["count"] == 1
    r = out["results"][0]
    assert r["url"] == "https://en.wikipedia.org/wiki/Apache_Spark"
    assert "<span" not in r["snippet"] and "Spark" in r["snippet"]
    assert r["description"] == "Cluster computing framework"


def test_wikipedia_description_fallback_and_clamp():
    out = search_wikipedia("pasta staple food", corpus=WIKI_CORPUS, num_results=99)
    assert out["results"][0]["description"] == "No description available."
    out2 = search_wikipedia("pasta", corpus=WIKI_CORPUS, num_results=-5)
    assert out2["count"] == 1  # clamped to >= 1


# -- arxiv -----------------------------------------------------------------
def test_search_papers_requires_query_or_ids():
    out = search_papers()
    assert out["success"] is False and "Invalid Request" in out["error"]


def test_search_papers_by_id_and_fields():
    out = search_papers(id_list=["1903.00002"], corpus=PAPERS)
    assert out["success"] and out["total"] == 1
    r = out["results"][0]
    assert r["id"] == "1903.00002" and r["authors"] == ["B. Two", "C. Three"]
    assert set(r) == {"id", "title", "summary", "published", "authors", "pdf_url", "categories"}


def test_search_papers_relevance_and_newline_strip():
    out = search_papers(query="shuffle plans", corpus=PAPERS)
    assert out["results"][0]["id"] == "2101.00001"
    assert "\n" not in out["results"][0]["summary"]


def test_search_papers_date_sort():
    out = search_papers(query="join shuffle survey", corpus=PAPERS, sort_by="submittedDate")
    ids = [r["id"] for r in out["results"]]
    assert ids == ["2101.00001", "1903.00002"]  # descending date
    out2 = search_papers(query="join shuffle survey", corpus=PAPERS,
                         sort_by="submittedDate", sort_order="ascending")
    assert [r["id"] for r in out2["results"]] == ["1903.00002", "2101.00001"]


def test_download_paper(tmp_path):
    out = download_paper("2101.00001", PAPERS, str(tmp_path))
    assert out["success"] and out["paper_id"] == "2101.00001"
    with open(out["file_path"], "rb") as f:
        assert f.read() == b"%PDF-1.4 fake"
    missing = download_paper("0000.00000", PAPERS, str(tmp_path))
    assert missing["success"] is False and "No paper found" in missing["error"]


# -- distributed tier ------------------------------------------------------
def test_keyword_search_matches_client_ranking(spark):
    """The distributed operator and the driver-side provider rank
    identically (same score definition)."""
    docs = spark.createDataFrame(
        [(i, f"{d['title']} {d['text']}") for i, d in enumerate(WEB_DOCS)],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame([(1, "spark join")], "qid int, query string")
    got = [(r.doc_id, r.score) for r in keyword_search(docs, queries, k=5).collect()]
    assert got[0] == (1, 2)  # joins doc: both terms
    assert all(s > 0 for _, s in got) and 2 not in [d for d, _ in got]


# -- search → crawl wiring -------------------------------------------------
class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        body = (
            b"<html><head><title>Fixture Doc</title></head>"
            b"<body><p>catalyst optimizer notes</p></body></html>"
        )
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):
        pass


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_search_results_feed_crawl(spark, server):
    """web_search envelope → URL table → distributed crawl_to_text:
    the reference's search-then-scrape chain as one pipeline."""
    from aden_hive_fork_spark.sources.http_source import crawl_to_text

    docs = [
        {"title": "Doc A", "url": f"{server}/a", "text": "catalyst optimizer deep dive"},
        {"title": "Doc B", "url": f"{server}/b", "text": "unrelated cooking content"},
    ]
    out = web_search("catalyst optimizer", providers={"fx": FixtureSearchProvider(docs)})
    urls = results_to_url_table(spark, out)
    rows = crawl_to_text(urls).collect()
    assert len(rows) == 1 and rows[0]["status"] == 200
    assert rows[0]["title"] == "Fixture Doc"
    assert "catalyst optimizer" in rows[0]["text"]


def test_bm25_ranks_rare_terms_higher(spark):
    from aden_hive_fork_spark.sources.search_source import bm25_search

    docs = spark.createDataFrame(
        [
            (1, "zebra common common common"),
            (2, "common common common common"),
            (3, "zebra zebra common word"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(1, "zebra")], "qid int, query string")
    out = bm25_search(docs, q, k=3).collect()
    ids = [r.doc_id for r in out]
    assert ids[0] == 3  # two zebra occurrences outrank one
    assert 2 not in ids  # no match, no row
    assert out[0].rank == 1 and all(r.score > 0 for r in out)


def test_rrf_fuse_hand_computed(spark):
    from aden_hive_fork_spark.sources.search_source import rrf_fuse

    lex = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank int"
    )
    sem = spark.createDataFrame(
        [(20, 1), (40, 2), (10, 3)], "doc_id long, rank int"
    )
    out = rrf_fuse([lex, sem], k=60, topk=10).collect()
    by = {r["doc_id"]: (r["rrf_score"], r["n_lists"]) for r in out}
    assert by[20][1] == 2 and by[30][1] == 1
    # doc 20: 1/62 + 1/61; doc 10: 1/61 + 1/63
    import math
    assert math.isclose(by[20][0], round(1/62 + 1/61, 6), abs_tol=1e-6)
    assert math.isclose(by[10][0], round(1/61 + 1/63, 6), abs_tol=1e-6)
    # fused order: 20 first (two high ranks)
    assert out[0]["doc_id"] == 20


def test_rrf_fuse_validates_empty(spark):
    import pytest

    from aden_hive_fork_spark.sources.search_source import rrf_fuse

    with pytest.raises(ValueError):
        rrf_fuse([])
