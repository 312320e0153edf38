"""Distributed HTTP fetch against a loopback stdlib server: statuses,
error envelopes, body caps, and the fetch→scrape pipeline."""

from __future__ import annotations

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from aden_hive_fork_spark.sources.http_source import (
    crawl_to_text,
    fetch_urls,
    partition_by_host,
)

PAGE = (
    b"<html><head><title>Layout Notes</title></head><body>"
    b"<h1>Compaction</h1><p>Small files are slow.</p>"
    b'<a href="/a">a</a><a href="/b">b</a></body></html>'
)


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        if self.path == "/ok":
            body, ctype, code = PAGE, "text/html; charset=utf-8", 200
        elif self.path == "/big":
            body, ctype, code = b"x" * 5000, "application/octet-stream", 200
        elif self.path == "/slow":
            time.sleep(3)
            body, ctype, code = b"late", "text/plain", 200
        else:
            self.send_error(404)
            return
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):
        pass


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.handle_error = lambda *a: None  # client-side aborts (timeout test) are expected
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_fetch_envelope(spark, server):
    urls = spark.createDataFrame(
        [
            (f"{server}/ok",),
            (f"{server}/missing",),
            ("http://127.0.0.1:9/refused",),  # discard port: connection refused
            ("file:///etc/hostname",),
        ],
        "url string",
    )
    rows = {r["url"]: r for r in fetch_urls(urls, timeout_s=5).collect()}
    ok = rows[f"{server}/ok"]
    assert (ok["status"], ok["error"], ok["truncated"]) == (200, None, False)
    assert ok["body"] == PAGE and ok["n_bytes"] == len(PAGE)
    assert "text/html" in ok["content_type"]
    assert rows[f"{server}/missing"]["status"] == 404
    assert rows[f"{server}/missing"]["error"] == "http_404"
    refused = rows["http://127.0.0.1:9/refused"]
    assert refused["status"] == 0 and refused["error"]
    assert rows["file:///etc/hostname"]["error"] == "rejected_scheme"
    assert rows["file:///etc/hostname"]["body"] is None


def test_fetch_body_cap(spark, server):
    urls = spark.createDataFrame([(f"{server}/big",)], "url string")
    r = fetch_urls(urls, max_bytes=1000).first()
    assert r["status"] == 200
    assert r["truncated"] is True
    assert r["n_bytes"] == 1000


def test_fetch_timeout(spark, server):
    urls = spark.createDataFrame([(f"{server}/slow",)], "url string")
    t0 = time.time()
    r = fetch_urls(urls, timeout_s=0.5).first()
    assert time.time() - t0 < 30
    assert r["status"] == 0 and "timed out" in r["error"].lower()


def test_crawl_to_text_pipeline(spark, server):
    urls = spark.createDataFrame(
        [(f"{server}/ok",), (f"{server}/missing",)], "url string"
    )
    rows = {r["url"]: r for r in crawl_to_text(urls, timeout_s=5).collect()}
    ok = rows[f"{server}/ok"]
    assert ok["title"] == "Layout Notes"
    assert "Small files are slow." in ok["text"]
    assert ok["n_links"] == 2
    missing = rows[f"{server}/missing"]
    assert missing["text"] is None and missing["status"] == 404


def test_partition_by_host(spark):
    urls = spark.createDataFrame(
        [(f"http://host{i % 3}.example/p{i}",) for i in range(30)], "url string"
    )
    parts = (
        partition_by_host(urls, 6)
        .select(F.spark_partition_id().alias("p"), "url")
        .collect()
    )
    by_host = {}
    for r in parts:
        host = r["url"].split("/")[2]
        by_host.setdefault(host, set()).add(r["p"])
    # all URLs of one host land in ONE partition (politeness unit)
    assert all(len(v) == 1 for v in by_host.values())
