"""Distributed HTTP fetch — the ingestion half of the reference's web
retrieval tools, completing §2.A row 35 (html_source is the scan
half).

Reference analogs: ``web_scrape(url)`` (tools/src/aden_tools/tools/
web_scrape_tool/web_scrape_tool.py:36+) and ``web_search`` result
fetches (web_search_tool.py:156+) pull one URL at a time on the agent
host. Here a URL table is fetched ON THE EXECUTORS via ``mapInPandas``
— the crawl scales with partition count, and the result is a normal
DataFrame that pipes straight into ``html_source.scrape_columns``.

Scale/politeness shape:

- fetch is map-only (no shuffle); repartition the URL table to set
  crawl parallelism;
- ``delay_s`` sleeps between requests WITHIN a partition — with
  host-hash partitioning (``partition_by_host``) that is per-host
  politeness, the standard crawler discipline;
- every row gets an error ENVELOPE, never an exception: status 0 +
  ``error`` for transport failures, so one dead link can't fail a
  10M-row crawl stage;
- bodies are capped at ``max_bytes`` (``truncated`` flag) — unbounded
  responses can't blow executor memory.

Only http/https pass the scheme gate (file:// and friends are
rejected per-row — an SSRF-shaped failure, not a crash). Tests run
against a loopback stdlib http.server; nothing here needs external
network access.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FETCH_SCHEMA = (
    "url string, status int, content_type string, body binary,"
    " n_bytes long, truncated boolean, error string"
)


def partition_by_host(urls: DataFrame, n: int, url_col: str = "url") -> DataFrame:
    """Hash-partition a URL table by host so per-partition ``delay_s``
    throttling becomes per-host politeness."""
    host = F.parse_url(F.col(url_col), F.lit("HOST"))
    return urls.repartition(n, host)


def fetch_urls(
    urls: DataFrame,
    url_col: str = "url",
    timeout_s: float = 10.0,
    max_bytes: int = 4 * 1024 * 1024,
    delay_s: float = 0.0,
    user_agent: str = "aden-hive-fork-spark/1.0",
    transport_factory=None,
) -> DataFrame:
    """Fetch every URL in ``urls`` on the executors; one result row
    per input row, failures as data (see module docstring). Extra
    input columns are dropped — join back on ``url`` if needed.

    ``transport_factory`` (optional, must pickle by value — lambda/
    closure): builds a per-executor ``transport(url) -> dict`` that
    replaces the live urllib GET; the dict's keys override the result
    envelope (status/content_type/body/error) — the netscan
    scan_headers_table fixture discipline for hermetic tests."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # stdlib-only, imported on the executor
        import time
        import urllib.error
        import urllib.request

        transport = transport_factory() if transport_factory else None

        def one(url: str) -> dict:
            out = {
                "url": url,
                "status": 0,
                "content_type": None,
                "body": None,
                "n_bytes": 0,
                "truncated": False,
                "error": None,
            }
            if not isinstance(url, str) or not url.lower().startswith(
                ("http://", "https://")
            ):
                out["error"] = "rejected_scheme"
                return out
            if transport is not None:
                try:
                    env = transport(url) or {}
                except Exception as e:  # noqa: BLE001 — envelope
                    env = {"error": f"{type(e).__name__}: {e}"}
                # explicit allowlist: never let a fixture override
                # 'url' (the documented join-back key) or the derived
                # n_bytes/truncated accounting
                _OVERRIDABLE = {"status", "content_type", "body", "error"}
                out.update(
                    {k: v for k, v in env.items() if k in _OVERRIDABLE}
                )
                body = out.get("body")
                if isinstance(body, str):
                    out["body"] = body.encode("utf-8")
                out["n_bytes"] = len(out["body"] or b"")
                return out
            req = urllib.request.Request(url, headers={"User-Agent": user_agent})
            try:
                with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                    body = resp.read(max_bytes + 1)
                    out["status"] = resp.status
                    out["content_type"] = resp.headers.get("Content-Type")
                    out["truncated"] = len(body) > max_bytes
                    out["body"] = body[:max_bytes]
                    out["n_bytes"] = len(out["body"])
            except urllib.error.HTTPError as e:  # non-2xx WITH a response
                out["status"] = e.code
                out["error"] = f"http_{e.code}"
            except Exception as e:  # DNS, refused, timeout, TLS...
                out["error"] = f"{type(e).__name__}: {e}"
            return out

        for pdf in batches:
            rows = []
            for url in pdf[url_col]:
                rows.append(one(url))
                if delay_s:
                    time.sleep(delay_s)
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "status", "content_type", "body",
                    "n_bytes", "truncated", "error",
                ],
            )

    return urls.select(url_col).mapInPandas(run, FETCH_SCHEMA)


def crawl_to_text(urls: DataFrame, **fetch_kw) -> DataFrame:
    """fetch → decode → scrape in one plan: the full web_scrape analog
    (url, status, title, text, n_links, error) as a map-only pipeline."""
    from .html_source import scrape_columns

    fetched = fetch_urls(urls, **fetch_kw)
    html = F.when(
        F.col("status").between(200, 299),
        F.decode(F.col("body"), "UTF-8"),
    ).otherwise(F.lit(None))
    # failed fetches keep NULL scrape columns (the UDFs themselves map
    # NULL html to empty results — mask them back out)
    ok = F.col("html").isNotNull()
    scraped = [
        F.when(ok, c).alias(name)
        for c, name in zip(scrape_columns("html"), ("title", "text", "n_links"))
    ]
    return fetched.withColumn("html", html).select(
        "url", "status", *scraped, "error"
    )
