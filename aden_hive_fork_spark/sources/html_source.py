"""HTML → text extraction (the scan side of the reference's web
retrieval tools).

Reference analogs: ``web_scrape(url)`` returns a page's readable text
(tools/src/aden_tools/tools/web_scrape_tool/web_scrape_tool.py:36+),
``search_wikipedia`` returns title+snippet rows (wikipedia_tool.py:26).
Fetching is out-of-engine (an ingestion job writes raw HTML to a
table); THIS module is the distributed extraction stage: pure-stdlib
``html.parser`` (no bs4/lxml in this container), exposed as
Arrow-batched pandas UDFs so a 100 TB crawl table is processed
map-only — no shuffle, scales with partition count.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_SKIP_TAGS = {"script", "style", "noscript", "template", "head"}
_BLOCK_TAGS = {
    "p", "div", "br", "li", "tr", "h1", "h2", "h3", "h4", "h5", "h6",
    "section", "article", "header", "footer", "table", "ul", "ol",
}
_WS_RE = re.compile(r"[ \t\r\f\v]+")
_NL_RE = re.compile(r"\n{2,}")


class _TextExtractor(HTMLParser):
    """Visible-text extractor: skips script/style subtrees, inserts
    newlines at block boundaries, records <title> and link count."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.title_parts: list[str] = []
        self.n_links = 0
        self._skip_depth = 0
        self._in_title = False

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS and tag != "head":
            self._skip_depth += 1
        if tag == "title":
            self._in_title = True
        if tag == "a":
            self.n_links += 1
        if tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS and tag != "head":
            self._skip_depth = max(0, self._skip_depth - 1)
        if tag == "title":
            self._in_title = False
        if tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_data(self, data):
        if self._in_title:
            self.title_parts.append(data)
        elif self._skip_depth == 0:
            self.parts.append(data)


def html_to_text(html: str) -> str:
    """Readable text: tags stripped, script/style dropped, whitespace
    collapsed, block boundaries become single newlines."""
    p = _TextExtractor()
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        pass  # malformed HTML: keep whatever was extracted
    text = _WS_RE.sub(" ", "".join(p.parts))
    text = "\n".join(line.strip() for line in text.split("\n"))
    return _NL_RE.sub("\n", text).strip()


def html_title(html: str) -> str:
    p = _TextExtractor()
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        pass
    return _WS_RE.sub(" ", "".join(p.title_parts)).strip()


def html_link_count(html: str) -> int:
    p = _TextExtractor()
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        pass
    return p.n_links


def html_text_udf():
    """Arrow-batched UDF factory (UDF creation needs a live session)."""

    @pandas_udf("string")
    def _f(html: pd.Series) -> pd.Series:
        return html.map(html_to_text)

    return _f


def html_title_udf():
    @pandas_udf("string")
    def _f(html: pd.Series) -> pd.Series:
        return html.map(html_title)

    return _f


def html_links_udf():
    @pandas_udf("long")
    def _f(html: pd.Series) -> pd.Series:
        return html.map(html_link_count)

    return _f


def scrape_columns(html_col: str = "html") -> list[Column]:
    """The web_scrape result projection: title, text, link count."""
    c = F.col(html_col)
    return [
        html_title_udf()(c).alias("title"),
        html_text_udf()(c).alias("text"),
        html_links_udf()(c).alias("n_links"),
    ]


class _LinkExtractor(HTMLParser):
    """href + anchor text pairs, document order — the reference
    web_scrape ``include_links=true`` surface (web_scrape_tool.py)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, list[str]]] = []
        # one entry per OPEN <a>: the link index for href-bearing
        # anchors, None for href-less ones — a single 0/1 flag reset
        # by any </a> would let an href-less inner <a>...</a>
        # truncate the enclosing link's text, and appending to
        # links[-1] would attribute text after a CLOSED nested link
        # to that closed link instead of the still-open outer one
        self._stack: list[int | None] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            href = dict(attrs).get("href")
            if href:
                self.links.append((href, []))
                self._stack.append(len(self.links) - 1)
            else:
                self._stack.append(None)

    def handle_endtag(self, tag):
        if tag == "a" and self._stack:
            self._stack.pop()

    def handle_data(self, data):
        # text goes to the DEEPEST open href-bearing anchor (nested
        # href-less anchors render inside the enclosing link, so
        # their text belongs to it)
        for idx in reversed(self._stack):
            if idx is not None:
                self.links[idx][1].append(data)
                break


def html_links(html: str) -> list[dict]:
    """[{href, text}] in document order (anchors without an href are
    skipped; anchor text is whitespace-collapsed)."""
    p = _LinkExtractor()
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        pass
    return [
        {"href": href, "text": _WS_RE.sub(" ", "".join(parts)).strip()}
        for href, parts in p.links
    ]


def html_links_extract_udf():
    """Arrow-batched link extraction: array<struct<href,text>>."""

    @pandas_udf("array<struct<href string, text string>>")
    def _f(html: pd.Series) -> pd.Series:
        return html.map(
            lambda h: [(d["href"], d["text"]) for d in html_links(h)]
        )

    return _f
