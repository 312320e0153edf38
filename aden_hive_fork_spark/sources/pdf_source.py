"""PDF text scan (SURVEY.md §2.A row 34).

Reference: ``pdf_read(file_path, pages="1-5,8")`` -> text per page
(tools/src/aden_tools/tools/pdf_read_tool/pdf_read_tool.py:20-194).

Pure-stdlib implementation against the public PDF spec: content
streams are located by scanning ``stream``/``endstream`` object
boundaries, FlateDecode streams are inflated with zlib, and text is
recovered from the ``Tj`` / ``TJ`` / ``'`` show operators (with
PDF-string escape handling). This covers straightforwardly generated
PDFs (one content stream per page, standard encodings); exotic
features (CID fonts, object streams, encryption) are out of scope —
such files yield empty text rather than errors.

Distributed path: ``pdf_read`` maps the extractor over a binaryFile
DataFrame with Arrow batches (one task per file partition).
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.DOTALL)
_TEXT_SHOW_RE = re.compile(rb"\((?:\\.|[^\\()])*\)\s*(?:Tj|')")
_TJ_ARRAY_RE = re.compile(rb"\[((?:[^\[\]\\]|\\.)*)\]\s*TJ")
_STRING_RE = re.compile(rb"\((?:\\.|[^\\()])*\)")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(s: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(s):
        c = s[i : i + 1]
        if c == b"\\" and i + 1 < len(s):
            nxt = s[i + 1 : i + 2]
            if nxt.isdigit():  # octal escape, up to 3 digits
                j = i + 1
                digits = b""
                while j < len(s) and s[j : j + 1].isdigit() and len(digits) < 3:
                    digits += s[j : j + 1]
                    j += 1
                out.append(int(digits, 8) & 0xFF)
                i = j
                continue
            out += _ESCAPES.get(nxt, nxt)
            i += 2
            continue
        out += c
        i += 1
    return bytes(out)


def _content_streams(pdf: bytes) -> list[bytes]:
    """All decoded stream payloads, in document order."""
    out = []
    for m in _STREAM_RE.finditer(pdf):
        start = m.end()
        end = pdf.find(b"endstream", start)
        if end == -1:
            continue
        data = pdf[start:end].rstrip(b"\r\n")
        if b"FlateDecode" in m.group(1):
            try:
                data = zlib.decompress(data)
            except zlib.error:
                continue
        out.append(data)
    return out


def _stream_text(stream: bytes) -> str:
    """Recover show-operator text from one content stream."""
    parts: list[bytes] = []
    for m in _TEXT_SHOW_RE.finditer(stream):
        lit = _STRING_RE.search(m.group(0))
        if lit:
            parts.append(_unescape(lit.group(0)[1:-1]))
    for m in _TJ_ARRAY_RE.finditer(stream):
        seg = b"".join(
            _unescape(sm.group(0)[1:-1]) for sm in _STRING_RE.finditer(m.group(1))
        )
        if seg:
            parts.append(seg)
    return b" ".join(p for p in parts if p).decode("latin-1", errors="replace")


def parse_page_spec(spec: str | None, n_pages: int) -> list[int]:
    """\"1-3,5\" -> [1,2,3,5] (1-based, clipped) — the reference's
    page-range grammar (pdf_read_tool.py)."""
    if not spec:
        return list(range(1, n_pages + 1))
    pages: list[int] = []
    for chunk in spec.split(","):
        chunk = chunk.strip()
        if not chunk:
            continue
        if "-" in chunk:
            lo_s, hi_s = chunk.split("-", 1)
            lo, hi = int(lo_s), int(hi_s)
        else:
            lo = hi = int(chunk)
        for p in range(max(1, lo), min(n_pages, hi) + 1):
            if p not in pages:
                pages.append(p)
    return pages


def pdf_extract_pages(content: bytes, pages: str | None = None) -> list[tuple[int, str]]:
    """(page_number, text) pairs for the requested pages. Pages are
    content streams containing text operators, in document order."""
    texts = [t for t in (_stream_text(s) for s in _content_streams(content)) if t]
    wanted = parse_page_spec(pages, len(texts))
    return [(p, texts[p - 1]) for p in wanted]


def pdf_read(binary_df: DataFrame, pages: str | None = None) -> DataFrame:
    """Distributed pdf_read over a binaryFile DataFrame:
    (path, page, text)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            rows = []
            for _, r in pdf_batch.iterrows():
                try:
                    extracted = pdf_extract_pages(bytes(r["content"]), pages)
                except Exception:
                    extracted = []
                for page_no, text in extracted:
                    rows.append({"path": r.get("path", ""), "page": page_no, "text": text})
            yield pd.DataFrame(rows, columns=["path", "page", "text"])

    return binary_df.select("path", "content").mapInPandas(
        extract, schema="path string, page int, text string"
    )


# ---------------------------------------------------------------------------
# writer — minimal but structurally valid single-column text PDF
# ---------------------------------------------------------------------------
def _pdf_escape(text: str) -> bytes:
    b = text.encode("latin-1", errors="replace")
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def pdf_write(path: str, pages: list[str], compress: bool = True) -> dict:
    """Write one text page per list entry as a valid PDF 1.4 file
    (xref table, page tree, Helvetica, FlateDecode content streams) —
    the sink twin of ``pdf_read``. Each page's text round-trips
    byte-exactly through ``pdf_extract_pages`` (escape/unescape of
    ``( ) \\`` included), which is what the oracle roundtrip query
    (q86) checks. Stdlib only, like the parser."""
    objects: list[bytes] = []

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)  # 1-based object number

    page_obj_nums = []
    content_obj_nums = []
    n_fixed = 3  # catalog, pages-tree, font — reserved below
    n_pages = len(pages)
    # object numbering: 1=catalog, 2=pages, 3=font, then per page:
    # content stream, page object
    next_num = n_fixed + 1
    for _ in pages:
        content_obj_nums.append(next_num)
        page_obj_nums.append(next_num + 1)
        next_num += 2

    kids = b" ".join(b"%d 0 R" % n for n in page_obj_nums)
    catalog = b"<< /Type /Catalog /Pages 2 0 R >>"
    pages_tree = b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n_pages)
    font = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"

    add(catalog)
    add(pages_tree)
    add(font)
    for i, text in enumerate(pages):
        stream = b"BT /F1 11 Tf 54 740 Td (%s) Tj ET" % _pdf_escape(text)
        filt = b""
        if compress:
            stream = zlib.compress(stream)
            filt = b" /Filter /FlateDecode"
        add(
            b"<< /Length %d%s >>\nstream\n%s\nendstream" % (len(stream), filt, stream)
        )
        add(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" /Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>"
            % content_obj_nums[i]
        )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (num, body)
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_at)
    )
    with open(path, "wb") as fh:
        fh.write(bytes(out))
    return {"success": True, "path": path, "pages": n_pages}
