"""Unicode text normalization — the cleanup stage every web-scale
pretraining pipeline runs BEFORE dedup (CCNet normalizes before
hashing; FineWeb's text extraction canonicalizes whitespace): NFC
composition, control/zero-width stripping, whitespace folding.
Running it first makes the downstream content hashes (exact dedup,
winnowing, simhash) see "e\\u0301" and "\\u00e9" as the same document
instead of two.

Reference analog: the reference validates/cleanses one payload at a
time (core/framework validation tier); this is the corpus TABLE
version, and the reference has no Unicode-normalization surface —
driver-mandated §2.D training-data extension (suite q342; composed
into the pipeline capstone as stage 1b of q336/q337).

Cross-engine contract (the hash gate): the transform is the exact
sequence

  1. NFC normalize            (Python unicodedata == DuckDB
                               nfc_normalize — both implement
                               Unicode NFC)
  2. strip control + zero-width codepoints   (explicit class below)
  3. fold whitespace runs to ONE space       (explicit class below)
  4. trim

with the character classes spelled out codepoint-by-codepoint on
both engines (never ``\\s`` — Python's is Unicode-wide while RE2's
is ASCII-only). Character counts are CODEPOINTS (Python ``len`` ==
DuckDB ``LENGTH``), never Java UTF-16 code units, which is why the
recount happens inside the same Arrow batch rather than via
``F.length``.

Scale shape: a map-only Arrow-batched projection — no shuffle, no
driver state, streaming-safe (stateless), and the one pass also
recounts chars so downstream budget/packing stages read a consistent
column.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Control + zero-width codepoints stripped in step 2. \t \n \r stay:
# they are whitespace, folded (not dropped) in step 3.
CONTROL_RANGES: list[tuple[int, int]] = [
    (0x0000, 0x0008),
    (0x000B, 0x000C),
    (0x000E, 0x001F),
    (0x007F, 0x009F),
    (0x200B, 0x200D),
    (0x2060, 0x2060),
    (0xFEFF, 0xFEFF),
]

# Whitespace codepoints folded in step 3 (ASCII + the Unicode space
# separators + line/paragraph separators).
WHITESPACE_RANGES: list[tuple[int, int]] = [
    (0x0009, 0x000A),
    (0x000D, 0x000D),
    (0x0020, 0x0020),
    (0x00A0, 0x00A0),
    (0x1680, 0x1680),
    (0x2000, 0x200A),
    (0x2028, 0x2029),
    (0x202F, 0x202F),
    (0x205F, 0x205F),
    (0x3000, 0x3000),
]


def _py_class(ranges: list[tuple[int, int]]) -> str:
    return "".join(
        (
            f"\\u{lo:04X}-\\u{hi:04X}"
            if lo != hi
            else f"\\u{lo:04X}"
        )
        for lo, hi in ranges
    )


def _re2_class(ranges: list[tuple[int, int]]) -> str:
    return "".join(
        (
            f"\\x{{{lo:04X}}}-\\x{{{hi:04X}}}"
            if lo != hi
            else f"\\x{{{lo:04X}}}"
        )
        for lo, hi in ranges
    )


def normalize_sql_expr(text_expr: str) -> str:
    """The DuckDB replay of :func:`normalize_text` (oracle twin):
    TRIM(fold(strip(nfc_normalize(text))))."""
    ctrl = _re2_class(CONTROL_RANGES)
    ws = _re2_class(WHITESPACE_RANGES)
    return (
        "TRIM(REGEXP_REPLACE(REGEXP_REPLACE("
        f"nfc_normalize({text_expr}), '[{ctrl}]', '', 'g'), "
        f"'[{ws}]+', ' ', 'g'))"
    )


def normalize_text(x: str | None) -> str | None:
    """Pure-Python reference transform (the executor kernel and the
    differential-test subject): NFC -> strip -> fold -> trim."""
    import re
    import unicodedata

    if x is None:
        return None
    y = unicodedata.normalize("NFC", x)
    y = re.sub(f"[{_py_class(CONTROL_RANGES)}]", "", y)
    y = re.sub(f"[{_py_class(WHITESPACE_RANGES)}]+", " ", y)
    return y.strip()


def normalize_corpus(
    df: DataFrame,
    text_col: str = "text",
    chars_col: str = "n_chars",
    drop_empty: bool = True,
) -> DataFrame:
    """Rewrite ``text_col`` with its normalized form and recount
    ``chars_col`` as CODEPOINTS of the result, in one Arrow-batched
    map-only pass (all other columns carried through). With
    ``drop_empty`` (default) documents that normalize to the empty
    string are dropped — they carry no trainable content. NULL text
    stays NULL and is KEPT either way (the normalize_text contract);
    filter NULLs upstream if they should go."""
    import re
    import unicodedata

    schema = df.schema
    out_fields = []
    for f in schema.fields:
        if f.name == text_col:
            out_fields.append(f"{f.name} string")
        elif f.name == chars_col:
            out_fields.append(f"{f.name} bigint")
        else:
            out_fields.append(f"{f.name} {f.dataType.simpleString()}")
    out_schema = ", ".join(out_fields)

    ctrl_re = re.compile(f"[{_py_class(CONTROL_RANGES)}]")
    ws_re = re.compile(f"[{_py_class(WHITESPACE_RANGES)}]+")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(x):
            if x is None:
                return None
            y = unicodedata.normalize("NFC", x)
            y = ctrl_re.sub("", y)
            y = ws_re.sub(" ", y)
            return y.strip()

        for pdf in batches:
            if pdf.empty:
                yield pdf
                continue
            norm = pdf[text_col].map(one)
            pdf = pdf.assign(
                **{
                    text_col: norm,
                    chars_col: norm.map(
                        lambda y: len(y) if y is not None else 0
                    ).astype("int64"),
                }
            )
            yield pdf

    out = df.mapInPandas(run, schema=out_schema)
    if drop_empty:
        # length(NULL) is NULL → a bare length>0 filter would also
        # drop NULL-text rows, contradicting the NULL-passthrough
        # contract above
        out = out.filter(
            F.col(text_col).isNull() | (F.length(text_col) > 0)
        )
    return out
