"""JSON extraction & heuristic repair (SURVEY.md §2.A row 28).

The reference extracts the first balanced JSON object from free text
and applies heuristic repairs before giving up
(reference: core/framework/graph/node.py:33-139 find_json_object;
graph/output_cleaner.py:19-338 repair tiers). Fresh implementation of
the same contract; exposed both as plain Python (driver-side use) and
as a pandas UDF factory for distributed columns. Well-formed JSON
columns should use the native ``from_json``/``get_json_object``
instead — this is the salvage path for LLM-ish messy text.
"""

from __future__ import annotations

import json
import re
from typing import Any


def find_json_object(text: str) -> str | None:
    """Return the first balanced ``{...}`` object in ``text`` (string-
    and escape-aware), or None."""
    start = text.find("{")
    while start != -1:
        depth = 0
        in_str = False
        esc = False
        for i in range(start, len(text)):
            ch = text[i]
            if esc:
                esc = False
                continue
            if ch == "\\":
                esc = True
                continue
            if ch == '"':
                in_str = not in_str
                continue
            if in_str:
                continue
            if ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
                if depth == 0:
                    return text[start : i + 1]
        start = text.find("{", start + 1)
    return None


def fix_unescaped_newlines(candidate: str) -> str:
    """Escape raw newlines that appear inside JSON string literals."""
    out: list[str] = []
    in_str = False
    esc = False
    for ch in candidate:
        if esc:
            out.append(ch)
            esc = False
            continue
        if ch == "\\":
            out.append(ch)
            esc = True
            continue
        if ch == '"':
            in_str = not in_str
            out.append(ch)
            continue
        if in_str and ch == "\n":
            out.append("\\n")
            continue
        if in_str and ch == "\t":
            out.append("\\t")
            continue
        out.append(ch)
    return "".join(out)


_TRAILING_COMMA = re.compile(r",\s*([}\]])")
_SINGLE_QUOTED_KEY = re.compile(r"(?<=[{,])\s*'([^']*)'\s*:")
_PY_LITERALS = [(re.compile(r"\bTrue\b"), "true"), (re.compile(r"\bFalse\b"), "false"),
                (re.compile(r"\bNone\b"), "null")]


def repair_json(text: str) -> dict[str, Any] | None:
    """Best-effort parse: extract balanced object, then apply repair
    tiers (raw parse → newline escape → trailing commas → quote/python
    literal fixes). Returns a dict or None (the reference's LLM-
    fallback tier is out of scope by design — deterministic only)."""
    candidate = find_json_object(text)
    if candidate is None:
        return None
    attempts = [candidate]
    fixed = fix_unescaped_newlines(candidate)
    attempts.append(fixed)
    t = _TRAILING_COMMA.sub(r"\1", fixed)
    t = _SINGLE_QUOTED_KEY.sub(r'"\1":', t)
    for pat, repl in _PY_LITERALS:
        t = pat.sub(repl, t)
    attempts.append(t)
    for a in attempts:
        try:
            parsed = json.loads(a)
            if isinstance(parsed, dict):
                return parsed
        except json.JSONDecodeError:
            continue
    return None


def repair_json_udf():
    """Arrow-batched pandas UDF: messy-text column -> canonical JSON
    string column (NULL when unsalvageable). Use only when the native
    from_json path fails — Python in the row path is the slow tier."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _one(text):
        if text is None:
            return None
        parsed = repair_json(str(text))
        return None if parsed is None else json.dumps(parsed, sort_keys=True)

    # NB: no type hints on the inner fn — `from __future__ import
    # annotations` turns them into strings pyspark can't resolve here.
    def _repair(s):
        return s.map(_one)

    return pandas_udf(_repair, "string")
