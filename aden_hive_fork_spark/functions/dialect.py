"""DuckDB → Spark SQL dialect shim.

The reference's SQL surface is DuckDB dialect (its ``csv_sql`` /
``excel_sql`` tools execute user SQL on an embedded DuckDB —
reference: tools/src/aden_tools/tools/csv_tool/csv_tool.py:355-361,
excel_tool.py:575-617). A user switching to this engine carries those
queries with them, so ``duckdb_to_spark_sql`` rewrites the COMMON
mechanical differences. It is deliberately conservative:

- rewrites happen OUTSIDE string literals and quoted identifiers only;
- only unambiguous 1:1 mappings are applied (a DuckDB name whose Spark
  twin has identical semantics for all argument types);
- everything else passes through untouched — Spark's ANSI parser is
  the arbiter, and its error messages name the offending function.

Mapped surface:

| DuckDB                      | Spark                     |
|-----------------------------|---------------------------|
| ``string_split(s, sep)``    | ``split(s, sep)`` — caveat: Spark's split takes a REGEX; plain-word/space separators behave identically, regex-special separators (``.`` etc.) do not and are the caller's responsibility |
| ``list_sort(a)``            | ``array_sort(a)``         |
| ``list_distinct(a)``        | ``array_distinct(a)``     |
| ``list_contains(a, x)``     | ``array_contains(a, x)``  |
| ``array_to_string(a, sep)`` | ``array_join(a, sep)``    |
| ``regexp_matches(s, p)``    | ``regexp_like(s, p)``     |
| ``date_diff('u', a, b)``    | ``timestampdiff(u, a, b)``|
| ``datediff('u', a, b)``     | ``timestampdiff(u, a, b)``|
| ``date_add / date_sub`` with quoted part stay as-is (same name) |
| ``x // y``                  | ``x div y``               |
| ``SELECT * EXCLUDE (...)``  | ``SELECT * EXCEPT (...)`` |
| ``epoch_ms(ts)``            | ``unix_millis(ts)``       |
| ``starts_with(s, p)``       | ``startswith(s, p)``      |
| ``ends_with(s, p)``         | ``endswith(s, p)``        |
| ``strpos(s, sub)``          | ``instr(s, sub)`` (both 1-based, 0 = absent) |
| ``list_value(...)``         | ``array(...)``            |
| ``list_extract(a, i)``      | ``element_at(a, i)`` (both 1-based, negative = from end) |
| ``array_length(a)``         | ``array_size(a)``         |
| ``quantile_cont(x, q)``     | ``percentile(x, q)`` (continuous interpolation both) |
| ``arg_max(a, b)``           | ``max_by(a, b)``          |
| ``arg_min(a, b)``           | ``min_by(a, b)``          |
| ``printf(fmt, ...)``        | ``format_string(fmt, ...)`` (%s/%d style both) |

Not mapped (documented): ``len`` (string-vs-list polymorphic in
DuckDB; Spark splits it into ``length``/``size``), ``string_agg``
(ordering semantics differ), ``log`` (base 10 in DuckDB, natural in
Spark — arity-dependent, too risky to rewrite), ``list_concat``
(DuckDB skips NULL inputs, Spark propagates NULL), ``epoch``/
``to_timestamp`` (session-timezone round-trip hazards on NTZ),
bracket list literals/indexing, lambda ``list_transform`` variants,
``struct_pack``.
"""

from __future__ import annotations

import re

# name -> name, applied only when followed by "("
_FN_MAP = {
    "string_split": "split",
    "str_split": "split",
    "list_sort": "array_sort",
    "list_distinct": "array_distinct",
    "list_contains": "array_contains",
    "array_to_string": "array_join",
    "regexp_matches": "regexp_like",
    "epoch_ms": "unix_millis",
    "starts_with": "startswith",
    "ends_with": "endswith",
    "strpos": "instr",
    "list_value": "array",
    "list_extract": "element_at",
    "array_length": "array_size",
    "quantile_cont": "percentile",
    "arg_max": "max_by",
    "arg_min": "min_by",
    "printf": "format_string",
}

_FN_RE = re.compile(
    r"\b(" + "|".join(_FN_MAP) + r")\b(?=\s*\()", re.IGNORECASE
)
# date_diff('day', a, b) / datediff('day', ... -> timestampdiff(day, ...
_DATEDIFF_RE = re.compile(
    r"\b(?:date_diff|datediff)\s*\(\s*'(\w+)'\s*,", re.IGNORECASE
)
_EXCLUDE_RE = re.compile(r"\*\s+EXCLUDE\s*\(", re.IGNORECASE)
_INTDIV_RE = re.compile(r"//")


def _split_literals(sql: str) -> list[tuple[bool, str]]:
    """Split into (is_literal, chunk) spans; literals are '...' (with
    '' escapes) and "..." quoted identifiers."""
    spans: list[tuple[bool, str]] = []
    i, n = 0, len(sql)
    buf = []
    while i < n:
        c = sql[i]
        if c in ("'", '"'):
            if buf:
                spans.append((False, "".join(buf)))
                buf = []
            q = c
            j = i + 1
            while j < n:
                if sql[j] == q:
                    if j + 1 < n and sql[j + 1] == q:  # doubled quote escape
                        j += 2
                        continue
                    break
                j += 1
            spans.append((True, sql[i : min(j + 1, n)]))
            i = j + 1
        else:
            buf.append(c)
            i += 1
    if buf:
        spans.append((False, "".join(buf)))
    return spans


def duckdb_to_spark_sql(sql: str) -> str:
    """Rewrite the documented DuckDB-isms to Spark SQL (see module
    docstring). String literals and quoted identifiers pass through
    byte-identical."""
    # date_diff('day', ...) straddles a literal boundary (the unit is
    # itself a string literal), so rewrite it over the full text first,
    # accepting matches only where the function name starts OUTSIDE a
    # literal span.
    lit_ranges = []
    pos = 0
    for is_lit, chunk in _split_literals(sql):
        if is_lit:
            lit_ranges.append((pos, pos + len(chunk)))
        pos += len(chunk)

    def outside_literals(m: re.Match) -> str:
        if any(a <= m.start() < b for a, b in lit_ranges):
            return m.group(0)
        return f"timestampdiff({m.group(1)},"

    sql = _DATEDIFF_RE.sub(outside_literals, sql)

    out = []
    for is_lit, chunk in _split_literals(sql):
        if is_lit:
            out.append(chunk)
            continue
        chunk = _FN_RE.sub(lambda m: _FN_MAP[m.group(1).lower()], chunk)
        chunk = _EXCLUDE_RE.sub("* EXCEPT(", chunk)
        chunk = _INTDIV_RE.sub(" div ", chunk)
        out.append(chunk)
    return "".join(out)
