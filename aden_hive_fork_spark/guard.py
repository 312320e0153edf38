"""Read-only SQL guard.

The reference accepts arbitrary SQL but rejects statements containing
write/DDL keywords before execution (reference:
tools/src/aden_tools/tools/csv_tool/csv_tool.py:333-352,
excel_tool.py:542-561, bigquery_tool.py:27-58, postgres_tool.py:55).
This module re-implements that contract for Spark SQL: only
SELECT-shaped statements pass.
"""

from __future__ import annotations

import re

# Keywords whose presence as a whole word marks a mutating statement.
WRITE_KEYWORDS = frozenset(
    {
        "insert",
        "update",
        "delete",
        "drop",
        "create",
        "alter",
        "truncate",
        "replace",
        "merge",
        "grant",
        "revoke",
        "attach",
        "detach",
        "copy",
        "call",
        "install",
        "export",
        "import",
        "vacuum",
        "msck",
        "refresh",
        "uncache",
        "analyze",
    }
)

# Statements must start with one of these (after comments/whitespace).
_ALLOWED_HEADS = ("select", "with", "explain", "describe", "desc", "show", "values", "table")

_COMMENT_RE = re.compile(r"(--[^\n]*)|(/\*.*?\*/)", re.DOTALL)
_STRING_RE = re.compile(r"('([^']|'')*')|(\"([^\"]|\"\")*\")")


class SqlGuardError(ValueError):
    """Raised when a statement is not read-only."""


def _strip_literals(sql: str) -> str:
    sql = _COMMENT_RE.sub(" ", sql)
    return _STRING_RE.sub("''", sql)


def ensure_read_only(sql: str) -> None:
    """Raise SqlGuardError unless ``sql`` is a single read-only statement."""
    if not sql or not sql.strip():
        raise SqlGuardError("empty query")
    stripped = _strip_literals(sql).strip()
    # single statement only (trailing ';' tolerated)
    if ";" in stripped.rstrip().rstrip(";"):
        raise SqlGuardError("multiple statements are not allowed")
    head = re.match(r"[A-Za-z]+", stripped.lstrip("( \n\t"))
    if head is None or head.group(0).lower() not in _ALLOWED_HEADS:
        raise SqlGuardError(
            f"only read-only queries are allowed (must start with one of {_ALLOWED_HEADS})"
        )
    words = set(re.findall(r"[a-z_]+", stripped.lower()))
    blocked = words & WRITE_KEYWORDS
    if blocked:
        raise SqlGuardError(f"write keywords are not allowed: {sorted(blocked)}")
