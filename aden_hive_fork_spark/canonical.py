"""Canonical serialization + hashing of query results.

Implements SURVEY.md §7.3: order-insensitive, type-normalized value
hashing so a Spark result and a DuckDB result can be compared exactly.
Used by the test suite's local oracle harness (mirrors the driver's
CORRECTNESS check).
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import math
from decimal import Decimal
from typing import Any, Iterable

NULL_SENTINEL = "\x00NULL\x00"
CELL_SEP = "\x1f"  # unambiguous cell delimiter: ('ab','c') must not hash like ('a','bc')


def canon_value(v: Any) -> str:
    """Normalize one cell to a canonical string."""
    if v is None:
        return NULL_SENTINEL
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, Decimal):
        # trailing-zero normalization: 2.50 == 2.5
        return format(v.normalize(), "f")
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_value(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    return str(v)


def canon_rows(rows: Iterable[dict[str, Any]]) -> list[str]:
    """Rows -> sorted canonical lines. Columns are sorted by name first
    (the driver's compare does the same), rows sorted lexicographically
    so hashing is order-insensitive."""
    lines = []
    for row in rows:
        lines.append(CELL_SEP.join(canon_value(row[k]) for k in sorted(row)))
    return sorted(lines)


def result_hash(rows: Iterable[dict[str, Any]]) -> str:
    h = hashlib.sha256()
    for line in canon_rows(rows):
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()
