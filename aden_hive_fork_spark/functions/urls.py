"""URL canonicalization — the web-corpus dedup prerequisite.

Crawled corpora carry the same resource under syntactic variants:
case-shifted hosts, explicit default ports, permuted query params,
fragments. Exact-dedup on the raw string misses all of them;
canonicalize first, then the plain exact/near dedup tiers apply
(reference analog: the web tools normalize URLs per request; this is
the corpus-scale column form).

Pure JVM column expressions (regexp_extract / split / sort_array) —
shuffle-free, streaming-safe, and restricted to the Java∩RE2 regex
dialect so the DuckDB oracle replays the canonical strings
byte-for-byte (q146 compares them with a value hash, not just
counts).

Normalizations applied (RFC 3986 §6 syntax-based subset, plus the
conventional query-param sort):
- scheme and host lowercased;
- userinfo dropped (credentials never identify a resource — and
  never belong in a canonical key);
- default ports stripped (http:80, https:443);
- empty path → "/";
- query parameters sorted bytewise; empty query dropped;
- fragment dropped.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def canonical_url(col: Column | str) -> Column:
    """Canonical form of an absolute http(s) URL (see module doc).
    Rows that don't parse (no ``scheme://``) canonicalize to the
    trimmed original — garbage in, garbage out, but deterministic."""
    u = F.col(col) if isinstance(col, str) else col
    u = F.trim(u)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^#]*)", 1)
    # authority ends at '/', '?', or '#' — a path-less URL like
    # 'http://h.com?x=a@b.c' must not leak its query into the
    # authority (the '@' strip below would then eat the real host)
    authority = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    pathq = F.regexp_extract(rest, r"^[^/?#]*(.*)$", 1)
    # userinfo ("user:pass@") is NOT part of the host — strip
    # everything through the last '@', else 'alice:x@a.com' and
    # 'alice:y@b.com' would both canonicalize to host 'alice' and
    # distinct resources would merge (silent dedup data loss).
    hostport = F.regexp_extract(authority, r"([^@]*)$", 1)
    host = F.lower(F.substring_index(hostport, ":", 1))
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)

    port_sfx = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    path_norm = F.when(path == "", F.lit("/")).otherwise(path)
    query_sfx = F.when(query == "", F.lit("")).otherwise(
        F.concat(
            F.lit("?"),
            F.array_join(F.sort_array(F.split(query, "&")), "&"),
        )
    )
    canon = F.concat(scheme, F.lit("://"), host, port_sfx, path_norm, query_sfx)
    return F.when(scheme == "", u).otherwise(canon)
