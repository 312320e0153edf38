"""PII detection and redaction — the safety-curation pass every
training-data pipeline runs before text leaves the lake.

Reference analog: the reference's cleansing/validation tier operates
one payload at a time (core/framework validation + the excel/search
``search_predicate`` regex mode); this is the TABLE version — scan a
corpus column, count typed PII hits per document, and rewrite the
text with typed placeholders.

Spark-first: every detector is a single JVM ``regexp_count`` /
``regexp_replace`` column expression — whole-stage codegen, zero
Python in the row path, streaming-safe (stateless projections run
unchanged under Structured Streaming, like the quarantine split they
compose with). The patterns are deliberately restricted to the
regex dialect intersection of Java (Spark) and RE2 (DuckDB): no
lookbehind/lookahead, no backreferences — so the DuckDB oracle can
replay detection and redaction byte-for-byte.

100 TB: detection/redaction are narrow map-side projections (no
shuffle); a corpus-level PII census is one aggregate over the
projected counts. Redaction order is fixed (longest/most-specific
pattern first) so card numbers are never half-eaten by the phone
pattern — and the fixed order is what makes output deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: more specific / longer shapes first — redaction applies in
# this order, so a 16-digit card is consumed before the phone pattern
# could match its tail. Dialect-neutral (Java + RE2): \b \d and
# character classes only.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("card", r"\b\d{4}-\d{4}-\d{4}-\d{4}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]

_BY_NAME = dict(PII_PATTERNS)


def pii_count(col: Column | str, kind: str) -> Column:
    """Number of ``kind`` matches in the text (0 for no match, NULL
    text counts 0). Non-overlapping left-to-right matches — the same
    contract in Java regex and RE2, which is what keeps the count
    oracle-replayable."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.regexp_count(c, F.lit(_BY_NAME[kind])), F.lit(0)
    ).cast("int")


def detect_pii(
    df: DataFrame, text_col: str, kinds: list[str] | None = None
) -> DataFrame:
    """Append one ``pii_<kind>_count`` INT column per detector plus a
    ``pii_total`` sum — a pure projection (no shuffle, streaming-safe).
    """
    ks = kinds or [k for k, _ in PII_PATTERNS]
    out = df
    for k in ks:
        out = out.withColumn(f"pii_{k}_count", pii_count(text_col, k))
    total = None
    for k in ks:
        c = F.col(f"pii_{k}_count")
        total = c if total is None else total + c
    return out.withColumn("pii_total", total.cast("int"))


def redact_pii(
    col: Column | str, kinds: list[str] | None = None
) -> Column:
    """Rewrite the text with ``[KIND]`` placeholders, applying the
    detectors in PII_PATTERNS order (most specific first). A card
    number therefore becomes one ``[CARD]``, never ``[PHONE]-[SSN]``
    fragments. Pure regexp_replace chain — JVM, codegen, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    wanted = set(kinds) if kinds is not None else None
    for k, pat in PII_PATTERNS:
        if wanted is not None and k not in wanted:
            continue
        c = F.regexp_replace(c, F.lit(pat), F.lit(f"[{k.upper()}]"))
    return c


def pii_census(df: DataFrame, text_col: str, group_cols: list[str]) -> DataFrame:
    """Corpus-level PII report: per group, document count, documents
    containing any PII, and per-kind hit totals. One projection + one
    keyed aggregate — the whole census is a single shuffle whatever
    the corpus size."""
    kinds = [k for k, _ in PII_PATTERNS]
    d = detect_pii(df, text_col, kinds)
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("pii_total") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("docs_with_pii"),
    ] + [
        F.sum(F.col(f"pii_{k}_count")).cast("bigint").alias(f"n_{k}")
        for k in kinds
    ]
    return d.groupBy(*group_cols).agg(*aggs)


def k_anonymity_classes(df: DataFrame, quasi_cols: list[str]) -> DataFrame:
    """Equivalence classes over the quasi-identifier columns: one row
    per distinct quasi-identifier combination with its size and
    whether it meets a given k is left to the caller (``class_size``
    is the raw fact). One keyed aggregate — the class table is as
    small as the quasi-identifier cardinality, never the data."""
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("class_size")
    )


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int = 5, ndigits: int = 6
) -> DataFrame:
    """One-row re-identification risk summary: ``n_rows, n_classes,
    min_class_size, n_unsafe_classes`` (classes smaller than k),
    ``risky_rows`` (rows living in unsafe classes) and their
    fraction. The dataset is k-anonymous over ``quasi_cols`` iff
    ``n_unsafe_classes = 0``. Two aggregates total: data → classes →
    summary; the second input is already tiny."""
    classes = k_anonymity_classes(df, quasi_cols)
    return classes.agg(
        F.sum("class_size").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("class_size").cast("bigint").alias("min_class_size"),
        F.sum(F.when(F.col("class_size") < k, 1).otherwise(0))
        .cast("bigint")
        .alias("n_unsafe_classes"),
        F.sum(F.when(F.col("class_size") < k, F.col("class_size")).otherwise(0))
        .cast("bigint")
        .alias("risky_rows"),
    ).select(
        "n_rows",
        "n_classes",
        "min_class_size",
        "n_unsafe_classes",
        "risky_rows",
        F.round(
            F.col("risky_rows").cast("double") / F.col("n_rows").cast("double"),
            ndigits,
        )
        .cast("double")
        .alias("risky_frac"),
    )


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 3,
    ndigits: int = 6,
) -> DataFrame:
    """Distinct-l-diversity companion to ``k_anonymity_report``:
    k-anonymity bounds re-identification, but a class whose rows all
    share one SENSITIVE value still leaks it (homogeneity attack) —
    each equivalence class must also contain >= l distinct sensitive
    values. One-row summary: ``n_rows, n_classes, min_diversity,
    n_weak_classes`` (diversity < l), ``exposed_rows`` (rows in weak
    classes) and their fraction. Same two-aggregate shape as the
    k-report: data → per-class (count, exact distinct) → tiny
    summary."""
    classes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("class_size"),
        F.countDistinct(F.col(sensitive_col)).cast("bigint").alias("diversity"),
    )
    return classes.agg(
        F.sum("class_size").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("diversity").cast("bigint").alias("min_diversity"),
        F.sum(F.when(F.col("diversity") < l, 1).otherwise(0))
        .cast("bigint")
        .alias("n_weak_classes"),
        F.sum(
            F.when(F.col("diversity") < l, F.col("class_size")).otherwise(0)
        )
        .cast("bigint")
        .alias("exposed_rows"),
    ).select(
        "n_rows",
        "n_classes",
        "min_diversity",
        "n_weak_classes",
        "exposed_rows",
        F.round(
            F.col("exposed_rows").cast("double")
            / F.col("n_rows").cast("double"),
            ndigits,
        )
        .cast("double")
        .alias("exposed_frac"),
    )
