"""Deterministic error categorization for test/run failures.

Reference parity: core/framework/testing/categorizer.py:16-89
(ErrorCategorizer.categorize / categorize_with_confidence /
get_fix_suggestion). The reference classifies one TestResult at a time
with compiled regexes in Python; here the classifier is a COLUMN
EXPRESSION — pattern hits are lowercase substring containments
evaluated JVM-side (whole-stage codegen, no Python in the hot path),
so categorizing a billion stored failures is one narrow map.

Categories and their iteration-strategy meaning (reference
categorizer.py:4-8):
- logic_error          — the goal/criteria definition is wrong
- implementation_error — a code bug in nodes/edges
- edge_case            — a new scenario worth its own test

Pattern semantics: the mapping from the reference's regexes to this
module's lowercase literal substrings is APPROXIMATE by design —
literal containment is bit-identical across engines (no regex-dialect
drift), which is what lets the classifier sit under the DuckDB oracle
gate (suite q307). Concretely:
- Most reference patterns ARE literals (``TypeError``, ``timeout``)
  and carry over unchanged (case-folded).
- ``NoneType.*has no attribute`` -> literal ``has no attribute``;
  ``NullPointerException``, ``assertion.*failed``,
  ``expected.*but got``, ``unexpected.*type``, ``null.*value``,
  ``rare input`` -> the contiguous literal forms
  (``nullpointerexception``, ``assertion failed``, ``but got``,
  ``unexpected type``, ``null value``, ``rare input``) — the common
  phrasings match identically; an interposed-word variant like
  "assertion clearly failed" is a known divergence.
- ``constraint violated:?\\s*core`` is BROADENED to
  ``constraint violated`` (the reference's ``core`` suffix anchor is
  dropped); ``connection.*timeout`` / ``request.*timeout`` are
  intentionally NOT separate literals — the bare ``timeout`` literal
  subsumes them (adding both would double-count one mention and
  skew the confidence ratio vs the reference).

Priority on multi-category hits mirrors the reference: logic >
implementation > edge, defaulting to implementation_error with
confidence 0.3 when nothing matches. Confidence =
min(0.9, 0.5 + dominant/total * 0.4) — same formula, computed in
exact small-integer arithmetic with one IEEE division.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Lowercase literal pattern sets (see module docstring for the
# regex→substring mapping rationale).
LOGIC_ERROR_PATTERNS: tuple[str, ...] = (
    "goal not achieved",
    "success criteria",
    "criteria not met",
    "constraint violated",
    "fundamental assumption",
    "specification error",
    "requirement mismatch",
    "expected behavior incorrect",
)

IMPLEMENTATION_ERROR_PATTERNS: tuple[str, ...] = (
    "typeerror",
    "attributeerror",
    "keyerror",
    "indexerror",
    "valueerror",
    "nameerror",
    "importerror",
    "modulenotfounderror",
    "runtimeerror",
    "assertionerror",
    "has no attribute",
    "nullpointerexception",
    "assertion failed",
    "but got",
    "unexpected type",
    "tool call failed",
    "node execution error",
    "agent execution failed",
    "missing required",
    "invalid argument",
)

EDGE_CASE_PATTERNS: tuple[str, ...] = (
    "timeout",
    "rate limit",
    "quota exceeded",
    "retry exhausted",
    "boundary condition",
    "unexpected format",
    "unexpected response",
    "empty result",
    "empty response",
    "no results",
    "null value",
    "rare input",
    "unicode",
    "encoding error",
    "special character",
)

FIX_SUGGESTIONS: dict[str, str] = {
    "logic_error": (
        "Review and update success_criteria or constraints in the goal "
        "definition."
    ),
    "implementation_error": "Fix the code in agent nodes/edges.",
    "edge_case": "Add a new test covering this edge-case scenario.",
}


def _hits(lowered: Column, patterns: tuple[str, ...]) -> Column:
    """Count of pattern containments — a sum of codegen'd CASEs."""
    n = F.lit(0)
    for p in patterns:
        n = n + F.when(F.contains(lowered, F.lit(p)), 1).otherwise(0)
    return n


def categorize_errors(
    df: DataFrame, error_col: str = "error"
) -> DataFrame:
    """Classify every row's error text; adds ``category``,
    ``confidence`` (double), and ``fix_suggestion`` columns. NULL
    error text gets NULL in all three (the reference returns None for
    passed tests)."""
    lowered = F.lower(F.col(error_col))
    df = (
        df.withColumn("_logic", _hits(lowered, LOGIC_ERROR_PATTERNS))
        .withColumn("_impl", _hits(lowered, IMPLEMENTATION_ERROR_PATTERNS))
        .withColumn("_edge", _hits(lowered, EDGE_CASE_PATTERNS))
    )
    total = F.col("_logic") + F.col("_impl") + F.col("_edge")
    # priority on ties mirrors the reference: logic, then impl, then edge
    dominant = F.when(
        (F.col("_logic") >= F.col("_impl"))
        & (F.col("_logic") >= F.col("_edge")),
        F.col("_logic"),
    ).otherwise(
        F.when(F.col("_impl") >= F.col("_edge"), F.col("_impl")).otherwise(
            F.col("_edge")
        )
    )
    category = F.when(F.col(error_col).isNull(), F.lit(None).cast("string")).otherwise(
        F.when(total == 0, F.lit("implementation_error")).otherwise(
            F.when(
                (F.col("_logic") >= F.col("_impl"))
                & (F.col("_logic") >= F.col("_edge")),
                F.lit("logic_error"),
            ).otherwise(
                F.when(
                    F.col("_impl") >= F.col("_edge"),
                    F.lit("implementation_error"),
                ).otherwise(F.lit("edge_case"))
            )
        )
    )
    confidence = F.when(
        F.col(error_col).isNull(), F.lit(None).cast("double")
    ).otherwise(
        F.when(total == 0, F.lit(0.3)).otherwise(
            F.least(
                F.lit(0.9),
                F.lit(0.5)
                + (dominant.cast("double") / total.cast("double"))
                * F.lit(0.4),
            )
        )
    )
    fix = F.when(F.col(error_col).isNull(), F.lit(None).cast("string"))
    for cat, text in FIX_SUGGESTIONS.items():
        fix = fix.when(category == cat, F.lit(text))
    return (
        df.withColumn("category", category)
        .withColumn("confidence", confidence)
        .withColumn("fix_suggestion", fix)
        .drop("_logic", "_impl", "_edge")
    )
