"""Deterministic composite scoring (SURVEY.md §2.A row 37).

The reference's risk_scorer computes a weighted composite of factor
scores (reference: tools/src/aden_tools/tools/risk_scorer/
risk_scorer.py:181+). Generalized here as a column expression builder:
score = sum(weight_i * factor_i) / sum(weight_i), optionally clamped —
pure JVM arithmetic, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def weighted_score(
    factors: dict[str, float] | list[tuple[str | Column, float]],
    clamp: tuple[float, float] | None = (0.0, 100.0),
    scale: int = 2,
) -> Column:
    """Weighted average of factor columns.

    ``factors``: {column_name: weight} or [(column_or_Column, weight)]
    (Columns aren't hashable, hence the pair form). NULL factors drop
    out of both numerator and denominator (partial scoring, like the
    reference's optional factors).
    """
    pairs = list(factors.items()) if isinstance(factors, dict) else list(factors)
    if not pairs:
        raise ValueError("at least one factor required")
    num: Column = F.lit(0.0)
    den: Column = F.lit(0.0)
    for col, weight in pairs:
        c = F.col(col) if isinstance(col, str) else col
        present = c.isNotNull()
        num = num + F.when(present, c.cast("double") * F.lit(float(weight))).otherwise(0.0)
        den = den + F.when(present, F.lit(float(weight))).otherwise(0.0)
    score = num / F.nullif(den, F.lit(0.0))
    if clamp is not None:
        lo, hi = clamp
        # least/greatest IGNORE nulls (they'd resurrect an all-null
        # score as the clamp bound) — keep null null explicitly.
        clamped = F.least(F.greatest(score, F.lit(float(lo))), F.lit(float(hi)))
        score = F.when(score.isNull(), F.lit(None).cast("double")).otherwise(clamped)
    return F.round(score, scale).cast("double")
