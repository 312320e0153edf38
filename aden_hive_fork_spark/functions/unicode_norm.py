"""Unicode normalization — the corpus-cleaning pass that canonicalizes
visually-identical text before dedup/fingerprinting (decomposed
"a"+U+0301 vs precomposed "á" would otherwise hash differently and
defeat exact dedup).

Spark has no built-in Unicode normalizer, so this is a legitimate
Pandas-UDF boundary crossing (module policy: Python only where the
JVM genuinely can't — SCALING.md §5): ``unicodedata.normalize`` over
Arrow-batched Series, one vectorized call per batch. The DuckDB
oracle replays it with ``nfc_normalize`` — both implement Unicode
TR-15, so results are byte-identical.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def normalize_col(col: Column | str, form: str = "NFC") -> Column:
    """Column expression: Unicode-normalize a string column.

    ``form``: NFC | NFD | NFKC | NFKD (TR-15). Nulls pass through.
    """
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form: {form!r}")

    @F.pandas_udf(StringType())
    def _norm(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    return _norm(F.col(col) if isinstance(col, str) else col)
