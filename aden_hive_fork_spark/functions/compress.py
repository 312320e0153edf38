"""Compression-ratio text-quality signal.

deflate(text)/len(text) is the classic cheap redundancy detector
(boilerplate, keyword stuffing, template spam compress far below
natural prose) — the complement of the exact repetition filters in
suite/text (those count specific n-gram dominance; this catches
diffuse redundancy they miss).

Arrow-batched ``pandas_udf`` — the justified-Python tier (zlib has
no JVM column equivalent; the UDF is batch-vectorized, never
per-row-interpreted), shuffle-free, streaming-safe. zlib level 6
output is deterministic for a given zlib build, so the signal is
stable within an environment but NOT oracle-replayable across
engines — its suite query is declared rows-only by contract, and
unit tests pin analytic expectations (repetitive ≪ random).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def compression_ratio(texts: pd.Series) -> pd.Series:
    import zlib

    def ratio(t):
        if t is None:
            return None
        raw = t.encode("utf-8")
        if not raw:
            return None
        return round(len(zlib.compress(raw, 6)) / len(raw), 6)

    return texts.map(ratio)
