"""Exact heavy hitters at scale: per-partition Misra-Gries candidate
sketch + exact rescore of the (small) candidate set.

A plain ``GROUP BY x HAVING count >= T`` shuffles the FULL key
cardinality — 100 TB of high-cardinality keys shuffles billions of
groups to find the dozen frequent ones. The sketch-then-rescore
pattern (the similarity-tier discipline: cheap bounded candidate
pass, exact confirmation of survivors only) does it with bounded
memory and a candidate-only shuffle:

1. **Candidates** — one ``mapInPandas`` pass keeps a Misra-Gries
   summary of at most ``k`` counters per partition (batch-merged:
   add the batch's exact counts, then subtract the (k+1)-th largest
   counter value from all and drop non-positives — every decrement
   round removes ≥ (k+1)·d mass, so total undercount per partition
   is ≤ n_p/(k+1)). By the MG merge theorem the union of the
   per-partition summaries holds EVERY value with global frequency
   > N/(k+1). Memory is O(k) per task, output ≤ k·#partitions rows.
2. **Rescore** — exact counts for candidate values only: broadcast
   the candidate set, left-semi prune the table map-side, one keyed
   aggregate over the surviving rows.

The threshold is RELATIVE — ``min_frac`` of total rows — because
that makes the soundness condition scale-free: the result equals the
full GROUP BY exactly whenever ``min_frac > 1/(k+1)`` (enforced), at
every data size. The comparison ``count·denom >= N·num`` is integer
math — no float threshold wobble between engines.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def _mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries(k) candidate values (one column,
    same name/type as ``col``)."""
    schema = StructType([df.schema[col]])

    def mg(batches):
        import pandas as pd

        counters = pd.Series(dtype="int64")
        for pdf in batches:
            vc = pdf[col].dropna().value_counts()
            counters = counters.add(vc, fill_value=0).astype("int64")
            if len(counters) > k:
                d = counters.nlargest(k + 1).iloc[-1]
                counters = counters - d
                counters = counters[counters > 0]
        yield pd.DataFrame({col: counters.index})

    return df.select(col).mapInPandas(mg, schema)


def heavy_hitters(
    df: DataFrame,
    col: str,
    min_frac: Fraction | float = Fraction(1, 1000),
    k: int = 4096,
) -> DataFrame:
    """(value, hh_count) for every value whose frequency is >=
    ``min_frac`` of the rows — EXACT (identical to the full GROUP BY)
    because ``min_frac > 1/(k+1)`` is enforced and the MG candidate
    union then provably contains every qualifying value.
    """
    frac = Fraction(min_frac).limit_denominator(10**9)
    if frac <= Fraction(1, k + 1):
        raise ValueError(
            f"min_frac {float(frac)} must exceed 1/(k+1)={1 / (k + 1):.3g} "
            "for the sketch to be sound — raise k or the threshold"
        )
    cand = _mg_candidates(df, col, k).distinct()
    total = df.agg(F.count(col).cast("bigint").alias("_n"))
    pruned = df.select(col).join(F.broadcast(cand), col, "left_semi")
    counts = pruned.groupBy(col).agg(
        F.count(F.lit(1)).cast("bigint").alias("hh_count")
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(
            F.col("hh_count") * F.lit(frac.denominator)
            >= F.col("_n") * F.lit(frac.numerator)
        )
        .select(col, "hh_count")
    )
