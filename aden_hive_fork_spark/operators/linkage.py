"""Record linkage (entity resolution): blocked candidate generation +
weighted field-similarity scoring + best-match selection.

The reference's fuzzy string tier (``search_predicate`` fuzzy mode,
excel_source; q56's levenshtein brand match) resolves one string at a
time; data integration needs the TABLE×TABLE version — dedupe a CRM
against itself, link suppliers to a master vendor list — without the
all-pairs explosion.

Classic Fellegi-Sunter shape, Spark-first:

- **Blocking**: candidates come from an equi-join on cheap blocking
  keys (hash join, co-partitioned shuffle). Never a cross join; the
  block key bounds the candidate count analytically (same discipline
  as the inverted-index Jaccard join, dedup.py).
- **Scoring**: a weighted sum of per-field similarities, all pure JVM
  column expressions — ``levenshtein`` (builtin, also in DuckDB →
  oracle-checkable), exact matches, numeric closeness. Scores are
  ROUNDED before thresholding/ranking so float noise can't flip
  decisions between engines or runs.
- **Selection**: threshold filter + best-match-per-left via one
  window (rank on rounded score desc, tie-broken by right key).

100 TB: blocking keys should be chosen so the largest block fits a
task (add more key columns or salt hot blocks — ``salted_join`` in
joins.py composes); score+select are map+window over candidates only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def similarity(kind: str, lcol: Column, rcol: Column) -> Column:
    """Per-field similarity in [0, 1]:

    - ``exact``: 1.0 on equality (NULL-safe: two NULLs match).
    - ``levenshtein``: 1 - dist/max(len) — the normalized edit
      similarity; NULL on either side scores 0.
    - ``relative``: 1 - |a-b| / greatest(|a|, |b|, 1) for numerics.
    """
    if kind == "exact":
        return F.when(lcol.eqNullSafe(rcol), F.lit(1.0)).otherwise(0.0)
    if kind == "levenshtein":
        denom = F.greatest(F.length(lcol), F.length(rcol), F.lit(1))
        sim = 1.0 - F.levenshtein(lcol, rcol) / denom
        return F.when(lcol.isNull() | rcol.isNull(), F.lit(0.0)).otherwise(sim)
    if kind == "relative":
        denom = F.greatest(F.abs(lcol), F.abs(rcol), F.lit(1.0))
        return F.when(
            lcol.isNull() | rcol.isNull(), F.lit(0.0)
        ).otherwise(1.0 - F.abs(lcol - rcol) / denom)
    raise ValueError(f"unknown similarity kind: {kind!r}")


def link_records(
    left: DataFrame,
    right: DataFrame,
    block_on: list[tuple[str, str]],
    fields: list[tuple[str, str, float, str]],
    threshold: float = 0.8,
    left_id: str = "left_id",
    right_id: str = "right_id",
    best_per_left: bool = True,
    score_decimals: int = 4,
) -> DataFrame:
    """Link ``left`` to ``right``.

    ``block_on``: [(left_col, right_col)] equi-join blocking keys.
    ``fields``: [(left_col, right_col, weight, kind)] scored fields;
    weights should sum to 1 (not enforced — callers may scale).
    Output: ``left_id, right_id, score`` (+ ``rank`` when
    ``best_per_left``), score rounded to ``score_decimals`` BEFORE
    the threshold and ranking decisions.
    """
    if not block_on:
        raise ValueError("block_on must be non-empty (no all-pairs mode)")
    if not fields:
        raise ValueError("fields must be non-empty")

    cond = [left[lc] == right[rc] for lc, rc in block_on]
    cand = left.join(right, cond, "inner")

    score = F.lit(0.0)
    for lc, rc, weight, kind in fields:
        score = score + F.lit(weight) * similarity(kind, left[lc], right[rc])
    score = F.round(score, score_decimals)

    pairs = (
        cand.select(
            left[left_id].alias(left_id),
            right[right_id].alias(right_id),
            score.alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )
    if not best_per_left:
        return pairs
    w = Window.partitionBy(left_id).orderBy(
        F.desc("score"), F.asc(right_id)
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") == 1)
        .drop("rank")
    )
