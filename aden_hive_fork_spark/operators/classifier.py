"""Corpus-trained Naive Bayes text classifier — the quality/domain
scoring pass of a training-data pipeline (fastText-style filtering:
score documents by how much their tokens look like a labeled "good"
class), built ENTIRELY from relational operators so that training and
scoring both run distributed and both sit under the DuckDB oracle.

Multinomial NB with add-alpha smoothing, log-odds form:

    odds(t) = ln( (c_good(t)+a) / (N_good + a*V) )
            - ln( (c_bad(t)+a)  / (N_bad  + a*V) )
    score(d) = ln(n_good_docs / n_bad_docs) + sum_{t in d} odds(t)

Everything is counts, joins, and one ln() per token type:

- **Train**: explode tokens → one groupBy for per-(token, class)
  counts → tiny scalar aggregates for totals. Cost: one shuffle of
  the token list; the model is a (token, odds) TABLE, not a Python
  object — persist it, join it, inspect it with SQL.
- **Score**: explode tokens → broadcast (or shuffle) join against
  the odds table → per-doc SUM. Map + one keyed aggregate; unseen
  tokens fall back to the smoothed unseen-odds constant.

Determinism (oracle contract): per-token odds are rounded to 6
decimals and cast to DECIMAL before the per-doc sum, so the sum is
EXACT and order-independent in both engines; ln() ulp noise cannot
survive the 1e-6 rounding except on measure-zero boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKEN_SPLIT = r"\s+"


def _tokens(df: DataFrame, id_col: str, text_col: str,
             label_col: str | None = None) -> DataFrame:
    cols = [id_col] + ([label_col] if label_col else [])
    return (
        df.filter(F.col(text_col).isNotNull()
                  & (F.length(F.trim(F.col(text_col))) > 0))
        .select(
            *cols,
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), _TOKEN_SPLIT)
            ).alias("token"),
        )
    )


def nb_train(
    docs: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    odds_decimals: int = 6,
) -> tuple[DataFrame, DataFrame]:
    """Train on ``docs`` with boolean ``label_col`` (True = good).

    Returns ``(odds, consts)``:
    - ``odds``: one row per token — ``token, n_good, n_bad, odds``
      (DECIMAL, rounded to ``odds_decimals``);
    - ``consts``: ONE row — ``prior, unseen_odds`` (DECIMAL), the
      class prior and the odds assigned to unseen tokens.
    """
    toks = _tokens(docs, id_col, text_col, label_col)
    counts = toks.groupBy("token").agg(
        F.sum(F.when(F.col(label_col), 1).otherwise(0)).alias("n_good"),
        F.sum(F.when(F.col(label_col), 0).otherwise(1)).alias("n_bad"),
    )
    # totals get distinct names: Spark resolves case-insensitively, so
    # N_good would collide with the per-token n_good column
    totals = counts.agg(
        F.sum("n_good").alias("tot_good"),
        F.sum("n_bad").alias("tot_bad"),
        F.count(F.lit(1)).alias("vocab"),
    )
    doc_counts = docs.agg(
        F.sum(F.when(F.col(label_col), 1).otherwise(0)).alias("docs_good"),
        F.sum(F.when(F.col(label_col), 0).otherwise(1)).alias("docs_bad"),
    )

    dec = f"decimal(18,{odds_decimals})"

    def odds_expr(cg, cb):
        return F.round(
            F.log(
                (cg + F.lit(alpha)) / (F.col("tot_good") + alpha * F.col("vocab"))
            )
            - F.log(
                (cb + F.lit(alpha)) / (F.col("tot_bad") + alpha * F.col("vocab"))
            ),
            odds_decimals,
        ).cast(dec)

    odds = counts.crossJoin(F.broadcast(totals)).select(
        "token", "n_good", "n_bad",
        odds_expr(F.col("n_good"), F.col("n_bad")).alias("odds"),
    )
    consts = (
        totals.crossJoin(doc_counts)
        .select(
            F.round(F.log(F.col("docs_good") / F.col("docs_bad")), odds_decimals)
            .cast(dec)
            .alias("prior"),
            odds_expr(F.lit(0), F.lit(0)).alias("unseen_odds"),
        )
    )
    return odds, consts


def nb_score(
    docs: DataFrame,
    odds: DataFrame,
    consts: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str = "nb_score",
    broadcast_model: bool = True,
) -> DataFrame:
    """Score every doc: prior + sum of token odds (unseen tokens get
    ``unseen_odds``). DECIMAL arithmetic end to end — the sum is
    exact, so results are independent of partitioning and engine.

    ``broadcast_model=True`` broadcasts the odds table (the common
    case: vocab ≪ corpus); set False to let AQE pick a shuffle join
    for huge vocabularies."""
    toks = _tokens(docs, id_col, text_col)
    model = F.broadcast(odds) if broadcast_model else odds
    scored = (
        toks.join(model.select("token", "odds"), "token", "left")
        .crossJoin(F.broadcast(consts))
        .select(
            id_col,
            F.coalesce(F.col("odds"), F.col("unseen_odds")).alias("_o"),
            "prior",
        )
        .groupBy(id_col, "prior")
        .agg(F.sum("_o").alias("_sum"))
        .select(
            id_col,
            (F.col("prior") + F.col("_sum")).alias(score_col),
        )
    )
    return scored
