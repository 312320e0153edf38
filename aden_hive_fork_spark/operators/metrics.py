"""Classifier evaluation metrics, exact and engine-replayable — the
model-eval tier of a training-data pipeline (score a quality/safety
classifier over the corpus, read AUC/log-loss/calibration before
trusting its filters).

Everything here avoids the two traps that make naive metric code
non-deterministic at scale:

- **Rank statistics, not curve integration.** ROC AUC is computed by
  the Mann-Whitney identity AUC = (ΣR⁺ − n⁺(n⁺+1)/2) / (n⁺n⁻) with
  AVERAGE ranks for score ties — doubled average ranks are integers
  (the spearman_corr trick), so the whole statistic is exact integer
  work until one final IEEE division. No trapezoid sweep, no
  per-partition curve stitching.

- **Quantize-then-decimal-sum for float reductions.** Log-loss terms
  are transcendental doubles; summing them corpus-wide in floating
  point is partition-order dependent. Each term is floor-quantized
  (fquant — pure IEEE, engine-identical) and CAST to DECIMAL, whose
  sum is exact and associative — deterministic at ANY corpus size,
  unlike a sorted fold (which needs bounded groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .stats import fquant


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """Exact ROC AUC per group: ``n_pos, n_neg, auc``. ``label_col``
    must be boolean-like (true = positive). Ties in the score get
    average ranks — the exact Mann-Whitney treatment, NOT a curve
    approximation. One ordered window pass + one aggregate.
    NULL auc when either class is empty.
    """
    g = list(group_cols or [])
    base = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    )
    w = Window.partitionBy(*g).orderBy(F.col(score_col).asc())
    t = Window.partitionBy(*g, score_col)
    r2 = (2 * F.rank().over(w) + F.count(F.lit(1)).over(t) - 1).cast(
        "bigint"
    )
    ranked = base.select(
        *g, F.col(label_col).cast("boolean").alias("_y"), r2.alias("_r2")
    )
    agg = ranked.groupBy(*g).agg(
        F.sum(F.when(F.col("_y"), 1).otherwise(0)).cast("bigint").alias(
            "n_pos"
        ),
        F.sum(F.when(~F.col("_y"), 1).otherwise(0)).cast("bigint").alias(
            "n_neg"
        ),
        F.sum(F.when(F.col("_y"), F.col("_r2")).otherwise(0))
        .cast("bigint")
        .alias("_sr2"),
    )
    np_, nn = F.col("n_pos").cast("double"), F.col("n_neg").cast("double")
    # ΣR⁺ = _sr2 / 2 (doubled ranks); Mann-Whitney U = ΣR⁺ − n⁺(n⁺+1)/2
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        (F.col("_sr2").cast("double") / 2.0 - np_ * (np_ + 1.0) / 2.0)
        / (np_ * nn),
    )
    return agg.select(
        *g,
        "n_pos",
        "n_neg",
        F.round(auc, ndigits).cast("double").alias("auc"),
    )


def log_loss(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
    eps: float = 1e-6,
    ndigits: int = 6,
) -> DataFrame:
    """Mean binary cross-entropy per group: ``n_rows, logloss``.
    Probabilities clamp to [eps, 1−eps]. Per-row terms floor-quantize
    to 9 digits then sum as exact DECIMAL(28,9) — the corpus-sized
    float reduction becomes associative, so the result is identical
    under any partitioning (and replayable: DuckDB computes the same
    FLOOR(ln·1e9)/1e9 terms and the same decimal sum).
    """
    g = list(group_cols or [])
    base = df.filter(
        F.col(prob_col).isNotNull() & F.col(label_col).isNotNull()
    )
    p = F.least(
        F.greatest(F.col(prob_col).cast("double"), F.lit(float(eps))),
        F.lit(1.0 - float(eps)),
    )
    y = F.col(label_col).cast("boolean")
    term = -F.when(y, fquant(F.log(p), 9)).otherwise(
        fquant(F.log(1.0 - p), 9)
    )
    q = term.cast("decimal(28,9)")
    agg = base.groupBy(*g).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(q).cast("decimal(38,9)").alias("_s"),
    )
    return agg.select(
        *g,
        "n_rows",
        F.round(
            F.col("_s").cast("double") / F.col("n_rows").cast("double"),
            ndigits,
        )
        .cast("double")
        .alias("logloss"),
    )


def pr_at_thresholds(
    df: DataFrame,
    score_col: str,
    label_col: str,
    thresholds: list[float],
    ndigits: int = 6,
) -> DataFrame:
    """Precision/recall/F1 at each literal threshold (predict
    positive when score ≥ t): one conditional aggregate computes
    every threshold's confusion counts in a single corpus pass —
    |thresholds| rows out, exact integer counts, fixed IEEE ratios.
    """
    base = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    )
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("boolean")
    aggs = []
    for i, t in enumerate(thresholds):
        pred = s >= F.lit(float(t))
        aggs += [
            F.sum(F.when(pred & y, 1).otherwise(0))
            .cast("bigint")
            .alias(f"_tp_{i}"),
            F.sum(F.when(pred & ~y, 1).otherwise(0))
            .cast("bigint")
            .alias(f"_fp_{i}"),
            F.sum(F.when(~pred & y, 1).otherwise(0))
            .cast("bigint")
            .alias(f"_fn_{i}"),
        ]
    wide = base.agg(*aggs)
    rows = []
    for i, t in enumerate(thresholds):
        tp = F.col(f"_tp_{i}").cast("double")
        fp = F.col(f"_fp_{i}").cast("double")
        fn = F.col(f"_fn_{i}").cast("double")
        prec = F.when(tp + fp > 0, tp / (tp + fp))
        rec = F.when(tp + fn > 0, tp / (tp + fn))
        f1 = F.when(
            (tp + fp > 0) & (tp + fn > 0) & (tp > 0),
            2.0 * (tp / (tp + fp)) * (tp / (tp + fn))
            / (tp / (tp + fp) + tp / (tp + fn)),
        ).otherwise(
            F.when((tp + fp > 0) & (tp + fn > 0), F.lit(0.0))
        )
        rows.append(
            F.struct(
                F.lit(float(t)).alias("threshold"),
                F.col(f"_tp_{i}").alias("tp"),
                F.col(f"_fp_{i}").alias("fp"),
                F.col(f"_fn_{i}").alias("fn"),
                F.round(prec, ndigits).cast("double").alias("precision"),
                F.round(rec, ndigits).cast("double").alias("recall"),
                F.round(f1, ndigits).cast("double").alias("f1"),
            )
        )
    return (
        wide.select(F.explode(F.array(*rows)).alias("_r"))
        .select("_r.*")
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    scale: int = 6,
    ndigits: int = 6,
) -> DataFrame:
    """Reliability-diagram bins: equi-depth score deciles (quantile
    cuts broadcast, map-side assignment — the quantile_scores idiom),
    then per-bin mean score (exact DECIMAL sums of the quantized
    score) vs observed positive rate. A calibrated model tracks the
    diagonal. Output: ``bin, n, mean_score, pos_rate``.
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    fracs = [i / n_bins for i in range(1, n_bins)]
    base = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    )
    s = F.col(score_col).cast("double")
    cuts = base.agg(
        F.transform(
            F.percentile(s, F.array(*[F.lit(f) for f in fracs])),
            lambda v: F.round(v, ndigits),
        ).alias("_cuts")
    )
    binned = base.crossJoin(F.broadcast(cuts)).withColumn(
        "_bin",
        (
            F.lit(1)
            + F.aggregate(
                F.col("_cuts"),
                F.lit(0),
                lambda acc, c: acc + F.when(s > c, 1).otherwise(0),
            )
        ).cast("int"),
    )
    return (
        binned.groupBy(F.col("_bin").alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(s.cast(f"decimal(18,{scale})"))
            .cast("decimal(38,6)")
            .alias("_ss"),
            F.sum(F.when(F.col(label_col).cast("boolean"), 1).otherwise(0))
            .cast("bigint")
            .alias("_np"),
        )
        .select(
            "bin",
            "n",
            F.round(
                F.col("_ss").cast("double") / F.col("n").cast("double"),
                ndigits,
            )
            .cast("double")
            .alias("mean_score"),
            F.round(
                F.col("_np").cast("double") / F.col("n").cast("double"),
                ndigits,
            )
            .cast("double")
            .alias("pos_rate"),
        )
    )


def ndcg_at_k(
    ranking: DataFrame,
    rel: DataFrame,
    k: int = 10,
    qid_col: str = "qid",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    ndigits: int = 6,
) -> DataFrame:
    """NDCG@k of a ranking against graded relevance: per query,
    DCG = Σ_{r≤k} rel(doc@r)/log₂(r+1) against the ideal ordering's
    IDCG (linear-gain form — the exponential 2^rel−1 form overflows
    on count-valued relevance). Output: ``qid, dcg, idcg, ndcg``;
    NULL ndcg when the query has no relevant documents.

    Determinism: each discount term floor-quantizes (log₂ is
    transcendental — the fquant ulp discipline) and the per-query
    sums fold ≤ k bounded terms in sorted order. The ideal ranking
    ties break on the doc id, so IDCG is a pure function of the
    relevance table.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    r = rel.select(
        F.col(qid_col).alias("_q"),
        F.col(doc_col).alias("_d"),
        F.col(rel_col).cast("double").alias("_rel"),
    )
    top = ranking.filter(F.col(rank_col) <= k).select(
        F.col(qid_col).alias("_q"),
        F.col(doc_col).alias("_d"),
        F.col(rank_col).cast("int").alias("_r"),
    )
    term = lambda rank_expr: fquant(  # noqa: E731
        F.coalesce(F.col("_rel"), F.lit(0.0))
        / F.log2(rank_expr.cast("double") + 1.0),
        9,
    )
    fold = lambda c: F.aggregate(  # noqa: E731
        F.sort_array(F.collect_list(c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dcg = (
        top.join(r, ["_q", "_d"], "left")
        .select("_q", term(F.col("_r")).alias("_t"))
        .groupBy("_q")
        .agg(F.round(fold(F.col("_t")), ndigits).alias("dcg"))
    )
    iw = Window.partitionBy("_q").orderBy(
        F.col("_rel").desc(), F.col("_d").asc()
    )
    ideal = (
        r.filter(F.col("_rel") > 0)
        .withColumn("_r", F.row_number().over(iw))
        .filter(F.col("_r") <= k)
        .select("_q", term(F.col("_r")).alias("_t"))
        .groupBy("_q")
        .agg(F.round(fold(F.col("_t")), ndigits).alias("idcg"))
    )
    out = dcg.join(ideal, "_q", "left")
    return out.select(
        F.col("_q").alias(qid_col),
        F.col("dcg").cast("double").alias("dcg"),
        F.col("idcg").cast("double").alias("idcg"),
        F.round(
            F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg")),
            ndigits,
        )
        .cast("double")
        .alias("ndcg"),
    )


def ngram_overlap_eval(
    pairs: DataFrame,
    pair_col: str,
    cand_col: str,
    ref_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Per-pair n-gram overlap evaluation: ROUGE-2
    precision/recall/F1 and sentence BLEU-2 between a candidate and a
    reference text — the text-generation eval tier's workhorse
    metrics, computed with CLIPPED counts exactly as Papineni et al.
    2002 / Lin 2004 define them: overlap_n = Σ_g min(count_cand(g),
    count_ref(g)) over word n-grams WITH multiplicity.

    BLEU-2 = BP · sqrt(p1 · p2) with brevity penalty
    exp(1 − ref_len/cand_len) when cand is shorter (ln-free via the
    sqrt geometric mean; exp is floor-quantized at 1e-9, the q181
    transcendental discipline — sqrt itself is correctly rounded
    IEEE, identical in every engine). Zero candidate bigrams or a
    zero clipped count short-circuit to bleu2 = 0 (no log of zero
    anywhere).

    Scale shape: one n-gram explode per side per order (map-side),
    clipped sums via a co-keyed inner join on (pair, gram) — only
    grams PRESENT IN BOTH sides materialize — and one final keyed
    aggregate per pair. No all-pairs anything; cost tracks the pair
    list the caller supplies.

    Returns (``pair_col``, cand_tokens, ref_tokens, clip1, clip2,
    rouge2_p, rouge2_r, rouge2_f1, bleu2) — counts BIGINT, ratios
    DOUBLE round-``ndigits``."""
    def toks(c):
        return F.filter(
            F.split(F.trim(F.col(c)), r"\s+"), lambda w: w != ""
        )

    def grams(arr, n):
        return F.when(
            F.size(arr) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(arr) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", F.slice(arr, i, F.lit(n))
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    base = pairs.select(
        F.col(pair_col).alias("_pid"),
        toks(cand_col).alias("_cw"),
        toks(ref_col).alias("_rw"),
    )
    lens = base.select(
        "_pid",
        F.size("_cw").cast("bigint").alias("cand_tokens"),
        F.size("_rw").cast("bigint").alias("ref_tokens"),
    )

    def clipped(n):
        c = (
            base.select(
                "_pid", F.explode(grams(F.col("_cw"), n)).alias("_g")
            )
            .groupBy("_pid", "_g")
            .agg(F.count(F.lit(1)).alias("_cc"))
        )
        r = (
            base.select(
                "_pid", F.explode(grams(F.col("_rw"), n)).alias("_g")
            )
            .groupBy("_pid", "_g")
            .agg(F.count(F.lit(1)).alias("_rc"))
        )
        return (
            c.join(r, ["_pid", "_g"])
            .groupBy("_pid")
            .agg(
                F.sum(F.least("_cc", "_rc"))
                .cast("bigint")
                .alias(f"clip{n}")
            )
        )

    out = (
        lens.join(clipped(1), "_pid", "left")
        .join(clipped(2), "_pid", "left")
        .select(
            "_pid",
            "cand_tokens",
            "ref_tokens",
            F.coalesce("clip1", F.lit(0)).cast("bigint").alias("clip1"),
            F.coalesce("clip2", F.lit(0)).cast("bigint").alias("clip2"),
        )
    )
    n_c2 = F.greatest(F.col("cand_tokens") - 1, F.lit(0))
    n_r2 = F.greatest(F.col("ref_tokens") - 1, F.lit(0))
    p2 = F.when(
        n_c2 > 0, F.col("clip2").cast("double") / n_c2.cast("double")
    ).otherwise(F.lit(0.0))
    r2 = F.when(
        n_r2 > 0, F.col("clip2").cast("double") / n_r2.cast("double")
    ).otherwise(F.lit(0.0))
    f1 = F.when(
        (p2 + r2) > 0, 2.0 * p2 * r2 / (p2 + r2)
    ).otherwise(F.lit(0.0))
    p1 = F.when(
        F.col("cand_tokens") > 0,
        F.col("clip1").cast("double")
        / F.col("cand_tokens").cast("double"),
    ).otherwise(F.lit(0.0))
    bp = F.when(
        F.col("cand_tokens") >= F.col("ref_tokens"), F.lit(1.0)
    ).otherwise(
        fquant(
            F.exp(
                F.lit(1.0)
                - F.col("ref_tokens").cast("double")
                / F.col("cand_tokens").cast("double")
            ),
            9,
        )
    )
    bleu2 = F.when(
        (F.col("clip1") > 0)
        & (F.col("clip2") > 0)
        & (F.col("cand_tokens") > 0),
        bp * F.sqrt(p1 * p2),
    ).otherwise(F.lit(0.0))
    return out.select(
        F.col("_pid").alias(pair_col),
        "cand_tokens",
        "ref_tokens",
        "clip1",
        "clip2",
        F.round(p2, ndigits).cast("double").alias("rouge2_p"),
        F.round(r2, ndigits).cast("double").alias("rouge2_r"),
        F.round(f1, ndigits).cast("double").alias("rouge2_f1"),
        F.round(bleu2, ndigits).cast("double").alias("bleu2"),
    )


def cohens_kappa(
    df: DataFrame,
    rater_a: "F.Column",
    rater_b: "F.Column",
    ndigits: int = 6,
) -> DataFrame:
    """Cohen's kappa between two binary raters: chance-corrected
    agreement (po − pe) / (1 − pe) — the standard label-quality /
    annotator-agreement statistic for curation pipelines. ONE wide
    aggregate over the scan (four conditional counts); every ratio
    is a division of exact integers, so the statistic is
    engine-exact at round-``ndigits``.

    NULL policy: rows where EITHER rater is NULL are excluded from
    ALL counts (n as well as the four cells) — otherwise n would
    include rows that land in no cell and silently deflate po and
    pe.

    Returns 1 row: n, n11, n10, n01, n00, po, pe, kappa (kappa NULL
    when pe = 1, i.e. both raters are constant — the undefined
    case)."""
    a = rater_a.cast("boolean")
    b = rater_b.cast("boolean")
    agg = df.filter(a.isNotNull() & b.isNotNull()).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(a & b, 1).otherwise(0)).cast("bigint").alias("n11"),
        F.sum(F.when(a & ~b, 1).otherwise(0)).cast("bigint").alias("n10"),
        F.sum(F.when(~a & b, 1).otherwise(0)).cast("bigint").alias("n01"),
        F.sum(F.when(~a & ~b, 1).otherwise(0)).cast("bigint").alias("n00"),
    )
    n = F.col("n").cast("double")
    po = (F.col("n11") + F.col("n00")).cast("double") / n
    pa1 = (F.col("n11") + F.col("n10")).cast("double") / n
    pb1 = (F.col("n11") + F.col("n01")).cast("double") / n
    pe = pa1 * pb1 + (1.0 - pa1) * (1.0 - pb1)
    kappa = F.when(pe < 1.0, (po - pe) / (1.0 - pe))
    return agg.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.round(po, ndigits).cast("double").alias("po"),
        F.round(pe, ndigits).cast("double").alias("pe"),
        F.round(kappa, ndigits).cast("double").alias("kappa"),
    )
