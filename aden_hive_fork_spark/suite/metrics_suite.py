"""Classifier evaluation metrics over the document corpus — the
model-eval tier (operators/metrics.py): exact rank-statistic AUC,
quantized-term log loss, threshold PR, reliability bins. The scored
classifier is the q31/q32 heuristic language scorer (stopword ratio
→ is-English), so the whole evaluation chain is engine-replayable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query
from ._helpers import T
from .text import STOPWORDS, _stop_in_list

_EPS = 1e-6

_SCORED_SQL = f"""
      SELECT (lang = 'en') AS y,
        ROUND(CAST(len(list_filter(string_split(trim(text), ' '),
                w -> w IN ({_stop_in_list()}))) AS DOUBLE)
          / CAST(NULLIF(len(string_split(trim(text), ' ')), 0) AS DOUBLE),
          4) AS s
      FROM documents
"""


def _scored(spark, sf_dir):
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    toks = F.split(F.trim(F.col("text")), " ")
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w)))
    denom = F.nullif(F.size(toks), F.lit(0)).cast("double")
    return T(spark, sf_dir, "documents").select(
        (F.col("lang") == "en").alias("y"),
        F.round(n_stop.cast("double") / denom, 4)
        .cast("double")
        .alias("s"),
    )


# ---------------------------------------------------------------------------
# q253 — AUC + log loss of the heuristic language classifier: exact
# Mann-Whitney AUC (doubled average ranks — integers), log-loss terms
# floor-quantized then summed as exact DECIMAL (associative — the
# corpus-scale float-reduction discipline). One ordered pass + two
# aggregates.
# ---------------------------------------------------------------------------
@query(
    "q253_classifier_eval",
    oracle=f"""
    WITH scored AS ({_SCORED_SQL}),
    base AS (
      SELECT y, s FROM scored WHERE s IS NOT NULL AND y IS NOT NULL
    ),
    ranked AS (
      SELECT y,
        2 * RANK() OVER (ORDER BY s ASC)
          + COUNT(*) OVER (PARTITION BY s) - 1 AS r2
      FROM base
    ),
    a AS (
      SELECT
        CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        CAST(SUM(CASE WHEN NOT y THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
        CAST(SUM(CASE WHEN y THEN r2 ELSE 0 END) AS BIGINT) AS sr2
      FROM ranked
    ),
    ll AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(SUM(CAST(
          -(CASE WHEN y
            THEN FLOOR(ln(LEAST(GREATEST(s, 1e-06), 1.0 - 1e-06))
                       * 1e9) / 1e9
            ELSE FLOOR(ln(1.0 - LEAST(GREATEST(s, 1e-06), 1.0 - 1e-06))
                       * 1e9) / 1e9 END)
          AS DECIMAL(28,9))) AS DECIMAL(38,9)) AS sll
      FROM base
    )
    SELECT n_pos, n_neg,
      CAST(ROUND(CASE WHEN n_pos > 0 AND n_neg > 0 THEN
        (CAST(sr2 AS DOUBLE) / 2.0
         - CAST(n_pos AS DOUBLE) * (CAST(n_pos AS DOUBLE) + 1.0) / 2.0)
        / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
      END, 6) AS DOUBLE) AS auc,
      n_rows,
      CAST(ROUND(CAST(sll AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
        AS DOUBLE) AS logloss
    FROM a CROSS JOIN ll
    """,
)
def q253_classifier_eval(spark, sf_dir):
    """operators/metrics.roc_auc + log_loss over the stopword-ratio
    language classifier."""
    from ..operators.metrics import log_loss, roc_auc

    scored = _scored(spark, sf_dir)
    auc = roc_auc(scored, "s", "y")
    ll = log_loss(scored, "s", "y", eps=_EPS)
    return auc.crossJoin(F.broadcast(ll))


# ---------------------------------------------------------------------------
# q254 — reliability diagram: equi-depth score deciles (cut broadcast
# + map-side binning), per-bin exact-decimal mean score vs observed
# positive rate.
# ---------------------------------------------------------------------------
def _q254_oracle() -> str:
    fr = ", ".join(repr(i / 10) for i in range(1, 10))
    return f"""
    WITH scored AS ({_SCORED_SQL}),
    base AS (
      SELECT y, s FROM scored WHERE s IS NOT NULL AND y IS NOT NULL
    ),
    cuts AS (
      SELECT list_transform(quantile_cont(s, [{fr}]),
                            c -> ROUND(c, 6)) AS cs
      FROM base
    ),
    binned AS (
      SELECT y, s,
        CAST(1 + len(list_filter(cs, c -> s > c)) AS INT) AS bin
      FROM base CROSS JOIN cuts
    )
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
      CAST(ROUND(CAST(SUM(CAST(s AS DECIMAL(18,6))) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE), 6) AS DOUBLE) AS mean_score,
      CAST(ROUND(CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE), 6) AS DOUBLE) AS pos_rate
    FROM binned GROUP BY bin
    ORDER BY bin ASC
    """


@query("q254_calibration_bins", oracle=_q254_oracle())
def q254_calibration_bins(spark, sf_dir):
    """operators/metrics.calibration_bins over the language-scorer
    probabilities."""
    from ..operators.metrics import calibration_bins

    return calibration_bins(
        _scored(spark, sf_dir), "s", "y", n_bins=10
    ).orderBy(F.asc("bin"))


# ---------------------------------------------------------------------------
# q255 — precision/recall/F1 at literal operating thresholds: ONE
# conditional aggregate computes every threshold's confusion counts
# in a single corpus pass.
# ---------------------------------------------------------------------------
_THRESHOLDS = (0.05, 0.1, 0.15, 0.2)


def _q255_oracle() -> str:
    rows = []
    for t in _THRESHOLDS:
        rows.append(f"""
    SELECT {t!r} AS threshold,
      CAST(SUM(CASE WHEN s >= {t!r} AND y THEN 1 ELSE 0 END) AS BIGINT)
        AS tp,
      CAST(SUM(CASE WHEN s >= {t!r} AND NOT y THEN 1 ELSE 0 END) AS BIGINT)
        AS fp,
      CAST(SUM(CASE WHEN s < {t!r} AND y THEN 1 ELSE 0 END) AS BIGINT)
        AS fn
    FROM base""")
    un = "\n    UNION ALL".join(rows)
    return f"""
    WITH scored AS ({_SCORED_SQL}),
    base AS (
      SELECT y, s FROM scored WHERE s IS NOT NULL AND y IS NOT NULL
    ),
    conf AS ({un})
    SELECT threshold, tp, fp, fn,
      CAST(ROUND(CASE WHEN tp + fp > 0
        THEN CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE))
        END, 6) AS DOUBLE) AS precision,
      CAST(ROUND(CASE WHEN tp + fn > 0
        THEN CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE))
        END, 6) AS DOUBLE) AS recall,
      CAST(ROUND(CASE
        WHEN tp + fp > 0 AND tp + fn > 0 AND tp > 0 THEN
          2.0 * (CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)))
              * (CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE)))
          / ((CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)))
             + (CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE))))
        WHEN tp + fp > 0 AND tp + fn > 0 THEN 0.0
        END, 6) AS DOUBLE) AS f1
    FROM conf
    ORDER BY threshold ASC
    """


@query("q255_pr_thresholds", oracle=_q255_oracle())
def q255_pr_thresholds(spark, sf_dir):
    """operators/metrics.pr_at_thresholds over the language scorer."""
    from ..operators.metrics import pr_at_thresholds

    return pr_at_thresholds(
        _scored(spark, sf_dir), "s", "y", list(_THRESHOLDS)
    ).orderBy(F.asc("threshold"))


# ---------------------------------------------------------------------------
# q256 — split conformal prediction interval around the exact-
# suffstats linear fit (items-per-order vs order value): md5 splits,
# q-hat as an exact order statistic (no quantile interpolation),
# finite-sample coverage read on the held-out test split.
# ---------------------------------------------------------------------------
@query(
    "q256_conformal_interval",
    oracle="""
    WITH basej AS (
      SELECT o.o_orderkey AS k, CAST(o.o_totalprice AS DOUBLE) AS x,
        CAST(COUNT(*) AS DOUBLE) AS y
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_totalprice
    ),
    b AS (
      SELECT k, x, y,
        CAST(('0x' || substr(md5('conf256' || CAST(k AS VARCHAR)), 1, 8))
          AS UBIGINT) % 100 AS bkt
      FROM basej
    ),
    sp AS (
      SELECT k, x, y,
        CASE WHEN bkt < 50 THEN 'train'
             WHEN bkt < 75 THEN 'cal' ELSE 'test' END AS split
      FROM b
    ),
    suff AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DECIMAL(38,6)) AS sx,
        CAST(SUM(CAST(y AS DECIMAL(18,2))) AS DECIMAL(38,6)) AS sy,
        CAST(SUM(CAST(CAST(x AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2))
          AS DECIMAL(38,4))) AS DECIMAL(38,6)) AS sxy,
        CAST(SUM(CAST(CAST(x AS DECIMAL(18,2)) * CAST(x AS DECIMAL(18,2))
          AS DECIMAL(38,4))) AS DECIMAL(38,6)) AS sxx
      FROM sp WHERE split = 'train'
    ),
    model AS (
      SELECT n AS n_train,
        CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
          THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          ELSE 0.0 END AS sl,
        CAST(sx AS DOUBLE) AS msx, CAST(sy AS DOUBLE) AS msy,
        CAST(n AS DOUBLE) AS mn
      FROM suff
    ),
    m2 AS (
      SELECT n_train, sl, (msy - sl * msx) / mn AS ic FROM model
    ),
    scored AS (
      SELECT sp.k, sp.split, ABS(sp.y - (m2.sl * sp.x + m2.ic)) AS r,
        m2.n_train, m2.sl, m2.ic
      FROM sp CROSS JOIN m2 WHERE sp.split <> 'train'
    ),
    ranked AS (
      SELECT r, ROW_NUMBER() OVER (ORDER BY r ASC, k ASC) AS rn
      FROM scored WHERE split = 'cal'
    ),
    nc AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_cal
      FROM scored WHERE split = 'cal'
    ),
    qh AS (
      SELECT nc.n_cal, ranked.r AS q
      FROM ranked CROSS JOIN nc
      WHERE ranked.rn = LEAST(
        CAST(CEIL((CAST(nc.n_cal AS DOUBLE) + 1.0) * 0.9) AS BIGINT),
        nc.n_cal)
    )
    SELECT
      CAST(MAX(s.n_train) AS BIGINT) AS n_train,
      MAX(qh.n_cal) AS n_cal,
      CAST(COUNT(*) AS BIGINT) AS n_test,
      CAST(ROUND(MAX(s.sl), 6) AS DOUBLE) AS slope,
      CAST(ROUND(MAX(s.ic), 6) AS DOUBLE) AS intercept,
      CAST(ROUND(MAX(qh.q), 6) AS DOUBLE) AS q_hat,
      CAST(ROUND(CAST(SUM(CASE WHEN s.r <= qh.q THEN 1 ELSE 0 END)
          AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS DOUBLE) AS coverage
    FROM scored s CROSS JOIN qh
    WHERE s.split = 'test'
    """,
)
def q256_conformal_interval(spark, sf_dir):
    """operators/conformal.split_conformal_linear: items-per-order
    predicted from order value, 90% conformal band."""
    from ..operators.conformal import split_conformal_linear

    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    base = (
        o.join(li, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_totalprice").cast("double").alias("x"),
            "y",
        )
    )
    return split_conformal_linear(
        base, "k", "x", "y", alpha=0.1, salt="conf256"
    )


# ---------------------------------------------------------------------------
# q276 — Brier score + expected calibration error: the proper-
# scoring-rule companions to q253's log loss. Brier terms quantize
# then sum as exact DECIMAL (corpus-safe); ECE weights the q254
# reliability-bin gaps by bin mass (bounded fold).
# ---------------------------------------------------------------------------
def _q276_oracle() -> str:
    fr = ", ".join(repr(i / 10) for i in range(1, 10))
    return f"""
    WITH scored AS ({_SCORED_SQL}),
    base AS (
      SELECT y, s FROM scored WHERE s IS NOT NULL AND y IS NOT NULL
    ),
    brier AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(SUM(CAST(FLOOR(
          (s - (CASE WHEN y THEN 1.0 ELSE 0.0 END))
          * (s - (CASE WHEN y THEN 1.0 ELSE 0.0 END)) * 1e9) / 1e9
          AS DECIMAL(28,9))) AS DECIMAL(38,9)) AS sb
      FROM base
    ),
    cuts AS (
      SELECT list_transform(quantile_cont(s, [{fr}]),
                            c -> ROUND(c, 6)) AS cs
      FROM base
    ),
    binned AS (
      SELECT y, s,
        CAST(1 + len(list_filter(cs, c -> s > c)) AS INT) AS bin
      FROM base CROSS JOIN cuts
    ),
    bins AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(ROUND(CAST(SUM(CAST(s AS DECIMAL(18,6))) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE), 6) AS DOUBLE) AS ms,
        CAST(ROUND(CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE), 6) AS DOUBLE) AS pr
      FROM binned GROUP BY bin
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM bins),
    ece AS (
      SELECT CAST(ROUND(list_sum(list_sort(list(
        CAST(n AS DOUBLE) / CAST(nt AS DOUBLE) * ABS(ms - pr)
      ))), 6) AS DOUBLE) AS ece
      FROM bins CROSS JOIN tot
    )
    SELECT brier.n_rows,
      CAST(ROUND(CAST(brier.sb AS DOUBLE)
        / CAST(brier.n_rows AS DOUBLE), 6) AS DOUBLE) AS brier,
      ece.ece
    FROM brier CROSS JOIN ece
    """


@query("q276_brier_ece", oracle=_q276_oracle())
def q276_brier_ece(spark, sf_dir):
    """Brier score (quantize-then-decimal terms) and ECE (bin-mass-
    weighted reliability gaps) for the language scorer."""
    from ..operators.metrics import calibration_bins
    from ..operators.stats import fquant

    scored = _scored(spark, sf_dir).filter(
        F.col("s").isNotNull() & F.col("y").isNotNull()
    )
    yd = F.when(F.col("y"), F.lit(1.0)).otherwise(F.lit(0.0))
    term = fquant((F.col("s") - yd) * (F.col("s") - yd), 9).cast(
        "decimal(28,9)"
    )
    brier = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(term).cast("decimal(38,9)").alias("_sb"),
    )
    bins = calibration_bins(scored, "s", "y", n_bins=10)
    tot = bins.agg(F.sum("n").cast("bigint").alias("_nt"))
    ece = (
        bins.crossJoin(F.broadcast(tot))
        .select(
            (
                F.col("n").cast("double") / F.col("_nt").cast("double")
                * F.abs(F.col("mean_score") - F.col("pos_rate"))
            ).alias("_t")
        )
        .agg(
            F.round(
                F.aggregate(
                    F.sort_array(F.collect_list("_t")),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            )
            .cast("double")
            .alias("ece")
        )
    )
    return brier.crossJoin(F.broadcast(ece)).select(
        "n_rows",
        F.round(
            F.col("_sb").cast("double") / F.col("n_rows").cast("double"),
            6,
        )
        .cast("double")
        .alias("brier"),
        "ece",
    )


# ---------------------------------------------------------------------------
# q328 — ROUGE-2 / BLEU-2 n-gram overlap evaluation (round 9): the
# text-generation eval workhorse over deterministic same-lang
# adjacent-id pairs (cand = doc, ref = LEAD(doc) within lang).
# Clipped counts per Papineni/Lin; BLEU-2 = BP·sqrt(p1·p2) (ln-free
# geometric mean; exp(BP) floor-quantized 1e-9, the q181 discipline;
# sqrt is correctly rounded IEEE in both engines).
# ---------------------------------------------------------------------------
@query(
    "q328_ngram_overlap_eval",
    oracle=r"""
    WITH p0 AS (
      SELECT doc_id, lang, text,
        LEAD(text) OVER (PARTITION BY lang ORDER BY doc_id) AS ref_text
      FROM documents
    ),
    p AS (
      SELECT doc_id AS pid,
        list_filter(string_split_regex(trim(text), '\s+'),
                    w -> w <> '') AS cw,
        list_filter(string_split_regex(trim(ref_text), '\s+'),
                    w -> w <> '') AS rw
      FROM p0 WHERE ref_text IS NOT NULL
    ),
    lens AS (SELECT pid, len(cw) AS ct, len(rw) AS rt FROM p),
    cc1 AS (SELECT pid, g, COUNT(*) AS c FROM (
              SELECT pid, unnest(cw) AS g FROM p) GROUP BY 1, 2),
    rc1 AS (SELECT pid, g, COUNT(*) AS c FROM (
              SELECT pid, unnest(rw) AS g FROM p) GROUP BY 1, 2),
    cl1 AS (SELECT cc1.pid, SUM(LEAST(cc1.c, rc1.c)) AS clip1
            FROM cc1 JOIN rc1 ON cc1.pid = rc1.pid AND cc1.g = rc1.g
            GROUP BY 1),
    cc2 AS (SELECT pid, g, COUNT(*) AS c FROM (
              SELECT pid, unnest(list_transform(range(1, len(cw)),
                i -> cw[i] || ' ' || cw[i+1])) AS g
              FROM p WHERE len(cw) >= 2) GROUP BY 1, 2),
    rc2 AS (SELECT pid, g, COUNT(*) AS c FROM (
              SELECT pid, unnest(list_transform(range(1, len(rw)),
                i -> rw[i] || ' ' || rw[i+1])) AS g
              FROM p WHERE len(rw) >= 2) GROUP BY 1, 2),
    cl2 AS (SELECT cc2.pid, SUM(LEAST(cc2.c, rc2.c)) AS clip2
            FROM cc2 JOIN rc2 ON cc2.pid = rc2.pid AND cc2.g = rc2.g
            GROUP BY 1),
    m AS (
      SELECT l.pid, l.ct, l.rt,
        COALESCE(c1.clip1, 0) AS clip1, COALESCE(c2.clip2, 0) AS clip2,
        CASE WHEN l.ct - 1 > 0
          THEN CAST(COALESCE(c2.clip2, 0) AS DOUBLE) / (l.ct - 1)
          ELSE 0.0 END AS p2,
        CASE WHEN l.rt - 1 > 0
          THEN CAST(COALESCE(c2.clip2, 0) AS DOUBLE) / (l.rt - 1)
          ELSE 0.0 END AS r2,
        CASE WHEN l.ct > 0
          THEN CAST(COALESCE(c1.clip1, 0) AS DOUBLE) / l.ct
          ELSE 0.0 END AS p1,
        CASE WHEN l.ct >= l.rt THEN 1.0
          ELSE FLOOR(exp(1.0 - CAST(l.rt AS DOUBLE) / l.ct)
                     * 1000000000.0) / 1000000000.0 END AS bp
      FROM lens l LEFT JOIN cl1 c1 ON c1.pid = l.pid
                  LEFT JOIN cl2 c2 ON c2.pid = l.pid
    )
    SELECT pid AS doc_id, CAST(ct AS BIGINT) AS cand_tokens,
      CAST(rt AS BIGINT) AS ref_tokens,
      CAST(clip1 AS BIGINT) AS clip1, CAST(clip2 AS BIGINT) AS clip2,
      ROUND(p2, 6) AS rouge2_p, ROUND(r2, 6) AS rouge2_r,
      ROUND(CASE WHEN p2 + r2 > 0 THEN 2.0 * p2 * r2 / (p2 + r2)
            ELSE 0.0 END, 6) AS rouge2_f1,
      ROUND(CASE WHEN clip1 > 0 AND clip2 > 0 AND ct > 0
            THEN bp * sqrt(p1 * p2) ELSE 0.0 END, 6) AS bleu2
    FROM m ORDER BY doc_id ASC
    """,
)
def q328_ngram_overlap_eval(spark, sf_dir):
    """operators/metrics.ngram_overlap_eval over same-lang adjacent
    pairs: ROUGE-2 P/R/F1 and sentence BLEU-2 per pair."""
    from pyspark.sql import Window

    from ..operators.metrics import ngram_overlap_eval

    docs = T(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("doc_id")
    pairs = (
        docs.select(
            "doc_id",
            "lang",
            F.col("text").alias("_cand"),
            F.lead("text").over(w).alias("_ref"),
        )
        .filter(F.col("_ref").isNotNull())
    )
    out = ngram_overlap_eval(pairs, "doc_id", "_cand", "_ref")
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "cand_tokens",
        "ref_tokens",
        "clip1",
        "clip2",
        "rouge2_p",
        "rouge2_r",
        "rouge2_f1",
        "bleu2",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q329 — Cohen's kappa between two binary quality raters (round 9):
# chance-corrected agreement of the char-length rater (n_chars >=
# 350) and the token-count rater (tokens >= 60) — the label-quality
# statistic a curation pipeline reports before trusting any single
# heuristic. One wide aggregate; exact-integer ratios.
# ---------------------------------------------------------------------------
@query(
    "q329_cohens_kappa",
    oracle=r"""
    WITH r AS (
      SELECT n_chars >= 350 AS a,
        len(list_filter(string_split_regex(trim(text), '\s+'),
                        w -> w <> '')) >= 60 AS b
      FROM documents
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT)
          AS n11,
        CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
          AS n10,
        CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT)
          AS n01,
        CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)
          AS BIGINT) AS n00
      FROM r
    )
    SELECT n, n11, n10, n01, n00,
      ROUND(CAST(n11 + n00 AS DOUBLE) / n, 6) AS po,
      ROUND((CAST(n11 + n10 AS DOUBLE) / n)
              * (CAST(n11 + n01 AS DOUBLE) / n)
            + (1.0 - CAST(n11 + n10 AS DOUBLE) / n)
              * (1.0 - CAST(n11 + n01 AS DOUBLE) / n), 6) AS pe,
      ROUND(CASE WHEN (CAST(n11 + n10 AS DOUBLE) / n)
                      * (CAST(n11 + n01 AS DOUBLE) / n)
                    + (1.0 - CAST(n11 + n10 AS DOUBLE) / n)
                      * (1.0 - CAST(n11 + n01 AS DOUBLE) / n) < 1.0
            THEN (CAST(n11 + n00 AS DOUBLE) / n
                  - ((CAST(n11 + n10 AS DOUBLE) / n)
                       * (CAST(n11 + n01 AS DOUBLE) / n)
                     + (1.0 - CAST(n11 + n10 AS DOUBLE) / n)
                       * (1.0 - CAST(n11 + n01 AS DOUBLE) / n)))
                 / (1.0 - ((CAST(n11 + n10 AS DOUBLE) / n)
                             * (CAST(n11 + n01 AS DOUBLE) / n)
                           + (1.0 - CAST(n11 + n10 AS DOUBLE) / n)
                             * (1.0 - CAST(n11 + n01 AS DOUBLE) / n)))
            END, 6) AS kappa
    FROM agg
    """,
)
def q329_cohens_kappa(spark, sf_dir):
    """operators/metrics.cohens_kappa between the n_chars>=350 and
    token-count>=60 binary quality raters over documents."""
    from ..operators.metrics import cohens_kappa

    docs = T(spark, sf_dir, "documents")
    ntok = F.size(
        F.filter(
            F.split(F.trim(F.col("text")), r"\s+"), lambda w: w != ""
        )
    )
    return cohens_kappa(
        docs, F.col("n_chars") >= 350, ntok >= 60
    )
