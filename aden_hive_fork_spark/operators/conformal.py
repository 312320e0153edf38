"""Split conformal prediction — distribution-free prediction
intervals with finite-sample coverage (Vovk et al.; Lei et al. 2018
JASA): fit any point model on a TRAIN split, take the
⌈(n_cal+1)(1−α)⌉-th smallest absolute residual on a disjoint
CALIBRATION split as the interval half-width q̂, and the interval
ŷ ± q̂ covers with probability ≥ 1−α regardless of the data
distribution. The modern uncertainty wrapper for any regressor —
here wrapped around the suite's exact-suffstats linear fit.

Determinism: splits are md5 content-hash buckets (hash_bucket — any
cluster shape, DuckDB-replayable), the fit is the exact-decimal
suffstats expression, residuals are fixed IEEE arithmetic, and q̂ is
an EXACT ORDER STATISTIC selected by (residual, key) rank — no
quantile interpolation anywhere.

Scale: the fit is one aggregate; residuals are map-side against the
broadcast 1-row model; the only ordered pass ranks the CALIBRATION
split via the range-partitioned two-pass numbering
(``operators.ids.dense_ids`` — parallel in the partition count, no
single-task window) so even an over-sized calibration split never
funnels through one core. Coverage on the test split is one
conditional aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ids import dense_ids
from .sampling import hash_bucket
from .stats import _suff


def split_conformal_linear(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    alpha: float = 0.1,
    salt: str = "conformal",
    train_pct: int = 50,
    cal_pct: int = 25,
    scale: int = 2,
    ndigits: int = 6,
) -> DataFrame:
    """1-row output: ``n_train, n_cal, n_test, slope, intercept,
    q_hat, coverage`` — the linear fit, the conformal half-width,
    and the empirical test coverage (≥ 1−α in expectation).
    Rows where x or y is NULL are dropped up front (all three splits
    see the same population).
    """
    a = float(alpha)
    if not 0.0 < a < 1.0:
        raise ValueError("alpha must be in (0, 1)")
    if train_pct + cal_pct >= 100:
        raise ValueError("train_pct + cal_pct must leave a test split")
    base = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).withColumn("_bkt", hash_bucket(key_col, 100, salt=salt))
    split = (
        F.when(F.col("_bkt") < train_pct, "train")
        .when(F.col("_bkt") < train_pct + cal_pct, "cal")
        .otherwise("test")
    )
    # materialized once (r12): the split frame feeds the train fit,
    # the cal ranking, the cal count, and the test coverage — each
    # replayed the caller's upstream join/aggregate otherwise
    base = base.withColumn("_split", split).localCheckpoint(eager=True)
    s = _suff(F.col(x_col), F.col(y_col), scale)
    fit = base.filter(F.col("_split") == "train").agg(
        *[c.alias(k) for k, c in s.items()]
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    vx = n * sxx - sx * sx
    slope = F.when(vx > 0, (n * sxy - sx * sy) / vx).otherwise(F.lit(0.0))
    model = fit.select(
        F.col("n").alias("n_train"),
        slope.alias("_slope"),
        ((sy - slope * sx) / n).alias("_icept"),
    )
    scored = base.filter(F.col("_split") != "train").crossJoin(
        F.broadcast(model)
    )
    resid = F.abs(
        F.col(y_col).cast("double")
        - (
            F.col("_slope") * F.col(x_col).cast("double")
            + F.col("_icept")
        )
    )
    scored = scored.withColumn("_r", resid)
    cal = scored.filter(F.col("_split") == "cal")
    # k-th order statistic WITHOUT the global row_number window (the
    # un-partitioned window funnels the whole calibration split
    # through one task — the SinglePartition anti-pattern): dense_ids
    # range-partitions on (_r, key), numbers each partition locally
    # after a driver-side offset pass, and the k-th rank filter is a
    # map-side predicate. (_r, key) is unique because key is.
    ranked = dense_ids(
        cal.select(F.col("_r"), F.col(key_col).alias("_k")),
        ["_r", "_k"],
        id_col="_rn",
    )
    n_cal = cal.groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cal")
    )
    # k = ceil((n_cal + 1)(1 − α)), clamped to n_cal (k > n_cal ⇒
    # the distribution-free bound needs more calibration data; the
    # max residual is the honest fallback)
    k = F.least(
        F.ceil((F.col("n_cal") + 1).cast("double") * F.lit(1.0 - a)),
        F.col("n_cal"),
    )
    q_hat = (
        ranked.crossJoin(F.broadcast(n_cal))
        .filter(F.col("_rn") == k)
        .select(
            "n_cal", F.col("_r").alias("_q")
        )
    )
    test = scored.filter(F.col("_split") == "test").crossJoin(
        F.broadcast(q_hat)
    )
    out = test.groupBy().agg(
        F.max("n_cal").alias("n_cal"),
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum(F.when(F.col("_r") <= F.col("_q"), 1).otherwise(0))
        .cast("bigint")
        .alias("_cov"),
        F.max("_q").alias("_q_out"),
        F.max("_slope").alias("_sl"),
        F.max("_icept").alias("_ic"),
        F.max("n_train").alias("n_train"),
    )
    return out.select(
        "n_train",
        "n_cal",
        "n_test",
        F.round(F.col("_sl"), ndigits).cast("double").alias("slope"),
        F.round(F.col("_ic"), ndigits).cast("double").alias("intercept"),
        F.round(F.col("_q_out"), ndigits).cast("double").alias("q_hat"),
        F.round(
            F.col("_cov").cast("double") / F.col("n_test").cast("double"),
            ndigits,
        )
        .cast("double")
        .alias("coverage"),
    )
