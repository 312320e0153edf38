"""Poisson-bootstrap confidence intervals — uncertainty for
corpus-scale metrics in ONE pass, no resampling shuffle.

Classic bootstrap resampling (draw n rows with replacement, B times)
is impossible at 100 TB: each replicate is a full shuffle of the
corpus. The streaming-scale form is the POISSON BOOTSTRAP (Chamandy,
Muralidharan, Najmi, Naidu, "Estimating Uncertainty for Massive Data
Streams", Google research 2012; Kleiner et al's Bag of Little
Bootstraps is the other published route): each row enters replicate b
with multiplicity w ~ Poisson(1), independently per (row, replicate).
Because Poisson counts are generated PER ROW, the whole construction
is embarrassingly parallel: explode B replicate ids map-side, weight
each copy, and let the partial aggregate collapse every partition to
at most (groups × B) rows before the only shuffle. Nothing resembling
a resample of the corpus ever moves.

Determinism (the suite's engine-replayable-randomness discipline,
sampling.py precedent): the uniform driving each Poisson draw is
md5-derived from (salt, replicate, row key) — identical on any
cluster shape, any partitioning, and byte-replayable by DuckDB via
``('0x' || substr(md5(..), 1, 8))::UBIGINT``. The inverse-CDF
thresholds are Poisson(1) cumulative probabilities embedded as
literal doubles (both engines parse the same decimal literal to the
same IEEE double, so every comparison lands identically). Replicate
counts are chosen so the percentile positions are EXACT indices
(p·(B-1) integral — e.g. B=201 for 2.5/50/97.5), which removes
interpolation arithmetic from the cross-engine contract entirely.

Reference parity: the reference exposes mean/aggregate reporting over
its SQL surface (csv_tool.py:273-385 arbitrary SELECT) but has no
uncertainty primitive; this is a §2.D-style extension shaped for the
training-data-pipeline use (metric deltas on corpus refreshes need
error bars, not point estimates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Cumulative P[Poisson(1) <= k] for k = 0..8; weight 9 beyond (the
# tail above 8 is ~1.1e-6 — immaterial to the estimate, and the cap
# keeps the CASE chain finite and engine-identical).
POISSON1_CDF: tuple[float, ...] = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
    0.9999897508033253,
    0.999998874797402,
)


def md5_uniform(key: Column, salt: str = "") -> Column:
    """u ∈ (0, 1) from the first 32 md5 bits of (salt || key) — the
    sampling.py es_key idiom, DuckDB-replayable bit for bit."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    u32 = F.conv(F.substring(h, 1, 8), 16, 10).cast("double")
    return (u32 + 1.0) / 4294967297.0


def _widen(df: DataFrame, key_col: str) -> DataFrame:
    """The ×B replicate explode multiplies ROWS, not partitions — a
    single-file scan would push the whole amplified corpus through
    one task (measured: 62 s → 4 s at sf0.1 on local[32]). Results
    are partitioning-independent by construction (md5-keyed draws),
    so this is pure plan shaping. Delegates to the shared
    dedup.widen_for_map (one copy of the heuristic + the streaming
    guard, r13) — conditional, so an already-wide cluster scan is
    left untouched."""
    from .dedup import widen_for_map

    return widen_for_map(df, key_col)


def poisson1_weight(u: Column) -> Column:
    """Inverse-CDF Poisson(1) draw from a uniform: the multiplicity
    with which a row enters one bootstrap replicate."""
    w: Column = F.lit(len(POISSON1_CDF))
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    return w.cast("int")


def _with_poisson_weight(df: DataFrame, rkey: Column, salt: str) -> DataFrame:
    """Attach the Poisson(1) multiplicity ``_w`` drawn from
    ``md5_uniform(rkey, salt)`` with the uniform evaluated EXACTLY
    ONCE per row. Passing the uniform expression straight into
    :func:`poisson1_weight` re-evaluates the md5 chain per CASE
    branch, and the optimizer additionally splits a downstream
    ``_w > 0`` filter into a pushed-down ``NOT (u < CDF[0])``
    predicate with its own copy — ~2.7 md5 evaluations per amplified
    row on average (the guide §4.4 duplicated-evaluation trap, in
    expression form). Riding the draw through a one-element
    ``explode`` makes ``_u`` an attribute the optimizer cannot inline
    back into the CASE chain or the pushed filter. Measured at
    sf0.1 ×201 replicates: 4.3 s → 2.2 s noop-sink, bit-identical
    replicate frames."""
    return (
        df.select("*", F.explode(F.array(md5_uniform(rkey, salt))).alias("_u"))
        .withColumn("_w", poisson1_weight(F.col("_u")))
        .drop("_u")
    )


def poisson_bootstrap_mean_ci(
    df: DataFrame,
    key_col: str,
    value_col: str,
    group_cols: list[str],
    replicates: int = 201,
    salt: str = "boot",
    lo_p: float = 0.025,
    hi_p: float = 0.975,
    value_scale: int = 2,
) -> DataFrame:
    """Percentile-bootstrap CI for the per-group MEAN of
    ``value_col``: one row per group with the exact point estimate
    and the (lo_p, hi_p) percentile bounds over ``replicates``
    Poisson-bootstrap replicate means.

    Plan shape (the 100 TB contract):
    - ``explode(sequence(0, B-1))`` is map-side row amplification —
      CPU, not shuffle; the partial aggregate folds each partition to
      ≤ groups×B rows before the single Exchange.
    - replicate sums are exact DECIMAL (no float accumulation order
      in the data-sized reduction); the replicate mean becomes a
      double only at the final bounded division.
    - the percentile aggregate sees exactly B values per group —
      driver-bounded, never corpus-sized.

    Choose ``replicates`` so lo_p·(B-1) and hi_p·(B-1) are integers
    (B=201 for the 95% CI): the type-7 quantile then selects an exact
    order statistic and no interpolation arithmetic exists to
    diverge between engines.
    """
    if replicates < 2:
        raise ValueError("replicates must be >= 2")
    for p in (lo_p, hi_p):
        pos = p * (replicates - 1)
        if abs(pos - round(pos)) > 1e-9:
            raise ValueError(
                f"percentile position {p}*(B-1) must be integral for the "
                f"exact-order-statistic contract; got {pos} (pick B so "
                "p*(B-1) is an integer, e.g. B=201 for 0.025/0.975)"
            )
    dec = f"decimal(28,{value_scale})"
    # NULL metrics are excluded up front (the anova_f/roc_auc
    # convention): otherwise sum() skips them while count() doesn't,
    # and 'mean' is neither the full- nor the non-null-population
    # mean. Both the exact aggregate and the replicates see the same
    # filtered population; the oracle twin mirrors the WHERE.
    df = df.filter(F.col(value_col).isNotNull())
    b = F.explode(F.sequence(F.lit(0), F.lit(replicates - 1))).alias("_b")
    rkey = F.concat(
        F.col("_b").cast("string"), F.lit("|"), F.col(key_col).cast("string")
    )
    drawn = _with_poisson_weight(
        _widen(df, key_col).select(
            *group_cols,
            F.col(key_col),
            F.col(value_col).cast(dec).alias("_x"),
            b,
        ),
        rkey,
        salt,
    ).filter(F.col("_w") > 0)
    rep = drawn.groupBy(*group_cols, "_b").agg(
        F.sum(F.col("_x") * F.col("_w")).alias("_s"),
        F.sum("_w").cast("bigint").alias("_n"),
    )
    rep_mean = (F.col("_s").cast("double") / F.col("_n")).alias("_m")
    reps = rep.select(*group_cols, rep_mean)
    exact = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.round(
            F.sum(F.col(value_col).cast(dec)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean"),
    )
    ci = reps.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_replicates"),
        F.round(F.expr(f"percentile(_m, {lo_p!r})"), 6).alias("ci_lo"),
        F.round(F.expr(f"percentile(_m, {hi_p!r})"), 6).alias("ci_hi"),
    )
    return exact.join(ci, group_cols, "inner")


def poisson_bootstrap_oracle(
    table_sql: str,
    key_expr: str,
    value_expr: str,
    group_exprs: list[str],
    replicates: int = 201,
    salt: str = "boot",
    lo_p: float = 0.025,
    hi_p: float = 0.975,
    value_scale: int = 2,
) -> str:
    """DuckDB twin of :func:`poisson_bootstrap_mean_ci` — the same
    md5 arithmetic, thresholds, decimal sums, and exact-index
    quantiles, so the driver's value hash matches."""
    cdf = POISSON1_CDF
    w_case = "CASE " + " ".join(
        f"WHEN u < {cdf[k]!r} THEN {k}" for k in range(len(cdf))
    ) + f" ELSE {len(cdf)} END"
    g = ", ".join(group_exprs)
    dec = f"DECIMAL(28,{value_scale})"
    return f"""
    WITH reps AS (SELECT unnest(range(0, {replicates})) AS b),
    base AS (
      SELECT {g}, {key_expr} AS k, CAST({value_expr} AS {dec}) AS x
      FROM {table_sql}
      WHERE ({value_expr}) IS NOT NULL
    ),
    d AS (
      SELECT {g}, b, x,
        (CAST(('0x' || substr(md5('{salt}' || CAST(b AS VARCHAR) || '|' ||
          CAST(k AS VARCHAR)), 1, 8)) AS UBIGINT) + 1.0) / 4294967297.0 AS u
      FROM base CROSS JOIN reps
    ),
    wd AS (
      SELECT {g}, b, x, {w_case} AS w FROM d
    ),
    rep AS (
      SELECT {g}, b,
        CAST(SUM(x * w) AS DOUBLE) / CAST(SUM(w) AS BIGINT) AS m
      FROM wd WHERE w > 0 GROUP BY {g}, b
    ),
    exact AS (
      SELECT {g}, CAST(COUNT(*) AS BIGINT) AS n_rows,
        ROUND(CAST(SUM(x) AS DOUBLE) / COUNT(*), 6) AS mean
      FROM base GROUP BY {g}
    ),
    ci AS (
      SELECT {g}, CAST(COUNT(*) AS BIGINT) AS n_replicates,
        ROUND(quantile_cont(m, {lo_p!r}), 6) AS ci_lo,
        ROUND(quantile_cont(m, {hi_p!r}), 6) AS ci_hi
      FROM rep GROUP BY {g}
    )
    SELECT exact.*, ci.n_replicates, ci.ci_lo, ci.ci_hi
    FROM exact JOIN ci USING ({g})
    """


def poisson_bootstrap_diff_ci(
    df: DataFrame,
    key_col: str,
    value_col: str,
    arm_col: str,
    arm_a: str,
    arm_b: str,
    replicates: int = 201,
    salt: str = "bootd",
    lo_p: float = 0.025,
    hi_p: float = 0.975,
    value_scale: int = 2,
) -> DataFrame:
    """Percentile-bootstrap CI for the DIFFERENCE of means between
    two arms (the A/B uplift interval): replicate means per (arm,
    replicate) from the same md5-deterministic Poisson(1) draws as
    :func:`poisson_bootstrap_mean_ci`, then the per-replicate
    difference distribution's exact-order-statistic percentiles.
    1-row output: ``n_a, n_b, mean_a, mean_b, diff, ci_lo, ci_hi``.

    Same plan shape as the mean CI — the ×B amplification is
    map-side and the partial aggregate caps the Exchange at
    2·B rows per partition; the replicate join is B×B-bounded.
    """
    for p in (lo_p, hi_p):
        pos = p * (replicates - 1)
        if abs(pos - round(pos)) > 1e-9:
            raise ValueError(
                "percentile position must be integral (see mean CI)"
            )
    dec = f"decimal(28,{value_scale})"
    both = _widen(
        df.filter(
            F.col(arm_col).isin([arm_a, arm_b])
            & F.col(value_col).isNotNull()
        ),
        key_col,
    )
    b = F.explode(F.sequence(F.lit(0), F.lit(replicates - 1))).alias("_b")
    drawn = both.select(
        F.col(arm_col).alias("_arm"),
        F.col(key_col),
        F.col(value_col).cast(dec).alias("_x"),
        b,
    )
    rkey = F.concat(
        F.col("_b").cast("string"), F.lit("|"), F.col(key_col).cast("string")
    )
    drawn = _with_poisson_weight(drawn, rkey, salt).filter(
        F.col("_w") > 0
    )
    rep = drawn.groupBy("_arm", "_b").agg(
        (
            F.sum(F.col("_x") * F.col("_w")).cast("double")
            / F.sum("_w").cast("bigint")
        ).alias("_m")
    )
    ra = rep.filter(F.col("_arm") == arm_a).select("_b", F.col("_m").alias("_ma"))
    rb = rep.filter(F.col("_arm") == arm_b).select("_b", F.col("_m").alias("_mb"))
    diffs = ra.join(rb, "_b").select((F.col("_ma") - F.col("_mb")).alias("_d"))
    ci = diffs.agg(
        F.round(F.expr(f"percentile(_d, {lo_p!r})"), 6).alias("ci_lo"),
        F.round(F.expr(f"percentile(_d, {hi_p!r})"), 6).alias("ci_hi"),
    )
    side = lambda arm, tag: [  # noqa: E731
        F.count(F.when(F.col(arm_col) == arm, F.lit(1)))
        .cast("bigint")
        .alias(f"n_{tag}"),
        (
            F.sum(F.when(F.col(arm_col) == arm, F.col(value_col).cast(dec)))
            .cast("double")
            / F.count(F.when(F.col(arm_col) == arm, F.lit(1)))
        ).alias(f"_m_{tag}"),
    ]
    exact = both.agg(*side(arm_a, "a"), *side(arm_b, "b"))
    return exact.crossJoin(F.broadcast(ci)).select(
        "n_a",
        "n_b",
        F.round(F.col("_m_a"), 6).cast("double").alias("mean_a"),
        F.round(F.col("_m_b"), 6).cast("double").alias("mean_b"),
        F.round(F.col("_m_a") - F.col("_m_b"), 6)
        .cast("double")
        .alias("diff"),
        "ci_lo",
        "ci_hi",
    )


def poisson_bootstrap_diff_oracle(
    table_sql: str,
    key_expr: str,
    value_expr: str,
    arm_expr: str,
    arm_a: str,
    arm_b: str,
    replicates: int = 201,
    salt: str = "bootd",
    lo_p: float = 0.025,
    hi_p: float = 0.975,
    value_scale: int = 2,
) -> str:
    """DuckDB twin of :func:`poisson_bootstrap_diff_ci`."""
    cdf = POISSON1_CDF
    w_case = "CASE " + " ".join(
        f"WHEN u < {cdf[k]!r} THEN {k}" for k in range(len(cdf))
    ) + f" ELSE {len(cdf)} END"
    dec = f"DECIMAL(28,{value_scale})"
    return f"""
    WITH reps AS (SELECT unnest(range(0, {replicates})) AS b),
    base AS (
      SELECT {arm_expr} AS arm, {key_expr} AS k,
        CAST({value_expr} AS {dec}) AS x
      FROM {table_sql}
    ),
    both_arms AS (
      SELECT * FROM base
      WHERE arm IN ('{arm_a}', '{arm_b}') AND x IS NOT NULL
    ),
    d AS (
      SELECT arm, b, x,
        (CAST(('0x' || substr(md5('{salt}' || CAST(b AS VARCHAR) || '|' ||
          CAST(k AS VARCHAR)), 1, 8)) AS UBIGINT) + 1.0) / 4294967297.0 AS u
      FROM both_arms CROSS JOIN reps
    ),
    wd AS (SELECT arm, b, x, {w_case} AS w FROM d),
    rep AS (
      SELECT arm, b,
        CAST(SUM(x * w) AS DOUBLE) / CAST(SUM(w) AS BIGINT) AS m
      FROM wd WHERE w > 0 GROUP BY arm, b
    ),
    diffs AS (
      SELECT ra.m - rb.m AS dd
      FROM rep ra JOIN rep rb ON ra.b = rb.b
      WHERE ra.arm = '{arm_a}' AND rb.arm = '{arm_b}'
    ),
    ci AS (
      SELECT ROUND(quantile_cont(dd, {lo_p!r}), 6) AS ci_lo,
        ROUND(quantile_cont(dd, {hi_p!r}), 6) AS ci_hi
      FROM diffs
    ),
    exact AS (
      SELECT
        CAST(COUNT(CASE WHEN arm = '{arm_a}' THEN 1 END) AS BIGINT) AS n_a,
        CAST(COUNT(CASE WHEN arm = '{arm_b}' THEN 1 END) AS BIGINT) AS n_b,
        CAST(SUM(CASE WHEN arm = '{arm_a}' THEN x END) AS DOUBLE)
          / COUNT(CASE WHEN arm = '{arm_a}' THEN 1 END) AS ma,
        CAST(SUM(CASE WHEN arm = '{arm_b}' THEN x END) AS DOUBLE)
          / COUNT(CASE WHEN arm = '{arm_b}' THEN 1 END) AS mb
      FROM both_arms
    )
    SELECT n_a, n_b,
      CAST(ROUND(ma, 6) AS DOUBLE) AS mean_a,
      CAST(ROUND(mb, 6) AS DOUBLE) AS mean_b,
      CAST(ROUND(ma - mb, 6) AS DOUBLE) AS diff,
      ci.ci_lo, ci.ci_hi
    FROM exact CROSS JOIN ci
    """


def randomization_test_diff(
    df: DataFrame,
    key_col: str,
    value_col: str,
    arm_col: str,
    arm_a: str,
    arm_b: str,
    replicates: int = 200,
    salt: str = "perm",
    value_scale: int = 2,
    ndigits: int = 6,
) -> DataFrame:
    """Approximate randomization (Fisher-style permutation) test for
    the difference of arm means: under H0 the labels are
    exchangeable, so relabel every row with an md5-derived fair coin
    per (row, replicate), recompute the mean difference B times, and
    report p = (1 + #{|diff_b| ≥ |diff_obs|}) / (B + 1) — the
    add-one form that keeps the test exact-level for finite B
    (Phipson & Smyth 2010). Bernoulli reassignment rather than a
    strict permutation (group sizes vary ~√n per replicate) — the
    standard large-sample randomization variant, and the one that
    needs NO global shuffle: relabeling is a pure per-row hash.

    1-row output: ``n_a, n_b, diff_obs, n_replicates, p_value``.
    Same map-side ×B plan as the bootstrap (partial aggregate caps
    the Exchange at 2·B rows per partition); every draw is
    md5-deterministic and DuckDB-replayable.
    """
    if replicates < 1:
        raise ValueError("replicates must be >= 1")
    dec = f"decimal(28,{value_scale})"
    both = _widen(
        df.filter(
            F.col(arm_col).isin([arm_a, arm_b])
            & F.col(value_col).isNotNull()
        ),
        key_col,
    )
    exact = both.agg(
        F.count(F.when(F.col(arm_col) == arm_a, F.lit(1)))
        .cast("bigint")
        .alias("n_a"),
        F.count(F.when(F.col(arm_col) == arm_b, F.lit(1)))
        .cast("bigint")
        .alias("n_b"),
        (
            F.sum(
                F.when(F.col(arm_col) == arm_a, F.col(value_col).cast(dec))
            ).cast("double")
            / F.count(F.when(F.col(arm_col) == arm_a, F.lit(1)))
            - F.sum(
                F.when(F.col(arm_col) == arm_b, F.col(value_col).cast(dec))
            ).cast("double")
            / F.count(F.when(F.col(arm_col) == arm_b, F.lit(1)))
        ).alias("_d_obs"),
    )
    b = F.explode(F.sequence(F.lit(0), F.lit(replicates - 1))).alias("_b")
    drawn = both.select(F.col(key_col), F.col(value_col).cast(dec).alias("_x"), b)
    rkey = F.concat(
        F.col("_b").cast("string"), F.lit("|"), F.col(key_col).cast("string")
    )
    coin = (md5_uniform(rkey, salt) < F.lit(0.5)).alias("_heads")
    rep = (
        drawn.withColumn("_heads", coin)
        .groupBy("_b")
        .agg(
            F.sum(F.when(F.col("_heads"), F.col("_x"))).cast("double").alias("_sa"),
            F.count(F.when(F.col("_heads"), F.lit(1))).cast("bigint").alias("_na"),
            F.sum(F.when(~F.col("_heads"), F.col("_x"))).cast("double").alias("_sb"),
            F.count(F.when(~F.col("_heads"), F.lit(1))).cast("bigint").alias("_nb"),
        )
        .filter((F.col("_na") > 0) & (F.col("_nb") > 0))
        .select(
            (F.col("_sa") / F.col("_na") - F.col("_sb") / F.col("_nb")).alias("_d")
        )
    )
    counted = rep.crossJoin(F.broadcast(exact)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_replicates"),
        F.sum(
            F.when(F.abs(F.col("_d")) >= F.abs(F.col("_d_obs")), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("_ge"),
    )
    return exact.crossJoin(F.broadcast(counted)).select(
        "n_a",
        "n_b",
        F.round(F.col("_d_obs"), ndigits).cast("double").alias("diff_obs"),
        "n_replicates",
        F.round(
            (F.col("_ge").cast("double") + 1.0)
            / (F.col("n_replicates").cast("double") + 1.0),
            ndigits,
        )
        .cast("double")
        .alias("p_value"),
    )
