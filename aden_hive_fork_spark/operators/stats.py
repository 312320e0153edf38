"""Exact second-moment statistics: correlation and simple linear
regression that are bit-deterministic under any partitioning.

Spark's builtin ``corr``/``covar_samp`` stream doubles through a
running-moment formula, so the result depends on partition visit
order — fine for exploration, wrong for an oracle-gated engine (two
runs of the same query could hash differently). These operators
compute the five sufficient statistics Σx, Σy, Σxy, Σx², Σy² as
EXACT DECIMAL sums (addition is associative and exact ⇒
partitioning-independent), then derive the moments in one fixed
IEEE expression per group:

    corr  = (nΣxy − ΣxΣy) / sqrt((nΣx² − (Σx)²)(nΣy² − (Σy)²))
    slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²),  intercept = ȳ − slope·x̄

One wide keyed aggregate — the same single-pass shape as
``profile_table``; no second scan, no window. DuckDB replays the
identical decimal sums and the identical expression tree, so results
hash-match at full double precision (still rounded for output per
suite convention).

Input values are quantized to DECIMAL(18, ``scale``) first — that
quantization IS the contract (exact arithmetic needs a fixed point);
products/sums carry 38 digits, which bounds safe input magnitude at
roughly 10^(38-2·scale) summed rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _suff(x: Column, y: Column, scale: int) -> dict[str, Column]:
    xd = x.cast(f"decimal(18,{scale})")
    yd = y.cast(f"decimal(18,{scale})")
    p = f"decimal(38,{2 * scale})"
    return {
        "n": F.count(F.lit(1)).cast("bigint"),
        "sx": F.sum(xd).cast("decimal(38,6)"),
        "sy": F.sum(yd).cast("decimal(38,6)"),
        "sxy": F.sum((xd * yd).cast(p)).cast("decimal(38,6)"),
        "sxx": F.sum((xd * xd).cast(p)).cast("decimal(38,6)"),
        "syy": F.sum((yd * yd).cast(p)).cast("decimal(38,6)"),
    }


def _complete_pairs(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Drop rows where either variable is NULL — every sufficient
    statistic (including n) must come from the SAME subsample, or
    the moments mix inconsistent populations and the result is
    silently wrong. This is pairwise-complete semantics, matching
    SQL's corr()."""
    return df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())


def exact_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
    scale: int = 2,
    ndigits: int = 6,
) -> DataFrame:
    """Pearson correlation per group (or 1-row global) from exact
    decimal sufficient statistics over pairwise-complete rows (rows
    with a NULL in either column are excluded — from n too). NULL
    when either variance is zero.
    """
    df = _complete_pairs(df, x_col, y_col)
    s = _suff(F.col(x_col), F.col(y_col), scale)
    g = df.groupBy(*(group_cols or []))
    agg = g.agg(*[c.alias(k) for k, c in s.items()])
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    cov = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    corr = F.when(
        (vx > 0) & (vy > 0), cov / F.sqrt(vx * vy)
    )
    return agg.select(
        *(group_cols or []),
        F.col("n").alias("n"),
        F.round(corr, ndigits).cast("double").alias("corr"),
    )


def linear_fit(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
    scale: int = 2,
    ndigits: int = 6,
) -> DataFrame:
    """Least-squares line y = slope·x + intercept per group, from the
    same exact sufficient statistics over pairwise-complete rows (the
    trend-detection primitive). slope NULL when x is constant."""
    df = _complete_pairs(df, x_col, y_col)
    s = _suff(F.col(x_col), F.col(y_col), scale)
    g = df.groupBy(*(group_cols or []))
    agg = g.agg(*[c.alias(k) for k, c in s.items()])
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    vx = n * sxx - sx * sx
    slope = F.when(vx > 0, (n * sxy - sx * sy) / vx)
    intercept = (sy - slope * sx) / n
    return agg.select(
        *(group_cols or []),
        F.col("n").alias("n"),
        F.round(slope, ndigits).cast("double").alias("slope"),
        F.round(intercept, ndigits).cast("double").alias("intercept"),
    )


def det_sum(col: Column, ndigits: int = 6) -> Column:
    """Deterministic float reduction: collect the values, sort them,
    fold in sorted order — the sum no longer depends on partition
    visit order, so it is bit-identical across runs, partitionings,
    and engines (DuckDB: ``list_sum(list_sort(list(x)))``). Use ONLY
    on bounded groups (the list materializes per group); for
    data-sized sums use exact DECIMAL instead (``_suff`` pattern).
    """
    return F.round(
        F.aggregate(
            F.sort_array(F.collect_list(col)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        ndigits,
    )


def chi_square(
    df: DataFrame,
    a_col: str,
    b_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Chi-square test of independence between two categoricals, plus
    Cramér's V effect size. 1-row output: ``n, df_degrees, chi2,
    cramers_v``.

    Cell counts are exact integers (one keyed aggregate). The grid
    is DENSIFIED to the full |A|×|B| margin cross product before the
    terms — a never-observed combination still contributes its
    (0-exp)²/exp mass, which a sparse observed-cells sum would
    silently drop (a 2×2 with perfect association loses exactly half
    its chi² that way). The per-cell terms are doubles, reduced with
    ``det_sum`` so the statistic is partitioning- and
    engine-deterministic (the grid is margin-bounded, which is what
    makes the sorted-fold affordable).

    NULL categories are excluded (complete-case, matching the other
    stats operators): a NULL key would enter the margins but never
    match the non-null-safe grid join, silently skewing the
    statistic. ``cramers_v`` is NULL when either variable has a
    single category (dof = 0 — the test is undefined, not NaN).
    """
    df = df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull())
    cells = df.groupBy(
        F.col(a_col).alias("_a"), F.col(b_col).alias("_b")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("_o"))
    ra = cells.groupBy("_a").agg(F.sum("_o").cast("bigint").alias("_ra"))
    rb = cells.groupBy("_b").agg(F.sum("_o").cast("bigint").alias("_rb"))
    tot = cells.agg(
        F.sum("_o").cast("double").alias("_n"),
        F.countDistinct("_a").cast("bigint").alias("_ka"),
        F.countDistinct("_b").cast("bigint").alias("_kb"),
    )
    grid = ra.crossJoin(F.broadcast(rb))  # dense margins incl. 0 cells
    j = (
        grid.join(cells, ["_a", "_b"], "left")
        .withColumn("_o", F.coalesce(F.col("_o"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    exp = F.col("_ra").cast("double") * F.col("_rb").cast("double") / F.col("_n")
    term = (F.col("_o").cast("double") - exp) ** 2 / exp
    agg = j.agg(
        F.max("_n").alias("_n"),
        F.max("_ka").alias("_ka"),
        F.max("_kb").alias("_kb"),
        det_sum(term, ndigits).alias("chi2"),
    )
    dof = (F.col("_ka") - 1) * (F.col("_kb") - 1)
    v = F.when(
        dof > 0,
        F.sqrt(
            F.col("chi2")
            / (F.col("_n") * F.least(F.col("_ka") - 1, F.col("_kb") - 1))
        ),
    )
    return agg.select(
        F.col("_n").cast("bigint").alias("n"),
        dof.cast("bigint").alias("df_degrees"),
        F.col("chi2").cast("double").alias("chi2"),
        F.round(v, ndigits).cast("double").alias("cramers_v"),
    )
