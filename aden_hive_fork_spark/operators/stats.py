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

from pyspark.sql import Column, DataFrame, Window
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


def suffstats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
    scale: int = 2,
) -> DataFrame:
    """(group..., n, sx, sy, sxy, sxx, syy): the exact-decimal
    sufficient statistics behind ``exact_corr``/``linear_fit`` as a
    first-class MERGEABLE table — stats of a union are the column-
    wise sums (decimal addition is exact, associative, commutative),
    so partial tables can be maintained incrementally (see
    ``streaming/stats_stream``) and merged in any order with a
    bit-identical result to one pass over all the data."""
    df = _complete_pairs(df, x_col, y_col)
    s = _suff(F.col(x_col), F.col(y_col), scale)
    return df.groupBy(*(group_cols or [])).agg(
        *[c.alias(k) for k, c in s.items()]
    )


def merge_suffstats(
    stats: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Sum-merge one or more unioned suffstats tables per group —
    exact decimal sums, so merge(a, b) == suffstats(a_rows + b_rows)
    bit-for-bit regardless of how the rows were batched."""
    return stats.groupBy(*(group_cols or [])).agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("sx").cast("decimal(38,6)").alias("sx"),
        F.sum("sy").cast("decimal(38,6)").alias("sy"),
        F.sum("sxy").cast("decimal(38,6)").alias("sxy"),
        F.sum("sxx").cast("decimal(38,6)").alias("sxx"),
        F.sum("syy").cast("decimal(38,6)").alias("syy"),
    )


def corr_from_stats(
    stats: DataFrame,
    group_cols: list[str] | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """Pearson correlation from a suffstats table (the final
    fixed-IEEE expression shared with ``exact_corr``). NULL when
    either variance is zero."""
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
    return stats.select(
        *(group_cols or []),
        F.col("n").alias("n"),
        F.round(corr, ndigits).cast("double").alias("corr"),
    )


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
    return corr_from_stats(
        suffstats(df, x_col, y_col, group_cols, scale), group_cols, ndigits
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


def fquant(col: Column, digits: int = 6) -> Column:
    """FLOOR-quantize a double: ``floor(x·10^d)/10^d`` — pure IEEE
    arithmetic, identical in Spark and DuckDB. Used to collapse
    cross-engine ulp noise from transcendentals (ln/exp/log10) before
    a compare or a float reduction; plain ROUND is NOT safe for that
    (Spark rounds the shortest decimal repr of the double, DuckDB the
    exact binary value — they disagree at digit boundaries)."""
    p = float(10**digits)
    return F.floor(col * F.lit(p)).cast("double") / F.lit(p)


def welch_ttest(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    scale: int = 2,
    ndigits: int = 6,
) -> DataFrame:
    """Welch's unequal-variance two-sample t-test between two named
    groups. 1-row output: ``n_a, n_b, mean_a, mean_b, t_stat,
    dof_welch`` (Welch–Satterthwaite degrees of freedom).

    Same discipline as ``exact_corr``: per-group sufficient statistics
    as exact DECIMAL sums in ONE aggregate over the filtered scan
    (conditional sums — no second pass, no join), then one fixed IEEE
    expression. Everything downstream of the sums is +-*/ and sqrt
    (all correctly rounded in IEEE 754), so the statistic is
    bit-deterministic across partitionings and engines; rounded for
    output per suite convention. NULL t when either group has < 2
    rows or both variances are zero.
    """
    v = F.col(value_col).cast(f"decimal(18,{scale})")
    p = f"decimal(38,{2 * scale})"
    in_a = F.col(group_col) == group_a
    in_b = F.col(group_col) == group_b
    df = df.filter((in_a | in_b) & F.col(value_col).isNotNull())

    def side(cond: Column, tag: str) -> list[Column]:
        x = F.when(cond, v)
        return [
            F.count(x).cast("bigint").alias(f"n_{tag}"),
            F.sum(x).cast("decimal(38,6)").alias(f"s_{tag}"),
            F.sum(F.when(cond, (v * v).cast(p)))
            .cast("decimal(38,6)")
            .alias(f"ss_{tag}"),
        ]

    agg = df.agg(*side(in_a, "a"), *side(in_b, "b"))
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    sa, sb = F.col("s_a").cast("double"), F.col("s_b").cast("double")
    ssa, ssb = F.col("ss_a").cast("double"), F.col("ss_b").cast("double")
    ma, mb = sa / na, sb / nb
    # sample variances from the raw moments
    va = (ssa - sa * sa / na) / (na - 1)
    vb = (ssb - sb * sb / nb) / (nb - 1)
    sea, seb = va / na, vb / nb
    se2 = sea + seb
    t = F.when(
        (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (se2 > 0),
        (ma - mb) / F.sqrt(se2),
    )
    dof = F.when(
        (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (se2 > 0),
        (se2 * se2) / (sea * sea / (na - 1) + seb * seb / (nb - 1)),
    )
    return agg.select(
        F.col("n_a"),
        F.col("n_b"),
        F.round(ma, ndigits).cast("double").alias("mean_a"),
        F.round(mb, ndigits).cast("double").alias("mean_b"),
        F.round(t, ndigits).cast("double").alias("t_stat"),
        F.round(dof, ndigits).cast("double").alias("dof_welch"),
    )


def mutual_information(
    df: DataFrame,
    a_col: str,
    b_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Shannon entropies H(A), H(B), mutual information I(A;B) (nats)
    and the normalized MI ``I/sqrt(H(A)·H(B))`` between two
    categorical columns. 1-row output: ``n, h_a, h_b, mi, nmi``.

    Cell/margin counts are exact integers (one keyed aggregate +
    two tiny margin aggregates). Unlike ``chi_square`` no grid
    densification is needed: an unobserved cell contributes
    lim x→0 x·ln x = 0. Each per-cell term passes through ``fquant``
    (floor-quantization) BEFORE the sorted-fold reduction — ln is the
    one operation here that is not guaranteed correctly rounded
    across engines, and quantizing each term collapses that ulp noise
    so the folded sum is engine-deterministic. NULL ``nmi`` when
    either marginal entropy is zero (single-category variable).

    Complete-case semantics: NULL in either column drops the row
    (matching ``chi_square``).
    """
    df = df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull())
    cells = df.groupBy(
        F.col(a_col).alias("_a"), F.col(b_col).alias("_b")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("_o"))
    ra = cells.groupBy("_a").agg(F.sum("_o").cast("bigint").alias("_ra"))
    rb = cells.groupBy("_b").agg(F.sum("_o").cast("bigint").alias("_rb"))
    tot = cells.agg(F.sum("_o").cast("double").alias("_n"))

    n = F.col("_n")
    mi_term = fquant(
        (F.col("_o").cast("double") / n)
        * F.log(
            n * F.col("_o").cast("double")
            / (F.col("_ra").cast("double") * F.col("_rb").cast("double"))
        ),
        9,
    )
    mi = (
        cells.join(ra, "_a")
        .join(rb, "_b")
        .crossJoin(F.broadcast(tot))
        .agg(det_sum(mi_term, ndigits).alias("mi"), F.max("_n").alias("_n"))
    )

    def entropy(margin: DataFrame, cnt: str, out: str) -> DataFrame:
        p_i = F.col(cnt).cast("double") / F.col("_n")
        return margin.crossJoin(F.broadcast(tot)).agg(
            det_sum(fquant(-p_i * F.log(p_i), 9), ndigits).alias(out)
        )

    ha = entropy(ra, "_ra", "h_a")
    hb = entropy(rb, "_rb", "h_b")
    out = mi.crossJoin(F.broadcast(ha)).crossJoin(F.broadcast(hb))
    nmi = F.when(
        (F.col("h_a") > 0) & (F.col("h_b") > 0),
        F.col("mi") / F.sqrt(F.col("h_a") * F.col("h_b")),
    )
    return out.select(
        F.col("_n").cast("bigint").alias("n"),
        F.col("h_a").cast("double").alias("h_a"),
        F.col("h_b").cast("double").alias("h_b"),
        F.col("mi").cast("double").alias("mi"),
        F.round(nmi, ndigits).cast("double").alias("nmi"),
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


def gini_coefficient(
    df: DataFrame,
    value_col: str,
    id_col: str,
    scale: int = 2,
    ndigits: int = 6,
) -> DataFrame:
    """Gini inequality coefficient of a non-negative quantity (the
    Lorenz-curve companion to the Pareto contribution query). 1-row
    output: ``n, total, gini``; NULL gini for n < 2 or zero total.

        G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx),  x sorted ascending

    Ranks come from ``ids.dense_ids`` (range-partitioned two-pass
    numbering), NOT a global ROW_NUMBER window — the input is
    typically a per-entity aggregate, but at 100 TB even that can be
    billions of rows and a single-task sort is the one shape this
    engine never emits. ``(value, id)`` makes the order total, so
    ranks — and therefore the statistic — are deterministic under
    ties. Both Σ are exact DECIMAL sums; the closed form is one IEEE
    expression, so the result hash-matches the ROW_NUMBER-based SQL
    replay.
    """
    from .ids import dense_ids

    v = F.col(value_col).cast(f"decimal(18,{scale})")
    d = df.filter(v.isNotNull() & (v >= 0)).select(
        F.col(id_col).alias("_id"), v.alias("_x")
    )
    ranked = dense_ids(d, ["_x", "_id"], id_col="_i", start=1)
    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_x").cast("decimal(38,6)").alias("_sx"),
        F.sum((F.col("_i") * F.col("_x")).cast(f"decimal(38,{scale})"))
        .cast("decimal(38,6)")
        .alias("_six"),
    )
    n = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    six = F.col("_six").cast("double")
    g = F.when(
        (F.col("n") >= 2) & (sx > 0),
        (2.0 * six - (n + 1.0) * sx) / (n * sx),
    )
    return agg.select(
        F.col("n"),
        F.round(sx, scale).cast("double").alias("total"),
        F.round(g, ndigits).cast("double").alias("gini"),
    )


def corr_matrix(
    df: DataFrame,
    cols: list[str],
    scale: int = 2,
    ndigits: int = 6,
) -> DataFrame:
    """Full pairwise Pearson correlation matrix of ``cols`` in ONE
    wide aggregate over ONE scan — p columns need p(p+1)/2 product
    sums, all exact DECIMAL, so a 10-column matrix is still a single
    pass with map-side combine (never p² separate jobs). Output: one
    row per unordered pair ``(col_a, col_b, n, corr)``, col_a < col_b
    alphabetically.

    Complete-case per the WHOLE column set (a row with any NULL among
    ``cols`` is dropped) — the matrix is then positive semi-definite,
    which per-pair deletion does not guarantee. Same derivation as
    ``exact_corr``; NULL corr where a variance is zero.
    """
    if len(cols) < 2:
        raise ValueError("corr_matrix needs >= 2 columns")
    cc = df.filter(
        F.expr(" AND ".join(f"`{c}` IS NOT NULL" for c in cols))
    )
    d = {c: F.col(c).cast(f"decimal(18,{scale})") for c in cols}
    p = f"decimal(38,{2 * scale})"
    aggs: list[Column] = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for c in cols:
        aggs.append(F.sum(d[c]).cast("decimal(38,6)").alias(f"s_{c}"))
        aggs.append(
            F.sum((d[c] * d[c]).cast(p)).cast("decimal(38,6)").alias(f"ss_{c}")
        )
    ordered = sorted(cols)
    pairs = [
        (a, b)
        for i, a in enumerate(ordered)
        for b in ordered[i + 1:]
    ]
    for a, b in pairs:
        aggs.append(
            F.sum((d[a] * d[b]).cast(p))
            .cast("decimal(38,6)")
            .alias(f"sp_{a}_{b}")
        )
    agg = cc.agg(*aggs)
    n = F.col("n").cast("double")
    rows = []
    for a, b in pairs:
        sa, sb = F.col(f"s_{a}").cast("double"), F.col(f"s_{b}").cast("double")
        ssa = F.col(f"ss_{a}").cast("double")
        ssb = F.col(f"ss_{b}").cast("double")
        sp = F.col(f"sp_{a}_{b}").cast("double")
        va = n * ssa - sa * sa
        vb = n * ssb - sb * sb
        corr = F.when(
            (va > 0) & (vb > 0), (n * sp - sa * sb) / F.sqrt(va * vb)
        )
        rows.append(
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col("n").alias("n"),
                F.round(corr, ndigits).cast("double").alias("corr"),
            )
        )
    return agg.select(
        F.explode(F.array(*rows)).alias("_p")
    ).select("_p.col_a", "_p.col_b", "_p.n", "_p.corr")


def mann_kendall(
    df: DataFrame,
    t_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """Mann-Kendall trend test + Theil-Sen slope per group — the
    ROBUST trend pair to ``linear_fit``: no distributional assumption
    (MK is a rank statistic), and the Sen slope (median of pairwise
    slopes) shrugs off the outliers that drag a least-squares line.

    Input contract: a PRE-AGGREGATED series — one row per
    (group, t). Rows sharing a t value pair with neither ordering
    (a.t < b.t excludes them), the standard MK treatment of time
    ties, and since pairs require strictly increasing t the slope
    denominator can never be zero.

    Output per group: ``n`` (series length), ``s_stat``
    (Σ sign(y_j − y_i) over i<j, exact integer), ``z`` (the
    tie-corrected normal approximation; NULL when Var(S) = 0, i.e.
    constant series shorter than 2), ``sen_slope`` (median pairwise
    slope, type-7 interpolation — Spark ``percentile`` == DuckDB
    ``quantile_cont``). z and sen_slope are FLOOR-quantized to
    ``ndigits`` (cross-engine ulp discipline).

    Scale: the pair self-join is within-group O(T²) where T is the
    SERIES length — bounded by the time resolution (months, days),
    not the corpus: the fact-table reduction to the series happens
    before this operator. Skewed group sizes are AQE's problem; the
    aggregate combines map-side.
    """
    keys = group_cols or []
    a = df.select(
        *keys,
        F.col(t_col).cast("double").alias("_ta"),
        F.col(y_col).cast("double").alias("_ya"),
    )
    b = df.select(
        *keys,
        F.col(t_col).cast("double").alias("_tb"),
        F.col(y_col).cast("double").alias("_yb"),
    )
    if keys:
        pairs = a.join(b, keys).filter(F.col("_ta") < F.col("_tb"))
    else:
        pairs = a.crossJoin(b).filter(F.col("_ta") < F.col("_tb"))
    sgn = (
        F.when(F.col("_yb") > F.col("_ya"), 1)
        .when(F.col("_yb") < F.col("_ya"), -1)
        .otherwise(0)
    )
    slope = (F.col("_yb") - F.col("_ya")) / (F.col("_tb") - F.col("_ta"))
    pair_agg = (
        pairs.withColumn("_slope", slope)
        .groupBy(*keys)
        .agg(
            F.sum(sgn).cast("bigint").alias("s_stat"),
            F.expr("percentile(_slope, 0.5)").alias("_sen"),
        )
    )
    n_agg = df.groupBy(*keys).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ties = (
        df.groupBy(*keys, F.col(y_col).cast("double").alias("_y"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("_t"))
        .groupBy(*keys)
        .agg(
            F.sum(
                F.col("_t") * (F.col("_t") - 1) * (2 * F.col("_t") + 5)
            )
            .cast("bigint")
            .alias("_tie_sum")
        )
    )
    joined = (
        n_agg.join(pair_agg, keys) if keys
        else n_agg.crossJoin(pair_agg)
    )
    joined = joined.join(ties, keys) if keys else joined.crossJoin(ties)
    nn = F.col("n").cast("double")
    var_s = (
        nn * (nn - 1.0) * (2.0 * nn + 5.0)
        - F.col("_tie_sum").cast("double")
    ) / 18.0
    s = F.col("s_stat").cast("double")
    z = F.when(
        var_s > 0,
        F.when(s > 0, (s - 1.0) / F.sqrt(var_s))
        .when(s < 0, (s + 1.0) / F.sqrt(var_s))
        .otherwise(F.lit(0.0)),
    )
    return joined.select(
        *keys,
        "n",
        "s_stat",
        fquant(z, ndigits).alias("z"),
        fquant(F.col("_sen"), ndigits).alias("sen_slope"),
    )


def ks_test(
    df: DataFrame,
    value_col: str,
    sample_col: str,
    sample_a,
    sample_b,
    group_cols: list[str] | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test per group: D = sup over x
    of |F_a(x) − F_b(x)|, the distribution-shift detector that needs
    no binning choice (``kl_drift``'s weakness) and no distributional
    assumption (``welch_ttest``'s). The workhorse "did this month's
    price distribution move?" question.

    Exactness: both empirical CDFs step only at observed values, so
    D is the max over the DISTINCT value grid of
    |cum_a/n_a − cum_b/n_b| where the cumulative counts are exact
    integers from one per-value aggregate + one cumulative window.
    Integer-to-double division, abs and max are all IEEE-exact, so
    d_stat is bit-deterministic across partitionings and engines
    BEFORE the output rounding — the oracle replay is the identical
    expression tree.

    p_value is the asymptotic Kolmogorov series
    2·Σ_{k=1..5} (−1)^{k−1} e^{−2k²λ²} with the Stephens small-sample
    correction λ = (√n_e + 0.12 + 0.11/√n_e)·D, n_e = n_a·n_b/(n_a+n_b);
    each exp term is FLOOR-quantized (``fquant``) before the fixed-
    order sum — the transcendental cross-engine discipline — and the
    sum clamped to [0, 1]. Five terms suffice: the k=6 term is
    < 1e-6 whenever the k=1 term is < 0.99 (λ ≳ 0.05), i.e. anywhere
    the clamp to 1 hasn't already absorbed the tail. NULL d_stat and
    p_value when either sample is empty in a group.

    Scale: one shuffle to the per-(group, value) grid — raw rows
    collapse to distinct values FIRST, so the cumulative window runs
    over the value grid, not the data; a single giant group's
    ordered CDF is the statistic's irreducible sort. NULL values are
    excluded (they belong to neither CDF).
    """
    from pyspark.sql.window import Window

    keys = list(group_cols or [])
    in_a = F.col(sample_col) == F.lit(sample_a)
    in_b = F.col(sample_col) == F.lit(sample_b)
    base = df.filter((in_a | in_b) & F.col(value_col).isNotNull())
    per_val = base.groupBy(
        *keys, F.col(value_col).cast("double").alias("_v")
    ).agg(
        F.sum(F.when(in_a, 1).otherwise(0)).cast("bigint").alias("_ca"),
        F.sum(F.when(in_b, 1).otherwise(0)).cast("bigint").alias("_cb"),
    )
    win = (
        Window.partitionBy(*keys)
        .orderBy(F.asc("_v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy(*keys)
    cum = (
        per_val.withColumn("_cum_a", F.sum("_ca").over(win))
        .withColumn("_cum_b", F.sum("_cb").over(win))
        .withColumn("_na", F.sum("_ca").over(tot))
        .withColumn("_nb", F.sum("_cb").over(tot))
    )
    gap = F.abs(
        F.col("_cum_a").cast("double") / F.col("_na").cast("double")
        - F.col("_cum_b").cast("double") / F.col("_nb").cast("double")
    )
    agg = cum.groupBy(*keys).agg(
        F.max("_na").alias("n_a"),
        F.max("_nb").alias("n_b"),
        F.max(F.when((F.col("_na") > 0) & (F.col("_nb") > 0), gap)).alias(
            "_d"
        ),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ne = na * nb / (na + nb)
    lam = (F.sqrt(ne) + F.lit(0.12) + F.lit(0.11) / F.sqrt(ne)) * F.col("_d")
    p_raw = sum(
        (
            F.lit(2.0 * (1 if k % 2 == 1 else -1))
            * fquant(F.exp(F.lit(-2.0 * k * k) * lam * lam), ndigits)
            for k in range(1, 6)
        ),
        F.lit(0.0),
    )
    p = F.when(
        F.col("_d").isNotNull(),
        F.least(F.lit(1.0), F.greatest(F.lit(0.0), p_raw)),
    )
    return agg.select(
        *keys,
        "n_a",
        "n_b",
        fquant(F.col("_d"), ndigits).alias("d_stat"),
        fquant(p, ndigits).alias("p_value"),
    )


def anova_f(
    df: DataFrame,
    value_col: str,
    group_col: str,
    outer_cols: list[str] | None = None,
    scale: int = 2,
    ndigits: int = 6,
) -> DataFrame:
    """One-way ANOVA F-test: does the mean of ``value_col`` differ
    across the levels of ``group_col``?  One row per ``outer_cols``
    combination with ``k_groups, n_rows, ss_between, ss_within,
    f_stat, eta_sq``.

    Same contract as :func:`welch_ttest` extended to k groups: the
    corpus pass is ONE keyed aggregate of exact DECIMAL sufficient
    statistics (n, Σx, Σx² per level); the second aggregate runs
    over the BOUNDED level rows, where the only float reduction —
    Σ_g (Σx_g)²/n_g — goes through the det_sum sorted fold so it is
    partition- and engine-order independent. Downstream is a fixed
    IEEE expression:

        SSB = Σ_g s_g²/n_g − S²/N      SSW = SS − Σ_g s_g²/n_g
        F   = (SSB/(k−1)) / (SSW/(N−k))

    NULL F when k < 2, N ≤ k, or SSW is not positive.

    Large-magnitude float discipline: the fold and every SS value
    stay UNROUNDED doubles (bit-identical in both engines) — at SS
    magnitudes (~1e13 for prices) a decimal ROUND sits BELOW one ulp,
    where DuckDB's multiply-round-divide perturbs the value while
    Spark's shortest-repr round is a no-op; rounding there is pure
    cross-engine noise. Sums of squares are therefore emitted scaled
    to 1e9 units (``ss_between_bn``/``ss_within_bn``), where a
    3-digit round is far above ulp and safe; F and η² are O(1) and
    round normally.
    """
    outer = list(outer_cols or [])
    v = F.col(value_col).cast(f"decimal(18,{scale})")
    p = f"decimal(38,{2 * scale})"
    lvl = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*outer, group_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_n"),
            F.sum(v).cast("decimal(38,6)").alias("_s"),
            F.sum((v * v).cast(p)).cast("decimal(38,6)").alias("_ss"),
        )
    )
    term = (
        F.col("_s").cast("double") * F.col("_s").cast("double")
        / F.col("_n").cast("double")
    )
    top = lvl.groupBy(*outer).agg(
        F.count(F.lit(1)).cast("bigint").alias("k_groups"),
        F.sum("_n").cast("bigint").alias("n_rows"),
        F.sum("_s").cast("decimal(38,6)").alias("_S"),
        F.sum("_ss").cast("decimal(38,6)").alias("_SS"),
        # raw sorted fold — deliberately NOT det_sum: no round at
        # SS magnitude (see docstring)
        F.aggregate(
            F.sort_array(F.collect_list(term)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("_t1"),
    )
    n_d = F.col("n_rows").cast("double")
    k_d = F.col("k_groups").cast("double")
    cf = F.col("_S").cast("double") * F.col("_S").cast("double") / n_d
    ssb = F.col("_t1") - cf
    ssw = F.col("_SS").cast("double") - F.col("_t1")
    ok = (
        (F.col("k_groups") >= 2)
        & (F.col("n_rows") > F.col("k_groups"))
        & (ssw > 0)
    )
    f_stat = F.when(ok, (ssb / (k_d - 1.0)) / (ssw / (n_d - k_d)))
    sst = F.col("_SS").cast("double") - cf
    eta = F.when(ok & (sst > 0), ssb / sst)
    return top.select(
        *outer,
        "k_groups",
        "n_rows",
        F.round(ssb / 1.0e9, 3).cast("double").alias("ss_between_bn"),
        F.round(ssw / 1.0e9, 3).cast("double").alias("ss_within_bn"),
        F.round(f_stat, ndigits).cast("double").alias("f_stat"),
        F.round(eta, ndigits).cast("double").alias("eta_sq"),
    )


def spearman_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """Spearman rank correlation per group: Pearson on the AVERAGE
    ranks (the standard tie treatment), which is exactly computable —
    doubled average ranks ``2·RANK + ties − 1`` are INTEGERS, and
    Pearson is affine-invariant, so the whole statistic runs through
    the exact-decimal suffstats machinery with no float until the
    final fixed IEEE expression.

    Scale note: ranking is a per-group ordered window (one Exchange +
    in-partition sorts, like every rank window in the suite). For
    report-granularity groups that is the right tool; corpus-wide
    monotone-association monitoring should sample first or bucket via
    the rollup histograms — a global rank of 100 TB is a global sort
    by definition (the q138 two-pass range-partition trick applies if
    one is truly needed).
    """
    g = group_cols or []
    base = _complete_pairs(df, x_col, y_col)

    def rank2(c: str) -> Column:
        w = Window.partitionBy(*g).orderBy(F.col(c).asc())
        t = Window.partitionBy(*g, c)
        return (
            2 * F.rank().over(w) + F.count(F.lit(1)).over(t) - 1
        ).cast("bigint")

    ranked = base.select(
        *g, rank2(x_col).alias("_rx2"), rank2(y_col).alias("_ry2")
    )
    return (
        exact_corr(ranked, "_rx2", "_ry2", g, scale=0, ndigits=ndigits)
        .withColumnRenamed("corr", "spearman_rho")
    )


def cuped_adjust(
    df: DataFrame,
    x_col: str,
    y_col: str,
    arm_col: str,
    scale: int = 2,
    ndigits: int = 4,
) -> DataFrame:
    """CUPED variance reduction (Deng, Xu, Kohavi, Walker, WSDM'13):
    adjust the experiment metric with a pre-period covariate,
    ``y_adj = y − θ(x − x̄)`` with θ = cov(x,y)/var(x) POOLED across
    arms — the standard way to tighten A/B confidence intervals
    without touching the estimand (E[y_adj] per arm equals E[y] when
    assignment is independent of x).

    Everything reduces to sufficient statistics: θ and x̄ from the
    pooled exact-decimal suffstats, per-arm adjusted means from
    per-arm exact sums —

        mean_adj(arm) = (Σy_a − θ·Σx_a + θ·x̄·n_a) / n_a

    so NO per-row adjusted column materializes: two keyed aggregates
    and a broadcast of one pooled row. Output per arm: ``n, mean_y,
    mean_y_cuped``.
    """
    # rows with a NULL covariate or metric drop up front (anova_f
    # convention) — counting them in n while sum() skips them would
    # skew theta, x-bar, and every mean
    df = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    v = lambda c: F.col(c).cast(f"decimal(18,{scale})")  # noqa: E731
    p = f"decimal(38,{2 * scale})"
    pooled = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum(v(x_col)).cast("decimal(38,6)").alias("_sx"),
        F.sum(v(y_col)).cast("decimal(38,6)").alias("_sy"),
        F.sum((v(x_col) * v(y_col)).cast(p))
        .cast("decimal(38,6)")
        .alias("_sxy"),
        F.sum((v(x_col) * v(x_col)).cast(p))
        .cast("decimal(38,6)")
        .alias("_sxx"),
    )
    arms = df.groupBy(arm_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(v(x_col)).cast("decimal(38,6)").alias("_asx"),
        F.sum(v(y_col)).cast("decimal(38,6)").alias("_asy"),
    )
    j = arms.crossJoin(F.broadcast(pooled))
    nd = F.col("_n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxy, sxx = F.col("_sxy").cast("double"), F.col("_sxx").cast("double")
    vx = nd * sxx - sx * sx
    theta = F.when(vx > 0, (nd * sxy - sx * sy) / vx).otherwise(F.lit(0.0))
    xbar = sx / nd
    na = F.col("n").cast("double")
    asx, asy = F.col("_asx").cast("double"), F.col("_asy").cast("double")
    return j.select(
        arm_col,
        "n",
        F.round(asy / na, ndigits).cast("double").alias("mean_y"),
        F.round(
            (asy - theta * asx + theta * xbar * na) / na, ndigits
        )
        .cast("double")
        .alias("mean_y_cuped"),
    )


def kruskal_wallis(
    df: DataFrame,
    value_col: str,
    group_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Kruskal-Wallis rank test (the nonparametric one-way ANOVA):
    does the distribution of ``value_col`` differ across the levels
    of ``group_col``? 1-row output ``k_groups, n_rows, h_stat``
    (tie-corrected).

    Exactness: doubled average ranks are INTEGERS (the spearman/AUC
    trick), so ΣR per group and the tie table are exact integer
    aggregates; H is one fixed IEEE expression —

        H = [ 12/(N(N+1)) · Σ_g (ΣR_g)²/n_g − 3(N+1) ]
            / (1 − Σ_t (t³−t)/(N³−N))

    NULL when k < 2 or every value ties (correction denominator 0).

    Scale shape: NO global window. Rows collapse to the
    (value, group) contingency table first (one hash shuffle), then
    the DISTINCT-VALUE table gets an inclusive running count via the
    range-partitioned two-pass cumsum (``operators.ids.
    running_totals`` — the dense_ids machinery), from which the
    doubled average rank of every tied block is pure arithmetic:

        r2(v) = 2·C(<v) + t_v + 1 = 2·cum_incl(v) − t_v + 1

    (cum_incl = running count through v). The old form ranked the
    ENTIRE corpus through one un-partitioned window task; this one
    never moves more than one row per distinct value through the
    ordered pass. Integer exactness is unchanged — r2 is the same
    integer the rank window produced.
    """
    from .ids import running_totals

    base = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    )
    vg = base.groupBy(
        F.col(value_col).alias("_v"), F.col(group_col).alias("_g")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    vt = vg.groupBy("_v").agg(F.sum("_c").cast("bigint").alias("_t"))
    vt_cum = running_totals(vt, ["_v"], "_t", cum_col="_cum")
    r2tbl = vt_cum.select(
        "_v",
        "_t",
        (2 * F.col("_cum") - F.col("_t") + 1).cast("bigint").alias("_r2"),
    )
    per_g = (
        vg.join(r2tbl.select("_v", "_r2"), "_v")
        .groupBy("_g")
        .agg(
            F.sum("_c").cast("bigint").alias("_n"),
            F.sum(F.col("_c") * F.col("_r2")).cast("bigint").alias("_sr2"),
        )
    )
    # Σ (ΣR_g)²/n_g with ΣR_g = _sr2/2 → (_sr2/2)²/n = _sr2²/(4n);
    # bounded groups → sorted fold of the per-group terms
    term = (
        F.col("_sr2").cast("double") * F.col("_sr2").cast("double")
        / (4.0 * F.col("_n").cast("double"))
    )
    top = per_g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_groups"),
        F.sum("_n").cast("bigint").alias("n_rows"),
        F.aggregate(
            F.sort_array(F.collect_list(term)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("_t1"),
    )
    ties = vt.agg(
        F.sum(F.col("_t") * F.col("_t") * F.col("_t") - F.col("_t"))
        .cast("bigint")
        .alias("_tie")
    )
    j = top.crossJoin(F.broadcast(ties))
    n = F.col("n_rows").cast("double")
    h_raw = 12.0 / (n * (n + 1.0)) * F.col("_t1") - 3.0 * (n + 1.0)
    corr = 1.0 - F.col("_tie").cast("double") / (n * n * n - n)
    h = F.when(
        (F.col("k_groups") >= 2) & (corr > 0), h_raw / corr
    )
    return j.select(
        "k_groups",
        "n_rows",
        F.round(h, ndigits).cast("double").alias("h_stat"),
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    ndigits: int = 6,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test for two independent
    samples — the nonparametric two-sample location test, the k=2
    companion of :func:`kruskal_wallis`. Output
    ``n_a, n_b, u_stat, z_score`` — ONE row when both groups have
    rows (z NULL if every value ties); EMPTY when either group is
    absent entirely (the inner join of per-group aggregates has
    nothing to pair — callers needing a sentinel row should guard
    with a count first; the q291 oracle twin shares this shape, so
    the gate is consistent either way).

    Scale shape: identical to kruskal_wallis — NO global window.
    Rows collapse to the (value, group) contingency table, the
    distinct-value table gets its inclusive running count from the
    range-partitioned two-pass cumsum (operators/ids.running_totals),
    and doubled ranks r2(v) = 2·cum − t + 1 are pure arithmetic.
    Everything through ΣR2 and the tie table is exact integer;
    U = (ΣR2_a − n_a(n_a+1))/2 is exact (integer halved), and z is
    one fixed IEEE expression both engines replay:

        z = (U − n_a·n_b/2)
            / sqrt( n_a·n_b/12 · (N+1 − Σ(t³−t)/(N(N−1))) )
    """
    from .ids import running_totals

    base = df.filter(
        F.col(group_col).isin([group_a, group_b])
        & F.col(value_col).isNotNull()
    )
    vg = base.groupBy(
        F.col(value_col).alias("_v"), F.col(group_col).alias("_g")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    vt = vg.groupBy("_v").agg(F.sum("_c").cast("bigint").alias("_t"))
    vt_cum = running_totals(vt, ["_v"], "_t", cum_col="_cum")
    r2tbl = vt_cum.select(
        "_v",
        (2 * F.col("_cum") - F.col("_t") + 1).cast("bigint").alias("_r2"),
    )
    per_g = (
        vg.join(r2tbl, "_v")
        .groupBy("_g")
        .agg(
            F.sum("_c").cast("bigint").alias("_n"),
            F.sum(F.col("_c") * F.col("_r2")).cast("bigint").alias("_sr2"),
        )
    )
    ties = vt.agg(
        F.sum(F.col("_t") * F.col("_t") * F.col("_t") - F.col("_t"))
        .cast("bigint")
        .alias("_tie")
    )
    a = per_g.filter(F.col("_g") == group_a).select(
        F.col("_n").alias("n_a"), F.col("_sr2").alias("_sr2a")
    )
    b = per_g.filter(F.col("_g") == group_b).select(
        F.col("_n").alias("n_b")
    )
    j = (
        a.crossJoin(F.broadcast(b))
        .crossJoin(F.broadcast(ties))
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    n = na + nb
    # ΣR_a = _sr2a/2 (exact: _sr2a has the parity of n_a(n_a+1));
    # U = ΣR_a − n_a(n_a+1)/2 → compute doubled-integer then halve
    u2 = (
        F.col("_sr2a")
        - (F.col("n_a") * (F.col("n_a") + 1)).cast("bigint")
    )
    u = u2.cast("double") / 2.0
    tie_term = F.col("_tie").cast("double") / (n * (n - 1.0))
    var_u = na * nb / 12.0 * (n + 1.0 - tie_term)
    z = F.when(var_u > 0, (u - na * nb / 2.0) / F.sqrt(var_u))
    return j.select(
        "n_a",
        "n_b",
        u.alias("u_stat"),
        F.round(z, ndigits).cast("double").alias("z_score"),
    )


def bh_fdr(
    df: DataFrame,
    key_col: str,
    p_col: str,
    alpha: float = 0.05,
) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control over a table of
    (test, p-value) rows — the multiple-testing gate every metric
    sweep needs before acting on "significant" segments. Appends
    ``rank`` (1-based, ascending p, key tie-break), ``threshold`` =
    rank·α/m, and ``rejected`` (true for every test with rank ≤ k,
    k = the largest rank whose p ≤ threshold — the step-up rule,
    which rejects SOME tests with p above their own threshold).

    Scale shape: the global p-value rank comes from the
    range-partitioned two-pass numbering (operators/ids.dense_ids) —
    no single-task window; k is a 1-row aggregate broadcast back.
    NULL p-values are excluded (anova_f convention). Determinism:
    rank is integer, the threshold comparison is one IEEE expression
    (rank·α/m) both engines evaluate identically.
    """
    a = float(alpha)
    if not 0.0 < a < 1.0:
        raise ValueError("alpha must be in (0, 1)")
    from .ids import dense_ids

    base = df.filter(F.col(p_col).isNotNull()).select(
        F.col(key_col).alias("test_id"), F.col(p_col).alias("p_value")
    )
    ranked = dense_ids(base, ["p_value", "test_id"], id_col="rank")
    m = base.agg(F.count(F.lit(1)).cast("bigint").alias("_m"))
    t = ranked.crossJoin(F.broadcast(m)).withColumn(
        "threshold",
        F.col("rank").cast("double") * F.lit(a) / F.col("_m").cast("double"),
    )
    k = t.filter(F.col("p_value") <= F.col("threshold")).agg(
        F.coalesce(F.max("rank"), F.lit(0)).cast("bigint").alias("_k")
    )
    return (
        t.crossJoin(F.broadcast(k))
        .select(
            "test_id",
            "p_value",
            F.col("rank").cast("bigint").alias("rank"),
            F.round(F.col("threshold"), 9).cast("double").alias("threshold"),
            (F.col("rank") <= F.col("_k")).alias("rejected"),
        )
    )


def cohens_d(
    df: DataFrame,
    value_col: str,
    group_col: str,
    scale: int = 2,
    ndigits: int = 6,
) -> DataFrame:
    """Standardized effect sizes for every ordered pair of groups:
    ``group_a, group_b, n_a, n_b, d, g`` where d is Cohen's d on the
    pooled sd and g is Hedges' small-sample-corrected g =
    d·(1 − 3/(4(n_a+n_b) − 9)). The companion to the suite's t/U
    tests: significance says "real", effect size says "how big".

    One exact-decimal suffstats aggregate per group (sums and squared
    sums in DECIMAL — engine-exact at any partitioning), then a
    broadcast self-join of the groups×groups bounded table; every
    downstream number is one fixed IEEE expression. Groups with < 2
    rows produce NULL d (pooled variance undefined). NULL values are
    excluded up front.
    """
    v = F.col(value_col).cast(f"decimal(18,{scale})")
    p = f"decimal(38,{2 * scale})"
    g = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).groupBy(F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum(v).cast("decimal(38,6)").alias("_s"),
        F.sum((v * v).cast(p)).cast("decimal(38,6)").alias("_ss"),
    )
    ga = g.select(
        F.col("_g").alias("group_a"),
        F.col("_n").alias("n_a"),
        F.col("_s").alias("_sa"),
        F.col("_ss").alias("_ssa"),
    )
    gb = g.select(
        F.col("_g").alias("group_b"),
        F.col("_n").alias("n_b"),
        F.col("_s").alias("_sb"),
        F.col("_ss").alias("_ssb"),
    )
    j = ga.join(F.broadcast(gb), F.col("group_a") < F.col("group_b"))
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    sa, sb = F.col("_sa").cast("double"), F.col("_sb").cast("double")
    ssa, ssb = F.col("_ssa").cast("double"), F.col("_ssb").cast("double")
    var_a = (ssa - sa * sa / na) / (na - 1.0)
    var_b = (ssb - sb * sb / nb) / (nb - 1.0)
    sp2 = ((na - 1.0) * var_a + (nb - 1.0) * var_b) / (na + nb - 2.0)
    d = F.when(
        (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (sp2 > 0),
        (sa / na - sb / nb) / F.sqrt(sp2),
    )
    corr = 1.0 - 3.0 / (4.0 * (na + nb) - 9.0)
    return j.select(
        "group_a",
        "group_b",
        "n_a",
        "n_b",
        F.round(d, ndigits).cast("double").alias("d"),
        F.round(d * corr, ndigits).cast("double").alias("g"),
    )


def brown_forsythe(
    df: DataFrame,
    value_col: str,
    group_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Brown-Forsythe test of variance homogeneity (the robust Levene
    variant): one-way ANOVA on the absolute deviations from the GROUP
    MEDIAN, z_ig = |x_ig − med_g| — the standard pre-check before
    trusting pooled-variance tests (q243/q293). Output = anova_f's
    1-row shape over z.

    Scale/exactness: group medians are one exact type-7 percentile
    aggregate (hash-matchable: Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``, the q102 contract) broadcast back onto the
    rows; deviations quantize to DECIMAL(18,3) inside anova_f —
    3 decimals is exact for 2-decimal inputs (an even-n median is a
    midpoint, a multiple of 0.005), and the squared-sum precision
    (38,6) then fits the DECIMAL(38,6) suffstat cast WITHOUT a lossy
    scale-down whose rounding mode differs across engines. Two
    corpus passes (median, suffstats) — both single keyed aggregates.
    """
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    )
    med = base.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("_med")
    )
    z = base.join(F.broadcast(med), group_col).select(
        group_col,
        F.abs(
            F.col(value_col).cast("double") - F.col("_med")
        ).alias("_z"),
    )
    return anova_f(z, "_z", group_col, scale=3, ndigits=ndigits)


def two_proportion_ztest(
    df: DataFrame,
    success_col: str,
    arm_col: str,
    arm_a: str,
    arm_b: str,
    z_crit: float = 1.959964,
    ndigits: int = 6,
) -> DataFrame:
    """Two-proportion z-test with per-arm Wilson score intervals —
    the conversion-rate A/B readout. ``success_col`` is boolean (or
    0/1). 1-row output: ``n_a, x_a, n_b, x_b, p_a, p_b, z_score,
    wilson_lo_a, wilson_hi_a, wilson_lo_b, wilson_hi_b``.

    One conditional exact-count aggregate (the welch_ttest shape);
    everything downstream is a fixed IEEE expression over four
    integers, so both engines agree bit for bit:

        z  = (p̂_a − p̂_b) / sqrt( p̂(1−p̂)(1/n_a + 1/n_b) ),  p̂ pooled
        Wilson: (p̂ + c²/2n ± c·sqrt(p̂(1−p̂)/n + c²/4n²)) / (1 + c²/n)

    NULL z when either arm is empty or the pooled variance is 0.
    NULL-flag rows are excluded (anova_f convention).
    """
    base = df.filter(
        F.col(arm_col).isin([arm_a, arm_b])
        & F.col(success_col).isNotNull()
    )
    s = F.col(success_col).cast("boolean")
    side = lambda arm, tag: [  # noqa: E731
        F.count(F.when(F.col(arm_col) == arm, F.lit(1)))
        .cast("bigint")
        .alias(f"n_{tag}"),
        F.sum(F.when((F.col(arm_col) == arm) & s, 1).otherwise(0))
        .cast("bigint")
        .alias(f"x_{tag}"),
    ]
    agg = base.agg(*side(arm_a, "a"), *side(arm_b, "b"))
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    xa, xb = F.col("x_a").cast("double"), F.col("x_b").cast("double")
    pa, pb = xa / na, xb / nb
    pp = (xa + xb) / (na + nb)
    var = pp * (1.0 - pp) * (1.0 / na + 1.0 / nb)
    z = F.when((F.col("n_a") > 0) & (F.col("n_b") > 0) & (var > 0),
               (pa - pb) / F.sqrt(var))
    c = F.lit(float(z_crit))

    def wilson(p, n):
        centre = p + c * c / (2.0 * n)
        half = c * F.sqrt(p * (1.0 - p) / n + c * c / (4.0 * n * n))
        denom = 1.0 + c * c / n
        return (
            F.round((centre - half) / denom, ndigits).cast("double"),
            F.round((centre + half) / denom, ndigits).cast("double"),
        )

    lo_a, hi_a = wilson(pa, na)
    lo_b, hi_b = wilson(pb, nb)
    return agg.select(
        "n_a",
        "x_a",
        "n_b",
        "x_b",
        F.round(pa, ndigits).cast("double").alias("p_a"),
        F.round(pb, ndigits).cast("double").alias("p_b"),
        F.round(z, ndigits).cast("double").alias("z_score"),
        lo_a.alias("wilson_lo_a"),
        hi_a.alias("wilson_hi_a"),
        lo_b.alias("wilson_lo_b"),
        hi_b.alias("wilson_hi_b"),
    )


def moments_normality(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    scale: int = 2,
    ndigits: int = 6,
) -> DataFrame:
    """Skewness, excess kurtosis, and the Jarque-Bera normality
    statistic per group (or 1-row global): ``n, skewness, kurtosis_ex,
    jb_stat`` with JB = n/6·(S² + K²/4).

    One keyed aggregate of exact-decimal raw moments Σx..Σx⁴ (decimal
    addition is exact at any partitioning; magnitude budget: |x| ≤
    10^9 keeps Σx⁴ inside DECIMAL(38)'s range for ~10^9 rows), then
    the central-moment algebra as one fixed IEEE expression —

        m2 = Σx²/n − μ²,  m3 = Σx³/n − 3μΣx²/n + 2μ³,
        m4 = Σx⁴/n − 4μΣx³/n + 6μ²Σx²/n − 3μ⁴
        S = m3/m2^1.5,  K = m4/m2² − 3

    — which DuckDB replays verbatim (builtin skewness() uses a
    different, sample-corrected formula AND float accumulation, so it
    is deliberately not used on either side). NULL stats when m2
    quantizes to 0 or n < 2; NULL values excluded.

    Exactness bound: the Σx³/Σx⁴ terms carry 3·scale/4·scale decimal
    digits, so scale > 3 would force a per-row scale-DOWN recast —
    precisely the cross-engine decimal-rounding hazard the comment
    below avoids — and is rejected (ADVICE r7).
    """
    if scale > 3:
        raise ValueError(
            "moments_normality: scale > 3 would round per-row moment "
            "terms (4*scale exceeds the DECIMAL(38,12) cap) — quantize "
            "the input coarser instead"
        )
    group = [group_col] if group_col else []
    v = F.col(value_col).cast(f"decimal(18,{scale})")
    p2 = f"decimal(38,{2 * scale})"
    p3 = f"decimal(38,{3 * scale})"
    p4 = f"decimal(38,{4 * scale})"
    agg = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            # sums stay at their NATIVE scale (a scale-DOWN recast
            # would round, and decimal rounding modes differ across
            # engines); they leave decimal through one double cast
            F.sum(v).alias("_s1"),
            F.sum((v * v).cast(p2)).alias("_s2"),
            F.sum(((v * v).cast(p2) * v).cast(p3)).alias("_s3"),
            F.sum(((v * v).cast(p2) * (v * v).cast(p2)).cast(p4)).alias(
                "_s4"
            ),
        )
    )
    n = F.col("n").cast("double")
    s1 = F.col("_s1").cast("double")
    s2 = F.col("_s2").cast("double")
    s3 = F.col("_s3").cast("double")
    s4 = F.col("_s4").cast("double")
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - 3.0 * mu * (s2 / n) + 2.0 * mu * mu * mu
    m4 = (
        s4 / n
        - 4.0 * mu * (s3 / n)
        + 6.0 * mu * mu * (s2 / n)
        - 3.0 * mu * mu * mu * mu
    )
    ok = (F.col("n") >= 2) & (m2 > 0)
    skew = F.when(ok, m3 / F.sqrt(m2 * m2 * m2))
    kurt = F.when(ok, m4 / (m2 * m2) - 3.0)
    jb = F.when(ok, n / 6.0 * (skew * skew + kurt * kurt / 4.0))
    return agg.select(
        *group,
        "n",
        F.round(skew, ndigits).cast("double").alias("skewness"),
        F.round(kurt, ndigits).cast("double").alias("kurtosis_ex"),
        F.round(jb, ndigits).cast("double").alias("jb_stat"),
    )


def forecast_accuracy(
    df: DataFrame,
    actual_col: str,
    pred_col: str,
    group_cols: list[str] | None = None,
    scale: int = 4,
    ndigits: int = 6,
) -> DataFrame:
    """Forecast/regression error metrics per group: ``n, mae, rmse,
    mape, smape, bias`` — the evaluation table every forecasting
    pipeline (holt/ewma/seasonal tiers) reports against holdouts.

    Per-row error terms quantize to DECIMAL(18,scale) (fixed IEEE
    arithmetic then one HALF_UP cast — identical in DuckDB), so the
    corpus-sized sums are exact and partitioning-independent; the
    final divisions are one expression per metric. MAPE terms skip
    rows with actual = 0 (counted separately by n_mape); sMAPE uses
    the |a|+|p| denominator convention and skips rows where that is
    0. Rows with NULL actual or pred are excluded.
    """
    group = list(group_cols or [])
    a = F.col(actual_col).cast("double")
    p = F.col(pred_col).cast("double")
    dec = f"decimal(18,{scale})"
    err = (p - a).cast(dec)
    abs_err = F.abs(p - a).cast(dec)
    # squared errors need double the integer digits of the raw error
    # (a 4e6 daily-revenue miss squares to 1.6e13 — DECIMAL(18,4)
    # overflows under ANSI at sf0.1; measured, hence the wide cast)
    sq_err = ((p - a) * (p - a)).cast(f"decimal(30,{scale})")
    ape = F.when(a != 0.0, (F.abs(p - a) / F.abs(a)).cast(dec))
    sden = F.abs(a) + F.abs(p)
    sape = F.when(sden > 0.0, (F.abs(p - a) / sden).cast(dec))
    agg = (
        df.filter(F.col(actual_col).isNotNull() & F.col(pred_col).isNotNull())
        .groupBy(*group)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(abs_err).cast("decimal(38,6)").alias("_sae"),
            F.sum(sq_err).cast("decimal(38,6)").alias("_sse"),
            F.sum(err).cast("decimal(38,6)").alias("_se"),
            F.sum(ape).cast("decimal(38,6)").alias("_sape"),
            F.count(ape).cast("bigint").alias("n_mape"),
            F.sum(sape).cast("decimal(38,6)").alias("_ssmape"),
            F.count(sape).cast("bigint").alias("n_smape"),
        )
    )
    n = F.col("n").cast("double")
    out = agg.select(
        *group,
        "n",
        F.round(F.col("_sae").cast("double") / n, ndigits)
        .cast("double")
        .alias("mae"),
        F.round(F.sqrt(F.col("_sse").cast("double") / n), ndigits)
        .cast("double")
        .alias("rmse"),
        F.round(
            F.when(
                F.col("n_mape") > 0,
                F.col("_sape").cast("double")
                / F.col("n_mape").cast("double")
                * 100.0,
            ),
            ndigits,
        )
        .cast("double")
        .alias("mape"),
        F.round(
            F.when(
                F.col("n_smape") > 0,
                F.col("_ssmape").cast("double")
                / F.col("n_smape").cast("double")
                * 200.0,
            ),
            ndigits,
        )
        .cast("double")
        .alias("smape"),
        F.round(F.col("_se").cast("double") / n, ndigits)
        .cast("double")
        .alias("bias"),
    )
    return out


def wasserstein_1d(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    scale: int = 2,
    ndigits: int = 6,
) -> DataFrame:
    """Exact 1-Wasserstein (earth-mover) distance between two
    samples' empirical distributions — the drift metric that reports
    MAGNITUDE in the value's own units (KS gives only the max CDF
    gap; PSI needs binning). 1-row output: ``n_a, n_b, w1``.

        W1 = ∫ |F_a(x) − F_b(x)| dx
           = Σ_i |CumA_i/n_a − CumB_i/n_b| · (v_{i+1} − v_i)

    over the MERGED distinct values. Exactness: values quantize to
    scaled integers (×10^scale); both cumulative counts come from ONE
    range-partitioned two-pass cumsum (``running_totals`` with two
    weight columns — a single range shuffle); multiplying each term
    by n_a·n_b clears the rationals, so the data-sized reduction is
    an exact DECIMAL sum of integers:

        W1 = Σ |CumA_i·n_b − CumB_i·n_a| · Δv_int / (n_a·n_b·10^s)

    with ONE division at the end. The Δv neighbor pairing is an
    equi-join on dense rank (dense_ids) — no windows anywhere.
    NULL values and other groups are excluded; W1 is NULL if either
    sample is empty.
    """
    mult = 10 ** scale
    base = df.filter(
        F.col(group_col).isin([group_a, group_b])
        & F.col(value_col).isNotNull()
    ).select(
        (F.col(value_col).cast(f"decimal(18,{scale})") * mult)
        .cast("long")
        .alias("_v"),
        F.col(group_col).alias("_g"),
    )
    vt = base.groupBy("_v").agg(
        F.sum(F.when(F.col("_g") == group_a, 1).otherwise(0))
        .cast("long")
        .alias("_ca"),
        F.sum(F.when(F.col("_g") == group_b, 1).otherwise(0))
        .cast("long")
        .alias("_cb"),
    )
    return wasserstein_from_counts(vt, scale=scale, ndigits=ndigits)


def wasserstein_from_counts(
    vt: DataFrame, scale: int = 2, ndigits: int = 6
) -> DataFrame:
    """The W1 reduction of ``wasserstein_1d`` starting from a
    per-distinct-value count table ``(_v, _ca, _cb)`` where ``_v`` is
    the value already quantized to scaled integers (×10^scale). This
    is the seam the streaming twin merges into: integer count tables
    are exactly sum-mergeable per micro-batch, so the streamed state
    reduces to the SAME bits as a one-pass batch rebuild
    (streaming/drift_stream.read_wasserstein)."""
    from .ids import dense_ids, running_totals

    mult = 10 ** scale
    cum = running_totals(
        vt, ["_v"], ["_ca", "_cb"], cum_col=["_cuma", "_cumb"]
    )
    ranked = dense_ids(cum.select("_v", "_cuma", "_cumb"), ["_v"], id_col="_r")
    nxt = ranked.select(
        (F.col("_r") - 1).alias("_r"), F.col("_v").alias("_vnext")
    )
    tot = vt.agg(
        F.sum("_ca").cast("bigint").alias("n_a"),
        F.sum("_cb").cast("bigint").alias("n_b"),
    )
    terms = (
        ranked.join(nxt, "_r")  # drops the last value (no gap above)
        .crossJoin(F.broadcast(tot))
        .select(
            "n_a",
            "n_b",
            (
                F.abs(
                    F.col("_cuma").cast("decimal(19,0)")
                    * F.col("n_b").cast("decimal(19,0)")
                    - F.col("_cumb").cast("decimal(19,0)")
                    * F.col("n_a").cast("decimal(19,0)")
                )
                * (F.col("_vnext") - F.col("_v")).cast("decimal(19,0)")
            ).alias("_t"),
        )
    )
    agg = terms.groupBy("n_a", "n_b").agg(
        F.sum("_t").alias("_s")
    )
    p6 = F.lit(float(10 ** ndigits))
    w1 = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        F.floor(
            F.col("_s").cast("double")
            / (
                F.col("n_a").cast("double")
                * F.col("n_b").cast("double")
                * F.lit(float(mult))
            )
            * p6
            + F.lit(0.5)
        )
        / p6,
    )
    return agg.select(
        "n_a", "n_b", w1.cast("double").alias("w1")
    )
