"""Data-quality operators: table profiling and declarative
constraint checking (the deequ/dbt-test-style layer) — the batch
complement of the streaming dead-letter split (streaming/quarantine)
and the schema validator (functions/validate).

Both operators are single-pass aggregations:

- ``profile_table`` computes per-column statistics (null rate, exact
  distinct count, min/max, mean for numerics) in ONE wide aggregate
  over the table — one job, no per-column scans. Output is LONG
  (one row per column), so the profile of a 1000-column table is
  still a small DataFrame.
- ``check_constraints`` evaluates declarative rules and returns one
  row per rule with pass/fail, the violating-row count, and the
  metric value. Rules compile to conditional aggregates in one pass;
  ``uniqueness`` adds one keyed aggregate. Nothing collects more
  than the report.

Both outputs are plain DataFrames — persist them next to the data
they describe, diff them across runs, alert on deltas.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  ndigits: int = 4) -> DataFrame:
    """One row per column: ``column, n_rows, n_nulls, null_frac,
    n_distinct (exact), min_value, max_value, mean_value`` (min/max as
    strings for type uniformity; mean NULL for non-numerics, decimals
    profiled via their numeric cast)."""
    cols = columns or df.columns
    dtypes = dict(df.dtypes)
    aggs: list[Column] = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        is_num = dtypes[c] in _NUMERIC or dtypes[c].startswith("decimal")
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_mx_{c}"),
            (
                F.round(F.avg(F.col(c).cast("double")), ndigits)
                if is_num else F.lit(None).cast("double")
            ).alias(f"_av_{c}"),
        ]
    wide = df.agg(*aggs)
    # wide -> long: one struct per column, exploded (driver never sees
    # the data, only the 1-row aggregate plan)
    structs = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col("_rows").cast("bigint").alias("n_rows"),
            F.col(f"_nn_{c}").cast("bigint").alias("n_nulls"),
            F.round(F.col(f"_nn_{c}") / F.col("_rows"), ndigits)
            .alias("null_frac"),
            F.col(f"_nd_{c}").cast("bigint").alias("n_distinct"),
            F.col(f"_mn_{c}").alias("min_value"),
            F.col(f"_mx_{c}").alias("max_value"),
            F.col(f"_av_{c}").alias("mean_value"),
        )
        for c in cols
    ])
    return wide.select(F.explode(structs).alias("p")).select("p.*")


# ---------------------------------------------------------------------------
# declarative constraints
# ---------------------------------------------------------------------------
def not_null(col: str) -> dict:
    return {"rule": f"not_null({col})", "kind": "not_null", "col": col}


def unique(col: str) -> dict:
    return {"rule": f"unique({col})", "kind": "unique", "col": col}


def in_range(col: str, lo=None, hi=None) -> dict:
    return {"rule": f"in_range({col},{lo},{hi})", "kind": "in_range",
            "col": col, "lo": lo, "hi": hi}


def matches(col: str, pattern: str) -> dict:
    return {"rule": f"matches({col})", "kind": "matches", "col": col,
            "pattern": pattern}


def in_set(col: str, values: list) -> dict:
    return {"rule": f"in_set({col})", "kind": "in_set", "col": col,
            "values": list(values)}


def min_fraction(col: str, predicate: Column, frac: float,
                 name: str | None = None) -> dict:
    """At least ``frac`` of rows satisfy ``predicate`` (a Column)."""
    return {"rule": name or f"min_fraction({col})", "kind": "min_fraction",
            "col": col, "pred": predicate, "frac": frac}


def check_constraints(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate every rule in (at most) two aggregation passes.

    Output: one row per rule — ``rule, passed, n_violations, metric``
    (metric = violation fraction, or the duplicate-key count for
    ``unique``). NULLs violate ``in_range``/``matches``/``in_set``
    only via ``not_null`` — a NULL is 'unknown', not 'out of range'
    (3VL, same convention as SQL CHECK constraints).
    """
    if not rules:
        raise ValueError("rules must be non-empty")

    aggs = [F.count(F.lit(1)).alias("_rows")]
    uniq_rules = []
    for i, rule in enumerate(rules):
        kind, col = rule["kind"], rule["col"]
        c = F.col(col)
        if kind == "not_null":
            viol = c.isNull()
        elif kind == "in_range":
            conds = []
            if rule["lo"] is not None:
                conds.append(c < F.lit(rule["lo"]))
            if rule["hi"] is not None:
                conds.append(c > F.lit(rule["hi"]))
            viol = conds[0] if len(conds) == 1 else (conds[0] | conds[1])
            viol = c.isNotNull() & viol
        elif kind == "matches":
            viol = c.isNotNull() & ~c.rlike(rule["pattern"])
        elif kind == "in_set":
            viol = c.isNotNull() & ~c.isin(rule["values"])
        elif kind == "min_fraction":
            viol = ~F.coalesce(rule["pred"], F.lit(False))
        elif kind == "unique":
            uniq_rules.append((i, rule))
            continue
        else:
            raise ValueError(f"unknown rule kind: {kind!r}")
        aggs.append(F.sum(F.when(viol, 1).otherwise(0)).alias(f"_v{i}"))

    wide = df.agg(*aggs).collect()[0]
    n_rows = wide["_rows"]

    report = []
    for i, rule in enumerate(rules):
        if rule["kind"] == "unique":
            continue
        nv = int(wide[f"_v{i}"] or 0)
        frac = round(nv / n_rows, 6) if n_rows else 0.0
        if rule["kind"] == "min_fraction":
            passed = (1.0 - frac) >= rule["frac"]
        else:
            passed = nv == 0
        report.append((rule["rule"], passed, nv, float(frac)))

    for i, rule in uniq_rules:
        dup = (
            df.filter(F.col(rule["col"]).isNotNull())
            .groupBy(rule["col"])
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .agg(
                F.coalesce(F.sum("_n"), F.lit(0)).alias("dup_rows"),
                F.count(F.lit(1)).alias("dup_keys"),
            )
            .collect()[0]
        )
        nv = int(dup["dup_rows"])
        report.append((rule["rule"], nv == 0, nv, float(dup["dup_keys"])))

    spark = df.sparkSession
    return spark.createDataFrame(
        report, "rule string, passed boolean, n_violations bigint,"
        " metric double"
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: float = 3.0,
    ndigits: int = 6,
) -> DataFrame:
    """Robust per-group outlier report: median / MAD (median absolute
    deviation), the estimator that survives the very outliers it
    hunts — unlike mean/stddev z-scores, one 1e12 poison value cannot
    drag the threshold with it.

    Output: one row per group — ``n, n_outliers, med, mad`` with
    ``n_outliers`` = rows where |x - med| > k·MAD. Exact medians
    (Spark ``median`` = linear-interpolated 0.5 percentile, the same
    contract as DuckDB's ``median``), each ROUNDED to ``ndigits``
    BEFORE the comparison so the flag decision is bit-deterministic
    across engines and partitionings.

    Two keyed aggregates over the data (med, then MAD over the
    deviations) plus one per-group join each — exact MAD is
    irreducibly two-pass; both passes combine map-side. The per-group
    median/MAD tables are one row per group, i.e. unbounded when
    group_cols is high-cardinality, so the joins are left to AQE:
    it broadcasts them when they measure small and falls back to
    shuffle join otherwise (no forced unbounded broadcast — the
    baskets.py discipline). MAD = 0 (over half the group identical)
    flags every row with any deviation, the standard convention.
    NULL values are excluded entirely (from ``n`` too) — they can
    never be outlier candidates, so counting them would silently
    dilute n_outliers/n rates.
    """
    df = df.filter(F.col(value_col).isNotNull())
    g = [F.col(c) for c in group_cols]
    med = df.groupBy(*g).agg(
        F.round(F.median(F.col(value_col).cast("double")), ndigits).alias(
            "med"
        )
    )
    dev = df.join(med, group_cols).withColumn(
        "_dev", F.abs(F.col(value_col).cast("double") - F.col("med"))
    )
    mad = dev.groupBy(*g).agg(
        F.round(F.median("_dev"), ndigits).alias("mad")
    )
    flagged = dev.join(mad, group_cols)
    return (
        flagged.groupBy(*group_cols, "med", "mad")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.when(F.col("_dev") > F.lit(k) * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .select(*group_cols, "n", "n_outliers", "med", "mad")
    )


def equi_depth_bins(
    df: DataFrame,
    value_col: str,
    n_bins: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """Equi-depth (quantile) binning WITHOUT the NTILE trap: a global
    ``NTILE(n) OVER (ORDER BY x)`` funnels 100 TB through one task.
    Instead: ONE exact-percentile aggregate produces the n-1 interior
    cut points (a tiny array), which broadcast back and bucket every
    row map-side by comparison — two jobs, no global sort, no
    single-task window.

    Bucket b (1-based) = 1 + #(cut points < x is false...): row goes
    to the first bucket whose upper cut point is >= x (ties at a cut
    point land in the lower bucket — deterministic, engine-neutral
    because the cut points are ROUNDED to ``ndigits`` first).
    Output: one row per non-empty bucket — ``bucket, n, lo, hi``.

    Exact interpolated percentiles (Spark ``percentile`` = DuckDB
    ``quantile_cont``) keep the oracle replayable; at 100 TB swap in
    ``approx_percentile`` for one fewer full-accuracy pass — the
    operator shape is unchanged.
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    fracs = [i / n_bins for i in range(1, n_bins)]
    # NULLs are not bucketable (every comparison is NULL → they'd
    # silently land in bucket 1); exclude them up front.
    df = df.filter(F.col(value_col).isNotNull())
    x = F.col(value_col).cast("double")
    cuts = df.agg(
        F.transform(
            F.percentile(x, F.array(*[F.lit(f) for f in fracs])),
            lambda c: F.round(c, ndigits),
        ).alias("_cuts")
    )
    b = df.crossJoin(F.broadcast(cuts))
    bucket = F.lit(1) + F.aggregate(
        F.col("_cuts"),
        F.lit(0),
        lambda acc, c: acc + F.when(x > c, 1).otherwise(0),
    )
    return (
        b.select(x.alias("_x"), bucket.cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("_x").alias("lo"),
            F.max("_x").alias("hi"),
        )
    )


def kl_drift(
    df: DataFrame,
    group_col: str,
    cat_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Distribution drift per group: KL(p_group || p_corpus) over the
    categorical column — the mixture-monitoring primitive (is source
    X's language mix diverging from the corpus?). Two keyed
    aggregates (group×category, category) + broadcast joins of the
    tiny distribution tables; the corpus is scanned once.

    KL is finite here by construction: every category observed in a
    group is also in the corpus distribution (q > 0 whenever p > 0).
    Counts are exact integers, so both engines derive bit-identical
    doubles before the final ROUND.
    """
    gc = df.groupBy(
        F.col(group_col).alias("_g"), F.col(cat_col).alias("_c")
    ).agg(F.count(F.lit(1)).alias("_n_gc"))
    g = gc.groupBy("_g").agg(F.sum("_n_gc").alias("_n_g"))
    c = gc.groupBy("_c").agg(F.sum("_n_gc").alias("_n_c"))
    tot = gc.agg(F.sum("_n_gc").cast("double").alias("_n"))
    j = (
        gc.join(F.broadcast(g), "_g")
        .join(F.broadcast(c), "_c")
        .crossJoin(F.broadcast(tot))
    )
    p = F.col("_n_gc").cast("double") / F.col("_n_g").cast("double")
    q = F.col("_n_c").cast("double") / F.col("_n")
    term = p * F.log(p / q)
    return (
        j.groupBy(F.col("_g").alias(group_col))
        .agg(
            F.round(F.sum(term), ndigits).cast("double").alias("kl_divergence"),
            F.sum("_n_gc").cast("bigint").alias("n_rows"),
        )
    )


def quantile_scores(
    df: DataFrame,
    score_cols: list[str],
    n_bins: int = 5,
    ndigits: int = 6,
    suffix: str = "_score",
) -> DataFrame:
    """Append ``<col>_score`` ∈ [1, n_bins] for each listed column:
    1 + the number of interior quantile cut points strictly below the
    value (ties at a cut stay in the lower bin — equi_depth_bins'
    convention). The RFM-scoring primitive.

    ONE aggregate computes every column's cut array in a single pass;
    the tiny (1 × cols·(n_bins-1)) result broadcasts and scoring is a
    map-side fold per row — no NTILE, no global sort, no per-column
    job. Cuts are ROUNDed to ``ndigits`` before comparison so scores
    are bit-deterministic across engines and partitionings. NULL
    values score NULL.
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    fracs = [i / n_bins for i in range(1, n_bins)]
    cuts = df.agg(
        *[
            F.transform(
                F.percentile(
                    F.col(c).cast("double"),
                    F.array(*[F.lit(f) for f in fracs]),
                ),
                lambda v: F.round(v, ndigits),
            ).alias(f"_cuts_{c}")
            for c in score_cols
        ]
    )
    out = df.crossJoin(F.broadcast(cuts))
    for c in score_cols:
        x = F.col(c).cast("double")
        score = F.lit(1) + F.aggregate(
            F.col(f"_cuts_{c}"),
            F.lit(0),
            lambda acc, cut: acc + F.when(x > cut, 1).otherwise(0),
        )
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(x.isNotNull(), score.cast("int")),
        )
    return out.drop(*[f"_cuts_{c}" for c in score_cols])


def winsorized_stats(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lower: float = 0.05,
    upper: float = 0.95,
    ndigits: int = 6,
) -> DataFrame:
    """Per-group winsorized summary: values clamped to the group's
    [lower, upper] interpolated percentiles (ROUNDed to ``ndigits``
    so the clamp decision is engine-neutral), then n / mean / lo_cap /
    hi_cap per group. Robust mean without MAD's two data passes over
    deviations: one grouped percentile aggregate (tiny result, joined
    back — AQE broadcasts when small), one clamp+aggregate pass.
    Mean is the exact-decimal avg2 form at DECIMAL(28,6) (clamped
    values are ndigits-decimal by construction).
    """
    df = df.filter(F.col(value_col).isNotNull())
    x = F.col(value_col).cast("double")
    caps = df.groupBy(*group_cols).agg(
        F.round(F.percentile(x, F.lit(lower)), ndigits).alias("lo_cap"),
        F.round(F.percentile(x, F.lit(upper)), ndigits).alias("hi_cap"),
    )
    clamped = df.join(caps, group_cols).withColumn(
        "_w", F.least(F.greatest(x, F.col("lo_cap")), F.col("hi_cap"))
    )
    return (
        clamped.groupBy(*group_cols, "lo_cap", "hi_cap")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(
                F.sum(F.col("_w").cast(f"decimal(28,{ndigits})")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                2,
            ).alias("w_mean"),
        )
        .select(*group_cols, "n", "w_mean", "lo_cap", "hi_cap")
    )


def benford_deviation(
    df: DataFrame,
    value_col: str,
    scale: int = 2,
    ndigits: int = 6,
) -> DataFrame:
    """Benford's-law first-digit screen (the classic fraud /
    fabricated-data detector): observed vs expected leading-digit
    distribution of a positive numeric column. One row per digit
    1-9: ``digit, n_obs, obs_frac, exp_frac, abs_dev``.

    The leading significant digit is extracted from the DECIMAL
    string representation (regexp first [1-9]) — NOT via
    floor(x/10^floor(log10 x)), whose log10 is a transcendental that
    can land on either side of an integer at exact powers of ten.
    Decimal-to-string is exact and identical across engines, so the
    digit histogram is exact integers. Expected fractions
    log10(1+1/d) pass through floor-quantization (see
    stats.fquant) to collapse log10 ulp noise.

    Zero/NULL/negative-free by filter: Benford applies to positive
    magnitudes. One groupBy(digit) aggregate — map-side combine into
    9 groups, no other shuffle.
    """
    from .stats import fquant

    v = F.col(value_col).cast(f"decimal(18,{scale})")
    d = df.filter(v > 0).select(
        F.regexp_extract(v.cast("string"), "[1-9]", 0).alias("digit")
    )
    counts = d.groupBy("digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs")
    )
    tot = counts.agg(F.sum("n_obs").cast("double").alias("_n"))
    out = counts.crossJoin(F.broadcast(tot))
    dd = F.col("digit").cast("double")
    obs = F.col("n_obs").cast("double") / F.col("_n")
    exp = fquant(F.log10(F.lit(1.0) + F.lit(1.0) / dd), 9)
    return out.select(
        F.col("digit").cast("int").alias("digit"),
        F.col("n_obs"),
        F.round(obs, ndigits).cast("double").alias("obs_frac"),
        F.round(exp, ndigits).cast("double").alias("exp_frac"),
        F.round(F.abs(obs - exp), ndigits).cast("double").alias("abs_dev"),
    )


def fd_violations(
    df: DataFrame,
    dependencies: list[tuple[list[str], str]],
    ndigits: int = 6,
) -> DataFrame:
    """Functional-dependency audit: for each declared ``(lhs_cols,
    rhs_col)`` report whether LHS → RHS holds and how badly it fails.
    One row per dependency: ``fd, n_lhs_values, n_violating_lhs,
    max_distinct_rhs, violating_rows, violation_frac``.

    A violating LHS value is one mapping to >1 distinct RHS value;
    ``violating_rows`` counts every row under such a value (the rows
    a cleaner would have to reconcile). Each dependency is one keyed
    aggregate (exact distinct per LHS group) + one tiny rollup —
    results union into the report. Complete-case per dependency:
    NULL in LHS or RHS drops the row (SQL FDs are defined over
    non-NULL tuples).
    """
    reports = []
    for lhs, rhs in dependencies:
        name = ",".join(lhs) + "->" + rhs
        cc = df.filter(
            F.col(rhs).isNotNull()
            & F.expr(" AND ".join(f"`{c}` IS NOT NULL" for c in lhs))
        )
        per = cc.groupBy(*lhs).agg(
            F.count(F.lit(1)).cast("bigint").alias("_rows"),
            F.countDistinct(rhs).cast("bigint").alias("_k"),
        )
        rep = per.agg(
            F.lit(name).alias("fd"),
            F.count(F.lit(1)).cast("bigint").alias("n_lhs_values"),
            F.sum(F.when(F.col("_k") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violating_lhs"),
            F.max("_k").cast("bigint").alias("max_distinct_rhs"),
            F.sum(F.when(F.col("_k") > 1, F.col("_rows")).otherwise(0))
            .cast("bigint")
            .alias("violating_rows"),
            F.round(
                F.sum(F.when(F.col("_k") > 1, F.col("_rows")).otherwise(0))
                .cast("double")
                / F.sum("_rows").cast("double"),
                ndigits,
            )
            .cast("double")
            .alias("violation_frac"),
        )
        reports.append(rep)
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def ref_integrity(
    child: DataFrame,
    parent: DataFrame,
    fk_col: str,
    pk_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Referential-integrity audit: how many child rows point at a
    parent key that does not exist. 1-row report: ``n_child_rows,
    n_null_fk, n_orphan_rows, n_orphan_keys, orphan_frac`` (fraction
    over non-NULL FKs; NULL FKs are reported separately, not counted
    as orphans — SQL FK semantics).

    One left-anti join of the child against the parent KEY COLUMN
    (column-pruned scan; the join carries only the key) plus two
    1-row aggregates. The orphan set is usually tiny, so AQE
    broadcasts the distinct parent keys when they fit; at dimension
    scale it degrades to a shuffle join on the key — either way no
    row wider than the key moves.
    """
    fk = F.col(fk_col)
    tot = child.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_child_rows"),
        F.sum(F.when(fk.isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null_fk"),
    )
    orphans = (
        child.filter(fk.isNotNull())
        .select(fk.alias("_fk"))
        .join(
            parent.select(F.col(pk_col).alias("_fk")).distinct(),
            "_fk",
            "left_anti",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orphan_rows"),
            F.countDistinct("_fk").cast("bigint").alias("n_orphan_keys"),
        )
    )
    j = tot.crossJoin(F.broadcast(orphans))
    denom = (F.col("n_child_rows") - F.col("n_null_fk")).cast("double")
    return j.select(
        "n_child_rows",
        "n_null_fk",
        "n_orphan_rows",
        "n_orphan_keys",
        F.round(
            F.when(denom > 0, F.col("n_orphan_rows").cast("double") / denom),
            ndigits,
        )
        .cast("double")
        .alias("orphan_frac"),
    )


def weighted_quantiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    qs: list[float],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Weighted lower quantiles per group: for each q, the smallest
    value whose cumulative weight reaches q · (total weight). The
    statistic a weighted corpus needs — after ``temperature_weights``
    or importance weighting, an unweighted median answers the wrong
    question (every document counts equally instead of by its
    sampling mass).

    The LOWER quantile (no interpolation) is chosen deliberately:
    the result is always an observed value, so determinism needs no
    float-midpoint contract, and the DuckDB replay is exact. Weights
    are quantized to DECIMAL(18,6) so cumulative sums are exact and
    tie-order inside equal values cannot flip the answer (the filter
    min(value | cum_weight ≥ target) only depends on each value
    run's FINAL cumulative weight). Rows with NULL or non-positive
    weight are excluded (a zero-weight row must not be electable as
    a quantile value), and so are NULL values (they could never be
    returned, but their weight would silently shift every target).

    One window (cumulative weight in value order) + one aggregate per
    group; the q's unpivot from one wide row — no second scan. Skew:
    the window partitions by group; a single giant group is the
    ordered-statistic's irreducible sort.

    Output: (group..., q, value), ordered by caller.
    """
    if not qs or not all(0.0 < q <= 1.0 for q in qs):
        raise ValueError("weighted_quantiles: each q must be in (0, 1]")
    keys = list(group_cols or [])
    w = F.col(weight_col).cast("decimal(18,6)")
    base = df.filter(
        F.col(weight_col).isNotNull()
        & (F.col(weight_col) > 0)
        & F.col(value_col).isNotNull()
    ).select(
        *keys,
        F.col(value_col).cast("double").alias("_v"),
        w.alias("_w"),
    )
    win = (
        Window.partitionBy(*keys)
        .orderBy(F.asc("_v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy(*keys)
    cw = base.withColumn("_cw", F.sum("_w").over(win)).withColumn(
        "_tw", F.sum("_w").over(tot)
    )
    picks = [
        F.min(
            F.when(
                F.col("_cw").cast("double")
                >= F.lit(float(q)) * F.col("_tw").cast("double"),
                F.col("_v"),
            )
        ).alias(f"_q{i}")
        for i, q in enumerate(qs)
    ]
    wide = cw.groupBy(*keys).agg(*picks)
    stack = ", ".join(
        f"CAST({q!r} AS DOUBLE), _q{i}" for i, q in enumerate(qs)
    )
    return wide.select(
        *keys,
        F.expr(f"stack({len(qs)}, {stack}) AS (q, value)"),
    )


def psi_drift(
    df: DataFrame,
    value_col: str,
    period_col: str,
    ref_label: str,
    cur_label: str,
    n_bins: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    period of ``value_col`` — THE industry drift metric for model
    inputs/scores: equi-depth bins from the REFERENCE distribution,
    then PSI = Σ_bins (q−p)·ln(q/p) with p/q the reference/current
    bin shares. Output one row per bin (``bin, n_ref, n_cur, p, q,
    psi_term``) plus the total ``psi`` repeated on each row
    (broadcast of a one-row aggregate). Rule of thumb: psi < 0.1
    stable, 0.1–0.25 drifting, > 0.25 shifted.

    Plan shape: ONE percentile aggregate over the reference builds
    the cut array (quantile_scores idiom — rounded cuts broadcast,
    bin assignment is a map-side fold; no NTILE, no global sort),
    one (bin)-keyed conditional aggregate counts both periods, and
    everything after is |bins|-bounded. Empty-on-either-side bins
    contribute 0 by convention (the CASE guard); ln goes through
    fquant (transcendental ulp discipline).
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    fracs = [i / n_bins for i in range(1, n_bins)]
    x = F.col(value_col).cast("double")
    ref = df.filter(F.col(period_col) == ref_label)
    cuts = ref.agg(
        F.transform(
            F.percentile(x, F.array(*[F.lit(f) for f in fracs])),
            lambda v: F.round(v, ndigits),
        ).alias("_cuts")
    )
    both = df.filter(
        F.col(period_col).isin([ref_label, cur_label]) & x.isNotNull()
    )
    binned = both.crossJoin(F.broadcast(cuts)).withColumn(
        "_bin",
        (
            F.lit(1)
            + F.aggregate(
                F.col("_cuts"),
                F.lit(0),
                lambda acc, cut: acc + F.when(x > cut, 1).otherwise(0),
            )
        ).cast("int"),
    )
    counts = binned.groupBy("_bin").agg(
        F.sum(F.when(F.col(period_col) == ref_label, 1).otherwise(0))
        .cast("bigint")
        .alias("n_ref"),
        F.sum(F.when(F.col(period_col) == cur_label, 1).otherwise(0))
        .cast("bigint")
        .alias("n_cur"),
    )
    tot = counts.agg(
        F.sum("n_ref").cast("bigint").alias("_tr"),
        F.sum("n_cur").cast("bigint").alias("_tc"),
    )
    from .stats import fquant

    j = counts.crossJoin(F.broadcast(tot))
    p = F.col("n_ref").cast("double") / F.col("_tr").cast("double")
    q = F.col("n_cur").cast("double") / F.col("_tc").cast("double")
    term = F.when(
        (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
        (q - p) * fquant(F.log(q / p), 9),
    ).otherwise(F.lit(0.0))
    detail = j.select(
        F.col("_bin").alias("bin"),
        "n_ref",
        "n_cur",
        F.round(p, ndigits).cast("double").alias("p"),
        F.round(q, ndigits).cast("double").alias("q"),
        F.round(term, ndigits).cast("double").alias("psi_term"),
    )
    total = detail.agg(
        F.round(
            F.aggregate(
                F.sort_array(F.collect_list("psi_term")),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ),
            ndigits,
        )
        .cast("double")
        .alias("psi")
    )
    return detail.crossJoin(F.broadcast(total))


def ngram_repetition(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 2,
    dup_n: int = 5,
    ndigits: int = 6,
) -> DataFrame:
    """Gopher-style intra-document repetition signals (Rae et al.
    2021, MassiveText quality filters §A1.1): per document,

    - ``top_frac`` — fraction of characters covered by the single
      most frequent word ``top_n``-gram (count × gram length /
      text length); ties on count break to the lexicographically
      smallest gram, so the output is a pure function of the text;
    - ``dup_frac`` — fraction of characters in duplicated
      ``dup_n``-grams (Σ count × gram length over grams occurring
      more than once / text length).

    Docs with fewer than ``dup_n`` words are dropped (no n-gram
    exists; a NULL metric would poison downstream threshold filters).

    Shape: n-grams are generated MAP-SIDE from the word array
    (``transform(sequence(...))`` — pure JVM, no Python, no
    self-join); each signal is two keyed aggregates on (doc, gram)
    then (doc); the argmax gram avoids a window via the max-count
    join-back. Word split is the Java∩RE2 class ``[^a-z0-9]+`` on
    the lowercased text so DuckDB replays it byte-for-byte.
    """
    if top_n < 1 or dup_n < 1:
        raise ValueError("n-gram sizes must be >= 1")
    base = df.filter(
        F.col(text_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(
        F.col(id_col).alias("_id"),
        F.length(text_col).cast("bigint").alias("_len"),
        F.expr(
            f"filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x != '')"
        ).alias("_w"),
    ).filter(F.size("_w") >= dup_n)

    def grams(n: int):
        return F.expr(
            f"transform(sequence(0, size(_w) - {n}), "
            f"i -> concat_ws(' ', slice(_w, i + 1, {n})))"
        )

    # (A single tagged explode carrying BOTH gram sizes through one
    # (id, n, gram) aggregate was A/B'd in r13 and LOST on the
    # standalone query — q298 noop 1.64 -> 2.32 s: the struct-tagged
    # array build + the wider combined hash aggregate cost more than
    # the saved second explode. The two-pass shape stays.)
    top_counts = (
        base.select("_id", F.explode(grams(top_n)).alias("_g"))
        .groupBy("_id", "_g")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    )
    # argmax gram as ONE per-doc aggregate: min(struct(-count, gram))
    # picks (count DESC, gram ASC) — exactly the old "max count, ties
    # break to the lexicographically smallest gram" law — replacing
    # the max-count aggregate + join-back (r13: 2 fewer Exchanges in
    # the top chain, the r12 langid-argmin pattern)
    top = top_counts.groupBy("_id").agg(
        F.min(
            F.struct(
                (-F.col("_c")).alias("_negc"), F.col("_g").alias("_g")
            )
        ).alias("_top")
    ).select(
        "_id",
        F.col("_top._g").alias("top_gram"),
        (-F.col("_top._negc")).cast("bigint").alias("_tc"),
    )
    dup = (
        base.select("_id", F.explode(grams(dup_n)).alias("_g"))
        .groupBy("_id", "_g")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
        .filter(F.col("_c") > 1)
        .groupBy("_id")
        .agg(
            F.sum(F.col("_c") * F.length("_g")).cast("bigint").alias("_dc")
        )
    )
    p6 = F.lit(float(10 ** ndigits))
    q6 = lambda c: (F.floor(c * p6 + F.lit(0.5)) / p6).cast("double")  # noqa: E731
    out = (
        base.select("_id", "_len", F.size("_w").cast("bigint").alias("n_words"))
        .join(top, "_id")
        .join(dup, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "n_words",
            "top_gram",
            q6(
                F.col("_tc").cast("double")
                * F.length("top_gram").cast("double")
                / F.col("_len").cast("double")
            ).alias("top_frac"),
            q6(
                F.coalesce(F.col("_dc"), F.lit(0)).cast("double")
                / F.col("_len").cast("double")
            ).alias("dup_frac"),
        )
    )
    return out


def exact_quantiles_scalable(
    df: DataFrame,
    value_col: str,
    probs: list[float],
    ndigits: int = 6,
) -> DataFrame:
    """CORPUS-SCALE exact type-7 quantiles — one output row per
    probability: ``(p, quantile)``.

    Why this exists next to ``percentile()`` (q102): Spark's exact
    percentile aggregate BUFFERS THE WHOLE GROUP in executor memory —
    right for bounded report groups, fatal for a corpus-wide quantile
    at 100 TB. This operator never buffers: rows collapse to the
    DISTINCT-VALUE frequency table (one hash shuffle), the inclusive
    running count comes from the range-partitioned two-pass cumsum
    (``operators/ids.running_totals``), and each requested quantile
    is located by a containment predicate against the broadcast
    probability table — the k-th and (k+1)-th order statistics are
    exact lookups, interpolated with the same type-7 arithmetic
    ``percentile``/``quantile_cont`` use:

        h = (n−1)·p + 1 (1-based);  result = v_lo + (h−⌊h⌋)(v_hi−v_lo)

    Determinism: counts are integers; h and the interpolation are one
    fixed IEEE expression over them — DuckDB replays it verbatim.
    NULL values are excluded.
    """
    for p in probs:
        if not 0.0 <= float(p) <= 1.0:
            raise ValueError(f"prob {p} outside [0, 1]")
    if not probs:
        raise ValueError("probs must be non-empty")
    from .ids import running_totals

    vt = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("_v"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("_t"))
    )
    cum = running_totals(vt, ["_v"], "_t", cum_col="_cum")
    n = vt.agg(F.sum("_t").cast("bigint").alias("_n"))
    spark = df.sparkSession
    pdf = spark.createDataFrame(
        [(float(p),) for p in sorted(set(float(p) for p in probs))],
        "p double",
    )
    pos = pdf.crossJoin(F.broadcast(n)).select(
        "p",
        "_n",
        ((F.col("_n") - 1).cast("double") * F.col("p") + 1.0).alias("_h"),
    ).select(
        "p",
        "_n",
        "_h",
        F.floor("_h").cast("bigint").alias("_lo"),
        F.ceil("_h").cast("bigint").alias("_hi"),
    )
    j = cum.crossJoin(F.broadcast(pos))
    contains = lambda k: (k >= F.col("_cum") - F.col("_t") + 1) & (  # noqa: E731
        k <= F.col("_cum")
    )
    picked = j.groupBy("p", "_h").agg(
        F.max(
            F.when(contains(F.col("_lo")), F.col("_v").cast("double"))
        ).alias("_vlo"),
        F.max(
            F.when(contains(F.col("_hi")), F.col("_v").cast("double"))
        ).alias("_vhi"),
    )
    p6 = F.lit(float(10 ** ndigits))
    q = (
        F.col("_vlo")
        + (F.col("_h") - F.floor("_h"))
        * (F.col("_vhi") - F.col("_vlo"))
    )
    return picked.select(
        "p",
        (F.floor(q * p6 + F.lit(0.5)) / p6)
        .cast("double")
        .alias("quantile"),
    ).orderBy("p")


def word_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ndigits: int = 6,
) -> DataFrame:
    """Per-document unigram (word-distribution) Shannon entropy in
    nats — the template/boilerplate detector that complements
    :func:`ngram_repetition`: near-zero entropy means the document is
    a handful of tokens repeated. One row per doc:
    ``(id, n_words, n_distinct, entropy)``.

    H = ln(n) − (Σ_w c_w·ln c_w)/n over the per-doc word counts.
    Engine-exactness (the q273 quantize-then-decimal-sum discipline):
    each ln c floor-quantizes at 1e-9 — pure IEEE, identical both
    engines — and rides an exact DECIMAL product/sum (c is an
    integer), so the corpus-sized reduction is associative; ln(n) and
    the final division happen once per doc. Same word splitter as
    ngram_repetition (Java∩RE2 ``[^a-z0-9]+`` on lowercased text).
    Docs with no words are dropped.
    """
    base = df.filter(
        F.col(text_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.expr(
                f"filter(split(lower({text_col}), '[^a-z0-9]+'),"
                " x -> x != '')"
            )
        ).alias("_w"),
    )
    wc = base.groupBy("_id", "_w").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    # ln c floor-quantized at 1e-9, carried exactly: c · fq(ln c)
    # as DECIMAL(38,9)
    flnc = (
        F.floor(F.log(F.col("_c").cast("double")) * 1e9).cast("decimal(29,0)")
    )
    per_doc = wc.groupBy("_id").agg(
        F.sum("_c").cast("bigint").alias("n_words"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum(F.col("_c").cast("decimal(19,0)") * flnc).alias("_sclnc"),
    )
    n = F.col("n_words").cast("double")
    h = F.log(n) - F.col("_sclnc").cast("double") / F.lit(1e9) / n
    p6 = F.lit(float(10 ** ndigits))
    return per_doc.select(
        F.col("_id").alias(id_col),
        "n_words",
        "n_distinct",
        (F.floor(h * p6 + F.lit(0.5)) / p6).cast("double").alias("entropy"),
    )


def vocabulary_growth(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    buckets: int = 20,
    id_lo: int | None = None,
    id_hi: int | None = None,
) -> DataFrame:
    """Vocabulary-saturation (Heaps'-law) census: cumulative corpus
    token count vs cumulative DISTINCT-word count along the corpus
    order, reported at ``buckets`` equal-width id milestones. The
    growth curve V(N) ~ K·N^beta is the standard corpus-health probe
    (a flattening curve means new data stops adding vocabulary —
    dedup/curation feedback at a glance).

    Cumulative COUNT(DISTINCT) is not windowable, so the plan uses the
    first-occurrence trick: a word contributes to the bucket of its
    MINIMUM doc id — one keyed aggregate over the exploded words, one
    tiny cumulative window over ``buckets`` rows. Token mass per
    bucket is map-side (size of the split array). No all-corpus
    window, no driver loop; both aggregates shuffle once.

    ``id_lo``/``id_hi`` optionally pin the bucket domain to an
    EXPLICIT half-open id range [id_lo, id_hi) instead of the data's
    own min/max(+1) — the streaming twin's contract
    (streaming/vocab_stream maintains the same counters under a
    static domain declared at init, so streamed == batch requires
    both to bucket identically).

    Returns (bucket, n_docs, tokens_cum, vocab_cum) — all exact
    integers, one row per non-empty bucket."""
    from pyspark.sql import Window

    if (id_lo is None) != (id_hi is None):
        raise ValueError("pass both id_lo and id_hi, or neither")
    if id_lo is not None:
        bounds = df.sparkSession.range(1).select(
            F.lit(int(id_lo)).alias("_lo"),
            F.lit(int(id_hi)).alias("_hi"),
        )
    else:
        bounds = df.select(
            F.min(F.col(id_col)).alias("_lo"),
            (F.max(F.col(id_col)) + 1).alias("_hi"),
        )
    base = df.crossJoin(F.broadcast(bounds)).select(
        F.col(id_col).alias("_id"),
        F.floor(
            (F.col(id_col) - F.col("_lo")).cast("bigint") * buckets
            / (F.col("_hi") - F.col("_lo"))
        ).cast("int").alias("_bucket"),
        F.split(F.trim(F.col(text_col)), " ").alias("_ws"),
    )
    toks = base.select(
        "_id", "_bucket", F.explode("_ws").alias("_w")
    ).filter(F.col("_w") != "")
    first = (
        toks.groupBy("_w")
        .agg(F.min("_bucket").alias("_fb"))
        .groupBy("_fb")
        .agg(F.count("*").alias("_new_words"))
        .withColumnRenamed("_fb", "_bucket")
    )
    per_bucket = base.groupBy("_bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            F.size(F.filter("_ws", lambda w: w != ""))
        ).alias("_toks"),
    )
    w = Window.orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per_bucket.join(first, "_bucket", "left")
        .select(
            F.col("_bucket").alias("bucket"),
            "n_docs",
            F.sum("_toks").over(w).cast("bigint").alias("tokens_cum"),
            F.sum(F.coalesce("_new_words", F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("vocab_cum"),
        )
    )


def dataset_datasheet(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
    chars_col: str = "n_chars",
) -> DataFrame:
    """One-call corpus datasheet (Gebru et al., "Datasheets for
    Datasets"): the per-language summary a dataset release ships —
    volume (docs/tokens/chars), provenance breadth (distinct
    sources), length profile (min/max/mean tokens), vocabulary size,
    and exact-duplicate exposure (docs sharing an md5(text) within
    the language, and how many a dedup pass would remove).

    Three per-language aggregates joined on the language key: the
    doc census (one pass over the scan), the duplicate profile (one
    (lang, content-hash) aggregate then a per-lang rollup), and the
    vocabulary count (word explode → COUNT(DISTINCT)). Everything is
    exact integers except mean_tokens/dup_rate (single divisions,
    round-4/-6).

    Returns one row per language, sorted consumers should ORDER BY
    the language column."""
    ntok = F.size(
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"),
            lambda w: w != "",
        )
    )
    base = df.select(
        F.col(lang_col).alias("_lang"),
        F.col(source_col).alias("_src"),
        F.col(chars_col).alias("_nc"),
        ntok.alias("_nt"),
        F.md5(F.col(text_col)).alias("_h"),
        F.col(text_col).alias("_text"),
    )
    census = base.groupBy("_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("_src").cast("bigint").alias("n_sources"),
        F.sum("_nt").cast("bigint").alias("n_tokens"),
        F.sum("_nc").cast("bigint").alias("n_chars"),
        F.min("_nt").cast("bigint").alias("min_tokens"),
        F.max("_nt").cast("bigint").alias("max_tokens"),
    )
    dup = (
        base.groupBy("_lang", "_h")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("_lang")
        .agg(
            F.sum(F.when(F.col("_c") > 1, F.col("_c")).otherwise(0))
            .cast("bigint")
            .alias("dup_docs"),
            F.sum(F.col("_c") - 1).cast("bigint").alias(
                "removable_docs"
            ),
        )
    )
    vocab = (
        base.select(
            "_lang", F.explode(F.split(F.trim("_text"), r"\s+")).alias("_w")
        )
        .filter(F.col("_w") != "")
        .groupBy("_lang")
        .agg(F.countDistinct("_w").cast("bigint").alias("distinct_words"))
    )
    # Left joins: a language whose documents are all empty/whitespace
    # has no vocab row (and dup/census always exist per census key) —
    # it must still appear in the datasheet with distinct_words = 0,
    # honoring the one-row-per-language contract.
    return (
        census.join(dup, "_lang", "left")
        .join(vocab, "_lang", "left")
        .select(
            F.col("_lang").alias(lang_col),
            "n_docs",
            "n_sources",
            "n_tokens",
            "n_chars",
            "min_tokens",
            "max_tokens",
            F.round(
                F.col("n_tokens").cast("double")
                / F.col("n_docs").cast("double"),
                4,
            ).alias("mean_tokens"),
            F.coalesce(
                F.col("distinct_words"), F.lit(0).cast("bigint")
            ).alias("distinct_words"),
            F.coalesce(F.col("dup_docs"), F.lit(0).cast("bigint")).alias(
                "dup_docs"
            ),
            F.coalesce(
                F.col("removable_docs"), F.lit(0).cast("bigint")
            ).alias("removable_docs"),
            F.round(
                F.coalesce(F.col("removable_docs"), F.lit(0))
                .cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("dup_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Gopher quality rules — the NON-repetition half (Rae et al. 2021,
# MassiveText §A1.1; the FineWeb/Dolma reimplementations). The
# repetition half is ngram_repetition (q298).
# ---------------------------------------------------------------------------
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """The published Gopher rule set minus repetition, ONE map-only
    wide conditional profile per document (the q128 shape — no
    shuffle at all; every signal is a JVM array expression over the
    whitespace word list / newline line list):

    - ``n_words`` ∈ [min_words, max_words];
    - ``mean_word_len`` ∈ [3, 10];
    - ``symbol_ratio`` — ('#' occurrences + '…' + '...' occurrence
      count) / words ≤ 0.1;
    - ``bullet_frac`` — lines starting with '- ', '* ' or '•' ≤ 0.9;
    - ``ellipsis_frac`` — lines ending with '...' or '…' ≤ 0.3;
    - ``alpha_frac`` — words containing ≥ 1 [A-Za-z] char ≥ 0.8;
    - ``stop_hits`` — distinct hits among the 8 canonical Gopher
      stopwords (lowercased words) ≥ 2.

    Fractions are stable_round6 doubles and every rule flag is
    decided ON the rounded value, so the verdicts replay exactly in
    DuckDB. Division is NULLIF-guarded; a doc with zero words fails
    the word-count rule and carries 0.0 fractions. At 100 TB the
    pass is a pure scan: no aggregate, no explode, nothing keyed.
    """
    from .similarity import stable_round6

    w = "filter(split(trim({t}), '\\\\s+'), x -> x != '')".format(t=text_col)
    lines = (
        "filter(transform(split({t}, '\\n'), l -> trim(l)),"
        " l -> l != '')"
    ).format(t=text_col)
    base = df.filter(
        F.col(text_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(
        F.col(id_col),
        F.col(text_col).alias("_txt"),
        F.expr(w).alias("_w"),
        F.expr(lines).alias("_ln"),
    ).select(
        id_col,
        F.size("_w").cast("bigint").alias("n_words"),
        F.expr(
            "aggregate(_w, cast(0 as bigint), (a, x) -> a + length(x))"
        ).alias("_wchars"),
        (
            F.length("_txt")
            - F.length(F.replace(F.col("_txt"), F.lit("#"), F.lit("")))
        ).cast("bigint").alias("_hash_cnt"),
        (
            (
                F.length("_txt")
                - F.length(
                    F.replace(F.col("_txt"), F.lit("..."), F.lit(""))
                )
            )
            / F.lit(3)
            + (
                F.length("_txt")
                - F.length(
                    F.replace(F.col("_txt"), F.lit("…"), F.lit(""))
                )
            )
        ).alias("_ell_cnt"),
        F.size("_ln").cast("bigint").alias("n_lines"),
        F.expr(
            "size(filter(_ln, l -> startswith(l, '- ') or"
            " startswith(l, '* ') or startswith(l, '•')))"
        ).cast("bigint").alias("_bullet_lines"),
        F.expr(
            "size(filter(_ln, l -> endswith(l, '...') or"
            " endswith(l, '…')))"
        ).cast("bigint").alias("_ellipsis_lines"),
        F.expr(
            "size(filter(_w, x -> x rlike '[A-Za-z]'))"
        ).cast("bigint").alias("_alpha_words"),
        sum(
            (
                F.array_contains(
                    F.expr("transform(_w, x -> lower(x))"), F.lit(s)
                ).cast("int")
            )
            for s in GOPHER_STOPWORDS
        ).cast("int").alias("stop_hits"),
    )
    nw = F.col("n_words").cast("double")
    nl = F.col("n_lines").cast("double")
    mean_wl = stable_round6(
        F.col("_wchars").cast("double") / F.nullif(nw, F.lit(0.0))
    )
    sym = stable_round6(
        (F.col("_hash_cnt").cast("double") + F.col("_ell_cnt"))
        / F.nullif(nw, F.lit(0.0))
    )
    bullet = stable_round6(
        F.col("_bullet_lines").cast("double") / F.nullif(nl, F.lit(0.0))
    )
    ellipsis = stable_round6(
        F.col("_ellipsis_lines").cast("double") / F.nullif(nl, F.lit(0.0))
    )
    alpha = stable_round6(
        F.col("_alpha_words").cast("double") / F.nullif(nw, F.lit(0.0))
    )
    sig = base.select(
        id_col,
        "n_words",
        F.coalesce(mean_wl, F.lit(0.0)).alias("mean_word_len"),
        F.coalesce(sym, F.lit(0.0)).alias("symbol_ratio"),
        "n_lines",
        F.coalesce(bullet, F.lit(0.0)).alias("bullet_frac"),
        F.coalesce(ellipsis, F.lit(0.0)).alias("ellipsis_frac"),
        F.coalesce(alpha, F.lit(0.0)).alias("alpha_frac"),
        "stop_hits",
    )
    flags = {
        "pass_words": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "pass_mean_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "pass_symbol": F.col("symbol_ratio") <= max_symbol_ratio,
        "pass_bullet": F.col("bullet_frac") <= max_bullet_frac,
        "pass_ellipsis": F.col("ellipsis_frac") <= max_ellipsis_frac,
        "pass_alpha": F.col("alpha_frac") >= min_alpha_frac,
        "pass_stopwords": F.col("stop_hits") >= min_stopword_hits,
    }
    gopher = None
    for c in flags.values():
        gopher = c if gopher is None else (gopher & c)
    return sig.select(
        id_col,
        "n_words",
        "mean_word_len",
        "symbol_ratio",
        "n_lines",
        "bullet_frac",
        "ellipsis_frac",
        "alpha_frac",
        "stop_hits",
        *[c.cast("int").alias(name) for name, c in flags.items()],
        gopher.cast("int").alias("gopher_pass"),
    )
