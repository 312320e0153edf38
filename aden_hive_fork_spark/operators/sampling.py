"""Training-data sampling & curation operators (§2.D extension tier).

The reference has no sampling operators; these are the driver-mandated
large-scale-training-pipeline extensions (same family as dedup /
similarity): every serious corpus pipeline needs REPRODUCIBLE
sampling, splitting, balancing, and benchmark-contamination checks.

Design rules, all 100 TB-safe:

- **Determinism over RNG.** `sample()`/`rand()` give different rows
  per run, per partitioning, per Spark version — useless for a
  training corpus that must be re-derivable. Every operator here is
  content-hash-driven (md5 of the key, a salt for independent
  resamples) or order-driven (explicit sort keys): same input, same
  sample, on any cluster shape. md5 was chosen over xxhash64 because
  both Spark and DuckDB implement it identically, so the oracle can
  verify the EXACT sample membership, not just its size.
- **Map-side where possible.** Hash bucketing/splitting is a pure
  projection — no shuffle, pushdown-friendly. Quota sampling is one
  window per group key; class weights are one tiny aggregate joined
  back via broadcast.
- **Contamination: broadcast the benchmark.** Eval/benchmark sets are
  small by nature; the corpus never shuffles — candidates stream
  map-side against the broadcast benchmark shingle sets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hash_bucket(key: Column | str, buckets: int = 100, salt: str = "") -> Column:
    """Deterministic bucket in [0, buckets) from the md5 of the key.

    The first 8 hex digits give 32 uniform bits — ample for bucket
    assignment; md5 (not xxhash64) so DuckDB can replay the exact
    arithmetic (``('0x' || substr(md5(..), 1, 8))::UBIGINT %
    buckets``). ``salt`` decorrelates independent samples drawn from
    the same keys.
    """
    key = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % buckets).alias(
        "bucket"
    )


def hash_sample(
    df: DataFrame, key_col: str, percent: int, salt: str = ""
) -> DataFrame:
    """Keep ~percent% of rows, membership decided per-key by content
    hash: reproducible on any cluster, stable under repartitioning,
    and consistent across tables sharing the key (sample orders and
    their lineitems agree). Pure filter projection — no shuffle, and
    Catalyst pushes surviving-column pruning to the scan."""
    return df.filter(hash_bucket(key_col, 100, salt) < percent)


def train_test_split(
    df: DataFrame, key_col: str, test_percent: int = 20, salt: str = ""
) -> DataFrame:
    """Add a ``split`` column ('train' / 'test') by key hash — the
    reproducible corpus split: a document lands in the same split on
    every run and every engine, so eval can never leak into training
    by nondeterminism. Map-side projection, no shuffle."""
    return df.withColumn(
        "split",
        F.when(hash_bucket(key_col, 100, salt) < test_percent, "test").otherwise(
            "train"
        ),
    )


def quota_sample(
    df: DataFrame,
    group_cols: list[str],
    n_per_group: int,
    order_cols: list[Column | str],
) -> DataFrame:
    """At most ``n_per_group`` rows per group, chosen by an EXPLICIT
    deterministic order (pass unique tie-breakers). The per-source /
    per-domain cap every web-scale corpus applies so one domain can't
    dominate training. One shuffle (the window partition); at 100 TB
    group skew is AQE's problem, not a crash."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= n_per_group)
    )


def class_weights(df: DataFrame, class_col: str, ndigits: int = 6) -> DataFrame:
    """Inverse-frequency class weights: weight(c) = N / (K * n_c),
    the standard balanced-training reweighting (mean PER-ROW weight
    1.0: every class contributes equal total weight N/K). Two tiny
    aggregates; joining weights back onto a corpus is a broadcast
    join of K rows."""
    counts = df.groupBy(class_col).agg(F.count(F.lit(1)).alias("n"))
    totals = counts.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("k")
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        class_col,
        F.col("n").alias("n_rows"),
        F.round(
            F.col("total").cast("double")
            / (F.col("k") * F.col("n")).cast("double"),
            ndigits,
        ).alias("weight"),
    )


def contamination_pairs(
    candidates: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_overlap: int = 2,
) -> DataFrame:
    """(candidate, benchmark) pairs sharing >= min_overlap k-word
    shingles — the decontamination pass that keeps eval data out of a
    training corpus.

    Scale shape: the benchmark is SMALL (an eval suite), so its
    shingle sets broadcast and candidates are scored MAP-SIDE — the
    corpus is never shuffled and no inverted index is materialized.
    A UNION-shingle prefilter runs first: overlap(cand, union of all
    benchmark shingles) >= min_overlap is a NECESSARY condition for
    overlap with any single benchmark doc, so the per-benchmark
    intersects (|bench| of them per row) only run on candidates that
    already cleared one cheap intersect — on a mostly-clean corpus
    that is a |bench|× reduction of the dominant cost. Returns
    (id, bench_id, n_overlap); shingling reuses the dedup tier's
    pure-JVM ``shingles_col``.
    """
    from .dedup import shingles_col

    # Widen BEFORE shingling (r12): a small single-split parquet scan
    # otherwise pins the shingle projection and both per-row
    # intersects to ONE task (measured: every q98 stage ran 1/32
    # cores). widen_for_map is conditional (an already-wide cluster
    # scan is untouched) and a no-op on streaming frames; placement
    # cannot change the map-side scores.
    from .dedup import widen_for_map

    candidates = widen_for_map(candidates, id_col)
    cand = candidates.select(
        F.col(id_col).alias("id"), shingles_col(text_col, k).alias("sh")
    )
    bench = benchmark.select(
        F.col(id_col).alias("bench_id"), shingles_col(text_col, k).alias("bsh")
    )
    union_sh = bench.agg(
        F.array_distinct(F.flatten(F.collect_list("bsh"))).alias("all_bsh")
    )
    prefiltered = (
        cand.crossJoin(F.broadcast(union_sh))
        .filter(F.size(F.array_intersect("sh", "all_bsh")) >= min_overlap)
        .drop("all_bsh")
    )
    overlap = F.size(F.array_intersect("sh", "bsh"))
    return (
        prefiltered.crossJoin(F.broadcast(bench))
        .select("id", "bench_id", overlap.alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    partition_cols: list[str],
    order_cols: list[Column | str],
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid out in a
    deterministic order and cut into fixed token-budget chunks —
    chunk_id = floor(start_offset / budget) where start_offset is the
    running token total before the document. This IS how pretraining
    batches are packed (concatenate corpus, slice every ``budget``
    tokens); a document straddling a boundary belongs to the chunk its
    first token lands in.

    Packing runs WITHIN ``partition_cols`` (shard/source): a running
    total is a window, and an unpartitioned window is a single-task
    bottleneck at 100 TB. Real pipelines pack per shard anyway; a
    corpus-global layout would two-pass it (per-shard totals, then a
    broadcast prefix-sum of shard offsets composed onto the same
    per-shard window).

    Adds: ``chunk_id`` (int, per partition), ``chunk_offset`` (tokens
    into the chunk where the doc starts).
    """
    # ROWS frame, not the default RANGE frame: RANGE sums ALL peers of
    # a tied order key into every tied row's running total, which
    # would overlap chunk layouts whenever order_cols are not unique.
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(F.col(token_col)).over(w) - F.col(token_col)).alias("_start")
    out = df.withColumn("_start", start)
    return (
        out.withColumn(
            "chunk_id", F.expr(f"CAST(_start div {int(budget)} AS INT)")
        )
        .withColumn(
            "chunk_offset", F.expr(f"CAST(_start % {int(budget)} AS BIGINT)")
        )
        .drop("_start")
    )


def es_key(key: Column | str, weight: Column, salt: str = "") -> Column:
    """Efraimidis-Spirakis weighted-sampling rank key: with
    u = uniform(0,1) derived from the md5 content hash, the items
    with the LARGEST u^(1/w) form an exact weighted sample without
    replacement. We rank by the monotone-equivalent ln(u)/w (no pow
    precision hazard); ties are impossible in practice and broken by
    key downstream. md5-derived u keeps the whole construction
    DuckDB-replayable and repartition-stable, like hash_bucket."""
    key = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    u32 = F.conv(F.substring(h, 1, 8), 16, 10).cast("double")
    u = (u32 + 1.0) / 4294967297.0  # (2^32 + 1): u in (0, 1) exclusive
    return F.log(u) / weight


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Exact weighted sample WITHOUT replacement of size k (the
    published A-ES scheme): inclusion probability tracks weight, the
    sample is deterministic in the content hash (reproducible on any
    cluster shape, stable under repartitioning), and a different
    ``salt`` draws an independent sample. Rows with non-positive or
    NULL weight are excluded. Top-k compiles to
    TakeOrderedAndProject — no global sort materializes."""
    r = es_key(key_col, F.col(weight_col).cast("double"), salt)
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("_es", r)
        .orderBy(F.desc("_es"), F.col(key_col))
        .limit(k)
        .drop("_es")
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Per-group A-ES sample: k rows per group, one window pass
    (rank on the ES key desc, key tiebreak). The quota-sampling
    twin for weighted draws."""
    from pyspark.sql.window import Window

    r = es_key(key_col, F.col(weight_col).cast("double"), salt)
    w = Window.partitionBy(group_col).orderBy(
        F.desc("_es"), F.col(key_col)
    )
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("_es", r)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_es", "_rk")
    )


def temperature_weights(
    df: DataFrame,
    class_col: str,
    alpha: float,
    ndigits: int = 6,
) -> DataFrame:
    """Mixture-temperature reweighting (the multilingual-pretraining
    sampling rule: draw class c with probability ∝ p_c^alpha;
    alpha < 1 upweights rare classes, alpha = 1 is natural, alpha = 0
    is uniform-over-classes). Emits per-row ``weight`` =
    (p_c)^(alpha-1) normalized so the mean per-ROW weight is exactly
    1.0 at ``ndigits`` rounding — feed straight into
    ``weighted_sample`` for a temperature-mixed corpus draw."""
    counts = df.groupBy(class_col).agg(F.count(F.lit(1)).alias("_n"))
    total = df.count()
    raw = F.pow(F.col("_n") / F.lit(float(total)), alpha - 1.0)
    # normalizer: sum over classes of n_c * raw_c == total * mean
    norm = counts.select(
        F.sum(F.col("_n") * F.pow(F.col("_n") / F.lit(float(total)),
                                  alpha - 1.0)).alias("_z")
    )
    weights = counts.crossJoin(F.broadcast(norm)).select(
        class_col,
        F.round(raw * F.lit(float(total)) / F.col("_z"), ndigits).alias(
            "weight"
        ),
    )
    return df.join(F.broadcast(weights), class_col)


def kfold_assign(
    df: DataFrame, key_col: str, k: int = 5, salt: str = ""
) -> DataFrame:
    """Append ``fold`` ∈ [0, k): deterministic k-fold cross-validation
    assignment from the content hash of the key — the same
    reproducibility contract as ``train_test_split`` (repartition-
    stable, key-consistent across tables, salt gives an independent
    folding). Map-side projection: no shuffle, no state; fold i's
    training set is ``fold != i`` — no materialized copies of the
    data, just complementary filters the optimizer pushes to the
    scan."""
    if k < 2:
        raise ValueError("k must be >= 2")
    return df.withColumn("fold", hash_bucket(key_col, k, salt).cast("int"))


def token_budget_sample(
    df: DataFrame,
    cost_col: str,
    budget: int,
    group_cols: list[str],
    id_cols: list[str],
    salt: str = "",
) -> DataFrame:
    """Deterministic per-group budget capping: keep rows, in
    content-hash order, until the group's cumulative ``cost_col``
    (tokens, chars, bytes) would exceed ``budget`` — the "at most N
    tokens per source/domain" primitive every corpus mixing recipe
    needs (a cap on raw row COUNT under-represents long documents;
    the cap must be on cost).

    Membership is re-derivable on any cluster shape: rows are ordered
    by ``md5(salt || id)`` with the ids as tie-break (the same
    hash-order discipline as ``quota_sample``), so the kept set is a
    pure function of content, and a DIFFERENT ``salt`` draws an
    independent cap sample. A row is kept iff the total cost BEFORE
    it in hash order is < budget — i.e. the minimal hash-order prefix
    that covers the budget. The kept total may therefore overshoot by
    at most one document (this operator caps membership; byte-exact
    intra-document truncation is ``chunking``'s job), and a group is
    never emptied by one giant head-of-order document. Keep-iff-
    preceding<budget is self-consistent: the running total is
    monotone, so every row before a kept row is itself kept.

    Appends ``cum_cost`` (the running kept-total in hash order,
    including the row itself) for auditability.

    Scale: one shuffle keyed on ``group_cols``; the per-group
    hash-order sort inside the window is the irreducible cost of a
    sequential budget. With few giant groups (the common shape:
    10-1000 sources), parallelism within a group comes from the sort
    itself, not the cumsum; if a single group dwarfs executor memory,
    pre-shard it (``hash_bucket`` on the id into S shards, budget/S
    per shard) — same membership law, fully parallel, at the cost of
    <S documents of budget slack.
    """
    order_h = F.md5(
        F.concat_ws("|", F.lit(salt), *[F.col(c).cast("string") for c in id_cols])
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order_h.asc(), *[F.col(c).asc() for c in id_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn(
        "cum_cost", F.sum(F.col(cost_col).cast("bigint")).over(w)
    )
    return out.filter(
        F.col("cum_cost") - F.col(cost_col).cast("bigint") < F.lit(int(budget))
    )


def mixture_resample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    targets: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Downsample to a target group mixture: keep a deterministic
    subset whose group proportions approximate ``targets`` at the
    LARGEST total the data allows without upsampling — the
    "rebalance the corpus to 30% web / 30% code / 40% books" step
    that follows ``temperature_weights`` when the recipe needs a
    materialized corpus rather than per-row weights.

    T = min_g(n_g / p_g) is the largest total where every group can
    supply its share; each group keeps rate_g = p_g * T / n_g of its
    rows (the binding group keeps everything), membership decided by
    md5-fraction of the key — reproducible on any cluster shape,
    consistent across tables sharing the key, and exactly replayable
    by the oracle (hash threshold + rate arithmetic are the same IEEE
    double ops in both engines). Kept counts are hash-binomial around
    p_g*T, not exact — the tradeoff for a shuffle-free membership
    test (exact counts would need a per-group window sort; use
    ``quota_sample`` when exactness beats throughput).

    Groups absent from ``targets`` are DROPPED (a mixture definition
    is exhaustive by intent); target groups absent from the data
    cannot bind T and contribute nothing. Appends ``keep_rate`` for
    auditability.

    Scale: one tiny group-count aggregate (|groups| rows — bounded by
    the mixture definition, broadcast-joined back), then a map-side
    filter. The corpus itself never shuffles.
    """
    if not targets:
        raise ValueError("mixture_resample: targets must be non-empty")
    for g, p in targets.items():
        if not (p > 0):
            raise ValueError(f"mixture_resample: target for {g!r} must be > 0")
    tot = sum(targets.values())
    if abs(tot - 1.0) > 1e-6:
        raise ValueError(
            f"mixture_resample: targets must sum to 1 (got {tot:.6f})"
        )
    spark = df.sparkSession
    tgt = spark.createDataFrame(
        [(g, float(p)) for g, p in sorted(targets.items())],
        f"{group_col} string, _p double",
    )
    cnt = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    # inner join: groups outside the mixture are dropped by contract
    gstats = cnt.join(F.broadcast(tgt), group_col)
    tmax = gstats.agg(
        F.min(F.col("_n").cast("double") / F.col("_p")).alias("_T")
    )
    rates = (
        gstats.crossJoin(F.broadcast(tmax))
        .select(
            group_col,
            (
                F.col("_p") * F.col("_T") / F.col("_n").cast("double")
            ).alias("keep_rate"),
        )
    )
    frac = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("double") / F.lit(4294967296.0)
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(frac < F.col("keep_rate"))
    )


def contrastive_negatives(
    df: DataFrame,
    key_col: str,
    label_col: str,
    k: int = 4,
    num_buckets: int | None = None,
    anchor_filter: Column | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for
    each anchor row, ``k`` pseudo-random companions with a DIFFERENT
    label (cross-lingual pairs, cross-domain pairs, non-duplicate
    counterexamples for a dedup classifier).

    The naive draw is an all-pairs join; this never builds it. Every
    row lands in one of ``num_buckets`` hash buckets
    (``hash_bucket`` — md5, so DuckDB replays the assignment), an
    anchor draws only from ITS OWN bucket, and within the bucket the
    k survivors are the smallest md5(anchor|candidate) — a per-pair
    hash ring, so the choice is a pure function of content:
    repartition-stable, cluster-shape-independent, and a different
    ``salt`` is an independent redraw. Join volume is
    n·(n/num_buckets) — bounded by the bucket size the caller picks,
    not n². Self-pairs are excluded by the label filter (an anchor
    shares its own label).

    Per-anchor output is min(k, cross-label rows in its bucket):
    size buckets at ≥ ~8·k expected candidates (num_buckets ≈
    n / (8k)) so shortfalls are rare; they are not backfilled from
    other buckets (backfill would make membership depend on global
    ordering — the determinism contract loses). When ``num_buckets``
    is None it is sized from one count() of the input — pass it
    explicitly in pipelines that must avoid the extra job.

    ``anchor_filter`` restricts which rows get negatives (e.g. only
    the current training shard) — candidates still come from the
    whole input. Output: (anchor_key, neg_key, neg_label, rank),
    rank 1..k in hash-ring order.
    """
    if k < 1:
        raise ValueError("contrastive_negatives: k must be >= 1")
    if num_buckets is None:
        n = df.count()
        num_buckets = max(1, n // max(32, 8 * k))
    cand = df.select(
        F.col(key_col).alias("_nk"),
        F.col(label_col).alias("_nl"),
        hash_bucket(F.col(key_col), num_buckets, salt).alias("_b"),
    )
    anch = df
    if anchor_filter is not None:
        anch = anch.filter(anchor_filter)
    anch = anch.select(
        F.col(key_col).alias("_ak"),
        F.col(label_col).alias("_al"),
        hash_bucket(F.col(key_col), num_buckets, salt).alias("_b"),
    )
    ring = F.md5(
        F.concat(
            F.lit(salt),
            F.col("_ak").cast("string"),
            F.lit("|"),
            F.col("_nk").cast("string"),
        )
    )
    w = Window.partitionBy("_ak").orderBy(ring.asc(), F.col("_nk").asc())
    return (
        anch.join(cand, "_b")
        .filter(F.col("_nl") != F.col("_al"))
        .withColumn("_rnk", F.row_number().over(w))
        .filter(F.col("_rnk") <= k)
        .select(
            F.col("_ak").alias("anchor_key"),
            F.col("_nk").alias("neg_key"),
            F.col("_nl").alias("neg_label"),
            F.col("_rnk").cast("int").alias("rank"),
        )
    )


def decontaminate_split(
    split_df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    split_col: str = "split",
    test_label: str = "test",
    train_label: str = "train",
    score_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Near-duplicate-aware split decontamination: any TRAIN row that
    near-duplicates a TEST row (per a symmetric candidate ``pairs``
    table of (id_a, id_b[, score])) is dropped from training — the
    step that keeps eval leakage out even when exact-hash splitting
    (train_test_split) is clean but near-dups straddle the boundary.

    Returns ``(clean, dropped_report)``: ``clean`` is split_df minus
    the contaminated train rows; the report has one row per dropped
    train id with ``n_test_matches`` and (when ``score_col`` given)
    ``min_<score>``. Scale shape: the pair table is the banded
    near-dup output (never all-pairs); both directions union, two
    co-keyed joins against the split map, one keyed aggregate — no
    corpus self-join here.
    """
    base_cols = ["id_a", "id_b"] + ([score_col] if score_col else [])
    sym = pairs.select(*base_cols).unionByName(
        pairs.select(
            F.col("id_b").alias("id_a"),
            F.col("id_a").alias("id_b"),
            *([F.col(score_col)] if score_col else []),
        )
    )
    s = split_df.select(F.col(id_col), F.col(split_col))
    flagged = (
        sym.join(
            s.select(
                F.col(id_col).alias("id_a"), F.col(split_col).alias("_sa")
            ),
            "id_a",
        )
        .join(
            s.select(
                F.col(id_col).alias("id_b"), F.col(split_col).alias("_sb")
            ),
            "id_b",
        )
        .filter(
            (F.col("_sa") == train_label) & (F.col("_sb") == test_label)
        )
    )
    aggs = [F.count(F.lit(1)).cast("int").alias("n_test_matches")]
    if score_col:
        aggs.append(F.min(score_col).alias(f"min_{score_col}"))
    report = flagged.groupBy(F.col("id_a").alias(id_col)).agg(*aggs)
    clean = split_df.join(
        report.select(id_col), id_col, "left_anti"
    )
    return clean, report


def dsir_importance(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"):
    score every document by the log-likelihood ratio of its tokens
    under a TARGET unigram model vs the RAW-corpus unigram model —
    documents that look like the target domain score high. The
    deterministic top-k selection variant (the paper adds Gumbel
    noise for sampled selection; ranking by the weight itself is the
    exact-replay form).

    ``target_col`` is a boolean column of ``df`` marking the target
    subset. Both models are add-one-smoothed over the SHARED corpus
    vocabulary, so every token has nonzero mass under both and no
    document is unscorable.

    Determinism (the q181 discipline): probabilities are integer
    ratios rounded to ``ndigits``; per-token terms
    ln(p_target) − ln(p_raw) are floor-quantized at 1e-9 and reduced
    with the sorted fold (doc-length-bounded), so the score is
    engine-exact despite ln.

    Scale shape: ONE tokenize pass; token counts are one keyed
    aggregate (map-side combined); vocab size and the two token
    totals are 1-row broadcast aggregates; scoring joins tokens to
    the vocabulary-sized ratio table on the word key. Both shuffles
    track distinct-word counts, not corpus rows.

    Returns (``id_col``, n_tokens BIGINT, log_ratio DOUBLE
    round-``ndigits``) — one row per document with >= 1 token."""
    from .stats import det_sum, fquant

    toks = df.select(
        F.col(id_col).alias("_id"),
        F.col(target_col).alias("_tgt"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("_w"),
    ).filter(F.col("_w") != "")
    counts = toks.groupBy("_w").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c_raw"),
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0))
        .cast("bigint")
        .alias("_c_tgt"),
    )
    totals = counts.agg(
        F.count(F.lit(1)).cast("bigint").alias("_v"),
        F.sum("_c_raw").cast("bigint").alias("_n_raw"),
        F.sum("_c_tgt").cast("bigint").alias("_n_tgt"),
    )
    # Floor the rounded probability at 10**-ndigits: once a corpus
    # total exceeds ~2*10**ndigits tokens, round(1/(N+V), ndigits)
    # underflows to 0.0 and ln(0) would NULL the term (silently
    # dropped by the sorted fold while n_tokens still counts it).
    p_floor = F.lit(10.0**-ndigits)
    p_t = F.greatest(
        F.round(
            (F.col("_c_tgt") + 1).cast("double")
            / (F.col("_n_tgt") + F.col("_v")).cast("double"),
            ndigits,
        ),
        p_floor,
    )
    p_r = F.greatest(
        F.round(
            (F.col("_c_raw") + 1).cast("double")
            / (F.col("_n_raw") + F.col("_v")).cast("double"),
            ndigits,
        ),
        p_floor,
    )
    ratios = counts.crossJoin(F.broadcast(totals)).select(
        "_w", fquant(F.log(p_t) - F.log(p_r), 9).alias("_term")
    )
    per = (
        toks.join(ratios, "_w")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            det_sum(F.col("_term"), 9).alias("_s"),
        )
    )
    return per.select(
        F.col("_id").alias(id_col),
        "n_tokens",
        F.round("_s", ndigits).cast("double").alias("log_ratio"),
    )


def curriculum_interleave(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    score_col: str,
) -> DataFrame:
    """Deterministic interleaved curriculum order: rank documents
    WITHIN each domain by descending ``score_col`` (the per-domain
    difficulty/quality signal), then emit in round-robin rounds —
    round r carries each domain's rank-r document, so consecutive
    training batches see every domain at matched difficulty instead
    of one domain block at a time.

    The only window partitions by domain (keyed — skewed domains
    split under AQE); the global curriculum ORDER is the sort key
    (round, domain, id), not a global row_number, so a top-N
    curriculum prefix is TakeOrderedAndProject at any scale.

    Returns (round BIGINT, ``domain_col``, ``id_col``, score) sorted
    consumers should ORDER BY (round, domain, id)."""
    from pyspark.sql import Window

    w = Window.partitionBy(domain_col).orderBy(
        F.desc("score"), F.asc(id_col)
    )
    return (
        df.select(
            F.col(domain_col),
            F.col(id_col),
            F.col(score_col).alias("score"),
        )
        .withColumn("round", F.row_number().over(w).cast("bigint"))
        .select("round", domain_col, id_col, "score")
    )


def softdedup_weights(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Soft-deduplication reweighting (the SoftDeDup idea — He et
    al. 2024: down-WEIGHT highly duplicated samples instead of
    dropping them, so the effective epoch count of common content
    falls without discarding its unique remainder):

    - ``commonness`` — the mean corpus-wide occurrence count of the
      document's word ``n``-grams (the concatenated-corpus counter
      of the ExactSubstr tier, so a gram repeated within one doc
      counts every instance). 1.0 = every gram unique corpus-wide;
    - ``weight`` — 1 / commonness, the sampling multiplier: a doc
      whose every 8-gram appears k times trains at ~1/k the rate,
      making the EXPECTED gradient contribution of duplicated
      content scale-invariant.

    Docs with fewer than ``n`` tokens carry commonness 1.0 / weight
    1.0 (nothing to count). Both metrics are stable_round6 doubles.

    Scale: one gram-keyed count aggregate (map-side combined), one
    semi-sized join back on gram, one doc-keyed mean — the q343 cost
    class; no pair table, no window, nothing collected. Feed
    ``weight`` to :func:`weighted_sample` /
    :func:`weighted_sample_per_group` for the actual draw.
    """
    from .dedup import tokens_col, widen_for_map
    from .similarity import stable_round6

    if n < 1:
        raise ValueError("softdedup_weights: n >= 1")
    df = widen_for_map(df, id_col)  # r12: see widen_for_map
    toks = tokens_col(text_col)
    base = df.filter(
        F.col(text_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(F.col(id_col), toks.alias("_toks"))
    grams = base.filter(F.size("_toks") >= n).select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("_toks") - n),
                lambda i: F.concat_ws(" ", F.slice("_toks", i + 1, n)),
            )
        ).alias("gram"),
    )
    counts = grams.groupBy("gram").agg(
        F.count(F.lit(1)).cast("bigint").alias("_cnt")
    )
    per_doc = (
        grams.join(counts, "gram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum("_cnt").cast("bigint").alias("_cnt_sum"),
        )
    )
    commonness = stable_round6(
        F.col("_cnt_sum").cast("double") / F.col("n_grams").cast("double")
    )
    return (
        base.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("bigint").alias(
                "n_grams"
            ),
            F.coalesce(commonness, F.lit(1.0)).alias("commonness"),
            F.coalesce(
                stable_round6(F.lit(1.0) / commonness), F.lit(1.0)
            ).alias("weight"),
        )
    )
