"""End-to-end pretraining-data curation pipeline — the north-star
composition, every stage one of the repo's individually oracle-gated
operators chained into a single accountable pass (suite q336/q337):

  1. base        — non-null docs (the raw corpus)
  1b. normalize  — Unicode NFC + control/zero-width strip +
                   whitespace fold, chars recounted; empty docs drop
                   (operators/normalize, q342 — the CCNet/FineWeb
                   cleanup that runs BEFORE hashing so dedup sees
                   canonical bytes)
  2. langid      — n-gram language-ID agreement filter: keep docs
                   whose predicted language matches the label
                   (operators/langid, q317/q318/q319 — the CCNet
                   first filter, here as label-noise removal)
  3. quality     — Gopher repetition screens: top-2-gram and
                   duplicated-5-gram character fractions under
                   thresholds; <5-word docs fail by contract
                   (operators/quality.ngram_repetition, q298)
  4. exact_dedup — md5(lower(trim(text))) content hash, min-doc_id
                   survivor (operators/dedup.exact_dedup, q40/q200)
  5. near_dedup  — winnowing (MOSS) fingerprint pairs at overlap
                   >= 0.5 → connected components → min-id survivor
                   (operators/dedup, q322/q333)
  6. decontam    — md5-bucket train/test split; any TRAIN doc that
                   simhash-near-dups a TEST doc is dropped; the
                   pipeline continues with the clean TRAIN corpus
                   (operators/sampling.decontaminate_split, q316)
  7. dsir        — DSIR importance scoring against the lang='en'
                   target model trained on the surviving corpus;
                   keep target-preferring docs (log_ratio > 0)
                   (operators/sampling.dsir_importance, q326)
  8. mixture     — per-source token-budget cap in md5 hash order —
                   the deterministic mixture-enforcement step
                   (operators/sampling.token_budget_sample, q215)
  8b. pii        — typed PII redaction ([EMAIL]/[CARD]/[SSN]/
                   [PHONE]/[IPV4] placeholders, fixed most-specific-
                   first order), chars recounted — the FineWeb
                   anonymization step before anything is packed or
                   shipped (operators/pii.redact_pii, q131/q149);
                   the census additionally carries an 8c_redactions
                   accounting row (docs touched, total hits)
  9. packed      — GPT-style sequence packing of the REDACTED corpus
                   into fixed-capacity context windows
                   (operators/packing.pack_token_stream, q311)

Reference parity: the reference has no training-data pipeline; this
is the driver-mandated §2.D composition capstone (the q200/q319
precedent extended to the full chain).

Scale shape: every stage is the already-audited operator — banded
pair generation (never all-pairs), broadcast models (langid
profiles, DSIR vocabulary ratios), keyed aggregates, the range-
partitioned prefix sum for packing. MULTI-consumer stage boundaries
are localCheckpoint-truncated (eager) so Catalyst analyzes bounded
plans and each reused corpus is materialized exactly once — on a
cluster the same boundaries would be checkpoint/cache points.
Stages with a SINGLE downstream consumer (s1, s3, s7, s8) are NOT
materialized separately (r13): their only other reader was the
census, whose (n_docs, n_tokens) row is now collected as an
``Dataset.observe`` metric riding the next stage's materialization
— the counts are exact aggregates over exactly the rows that flow
through the stage boundary, for zero extra passes and four fewer
sequential job barriers per invocation (guide §2.6: the accounting
overlaps the work instead of serializing after it). The only
driver-side values are the stage row-counts in the final census.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F

# The gate-pinned operating point (suite q336/q337 and the DuckDB
# oracle replay both hard-code these — change them together).
LANGID_N = 3
LANGID_PROFILE = 100
QUALITY_MAX_TOP_FRAC = 0.08
QUALITY_MAX_DUP_FRAC = 0.2
SIMHASH_K = 3
SIMHASH_MAX_HAMMING = 3
TEST_PERCENT = 20
BUDGET_PER_SOURCE = 500
PACK_CAPACITY = 512


def pretrain_pipeline_stages(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
    chars_col: str = "n_chars",
    target_lang: str = "en",
    gopher: bool = False,
    gopher_params: dict | None = None,
) -> dict[str, DataFrame]:
    """Run the 10 corpus stages; returns {stage_name: surviving docs}
    (all with the input's five columns) plus ``"9_packed"`` holding
    the (doc, window) span table. Calling this triggers the chain
    (the multi-consumer stages are eagerly checkpointed; the
    single-consumer stages s1/s3/s7/s8 are lazy views over their
    checkpointed neighbours — same rows, one fewer materialization
    each). ``gopher=True`` inserts the optional stage 3b (the
    non-repetition Gopher rule set, quality.gopher_quality_signals,
    thresholds overridable via ``gopher_params``) between the
    repetition filter and exact dedup."""
    stages, _obs = _pipeline_build(
        docs, id_col, text_col, lang_col, source_col, chars_col,
        target_lang, gopher, gopher_params, observe_census=False,
    )
    return stages


def _pipeline_build(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    lang_col: str,
    source_col: str,
    chars_col: str,
    target_lang: str,
    gopher: bool,
    gopher_params: dict | None,
    observe_census: bool,
    materialize_all: bool = False,
) -> tuple[dict[str, DataFrame], dict[str, Observation]]:
    """The shared chain. With ``observe_census`` the single-consumer
    stage boundaries (s1, s3 non-gopher, s7, s8) carry
    ``Dataset.observe`` metric nodes whose (n_docs, n_tokens)
    aggregates are collected map-side DURING the next stage's
    materialization — Catalyst does not push filters or prune rows
    through CollectMetrics, so the metrics count exactly the stage's
    surviving rows, and the census needs no separate job for them.
    The s8 observation additionally carries the 8c redaction-ledger
    sums (detect_pii columns computed in the same pass the redactor
    already scans). ``materialize_all`` restores the pre-r13 eager
    checkpoints on the single-consumer stages — for the
    aggregate-census path (observe=False inside foreachBatch), where
    the census would otherwise recompute each lazy stage view."""
    from .dedup import (
        dedup_by_components,
        exact_dedup,
        simhash_md5_neardup_pairs,
        winnowing_neardup_pairs,
    )
    from .langid import langid_train_predict
    from .normalize import normalize_corpus
    from .packing import pack_token_stream
    from .pii import detect_pii, redact_pii
    from .quality import gopher_quality_signals, ngram_repetition
    from .sampling import (
        decontaminate_split,
        dsir_importance,
        token_budget_sample,
        train_test_split,
    )

    observations: dict[str, Observation] = {}

    def _maybe_ckpt(df: DataFrame) -> DataFrame:
        # materialize_all: the aggregate census re-reads every stage,
        # so the single-consumer boundaries get their pre-r13 eager
        # checkpoints back instead of recomputing as lazy views
        return (
            df.localCheckpoint(eager=True) if materialize_all else df
        )

    def _census_tap(df: DataFrame, stage: str) -> DataFrame:
        """Attach the stage's census aggregates as observed metrics;
        returns the frame the NEXT stage must consume (so the metric
        node lies on the executed path)."""
        if not observe_census:
            return df
        obs = Observation()
        observations[stage] = obs
        return df.observe(
            obs,
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col(chars_col)).cast("bigint").alias("n_tokens"),
        )

    cols = [id_col, text_col, lang_col, source_col, chars_col]
    s1 = (
        docs.filter(
            F.col(text_col).isNotNull() & F.col(id_col).isNotNull()
        )
        .select(*cols)
        # scale-adaptive width (r13): defaultParallelism, not the old
        # constant 64 — on the cluster this tracks cores; locally it
        # halves the per-stage task count the 10-stage chain pays on
        # every materialization (A/B: q336 14.4 -> 12.6 s at sf0.1)
        .repartition(
            docs.sparkSession.sparkContext.defaultParallelism, id_col
        )
    )
    s1 = _maybe_ckpt(s1)

    s1b = normalize_corpus(
        _census_tap(s1, "1_base"), text_col=text_col,
        chars_col=chars_col,
    ).localCheckpoint(eager=True)

    # ONE corpus gram explode trains the profiles AND classifies
    # (r12: was langid_profiles + langid_classify, two full explodes
    # of the corpus — the fused form is integer-exact identical)
    _prof, pred = langid_train_predict(
        s1b, text_col, lang_col, id_col, n=LANGID_N,
        profile_size=LANGID_PROFILE,
    )
    s2 = (
        s1b.join(
            pred.filter(F.col("n_doc_grams") > 0).select(
                id_col, "pred_lang"
            ),
            id_col,
        )
        .filter(F.col("pred_lang") == F.col(lang_col))
        .select(*cols)
        .localCheckpoint(eager=True)
    )

    rep = ngram_repetition(s2, id_col, text_col, top_n=2, dup_n=5)
    s3 = s2.join(
        rep.filter(
            (F.col("top_frac") <= QUALITY_MAX_TOP_FRAC)
            & (F.col("dup_frac") <= QUALITY_MAX_DUP_FRAC)
        ).select(id_col),
        id_col,
    )

    if gopher:
        # stage-3b option: the NON-repetition Gopher rules (q344) —
        # map-only signals, so the option adds one semi-join and no
        # new shuffle class to the chain. s3 has TWO consumers here
        # (the signal pass and the semi-join), so it keeps its own
        # materialization and the census aggregates it directly.
        s3 = s3.localCheckpoint(eager=True)
        sigs = gopher_quality_signals(
            s3, id_col, text_col, **(gopher_params or {})
        )
        s3b = s3.join(
            sigs.filter(F.col("gopher_pass") == 1).select(id_col),
            id_col,
        ).localCheckpoint(eager=True)
        s4_in = s3b
    else:
        s3 = _maybe_ckpt(s3)
        s3b = s3
        s4_in = _census_tap(s3, "3_quality")

    s4 = (
        exact_dedup(
            s4_in.withColumn(
                "_fp", F.md5(F.lower(F.trim(F.col(text_col))))
            ),
            ["_fp"],
            id_col,
        )
        .drop("_fp")
        .localCheckpoint(eager=True)
    )

    wpairs = winnowing_neardup_pairs(
        s4, id_col=id_col, text_col=text_col, k=3, window=4,
        min_overlap=0.5, max_fp_df=100,
    ).select("id_a", "id_b")
    s5 = dedup_by_components(s4, wpairs, id_col).localCheckpoint(
        eager=True
    )

    split = train_test_split(s5, id_col, test_percent=TEST_PERCENT)
    xpairs = simhash_md5_neardup_pairs(
        s5, id_col=id_col, text_col=text_col, k=SIMHASH_K,
        max_hamming=SIMHASH_MAX_HAMMING,
    ).select("id_a", "id_b")
    clean, _report = decontaminate_split(split, xpairs, id_col=id_col)
    s6 = (
        clean.filter(F.col("split") == "train")
        .select(*cols)
        .localCheckpoint(eager=True)
    )

    scores = dsir_importance(
        s6.withColumn("_t", F.col(lang_col) == target_lang),
        id_col, text_col, "_t",
    )
    s7 = _maybe_ckpt(
        s6.join(
            scores.filter(F.col("log_ratio") > 0).select(id_col),
            id_col,
        )
    )

    s8 = _maybe_ckpt(
        token_budget_sample(
            _census_tap(s7, "7_dsir"), cost_col=chars_col,
            budget=BUDGET_PER_SOURCE, group_cols=[source_col],
            id_cols=[id_col],
        ).select(*cols)
    )

    # PII redaction AFTER the budget draw (the budget is charged on
    # pre-redaction lengths), BEFORE anything is packed or shipped;
    # chars recount so packing reads the redacted lengths. In census
    # mode the SAME pass computes the detect_pii counters, so the
    # 8_mixture row and the 8c redaction ledger are observed metrics
    # of the s8b materialization (one corpus scan, not three).
    if observe_census:
        obs8 = Observation()
        observations["8_mixture"] = obs8
        s8b_in = detect_pii(s8, text_col).observe(
            obs8,
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col(chars_col)).cast("bigint").alias("n_tokens"),
            F.sum((F.col("pii_total") > 0).cast("int"))
            .cast("bigint")
            .alias("red_docs"),
            F.sum("pii_total").cast("bigint").alias("red_hits"),
        )
    else:
        s8b_in = s8
    s8b = (
        s8b_in.withColumn(text_col, redact_pii(text_col))
        .withColumn(chars_col, F.length(text_col).cast("bigint"))
        .select(*cols)
        .localCheckpoint(eager=True)
    )

    packed = pack_token_stream(
        s8b, id_col, chars_col, capacity=PACK_CAPACITY
    )
    out: dict[str, DataFrame] = {
        "1_base": s1,
        "1b_normalize": s1b,
        "2_langid": s2,
        "3_quality": s3,
    }
    if gopher:
        out["3b_gopher"] = s3b
    out.update({
        "4_exact_dedup": s4,
        "5_near_dedup": s5,
        "6_decontam": s6,
        "7_dsir": s7,
        "8_mixture": s8,
        "8b_pii": s8b,
        "9_packed": packed,
    })
    return out, observations


def pretrain_pipeline_census(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
    chars_col: str = "n_chars",
    target_lang: str = "en",
    stages: dict[str, DataFrame] | None = None,
    observe: bool = True,
) -> DataFrame:
    """The per-stage corpus accounting: one row per stage with
    (stage, n_docs BIGINT, n_tokens BIGINT). Corpus stages count
    surviving documents and their total chars; ``8c_redactions`` is
    the PII accounting row (n_docs = documents the redactor touched,
    n_tokens = total typed hits — the FineWeb anonymization ledger);
    ``9_packed`` counts packed context windows and packed tokens
    (== stage 8b's total).

    When this function builds the chain itself, the single-consumer
    stage rows (1_base, 3_quality, 7_dsir, 8_mixture, 8c) arrive as
    observed metrics of the chain's own materializations (r13 — see
    ``_pipeline_build``): same exact integer aggregates over the same
    rows, zero extra jobs. The remaining rows are one union-of-
    aggregates job over the checkpointed stage frames. Pass
    ``stages`` to account an already-computed chain — that path
    aggregates every stage frame directly (checkpointed entries are
    free to re-read; lazy entries recompute their one-stage view).
    ``observe=False`` forces the direct-aggregate path for the whole
    census — required inside a streaming ``foreachBatch`` sink, where
    the micro-batch runs on a CLONED SparkSession and batch
    Observation listeners never fire (streaming/pretrain_stream is
    that caller)."""
    from .pii import detect_pii

    observations: dict[str, Observation] = {}
    if stages is None:
        stages, observations = _pipeline_build(
            docs, id_col, text_col, lang_col, source_col, chars_col,
            target_lang, False, None, observe_census=observe,
            materialize_all=not observe,
        )
    # Resolve the observed metrics up front, with a fallback: a
    # session in which a foreachBatch sink has EVER run can leave the
    # batch Observation listener broken (the observation resolves to
    # an empty row — Spark clones the session for the micro-batch and
    # the listener plumbing does not recover). The chain already ran
    # eagerly either way, so on any retrieval failure the affected
    # stage rows are recomputed as direct aggregates over the (lazy)
    # stage frames — the pre-r13 law, bit-identical.
    obs_vals: dict[str, dict] = {}
    for oname, ob in observations.items():
        try:
            obs_vals[oname] = ob.get
        except Exception:
            pass
    out = None
    observed_rows: list[tuple[str, int, int]] = []
    for name, df in stages.items():
        if name in obs_vals:
            vals = obs_vals[name]
            observed_rows.append(
                (name, vals["n_docs"], vals["n_tokens"])
            )
        elif name == "9_packed":
            row = df.agg(
                F.lit(name).alias("stage"),
                F.countDistinct("window_id")
                .cast("bigint")
                .alias("n_docs"),
                F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            )
            out = row if out is None else out.unionByName(row)
        else:
            row = df.agg(
                F.lit(name).alias("stage"),
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum(chars_col).cast("bigint").alias("n_tokens"),
            )
            out = row if out is None else out.unionByName(row)
        if name == "8_mixture":
            if name in obs_vals:
                vals = obs_vals[name]
                observed_rows.append(
                    ("8c_redactions", vals["red_docs"],
                     vals["red_hits"])
                )
            else:
                red = detect_pii(df, text_col).agg(
                    F.lit("8c_redactions").alias("stage"),
                    F.sum((F.col("pii_total") > 0).cast("int"))
                    .cast("bigint")
                    .alias("n_docs"),
                    F.sum("pii_total").cast("bigint").alias("n_tokens"),
                )
                out = out.unionByName(red)
    if observed_rows:
        obs_df = docs.sparkSession.createDataFrame(
            observed_rows,
            "stage string, n_docs bigint, n_tokens bigint",
        )
        out = obs_df if out is None else out.unionByName(obs_df)
    return out.orderBy("stage")
