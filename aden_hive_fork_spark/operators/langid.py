"""Language identification by character-n-gram rank profiles.

The CCNet-style pretraining pipeline's canonical FIRST filter: decide
each document's language from raw text before any other curation. The
method is Cavnar & Trenkle's published n-gram-based text
categorization ("out-of-place" rank distance, the textcat algorithm):

1. TRAIN: per language, count every character n-gram of the
   normalized text, keep the ``profile_size`` most frequent, and
   record each gram's RANK (1 = most frequent; ties broken by gram
   ascending so the profile is a pure function of the counts).
2. CLASSIFY: build the same ranked gram profile for the document,
   then for each language sum ``|doc_rank - lang_rank|`` over the
   document's grams, charging the maximum penalty (``profile_size``)
   for grams absent from the language profile. The predicted language
   is the argmin (ties broken by language ascending).

Everything is INTEGER arithmetic — counts, ranks, absolute
differences, sums — so the classifier is bit-identical across engines
and sits under the DuckDB oracle gate (suite q317/q318) with no
floating-point quantization step at all (simpler than the
quantize-then-decimal-sum reduction q303 needs for entropies).

Reference parity: the reference ships no langid operator (its corpus
fixtures arrive pre-labeled); this fills the documented gap for the
dedup -> decontaminate -> curate -> mix -> pack -> tokenize pipeline
(VERDICT r8 "Next round" item 1).

Scale shape (100 TB corpus, 1000 executors):
- Gram extraction is a map-side ``transform(sequence(...))`` explode
  — linear in corpus bytes, no Python, whole-stage codegen.
- TRAIN aggregates on (lang, gram) — ONE keyed shuffle; the ranking
  window partitions by ``lang`` over the already-aggregated gram
  counts (|langs| * |distinct grams| rows, tiny vs the corpus).
- The finished profile is |langs| * profile_size rows — broadcast to
  the classify join, so classification never shuffles the profile
  side.
- CLASSIFY aggregates on (doc_id, gram) then windows per doc_id —
  both co-keyed on the document, bounded by document length; the
  final argmin window ranks |langs| rows per doc. No global window,
  no all-pairs, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _normalize(text_col: str | Column) -> Column:
    """Lowercase + collapse whitespace runs to one space — the only
    text canonicalization, chosen because ``lower`` and ``\\s+``
    behave identically in Spark (Java regex) and DuckDB (RE2) over
    the suite's value domain."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_replace(F.lower(c), r"\s+", " ")


def _grams(norm: Column, n: int) -> Column:
    """All character n-grams of the normalized text as an array
    (empty when the text is shorter than n — Spark's
    ``sequence(1, 0)`` counts DOWN, so the short case must be
    guarded explicitly)."""
    ln = F.length(norm)
    return F.when(
        ln >= n,
        F.transform(
            F.sequence(F.lit(1), ln - (n - 1)),
            lambda i: F.substring(norm, i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def langid_profiles(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    n: int = 3,
    profile_size: int = 300,
) -> DataFrame:
    """TRAIN: per-language ranked n-gram profile from a labeled
    corpus. Returns ``lang, gram, rank, gram_count`` with
    rank in [1, profile_size], ordered by nothing (a table, not a
    report). One keyed shuffle on (lang, gram); the rank window runs
    over pre-aggregated counts only."""
    grams = docs.filter(
        F.col(text_col).isNotNull() & F.col(lang_col).isNotNull()
    ).select(
        F.col(lang_col).alias("lang"),
        F.explode(_grams(_normalize(text_col), n)).alias("gram"),
    )
    counts = grams.groupBy("lang", "gram").agg(
        F.count(F.lit(1)).cast("bigint").alias("gram_count")
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc("gram_count"), F.asc("gram")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= profile_size)
        .select("lang", "gram", "rank", "gram_count")
    )


def langid_classify(
    docs: DataFrame,
    profiles: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    profile_size: int = 300,
) -> DataFrame:
    """CLASSIFY: predict each document's language against the ranked
    profiles. Returns ``<id_col>, pred_lang, distance, n_doc_grams``
    where distance is the exact integer out-of-place measure (doc
    grams missing from a language's profile charge ``profile_size``
    each). A document with no grams (empty/short text) gets the
    lexicographically first language at distance 0 — deterministic,
    and easily filtered on ``n_doc_grams = 0`` by callers.

    The profile side is broadcast (|langs| * profile_size rows); all
    heavy aggregation is co-keyed on the document id.
    """
    doc_grams = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("_id"),
        F.explode(_grams(_normalize(text_col), n)).alias("gram"),
    )
    counts = doc_grams.groupBy("_id", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    ids = (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("_id"))
        .distinct()
    )
    return _classify_tail(ids, counts, profiles, id_col, profile_size)


def _classify_tail(
    ids: DataFrame,
    counts: DataFrame,
    profiles: DataFrame,
    id_col: str,
    profile_size: int,
) -> DataFrame:
    """The classify pipeline downstream of the per-(doc, gram) count
    table: rank the doc profile, join the broadcast language
    profiles, charge out-of-place distances, argmin per doc. Shared
    by :func:`langid_classify` (counts from its own explode) and
    :func:`langid_train_predict` (counts from the single shared
    explode)."""
    w = Window.partitionBy("_id").orderBy(F.desc("c"), F.asc("gram"))
    # `ranked` feeds BOTH the per-doc gram-count aggregate and the
    # profile join below; without lineage truncation Spark recomputes
    # the corpus-wide gram explode once per branch (exchange reuse
    # does not fire across these shapes). The checkpointed form is
    # the COMPACT profile — at most profile_size rows per doc, far
    # smaller than the raw gram stream it replaces.
    ranked = (
        counts.withColumn("doc_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("doc_rank") <= profile_size)
        .select("_id", "gram", "doc_rank")
        .localCheckpoint(eager=False)
    )
    # every doc id (id-only column-pruned scan), with 0 for docs whose
    # text produced no grams — they ride the SAME argmin path below
    # (distance 0 against every language -> lexicographically first
    # language wins), so no second pipeline branch or union is needed
    per_doc = (
        ids
        .join(
            ranked.groupBy("_id").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_doc_grams")
            ),
            "_id",
            "left",
        )
        .withColumn(
            "n_doc_grams",
            F.coalesce(F.col("n_doc_grams"), F.lit(0)).cast("bigint"),
        )
    )
    # matched contribution per (doc, lang). The profile table (at
    # most |langs| * profile_size rows, but derived from a
    # corpus-wide aggregation) is lineage-truncated so its two
    # consumers (the gram join and the min-language fallback)
    # evaluate it once.
    prof_small = profiles.select("lang", "gram", "rank").localCheckpoint(
        eager=False
    )
    prof = F.broadcast(prof_small)
    # ARGMIN WITHOUT THE LANGUAGE CROSS JOIN (r12, guide §2.3/§2.4):
    # distance(l) = matched_sum_l + P * (n_doc_grams - matched_cnt_l)
    #             = (matched_sum_l - P * matched_cnt_l) + P * n_doc_grams
    # and the second term is CONSTANT per document, so the argmin
    # over languages needs only the per-(doc, matched-lang) score
    # s_l = matched_sum_l - P * matched_cnt_l. Every matched gram
    # contributes |doc_rank - rank| - P <= -1 < 0 to s_l (both ranks
    # are in [1, P], so |diff| <= P - 1), hence s_l < 0 for ANY
    # language with at least one matched gram while an absent
    # language's score is exactly 0 — a matched language always
    # strictly wins the argmin, and the dense doc x lang frame the
    # previous form cross-joined (then windowed) never needs to
    # exist. min(struct(score, lang)) is field-ordered — score asc,
    # then lang asc — exactly the old window's (distance asc, lang
    # asc) tie-break, and it partial-aggregates map-side where
    # row_number could not. Docs with NO matched language (n = 0, or
    # no gram in any profile) fall back to the lexicographically
    # first language at distance P * n — identical to the dense
    # form's all-absent tie-break.
    best = (
        ranked.join(prof, "gram")
        .groupBy("_id", "lang")
        .agg(
            (
                F.sum(F.abs(F.col("doc_rank") - F.col("rank")))
                - F.lit(int(profile_size)) * F.count(F.lit(1))
            )
            .cast("bigint")
            .alias("_score"),
        )
        .groupBy("_id")
        .agg(F.min(F.struct("_score", "lang")).alias("_b"))
    )
    first_lang = F.broadcast(
        prof_small.select("lang").agg(F.min("lang").alias("_lang0"))
    )
    return (
        per_doc.join(best, "_id", "left")
        .crossJoin(first_lang)
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("_b.lang"), F.col("_lang0")).alias(
                "pred_lang"
            ),
            (
                F.coalesce(F.col("_b._score"), F.lit(0))
                + F.lit(int(profile_size)) * F.col("n_doc_grams")
            )
            .cast("bigint")
            .alias("distance"),
            "n_doc_grams",
        )
    )


def langid_train_predict(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    id_col: str = "doc_id",
    n: int = 3,
    profile_size: int = 300,
) -> tuple[DataFrame, DataFrame]:
    """TRAIN + CLASSIFY over the SAME corpus from ONE gram explode —
    the self-labeling shape (pipeline stage 2, q319): the corpus is
    exploded into character n-grams once and aggregated to per-
    (doc, gram) counts; the per-language profile counts are those
    counts summed by the document's label (exact integers, so
    identical to :func:`langid_profiles`' direct aggregation), and
    classification reuses the same count table. Returns
    ``(profiles, predictions)``, each column-identical to the
    separate ``langid_profiles`` / ``langid_classify`` calls — the
    fusion removes one full corpus explode + raw-gram shuffle, the
    dominant cost of the two-pass form at any scale.
    """
    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("_id"),
        F.col(lang_col).alias("_lang"),
        _normalize(text_col).alias("_t"),
    )
    # lang rides the groupBy key (functionally dependent on _id) so
    # the profile tier never joins back to the corpus
    counts = (
        base.select(
            "_id", "_lang", F.explode(_grams(F.col("_t"), n)).alias("gram")
        )
        .groupBy("_id", "_lang", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    lang_counts = (
        counts.filter(F.col("_lang").isNotNull())
        .groupBy(F.col("_lang").alias("lang"), "gram")
        .agg(F.sum("c").cast("bigint").alias("gram_count"))
    )
    wp = Window.partitionBy("lang").orderBy(
        F.desc("gram_count"), F.asc("gram")
    )
    profiles = (
        lang_counts.withColumn(
            "rank", F.row_number().over(wp).cast("bigint")
        )
        .filter(F.col("rank") <= profile_size)
        .select("lang", "gram", "rank", "gram_count")
    )
    ids = base.select("_id").distinct()
    pred = _classify_tail(
        ids, counts.select("_id", "gram", "c"), profiles, id_col,
        profile_size,
    )
    return profiles, pred
