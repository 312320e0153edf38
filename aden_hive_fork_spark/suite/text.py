"""Text-analysis operators over ``documents`` (driver-mandated
extensions, SURVEY.md §2.D; grep/regex is §2.A row 25 —
reference grep_search.py:1-100).

All token math uses whitespace splitting + integer arithmetic so the
DuckDB oracle matches exactly; only final ratios become doubles (one
IEEE division on identical integer inputs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query
from ._helpers import T

# Tiny stopword list for the heuristic language scorer (public,
# standard English function words).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def _stop_in_list() -> str:
    return ", ".join(f"'{w}'" for w in STOPWORDS)


def _tokens():
    return F.split(F.trim(F.col("text")), " ")


# ---------------------------------------------------------------------------
# q30 — token counting + per-source corpus stats.
# ---------------------------------------------------------------------------
@query(
    "q30_doc_token_stats",
    oracle="""
    SELECT source,
      COUNT(*) AS n_docs,
      CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS total_tokens,
      CAST(SUM(len(list_distinct(string_split(trim(text), ' ')))) AS BIGINT) AS total_unique_tokens,
      CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      ROUND(CAST(SUM(len(string_split(trim(text), ' '))) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE), 2) AS avg_tokens_per_doc
    FROM documents
    GROUP BY source
    ORDER BY source ASC
    """,
)
def q30_doc_token_stats(spark, sf_dir):
    """Whitespace token counts per source: total, unique, chars. All
    integer aggregation; one final division. Scale: pure map-side token
    math (JVM split, no Python), tiny shuffle on source."""
    d = T(spark, sf_dir, "documents").select(
        "source",
        "n_chars",
        F.size(_tokens()).alias("n_tokens"),
        F.size(F.array_distinct(_tokens())).alias("n_unique"),
    )
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("n_unique").cast("bigint").alias("total_unique_tokens"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.round(
                F.sum("n_tokens").cast("double") / F.count(F.lit(1)).cast("double"), 2
            ).cast("double").alias("avg_tokens_per_doc"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q31 — per-document quality scoring (length / stopword / uniqueness
# ratios — the driver-mandated "quality scoring" op).
# ---------------------------------------------------------------------------
@query(
    "q31_doc_quality",
    oracle=f"""
    SELECT doc_id,
      len(string_split(trim(text), ' ')) AS n_tokens,
      len(list_filter(string_split(trim(text), ' '), w -> w IN ({_stop_in_list()}))) AS n_stopwords,
      ROUND(CAST(len(list_filter(string_split(trim(text), ' '), w -> w IN ({_stop_in_list()}))) AS DOUBLE)
            / CAST(NULLIF(len(string_split(trim(text), ' ')), 0) AS DOUBLE), 4) AS stopword_ratio,
      ROUND(CAST(len(list_distinct(string_split(trim(text), ' '))) AS DOUBLE)
            / CAST(NULLIF(len(string_split(trim(text), ' ')), 0) AS DOUBLE), 4) AS unique_ratio
    FROM documents
    WHERE doc_id < 200
    ORDER BY doc_id ASC
    """,
)
def q31_doc_quality(spark, sf_dir):
    """Quality signals per document: stopword ratio (language-ness) and
    unique-token ratio (repetitiveness). Higher-order array functions
    keep it JVM-side — no Python UDF in the hot path."""
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    toks = _tokens()
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w)))
    n_uniq = F.size(F.array_distinct(toks))
    denom = F.nullif(n_tokens, F.lit(0)).cast("double")
    return (
        T(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select(
            "doc_id",
            n_tokens.alias("n_tokens"),
            n_stop.alias("n_stopwords"),
            F.round(n_stop.cast("double") / denom, 4).cast("double").alias("stopword_ratio"),
            F.round(n_uniq.cast("double") / denom, 4).cast("double").alias("unique_ratio"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q32 — heuristic language ID (stopword hits ≥ 2 → 'en'), scored
# against the labeled lang column.
# ---------------------------------------------------------------------------
@query(
    "q32_lang_id",
    oracle=f"""
    SELECT
      CASE WHEN len(list_filter(string_split(trim(text), ' '),
                                w -> w IN ({_stop_in_list()}))) >= 2
           THEN 'en' ELSE 'und' END AS lang_pred,
      lang AS lang_true,
      COUNT(*) AS n_docs
    FROM documents
    GROUP BY 1, 2
    ORDER BY lang_pred ASC, lang_true ASC
    """,
)
def q32_lang_id(spark, sf_dir):
    """Stopword-hit language detector (n-gram-heuristic class) as a
    confusion matrix against the labeled column."""
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(_tokens(), lambda w: F.array_contains(stop_arr, w)))
    pred = F.when(n_stop >= 2, "en").otherwise("und")
    return (
        T(spark, sf_dir, "documents")
        .groupBy(pred.alias("lang_pred"), F.col("lang").alias("lang_true"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang_pred", "lang_true")
    )


# ---------------------------------------------------------------------------
# q33 — document fingerprinting (md5 canonical-text hash) — the exact-
# dedup key; also SURVEY §2.D "document fingerprinting".
# ---------------------------------------------------------------------------
@query(
    "q33_doc_fingerprints",
    oracle="""
    SELECT source,
      COUNT(*) AS n_docs,
      COUNT(DISTINCT md5(lower(trim(text)))) AS n_distinct_fp,
      CAST(COUNT(*) - COUNT(DISTINCT md5(lower(trim(text)))) AS BIGINT) AS n_exact_dups
    FROM documents
    GROUP BY source
    ORDER BY source ASC
    """,
)
def q33_doc_fingerprints(spark, sf_dir):
    """Canonicalized md5 fingerprint per document; duplicate mass per
    source = docs minus distinct fingerprints. Scale: fingerprint is a
    map-side expression; distinct-count is two-stage."""
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    return (
        T(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(fp).alias("n_distinct_fp"),
            (F.count(F.lit(1)) - F.countDistinct(fp)).cast("bigint").alias("n_exact_dups"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q34 — regex scan over documents (§2.A row 25, grep_search analog).
# ---------------------------------------------------------------------------
@query(
    "q34_grep_documents",
    oracle="""
    SELECT source, COUNT(*) AS n_matches
    FROM documents
    WHERE regexp_matches(text, 'spark [a-z]+ join')
    GROUP BY source
    ORDER BY source ASC
    """,
)
def q34_grep_documents(spark, sf_dir):
    """grep over the corpus: regex predicate, hits per source
    (reference grep_search: pattern + include filter + count)."""
    return (
        T(spark, sf_dir, "documents")
        .filter(F.col("text").rlike("spark [a-z]+ join"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_matches"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q69 — BPE-ish regex token counting (§2.D text analysis): the GPT-2
# pre-tokenizer shape (contractions | letter-runs | digit-runs |
# punct-runs, each with optional leading space), restricted to a
# Java-regex ∩ RE2 common subset (no lookahead — RE2 has none).
# ---------------------------------------------------------------------------
_BPE_PAT = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


@query(
    "q69_bpe_token_counts",
    oracle="""
    SELECT lang,
      COUNT(*) AS n_docs,
      CAST(SUM(len(regexp_extract_all(text,
        '''s|''t|''re|''ve|''m|''ll|''d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+'
      ))) AS BIGINT) AS bpe_tokens,
      CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS ws_tokens,
      ROUND(CAST(SUM(len(regexp_extract_all(text,
        '''s|''t|''re|''ve|''m|''ll|''d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+'
      ))) AS DOUBLE)
        / CAST(NULLIF(SUM(len(string_split(trim(text), ' '))), 0) AS DOUBLE), 4)
        AS tokens_per_word
    FROM documents
    GROUP BY lang
    ORDER BY lang ASC
    """,
)
def q69_bpe_token_counts(spark, sf_dir):
    """Sub-word-ish token counts per language vs whitespace words —
    the cost model for LLM training-data budgeting. All JVM-side
    regexp (codegen), integer sums, one final division."""
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_PAT), 0))
    ws = F.size(F.split(F.trim(F.col("text")), " "))
    return (
        T(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(bpe).cast("bigint").alias("bpe_tokens"),
            F.sum(ws).cast("bigint").alias("ws_tokens"),
            F.round(
                F.sum(bpe).cast("double")
                / F.nullif(F.sum(ws), F.lit(0)).cast("double"),
                4,
            ).alias("tokens_per_word"),
        )
        .orderBy("lang")
    )
