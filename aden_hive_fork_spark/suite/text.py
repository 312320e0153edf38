"""Text-analysis operators over ``documents`` (driver-mandated
extensions, SURVEY.md §2.D; grep/regex is §2.A row 25 —
reference grep_search.py:1-100).

All token math uses whitespace splitting + integer arithmetic so the
DuckDB oracle matches exactly; only final ratios become doubles (one
IEEE division on identical integer inputs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.similarity import stable_round6
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


# ---------------------------------------------------------------------------
# q107 — REPETITION quality filters (published corpus-cleaning
# heuristics: a document dominated by a repeated n-gram is boilerplate
# or spam). Per document: the most-frequent word-2-gram's share of all
# 2-grams, and the share of 2-grams occurring more than once. Pure
# integer ratio arithmetic — exact oracle.
# ---------------------------------------------------------------------------
@query(
    "q107_repetition_filters",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), ' +') AS ws
      FROM documents
    ),
    grams AS (
      SELECT doc_id, unnest([ws[i] || ' ' || ws[i + 1]
                             for i in range(1, len(ws))]) AS g
      FROM toks WHERE len(ws) >= 2
    ),
    counts AS (
      SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g
    ),
    per_doc AS (
      SELECT doc_id,
        CAST(SUM(c) AS BIGINT) AS n_grams,
        CAST(MAX(c) AS BIGINT) AS top_gram_count,
        CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS rep_gram_count
      FROM counts GROUP BY doc_id
    )
    SELECT doc_id, n_grams,
      ROUND(CAST(top_gram_count AS DOUBLE) / n_grams, 6) AS top_2gram_frac,
      ROUND(CAST(rep_gram_count AS DOUBLE) / n_grams, 6) AS dup_2gram_frac
    FROM per_doc
    WHERE CAST(top_gram_count AS DOUBLE) / n_grams >= 0.04
    ORDER BY doc_id ASC
    """,
)
def q107_repetition_filters(spark, sf_dir):
    """Documents whose most-frequent word-2-gram covers >= 4% of all
    2-grams — the repetition-dominance filter of published corpus
    pipelines, plus the duplicated-2-gram share. Scale shape: explode
    to (doc, gram), one (doc, gram) count shuffle with map-side
    partial aggregation, one per-doc rollup — never a per-doc Python
    loop."""
    docs = T(spark, sf_dir, "documents")
    ws = F.split(F.lower(F.trim(F.col("text"))), " +")
    wsc = F.col("ws")
    grams_arr = F.transform(
        F.sequence(F.lit(0), F.size(wsc) - 2),
        lambda i: F.concat_ws(" ", F.element_at(wsc, i + 1), F.element_at(wsc, i + 2)),
    )
    grams = (
        docs.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select("doc_id", F.explode(grams_arr).alias("g"))
    )
    counts = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.max("c").alias("top_gram_count"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("rep_gram_count"),
    )
    top_frac = F.col("top_gram_count").cast("double") / F.col("n_grams")
    return (
        per_doc.filter(top_frac >= 0.04)
        .select(
            "doc_id",
            F.col("n_grams").cast("bigint").alias("n_grams"),
            F.round(top_frac, 6).alias("top_2gram_frac"),
            F.round(
                F.col("rep_gram_count").cast("double") / F.col("n_grams"), 6
            ).alias("dup_2gram_frac"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q108 — UNICODE NFC normalization (corpus canonicalization before
# dedup): document text is deterministically mangled into DECOMPOSED
# form (a -> a + U+0301 combining acute), normalized back with the
# engine's normalizer (Arrow-batched unicodedata UDF), and
# fingerprinted. The oracle replays the same mangle + nfc_normalize —
# both sides implement Unicode TR-15, so hashes match byte-for-byte,
# proving normalization restores canonical form exactly.
# ---------------------------------------------------------------------------
@query(
    "q108_unicode_nfc_dedup",
    oracle="""
    WITH mangled AS (
      SELECT doc_id,
        replace(text, 'a', 'a' || chr(769)) AS decomposed
      FROM documents WHERE doc_id < 200
    ),
    norm AS (
      SELECT doc_id, nfc_normalize(decomposed) AS canon,
        length(decomposed) AS len_decomposed
      FROM mangled
    )
    SELECT doc_id,
      CAST(length(canon) AS BIGINT) AS len_canon,
      CAST(len_decomposed AS BIGINT) AS len_decomposed,
      md5(canon) AS canon_md5
    FROM norm
    ORDER BY doc_id ASC
    """,
)
def q108_unicode_nfc_dedup(spark, sf_dir):
    """NFC canonicalization round-trip under the oracle gate. The
    decomposed text is LONGER in codepoints (combining marks); after
    NFC they fuse into precomposed characters and md5(canon) must
    equal the oracle's — the property that makes content-hash dedup
    reliable on real-world text."""
    from ..functions.unicode_norm import normalize_col

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    # explicit escapes: "a" + U+0301 combining acute (DECOMPOSED) —
    # a raw literal would be silently re-composed by a normalizing editor
    decomposed = F.regexp_replace(F.col("text"), "a", "a\u0301")
    out = docs.select(
        "doc_id",
        decomposed.alias("decomposed"),
    ).select(
        "doc_id",
        normalize_col("decomposed").alias("canon"),
        F.length("decomposed").cast("bigint").alias("len_decomposed"),
    )
    return out.select(
        "doc_id",
        F.length("canon").cast("bigint").alias("len_canon"),
        "len_decomposed",
        F.md5(F.encode("canon", "UTF-8")).alias("canon_md5"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q117 — REAL BPE tokenization (rows-only: the merge loop is not
# SQL-expressible; correctness is pinned by test_bpe's hand-computed
# merges + driver-vs-distributed differential).
# ---------------------------------------------------------------------------
@query("q117_bpe_real_tokens")
def q117_bpe_real_tokens(spark, sf_dir):
    """Corpus-trained byte-pair encoding (functions/bpe): merges
    learned driver-side from a bounded deterministic sample, encoding
    distributed via an Arrow-batched pandas UDF. Output: per-source
    real-BPE token totals vs whitespace-word totals — the compression
    the packing/budgeting passes actually see."""
    from ..functions.bpe import bpe_token_counts, train_bpe
    from ._helpers import T

    docs = T(spark, sf_dir, "documents")
    bpe = train_bpe(docs, text_col="text", n_merges=150,
                    sample_rows=2000, order_col="doc_id")
    counted = bpe_token_counts(docs, bpe, "text")
    return (
        counted.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_bpe_tokens").cast("bigint").alias("bpe_tokens"),
            F.sum(F.size(F.split(F.trim("text"), r"\s+")))
            .cast("bigint")
            .alias("ws_tokens"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q123 — corpus-trained Naive Bayes classifier (operators/classifier):
# train AND score inside one relational plan, both oracle-replayed.
# ---------------------------------------------------------------------------
@query(
    "q123_nb_classifier",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, lang = 'en' AS good,
        unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
      FROM documents
      WHERE text IS NOT NULL AND length(trim(text)) > 0
    ), counts AS (
      SELECT token,
        SUM(CASE WHEN good THEN 1 ELSE 0 END) AS n_good,
        SUM(CASE WHEN good THEN 0 ELSE 1 END) AS n_bad
      FROM toks GROUP BY token
    ), totals AS (
      SELECT SUM(n_good) AS Ng, SUM(n_bad) AS Nb, COUNT(*) AS V
      FROM counts
    ), doc_counts AS (
      SELECT SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS Dg,
             SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS Db
      FROM documents
      WHERE text IS NOT NULL AND length(trim(text)) > 0
    ), odds AS (
      SELECT token,
        CAST(ROUND(
          LN((n_good + 1.0) / (Ng + 1.0 * V))
          - LN((n_bad + 1.0) / (Nb + 1.0 * V)), 6) AS DECIMAL(18,6))
          AS odds
      FROM counts, totals
    ), consts AS (
      SELECT
        CAST(ROUND(LN(Dg / Db), 6) AS DECIMAL(18,6)) AS prior,
        CAST(ROUND(
          LN(1.0 / (Ng + 1.0 * V)) - LN(1.0 / (Nb + 1.0 * V)), 6)
          AS DECIMAL(18,6)) AS unseen_odds
      FROM totals, doc_counts
    ), scored AS (
      SELECT t.doc_id, c.prior + SUM(COALESCE(o.odds, c.unseen_odds))
        AS nb_score
      FROM toks t LEFT JOIN odds o ON t.token = o.token
      CROSS JOIN consts c
      GROUP BY t.doc_id, c.prior
    )
    SELECT s.doc_id, d.lang,
      CAST(FLOOR(CAST(s.nb_score AS DOUBLE) * 1000000 + 0.5) / 1000000
           AS DOUBLE) AS nb_score,
      (s.nb_score > 0) AS predicted_en
    FROM scored s JOIN documents d ON s.doc_id = d.doc_id
    ORDER BY s.doc_id ASC
    """,
)
def q123_nb_classifier(spark, sf_dir):
    """`classifier.nb_train` + `nb_score`: multinomial NB with
    add-one smoothing, trained on lang='en' labels and scoring the
    SAME corpus — the fastText-style quality/domain filter expressed
    entirely in relational ops. Per-token log-odds are rounded to 6
    decimals and summed as DECIMAL, so scores are exact and
    partitioning-independent; training is one token shuffle, scoring
    is a broadcast model join + keyed sum. The >0 sign is stable
    because scores are exact decimals."""
    from ..operators.classifier import nb_score, nb_train

    docs = T(spark, sf_dir, "documents")
    labeled = docs.withColumn("good", F.col("lang") == "en")
    odds, consts = nb_train(labeled, "good")
    scored = nb_score(docs, odds, consts)
    return (
        scored.join(docs.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id",
            "lang",
            # exact decimal score; emitted via the driver-green
            # stable_round6 DOUBLE codec (CORRECTNESS_r07: DECIMAL
            # output columns are the divergent driver codec). The >0
            # sign is still taken on the exact DECIMAL.
            stable_round6(F.col("nb_score").cast("double")).alias(
                "nb_score"
            ),
            (F.col("nb_score") > 0).alias("predicted_en"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q240 — distributed BPE tokenizer training under the hash gate:
# operators/bpe_train unrolled into chained CTEs (the q159 kmeans
# discipline applied to an iterative text algorithm). Each round's
# best pair AND its corpus pair-count are value-hash checked.
# ---------------------------------------------------------------------------
_BPE_MERGES = 6
_BPE_TOP_WORDS = 500


def _bpe_cte_chain(n_merges: int = _BPE_MERGES,
                   top_words: int = _BPE_TOP_WORDS) -> str:
    """The shared unrolled training chain (WITH ... t{n_merges}):
    lead → pair argmax → greedy islands merge per round, mirroring
    operators/bpe_train exactly. q240 selects the merge table from it;
    q314 selects the final segmentation (the application side)."""
    sql = f"""
    WITH wf AS MATERIALIZED (
      SELECT word, freq FROM (
        SELECT lower(w) AS word, COUNT(*) AS freq
        FROM (SELECT unnest(string_split_regex(text, '[^a-zA-Z]+')) AS w
              FROM documents)
        WHERE w <> ''
        GROUP BY lower(w)
      )
      ORDER BY freq DESC, word ASC LIMIT {top_words}
    ),
    t0 AS MATERIALIZED (
      SELECT wid, freq, pos, substring(wid, pos, 1) AS sym FROM (
        SELECT word AS wid, freq,
               unnest(range(1, length(word) + 1)) AS pos
        FROM wf)
    )"""
    for r in range(1, n_merges + 1):
        sql += f""",
    l{r} AS MATERIALIZED (
      SELECT wid, freq, pos, sym,
             LEAD(sym) OVER (PARTITION BY wid ORDER BY pos) AS nxt
      FROM t{r - 1}
    ),
    b{r} AS MATERIALIZED (
      SELECT sym AS a, nxt AS b, SUM(freq) AS cnt
      FROM l{r} WHERE nxt IS NOT NULL
      GROUP BY sym, nxt
      ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
    ),
    m{r} AS MATERIALIZED (
      SELECT l.wid, l.freq, l.pos, l.sym, l.nxt,
             (l.sym = b.a AND l.nxt = b.b) AS m
      FROM l{r} l CROSS JOIN b{r} b
    ),
    i{r} AS MATERIALIZED (
      SELECT wid, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY wid ORDER BY pos) AS isl
      FROM m{r} WHERE m
    ),
    k{r} AS MATERIALIZED (
      SELECT wid, pos FROM (
        SELECT wid, pos, MIN(pos) OVER (PARTITION BY wid, isl) AS s
        FROM i{r})
      WHERE (pos - s) % 2 = 0
    ),
    t{r} AS MATERIALIZED (
      SELECT wid, freq,
             ROW_NUMBER() OVER (PARTITION BY wid ORDER BY opos) AS pos,
             sym
      FROM (
        SELECT t.wid, t.freq, t.pos AS opos,
          CASE WHEN k.pos IS NOT NULL THEN t.sym || t.nxt
               ELSE t.sym END AS sym
        FROM m{r} t
        LEFT JOIN k{r} k ON k.wid = t.wid AND k.pos = t.pos
        LEFT JOIN k{r} kp ON kp.wid = t.wid AND kp.pos = t.pos - 1
        WHERE kp.pos IS NULL)
    )"""
    return sql


def _bpe_oracle(n_merges: int = _BPE_MERGES,
                top_words: int = _BPE_TOP_WORDS) -> str:
    union = "\n      UNION ALL ".join(
        f"SELECT CAST({r} AS INT) AS rank, a AS lhs, b AS rhs,"
        f" CAST(cnt AS BIGINT) AS pair_count FROM b{r}"
        for r in range(1, n_merges + 1)
    )
    return _bpe_cte_chain(n_merges, top_words) + f"""
    SELECT * FROM ({union}) ORDER BY rank ASC
    """


def _bpe_apply_oracle(n_merges: int = _BPE_MERGES,
                      top_words: int = _BPE_TOP_WORDS,
                      top_out: int = 50) -> str:
    return _bpe_cte_chain(n_merges, top_words) + f"""
    SELECT wid AS word, CAST(freq AS BIGINT) AS freq,
      CAST(COUNT(*) AS INT) AS n_tokens,
      string_agg(sym, ' ' ORDER BY pos ASC) AS tokenized
    FROM t{n_merges}
    GROUP BY wid, freq
    ORDER BY freq DESC, word ASC
    LIMIT {top_out}
    """


@query("q240_bpe_train_merges", oracle=_bpe_oracle())
def q240_bpe_train_merges(spark, sf_dir):
    """operators/bpe_train.bpe_merges_df over documents: 6 merge
    rounds, top-500 vocabulary — distributed BPE tokenizer training
    with every round's (pair, corpus count) value-hash checked against
    DuckDB's unrolled replay. The corpus reduces to (word, freq) in
    ONE shuffle; all rounds run on the vocabulary-sized token
    relation (two keyed windows + one aggregate per round,
    localCheckpoint-truncated lineage)."""
    from ..operators.bpe_train import bpe_merges_df

    docs = T(spark, sf_dir, "documents")
    return bpe_merges_df(
        docs, text_col="text", n_merges=_BPE_MERGES,
        top_words=_BPE_TOP_WORDS,
    ).orderBy("rank")


# ---------------------------------------------------------------------------
# q247 — hashing-trick featurization of the document corpus: k=16
# signed-count buckets per doc, md5 bucket+sign so the vectorizer is
# engine-replayable. No vocabulary state — any executor featurizes
# any row; densification is map-side (map + transform, no grid join).
# ---------------------------------------------------------------------------
@query(
    "q247_feature_hashing",
    oracle="""
    WITH tok0 AS (
      SELECT doc_id,
        unnest(string_split_regex(lower(trim(text)), ' +')) AS tok
      FROM documents
    ),
    t AS (
      SELECT doc_id, md5('fh' || tok) AS h FROM tok0 WHERE tok <> ''
    ),
    pb AS (
      SELECT doc_id,
        CAST(CAST(('0x' || substr(h, 1, 8)) AS UBIGINT) % 16 AS INT) AS b,
        SUM(CASE WHEN CAST(('0x' || substr(h, 9, 1)) AS UBIGINT) % 2 = 0
                 THEN 1 ELSE -1 END) AS v,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM t GROUP BY 1, 2
    ),
    grid AS (
      SELECT d.doc_id, gi.i
      FROM (SELECT DISTINCT doc_id FROM pb) d
      CROSS JOIN (SELECT unnest(range(16)) AS i) gi
    ),
    dense AS (
      SELECT g.doc_id, g.i, COALESCE(pb.v, 0) AS v
      FROM grid g LEFT JOIN pb ON pb.doc_id = g.doc_id AND pb.b = g.i
    ),
    nt AS (
      SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens
      FROM pb GROUP BY doc_id
    ),
    vecs AS (
      SELECT doc_id, list(CAST(v AS BIGINT) ORDER BY i ASC) AS features
      FROM dense GROUP BY doc_id
    )
    SELECT nt.doc_id, nt.n_tokens, vecs.features
    FROM nt JOIN vecs USING (doc_id)
    ORDER BY nt.doc_id ASC
    """,
)
def q247_feature_hashing(spark, sf_dir):
    """operators/encoding.feature_hash over documents: 16-bucket
    signed-count hashing-trick vectors."""
    from ..operators.encoding import feature_hash

    d = T(spark, sf_dir, "documents")
    return feature_hash(d, "doc_id", "text", k=16, salt="fh").orderBy(
        F.asc("doc_id")
    )


# ---------------------------------------------------------------------------
# q263 — Zipf's-law fit of the corpus token distribution: ln(freq) vs
# ln(rank) least squares over the top-500 terms (slope ≈ −1 for
# natural language — a standard corpus-health signal). Ranks are
# integers, logs floor-quantize, and the fit is the exact-suffstats
# linear_fit, so the whole diagnostic replays in DuckDB.
# ---------------------------------------------------------------------------
@query(
    "q263_zipf_fit",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split_regex(lower(trim(text)), ' +')) AS term
      FROM documents
    ),
    tf AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS freq
      FROM toks WHERE term <> '' GROUP BY term
    ),
    ranked AS (
      SELECT freq,
        ROW_NUMBER() OVER (ORDER BY freq DESC, term ASC) AS rnk
      FROM tf
    ),
    pts AS (
      SELECT
        FLOOR(ln(CAST(rnk AS DOUBLE)) * 1e6) / 1e6 AS x,
        FLOOR(ln(CAST(freq AS DOUBLE)) * 1e6) / 1e6 AS y
      FROM ranked WHERE rnk <= 500
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS sx,
        CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS sy,
        CAST(SUM(CAST(CAST(x AS DECIMAL(18,6)) * CAST(y AS DECIMAL(18,6))
          AS DECIMAL(38,12))) AS DECIMAL(38,6)) AS sxy,
        CAST(SUM(CAST(CAST(x AS DECIMAL(18,6)) * CAST(x AS DECIMAL(18,6))
          AS DECIMAL(38,12))) AS DECIMAL(38,6)) AS sxx
      FROM pts
    )
    SELECT n,
      CAST(ROUND(CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0 THEN
        (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      END, 6) AS DOUBLE) AS slope,
      CAST(ROUND((CAST(sy AS DOUBLE)
        - (CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0 THEN
            (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          END) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
        AS DOUBLE) AS intercept
    FROM s
    """,
)
def q263_zipf_fit(spark, sf_dir):
    """operators/stats.linear_fit over the fquant'd log-log token
    rank-frequency curve (top 500 terms)."""
    from pyspark.sql import Window

    from ..operators.stats import fquant, linear_fit

    toks = T(spark, sf_dir, "documents").select(
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), " +")
        ).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq")
    )
    w = Window.orderBy(F.col("freq").desc(), F.col("term").asc())
    pts = (
        tf.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 500)
        .select(
            fquant(F.log(F.col("rnk").cast("double"))).alias("x"),
            fquant(F.log(F.col("freq").cast("double"))).alias("y"),
        )
    )
    return linear_fit(pts, "x", "y", scale=6)


# ---------------------------------------------------------------------------
# q314 — BPE APPLICATION under the hash gate (round 8): the final
# segmentation the trained merges produce — exact token strings and
# counts for the 50 most frequent vocabulary words. q240 checks WHICH
# merges are learned; this checks what they DO to words (the encoder's
# shipped state). The rows-only q117 (150 merges, Arrow-batched
# encode) keeps the production path; its floor entry now has gated
# twins on both halves of the algorithm.
# ---------------------------------------------------------------------------
@query("q314_bpe_apply", oracle=_bpe_apply_oracle())
def q314_bpe_apply(spark, sf_dir):
    """operators/bpe_train.bpe_vocab_segmentation: per-word final
    token sequence after the 6 learned merges, value-hash checked
    (space-joined token string + token count for the top-50 words)."""
    from ..operators.bpe_train import bpe_vocab_segmentation

    docs = T(spark, sf_dir, "documents")
    toks = bpe_vocab_segmentation(
        docs, text_col="text", n_merges=_BPE_MERGES,
        top_words=_BPE_TOP_WORDS,
    )
    return (
        toks.groupBy(F.col("wid").alias("word"), "freq")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "sym"))),
                    lambda s: s.sym,
                ),
            ).alias("tokenized"),
        )
        .select(
            "word",
            F.col("freq").cast("bigint").alias("freq"),
            "n_tokens",
            "tokenized",
        )
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# q317/q318 — language identification (operators/langid.py): the
# Cavnar–Trenkle character-n-gram rank-profile classifier, the CCNet-
# style pipeline's first filter. All-integer arithmetic (counts,
# ranks, |rank diffs|) so both the trained profile table and the
# classification are exact under the DuckDB oracle gate — no log(),
# no quantization step.
# ---------------------------------------------------------------------------

_LANGID_NORM = "regexp_replace(lower(text), '\\s+', ' ', 'g')"


@query(
    "q317_langid_profiles",
    oracle=f"""
    WITH base AS (
      SELECT lang, {_LANGID_NORM} AS t
      FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
    ),
    grams AS (
      SELECT lang,
        unnest(list_transform(range(1, length(t) - 1),
                              i -> substr(t, i, 3))) AS gram
      FROM base WHERE length(t) >= 3
    ),
    counts AS (
      SELECT lang, gram, CAST(COUNT(*) AS BIGINT) AS gram_count
      FROM grams GROUP BY 1, 2
    )
    SELECT lang, gram,
      CAST(row_number() OVER (
        PARTITION BY lang ORDER BY gram_count DESC, gram ASC
      ) AS BIGINT) AS rank,
      gram_count
    FROM counts
    QUALIFY rank <= 50
    ORDER BY lang ASC, rank ASC
    """,
)
def q317_langid_profiles(spark, sf_dir):
    """operators/langid.langid_profiles on the labeled corpus: the
    top-50 ranked trigram profile per language — the TRAIN half of
    the classifier, gated row-exact (every count and rank)."""
    from ..operators.langid import langid_profiles

    # the gram explode is CPU-bound; a small parquet arrives as ONE
    # input split locally, so spread it (at cluster scale the scan is
    # naturally multi-split and this hash exchange is noise)
    d = T(spark, sf_dir, "documents").repartition(64, "doc_id")
    return langid_profiles(
        d, text_col="text", lang_col="lang", n=3, profile_size=50
    ).orderBy("lang", "rank")


@query(
    "q318_langid_predictions",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, lang, {_LANGID_NORM} AS t
      FROM documents WHERE text IS NOT NULL
    ),
    prof AS MATERIALIZED (
      SELECT lang, gram,
        row_number() OVER (
          PARTITION BY lang ORDER BY COUNT(*) DESC, gram ASC
        ) AS lrank
      FROM (
        SELECT lang,
          unnest(list_transform(range(1, length(t) - 1),
                                i -> substr(t, i, 3))) AS gram
        FROM base
        WHERE doc_id % 2 = 0 AND lang IS NOT NULL AND length(t) >= 3
      )
      GROUP BY lang, gram
      QUALIFY lrank <= 100
    ),
    doc_ranked AS MATERIALIZED (
      SELECT doc_id, true_lang, gram,
        row_number() OVER (
          PARTITION BY doc_id ORDER BY COUNT(*) DESC, gram ASC
        ) AS drank
      FROM (
        SELECT doc_id, lang AS true_lang,
          unnest(list_transform(range(1, length(t) - 1),
                                i -> substr(t, i, 3))) AS gram
        FROM base WHERE doc_id % 2 = 1 AND length(t) >= 3
      )
      GROUP BY doc_id, true_lang, gram
      QUALIFY drank <= 100
    ),
    per_doc AS (
      SELECT doc_id, true_lang, COUNT(*) AS kdoc
      FROM doc_ranked GROUP BY 1, 2
    ),
    matched AS (
      SELECT d.doc_id, p.lang,
        SUM(ABS(d.drank - p.lrank)) AS msum, COUNT(*) AS mcnt
      FROM doc_ranked d JOIN prof p USING (gram)
      GROUP BY 1, 2
    ),
    dist AS (
      SELECT pd.doc_id, pd.true_lang, l.lang,
        COALESCE(m.msum, 0) + 100 * (pd.kdoc - COALESCE(m.mcnt, 0))
          AS distance
      FROM per_doc pd
      CROSS JOIN (SELECT DISTINCT lang FROM prof) l
      LEFT JOIN matched m ON m.doc_id = pd.doc_id AND m.lang = l.lang
    ),
    best AS (
      SELECT doc_id, true_lang, lang AS pred_lang, distance,
        row_number() OVER (
          PARTITION BY doc_id ORDER BY distance ASC, lang ASC
        ) AS rk
      FROM dist QUALIFY rk = 1
    )
    SELECT pred_lang,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(CASE WHEN pred_lang = true_lang THEN 1 ELSE 0 END)
        AS BIGINT) AS n_label_match,
      CAST(SUM(distance) AS BIGINT) AS sum_distance,
      CAST(MIN(distance) AS BIGINT) AS min_distance,
      CAST(MAX(distance) AS BIGINT) AS max_distance
    FROM best GROUP BY pred_lang ORDER BY pred_lang ASC
    """,
)
def q318_langid_predictions(spark, sf_dir):
    """Held-out langid: TRAIN rank profiles on even doc_ids, CLASSIFY
    odd doc_ids, roll predictions up per predicted language with the
    exact integer distance totals and true-label agreement counts.
    The full train→classify path in one gated query."""
    from ..operators.langid import langid_classify, langid_profiles

    d = T(spark, sf_dir, "documents").repartition(64, "doc_id")
    train = d.filter(F.col("doc_id") % 2 == 0)
    test = d.filter(F.col("doc_id") % 2 == 1)
    prof = langid_profiles(
        train, text_col="text", lang_col="lang", n=3, profile_size=100
    )
    pred = langid_classify(
        test, prof, text_col="text", id_col="doc_id", n=3,
        profile_size=100,
    ).filter(F.col("n_doc_grams") > 0)
    truth = test.select("doc_id", F.col("lang").alias("true_lang"))
    return (
        pred.join(truth, "doc_id")
        .groupBy("pred_lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(
                F.when(F.col("pred_lang") == F.col("true_lang"), 1)
                .otherwise(0)
            ).cast("bigint").alias("n_label_match"),
            F.sum("distance").cast("bigint").alias("sum_distance"),
            F.min("distance").cast("bigint").alias("min_distance"),
            F.max("distance").cast("bigint").alias("max_distance"),
        )
        .orderBy("pred_lang")
    )


# ---------------------------------------------------------------------------
# q319 — composed CCNet-style curation: langid (first filter) →
# exact dedup (content hash, deterministic survivor) → per-label
# census. The north-star pipeline's head stages in ONE gated query:
# the classifier's predictions decide which docs survive, the dedup
# collapses exact copies, every count is integer-exact.
# ---------------------------------------------------------------------------
@query(
    "q319_curated_corpus_census",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, lang, source, {_LANGID_NORM} AS t
      FROM documents WHERE text IS NOT NULL
    ),
    prof AS MATERIALIZED (
      SELECT lang, gram,
        row_number() OVER (
          PARTITION BY lang ORDER BY COUNT(*) DESC, gram ASC
        ) AS lrank
      FROM (
        SELECT lang,
          unnest(list_transform(range(1, length(t) - 1),
                                i -> substr(t, i, 3))) AS gram
        FROM base WHERE lang IS NOT NULL AND length(t) >= 3
      )
      GROUP BY lang, gram
      QUALIFY lrank <= 100
    ),
    doc_ranked AS MATERIALIZED (
      SELECT doc_id, gram,
        row_number() OVER (
          PARTITION BY doc_id ORDER BY COUNT(*) DESC, gram ASC
        ) AS drank
      FROM (
        SELECT doc_id,
          unnest(list_transform(range(1, length(t) - 1),
                                i -> substr(t, i, 3))) AS gram
        FROM base WHERE length(t) >= 3
      )
      GROUP BY doc_id, gram
      QUALIFY drank <= 100
    ),
    per_doc AS (
      SELECT doc_id, COUNT(*) AS kdoc FROM doc_ranked GROUP BY 1
    ),
    matched AS (
      SELECT d.doc_id, p.lang,
        SUM(ABS(d.drank - p.lrank)) AS msum, COUNT(*) AS mcnt
      FROM doc_ranked d JOIN prof p USING (gram)
      GROUP BY 1, 2
    ),
    best AS (
      SELECT pd.doc_id, l.lang AS pred_lang,
        row_number() OVER (
          PARTITION BY pd.doc_id
          ORDER BY COALESCE(m.msum, 0)
                   + 100 * (pd.kdoc - COALESCE(m.mcnt, 0)) ASC,
                   l.lang ASC
        ) AS rk
      FROM per_doc pd
      CROSS JOIN (SELECT DISTINCT lang FROM prof) l
      LEFT JOIN matched m ON m.doc_id = pd.doc_id AND m.lang = l.lang
      QUALIFY rk = 1
    ),
    kept AS (
      SELECT b.doc_id, b.lang, b.source, b.t
      FROM base b JOIN best ON best.doc_id = b.doc_id
      WHERE best.pred_lang = 'en'
    ),
    deduped AS (
      SELECT doc_id, lang, source, t,
        row_number() OVER (
          PARTITION BY md5(t) ORDER BY doc_id ASC
        ) AS dup_rank
      FROM kept
      QUALIFY dup_rank = 1
    )
    SELECT lang,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(length(t) - length(replace(t, ' ', '')) + 1) AS BIGINT)
        AS n_tokens
    FROM deduped
    GROUP BY lang
    ORDER BY lang ASC
    """,
)
def q319_curated_corpus_census(spark, sf_dir):
    """The composed curation head: train langid profiles on the
    labeled corpus, classify EVERY doc, keep the predicted-'en' pool
    (the CCNet first filter), collapse exact duplicates of the
    normalized text (md5, min-doc_id survivor — the q95/q40
    discipline), and report the surviving census per TRUE label with
    whitespace token totals. One gated query spanning three pipeline
    stages."""
    from ..operators.langid import _normalize, langid_train_predict

    d = T(spark, sf_dir, "documents").repartition(64, "doc_id")
    # fused train+classify (r12): one corpus gram explode instead of
    # two — integer-exact identical to profiles+classify
    _prof, pred = langid_train_predict(
        d, text_col="text", lang_col="lang", id_col="doc_id", n=3,
        profile_size=100,
    )
    kept = (
        d.select("doc_id", "lang", "source", _normalize("text").alias("_t"))
        .join(pred.filter(F.col("pred_lang") == "en"), "doc_id")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(F.md5("_t")).orderBy(F.asc("doc_id"))
    deduped = (
        kept.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
    )
    return (
        deduped.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(
                F.length("_t")
                - F.length(F.regexp_replace("_t", " ", ""))
                + 1
            )
            .cast("bigint")
            .alias("n_tokens"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q325 — WordPiece-style greedy longest-match segmentation (round 9):
# the maximal-munch member of the tokenizer family (q240 trains BPE
# merges, q314 replays them; this segments against a frequency-
# thresholded substring vocab, longest token first). The Spark side
# is the iterative cursor relation (operators/bpe_train.
# wordpiece_segment); the oracle replays the SAME greedy walk as a
# recursive CTE whose step is the per-(word, cursor) MAX match
# length. All-integer/string — exact on both engines.
# ---------------------------------------------------------------------------
_Q325_MIN_OCC = 50
_Q325_MAX_LEN = 4


@query(
    "q325_wordpiece_segments",
    oracle=f"""
    WITH RECURSIVE words AS (
      SELECT w AS word, COUNT(*) AS freq
      FROM (SELECT unnest(string_split(trim(text), ' ')) AS w
            FROM documents)
      WHERE w != '' GROUP BY w
    ),
    -- position range derived from the ACTUAL max word length, not a
    -- fixed 64 cap: a 64+-char unsplit token (URL/base64) would
    -- otherwise contribute truncated vocab counts here while the
    -- Spark operator (sequence(1, length(word))) covers every
    -- position.
    poss AS (
      SELECT unnest(range(1, (SELECT MAX(len(word)) + 1 FROM words)))
        AS i
    ),
    chars AS (
      SELECT DISTINCT substr(word, i.i, 1) AS token
      FROM words CROSS JOIN poss i
      WHERE i.i <= len(word)
    ),
    subs AS (
      SELECT substr(word, i.i, l.l) AS token
      FROM words
      CROSS JOIN poss i
      CROSS JOIN (SELECT unnest(range(2, {_Q325_MAX_LEN + 1})) AS l) l
      WHERE i.i + l.l - 1 <= len(word)
      GROUP BY 1
      HAVING SUM(freq) >= {_Q325_MIN_OCC}
    ),
    vocab AS (SELECT token FROM chars UNION SELECT token FROM subs),
    seg AS (
      SELECT word, 1 AS pos, CAST('' AS VARCHAR) AS toks FROM words
      UNION ALL
      SELECT word, pos + ml,
        CASE WHEN toks = '' THEN substr(word, pos, ml)
             ELSE toks || ' ' || substr(word, pos, ml) END
      FROM (
        SELECT s.word, s.pos, s.toks, MAX(l.l) AS ml
        FROM seg s
        CROSS JOIN (SELECT unnest(range(1, {_Q325_MAX_LEN + 1})) AS l) l
        JOIN vocab v ON l.l <= len(s.word) - s.pos + 1
          AND v.token = substr(s.word, s.pos, l.l)
        WHERE s.pos <= len(s.word)
        GROUP BY s.word, s.pos, s.toks
      )
    ),
    done AS (SELECT word, toks FROM seg WHERE pos > len(word))
    SELECT d.word, CAST(w.freq AS BIGINT) AS word_freq,
      d.toks AS wordpiece,
      CAST(len(string_split(d.toks, ' ')) AS INT) AS n_pieces
    FROM done d JOIN words w USING (word)
    ORDER BY d.word ASC
    """,
)
def q325_wordpiece_segments(spark, sf_dir):
    """operators/bpe_train.wordpiece_segment over documents: greedy
    longest-match segmentation of every distinct corpus word against
    the min-occ-50, max-len-4 substring vocabulary."""
    from ..operators.bpe_train import wordpiece_segment

    docs = T(spark, sf_dir, "documents")
    out = wordpiece_segment(
        docs, text_col="text",
        min_occ=_Q325_MIN_OCC, max_sub_len=_Q325_MAX_LEN,
    )
    return out.select(
        "word",
        F.col("word_freq").cast("bigint").alias("word_freq"),
        "wordpiece",
        F.col("n_pieces").cast("int").alias("n_pieces"),
    ).orderBy("word")


# ---------------------------------------------------------------------------
# q334/q335 — Unigram-LM (SentencePiece-style) tokenizer training
# under the hash gate (round 10): the third trained-tokenizer family
# member (q240/q314 BPE, q325 WordPiece). Hard-EM (Viterbi-EM): each
# E-step segments every vocabulary word by its best path under the
# current token log-probs (map-side DP inside higher-order
# aggregates), each M-step re-estimates add-one-smoothed probs over
# the fixed seed vocab (the dsir quantization discipline). The oracle
# replays the SAME chain: recursive-CTE forward DP carrying
# (best, backpointer) lists, recursive backtrack, count + re-estimate
# per round — every addition a single IEEE double in identical order.
# q334 checks the trained MODEL; q335 checks what it does to words.
# ---------------------------------------------------------------------------
_Q334_MIN_OCC = 50
_Q334_MAX_LEN = 4
_Q334_EM_ROUNDS = 2


def _unigram_cte_chain(em_rounds: int = _Q334_EM_ROUNDS,
                       max_len: int = _Q334_MAX_LEN,
                       min_occ: int = _Q334_MIN_OCC) -> str:
    """The unrolled training chain (WITH RECURSIVE ... voc{R}): seed
    vocab → per-round Viterbi DP + backtrack + count + re-estimate,
    mirroring operators/unigram_lm exactly. One extra DP block at
    r = em_rounds gives the final-model segmentation (q335)."""
    L = max_len
    sql = f"""
    WITH RECURSIVE words AS MATERIALIZED (
      SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split(trim(text), ' ')) AS w
            FROM documents)
      WHERE w <> '' GROUP BY w
    ),
    poss AS MATERIALIZED (
      SELECT unnest(range(1, (SELECT MAX(len(word)) + 1 FROM words)))
        AS i
    ),
    occ AS MATERIALIZED (
      SELECT substr(word, i.i, l.l) AS token, SUM(freq) AS c
      FROM words CROSS JOIN poss i
      CROSS JOIN (SELECT unnest(range(1, {L} + 1)) AS l) l
      WHERE i.i + l.l - 1 <= len(word)
      GROUP BY 1
    ),
    seed AS MATERIALIZED (
      SELECT token, CAST(c AS BIGINT) AS seed_cnt FROM occ
      WHERE len(token) = 1 OR c >= {min_occ}
    ),
    tot0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS v,
                    CAST(SUM(seed_cnt) AS BIGINT) AS t FROM seed),
    voc0 AS MATERIALIZED (
      SELECT token,
        FLOOR(ln(GREATEST(ROUND(CAST(seed_cnt + 1 AS DOUBLE)
          / CAST(t + v AS DOUBLE), 6), 1e-6)) * 1e9) / 1e9 AS logp
      FROM seed CROSS JOIN tot0
    )"""
    for r in range(em_rounds + 1):
        sql += f""",
    dp{r} AS (
      SELECT word, 0 AS j, [CAST(0.0 AS DOUBLE)] AS best, [0] AS bp
      FROM words
      UNION ALL
      SELECT word, j, list_append(best, s) AS best,
             list_append(bp, l) AS bp
      FROM (
        SELECT d.word, d.j + 1 AS j, d.best, d.bp, ll.l AS l,
          list_extract(d.best, d.j + 2 - ll.l) + v.logp AS s,
          ROW_NUMBER() OVER (PARTITION BY d.word
            ORDER BY list_extract(d.best, d.j + 2 - ll.l) + v.logp
                       DESC,
                     ll.l DESC) AS rk
        FROM dp{r} d
        CROSS JOIN (SELECT unnest(range(1, {L} + 1)) AS l) ll
        JOIN voc{r} v
          ON v.token = substr(d.word, d.j + 2 - ll.l, ll.l)
        WHERE d.j < len(d.word) AND ll.l <= d.j + 1
      ) WHERE rk = 1
    ),
    fin{r} AS MATERIALIZED (
      SELECT word, best, bp FROM dp{r} WHERE j = len(word)
    ),
    bt{r} AS (
      SELECT word, len(word) AS cur, CAST('' AS VARCHAR) AS pieces
      FROM fin{r}
      UNION ALL
      SELECT word, cur - l AS cur,
        CASE WHEN pieces = '' THEN tok
             ELSE tok || ' ' || pieces END AS pieces
      FROM (
        SELECT b.word, b.cur, b.pieces,
          list_extract(f.bp, b.cur + 1) AS l,
          substr(b.word, b.cur - list_extract(f.bp, b.cur + 1) + 1,
                 list_extract(f.bp, b.cur + 1)) AS tok
        FROM bt{r} b JOIN fin{r} f USING (word)
        WHERE b.cur > 0
      )
    ),
    segdone{r} AS MATERIALIZED (
      SELECT word, pieces FROM bt{r} WHERE cur = 0
    )"""
        if r < em_rounds:
            sql += f""",
    cnt{r} AS MATERIALIZED (
      SELECT s.token, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
      FROM seed s LEFT JOIN (
        SELECT tok AS token, SUM(w.freq) AS cnt FROM (
          SELECT word, unnest(string_split(pieces, ' ')) AS tok
          FROM segdone{r}) t JOIN words w USING (word)
        GROUP BY tok) c USING (token)
    ),
    tot{r + 1} AS (SELECT CAST(COUNT(*) AS BIGINT) AS v,
                          CAST(SUM(cnt) AS BIGINT) AS t FROM cnt{r}),
    voc{r + 1} AS MATERIALIZED (
      SELECT token,
        FLOOR(ln(GREATEST(ROUND(CAST(cnt + 1 AS DOUBLE)
          / CAST(t + v AS DOUBLE), 6), 1e-6)) * 1e9) / 1e9 AS logp
      FROM cnt{r} CROSS JOIN tot{r + 1}
    )"""
    return sql


def _unigram_train_oracle() -> str:
    R = _Q334_EM_ROUNDS
    return _unigram_cte_chain() + f"""
    SELECT s.token, s.seed_cnt, c.cnt,
      CAST(ROUND(v.logp, 6) AS DOUBLE) AS logp
    FROM seed s
    JOIN cnt{R - 1} c USING (token)
    JOIN voc{R} v USING (token)
    ORDER BY s.token ASC
    """


def _unigram_segment_oracle() -> str:
    R = _Q334_EM_ROUNDS
    return _unigram_cte_chain() + f"""
    SELECT w.word, w.freq AS word_freq, s.pieces,
      CAST(len(string_split(s.pieces, ' ')) AS INT) AS n_pieces,
      CAST(ROUND(list_extract(f.best, len(w.word) + 1), 6) AS DOUBLE)
        AS score
    FROM segdone{R} s
    JOIN words w USING (word)
    JOIN fin{R} f USING (word)
    ORDER BY w.word ASC
    """


@query("q334_unigram_lm_train", oracle=_unigram_train_oracle())
def q334_unigram_lm_train(spark, sf_dir):
    """operators/unigram_lm.unigram_lm_train over documents: 2
    hard-EM rounds, min-occ-50, max-piece-len-4 — the trained unigram
    LM (token, seed count, final Viterbi usage count, final smoothed
    log-prob), every value hash-checked against DuckDB's recursive-CTE
    replay."""
    from ..operators.unigram_lm import unigram_lm_train

    docs = T(spark, sf_dir, "documents")
    return unigram_lm_train(
        docs, text_col="text", min_occ=_Q334_MIN_OCC,
        max_piece_len=_Q334_MAX_LEN, em_rounds=_Q334_EM_ROUNDS,
    ).orderBy("token")


@query("q335_unigram_lm_segments", oracle=_unigram_segment_oracle())
def q335_unigram_lm_segments(spark, sf_dir):
    """operators/unigram_lm.unigram_lm_segment: per-word Viterbi
    segmentation under the TRAINED model (the q314 application-side
    split) — pieces, piece count, and best-path log-probability."""
    from ..operators.unigram_lm import unigram_lm_segment

    docs = T(spark, sf_dir, "documents")
    return unigram_lm_segment(
        docs, text_col="text", min_occ=_Q334_MIN_OCC,
        max_piece_len=_Q334_MAX_LEN, em_rounds=_Q334_EM_ROUNDS,
    ).orderBy("word")


# ---------------------------------------------------------------------------
# q340 — trained-tokenizer comparison report (round 10): the "choose
# your tokenizer" artifact a pretraining stack produces before
# committing — BPE (q240/q314), WordPiece (q325), and Unigram-LM
# (q334/q335) each trained at their gate-pinned operating points on
# the same corpus, one summary row per family: vocabulary size, word
# coverage, and the frequency-weighted mean pieces-per-word (the
# fertility number that drives context-window budgets). The oracle
# replays ALL THREE training chains (BPE merge rounds, the WordPiece
# recursive maximal munch, the unigram recursive Viterbi-EM) in one
# statement — CTE names prefixed per family to compose.
# ---------------------------------------------------------------------------
_UG_CTE_NAMES = (
    ["words", "poss", "occ", "seed", "tot0", "voc0"]
    + [n
       for r in range(_Q334_EM_ROUNDS + 1)
       for n in (f"dp{r}", f"fin{r}", f"bt{r}", f"segdone{r}")]
    + [n
       for r in range(_Q334_EM_ROUNDS)
       for n in (f"cnt{r}", f"tot{r + 1}", f"voc{r + 1}")]
)


def _prefix_ctes(sql: str, names: list[str], prefix: str) -> str:
    """Rename CTEs by word-boundary substitution (column names like
    seed_cnt are safe: '_' is a word character, so \\bseed\\b cannot
    match inside them)."""
    import re as _re

    for n in sorted(set(names), key=len, reverse=True):
        sql = _re.sub(rf"\b{n}\b", f"{prefix}{n}", sql)
    return sql


def _tokenizer_report_oracle() -> str:
    R = _Q334_EM_ROUNDS
    ug = _prefix_ctes(_unigram_cte_chain(), _UG_CTE_NAMES, "ug_")
    ug_body = ug.split("WITH RECURSIVE", 1)[1]
    bpe = _bpe_cte_chain().split("WITH", 1)[1]
    mean6 = (
        "FLOOR(CAST(SUM(freq * np) AS DOUBLE)"
        " / CAST(SUM(freq) AS DOUBLE) * 1000000 + 0.5) / 1000000"
    )
    return f"""
    WITH RECURSIVE {bpe.strip()},
    {ug_body.strip()},
    wp_words AS MATERIALIZED (
      SELECT w AS word, COUNT(*) AS freq
      FROM (SELECT unnest(string_split(trim(text), ' ')) AS w
            FROM documents)
      WHERE w != '' GROUP BY w
    ),
    wp_poss AS (
      SELECT unnest(range(1, (SELECT MAX(len(word)) + 1 FROM wp_words)))
        AS i
    ),
    wp_chars AS (
      SELECT DISTINCT substr(word, i.i, 1) AS token
      FROM wp_words CROSS JOIN wp_poss i
      WHERE i.i <= len(word)
    ),
    wp_subs AS (
      SELECT substr(word, i.i, l.l) AS token
      FROM wp_words
      CROSS JOIN wp_poss i
      CROSS JOIN (SELECT unnest(range(2, {_Q325_MAX_LEN + 1})) AS l) l
      WHERE i.i + l.l - 1 <= len(word)
      GROUP BY 1
      HAVING SUM(freq) >= {_Q325_MIN_OCC}
    ),
    wp_vocab AS MATERIALIZED (
      SELECT token FROM wp_chars UNION SELECT token FROM wp_subs
    ),
    wp_seg AS (
      SELECT word, 1 AS pos, CAST('' AS VARCHAR) AS toks FROM wp_words
      UNION ALL
      SELECT word, pos + ml,
        CASE WHEN toks = '' THEN substr(word, pos, ml)
             ELSE toks || ' ' || substr(word, pos, ml) END
      FROM (
        SELECT s.word, s.pos, s.toks, MAX(l.l) AS ml
        FROM wp_seg s
        CROSS JOIN (SELECT unnest(range(1, {_Q325_MAX_LEN + 1})) AS l) l
        JOIN wp_vocab v ON l.l <= len(s.word) - s.pos + 1
          AND v.token = substr(s.word, s.pos, l.l)
        WHERE s.pos <= len(s.word)
        GROUP BY s.word, s.pos, s.toks
      )
    ),
    wp_done AS MATERIALIZED (
      SELECT word, toks FROM wp_seg WHERE pos > len(word)
    ),
    bpe_per_word AS (
      SELECT wid, freq, COUNT(*) AS np
      FROM t{_BPE_MERGES} GROUP BY wid, freq
    ),
    wp_per_word AS (
      SELECT d.word, w.freq, len(string_split(d.toks, ' ')) AS np
      FROM wp_done d JOIN wp_words w USING (word)
    ),
    ug_per_word AS (
      SELECT s.word, w.freq,
        len(string_split(s.pieces, ' ')) AS np
      FROM ug_segdone{R} s JOIN ug_words w USING (word)
    )
    SELECT * FROM (
      SELECT 'bpe' AS tokenizer,
        (SELECT CAST(COUNT(DISTINCT sym) AS BIGINT)
         FROM t{_BPE_MERGES}) AS vocab_size,
        CAST(COUNT(*) AS BIGINT) AS n_words,
        CAST(SUM(freq) AS BIGINT) AS total_freq,
        CAST(SUM(freq * np) AS BIGINT) AS weighted_pieces,
        CAST({mean6} AS DOUBLE) AS mean_pieces
      FROM bpe_per_word
      UNION ALL
      SELECT 'unigram',
        (SELECT CAST(COUNT(*) AS BIGINT) FROM ug_seed),
        CAST(COUNT(*) AS BIGINT), CAST(SUM(freq) AS BIGINT),
        CAST(SUM(freq * np) AS BIGINT), CAST({mean6} AS DOUBLE)
      FROM ug_per_word
      UNION ALL
      SELECT 'wordpiece',
        (SELECT CAST(COUNT(*) AS BIGINT) FROM wp_vocab),
        CAST(COUNT(*) AS BIGINT), CAST(SUM(freq) AS BIGINT),
        CAST(SUM(freq * np) AS BIGINT), CAST({mean6} AS DOUBLE)
      FROM wp_per_word
    ) ORDER BY tokenizer ASC
    """


@query("q340_tokenizer_report", oracle=_tokenizer_report_oracle())
def q340_tokenizer_report(spark, sf_dir):
    """The trained-tokenizer family comparison: BPE / WordPiece /
    Unigram-LM each at its gate-pinned operating point, one row per
    family with vocabulary size and frequency-weighted fertility —
    all three trainings value-hash checked in ONE statement."""
    from ..operators.bpe_train import (
        bpe_vocab_segmentation,
        wordpiece_segment,
        wordpiece_vocab,
    )
    from ..operators.similarity import stable_round6
    from ..operators.unigram_lm import (
        unigram_lm_segment_from_words,
        unigram_seed_vocab,
        unigram_words,
    )

    docs = T(spark, sf_dir, "documents")

    def summarize(name, per_word, freq_col, np_col, vocab_df):
        stats = per_word.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(freq_col).cast("bigint").alias("total_freq"),
            F.sum(F.col(freq_col) * F.col(np_col))
            .cast("bigint")
            .alias("weighted_pieces"),
        )
        return stats.crossJoin(F.broadcast(vocab_df)).select(
            F.lit(name).alias("tokenizer"),
            F.col("vocab_size").cast("bigint").alias("vocab_size"),
            "n_words",
            "total_freq",
            "weighted_pieces",
            stable_round6(
                F.col("weighted_pieces").cast("double")
                / F.col("total_freq").cast("double")
            ).alias("mean_pieces"),
        )

    toks = bpe_vocab_segmentation(
        docs, text_col="text", n_merges=_BPE_MERGES,
        top_words=_BPE_TOP_WORDS,
    ).localCheckpoint(eager=True)
    bpe_row = summarize(
        "bpe",
        toks.groupBy("wid", "freq").agg(
            F.count(F.lit(1)).alias("np")
        ),
        "freq",
        "np",
        toks.agg(F.countDistinct("sym").alias("vocab_size")),
    )

    # ONE whitespace (word, freq) reduction shared by the WordPiece
    # and unigram trainings (r12) — each formerly re-exploded the
    # corpus internally; the reductions are expression-identical, so
    # sharing the checkpointed table cannot change any count
    words = unigram_words(docs, "text").localCheckpoint(eager=True)
    wp_seg = wordpiece_segment(
        docs, text_col="text",
        min_occ=_Q325_MIN_OCC, max_sub_len=_Q325_MAX_LEN,
        words=words,
    )
    wp_row = summarize(
        "wordpiece",
        wp_seg.select("word", "word_freq", "n_pieces"),
        "word_freq",
        "n_pieces",
        wordpiece_vocab(
            words, min_occ=_Q325_MIN_OCC, max_sub_len=_Q325_MAX_LEN
        ).agg(F.count(F.lit(1)).alias("vocab_size")),
    )

    ug_seg = unigram_lm_segment_from_words(
        words, min_occ=_Q334_MIN_OCC,
        max_piece_len=_Q334_MAX_LEN, em_rounds=_Q334_EM_ROUNDS,
    )
    ug_row = summarize(
        "unigram",
        ug_seg.select("word", "word_freq", "n_pieces"),
        "word_freq",
        "n_pieces",
        unigram_seed_vocab(
            words, min_occ=_Q334_MIN_OCC, max_piece_len=_Q334_MAX_LEN
        ).agg(F.count(F.lit(1)).alias("vocab_size")),
    )
    return (
        bpe_row.unionByName(ug_row)
        .unionByName(wp_row)
        .orderBy("tokenizer")
    )
