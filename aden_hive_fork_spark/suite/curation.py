"""Curation batch: PII detection/redaction and n-gram language-model
statistics — the safety and corpus-statistics passes of a training-
data pipeline (driver-mandated extension family; reference analog is
the per-payload cleansing/regex tier, here as table operators).

The PII queries synthesize deterministic contact strings FROM the
customer table inside the query (the synthetic corpus contains no
natural PII), so the detectors are exercised against real matches
and the DuckDB oracle replays detection and redaction byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.ngram_lm import conditional_prob, tfidf
from ..operators.pii import detect_pii, pii_census, redact_pii
from . import query
from ._helpers import T

# Deterministic contact text per customer: email iff custkey%4<2,
# phone iff %3=0, card iff %3=1, ipv4 iff %5=0, ssn iff %7=0 — some
# customers end up with several kinds, some with none.
_CONTACT_SQL = """
  SELECT c_custkey, c_mktsegment,
    'Reach ' || c_name || '.'
    || CASE WHEN c_custkey % 4 < 2
        THEN ' Mail ' || lower(replace(c_name, '#', '.')) || '@example.com.'
        ELSE '' END
    || CASE WHEN c_custkey % 3 = 0
        THEN ' Phone 415-555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') || '.'
        ELSE '' END
    || CASE WHEN c_custkey % 3 = 1
        THEN ' Card 4111-1111-1111-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') || '.'
        ELSE '' END
    || CASE WHEN c_custkey % 5 = 0
        THEN ' Host 10.' || CAST(c_custkey % 200 AS VARCHAR) || '.0.'
             || CAST(c_custkey % 250 AS VARCHAR) || ' logged.'
        ELSE '' END
    || CASE WHEN c_custkey % 7 = 0
        THEN ' SSN 123-45-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') || '.'
        ELSE '' END
    AS text
  FROM customer
"""


def _contact_df(spark, sf_dir):
    """The Spark twin of _CONTACT_SQL — identical concatenation order
    so redacted bytes (and their md5) match the oracle exactly."""
    c = T(spark, sf_dir, "customer")
    key = F.col("c_custkey")

    def _opt(cond, *parts):
        return F.when(cond, F.concat(*parts)).otherwise(F.lit(""))

    num4 = F.lpad((key % 10000).cast("string"), 4, "0")
    text = F.concat(
        F.lit("Reach "),
        F.col("c_name"),
        F.lit("."),
        _opt(
            key % 4 < 2,
            F.lit(" Mail "),
            F.lower(F.regexp_replace("c_name", "#", ".")),
            F.lit("@example.com."),
        ),
        _opt(key % 3 == 0, F.lit(" Phone 415-555-"), num4, F.lit(".")),
        _opt(key % 3 == 1, F.lit(" Card 4111-1111-1111-"), num4, F.lit(".")),
        _opt(
            key % 5 == 0,
            F.lit(" Host 10."),
            (key % 200).cast("string"),
            F.lit(".0."),
            (key % 250).cast("string"),
            F.lit(" logged."),
        ),
        _opt(key % 7 == 0, F.lit(" SSN 123-45-"), num4, F.lit(".")),
    )
    return c.select("c_custkey", "c_mktsegment", text.alias("text"))


# ---------------------------------------------------------------------------
# q130 — corpus PII census: per-segment counts of typed PII hits.
# Detection = one regexp_count projection per kind (JVM codegen, no
# shuffle) + ONE keyed aggregate; at 100 TB the census is one pass.
# ---------------------------------------------------------------------------
_PAT_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PAT_CARD = "\\b\\d{4}-\\d{4}-\\d{4}-\\d{4}\\b"
_PAT_SSN = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
_PAT_PHONE = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
_PAT_IPV4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"


@query(
    "q130_pii_census",
    oracle=f"""
    WITH contact AS ({_CONTACT_SQL}),
    hits AS (
      SELECT c_mktsegment,
        len(regexp_extract_all(text, '{_PAT_EMAIL}')) AS n_email_d,
        len(regexp_extract_all(text, '{_PAT_CARD}')) AS n_card_d,
        len(regexp_extract_all(text, '{_PAT_SSN}')) AS n_ssn_d,
        len(regexp_extract_all(text, '{_PAT_PHONE}')) AS n_phone_d,
        len(regexp_extract_all(text, '{_PAT_IPV4}')) AS n_ipv4_d
      FROM contact)
    SELECT c_mktsegment,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(CASE WHEN n_email_d + n_card_d + n_ssn_d + n_phone_d
                         + n_ipv4_d > 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS docs_with_pii,
      CAST(SUM(n_email_d) AS BIGINT) AS n_email,
      CAST(SUM(n_card_d) AS BIGINT) AS n_card,
      CAST(SUM(n_ssn_d) AS BIGINT) AS n_ssn,
      CAST(SUM(n_phone_d) AS BIGINT) AS n_phone,
      CAST(SUM(n_ipv4_d) AS BIGINT) AS n_ipv4
    FROM hits
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment ASC
    """,
)
def q130_pii_census(spark, sf_dir):
    """operators/pii.pii_census over synthesized contact text: typed
    regexp detectors as pure JVM projections, one aggregate."""
    docs = _contact_df(spark, sf_dir)
    return pii_census(docs, "text", ["c_mktsegment"]).orderBy("c_mktsegment")


# ---------------------------------------------------------------------------
# q131 — PII redaction: placeholder rewrite proven byte-identical via
# md5 of the redacted text (DuckDB replays the same regexp_replace
# chain with the 'g' flag). Pure map-side projection — the redaction
# pass over a 100 TB corpus is shuffle-free.
# ---------------------------------------------------------------------------
@query(
    "q131_pii_redact",
    oracle=f"""
    WITH contact AS ({_CONTACT_SQL}),
    red AS (
      SELECT c_custkey,
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(text, '{_PAT_EMAIL}', '[EMAIL]', 'g'),
                '{_PAT_CARD}', '[CARD]', 'g'),
              '{_PAT_SSN}', '[SSN]', 'g'),
            '{_PAT_PHONE}', '[PHONE]', 'g'),
          '{_PAT_IPV4}', '[IPV4]', 'g') AS redacted,
        len(regexp_extract_all(text, '{_PAT_EMAIL}'))
          + len(regexp_extract_all(text, '{_PAT_CARD}'))
          + len(regexp_extract_all(text, '{_PAT_SSN}'))
          + len(regexp_extract_all(text, '{_PAT_PHONE}'))
          + len(regexp_extract_all(text, '{_PAT_IPV4}')) AS pii_total_d
      FROM contact)
    SELECT c_custkey, md5(redacted) AS redacted_md5,
      CAST(pii_total_d AS INT) AS pii_total,
      CAST(length(redacted) AS INT) AS redacted_len
    FROM red
    ORDER BY c_custkey ASC
    """,
)
def q131_pii_redact(spark, sf_dir):
    """operators/pii.redact_pii: fixed-order regexp_replace chain
    (card before phone so a 16-digit number is consumed whole)."""
    docs = _contact_df(spark, sf_dir)
    d = detect_pii(docs, "text")
    return d.select(
        "c_custkey",
        F.md5(redact_pii("text")).alias("redacted_md5"),
        F.col("pii_total").cast("int").alias("pii_total"),
        F.length(redact_pii("text")).cast("int").alias("redacted_len"),
    ).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# q132 — bigram language-model statistics: corpus bigram counts and
# MLE conditional probability P(w2 | w1). Windows are per-document
# (shuffle key = doc_id), counts combine map-side; the prefix totals
# re-aggregate the bigram counts — the corpus is tokenized once.
# ---------------------------------------------------------------------------
@query(
    "q132_bigram_lm",
    oracle=r"""
    WITH tok0 AS (
      SELECT doc_id,
        unnest(string_split_regex(text, '\s+')) AS word,
        unnest(generate_series(1, len(string_split_regex(text, '\s+'))))
          AS pos
      FROM documents
    ),
    tok AS (SELECT doc_id, pos, word FROM tok0 WHERE word <> ''),
    big AS (
      SELECT doc_id, word AS w1,
        LEAD(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM tok
    ),
    cnt AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS ngram_count
      FROM big WHERE w2 IS NOT NULL GROUP BY w1, w2
    ),
    pre AS (
      SELECT w1, CAST(SUM(ngram_count) AS BIGINT) AS prefix_count
      FROM cnt GROUP BY w1
    )
    SELECT c.w1, c.w2, c.ngram_count, p.prefix_count,
      CAST(ROUND(CAST(c.ngram_count AS DOUBLE)
                 / CAST(p.prefix_count AS DOUBLE), 6) AS DOUBLE) AS cond_p
    FROM cnt c JOIN pre p USING (w1)
    ORDER BY c.ngram_count DESC, c.w1 ASC, c.w2 ASC
    LIMIT 20
    """,
)
def q132_bigram_lm(spark, sf_dir):
    """operators/ngram_lm.conditional_prob (n=2) over documents,
    top-20 bigrams — compiles to TakeOrderedAndProject over the
    already-small count table."""
    docs = T(spark, sf_dir, "documents")
    cp = conditional_prob(docs, "text", "doc_id", n=2)
    return cp.orderBy(
        F.desc("ngram_count"), F.asc("w1"), F.asc("w2")
    ).limit(20)


# ---------------------------------------------------------------------------
# q139 — TF-IDF document-term weights: one tokenize pass, tf keyed by
# (doc, word), df_t re-aggregated from tf (no second corpus scan),
# N and the vocabulary table broadcast. Top-25 weights.
# ---------------------------------------------------------------------------
@query(
    "q139_tfidf_weights",
    oracle=r"""
    WITH tok0 AS (
      SELECT doc_id,
        unnest(string_split_regex(text, '\s+')) AS word
      FROM documents
    ),
    tok AS (SELECT doc_id, word FROM tok0 WHERE word <> ''),
    tf AS (
      SELECT doc_id AS doc, word, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok GROUP BY doc_id, word
    ),
    dft AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS df_t FROM tf GROUP BY word
    ),
    n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_docs
          FROM documents)
    SELECT tf.doc, tf.word, tf.tf, dft.df_t,
      CAST(ROUND(CAST(tf.tf AS DOUBLE)
                 * ln(n.n_docs / CAST(dft.df_t AS DOUBLE)), 6) AS DOUBLE)
        AS tfidf
    FROM tf JOIN dft USING (word) CROSS JOIN n
    ORDER BY tfidf DESC, tf.doc ASC, tf.word ASC
    LIMIT 25
    """,
)
def q139_tfidf_weights(spark, sf_dir):
    """operators/ngram_lm.tfidf over documents, top-25 by weight."""
    docs = T(spark, sf_dir, "documents")
    w = tfidf(docs, "text", "doc_id")
    return w.orderBy(F.desc("tfidf"), F.asc("doc"), F.asc("word")).limit(25)


# ---------------------------------------------------------------------------
# q142 — exact heavy hitters via Misra-Gries candidates + exact
# rescore: bounded-memory candidate pass, broadcast semi-join prune,
# keyed count of survivors only. min_frac > 1/(k+1) makes the result
# provably identical to the full GROUP BY — which is the oracle.
# ---------------------------------------------------------------------------
@query(
    "q142_heavy_hitters",
    oracle="""
    WITH tot AS (
      SELECT CAST(COUNT(l_partkey) AS BIGINT) AS n FROM lineitem
    )
    SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS hh_count
    FROM lineitem CROSS JOIN tot
    GROUP BY l_partkey, tot.n
    HAVING COUNT(*) * 2000 >= n
    ORDER BY hh_count DESC, l_partkey ASC
    """,
)
def q142_heavy_hitters(spark, sf_dir):
    """operators/heavy.heavy_hitters: parts in >= 0.05% of lineitem
    rows. Integer-math threshold (count*2000 >= N) in both engines."""
    from fractions import Fraction

    from ..operators.heavy import heavy_hitters

    li = T(spark, sf_dir, "lineitem")
    hh = heavy_hitters(li, "l_partkey", Fraction(1, 2000), k=4096)
    return hh.orderBy(F.desc("hh_count"), F.asc("l_partkey"))


# ---------------------------------------------------------------------------
# q143 — tokenizer vocabulary coverage: OOV rate per language against
# the top-20 corpus vocabulary. One tokenize pass; the vocabulary is
# a 20-row broadcast; OOV is a left-join null test aggregated per
# language.
# ---------------------------------------------------------------------------
@query(
    "q143_oov_rate",
    oracle=r"""
    WITH tok0 AS (
      SELECT lang,
        unnest(string_split_regex(text, '\s+')) AS word
      FROM documents
    ),
    tok AS (SELECT lang, word FROM tok0 WHERE word <> ''),
    cnt AS (SELECT word, COUNT(*) AS c FROM tok GROUP BY word),
    vocab AS (
      SELECT word FROM cnt ORDER BY c DESC, word ASC LIMIT 20
    )
    SELECT tok.lang,
      CAST(COUNT(*) AS BIGINT) AS n_tokens,
      CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_oov,
      CAST(ROUND(CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS DOUBLE)
        AS oov_rate
    FROM tok LEFT JOIN vocab v ON tok.word = v.word
    GROUP BY tok.lang
    ORDER BY tok.lang ASC
    """,
)
def q143_oov_rate(spark, sf_dir):
    """Vocabulary-coverage metric for tokenizer/corpus fit: fraction
    of tokens outside the top-20 corpus vocabulary, per language."""
    from ..operators.ngram_lm import tokens as tok_fn

    docs = T(spark, sf_dir, "documents")
    t = tok_fn(docs.select(F.col("lang").alias("doc_lang"), "text"),
               "text", "doc_lang").withColumnRenamed("doc", "lang")
    cnt = t.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    vocab = (
        cnt.orderBy(F.desc("c"), F.asc("word"))
        .limit(20)
        .select(F.col("word").alias("v_word"))
    )
    j = t.join(
        F.broadcast(vocab), t["word"] == F.col("v_word"), "left"
    )
    return (
        j.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("v_word").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
        )
        .select(
            "lang",
            "n_tokens",
            "n_oov",
            F.round(
                F.col("n_oov").cast("double") / F.col("n_tokens").cast("double"),
                6,
            )
            .cast("double")
            .alias("oov_rate"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q146 — URL canonicalization dedup: case-shifted hosts, default
# ports, permuted query params, and fragments all collapse to ONE
# canonical string (compared byte-for-byte against a full SQL mirror
# of the normalizer, not just counted). Canonicalization is a
# shuffle-free projection; the dedup count is one keyed aggregate.
# ---------------------------------------------------------------------------
_URLS_SQL = """
  SELECT c_custkey,
    CASE CAST(c_custkey % 4 AS INT)
      WHEN 0 THEN 'https://Docs.Example.COM/guide/'
                  || CAST(c_custkey // 4 AS VARCHAR) || '?page=2&lang=en'
      WHEN 1 THEN 'https://docs.example.com:443/guide/'
                  || CAST(c_custkey // 4 AS VARCHAR) || '?lang=en&page=2'
      WHEN 2 THEN 'HTTP://shop.example.com:80/item/'
                  || CAST(c_custkey // 4 AS VARCHAR) || '?x=1#frag'
      ELSE 'http://Shop.Example.com/item/'
           || CAST(c_custkey // 4 AS VARCHAR) || '?x=1'
    END AS u
  FROM customer
"""


@query(
    "q146_url_canonical_dedup",
    oracle=f"""
    WITH urls AS ({_URLS_SQL}),
    p1 AS (
      SELECT u,
        lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^#]*)', 1) AS rest
      FROM urls),
    p2 AS (
      SELECT u, scheme,
        regexp_extract(regexp_extract(rest, '^([^/?#]*)', 1),
                       '([^@]*)$', 1) AS hostport,
        regexp_extract(rest, '^[^/?#]*(.*)$', 1) AS pathq
      FROM p1),
    p3 AS (
      SELECT u, scheme,
        lower(split_part(hostport, ':', 1)) AS host,
        regexp_extract(hostport, ':(\\d+)$', 1) AS port,
        regexp_extract(pathq, '^([^?]*)', 1) AS path,
        regexp_extract(pathq, '\\?(.*)$', 1) AS query
      FROM p2),
    canon AS (
      SELECT CASE WHEN scheme = '' THEN trim(u)
        ELSE scheme || '://' || host
          || (CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                     OR (scheme = 'https' AND port = '443')
               THEN '' ELSE ':' || port END)
          || (CASE WHEN path = '' THEN '/' ELSE path END)
          || (CASE WHEN query = '' THEN '' ELSE
               '?' || array_to_string(list_sort(string_split(query, '&')), '&')
              END)
        END AS canonical
      FROM p3)
    SELECT canonical, CAST(COUNT(*) AS BIGINT) AS n_variants
    FROM canon
    GROUP BY canonical
    ORDER BY canonical ASC
    LIMIT 25
    """,
)
def q146_url_canonical_dedup(spark, sf_dir):
    """functions/urls.canonical_url over synthesized crawl variants;
    every canonical group merges exactly the intended variants."""
    from ..functions.urls import canonical_url

    c = T(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    k8 = F.floor(key / 4).cast("string")
    v = (key % 4).cast("int")
    url = (
        F.when(v == 0, F.concat(
            F.lit("https://Docs.Example.COM/guide/"), k8,
            F.lit("?page=2&lang=en")))
        .when(v == 1, F.concat(
            F.lit("https://docs.example.com:443/guide/"), k8,
            F.lit("?lang=en&page=2")))
        .when(v == 2, F.concat(
            F.lit("HTTP://shop.example.com:80/item/"), k8, F.lit("?x=1#frag")))
        .otherwise(F.concat(
            F.lit("http://Shop.Example.com/item/"), k8, F.lit("?x=1")))
    )
    urls = c.select(url.alias("u"))
    return (
        urls.select(canonical_url("u").alias("canonical"))
        .groupBy("canonical")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_variants"))
        .orderBy("canonical")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# q147 — compression-ratio quality signal (rows-only by contract:
# deflate output is zlib-build-specific, not engine-replayable).
# Arrow-batched UDF projection + one keyed aggregate.
# ---------------------------------------------------------------------------
@query("q147_compression_quality")
def q147_compression_quality(spark, sf_dir):
    """functions/compress.compression_ratio per language: diffuse
    redundancy the exact n-gram repetition filters (q107) miss."""
    from ..functions.compress import compression_ratio

    d = T(spark, sf_dir, "documents")
    r = d.select("lang", compression_ratio("text").alias("ratio"))
    return (
        r.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("ratio"), 4).cast("double").alias("avg_ratio"),
            F.round(F.min("ratio"), 4).cast("double").alias("min_ratio"),
            F.round(F.max("ratio"), 4).cast("double").alias("max_ratio"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q148 — MMR-diversified similarity search (rows-only: greedy rerank
# is not SQL-expressible). Brute-force top-20 shortlist per query →
# per-query MMR to 5; rerank shuffles only shortlist-sized groups.
# ---------------------------------------------------------------------------
@query("q148_mmr_diversified_topk")
def q148_mmr_diversified_topk(spark, sf_dir):
    """operators/similarity.mmr_rerank over cosine_topk survivors."""
    from ..operators.similarity import cosine_topk_vectorized, mmr_rerank

    emb = T(spark, sf_dir, "embeddings")
    qvecs = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in emb.filter(F.col("vec_id").isin([0, 1, 2])).collect()
    ]  # bounded: 3 rows
    topk = cosine_topk_vectorized(emb, qvecs, k=20)
    cand = topk.join(
        emb.select("vec_id", "embedding"), "vec_id"
    ).select("query_id", "vec_id", "embedding", F.col("cosine").alias("score"))
    return mmr_rerank(cand, k=5, lam=0.7).orderBy("query_id", "mmr_rank")


# ---------------------------------------------------------------------------
# q155 — C4-style boilerplate removal: a shared header is injected
# into every document, a unique footer into a quarter of them; the
# corpus-frequency pass strips exactly the header (doc_frac > 0.5)
# and keeps unique prose, proven by md5 of the reassembled text.
# ---------------------------------------------------------------------------
@query(
    "q155_boilerplate_removal",
    oracle=r"""
    WITH docs AS (
      SELECT doc_id,
        'Subscribe to our newsletter today. ' || text
        || CASE WHEN doc_id % 4 = 0
             THEN '. Unique footer ' || CAST(doc_id AS VARCHAR) ELSE '' END
        AS text
      FROM documents
    ),
    segs AS (
      SELECT doc_id,
        unnest(string_split_regex(text, '\. ')) AS seg,
        unnest(generate_series(1, len(string_split_regex(text, '\. '))))
          AS pos
      FROM docs
    ),
    nz AS (SELECT doc_id, pos, seg FROM segs WHERE seg <> ''),
    n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM docs),
    boiler AS (
      SELECT seg FROM nz CROSS JOIN n
      GROUP BY seg, n.n_docs
      HAVING CAST(COUNT(DISTINCT doc_id) AS DOUBLE) / n.n_docs > 0.5
    ),
    kept AS (
      SELECT nz.doc_id, nz.pos, nz.seg
      FROM nz ANTI JOIN boiler ON nz.seg = boiler.seg
    ),
    rebuilt AS (
      SELECT doc_id, string_agg(seg, '. ' ORDER BY pos) AS text
      FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id, md5(COALESCE(r.text, '')) AS text_md5,
      CAST(length(COALESCE(r.text, '')) AS INT) AS text_len
    FROM (SELECT DISTINCT doc_id FROM docs) d
    LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
    ORDER BY d.doc_id ASC
    """,
)
def q155_boilerplate_removal(spark, sf_dir):
    """operators/dedup.remove_boilerplate_lines over documents with
    an injected corpus-wide header; cleaned text proven byte-exact."""
    from ..operators.dedup import remove_boilerplate_lines

    d = T(spark, sf_dir, "documents")
    key = F.col("doc_id")
    docs = d.select(
        "doc_id",
        F.concat(
            F.lit("Subscribe to our newsletter today. "),
            F.col("text"),
            F.when(
                key % 4 == 0,
                F.concat(F.lit(". Unique footer "), key.cast("string")),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    cleaned = remove_boilerplate_lines(docs, "text", "doc_id", 0.5)
    return cleaned.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.length("text").cast("int").alias("text_len"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q200 — the CAPSTONE pipeline: exact dedup → near-dedup (connected
# components over exact-Jaccard pairs) → quality filter → train
# split, with per-stage corpus accounting — the full training-data
# curation pass composed from the individual oracle-gated tiers, and
# itself verified end-to-end by a single DuckDB replay (fingerprint
# min-keep, recursive-CTE closure, token filter, md5 bucket split).
# ---------------------------------------------------------------------------
@query(
    "q200_curation_pipeline",
    oracle=r"""
    WITH RECURSIVE d0 AS (
      SELECT doc_id, source, text, n_chars,
        md5(lower(trim(text))) AS fp
      FROM documents
    ),
    ex AS (
      SELECT d0.* FROM d0
      JOIN (SELECT fp, MIN(doc_id) AS keep FROM d0 GROUP BY fp) k
        ON k.fp = d0.fp AND k.keep = d0.doc_id
    ),
    sh AS (
      SELECT doc_id, source,
        list_distinct(list_transform(
          range(1, len(string_split(trim(text), ' ')) - 1),
          i -> array_to_string(
            list_slice(string_split(trim(text), ' '), i, i + 2), ' ')
        )) AS shingles
      FROM ex
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / CAST(NULLIF(len(a.shingles) + len(b.shingles)
                   - len(list_intersect(a.shingles, b.shingles)), 0)
                   AS DOUBLE) >= 0.2
    ),
    sym AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM sym
      UNION
      SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
      WHERE s.v <> r.u
    ),
    lab AS (
      SELECT u AS id, LEAST(u, MIN(v)) AS comp FROM reach GROUP BY u
    ),
    nd AS (
      SELECT ex.* FROM ex
      LEFT JOIN (SELECT id FROM lab WHERE comp <> id) l
        ON l.id = ex.doc_id
      WHERE l.id IS NULL
    ),
    q AS (
      SELECT * FROM nd
      WHERE len(list_filter(string_split_regex(text, '\s+'),
                            w -> w <> '')) >= 5
        AND n_chars >= 50
    ),
    tr AS (
      SELECT * FROM q
      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
            % 100 < 90
    )
    SELECT * FROM (
      SELECT '1_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS n_chars_total FROM documents
      UNION ALL
      SELECT '2_exact_dedup', CAST(COUNT(*) AS BIGINT),
        CAST(SUM(n_chars) AS BIGINT) FROM ex
      UNION ALL
      SELECT '3_near_dedup', CAST(COUNT(*) AS BIGINT),
        CAST(SUM(n_chars) AS BIGINT) FROM nd
      UNION ALL
      SELECT '4_quality', CAST(COUNT(*) AS BIGINT),
        CAST(SUM(n_chars) AS BIGINT) FROM q
      UNION ALL
      SELECT '5_train', CAST(COUNT(*) AS BIGINT),
        CAST(SUM(n_chars) AS BIGINT) FROM tr
    ) ORDER BY stage ASC
    """,
)
def q200_curation_pipeline(spark, sf_dir):
    """Composed curation pass: operators/dedup.exact_dedup →
    ngram_jaccard_pairs + dedup_by_components → token/length quality
    filter → sampling.hash_bucket train split; one row of corpus
    accounting per stage."""
    from ..operators.dedup import (
        dedup_by_components,
        exact_dedup,
        ngram_jaccard_pairs,
    )
    from ..operators.sampling import hash_bucket

    docs = T(spark, sf_dir, "documents").select(
        "doc_id", "source", "text", "n_chars"
    )
    d0 = docs.withColumn("fp", F.md5(F.lower(F.trim("text"))))
    ex = exact_dedup(d0, ["fp"], "doc_id").drop("fp")
    pairs = ngram_jaccard_pairs(
        ex, id_col="doc_id", text_col="text", block_cols=["source"],
        k=3, threshold=0.2, max_shingle_df=None,
    )
    nd = dedup_by_components(ex, pairs, "doc_id")
    toks = F.size(
        F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != "")
    )
    q = nd.filter((toks >= 5) & (F.col("n_chars") >= 50))
    tr = q.filter(hash_bucket("doc_id", 100) < 90)

    def stage(name, df):
        return df.agg(
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars_total"),
        )

    out = stage("1_raw", docs)
    for name, df in [("2_exact_dedup", ex), ("3_near_dedup", nd),
                     ("4_quality", q), ("5_train", tr)]:
        out = out.unionByName(stage(name, df))
    return out.orderBy("stage")


# ---------------------------------------------------------------------------
# q215 — per-source token-budget capping (operators/sampling.
# token_budget_sample): the "at most N chars per source" corpus-mix
# primitive, membership EXACTLY replayed by the oracle's window.
# ---------------------------------------------------------------------------
@query(
    "q215_token_budget_sample",
    oracle="""
    WITH ordered AS (
      SELECT doc_id, source, n_chars,
        SUM(CAST(n_chars AS BIGINT)) OVER (
          PARTITION BY source
          ORDER BY md5(concat_ws('|', '', CAST(doc_id AS VARCHAR))) ASC,
                   doc_id ASC
          ROWS UNBOUNDED PRECEDING
        ) AS cum_cost
      FROM documents
    )
    SELECT doc_id, source, n_chars, cum_cost
    FROM ordered
    WHERE cum_cost - CAST(n_chars AS BIGINT) < 4000
    ORDER BY source ASC, cum_cost ASC, doc_id ASC
    """,
)
def q215_token_budget_sample(spark, sf_dir):
    """Cap every source at 4000 characters of documents — kept
    membership is the minimal md5-order prefix covering the budget,
    so the sample is re-derivable bit-for-bit (the oracle replays the
    exact window). Scale notes on the operator: one shuffle keyed by
    source; per-group sort is the budget's irreducible sequential
    cost; pre-shard giant groups."""
    from ..operators.sampling import token_budget_sample

    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    kept = token_budget_sample(
        docs,
        cost_col="n_chars",
        budget=4000,
        group_cols=["source"],
        id_cols=["doc_id"],
    )
    return kept.select("doc_id", "source", "n_chars", "cum_cost").orderBy(
        F.asc("source"), F.asc("cum_cost"), F.asc("doc_id")
    )


# ---------------------------------------------------------------------------
# q216 — repeated-passage mining (operators/dedup.repeated_passages):
# exact word-8-gram passages shared across documents — the
# suffix-array-dedup analog whose doc lists are the removal
# work-list.
# ---------------------------------------------------------------------------
@query(
    "q216_repeated_passages",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
    ), grams AS (
      SELECT doc_id,
        list_distinct(
          CASE WHEN len(w) >= 8 THEN
            list_transform(range(1, len(w) - 8 + 2),
                           i -> array_to_string(w[i:i+7], ' '))
          ELSE []::VARCHAR[] END
        ) AS gs
      FROM toks
    ), posting AS (
      SELECT doc_id, unnest(gs) AS passage FROM grams
    )
    SELECT passage, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM posting
    GROUP BY passage
    HAVING COUNT(*) >= 2
    ORDER BY n_docs DESC, passage ASC
    LIMIT 20
    """,
)
def q216_repeated_passages(spark, sf_dir):
    """Top-20 exact 8-word passages appearing in >= 2 distinct
    documents. Shingling is map-side JVM higher-order functions
    (distinct-per-doc BEFORE the explode); the passage aggregate is
    the one shuffle; top-20 is TakeOrderedAndProject."""
    from ..operators.dedup import repeated_passages

    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    return repeated_passages(
        docs, text_col="text", id_col="doc_id", n=8, min_docs=2, k=20
    )


# ---------------------------------------------------------------------------
# q217 — mixture resampling to target source proportions
# (operators/sampling.mixture_resample): membership EXACTLY replayed
# by the oracle — rates and hash thresholds are the same IEEE ops in
# both engines.
# ---------------------------------------------------------------------------
@query(
    "q217_mixture_resample",
    oracle="""
    WITH tgt(source, p) AS (
      VALUES ('src1', 0.5), ('src2', 0.3), ('src3', 0.2)
    ), cnt AS (
      SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ), g AS (
      SELECT c.source, c.n, t.p FROM cnt c JOIN tgt t ON c.source = t.source
    ), tm AS (
      SELECT MIN(CAST(n AS DOUBLE) / p) AS T FROM g
    ), rates AS (
      SELECT source, p * (SELECT T FROM tm) / CAST(n AS DOUBLE) AS keep_rate
      FROM g
    )
    SELECT d.doc_id, d.source, d.n_chars
    FROM documents d JOIN rates r ON d.source = r.source
    WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
          / 4294967296.0 < r.keep_rate
    ORDER BY d.source ASC, d.doc_id ASC
    """,
)
def q217_mixture_resample(spark, sf_dir):
    """Rebalance the corpus to a 50/30/20 mixture over three sources
    (all other sources dropped by the mixture contract) at the
    largest total the data allows without upsampling. Scale: one
    |groups|-row aggregate broadcast back; the corpus never shuffles
    — membership is a map-side hash threshold."""
    from ..operators.sampling import mixture_resample

    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    kept = mixture_resample(
        docs, "source", "doc_id", {"src1": 0.5, "src2": 0.3, "src3": 0.2}
    )
    return kept.select("doc_id", "source", "n_chars").orderBy(
        F.asc("source"), F.asc("doc_id")
    )


# ---------------------------------------------------------------------------
# q226 — contrastive hard negatives (operators/sampling.
# contrastive_negatives): cross-language negative pairs for embedding
# training. Bucket join bounds volume at n·(n/B); the md5 hash ring
# makes every pick a pure function of content, so DuckDB replays
# exact membership AND order.
# ---------------------------------------------------------------------------
@query(
    "q226_contrastive_negatives",
    oracle="""
    WITH cand AS (
      SELECT doc_id AS nid, lang AS nlang,
        CAST(('0x' || substr(md5('q226' || CAST(doc_id AS VARCHAR)), 1, 8))
             AS UBIGINT) % 16 AS b
      FROM documents
    ), anch AS (
      SELECT doc_id AS aid, lang AS alang,
        CAST(('0x' || substr(md5('q226' || CAST(doc_id AS VARCHAR)), 1, 8))
             AS UBIGINT) % 16 AS b
      FROM documents WHERE doc_id % 97 = 0
    ), ranked AS (
      SELECT aid, nid, nlang,
        ROW_NUMBER() OVER (
          PARTITION BY aid
          ORDER BY md5('q226' || CAST(aid AS VARCHAR) || '|'
                       || CAST(nid AS VARCHAR)) ASC, nid ASC
        ) AS rnk
      FROM anch JOIN cand USING (b)
      WHERE nlang <> alang
    )
    SELECT aid AS anchor_id, nid AS neg_id, nlang AS neg_lang,
           CAST(rnk AS INT) AS rank
    FROM ranked WHERE rnk <= 3
    ORDER BY anchor_id ASC, rank ASC
    """,
)
def q226_contrastive_negatives(spark, sf_dir):
    """Three cross-language negatives per anchor (every 97th doc),
    drawn from 16 hash buckets. Join volume = anchors × bucket size,
    never all-pairs; membership and rank are content-pure (md5), so
    the result is identical on any cluster shape."""
    from ..operators.sampling import contrastive_negatives

    docs = T(spark, sf_dir, "documents").select("doc_id", "lang")
    out = contrastive_negatives(
        docs, "doc_id", "lang", k=3, num_buckets=16,
        anchor_filter=F.col("doc_id") % 97 == 0, salt="q226",
    )
    return out.select(
        F.col("anchor_key").alias("anchor_id"),
        F.col("neg_key").alias("neg_id"),
        F.col("neg_label").alias("neg_lang"),
        "rank",
    ).orderBy(F.asc("anchor_id"), F.asc("rank"))


# ---------------------------------------------------------------------------
# q311/q312 — GPT-style sequence packing (round 8): the corpus laid
# out as one token stream and chunked into capacity-4096 context
# windows (operators/packing). Token count = n_chars (exact integer
# in both engines — no tokenization drift in the gate); the Spark
# side's prefix sum is the window-free running_totals two-pass.
# ---------------------------------------------------------------------------
_PACK_CAP = 4096

_PACK_SPANS_SQL = f"""
    docs AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS len
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
    ),
    cum AS (
      SELECT doc_id, len,
        CAST(SUM(len) OVER (ORDER BY doc_id ASC) AS BIGINT) AS e
      FROM docs
    ),
    exploded AS (
      SELECT doc_id, e - len AS s, e,
        unnest(range((e - len) // {_PACK_CAP}, (e - 1) // {_PACK_CAP} + 1))
          AS window_id
      FROM cum
    ),
    packed AS (
      SELECT doc_id, CAST(window_id AS BIGINT) AS window_id,
        CAST(GREATEST(s, window_id * {_PACK_CAP}) - s AS BIGINT)
          AS doc_offset,
        CAST(GREATEST(s, window_id * {_PACK_CAP}) - window_id * {_PACK_CAP}
          AS BIGINT) AS win_offset,
        CAST(LEAST(e, (window_id + 1) * {_PACK_CAP})
          - GREATEST(s, window_id * {_PACK_CAP}) AS BIGINT) AS n_tokens
      FROM exploded
    )
"""


@query(
    "q311_sequence_packing",
    oracle=f"""
    WITH {_PACK_SPANS_SQL.strip()}
    SELECT doc_id, window_id, doc_offset, win_offset, n_tokens
    FROM packed
    ORDER BY doc_id ASC, window_id ASC
    """,
)
def q311_sequence_packing(spark, sf_dir):
    """operators/packing.pack_token_stream: every document's token
    span mapped to its context windows — one exclusive prefix sum
    (range-partitioned two-pass, no global window) + map-side span
    arithmetic."""
    from ..operators.packing import pack_token_stream

    docs = T(spark, sf_dir, "documents")
    return pack_token_stream(
        docs, "doc_id", "n_chars", capacity=_PACK_CAP
    ).orderBy("doc_id", "window_id")


@query(
    "q312_packing_stats",
    oracle=f"""
    WITH {_PACK_SPANS_SQL.strip()}
    SELECT window_id,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
      CAST(SUM(CASE WHEN win_offset + n_tokens = {_PACK_CAP}
               THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs,
      CAST(FLOOR(CAST(SUM(n_tokens) AS DOUBLE) / {_PACK_CAP}.0
           * 1000000 + 0.5) / 1000000 AS DOUBLE) AS fill
    FROM packed
    GROUP BY window_id
    ORDER BY window_id ASC
    """,
)
def q312_packing_stats(spark, sf_dir):
    """operators/packing.packing_stats: the per-window batch
    diagnostic — every window but the last must report fill = 1.0
    (gapless chunking)."""
    from ..operators.packing import pack_token_stream, packing_stats
    from ..operators.similarity import stable_round6

    docs = T(spark, sf_dir, "documents")
    packed = pack_token_stream(docs, "doc_id", "n_chars", capacity=_PACK_CAP)
    return packing_stats(packed, capacity=_PACK_CAP).select(
        "window_id",
        "n_docs",
        "n_tokens",
        "n_boundary_docs",
        stable_round6(F.col("fill")).alias("fill"),
    ).orderBy("window_id")


# ---------------------------------------------------------------------------
# q313 — domain-mixture reweighting (operators/mixing): measured
# corpus shares vs a fixed target mix → sampling weights, token
# allocations, effective epochs. One keyed aggregate over the corpus;
# everything else is |domains|-row arithmetic.
# ---------------------------------------------------------------------------
_MIX_TARGET = {
    "src0": 0.4,
    "src1": 0.3,
    "src2": 0.15,
    "src3": 0.1,
    "src4": 0.05,
}
_MIX_BUDGET = 1_000_000

_MIX_TARGET_SQL = " ".join(
    f"WHEN '{k}' THEN CAST({v} AS DOUBLE)" for k, v in sorted(_MIX_TARGET.items())
)


@query(
    "q313_domain_mixture",
    oracle=f"""
    WITH per_domain AS (
      SELECT source AS domain,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS n_tokens
      FROM documents
      WHERE n_chars IS NOT NULL AND n_chars > 0
      GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS corpus FROM per_domain),
    j AS (
      SELECT d.*, t.corpus,
        CAST(d.n_tokens AS DOUBLE) / CAST(t.corpus AS DOUBLE) AS cur,
        CASE d.domain {_MIX_TARGET_SQL} ELSE CAST(0.0 AS DOUBLE) END AS tgt
      FROM per_domain d CROSS JOIN tot t
    )
    SELECT domain, n_docs, n_tokens,
      CAST(FLOOR(cur * 1000000 + 0.5) / 1000000 AS DOUBLE) AS current_share,
      tgt AS target_share,
      CAST(FLOOR((tgt / cur) * 1000000 + 0.5) / 1000000 AS DOUBLE) AS weight,
      CAST(FLOOR(tgt * CAST({_MIX_BUDGET} AS DOUBLE)) AS BIGINT)
        AS allocated_tokens,
      CAST(FLOOR(CAST(FLOOR(tgt * CAST({_MIX_BUDGET} AS DOUBLE)) AS DOUBLE)
           / CAST(n_tokens AS DOUBLE) * 1000000 + 0.5) / 1000000 AS DOUBLE)
        AS epochs
    FROM j
    ORDER BY domain ASC
    """,
)
def q313_domain_mixture(spark, sf_dir):
    """operators/mixing.domain_mix_report: src0-src4 upweighted to a
    fixed 40/30/15/10/5 target mix over a 1M-token budget; the other
    fifteen sources drop to weight 0. Epochs > 1 on the upweighted
    domains expose the repetition the budget implies."""
    from ..operators.mixing import domain_mix_report
    from ..operators.similarity import stable_round6

    docs = T(spark, sf_dir, "documents")
    rep = domain_mix_report(
        docs, "source", "n_chars", _MIX_TARGET, _MIX_BUDGET
    )
    return rep.select(
        "domain",
        "n_docs",
        "n_tokens",
        stable_round6(F.col("current_share")).alias("current_share"),
        "target_share",
        stable_round6(F.col("weight")).alias("weight"),
        "allocated_tokens",
        stable_round6(F.col("epochs")).alias("epochs"),
    ).orderBy("domain")


# ---------------------------------------------------------------------------
# q343 — ExactSubstr repeated-substring REMOVAL (Lee et al. 2022,
# "Deduplicating Training Data Makes Language Models Better"): spans
# of >= n tokens duplicated across >= min_docs documents are cut out
# of EVERY document, keeping the rest. A shared license block is
# appended to every 3rd document and a shared header prepended to
# every 4th, so the removal provably strips exactly those runs (plus
# any organic cross-doc duplicated 8-grams, replayed identically by
# the oracle); cleaned text proven md5-byte-exact.
# ---------------------------------------------------------------------------
_Q343_HEADER = "terms of service apply to all content herein"
_Q343_LICENSE = (
    "this document is provided under the creative commons"
    " attribution license"
)


@query(
    "q343_exact_substr_removal",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id,
        CASE WHEN doc_id % 4 = 0 THEN '{_Q343_HEADER} ' ELSE '' END
        || text ||
        CASE WHEN doc_id % 3 = 0 THEN ' {_Q343_LICENSE}' ELSE '' END
        AS text
      FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL
    ),
    w AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM docs),
    toks AS (
      SELECT doc_id, unnest(ws) AS tok,
        unnest(generate_series(1, len(ws))) AS tpos
      FROM w
    ),
    grams AS (
      SELECT doc_id,
        unnest([array_to_string(ws[i:i+7], ' ')
                for i in range(1, len(ws) - 6)]) AS gram,
        unnest(generate_series(1, len(ws) - 7)) AS pos
      FROM w WHERE len(ws) >= 8
    ),
    hot AS (
      SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM grams)
      GROUP BY gram HAVING COUNT(*) >= 2
    ),
    hits AS (
      SELECT g.doc_id, g.pos FROM grams g JOIN hot USING (gram)
    ),
    covered AS (
      SELECT DISTINCT doc_id,
        unnest(generate_series(pos, pos + 7)) AS cpos
      FROM hits
    ),
    kept AS (
      SELECT t.doc_id, t.tpos, t.tok
      FROM toks t ANTI JOIN covered c
        ON c.doc_id = t.doc_id AND c.cpos = t.tpos
    ),
    rebuilt AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS text,
        CAST(COUNT(*) AS BIGINT) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT w.doc_id,
      md5(COALESCE(r.text, '')) AS text_md5,
      CAST(length(COALESCE(r.text, '')) AS BIGINT) AS text_len,
      CAST(len(w.ws) - COALESCE(r.n_kept, 0) AS BIGINT)
        AS n_tokens_removed
    FROM w LEFT JOIN rebuilt r ON r.doc_id = w.doc_id
    ORDER BY w.doc_id ASC
    """,
)
def q343_exact_substr_removal(spark, sf_dir):
    """operators/dedup.trim_repeated_passages over documents with an
    injected cross-corpus license block (every 3rd doc) and header
    (every 4th): word 8-grams appearing in >= 2 distinct documents
    mark their token positions for removal, overlapping hot spans
    merge via per-position coverage, and the text is rebuilt from
    surviving tokens in order — the ExactSubstr pass, hash-gated on
    the full cleaned text."""
    from ..operators.dedup import trim_repeated_passages

    d = T(spark, sf_dir, "documents")
    key = F.col("doc_id")
    docs = d.filter(
        F.col("text").isNotNull() & key.isNotNull()
    ).select(
        "doc_id",
        F.concat(
            F.when(key % 4 == 0, F.lit(_Q343_HEADER + " ")).otherwise(
                F.lit("")
            ),
            F.col("text"),
            F.when(key % 3 == 0, F.lit(" " + _Q343_LICENSE)).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    out = trim_repeated_passages(docs, "doc_id", "text", n=8, min_docs=2)
    return out.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.length("text").cast("bigint").alias("text_len"),
        F.col("n_tokens_removed").cast("bigint"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q345 — ExactSubstr in the PAPER's counting mode: Lee et al. 2022
# build one suffix array over the concatenated corpus, so a run
# repeated twice WITHIN a single document is a duplicate (the
# cross-doc q343 tier cannot see it). Every 6th document gets its own
# first 12 tokens appended — a pure self-repeat — and occurrence
# counting must strip both copies; cleaned text md5-byte-exact.
# ---------------------------------------------------------------------------
@query(
    "q345_exact_substr_occurrences",
    oracle=r"""
    WITH raw AS (
      SELECT doc_id, text, string_split(trim(text), ' ') AS ws0
      FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL
    ),
    docs AS (
      SELECT doc_id,
        CASE WHEN doc_id % 6 = 0 AND len(ws0) >= 12
          THEN text || ' ' || array_to_string(ws0[1:12], ' ')
          ELSE text END AS text
      FROM raw
    ),
    w AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM docs),
    toks AS (
      SELECT doc_id, unnest(ws) AS tok,
        unnest(generate_series(1, len(ws))) AS tpos
      FROM w
    ),
    grams AS (
      SELECT doc_id,
        unnest([array_to_string(ws[i:i+7], ' ')
                for i in range(1, len(ws) - 6)]) AS gram,
        unnest(generate_series(1, len(ws) - 7)) AS pos
      FROM w WHERE len(ws) >= 8
    ),
    hot AS (
      SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2
    ),
    hits AS (
      SELECT g.doc_id, g.pos FROM grams g JOIN hot USING (gram)
    ),
    covered AS (
      SELECT DISTINCT doc_id,
        unnest(generate_series(pos, pos + 7)) AS cpos
      FROM hits
    ),
    kept AS (
      SELECT t.doc_id, t.tpos, t.tok
      FROM toks t ANTI JOIN covered c
        ON c.doc_id = t.doc_id AND c.cpos = t.tpos
    ),
    rebuilt AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS text,
        CAST(COUNT(*) AS BIGINT) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT w.doc_id,
      md5(COALESCE(r.text, '')) AS text_md5,
      CAST(length(COALESCE(r.text, '')) AS BIGINT) AS text_len,
      CAST(len(w.ws) - COALESCE(r.n_kept, 0) AS BIGINT)
        AS n_tokens_removed
    FROM w LEFT JOIN rebuilt r ON r.doc_id = w.doc_id
    ORDER BY w.doc_id ASC
    """,
)
def q345_exact_substr_occurrences(spark, sf_dir):
    """operators/dedup.trim_repeated_passages(count_mode=
    "occurrences") over documents with a self-repeat injected into
    every 6th doc (its own first 12 tokens appended): total-
    occurrence counting — the suffix-array-over-the-concatenated-
    corpus semantics — removes within-doc repeats the cross-doc tier
    cannot see."""
    from ..operators.dedup import trim_repeated_passages

    d = T(spark, sf_dir, "documents")
    key = F.col("doc_id")
    ws0 = F.split(F.trim(F.col("text")), " ")
    docs = d.filter(
        F.col("text").isNotNull() & key.isNotNull()
    ).select(
        "doc_id",
        F.when(
            (key % 6 == 0) & (F.size(ws0) >= 12),
            F.concat(
                F.col("text"),
                F.lit(" "),
                F.concat_ws(" ", F.slice(ws0, 1, 12)),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    out = trim_repeated_passages(
        docs, "doc_id", "text", n=8, min_docs=2,
        count_mode="occurrences",
    )
    return out.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.length("text").cast("bigint").alias("text_len"),
        F.col("n_tokens_removed").cast("bigint"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q346 — soft-deduplication reweighting (SoftDeDup, He et al. 2024):
# instead of dropping duplicated documents, weight them down by the
# mean corpus-wide occurrence count of their word 8-grams, so common
# content trains at ~1/k the rate. The q343 license block is injected
# into every 3rd doc so commonness genuinely varies.
# ---------------------------------------------------------------------------
@query(
    "q346_softdedup_weights",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id,
        text ||
        CASE WHEN doc_id % 3 = 0 THEN ' {_Q343_LICENSE}' ELSE '' END
        AS text
      FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL
    ),
    w AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM docs),
    grams AS (
      SELECT doc_id,
        unnest([array_to_string(ws[i:i+7], ' ')
                for i in range(1, len(ws) - 6)]) AS gram
      FROM w WHERE len(ws) >= 8
    ),
    counts AS (
      SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM grams GROUP BY gram
    ),
    per_doc AS (
      SELECT g.doc_id,
        CAST(COUNT(*) AS BIGINT) AS n_grams,
        CAST(SUM(c.cnt) AS BIGINT) AS cnt_sum
      FROM grams g JOIN counts c ON c.gram = g.gram
      GROUP BY g.doc_id
    ),
    sig AS (
      SELECT w.doc_id,
        COALESCE(p.n_grams, 0) AS n_grams,
        COALESCE(
          FLOOR(CAST(p.cnt_sum AS DOUBLE) / CAST(p.n_grams AS DOUBLE)
                * 1000000 + 0.5) / 1000000, 1.0) AS commonness,
        COALESCE(
          FLOOR(1.0 / (FLOOR(CAST(p.cnt_sum AS DOUBLE)
                / CAST(p.n_grams AS DOUBLE) * 1000000 + 0.5) / 1000000)
                * 1000000 + 0.5) / 1000000, 1.0) AS weight
      FROM w LEFT JOIN per_doc p ON p.doc_id = w.doc_id
    )
    SELECT doc_id, n_grams,
      CAST(commonness AS DOUBLE) AS commonness,
      CAST(weight AS DOUBLE) AS weight
    FROM sig
    ORDER BY doc_id ASC
    """,
)
def q346_softdedup_weights(spark, sf_dir):
    """operators/sampling.softdedup_weights over documents with the
    q343 license block injected into every 3rd doc: per-doc mean
    corpus-wide 8-gram occurrence count (commonness) and the
    1/commonness sampling weight, both stable_round6."""
    from ..operators.sampling import softdedup_weights

    d = T(spark, sf_dir, "documents")
    key = F.col("doc_id")
    docs = d.filter(
        F.col("text").isNotNull() & key.isNotNull()
    ).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(key % 3 == 0, F.lit(" " + _Q343_LICENSE)).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    return softdedup_weights(docs, "doc_id", "text", n=8).orderBy(
        "doc_id"
    )
