"""q336/q337 — the end-to-end pretraining-data pipeline capstone
(round 10; round 11 adds the normalize and PII stages): Unicode
normalize → langid → Gopher quality → exact dedup → winnowing
near-dedup → decontaminated split → DSIR selection → per-source
token-budget mixture → PII redaction → sequence packing →
datasheet, composed from the individually gated tiers (q342/q317/
q298/q40/q333/q316/q326/q215/q131/q311/q332) and verified
END-TO-END by one DuckDB replay of the whole chain — every stage's
survivor set feeds the next stage's CTE, so a single wrong survivor
anywhere flips the value hash.

Reference parity: the reference has no training-data pipeline; this
is the driver-mandated composition capstone (the q200/q319 precedent
extended to the full chain).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.normalize import normalize_sql_expr
from ..operators.pii import PII_PATTERNS
from ..operators.pretrain_pipeline import (
    BUDGET_PER_SOURCE,
    PACK_CAPACITY,
    QUALITY_MAX_DUP_FRAC,
    QUALITY_MAX_TOP_FRAC,
    pretrain_pipeline_census,
    pretrain_pipeline_stages,
)
from . import query
from ._helpers import T

# NOTE (round 12): an earlier draft memoized the 11-stage dict per
# (applicationId, sf_dir) so q337 could reuse q336's checkpointed
# frames. That is result caching across bench invocations — timed
# runs 2..n replayed materialized frames instead of computing from
# the parquet inputs — so it was removed; every invocation computes
# its own chain. (q337 only materializes stages 1..8b: the packed
# frame is lazy and the datasheet never touches it.)


def _redact_sql(expr: str) -> str:
    """The redact_pii chain in DuckDB (q131's oracle, re-pointed):
    fixed PII_PATTERNS order, global flag."""
    for k, pat in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '[{k.upper()}]', 'g')"
    return expr


_HITS_SQL = " + ".join(
    f"len(regexp_extract_all(text, '{pat}'))" for _, pat in PII_PATTERNS
)

# ---------------------------------------------------------------------------
# The oracle chain: one CTE block per stage, each reading the
# previous stage's survivors. Every block is the (already gated)
# oracle of the corresponding single-stage query, re-pointed at the
# upstream relation: langid = q319, gopher = q298, exact dedup =
# q200, winnowing CC = q333, simhash decontam = q316, DSIR = q326,
# token budget = q215, packing = q311, datasheet = q332.
# ---------------------------------------------------------------------------
_PIPELINE_CTES = f"""
    s1 AS MATERIALIZED (
      SELECT doc_id, text, lang, source, n_chars FROM documents
      WHERE text IS NOT NULL AND doc_id IS NOT NULL
    ),
    s1b AS MATERIALIZED (
      SELECT doc_id, text, lang, source,
        CAST(LENGTH(text) AS BIGINT) AS n_chars
      FROM (
        SELECT doc_id, {normalize_sql_expr("text")} AS text,
          lang, source
        FROM s1)
      WHERE LENGTH(text) > 0
    ),
    lbase AS MATERIALIZED (
      SELECT doc_id, lang,
        regexp_replace(lower(text), '\\s+', ' ', 'g') AS t
      FROM s1b
    ),
    lprof AS MATERIALIZED (
      SELECT lang, gram,
        row_number() OVER (
          PARTITION BY lang ORDER BY COUNT(*) DESC, gram ASC
        ) AS lrank
      FROM (
        SELECT lang,
          unnest(list_transform(range(1, length(t) - 1),
                                i -> substr(t, i, 3))) AS gram
        FROM lbase WHERE lang IS NOT NULL AND length(t) >= 3
      )
      GROUP BY lang, gram
      QUALIFY lrank <= 100
    ),
    ldoc AS MATERIALIZED (
      SELECT doc_id, gram,
        row_number() OVER (
          PARTITION BY doc_id ORDER BY COUNT(*) DESC, gram ASC
        ) AS drank
      FROM (
        SELECT doc_id,
          unnest(list_transform(range(1, length(t) - 1),
                                i -> substr(t, i, 3))) AS gram
        FROM lbase WHERE length(t) >= 3
      )
      GROUP BY doc_id, gram
      QUALIFY drank <= 100
    ),
    lper AS (SELECT doc_id, COUNT(*) AS kdoc FROM ldoc GROUP BY 1),
    lmatch AS (
      SELECT d.doc_id, p.lang,
        SUM(ABS(d.drank - p.lrank)) AS msum, COUNT(*) AS mcnt
      FROM ldoc d JOIN lprof p USING (gram)
      GROUP BY 1, 2
    ),
    lbest AS (
      SELECT pd.doc_id, l.lang AS pred_lang,
        row_number() OVER (
          PARTITION BY pd.doc_id
          ORDER BY COALESCE(m.msum, 0)
                   + 100 * (pd.kdoc - COALESCE(m.mcnt, 0)) ASC,
                   l.lang ASC
        ) AS rk
      FROM lper pd
      CROSS JOIN (SELECT DISTINCT lang FROM lprof) l
      LEFT JOIN lmatch m ON m.doc_id = pd.doc_id AND m.lang = l.lang
      QUALIFY rk = 1
    ),
    s2 AS MATERIALIZED (
      SELECT s1b.* FROM s1b
      JOIN lbest ON lbest.doc_id = s1b.doc_id
      WHERE lbest.pred_lang = s1b.lang
    ),
    gdocs AS (
      SELECT doc_id, length(text) AS L,
        list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                    x -> x <> '') AS ws
      FROM s2
    ),
    gw AS MATERIALIZED (SELECT * FROM gdocs WHERE len(ws) >= 5),
    g2 AS (
      SELECT doc_id,
        unnest([array_to_string(ws[i:i+1], ' ')
                for i in range(1, len(ws))]) AS gram
      FROM gw
    ),
    c2 AS (
      SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS c
      FROM g2 GROUP BY 1, 2
    ),
    m2 AS (SELECT doc_id, MAX(c) AS mc FROM c2 GROUP BY 1),
    t2 AS (
      SELECT c2.doc_id, MIN(c2.gram) AS top_gram, MAX(m2.mc) AS tc
      FROM c2 JOIN m2 ON m2.doc_id = c2.doc_id AND c2.c = m2.mc
      GROUP BY 1
    ),
    g5 AS (
      SELECT doc_id,
        unnest([array_to_string(ws[i:i+4], ' ')
                for i in range(1, len(ws) - 3)]) AS gram
      FROM gw
    ),
    c5 AS (
      SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS c
      FROM g5 GROUP BY 1, 2
    ),
    d5 AS (
      SELECT doc_id, CAST(SUM(c * length(gram)) AS BIGINT) AS dc
      FROM c5 WHERE c > 1 GROUP BY 1
    ),
    gscore AS (
      SELECT gw.doc_id,
        FLOOR(CAST(t2.tc AS DOUBLE) * CAST(length(t2.top_gram) AS DOUBLE)
              / CAST(gw.L AS DOUBLE) * 1000000 + 0.5) / 1000000
          AS top_frac,
        FLOOR(CAST(COALESCE(d5.dc, 0) AS DOUBLE)
              / CAST(gw.L AS DOUBLE) * 1000000 + 0.5) / 1000000
          AS dup_frac
      FROM gw
      JOIN t2 ON t2.doc_id = gw.doc_id
      LEFT JOIN d5 ON d5.doc_id = gw.doc_id
    ),
    s3 AS MATERIALIZED (
      SELECT s2.* FROM s2
      JOIN gscore g ON g.doc_id = s2.doc_id
      WHERE g.top_frac <= {QUALITY_MAX_TOP_FRAC}
        AND g.dup_frac <= {QUALITY_MAX_DUP_FRAC}
    ),
    s4 AS MATERIALIZED (
      SELECT doc_id, text, lang, source, n_chars FROM (
        SELECT s3.*,
          row_number() OVER (
            PARTITION BY md5(lower(trim(text))) ORDER BY doc_id ASC
          ) AS rn
        FROM s3
      ) WHERE rn = 1
    ),
    wsh AS (
      SELECT doc_id,
        len(string_split(trim(text), ' ')) - 2 AS n,
        list_transform(range(1, len(string_split(trim(text), ' ')) - 1),
          i -> struct_pack(
            idx := i,
            h := CAST(('0x' || substr(md5(array_to_string(
              list_slice(string_split(trim(text), ' '), i, i + 2), ' ')),
              1, 15)) AS UBIGINT)::BIGINT)
        ) AS hs
      FROM s4
      WHERE len(string_split(trim(text), ' ')) >= 3
    ),
    whx AS (SELECT doc_id, n, unnest(hs, recursive := true) FROM wsh),
    wmemb AS (
      SELECT doc_id, idx, h, idx + s.s AS win
      FROM whx CROSS JOIN (SELECT unnest(range(-3, 1)) AS s) s
      WHERE idx + s.s >= 1 AND idx + s.s <= GREATEST(n - 3, 1)
    ),
    wsel AS (
      SELECT doc_id, win, idx, h,
        ROW_NUMBER() OVER (PARTITION BY doc_id, win
                           ORDER BY h ASC, idx DESC) AS rn
      FROM wmemb
    ),
    wfp AS (SELECT DISTINCT doc_id, h FROM wsel WHERE rn = 1),
    wdfreq AS (SELECT h FROM wfp GROUP BY h HAVING COUNT(*) <= 100),
    wkept AS (SELECT wfp.doc_id, wfp.h FROM wfp JOIN wdfreq USING (h)),
    wnfp AS (
      SELECT doc_id, COUNT(*) AS n_fp FROM wkept GROUP BY doc_id
    ),
    wraw AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      FROM wkept a JOIN wkept b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    wpairs AS (
      SELECT p.id_a, p.id_b
      FROM wraw p JOIN wnfp na ON na.doc_id = p.id_a
                  JOIN wnfp nb ON nb.doc_id = p.id_b
      WHERE CAST(p.shared AS DOUBLE) / LEAST(na.n_fp, nb.n_fp) >= 0.5
    ),
    wsym AS (
      SELECT id_a AS u, id_b AS v FROM wpairs
      UNION
      SELECT id_b AS u, id_a AS v FROM wpairs
    ),
    wreach(u, v) AS (
      SELECT u, v FROM wsym
      UNION
      SELECT r.u, s.v FROM wreach r JOIN wsym s ON r.v = s.u
      WHERE s.v <> r.u
    ),
    wlab AS (
      SELECT u AS id, LEAST(u, MIN(v)) AS comp FROM wreach GROUP BY u
    ),
    wlosers AS (SELECT id FROM wlab WHERE comp <> id),
    s5 AS MATERIALIZED (
      SELECT s4.* FROM s4
      LEFT JOIN wlosers l ON l.id = s4.doc_id
      WHERE l.id IS NULL
    ),
    xsh AS (
      SELECT doc_id,
        list_distinct(list_transform(
          range(1, len(string_split(trim(text), ' ')) - 1),
          i -> array_to_string(
            list_slice(string_split(trim(text), ' '), i, i + 2), ' ')
        )) AS shingles
      FROM s5
      WHERE len(string_split(trim(text), ' ')) >= 3
    ),
    xex AS (SELECT doc_id, unnest(shingles) AS shingle FROM xsh),
    xh AS (
      SELECT doc_id,
        CAST(('0x' || substr(md5(shingle), 1, 15)) AS UBIGINT)::BIGINT
          AS h
      FROM xex
    ),
    xbits AS (
      SELECT doc_id, b.b,
        SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM xh CROSS JOIN (SELECT unnest(range(0, 60)) AS b) b
      GROUP BY doc_id, b.b
    ),
    xfp AS (
      SELECT doc_id,
        SUM(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS simhash
      FROM xbits GROUP BY doc_id
    ),
    xbands AS (
      SELECT doc_id, simhash, band.i AS band,
        (simhash >> (15 * band.i)) & 32767 AS key
      FROM xfp CROSS JOIN (SELECT unnest(range(0, 4)) AS i) band
    ),
    xpairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM xbands a
      JOIN xbands b ON a.band = b.band AND a.key = b.key
        AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    ),
    xsplit AS MATERIALIZED (
      SELECT doc_id,
        CASE WHEN (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   ::UBIGINT % 100) < 20
             THEN 'test' ELSE 'train' END AS split
      FROM s5
    ),
    xsym AS (
      SELECT id_a, id_b FROM xpairs
      UNION ALL
      SELECT id_b AS id_a, id_a AS id_b FROM xpairs
    ),
    xdropped AS (
      SELECT xsym.id_a AS doc_id
      FROM xsym
      JOIN xsplit sa ON sa.doc_id = xsym.id_a AND sa.split = 'train'
      JOIN xsplit sb ON sb.doc_id = xsym.id_b AND sb.split = 'test'
      GROUP BY xsym.id_a
    ),
    s6 AS MATERIALIZED (
      SELECT s5.* FROM s5
      JOIN xsplit ON xsplit.doc_id = s5.doc_id
        AND xsplit.split = 'train'
      LEFT JOIN xdropped xd ON xd.doc_id = s5.doc_id
      WHERE xd.doc_id IS NULL
    ),
    dtok0 AS (
      SELECT doc_id, lang = 'en' AS tgt,
        unnest(string_split_regex(text, '\\s+')) AS w
      FROM s6
    ),
    dtok AS (SELECT doc_id, tgt, w FROM dtok0 WHERE w <> ''),
    dcounts AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c_raw,
        CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS c_tgt
      FROM dtok GROUP BY w
    ),
    dtotals AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS v,
        CAST(SUM(c_raw) AS BIGINT) AS n_raw,
        CAST(SUM(c_tgt) AS BIGINT) AS n_tgt
      FROM dcounts
    ),
    dratios AS (
      SELECT w,
        FLOOR((ln(GREATEST(ROUND(CAST(c_tgt + 1 AS DOUBLE)
                        / CAST(n_tgt + v AS DOUBLE), 6), 1e-6))
             - ln(GREATEST(ROUND(CAST(c_raw + 1 AS DOUBLE)
                        / CAST(n_raw + v AS DOUBLE), 6), 1e-6)))
             * 1000000000.0) / 1000000000.0 AS term
      FROM dcounts CROSS JOIN dtotals
    ),
    dper AS (
      SELECT doc_id, ROUND(list_sum(list_sort(list(term))), 9) AS s
      FROM dtok JOIN dratios USING (w)
      GROUP BY doc_id
    ),
    s7 AS MATERIALIZED (
      SELECT s6.* FROM s6
      JOIN dper ON dper.doc_id = s6.doc_id
      WHERE CAST(ROUND(dper.s, 6) AS DOUBLE) > 0
    ),
    bord AS (
      SELECT doc_id, text, lang, source, n_chars,
        SUM(CAST(n_chars AS BIGINT)) OVER (
          PARTITION BY source
          ORDER BY md5(concat_ws('|', '', CAST(doc_id AS VARCHAR))) ASC,
                   doc_id ASC
          ROWS UNBOUNDED PRECEDING
        ) AS cum_cost
      FROM s7
    ),
    s8 AS MATERIALIZED (
      SELECT doc_id, text, lang, source, n_chars FROM bord
      WHERE cum_cost - CAST(n_chars AS BIGINT) < {BUDGET_PER_SOURCE}
    ),
    s8b AS MATERIALIZED (
      SELECT doc_id, text, lang, source,
        CAST(LENGTH(text) AS BIGINT) AS n_chars
      FROM (
        SELECT doc_id, {_redact_sql("text")} AS text, lang, source
        FROM s8)
    ),
    pdocs AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS len
      FROM s8b WHERE n_chars IS NOT NULL AND n_chars > 0
    ),
    pcum AS (
      SELECT doc_id, len,
        CAST(SUM(len) OVER (ORDER BY doc_id ASC) AS BIGINT) AS e
      FROM pdocs
    ),
    pexp AS (
      SELECT doc_id, e - len AS s, e,
        unnest(range((e - len) // {PACK_CAPACITY},
                     (e - 1) // {PACK_CAPACITY} + 1)) AS window_id
      FROM pcum
    ),
    ppacked AS (
      SELECT doc_id, CAST(window_id AS BIGINT) AS window_id,
        CAST(LEAST(e, (window_id + 1) * {PACK_CAPACITY})
          - GREATEST(s, window_id * {PACK_CAPACITY}) AS BIGINT)
          AS n_tokens
      FROM pexp
    )
"""

_STAGE_ROW = """
      SELECT '{name}' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS n_tokens FROM {rel}
"""

_CENSUS_ORACLE = (
    "WITH RECURSIVE "
    + _PIPELINE_CTES.strip()
    + "\n    SELECT * FROM (\n"
    + "\n      UNION ALL\n".join(
        _STAGE_ROW.format(name=n, rel=r).strip()
        for n, r in [
            ("1_base", "s1"), ("1b_normalize", "s1b"),
            ("2_langid", "s2"), ("3_quality", "s3"),
            ("4_exact_dedup", "s4"), ("5_near_dedup", "s5"),
            ("6_decontam", "s6"), ("7_dsir", "s7"), ("8_mixture", "s8"),
            ("8b_pii", "s8b"),
        ]
    )
    + f"""
      UNION ALL
      SELECT '8c_redactions' AS stage,
        CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_docs,
        CAST(SUM(hits) AS BIGINT) AS n_tokens
      FROM (SELECT {_HITS_SQL} AS hits FROM s8)
      UNION ALL
      SELECT '9_packed' AS stage,
        CAST(COUNT(DISTINCT window_id) AS BIGINT) AS n_docs,
        CAST(SUM(n_tokens) AS BIGINT) AS n_tokens FROM ppacked
    ) ORDER BY stage ASC
"""
)

_DATASHEET_ORACLE = (
    "WITH RECURSIVE "
    + _PIPELINE_CTES.strip()
    + r""",
    fbase AS (
      SELECT lang, source, text, n_chars,
        len(list_filter(string_split_regex(trim(text), '\s+'),
                        w -> w <> '')) AS n_tokens,
        md5(text) AS h
      FROM s8b
    ),
    fdups AS (
      SELECT lang, h, COUNT(*) AS c FROM fbase GROUP BY lang, h
    ),
    fdupagg AS (
      SELECT lang,
        SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_docs,
        SUM(c - 1) AS removable_docs
      FROM fdups GROUP BY lang
    ),
    fvocab AS (
      SELECT lang, COUNT(DISTINCT w) AS distinct_words FROM (
        SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM s8b
      ) WHERE w <> '' GROUP BY lang
    )
    SELECT b.lang,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(COUNT(DISTINCT b.source) AS BIGINT) AS n_sources,
      CAST(SUM(b.n_tokens) AS BIGINT) AS n_tokens,
      CAST(SUM(b.n_chars) AS BIGINT) AS n_chars,
      CAST(MIN(b.n_tokens) AS BIGINT) AS min_tokens,
      CAST(MAX(b.n_tokens) AS BIGINT) AS max_tokens,
      ROUND(CAST(SUM(b.n_tokens) AS DOUBLE) / COUNT(*), 4)
        AS mean_tokens,
      CAST(COALESCE(v.distinct_words, 0) AS BIGINT) AS distinct_words,
      CAST(d.dup_docs AS BIGINT) AS dup_docs,
      CAST(d.removable_docs AS BIGINT) AS removable_docs,
      ROUND(CAST(d.removable_docs AS DOUBLE) / COUNT(*), 6)
        AS dup_rate
    FROM fbase b
    JOIN fdupagg d ON d.lang = b.lang
    LEFT JOIN fvocab v ON v.lang = b.lang
    GROUP BY b.lang, v.distinct_words, d.dup_docs, d.removable_docs
    ORDER BY b.lang ASC
"""
)


@query("q336_pretrain_pipeline_census", oracle=_CENSUS_ORACLE)
def q336_pretrain_pipeline_census(spark, sf_dir):
    """operators/pretrain_pipeline.pretrain_pipeline_census over
    documents: the full curation chain (normalize through packing,
    plus the 8c PII-redaction ledger) with per-stage corpus
    accounting — every stage's exact survivor set is load-bearing
    for the downstream rows, so the value hash certifies the whole
    composition."""
    docs = T(spark, sf_dir, "documents")
    return pretrain_pipeline_census(docs)


@query("q337_pretrain_final_datasheet", oracle=_DATASHEET_ORACLE)
def q337_pretrain_final_datasheet(spark, sf_dir):
    """operators/quality.dataset_datasheet over the pipeline's FINAL
    corpus (stage 8b, post-mixture post-PII-redaction): the release
    datasheet a real pretraining run would ship with the curated
    data — per-language volume, provenance breadth, length profile,
    vocabulary, residual duplicate exposure."""
    from ..operators.quality import dataset_datasheet

    docs = T(spark, sf_dir, "documents")
    s8b = pretrain_pipeline_stages(docs)["8b_pii"]
    return dataset_datasheet(
        s8b, "doc_id", "text", "lang", "source", "n_chars"
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# q342 — the Unicode normalization stage standalone (round 11): NFC
# composition + control/zero-width strip + whitespace fold + trim,
# chars recounted as codepoints. The raw documents are already
# canonical ASCII, so the query wraps each text in deterministic
# Unicode mess (NFD accents, zero-width joiners, NBSP/em-space runs,
# tabs) and the oracle replays the same wrap through DuckDB's
# nfc_normalize + the shared explicit codepoint classes
# (operators/normalize.normalize_sql_expr — never dialect-\s).
# ---------------------------------------------------------------------------
_Q342_PREFIX_SQL = (
    "'  He' || chr(769) || 'llo' || chr(8203) || ' ' || chr(160)"
)
_Q342_SUFFIX_SQL = (
    "chr(9) || chr(9) || 'zero' || chr(8205) || 'width ' "
    "|| chr(8195) || ' end  '"
)
_Q342_PREFIX = "  He\u0301llo\u200b \u00a0"
_Q342_SUFFIX = "\t\tzero\u200dwidth \u2003 end  "


@query(
    "q342_unicode_normalize",
    oracle=f"""
    WITH messy AS (
      SELECT doc_id,
        {_Q342_PREFIX_SQL} || text || {_Q342_SUFFIX_SQL} AS text
      FROM documents WHERE text IS NOT NULL
    ),
    norm AS (
      SELECT doc_id, {normalize_sql_expr("text")} AS text FROM messy
    )
    SELECT doc_id, text, CAST(LENGTH(text) AS BIGINT) AS n_chars
    FROM norm WHERE LENGTH(text) > 0
    ORDER BY doc_id ASC
    """,
)
def q342_unicode_normalize(spark, sf_dir):
    """operators/normalize.normalize_corpus over documents wrapped in
    deterministic Unicode mess: NFC + control/zero-width strip +
    whitespace fold + trim, chars recounted as CODEPOINTS — the
    pipeline's stage-1b cleanup, hash-gated on the full normalized
    text."""
    from ..operators.normalize import normalize_corpus

    docs = T(spark, sf_dir, "documents")
    messy = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.concat(
            F.lit(_Q342_PREFIX), F.col("text"), F.lit(_Q342_SUFFIX)
        ).alias("text"),
        F.lit(0).cast("bigint").alias("n_chars"),
    )
    return normalize_corpus(messy).orderBy("doc_id")
