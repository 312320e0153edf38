"""Sampling/curation declared queries (§2.D training-pipeline tier).

Every query here proves EXACT sample membership against the oracle —
not just counts — because the operators are content-hash- or
order-deterministic by design (operators/sampling docstring). The
md5-bucket arithmetic is replayed verbatim in DuckDB:
Spark ``conv(substring(md5(x), 1, 8), 16, 10) % 100`` ==
DuckDB ``('0x' || substr(md5(x), 1, 8))::UBIGINT % 100``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query
from ._helpers import T

_BUCKET_DUCK = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100)"


@query(
    "q95_train_test_split",
    oracle=f"""
    WITH tagged AS (
      SELECT lang,
        CASE WHEN {_BUCKET_DUCK} < 20 THEN 'test' ELSE 'train' END AS split,
        n_chars
      FROM documents
    )
    SELECT split, lang, COUNT(*) AS n_docs,
      CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM tagged
    GROUP BY split, lang
    ORDER BY split ASC, lang ASC
    """,
)
def q95_train_test_split(spark, sf_dir):
    """Reproducible 80/20 corpus split by doc_id content hash,
    summarized per (split, lang). The split is a map-side projection
    (no shuffle before the rollup) and the oracle verifies EXACT
    membership: a one-document disagreement changes sum_chars."""
    from ..operators.sampling import train_test_split

    docs = T(spark, sf_dir, "documents")
    return (
        train_test_split(docs, "doc_id", test_percent=20)
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .orderBy("split", "lang")
    )


@query(
    "q96_quota_per_source",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
        ROW_NUMBER() OVER (PARTITION BY source
                           ORDER BY n_chars DESC, doc_id ASC) AS rk
      FROM documents
    )
    SELECT doc_id, source, n_chars, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 3
    ORDER BY source ASC, rk ASC
    """,
)
def q96_quota_per_source(spark, sf_dir):
    """Per-source quota sampling: the 3 longest documents per source
    (deterministic tie-break on doc_id) — the domain-cap pass of a
    web-scale corpus. One window shuffle on the group key."""
    from ..operators.sampling import quota_sample

    docs = T(spark, sf_dir, "documents")
    out = quota_sample(
        docs.select("doc_id", "source", "n_chars"),
        ["source"],
        3,
        [F.desc("n_chars"), F.asc("doc_id")],
    )
    return out.select(
        "doc_id", "source", "n_chars", F.col("rk").cast("int").alias("rk")
    ).orderBy("source", "rk")


@query(
    "q97_class_weights",
    oracle="""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ), tot AS (
      SELECT SUM(n) AS total, COUNT(*) AS k FROM counts
    )
    SELECT c.lang, CAST(c.n AS BIGINT) AS n_rows,
      ROUND(CAST(t.total AS DOUBLE) / (t.k * c.n), 6) AS weight
    FROM counts c CROSS JOIN tot t
    ORDER BY c.lang ASC
    """,
)
def q97_class_weights(spark, sf_dir):
    """Inverse-frequency language weights for balanced training:
    weight = N / (K * n_lang), mean 1.0 across classes. Tiny
    aggregates; broadcasting K rows back onto the corpus is free."""
    from ..operators.sampling import class_weights

    docs = T(spark, sf_dir, "documents")
    return class_weights(docs, "lang").orderBy("lang")


@query(
    "q98_benchmark_contamination",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), ' +') AS ws
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
        list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                       for i in range(1, len(ws) - 1)]) AS shingles
      FROM toks WHERE len(ws) >= 3
    ),
    bench AS (SELECT doc_id AS bench_id, shingles AS bsh FROM sh WHERE doc_id < 5),
    cand AS (SELECT doc_id, shingles FROM sh WHERE doc_id >= 5)
    SELECT c.doc_id, b.bench_id,
      CAST(len(list_intersect(c.shingles, b.bsh)) AS INT) AS n_overlap
    FROM cand c CROSS JOIN bench b
    WHERE len(list_intersect(c.shingles, b.bsh)) >= 2
    ORDER BY c.doc_id ASC, b.bench_id ASC
    """,
)
def q98_benchmark_contamination(spark, sf_dir):
    """Decontamination: candidates sharing >= 2 3-word shingles with a
    benchmark set (here: doc_id < 5 standing in for an eval suite).
    The benchmark's shingle sets broadcast; candidates are scored
    map-side — the corpus never shuffles."""
    from ..operators.sampling import contamination_pairs

    docs = T(spark, sf_dir, "documents")
    out = contamination_pairs(
        docs.filter(F.col("doc_id") >= 5),
        docs.filter(F.col("doc_id") < 5),
        min_overlap=2,
    )
    return out.select(
        F.col("id").alias("doc_id"),
        "bench_id",
        F.col("n_overlap").cast("int").alias("n_overlap"),
    ).orderBy("doc_id", "bench_id")


@query(
    "q100_sequence_packing",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
        len(string_split_regex(lower(trim(text)), ' +')) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
        SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id ASC
                            ROWS UNBOUNDED PRECEDING) - n_tokens AS start
      FROM t
    )
    SELECT doc_id, source, CAST(n_tokens AS INT) AS n_tokens,
      CAST(start // 512 AS INT) AS chunk_id,
      CAST(start % 512 AS BIGINT) AS chunk_offset
    FROM c
    ORDER BY source ASC, doc_id ASC
    """,
)
def q100_sequence_packing(spark, sf_dir):
    """Concat-and-chunk packing of the documents corpus into
    512-token chunks per source shard (operators/sampling
    .pack_sequences) — the pretraining batch-layout pass. The oracle
    verifies every document's exact chunk assignment and offset."""
    from ..operators.sampling import pack_sequences

    docs = T(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.lower(F.trim(F.col("text"))), " +")).alias("n_tokens"),
    )
    out = pack_sequences(
        docs, "n_tokens", 512, ["source"], [F.asc("doc_id")]
    )
    return out.select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        "chunk_id",
        F.col("chunk_offset").cast("bigint").alias("chunk_offset"),
    ).orderBy("source", "doc_id")


# ---------------------------------------------------------------------------
# q127 — deterministic weighted sampling (Efraimidis-Spirakis) with
# temperature mixture weights, fully md5-replayable in DuckDB.
# ---------------------------------------------------------------------------
@query(
    "q127_weighted_sample",
    oracle="""
    WITH weighted AS (
      SELECT doc_id, source, n_chars,
        LN((CAST(('0x' || substr(md5('es1' || CAST(doc_id AS VARCHAR)), 1, 8))
            ::UBIGINT AS DOUBLE) + 1.0) / 4294967297.0)
          / CAST(n_chars AS DOUBLE) AS es
      FROM documents
      WHERE n_chars IS NOT NULL AND n_chars > 0
    ), ranked AS (
      SELECT doc_id, source, n_chars,
        ROW_NUMBER() OVER (
          PARTITION BY source ORDER BY es DESC, doc_id ASC
        ) AS rk
      FROM weighted
    )
    SELECT source, CAST(rk AS INT) AS rank,
      CAST(doc_id AS BIGINT) AS doc_id,
      CAST(n_chars AS BIGINT) AS n_chars
    FROM ranked WHERE rk <= 5
    ORDER BY source ASC, rank ASC
    """,
)
def q127_weighted_sample(spark, sf_dir):
    """`sampling.weighted_sample_per_group`: 5 docs per source, drawn
    by the A-ES scheme with weight = n_chars (longer docs more
    likely). The uniform comes from the md5 content hash, so the
    sample is repartition-stable, cluster-shape-independent, and the
    oracle replays the EXACT draw — a verifiable weighted sample.
    One window pass; no global sort."""
    from pyspark.sql.window import Window

    from ..operators.sampling import es_key

    docs = T(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull() & (F.col("n_chars") > 0)
    )
    r = es_key("doc_id", F.col("n_chars").cast("double"), salt="es1")
    w = Window.partitionBy("source").orderBy(F.desc("_es"), F.col("doc_id"))
    return (
        docs.withColumn("_es", r)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .select(
            "source", "rank",
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("n_chars").cast("bigint").alias("n_chars"),
        )
        .orderBy("source", "rank")
    )


# ---------------------------------------------------------------------------
# q326 — DSIR-style importance selection (round 9): log-likelihood
# ratio of every document's tokens under the TARGET (lang='en')
# unigram model vs the raw-corpus model, add-one smoothed over the
# shared vocabulary — the "Data Selection via Importance Resampling"
# scoring pass, deterministic top-k variant. The q181 discipline
# keeps ln engine-exact: integer-ratio probs ROUND-6, per-token
# terms floor-quantized 1e-9, sorted-fold reduction.
# ---------------------------------------------------------------------------
@query(
    "q326_dsir_selection",
    oracle=r"""
    WITH tok0 AS (
      SELECT doc_id, lang = 'en' AS tgt,
        unnest(string_split_regex(text, '\s+')) AS w
      FROM documents
    ),
    tok AS (SELECT doc_id, tgt, w FROM tok0 WHERE w <> ''),
    counts AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c_raw,
        CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS c_tgt
      FROM tok GROUP BY w
    ),
    totals AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS v,
        CAST(SUM(c_raw) AS BIGINT) AS n_raw,
        CAST(SUM(c_tgt) AS BIGINT) AS n_tgt
      FROM counts
    ),
    ratios AS (
      SELECT w,
        FLOOR((ln(GREATEST(ROUND(CAST(c_tgt + 1 AS DOUBLE)
                        / CAST(n_tgt + v AS DOUBLE), 6), 1e-6))
             - ln(GREATEST(ROUND(CAST(c_raw + 1 AS DOUBLE)
                        / CAST(n_raw + v AS DOUBLE), 6), 1e-6)))
             * 1000000000.0) / 1000000000.0 AS term
      FROM counts CROSS JOIN totals
    ),
    per AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        ROUND(list_sum(list_sort(list(term))), 9) AS s
      FROM tok JOIN ratios USING (w)
      GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, CAST(ROUND(s, 6) AS DOUBLE) AS log_ratio
    FROM per
    ORDER BY log_ratio DESC, doc_id ASC
    LIMIT 50
    """,
)
def q326_dsir_selection(spark, sf_dir):
    """operators/sampling.dsir_importance over documents with the
    lang='en' target model: the 50 most target-like documents by
    unigram log-likelihood ratio."""
    from ..operators.sampling import dsir_importance

    docs = T(spark, sf_dir, "documents").withColumn(
        "_is_tgt", F.col("lang") == "en"
    )
    out = dsir_importance(docs, "doc_id", "text", "_is_tgt")
    return (
        out.select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "n_tokens",
            "log_ratio",
        )
        .orderBy(F.desc("log_ratio"), F.asc("doc_id"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# q327 — interleaved curriculum order (round 9): per-domain rank by
# descending difficulty signal, emitted in round-robin rounds so
# every training batch sees all domains at matched difficulty. The
# only window is keyed by domain; the global order is a sort key
# (TakeOrderedAndProject at any scale), never a global row_number.
# ---------------------------------------------------------------------------
@query(
    "q327_curriculum_interleave",
    oracle="""
    SELECT * FROM (
      SELECT CAST(ROW_NUMBER() OVER (
          PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC
        ) AS BIGINT) AS round,
        lang,
        CAST(doc_id AS BIGINT) AS doc_id,
        CAST(n_chars AS BIGINT) AS score
      FROM documents
    )
    ORDER BY round ASC, lang ASC, doc_id ASC
    LIMIT 100
    """,
)
def q327_curriculum_interleave(spark, sf_dir):
    """operators/sampling.curriculum_interleave over documents
    (domain = lang, difficulty = n_chars): the first 100 rows of the
    round-robin curriculum."""
    from ..operators.sampling import curriculum_interleave

    docs = T(spark, sf_dir, "documents")
    out = curriculum_interleave(docs, "doc_id", "lang", "n_chars")
    return (
        out.select(
            "round",
            "lang",
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("score").cast("bigint").alias("score"),
        )
        .orderBy("round", "lang", "doc_id")
        .limit(100)
    )
