"""Dedup suite entries (SURVEY.md §2.D).

Exact dedup and exact n-gram Jaccard are oracle-checked; MinHash LSH
and SimHash are approximate-by-construction → declared non-oracle
(rows-only check), per SURVEY §2 contract note.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query
from ..operators.dedup import (
    kmv_jaccard_pairs,
    exact_dedup,
    minhash_neardup_pairs,
    ngram_jaccard_pairs,
    ppjoin_jaccard_pairs,
    simhash_neardup_pairs,
)
from ._helpers import T


# ---------------------------------------------------------------------------
# q40 — exact dedup by key with deterministic representative.
# ---------------------------------------------------------------------------
@query(
    "q40_exact_dedup_events",
    oracle="""
    SELECT user_id, event_type,
      CAST(MIN(event_id) AS BIGINT) AS first_event_id,
      COUNT(*) AS n_occurrences
    FROM events
    GROUP BY user_id, event_type
    ORDER BY user_id ASC, event_type ASC
    """,
)
def q40_exact_dedup_events(spark, sf_dir):
    """Exact dedup of the event log on (user_id, event_type), keeping
    the earliest event id and reporting the duplicate mass — the
    hash-groupBy dedup tier."""
    ev = T(spark, sf_dir, "events")
    deduped = exact_dedup(ev.select("user_id", "event_type", "event_id"),
                          ["user_id", "event_type"], "event_id")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    return (
        deduped.withColumnRenamed("event_id", "first_event_id")
        .join(counts, ["user_id", "event_type"])
        .select(
            "user_id",
            "event_type",
            F.col("first_event_id").cast("bigint"),
            "n_occurrences",
        )
        .orderBy("user_id", "event_type")
    )


# ---------------------------------------------------------------------------
# q41 — exact 3-gram Jaccard near-dup pairs, blocked by source.
# ---------------------------------------------------------------------------
@query(
    "q41_ngram_jaccard_pairs",
    oracle="""
    WITH sh AS (
      SELECT doc_id, source,
        list_distinct(list_transform(
          range(1, len(string_split(trim(text), ' ')) - 1),
          i -> array_to_string(list_slice(string_split(trim(text), ' '), i, i + 2), ' ')
        )) AS shingles
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / CAST(NULLIF(len(a.shingles) + len(b.shingles)
                          - len(list_intersect(a.shingles, b.shingles)), 0) AS DOUBLE), 4) AS jaccard
    FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
          / CAST(NULLIF(len(a.shingles) + len(b.shingles)
                        - len(list_intersect(a.shingles, b.shingles)), 0) AS DOUBLE) >= 0.2
    ORDER BY jaccard DESC, id_a ASC, id_b ASC
    """,
)
def q41_ngram_jaccard_pairs(spark, sf_dir):
    """Near-duplicate pairs by exact 3-word-shingle Jaccard within a
    source block. Integer set arithmetic → deterministic score."""
    docs = T(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, id_col="doc_id", text_col="text", block_cols=["source"], k=3, threshold=0.2,
        # oracle-exact at ANY scale factor: the DuckDB twin computes
        # unfiltered Jaccard, so the declared query disables the
        # stop-shingle cap (an operator-API scale knob, not query semantics)
        max_shingle_df=None,
    ).selectExpr("CAST(id_a AS BIGINT) AS id_a", "CAST(id_b AS BIGINT) AS id_b", "jaccard")


# ---------------------------------------------------------------------------
# q42 — MinHash LSH near-dup (approximate → rows-only check).
# ---------------------------------------------------------------------------
@query("q42_minhash_neardup")
def q42_minhash_neardup(spark, sf_dir):
    """MinHash LSH near-duplicate candidates over documents
    (shingle → binary TF → banded MinHash join). Approximate candidate
    set ⇒ no DuckDB oracle; the exact-Jaccard twin (q41) is the
    hash-checked tier."""
    docs = T(spark, sf_dir, "documents")
    return minhash_neardup_pairs(docs, id_col="doc_id", text_col="text", k=3)


# ---------------------------------------------------------------------------
# q43 — SimHash near-dup (approximate → rows-only check).
# ---------------------------------------------------------------------------
@query("q43_simhash_neardup")
def q43_simhash_neardup(spark, sf_dir):
    """SimHash(64) near-duplicate pairs via 16-bit band blocking +
    Hamming verify — fully JVM-side column expressions."""
    docs = T(spark, sf_dir, "documents")
    return simhash_neardup_pairs(docs, id_col="doc_id", text_col="text", k=3, max_hamming=3)


# ---------------------------------------------------------------------------
# q77/q78 — near-dup pairs -> connected components -> canonical keep.
# Oracle: DuckDB recursive-CTE transitive closure with min-label
# components (exact at gate scale; the Spark side is the O(log n)
# large-star/small-star algorithm that survives 100 TB).
# ---------------------------------------------------------------------------
_PAIRS_CTE = """
    sh AS (
      SELECT doc_id, source,
        list_distinct(list_transform(
          range(1, len(string_split(trim(text), ' ')) - 1),
          i -> array_to_string(list_slice(string_split(trim(text), ' '), i, i + 2), ' ')
        )) AS shingles
      FROM documents
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / CAST(NULLIF(len(a.shingles) + len(b.shingles)
                          - len(list_intersect(a.shingles, b.shingles)), 0) AS DOUBLE) >= 0.2
    ),
    sym AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM sym
      UNION
      SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u WHERE s.v <> r.u
    ),
    lab AS (
      SELECT u AS id, LEAST(u, MIN(v)) AS comp FROM reach GROUP BY u
    )
"""


@query(
    "q77_neardup_clusters",
    oracle=f"""
    WITH RECURSIVE {_PAIRS_CTE}
    SELECT CAST(comp AS BIGINT) AS comp, COUNT(*) AS n_docs
    FROM lab GROUP BY comp ORDER BY comp ASC
    """,
)
def q77_neardup_clusters(spark, sf_dir):
    """Near-dup clusters: q41's exact-Jaccard pairs fed through
    large-star/small-star connected components; one row per cluster
    with its min-doc-id label and member count."""
    from ..operators.dedup import connected_components

    docs = T(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, id_col="doc_id", text_col="text", block_cols=["source"], k=3, threshold=0.2,
        # oracle-exact at ANY scale factor: the DuckDB twin computes
        # unfiltered Jaccard, so the declared query disables the
        # stop-shingle cap (an operator-API scale knob, not query semantics)
        max_shingle_df=None,
    )
    comps = connected_components(pairs)
    return (
        comps.groupBy(F.col("comp").cast("bigint").alias("comp"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("comp")
    )


@query(
    "q78_near_dedup_survivors",
    oracle=f"""
    WITH RECURSIVE {_PAIRS_CTE},
    losers AS (SELECT id FROM lab WHERE comp <> id)
    SELECT d.source, COUNT(*) AS n_docs
    FROM documents d LEFT JOIN losers l ON d.doc_id = l.id
    WHERE l.id IS NULL
    GROUP BY d.source ORDER BY d.source ASC
    """,
)
def q78_near_dedup_survivors(spark, sf_dir):
    """End-to-end near-dedup: drop every non-canonical cluster member
    (min doc id survives) and count surviving documents per source —
    the shape of a real training-data dedup pass."""
    from ..operators.dedup import dedup_by_components

    docs = T(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, id_col="doc_id", text_col="text", block_cols=["source"], k=3, threshold=0.2,
        # oracle-exact at ANY scale factor: the DuckDB twin computes
        # unfiltered Jaccard, so the declared query disables the
        # stop-shingle cap (an operator-API scale knob, not query semantics)
        max_shingle_df=None,
    )
    return (
        dedup_by_components(docs, pairs, "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q199 — bottom-k (KMV) Jaccard near-dup: the APPROXIMATE tier that
# still hash-matches. Same 3-word shingles AND source blocking as
# q41; md5-ordered bottom-32 sketches; candidates share a sketch
# hash within the block; score is the bottom-k estimator over the
# merged sketch. Where xxhash LSH (q42/
# q43) can only get a rows-only check, md5-order arithmetic replays
# exactly in DuckDB — an oracle-gated approximate dedup.
# ---------------------------------------------------------------------------
@query(
    "q199_kmv_jaccard_neardup",
    oracle="""
    WITH sh AS (
      SELECT doc_id, source,
        unnest(list_distinct(list_transform(
          range(1, len(string_split(trim(text), ' ')) - 1),
          i -> array_to_string(
            list_slice(string_split(trim(text), ' '), i, i + 2), ' ')
        ))) AS s
      FROM documents
    ),
    hb AS (
      SELECT DISTINCT doc_id, source,
        ('0x' || substr(md5(s), 1, 15))::UBIGINT::BIGINT AS h
      FROM sh
    ),
    r AS (
      SELECT doc_id, source, h,
        ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h ASC) AS rn
      FROM hb
    ),
    sk AS (
      SELECT doc_id, source, list(h ORDER BY h) AS hs
      FROM r WHERE rn <= 32 GROUP BY doc_id, source
    ),
    inv AS (SELECT doc_id, source, unnest(hs) AS h FROM sk),
    cand AS (
      SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
      FROM inv a JOIN inv b
        ON a.h = b.h AND a.source = b.source AND a.doc_id < b.doc_id
    ),
    j AS (
      SELECT ida, idb, sa.hs AS ha, sb.hs AS hb2,
        list_intersect(sa.hs, sb.hs) AS inter,
        LEAST(32, len(sa.hs) + len(sb.hs)
                  - len(list_intersect(sa.hs, sb.hs))) AS ksz
      FROM cand
      JOIN sk sa ON sa.doc_id = ida
      JOIN sk sb ON sb.doc_id = idb
    ),
    e AS (
      -- intersection values ranking within the union's k smallest ==
      -- those <= the ksz-th smallest union value (mirrors the Spark
      -- O(k) form)
      SELECT ida, idb,
        CAST(ROUND(CAST(len(list_filter(inter,
            x -> x <= list_sort(list_distinct(ha || hb2))[ksz]))
            AS DOUBLE)
          / CAST(ksz AS DOUBLE), 4) AS DOUBLE) AS est_jaccard
      FROM j
    )
    SELECT CAST(ida AS BIGINT) AS id_a, CAST(idb AS BIGINT) AS id_b,
      est_jaccard
    FROM e WHERE est_jaccard >= 0.2
    ORDER BY est_jaccard DESC, id_a ASC, id_b ASC
    """,
)
def q199_kmv_jaccard_neardup(spark, sf_dir):
    """operators/dedup.kmv_jaccard_pairs — oracle-gated approximate
    near-dup (bottom-32 sketches, threshold 0.2, stop-hash cap
    disabled for the oracle twin like q41's stop-shingle cap)."""
    docs = T(spark, sf_dir, "documents")
    return (
        kmv_jaccard_pairs(
            docs, id_col="doc_id", text_col="text",
            block_cols=["source"], k=3, sketch_k=32,
            threshold=0.2, max_hash_df=None,
        )
        .selectExpr(
            "CAST(id_a AS BIGINT) AS id_a",
            "CAST(id_b AS BIGINT) AS id_b",
            "est_jaccard",
        )
        .orderBy(F.desc("est_jaccard"), F.asc("id_a"), F.asc("id_b"))
    )


# ---------------------------------------------------------------------------
# q227 — prefix-filtered exact Jaccard (operators/dedup.
# ppjoin_jaccard_pairs): the high-threshold tier. Candidate
# generation indexes only each doc's (1−t) rarest shingles (global
# DF order) — provably complete for Jaccard ≥ t — then rescores
# exactly, so the oracle is plain exact Jaccard with NO cap caveat.
# ---------------------------------------------------------------------------
@query(
    "q227_ppjoin_neardup",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
        list_distinct(list_transform(
          range(1, len(string_split(trim(text), ' ')) - 1),
          i -> array_to_string(list_slice(string_split(trim(text), ' '), i, i + 2), ' ')
        )) AS shingles
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / CAST(NULLIF(len(a.shingles) + len(b.shingles)
                          - len(list_intersect(a.shingles, b.shingles)), 0) AS DOUBLE), 4) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(a.shingles) > 0 AND len(b.shingles) > 0
      AND CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
          / CAST(NULLIF(len(a.shingles) + len(b.shingles)
                        - len(list_intersect(a.shingles, b.shingles)), 0) AS DOUBLE) >= 0.6
    ORDER BY jaccard DESC, id_a ASC, id_b ASC
    """,
)
def q227_ppjoin_neardup(spark, sf_dir):
    """Corpus-wide (unblocked) near-duplicate pairs at Jaccard ≥ 0.6
    via prefix filtering: index volume ~(1−t) per doc, candidate
    volume ~(1−t)² of the full inverted index, hot shingles sort out
    of the prefixes by construction — no stop-shingle cap needed."""
    docs = T(spark, sf_dir, "documents")
    return ppjoin_jaccard_pairs(
        docs, id_col="doc_id", text_col="text", k=3, threshold=0.6
    ).selectExpr(
        "CAST(id_a AS BIGINT) AS id_a",
        "CAST(id_b AS BIGINT) AS id_b",
        "jaccard",
    )


# ---------------------------------------------------------------------------
# q231 — SimHash near-dup on the md5 tier, INSIDE the hash gate: the
# engine-replayable twin of rows-only q43 (same band-blocked plan,
# hash swapped xxhash64 → md5-prefix so DuckDB replays the exact
# fingerprints, bands, and Hamming verification).
# ---------------------------------------------------------------------------
_SIMHASH_PAIRS_CTE = """
    sh AS (
      SELECT doc_id,
        list_distinct(list_transform(
          range(1, len(string_split(trim(text), ' ')) - 1),
          i -> array_to_string(
            list_slice(string_split(trim(text), ' '), i, i + 2), ' ')
        )) AS shingles
      FROM documents
      WHERE len(string_split(trim(text), ' ')) >= 3
    ),
    ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    h AS (
      SELECT doc_id,
        CAST(('0x' || substr(md5(shingle), 1, 15)) AS UBIGINT)::BIGINT AS h
      FROM ex
    ),
    bits AS (
      SELECT doc_id, b.b,
        SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM h CROSS JOIN (SELECT unnest(range(0, 60)) AS b) b
      GROUP BY doc_id, b.b
    ),
    fp AS (
      SELECT doc_id,
        SUM(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS simhash
      FROM bits GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, simhash, band.i AS band,
        (simhash >> (15 * band.i)) & 32767 AS key
      FROM fp CROSS JOIN (SELECT unnest(range(0, 4)) AS i) band
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        bit_count(xor(a.simhash, b.simhash)) AS hamming
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.key = b.key
        AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    )
"""


@query(
    "q231_simhash_md5_neardup",
    oracle=f"""
    WITH {_SIMHASH_PAIRS_CTE.strip()}
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
      CAST(hamming AS INT) AS hamming
    FROM pairs
    ORDER BY hamming ASC, id_a ASC, id_b ASC
    """,
)
def q231_simhash_md5_neardup(spark, sf_dir):
    """operators/dedup.simhash_md5_neardup_pairs over documents: the
    60-bit md5-prefix SimHash with four 15-bit bands — bit-identical
    fingerprints in Spark and DuckDB, so the WHOLE approximate-dedup
    plan (fingerprint → band block → Hamming verify) is value-hash
    checked, not just row-counted."""
    from ..operators.dedup import simhash_md5_neardup_pairs

    docs = T(spark, sf_dir, "documents")
    out = simhash_md5_neardup_pairs(
        docs, id_col="doc_id", text_col="text", k=3, max_hamming=3
    )
    return out.select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        F.col("hamming").cast("int").alias("hamming"),
    ).orderBy("hamming", "id_a", "id_b")


# ---------------------------------------------------------------------------
# q232 — MinHash LSH near-dup on the md5 signature tier, INSIDE the
# hash gate: the engine-replayable twin of rows-only q42 (banding AND
# the signature-overlap Jaccard estimate value-hash checked).
# ---------------------------------------------------------------------------
_Q232_K = 16
_Q232_BANDS = 4
_Q232_ROWS = _Q232_K // _Q232_BANDS

_Q232_SQL = f"""
    WITH sh AS (
      SELECT doc_id,
        list_distinct(list_transform(
          range(1, len(string_split(trim(text), ' ')) - 1),
          i -> array_to_string(
            list_slice(string_split(trim(text), ' '), i, i + 2), ' ')
        )) AS shingles
      FROM documents
      WHERE len(string_split(trim(text), ' ')) >= 3
    ),
    ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    sig AS (
      SELECT doc_id,
        {", ".join(
            f"MIN(CAST(('0x' || substr(md5('{i}:' || shingle), 1, 15)) "
            f"AS UBIGINT)::BIGINT) AS m{i}"
            for i in range(_Q232_K)
        )}
      FROM ex GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, {", ".join(f"m{i}" for i in range(_Q232_K))},
        band.i AS band,
        CASE band.i {" ".join(
            "WHEN " + str(b) + " THEN " + " || ',' || ".join(
                f"CAST(m{b * _Q232_ROWS + r} AS VARCHAR)"
                for r in range(_Q232_ROWS)
            )
            for b in range(_Q232_BANDS)
        )} END AS key
      FROM sig CROSS JOIN (
        SELECT unnest(range(0, {_Q232_BANDS})) AS i) band
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        ROUND(CAST({" + ".join(
            f"CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END"
            for i in range(_Q232_K)
        )} AS DOUBLE) / {_Q232_K}, 4) AS est_jaccard
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.key = b.key
        AND a.doc_id < b.doc_id
    )
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
      est_jaccard
    FROM pairs
    WHERE est_jaccard >= 0.5
    ORDER BY est_jaccard DESC, id_a ASC, id_b ASC
"""


@query("q232_minhash_md5_neardup", oracle=_Q232_SQL)
def q232_minhash_md5_neardup(spark, sf_dir):
    """operators/dedup.minhash_md5_lsh_pairs over documents: 16 md5
    hash functions, 4 bands × 4 rows, signature-overlap estimate ≥
    0.5 — the full LSH near-dup plan (signatures → banding →
    estimate) value-hash checked against DuckDB."""
    from ..operators.dedup import minhash_md5_lsh_pairs

    docs = T(spark, sf_dir, "documents")
    out = minhash_md5_lsh_pairs(
        docs, id_col="doc_id", text_col="text", k=3,
        num_hashes=_Q232_K, bands=_Q232_BANDS, threshold=0.5,
    )
    return out.select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        "est_jaccard",
    ).orderBy(F.desc("est_jaccard"), F.asc("id_a"), F.asc("id_b"))


# ---------------------------------------------------------------------------
# q316 — near-duplicate-aware split decontamination (round 8): the
# q95 content-hash split is exact-leak-free by construction, but
# near-dups can straddle it — any TRAIN doc that simhash-near-dups a
# TEST doc is dropped. Composes the q231 banded pair table with the
# q95 bucket split; the report (and the post-drop split census) are
# value-hash checked.
# ---------------------------------------------------------------------------
from .sampling import _BUCKET_DUCK  # the q95 split expression


@query(
    "q316_decontaminated_split",
    oracle=f"""
    WITH {_SIMHASH_PAIRS_CTE.strip()},
    s AS (
      SELECT doc_id, lang,
        CASE WHEN {_BUCKET_DUCK} < 20 THEN 'test' ELSE 'train' END AS split
      FROM documents
    ),
    sym AS (
      SELECT id_a, id_b, hamming FROM pairs
      UNION ALL
      SELECT id_b AS id_a, id_a AS id_b, hamming FROM pairs
    ),
    dropped AS (
      SELECT sym.id_a AS doc_id,
        CAST(COUNT(*) AS INT) AS n_test_matches,
        CAST(MIN(sym.hamming) AS INT) AS min_hamming
      FROM sym
      JOIN s sa ON sa.doc_id = sym.id_a AND sa.split = 'train'
      JOIN s sb ON sb.doc_id = sym.id_b AND sb.split = 'test'
      GROUP BY sym.id_a
    )
    SELECT d.doc_id, s.lang, d.n_test_matches, d.min_hamming
    FROM dropped d JOIN s ON s.doc_id = d.doc_id
    ORDER BY d.doc_id ASC
    """,
)
def q316_decontaminated_split(spark, sf_dir):
    """operators/sampling.decontaminate_split over the q95 split and
    the q231 simhash pair table: the dropped-train report (who leaked,
    how many test near-dups, closest Hamming distance)."""
    from ..operators.dedup import simhash_md5_neardup_pairs
    from ..operators.sampling import decontaminate_split, train_test_split

    docs = T(spark, sf_dir, "documents")
    split = train_test_split(docs, "doc_id", test_percent=20)
    pairs = simhash_md5_neardup_pairs(
        docs, id_col="doc_id", text_col="text", k=3, max_hamming=3
    ).select("id_a", "id_b", "hamming")
    clean, report = decontaminate_split(
        split, pairs, id_col="doc_id", score_col="hamming"
    )
    return (
        report.join(split.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "n_test_matches", "min_hamming")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q322 — winnowing fingerprint near-dup (Schleimer/Wilkerson/Aiken
# 2003, the MOSS algorithm), round 9: positional local-minima
# fingerprinting on the md5-replayable hash tier. Unlike MinHash
# (random sample of the shingle set) winnowing is GUARANTEE-carrying:
# any shared run of >= k+window-1 words yields a shared fingerprint.
# Fingerprint selection, the df-capped inverted-index join, and the
# containment overlap score are all value-hash checked.
# ---------------------------------------------------------------------------
_Q322_SQL = """
    WITH sh AS (
      SELECT doc_id,
        len(string_split(trim(text), ' ')) - 2 AS n,
        list_transform(range(1, len(string_split(trim(text), ' ')) - 1),
          i -> struct_pack(
            idx := i,
            h := CAST(('0x' || substr(md5(array_to_string(
              list_slice(string_split(trim(text), ' '), i, i + 2), ' ')),
              1, 15)) AS UBIGINT)::BIGINT)
        ) AS hs
      FROM documents
      WHERE len(string_split(trim(text), ' ')) >= 3
    ),
    hx AS (SELECT doc_id, n, unnest(hs, recursive := true) FROM sh),
    memb AS (
      SELECT doc_id, idx, h, idx + s.s AS win
      FROM hx CROSS JOIN (SELECT unnest(range(-3, 1)) AS s) s
      WHERE idx + s.s >= 1 AND idx + s.s <= GREATEST(n - 3, 1)
    ),
    sel AS (
      SELECT doc_id, win, idx, h,
        ROW_NUMBER() OVER (PARTITION BY doc_id, win
                           ORDER BY h ASC, idx DESC) AS rn
      FROM memb
    ),
    fp AS (SELECT DISTINCT doc_id, h FROM sel WHERE rn = 1),
    dfreq AS (SELECT h FROM fp GROUP BY h HAVING COUNT(*) <= 100),
    kept AS (SELECT fp.doc_id, fp.h FROM fp JOIN dfreq USING (h)),
    nfp AS (SELECT doc_id, COUNT(*) AS n_fp FROM kept GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT CAST(p.id_a AS BIGINT) AS id_a,
      CAST(p.id_b AS BIGINT) AS id_b,
      CAST(p.shared AS INT) AS shared,
      ROUND(CAST(p.shared AS DOUBLE) / LEAST(na.n_fp, nb.n_fp), 6)
        AS overlap
    FROM pairs p JOIN nfp na ON na.doc_id = p.id_a
                 JOIN nfp nb ON nb.doc_id = p.id_b
    WHERE CAST(p.shared AS DOUBLE) / LEAST(na.n_fp, nb.n_fp) >= 0.5
    ORDER BY overlap DESC, id_a ASC, id_b ASC
"""


@query("q322_winnowing_neardup", oracle=_Q322_SQL)
def q322_winnowing_neardup(spark, sf_dir):
    """operators/dedup.winnowing_neardup_pairs over documents: word
    3-gram md5 hashes, window 4 (fingerprint density 2/5), rightmost-
    minimum tie-break, df cap 100, containment overlap >= 0.5. The
    full positional plan — hash sequence → per-window argmin → df-
    capped inverted-index join — is value-hash checked vs DuckDB."""
    from ..operators.dedup import winnowing_neardup_pairs

    docs = T(spark, sf_dir, "documents")
    out = winnowing_neardup_pairs(
        docs, id_col="doc_id", text_col="text", k=3, window=4,
        min_overlap=0.5, max_fp_df=100,
    )
    return out.select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        F.col("shared").cast("int").alias("shared"),
        "overlap",
    ).orderBy(F.desc("overlap"), F.asc("id_a"), F.asc("id_b"))


# ---------------------------------------------------------------------------
# q323 — exact edit-distance VERIFICATION of the q231 simhash
# candidates (round 9): the verify stage of fingerprint → block →
# verify. Levenshtein is O(|a|·|b|) per pair, so it runs only on the
# banded candidate set — never the corpus. Both engines' levenshtein
# is the same character-level DP, so distance, normalized similarity
# and the 0.8 cut are all value-hash checked.
# ---------------------------------------------------------------------------
@query(
    "q323_editdist_verified_neardup",
    oracle=f"""
    WITH {_SIMHASH_PAIRS_CTE.strip()},
    withtext AS (
      SELECT p.id_a, p.id_b, p.hamming,
        levenshtein(da.text, db.text) AS edit_dist,
        1.0 - CAST(levenshtein(da.text, db.text) AS DOUBLE)
            / GREATEST(length(da.text), length(db.text)) AS sim
      FROM pairs p
      JOIN documents da ON da.doc_id = p.id_a
      JOIN documents db ON db.doc_id = p.id_b
    )
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
      CAST(hamming AS INT) AS hamming,
      CAST(edit_dist AS INT) AS edit_dist,
      ROUND(sim, 6) AS edit_sim
    FROM withtext WHERE sim >= 0.8
    ORDER BY edit_sim DESC, id_a ASC, id_b ASC
    """,
)
def q323_editdist_verified_neardup(spark, sf_dir):
    """operators/dedup.editdist_verify_pairs over the q231 simhash
    candidate tier: exact Levenshtein on candidates only, normalized
    similarity 1 - dist/max(len), verified survivors at >= 0.8."""
    from ..operators.dedup import (
        editdist_verify_pairs,
        simhash_md5_neardup_pairs,
    )

    docs = T(spark, sf_dir, "documents")
    cands = simhash_md5_neardup_pairs(
        docs, id_col="doc_id", text_col="text", k=3, max_hamming=3
    ).select("id_a", "id_b", "hamming")
    out = editdist_verify_pairs(
        cands, docs, id_col="doc_id", text_col="text", min_sim=0.8
    )
    return out.select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        F.col("hamming").cast("int").alias("hamming"),
        F.col("edit_dist").cast("int").alias("edit_dist"),
        "edit_sim",
    ).orderBy(F.desc("edit_sim"), F.asc("id_a"), F.asc("id_b"))


# ---------------------------------------------------------------------------
# q333 — winnowing dedup SURVIVORS (round 9): the full application of
# the q322 tier — winnowing pairs (overlap >= 0.5) fed through
# connected components, min-id survivor per cluster, per-language
# survivor census. The oracle replays the pair table verbatim and
# closes it with the q77/q78 recursive reachability CTE.
# ---------------------------------------------------------------------------
_Q333_WINNOW_PAIRS = """
    sh AS (
      SELECT doc_id,
        len(string_split(trim(text), ' ')) - 2 AS n,
        list_transform(range(1, len(string_split(trim(text), ' ')) - 1),
          i -> struct_pack(
            idx := i,
            h := CAST(('0x' || substr(md5(array_to_string(
              list_slice(string_split(trim(text), ' '), i, i + 2), ' ')),
              1, 15)) AS UBIGINT)::BIGINT)
        ) AS hs
      FROM documents
      WHERE len(string_split(trim(text), ' ')) >= 3
    ),
    hx AS (SELECT doc_id, n, unnest(hs, recursive := true) FROM sh),
    memb AS (
      SELECT doc_id, idx, h, idx + s.s AS win
      FROM hx CROSS JOIN (SELECT unnest(range(-3, 1)) AS s) s
      WHERE idx + s.s >= 1 AND idx + s.s <= GREATEST(n - 3, 1)
    ),
    sel AS (
      SELECT doc_id, win, idx, h,
        ROW_NUMBER() OVER (PARTITION BY doc_id, win
                           ORDER BY h ASC, idx DESC) AS rn
      FROM memb
    ),
    fp AS (SELECT DISTINCT doc_id, h FROM sel WHERE rn = 1),
    dfreq AS (SELECT h FROM fp GROUP BY h HAVING COUNT(*) <= 100),
    kept AS (SELECT fp.doc_id, fp.h FROM fp JOIN dfreq USING (h)),
    nfp AS (SELECT doc_id, COUNT(*) AS n_fp FROM kept GROUP BY doc_id),
    rawpairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT p.id_a, p.id_b
      FROM rawpairs p JOIN nfp na ON na.doc_id = p.id_a
                      JOIN nfp nb ON nb.doc_id = p.id_b
      WHERE CAST(p.shared AS DOUBLE) / LEAST(na.n_fp, nb.n_fp) >= 0.5
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
    )
"""


@query(
    "q333_winnowing_dedup_survivors",
    oracle=f"""
    WITH RECURSIVE {_Q333_WINNOW_PAIRS.strip()},
    losers AS (SELECT id FROM lab WHERE comp <> id)
    SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars
    FROM documents d LEFT JOIN losers l ON d.doc_id = l.id
    WHERE l.id IS NULL
    GROUP BY d.lang ORDER BY d.lang ASC
    """,
)
def q333_winnowing_dedup_survivors(spark, sf_dir):
    """End-to-end winnowing dedup: q322's overlap >= 0.5 pairs fed
    through connected components (min-id survivor), per-language
    survivor census — the MOSS-fingerprint twin of q78."""
    from ..operators.dedup import (
        dedup_by_components,
        winnowing_neardup_pairs,
    )

    docs = T(spark, sf_dir, "documents")
    pairs = winnowing_neardup_pairs(
        docs, id_col="doc_id", text_col="text", k=3, window=4,
        min_overlap=0.5, max_fp_df=100,
    ).select("id_a", "id_b")
    return (
        dedup_by_components(docs, pairs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .orderBy("lang")
    )
