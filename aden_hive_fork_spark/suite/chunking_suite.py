"""Chunking + Bloom-prune batch: RAG document chunking (char and
token windows) and the exact Bloom-prefiltered semi-join, all under
the DuckDB oracle gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.similarity import stable_round6
from . import query
from ._helpers import T


# ---------------------------------------------------------------------------
# q114 — character-window chunking with overlap (operators/chunking).
# ---------------------------------------------------------------------------
@query(
    "q114_doc_chunking",
    oracle="""
    WITH starts AS (
      SELECT doc_id, text,
             unnest(generate_series(0, length(text)-1, 160)) AS chunk_start
      FROM documents
      WHERE text IS NOT NULL AND length(text) > 0
    )
    SELECT doc_id,
      CAST(chunk_start // 160 AS INT) AS chunk_id,
      CAST(chunk_start AS INT) AS chunk_start,
      CAST(length(substr(text, CAST(chunk_start+1 AS INT), 200)) AS INT)
        AS chunk_len,
      substr(text, CAST(chunk_start+1 AS INT), 200) AS chunk_text
    FROM starts
    ORDER BY doc_id ASC, chunk_id ASC
    """,
)
def q114_doc_chunking(spark, sf_dir):
    """200-char windows every 160 chars (40-char overlap) over the
    corpus — `chunking.chunk_documents`. Map-only: sequence +
    posexplode + substring in whole-stage codegen, no shuffle except
    the output sort required by the determinism contract."""
    from ..operators.chunking import chunk_documents

    docs = T(spark, sf_dir, "documents")
    return chunk_documents(
        docs, id_col="doc_id", text_col="text", chunk_size=200, overlap=40
    ).orderBy("doc_id", "chunk_id")


# ---------------------------------------------------------------------------
# q115 — token-window chunking (the RAG-standard unit).
# ---------------------------------------------------------------------------
@query(
    "q115_token_chunking",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      FROM documents
      WHERE text IS NOT NULL AND length(trim(text)) > 0
    ), starts AS (
      SELECT doc_id, t,
             unnest(generate_series(1, len(t), 24)) AS token_start
      FROM toks
    )
    SELECT doc_id,
      CAST((token_start - 1) // 24 AS INT) AS chunk_id,
      CAST(token_start AS INT) AS token_start,
      CAST(len(t[CAST(token_start AS INT):CAST(token_start+31 AS INT)])
           AS INT) AS n_tokens,
      array_to_string(
        t[CAST(token_start AS INT):CAST(token_start+31 AS INT)], ' '
      ) AS chunk_text
    FROM starts
    ORDER BY doc_id ASC, chunk_id ASC
    """,
)
def q115_token_chunking(spark, sf_dir):
    """32-token windows every 24 tokens (8-token overlap) —
    `chunking.chunk_tokens`: split/slice/array_join, pure JVM,
    exact token offsets for span-to-document mapping."""
    from ..operators.chunking import chunk_tokens

    docs = T(spark, sf_dir, "documents")
    return chunk_tokens(
        docs, id_col="doc_id", text_col="text", chunk_tokens=32, overlap=8
    ).orderBy("doc_id", "chunk_id")


# ---------------------------------------------------------------------------
# q116 — Bloom-prefiltered semi-join (exact by construction).
# ---------------------------------------------------------------------------
@query(
    "q116_bloom_semi_join",
    oracle="""
    SELECT l_returnflag,
      CAST(COUNT(*) AS BIGINT) AS n_items,
      CAST(FLOOR(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           * 1000000 + 0.5) / 1000000 AS DOUBLE) AS sum_qty,
      CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
    FROM lineitem
    WHERE l_partkey IN (
      SELECT p_partkey FROM part WHERE p_size <= 5
    )
    GROUP BY l_returnflag
    ORDER BY l_returnflag ASC
    """,
)
def q116_bloom_semi_join(spark, sf_dir):
    """`bloom.bloom_semi_join`: Bloom filter built over the small key
    set (parts with p_size <= 5), corpus pruned MAP-SIDE by k
    codegen'd bit probes, then a confirming broadcast semi-join over
    the survivors only — bitwise-exact vs the plain semi-join oracle
    because Bloom filters have no false negatives and the confirm join
    removes false positives."""
    from ..operators.bloom import bloom_semi_join

    li = T(spark, sf_dir, "lineitem")
    small = (
        T(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 5)
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    hits = bloom_semi_join(li, small, "l_partkey", fpp=0.01)
    return (
        hits.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            # exact decimal sum, emitted via the driver-green
            # stable_round6 DOUBLE codec (CORRECTNESS_r07 adjudicated
            # DECIMAL output columns as the divergent driver codec)
            stable_round6(
                F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .cast("double")
            ).alias("sum_qty"),
            F.countDistinct("l_partkey").cast("bigint").alias("n_parts"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# q119 — grid-bucketed radius join (operators/geo). The grid only
# bounds candidates; the haversine residual makes the pair set exact,
# so the oracle is a plain cross-join filter with the same formula.
# Coordinates derive from integer keys (exact in both engines);
# distances are rounded to 2 decimals only in the OUTPUT aggregate.
# ---------------------------------------------------------------------------
@query(
    "q119_geo_radius_join",
    oracle="""
    WITH pts AS (
      SELECT c_custkey AS cust_id,
        ((c_custkey * 37) % 1200) / 10.0 - 60.0 AS lat,
        ((c_custkey * 73) % 3600) / 10.0 - 180.0 AS lon
      FROM customer WHERE c_custkey % 4 = 0
    ), pois AS (
      SELECT n_nationkey AS poi_id,
        ((n_nationkey * 91) % 1200) / 10.0 - 60.0 AS poi_lat,
        ((n_nationkey * 53) % 3600) / 10.0 - 180.0 AS poi_lon
      FROM nation
    ), pairs AS (
      SELECT p.cust_id, q.poi_id,
        2 * 6371.0 * ASIN(SQRT(
          SIN(RADIANS(q.poi_lat - p.lat) / 2) ^ 2
          + COS(RADIANS(p.lat)) * COS(RADIANS(q.poi_lat))
            * SIN(RADIANS(q.poi_lon - p.lon) / 2) ^ 2
        )) AS dist_km
      FROM pts p CROSS JOIN pois q
    )
    SELECT poi_id,
      CAST(COUNT(*) AS BIGINT) AS n_within,
      CAST(MIN(cust_id) AS BIGINT) AS min_cust,
      CAST(ROUND(SUM(ROUND(dist_km, 2)), 2) AS DOUBLE) AS sum_dist
    FROM pairs
    WHERE dist_km <= 1500.0
    GROUP BY poi_id
    ORDER BY poi_id ASC
    """,
)
def q119_geo_radius_join(spark, sf_dir):
    """`geo.radius_join`: customers and nation POIs placed on
    deterministic pseudo-coordinates; all pairs within 1500 km per
    POI. The operator's 3x3 grid equi-join (constant x9 replication,
    hash join on cell id) must produce the EXACT pair set of the
    oracle's cross-join filter — the grid never changes the answer,
    only the candidate count."""
    from ..operators.geo import radius_join

    c = T(spark, sf_dir, "customer").filter(F.col("c_custkey") % 4 == 0)
    pts = c.select(
        F.col("c_custkey").alias("cust_id"),
        (((F.col("c_custkey") * 37) % 1200) / 10.0 - 60.0).alias("lat"),
        (((F.col("c_custkey") * 73) % 3600) / 10.0 - 180.0).alias("lon"),
    )
    n = T(spark, sf_dir, "nation")
    pois = n.select(
        F.col("n_nationkey").alias("poi_id"),
        (((F.col("n_nationkey") * 91) % 1200) / 10.0 - 60.0).alias("poi_lat"),
        (((F.col("n_nationkey") * 53) % 3600) / 10.0 - 180.0).alias("poi_lon"),
    )
    pairs = radius_join(
        pts, pois, radius_km=1500.0,
        lat_col="lat", lon_col="lon",
        right_lat_col="poi_lat", right_lon_col="poi_lon",
        max_abs_lat=60.0,
    )
    return (
        pairs.groupBy("poi_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_within"),
            F.min("cust_id").cast("bigint").alias("min_cust"),
            F.round(F.sum(F.round(F.col("dist_km"), 2)), 2)
            .cast("double")
            .alias("sum_dist"),
        )
        .orderBy("poi_id")
    )


# ---------------------------------------------------------------------------
# q122 — blocked record linkage (operators/linkage): self-resolution
# of the part catalog by fuzzy name within (brand, size) blocks.
# ---------------------------------------------------------------------------
@query(
    "q122_record_linkage",
    oracle="""
    WITH pairs AS (
      SELECT a.p_partkey AS left_id, b.p_partkey AS right_id,
        ROUND(
          0.8 * (1.0 - levenshtein(a.p_name, b.p_name)
                 / GREATEST(LENGTH(a.p_name), LENGTH(b.p_name), 1))
          + 0.2 * (CASE WHEN a.p_type = b.p_type THEN 1.0 ELSE 0.0 END)
        , 4) AS score
      FROM part a JOIN part b
        ON a.p_brand = b.p_brand AND a.p_size = b.p_size
       AND a.p_partkey < b.p_partkey
    ), matched AS (
      SELECT left_id, right_id, score,
        ROW_NUMBER() OVER (
          PARTITION BY left_id ORDER BY score DESC, right_id ASC
        ) AS rn
      FROM pairs WHERE score >= 0.55
    )
    SELECT left_id, right_id, CAST(score AS DOUBLE) AS score
    FROM matched WHERE rn = 1
    ORDER BY left_id ASC
    """,
)
def q122_record_linkage(spark, sf_dir):
    """`linkage.link_records`: candidates from a (brand, size)
    blocking join — never all-pairs — scored 0.8×normalized-edit-
    similarity(name) + 0.2×exact(type), rounded BEFORE the threshold
    and best-match ranking so decisions are engine-stable. The
    self-linkage orders the pair (left < right) BEFORE ranking, then
    keeps the best match per left part."""
    from pyspark.sql.window import Window

    from ..operators.linkage import link_records

    p = T(spark, sf_dir, "part")
    a = p.select(
        F.col("p_partkey").alias("left_id"),
        F.col("p_brand").alias("a_brand"),
        F.col("p_size").alias("a_size"),
        F.col("p_name").alias("a_name"),
        F.col("p_type").alias("a_type"),
    )
    b = p.select(
        F.col("p_partkey").alias("right_id"),
        F.col("p_brand").alias("b_brand"),
        F.col("p_size").alias("b_size"),
        F.col("p_name").alias("b_name"),
        F.col("p_type").alias("b_type"),
    )
    pairs = link_records(
        a, b,
        block_on=[("a_brand", "b_brand"), ("a_size", "b_size")],
        fields=[
            ("a_name", "b_name", 0.8, "levenshtein"),
            ("a_type", "b_type", 0.2, "exact"),
        ],
        threshold=0.55,
        best_per_left=False,
    ).filter(F.col("left_id") < F.col("right_id"))
    w = Window.partitionBy("left_id").orderBy(
        F.desc("score"), F.asc("right_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("left_id", "right_id",
                F.col("score").cast("double").alias("score"))
        .orderBy("left_id")
    )
