"""Fourth batch: fuzzy string matching, math functions, correlated
scalar subqueries (shared SQL text), and a REAL Structured Streaming
query exposed through the driver harness.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query
from ._helpers import T


# ---------------------------------------------------------------------------
# q56 — string-distance + transforms (§2.A row 24): levenshtein, lpad,
# translate, reverse.
# ---------------------------------------------------------------------------
@query(
    "q56_fuzzy_brand_match",
    oracle="""
    SELECT p_partkey,
      levenshtein(p_brand, 'Brand#13') AS dist,
      lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_padded,
      translate(p_brand, '#', '-') AS brand_dashed,
      reverse(p_type) AS type_reversed
    FROM part
    WHERE p_partkey <= 300 AND levenshtein(p_brand, 'Brand#13') <= 2
    ORDER BY dist ASC, p_partkey ASC
    """,
)
def q56_fuzzy_brand_match(spark, sf_dir):
    """Edit-distance fuzzy match against a target brand + string
    transforms — the fuzzy tier of excel_search-style matching."""
    dist = F.levenshtein("p_brand", F.lit("Brand#13"))
    return (
        T(spark, sf_dir, "part")
        .filter((F.col("p_partkey") <= 300) & (dist <= 2))
        .select(
            "p_partkey",
            dist.alias("dist"),
            F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_padded"),
            F.translate("p_brand", "#", "-").alias("brand_dashed"),
            F.reverse("p_type").alias("type_reversed"),
        )
        .orderBy("dist", "p_partkey")
    )


# ---------------------------------------------------------------------------
# q57 — math/numeric functions (§2.A row 27): sqrt/ceil/floor/sign
# exact; ln/log10 rounded (libm implementations may differ in the
# last ulp across engines — 4 decimals absorbs it).
# ---------------------------------------------------------------------------
@query(
    "q57_math_functions",
    oracle="""
    SELECT p_partkey,
      ROUND(sqrt(p_retailprice), 4) AS price_sqrt,
      CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
      CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
      CAST(sign(p_retailprice - 1000) AS BIGINT) AS above_1000,
      ROUND(ln(p_retailprice), 4) AS price_ln,
      ROUND(log10(p_retailprice), 4) AS price_log10,
      CAST(p_size % 7 AS BIGINT) AS size_mod7
    FROM part
    WHERE p_partkey <= 400 AND p_retailprice > 0
    ORDER BY p_partkey ASC
    """,
)
def q57_math_functions(spark, sf_dir):
    p = F.col("p_retailprice")
    return (
        T(spark, sf_dir, "part")
        .filter((F.col("p_partkey") <= 400) & (p > 0))
        .select(
            "p_partkey",
            F.round(F.sqrt(p), 4).alias("price_sqrt"),
            F.ceil(p).cast("bigint").alias("price_ceil"),
            F.floor(p).cast("bigint").alias("price_floor"),
            F.signum(p - 1000).cast("bigint").alias("above_1000"),
            F.round(F.log(p), 4).alias("price_ln"),
            F.round(F.log10(p), 4).alias("price_log10"),
            (F.col("p_size") % 7).cast("bigint").alias("size_mod7"),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# q58 — correlated scalar subquery via SHARED SQL text (§2.A row 19):
# Catalyst decorrelates it into a left outer aggregate join.
# ---------------------------------------------------------------------------
_Q58_SQL = """
    SELECT c.c_custkey,
      (SELECT CAST(MAX(o.o_totalprice) AS DOUBLE) FROM orders o
       WHERE o.o_custkey = c.c_custkey) AS max_order_price
    FROM customer c
    WHERE c.c_custkey <= 400
    ORDER BY c.c_custkey ASC
"""


@query("q58_correlated_scalar", oracle=_Q58_SQL)
def q58_correlated_scalar(spark, sf_dir):
    """Same SQL text on both engines; NULL for customers without
    orders. MAX over raw doubles is order-free (no sum), so no
    decimal dance needed."""
    from ..catalog import register_views

    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(_Q58_SQL)


# ---------------------------------------------------------------------------
# q60 — REAL Structured Streaming through the driver harness: stream
# the events table (availableNow), watermarked tumbling windows, then
# return the finalized result. Full replay in one availableNow run ⇒
# no late drops ⇒ deterministic and hash-matchable.
# ---------------------------------------------------------------------------
@query(
    "q60_streaming_hourly_windows",
    oracle="""
    SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
      COUNT(*) AS n_events
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-04'
    GROUP BY 1, 2
    ORDER BY window_start ASC, event_type ASC
    """,
)
def q60_streaming_hourly_windows(spark, sf_dir):
    """events.parquet consumed as a STREAM (file source, availableNow
    trigger), watermarked 1-hour tumbling windows, complete finalized
    output collected from the sink. Exercises §2.C 60/63/67 under the
    driver's own correctness gate."""
    import uuid

    # Stream the parquet file directly; ts handling is type-adaptive
    # (nanos-long vs native timestamp — the driver has shipped both),
    # shared with the batch path via catalog.open_events_stream.
    # grouping time: NTZ (timezone-proof value arithmetic);
    # watermark time: LTZ absolute instant (withWatermark only accepts
    # TIMESTAMP, not TIMESTAMP_NTZ).
    from ..catalog import open_events_stream

    stream, ts_ntz, ts_wm = open_events_stream(spark, sf_dir)
    ev = (
        stream.withColumn("ts_wm", ts_wm)
        .withColumn("ts", ts_ntz)
        .filter(
            (F.col("ts") >= F.lit("2024-01-01").cast("timestamp_ntz"))
            & (F.col("ts") < F.lit("2024-01-04").cast("timestamp_ntz"))
        )
    )
    hour_start = F.expr(
        "timestampadd(HOUR, timestampdiff(HOUR, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts),"
        " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
    )
    win = (
        ev.withWatermark("ts_wm", "10 minutes")
        .groupBy(hour_start.alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    sink = f"q60_sink_{uuid.uuid4().hex[:8]}"
    q = (
        win.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(sink).orderBy("window_start", "event_type")
