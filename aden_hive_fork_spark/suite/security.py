"""Security-analytics batch: the risk scorer's weighted grading
arithmetic (reference risk_scorer.py:16-174) as a columnar Spark plan
under the DuckDB oracle gate.

The scanner envelopes themselves are I/O (loopback-tested in
test_netscan); what the oracle CAN check exactly is the scoring math —
check points, invert flags, category scores, letter grades, and the
half-up weighted overall — over a deterministic fleet of "assets"
derived from the customer table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query
from ._helpers import T


# ---------------------------------------------------------------------------
# q113 — columnar risk grading (netscan.risk_grade_columns) over
# deterministic per-customer check booleans; grade distribution +
# score sums oracle-checked.
# ---------------------------------------------------------------------------
@query(
    "q113_risk_grading",
    oracle="""
    WITH checks AS (
      SELECT c_custkey,
        (c_acctbal > 0)             AS hsts,
        (LENGTH(c_name) % 2 = 0)    AS csp,
        (c_nationkey % 3 = 0)       AS xfo,
        (c_mktsegment = 'BUILDING') AS xcto,
        (c_custkey % 2 = 0)         AS rp,
        (c_acctbal < 5000)          AS pp,
        (c_custkey % 5 <> 0)        AS nlh,
        (c_custkey % 7 <> 0)        AS tls_ok,
        (c_acctbal > -500)          AS cert_ok,
        (c_custkey % 11 = 0)        AS expiring,
        (c_nationkey < 20)          AS strong,
        (c_custkey % 13 = 0)        AS selfs
      FROM customer
    ), scored AS (
      SELECT
        (CASE WHEN tls_ok THEN 25 ELSE 0 END
         + CASE WHEN cert_ok THEN 30 ELSE 0 END
         + CASE WHEN NOT expiring THEN 10 ELSE 0 END
         + CASE WHEN strong THEN 20 ELSE 0 END
         + CASE WHEN NOT selfs THEN 15 ELSE 0 END) AS ssl_score,
        (CASE WHEN hsts THEN 20 ELSE 0 END
         + CASE WHEN csp THEN 20 ELSE 0 END
         + CASE WHEN xfo THEN 15 ELSE 0 END
         + CASE WHEN xcto THEN 15 ELSE 0 END
         + CASE WHEN rp THEN 10 ELSE 0 END
         + CASE WHEN pp THEN 10 ELSE 0 END
         + CASE WHEN nlh THEN 10 ELSE 0 END) AS hdr_score
      FROM checks
    ), graded AS (
      SELECT ssl_score, hdr_score,
        -- round-half-up weighted mean in exact integer arithmetic:
        -- (2*sum(score*w) + W) div 2W, weights 20/20 (W=40)
        CAST(FLOOR((2 * (ssl_score * 20 + hdr_score * 20) + 40) / 80.0)
             AS INT) AS overall_score
      FROM scored
    )
    SELECT
      CASE WHEN overall_score >= 90 THEN 'A'
           WHEN overall_score >= 75 THEN 'B'
           WHEN overall_score >= 60 THEN 'C'
           WHEN overall_score >= 40 THEN 'D'
           ELSE 'F' END AS overall_grade,
      CAST(COUNT(*) AS BIGINT) AS n_assets,
      CAST(MIN(overall_score) AS INT) AS min_score,
      CAST(MAX(overall_score) AS INT) AS max_score,
      CAST(SUM(ssl_score) AS BIGINT) AS sum_ssl,
      CAST(SUM(hdr_score) AS BIGINT) AS sum_headers
    FROM graded
    GROUP BY overall_grade
    ORDER BY overall_grade ASC
    """,
)
def q113_risk_grading(spark, sf_dir):
    """Risk-scorer arithmetic (``netscan.risk_grade_columns``) graded
    per asset then aggregated by letter grade. The check booleans are
    derived deterministically from customer columns — one per check
    key of the ssl_tls and http_headers categories, exercising normal,
    inverted (cert_expiring_soon / self_signed), and weighted-overall
    paths. Pure JVM column arithmetic; the only Exchange is the final
    tiny grade aggregate. Scale shape: grading a 10^9-asset fleet is
    map-side work."""
    from ..sources.netscan import risk_grade_columns

    c = T(spark, sf_dir, "customer")
    checks = c.select(
        (F.col("c_acctbal") > 0).alias("hsts"),
        (F.length("c_name") % 2 == 0).alias("csp"),
        (F.col("c_nationkey") % 3 == 0).alias("x_frame_options"),
        (F.col("c_mktsegment") == "BUILDING").alias("x_content_type_options"),
        (F.col("c_custkey") % 2 == 0).alias("referrer_policy"),
        (F.col("c_acctbal") < 5000).alias("permissions_policy"),
        (F.col("c_custkey") % 5 != 0).alias("no_leaky_headers"),
        (F.col("c_custkey") % 7 != 0).alias("tls_version_ok"),
        (F.col("c_acctbal") > -500).alias("cert_valid"),
        (F.col("c_custkey") % 11 == 0).alias("cert_expiring_soon"),
        (F.col("c_nationkey") < 20).alias("strong_cipher"),
        (F.col("c_custkey") % 13 == 0).alias("self_signed"),
    )
    graded = risk_grade_columns(
        checks, categories=["ssl_tls", "http_headers"]
    )
    return (
        graded.groupBy("overall_grade")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_assets"),
            F.min("overall_score").cast("int").alias("min_score"),
            F.max("overall_score").cast("int").alias("max_score"),
            F.sum("ssl_tls_score").cast("bigint").alias("sum_ssl"),
            F.sum("http_headers_score").cast("bigint").alias("sum_headers"),
        )
        .orderBy("overall_grade")
    )
