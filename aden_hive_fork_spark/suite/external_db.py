"""External-DB passthrough suite entries (SURVEY.md "what's missing"
#1 — the reference's Postgres/BigQuery read-only passthrough, here
exercised end-to-end against embedded DuckDB, the same engine the
reference delegates its csv/excel SQL to).

q80 proves the full path the reference's users rely on: an external
database is queried through a partitioned parallel fetch (each Spark
task opens its own connection, spark.read.jdbc semantics), the result
lands as a typed DataFrame, and joins Spark-local tables in one plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query
from ._helpers import T, dec, dround
from ..catalog import table_path
from ..sources.external import external_read


@query(
    "q80_external_db_join",
    oracle="""
    SELECT c.c_mktsegment AS segment,
      COUNT(*) AS n_orders,
      CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE c.c_acctbal > 1000
    GROUP BY c.c_mktsegment
    ORDER BY segment ASC
    """,
)
def q80_external_db_join(spark, sf_dir):
    """EXTERNAL-SOURCE JOIN: the customer dimension is fetched from an
    external database (DuckDB) via a 4-way partitioned parallel read —
    each Spark task opens its own read-only connection and pulls one
    c_custkey range slice (the spark.read.jdbc partitioning contract,
    jar-free) — then joined against the Spark-local orders table.

    Reference parity: pg_query/run_bigquery_query passthrough
    (postgres_tool.py:271-355, bigquery_tool.py:149-243) upgraded from
    a driver-side row fetch to a distributed scan. At 100 TB the
    external side stays a dimension (bounded), Spark broadcasts it;
    the fact table never leaves Spark.
    """
    cust_path = table_path(sf_dir, "customer")
    ext_sql = (
        "SELECT c_custkey, c_mktsegment, c_acctbal "
        f"FROM read_parquet('{cust_path}') WHERE c_acctbal > 1000"
    )
    cust = external_read(
        spark,
        # lambda (pickled by value): each executor task re-imports
        # duckdb and opens its own in-process connection.
        lambda: __import__("duckdb").connect(),
        ext_sql,
        partition_column="c_custkey",
        lower_bound=0,
        upper_bound=200_000,
        num_partitions=4,
    )
    orders = T(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dround(F.sum(dec("o_totalprice"))).alias("revenue"),
        )
        .orderBy("segment")
    )
