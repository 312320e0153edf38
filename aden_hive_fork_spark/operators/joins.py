"""Join strategies for scale: bucketed co-located joins and salted
skew joins (SURVEY.md §4 / SCALING.md §3).

These are the two techniques the 100 TB plan leans on beyond what AQE
does automatically:

- **Bucketing**: write both fact tables bucketed (+sorted) on the
  join key; the sort-merge join then needs NO shuffle at read time —
  the single biggest cost on repeated large joins.
- **Salting**: when one key dominates (power users, stop-shingles),
  explode the hot side's key space by a salt factor and replicate the
  other side, so the hot key spreads over ``salt`` reducers. AQE's
  skew-join splits partitions after the fact; salting prevents the
  skew from forming, and works for aggregations too.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort: bool = True,
    fmt: str = "parquet",
) -> None:
    """Persist as a bucketed (and bucket-sorted) table. Two tables
    bucketed the same way join with zero Exchange (verified in
    tests by plan inspection)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # A fresh session's in-memory catalog forgets managed tables but
    # their warehouse directories persist; clear stale locations or
    # saveAsTable fails with LOCATION_ALREADY_EXISTS.
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    stale = os.path.join(warehouse, table.lower())
    if warehouse and os.path.isdir(stale):
        shutil.rmtree(stale)
    writer = df.write.format(fmt).mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — shuffle-free."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the (large, possibly skewed) left side
    gets a random-but-deterministic salt derived from its row content
    hash; the (smaller) right side is replicated ``salt`` times. The
    join key becomes (key, salt), spreading any hot key over ``salt``
    partitions. Result equals a plain join exactly.
    """
    salt_col = (F.abs(F.xxhash64(*left.columns)) % salt).alias("_salt")
    lsalted = left.withColumn("_salt", salt_col)
    replicated = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    joined = lsalted.join(replicated, [on, "_salt"], how)
    return joined.drop("_salt")


def skewed_key_stats(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts and share of total — feeds the
    decision to salt (a key holding >1/num_partitions of rows is a
    straggler candidate). The total rides as a broadcast 1-row
    aggregate (one Spark job — no driver-side count action splitting
    the plan), and the top-N compiles to TakeOrderedAndProject over
    the key-cardinality-bounded count table."""
    counts = df.groupBy(key).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    total = counts.agg(F.sum("n_rows").cast("double").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            key,
            "n_rows",
            F.round(F.col("n_rows").cast("double") / F.col("_total"), 4)
            .cast("double")
            .alias("share"),
        )
        .orderBy(F.desc("n_rows"), F.asc(key))
        .limit(top)
    )


def join_size_profile(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    top: int = 5,
) -> DataFrame:
    """Predict a join's output size WITHOUT running the join — the
    capacity-planning probe a 100 TB pipeline runs before committing
    to a shuffle. Exact arithmetic: the join's output cardinality is
    Σ_k c_left(k)·c_right(k), computable from the two per-key count
    tables whose join is KEY-cardinality-sized (never row-sized).

    One row: ``n_keys_left, n_keys_right, n_matched_keys,
    output_rows, max_key_output, amplification`` — ``output_rows``
    the exact inner-equi-join row count, ``max_key_output`` the
    heaviest single key's contribution (the straggler bound that
    decides salting), ``amplification`` output rows per left row.
    """
    lc = left.filter(F.col(left_key).isNotNull()).groupBy(
        F.col(left_key).alias("_k")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("_cl"))
    rc = right.filter(F.col(right_key).isNotNull()).groupBy(
        F.col(right_key).alias("_k")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("_cr"))
    j = lc.join(rc, "_k", "full_outer")
    prod = (
        F.coalesce(F.col("_cl"), F.lit(0)) * F.coalesce(F.col("_cr"), F.lit(0))
    ).cast("bigint")
    return j.agg(
        F.count("_cl").cast("bigint").alias("n_keys_left"),
        F.count("_cr").cast("bigint").alias("n_keys_right"),
        F.sum(
            F.when(F.col("_cl").isNotNull() & F.col("_cr").isNotNull(), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("n_matched_keys"),
        F.sum(prod).cast("bigint").alias("output_rows"),
        F.max(prod).cast("bigint").alias("max_key_output"),
        F.round(
            F.sum(prod).cast("double")
            / F.sum(F.coalesce(F.col("_cl"), F.lit(0))).cast("double"),
            6,
        )
        .cast("double")
        .alias("amplification"),
    )


def time_range_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    lo_offset_us: int,
    hi_offset_us: int,
    bin_us: int | None = None,
) -> DataFrame:
    """Range join rewritten as a binned equi-join (the scale shape).

    Matches (l, r) sharing ``keys`` with
    ``l.left_ts + lo_offset_us <= r.right_ts < l.left_ts + hi_offset_us``
    (offsets in microseconds, may be negative).

    A naive range join is a BroadcastNestedLoopJoin / per-key cross
    join — quadratic in the hot key. Here both sides get an integer
    time-bin column (bin width defaults to the range span); the right
    side is replicated to each bin the range can straddle (a constant
    ``span/bin + 1`` factor), the join is a plain equi-join on
    (keys, bin), and the exact range predicate remains as a residual
    filter. One shuffle, codegen-friendly, AQE-skew-splittable — and
    each matching pair appears exactly once because the replicas carry
    distinct bin values.

    Timestamps are compared via integer microseconds from the NTZ
    epoch (timezone-independent).
    """
    span = hi_offset_us - lo_offset_us
    if span <= 0:
        raise ValueError("hi_offset_us must exceed lo_offset_us")
    bin_us = bin_us or span
    # a range of `span` can straddle ceil(span/bin)+1 bins
    n_replicas = -(-span // bin_us) + 1

    def us(col: str) -> F.Column:
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `{col}`)"
        )

    l_us, r_us = us(left_ts), us(right_ts)
    # left bin of the range START; right replicated upward so that for
    # every left bin b, right rows in [b, b + n_replicas) carry a
    # replica equal to b.
    lb = F.floor((l_us + F.lit(lo_offset_us)) / F.lit(bin_us))
    rb = F.floor(r_us / F.lit(bin_us))
    lhs = left.withColumn("_bin", lb).withColumn("_lus", l_us)
    rhs = (
        right.withColumn("_rb", rb)
        .withColumn("_rep", F.explode(F.array(*[F.lit(i) for i in range(n_replicas)])))
        .withColumn("_bin", F.col("_rb") - F.col("_rep"))
        .drop("_rb", "_rep")
        .withColumn("_rus", r_us)
    )
    residual = (F.col("_rus") >= F.col("_lus") + F.lit(lo_offset_us)) & (
        F.col("_rus") < F.col("_lus") + F.lit(hi_offset_us)
    )
    return lhs.join(rhs, keys + ["_bin"]).filter(residual).drop("_bin", "_lus", "_rus")
