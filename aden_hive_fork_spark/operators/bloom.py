"""Broadcast Bloom-filter membership pruning — the map-side prefilter
for contamination checks, incremental dedup, and dimension semi-joins
at corpus scale.

PySpark 4 exposes neither ``bloom_filter_agg`` nor
``DataFrameStatFunctions.bloomFilter`` (both are JVM-internal), and
AQE's runtime bloom injection only fires inside a single query. This
module builds the filter from first principles as PURE COLUMN
ARITHMETIC so it can be materialized once and reused across many jobs
(the benchmark-membership use case: build the filter over benchmark
keys once, prune every future corpus scan map-side):

- **Hashing**: Kirsch-Mitzenmacher double hashing — two ``xxhash64``
  evaluations per key (seeds 0/1), bit i at ``pmod(h1 + i*h2, m)``.
  Standard result: asymptotically the same false-positive rate as k
  independent hashes, at 2 hash evaluations instead of k.
- **Build**: explode the k bit positions (k small-side rows × k — the
  SMALL side only), group by 64-bit word index, ``bit_or`` the shifted
  bits, collect the ≤ m/64 words to the driver. The collect is bounded
  by the filter SIZE (e.g. 1 MiB for m=2^23), never by the data.
- **Probe**: the word array rides to the executors as a one-row
  broadcast join; the membership test is k ``element_at`` +
  shift/mask expressions inside whole-stage codegen. No Python, no
  shuffle of the probed table.

``bloom_semi_join`` composes probe + exact confirming join, so its
result is EXACT (false positives are eliminated by the join; a Bloom
filter has no false negatives) — which is what lets q116 sit under the
DuckDB oracle as a plain semi-join equivalence.

100 TB shape: the big side never shuffles for the prefilter; the
confirming join sees only the survivors (fpp ~1% of non-members plus
true members), which is what makes an otherwise shuffle-heavy semi
join against a large corpus cheap.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_params(expected_n: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (n_bits, k) for ``expected_n`` keys at ``fpp``:
    m = -n ln p / (ln 2)^2, k = (m/n) ln 2 — the textbook sizing."""
    if expected_n <= 0:
        raise ValueError("expected_n must be positive")
    if not (0.0 < fpp < 1.0):
        raise ValueError("fpp must be in (0, 1)")
    m = math.ceil(-expected_n * math.log(fpp) / (math.log(2) ** 2))
    m = max(64, ((m + 63) // 64) * 64)  # whole 64-bit words
    k = max(1, round(m / expected_n * math.log(2)))
    return m, k


def _positions(col: Column, n_bits: int, k: int) -> list[Column]:
    """k bit positions via double hashing (2 xxhash64 evals). The
    hashes are reduced mod m BEFORE combining so the arithmetic stays
    far below 2^63 — Spark runs ANSI mode, where raw 64-bit hash
    addition would raise ARITHMETIC_OVERFLOW."""
    h1 = F.pmod(F.xxhash64(col, F.lit(0)), F.lit(n_bits))
    h2 = F.pmod(F.xxhash64(col, F.lit(1)), F.lit(n_bits))
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(n_bits)) for i in range(k)]


def bloom_build(df: DataFrame, key_col: str, expected_n: int | None = None,
                fpp: float = 0.01, n_bits: int | None = None,
                k: int | None = None) -> dict:
    """Build a Bloom filter over ``df[key_col]`` distributively.

    Returns ``{"words": list[int], "n_bits", "k"}`` — a plain dict,
    picklable/JSON-able, so a filter built once (e.g. over benchmark
    ids) can be persisted and reused across sessions. Size the filter
    with ``expected_n``/``fpp`` or pass ``n_bits``/``k`` directly.
    """
    if n_bits is None or k is None:
        if expected_n is None:
            expected_n = df.count()
        n_bits, k = bloom_params(expected_n, fpp)
    key = F.col(key_col)
    pos = F.explode(F.array(*_positions(key, n_bits, k))).alias("pos")
    # pyspark's F.shiftleft only takes a literal shift amount, so the
    # column-valued shift goes through a SQL expression
    words = (
        df.filter(key.isNotNull())
        .select(pos)
        .groupBy((F.col("pos") / 64).cast("int").alias("word_idx"))
        .agg(
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT),"
                " CAST(pos % 64 AS INT)))"
            ).alias("word")
        )
        .collect()
    )
    arr = [0] * (n_bits // 64)
    for r in words:
        arr[r["word_idx"]] = r["word"]
    return {"words": arr, "n_bits": n_bits, "k": k}


def with_bloom(df: DataFrame, bloom: dict) -> DataFrame:
    """Attach the filter's word array to every row via a one-row
    broadcast cross join (column ``_bf_words``) — the executor-side
    carrier for the membership test. Drop the column after
    filtering."""
    spark = df.sparkSession
    words_df = spark.createDataFrame(
        [(bloom["words"],)], "words: array<long>"
    ).select(F.col("words").alias("_bf_words"))
    return df.crossJoin(F.broadcast(words_df))


def bloom_filter_rows(df: DataFrame, key_col: str, bloom: dict) -> DataFrame:
    """Map-side prune: keep rows whose key MIGHT be in the filter
    (contains all members; passes ~fpp of non-members). No shuffle of
    ``df``. The k bit probes are element_at + shiftrightunsigned
    expressions in whole-stage codegen (shift amounts are
    column-valued, so they go through SQL expressions over named
    position columns)."""
    n_bits, k = bloom["n_bits"], bloom["k"]
    out = with_bloom(df, bloom)
    pos_cols = _positions(F.col(key_col), n_bits, k)
    for i, p in enumerate(pos_cols):
        out = out.withColumn(f"_bf_p{i}", p)
    test = None
    for i in range(k):
        check = F.expr(
            f"(shiftrightunsigned(element_at(_bf_words,"
            f" CAST(_bf_p{i} / 64 AS INT) + 1),"
            f" CAST(_bf_p{i} % 64 AS INT)) & 1) = 1"
        )
        test = check if test is None else (test & check)
    pruned = out.filter(test)
    return pruned.drop("_bf_words", *[f"_bf_p{i}" for i in range(k)])


def bloom_semi_join(large: DataFrame, small: DataFrame, key_col: str,
                    fpp: float = 0.01, expected_n: int | None = None,
                    ) -> DataFrame:
    """EXACT semi-join of ``large`` against ``small`` keys with a
    Bloom prefilter: build over the small side, prune ``large``
    map-side, then a confirming ``left_semi`` join over the survivors
    only. No false negatives (Bloom property) and the join removes
    false positives, so the result equals a plain semi-join — the
    oracle-checkable contract (q116)."""
    bloom = bloom_build(small, key_col, expected_n=expected_n, fpp=fpp)
    survivors = bloom_filter_rows(large, key_col, bloom)
    return survivors.join(
        F.broadcast(small.select(key_col).distinct()), key_col, "left_semi"
    )
