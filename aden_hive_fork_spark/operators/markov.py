"""Markov chain analysis of event streams: transition matrix +
stationary distribution by power iteration.

The chain is estimated from per-key ordered event sequences (the
q174 lead-window shape): one window pass emits (src, dst) pairs, one
aggregate counts them, and row-normalization gives the maximum-
likelihood transition matrix. The stationary distribution π (πP = π)
is the long-run fraction of time the process spends in each state —
the standard summary of user-journey equilibria.

Scale contract: the corpus is touched EXACTLY ONCE (the window +
count aggregate); the transition matrix is states² rows — bounded by
the state vocabulary, not the corpus — and is collected to the
driver like the k·d k-means centroids (operators/kmeans.py:88
precedent). Power iteration then runs driver-side over that bounded
matrix.

Determinism (the oracle contract): every arithmetic step mirrors the
suite's two-engine discipline so DuckDB replays it bit for bit —
  - p(i,j) = n_ij / n_i· as one IEEE double division of exact ints;
  - each iteration's π_j = round(sorted-fold Σ_i π_i·p(i,j), 9):
    products are IEEE-identical, the fold is the det_sum sorted
    left-fold (DuckDB: list_sum(list_sort(list(..)))), and the round
    is half-up on the shortest decimal repr — Python's repr() is the
    same shortest-repr algorithm as java.lang.Double.toString, so
    the driver-side fold below is arithmetically the same function
    Spark's F.round∘F.aggregate computes.
The oracle unrolls the iterations as chained MATERIALIZED CTEs
(ml.py:24 k-means precedent).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def event_transitions(
    df: DataFrame,
    key_col: str,
    order_col: str,
    state_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """(src, dst, n, p): maximum-likelihood transition matrix of the
    per-key state sequences. Dead-end sinks (states with no out-edge)
    would make the chain substochastic, so the state set is closed to
    the FIXED POINT of "every kept state has at least one out-edge
    into the kept set" — a single-pass restriction is not enough: a
    source whose every out-edge targets a sink loses its own row and
    becomes a fresh dead end for states transitioning INTO it, which
    would leak probability mass each power iteration. Rows are
    renormalized AFTER the closure, so every surviving row sums to
    exactly 1.

    The closure runs driver-side over the DISTINCT edge list — a
    states²-bounded collect, the same driver-bounded-state contract
    as the matrix itself (module docstring); the corpus is still
    touched exactly once.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(order_col).asc(), F.col(tiebreak_col).asc()
    )
    pairs = (
        df.select(
            F.col(state_col).alias("src"),
            F.lead(state_col).over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )
    counts = pairs.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # materialize the states²-bounded edge table BEFORE the closure's
    # collect — otherwise the corpus window/aggregate lineage executes
    # once for the collect and AGAIN when the returned DataFrame is
    # consumed, breaking the "corpus touched exactly once" contract
    # (ADVICE r7)
    counts = counts.localCheckpoint(eager=True)
    edges = [
        (r["src"], r["dst"]) for r in counts.select("src", "dst").collect()
    ]
    keep = {s for s, _ in edges}
    while True:
        nxt = {s for s, d in edges if s in keep and d in keep}
        if nxt == keep:
            break
        keep = nxt
    if not keep:
        # every state is transitively a dead end (e.g. a strict DAG
        # of states): no stochastic chain exists — empty matrix
        return counts.filter(F.lit(False)).withColumn(
            "p", F.lit(0.0).cast("double")
        )
    closed = counts.filter(
        F.col("src").isin(sorted(keep)) & F.col("dst").isin(sorted(keep))
    )
    tot = Window.partitionBy("src")
    return closed.withColumn(
        "p",
        F.col("n").cast("double") / F.sum("n").over(tot).cast("double"),
    )


def _round_half_up(x: float, ndigits: int) -> float:
    """F.round semantics for non-negative doubles: HALF_UP on the
    shortest decimal representation (repr ≡ Double.toString)."""
    q = Decimal(1).scaleb(-ndigits)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def stationary_distribution(
    trans: DataFrame,
    n_iter: int = 15,
    ndigits: int = 9,
) -> DataFrame:
    """Power-iterate π ← πP for ``n_iter`` rounds from the uniform
    start and return (state, pi). The matrix is bounded (states²),
    so it collects to the driver and the iteration is a driver-side
    mirror of the relational arithmetic — see module docstring for
    why the fold is bit-identical to the det_sum form the oracle
    replays.
    """
    spark = trans.sparkSession
    rows = trans.select("src", "dst", "p").collect()
    states = sorted({r["src"] for r in rows})
    if not states:
        return spark.createDataFrame([], "state string, pi double")
    pi = {s: 1.0 / len(states) for s in states}
    by_dst: dict[str, list[tuple[str, float]]] = {s: [] for s in states}
    for r in rows:
        if r["dst"] not in by_dst:
            raise ValueError(
                f"stationary_distribution: dst state {r['dst']!r} never "
                "occurs as a src — the matrix is substochastic. Build the "
                "input with event_transitions (which closes the state set "
                "to a fixed point) or restrict dst to the src vocabulary."
            )
        by_dst[r["dst"]].append((r["src"], float(r["p"])))
    for _ in range(n_iter):
        nxt: dict[str, float] = {}
        for s in states:
            terms = sorted(pi[src] * p for src, p in by_dst[s])
            acc = 0.0
            for t in terms:
                acc += t
            nxt[s] = _round_half_up(acc, ndigits)
        pi = nxt
    return spark.createDataFrame(
        [(s, pi[s]) for s in states], "state string, pi double"
    )
