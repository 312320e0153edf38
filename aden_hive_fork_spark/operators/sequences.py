"""Event-sequence mining: the first-order Markov transition matrix.

``transition_matrix`` turns per-key ordered event streams into the
(from_state, to_state, count, probability) table — the behavioral
fingerprint behind next-action prediction, funnel drop-off analysis,
and bot detection (a scripted client's transition rows are
near-deterministic; a human's are diffuse — feed the per-key
matrices to ``stats.mutual_information`` or ``quality.kl_drift`` to
score them).

Shape for scale: consecutive pairs come from ONE ``lead`` window
partitioned by the sequence key — the shuffle moves each event
exactly once, keyed by the sequence key (bounded per-key state, no
cross-key ordering). The pair table then aggregates by (from, to):
|states|² groups at most, map-side combined. Probabilities divide by
the from-state total via a second tiny aggregate joined back
(broadcast — the state alphabet is small by construction; if yours
is not, the join degrades to shuffle gracefully).

Reference parity: the reference's event-log analytics expose
"what happens after X" queries over `core/framework` event streams;
this is the batch matrix form (see SURVEY.md §2.C row 61).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transition_matrix(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    state_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """First-order Markov transitions between consecutive
    ``state_col`` values within each key's ``order_cols``-ordered
    sequence. Output: ``from_state, to_state, n_transitions,
    prob`` (row-stochastic per from_state). ``order_cols`` must be a
    per-key unique ordering (include an id tie-break) or the lead
    pairing — and thus the counts — would be nondeterministic under
    timestamp ties.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c) for c in order_cols]
    )
    pairs = (
        df.select(
            *key_cols,
            *order_cols,
            F.col(state_col).alias("from_state"),
        )
        .withColumn("to_state", F.lead("from_state").over(w))
        .filter(F.col("to_state").isNotNull())
    )
    counts = pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_transitions")
    )
    totals = counts.groupBy("from_state").agg(
        F.sum("n_transitions").cast("bigint").alias("_tot")
    )
    return (
        counts.join(F.broadcast(totals), "from_state")
        .select(
            "from_state",
            "to_state",
            "n_transitions",
            F.round(
                F.col("n_transitions").cast("double")
                / F.col("_tot").cast("double"),
                ndigits,
            )
            .cast("double")
            .alias("prob"),
        )
    )


def session_paths(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tie_cols: list[str],
    state_col: str,
    gap_minutes: int = 30,
    max_steps: int = 3,
) -> DataFrame:
    """Top navigation paths: sessionize each key's event stream
    (gaps-and-islands — a new session starts after ``gap_minutes``
    of silence), take the first ``max_steps`` states of every session
    in event order, and count sessions per path string ("view>click>
    purchase"). Output: ``path, n_sessions``.

    The entry-path report behind landing-flow and drop-off analysis —
    the composition of sessionization (q136) and sequence mining
    (transition_matrix), collapsed to one window pass: the SAME
    (key, ts, ties) window computes the session break flag and the
    running session id (rows frame), so the stream shuffles once.
    Per-session state lists are session-length-bounded (collect of a
    session's first events, not a key's history); the path table is
    |states|^max_steps at most, map-side combined.

    Explicit gaps-and-islands rather than ``F.session_window`` so
    the identical arithmetic replays in the oracle; q136 proves the
    native operator computes the same sessions.
    """
    base = df.select(
        *key_cols,
        F.col(ts_col).alias("_ts"),
        *[F.col(c).alias(f"_t{i}") for i, c in enumerate(tie_cols)],
        F.col(state_col).alias("_s"),
    )
    w = Window.partitionBy(*key_cols).orderBy(
        "_ts", *[f"_t{i}" for i in range(len(tie_cols))]
    )
    brk = F.when(
        F.lag("_ts").over(w).isNull()
        | (
            (F.col("_ts") - F.lag("_ts").over(w))
            >= F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")
        ),
        1,
    ).otherwise(0)
    t = base.withColumn("_brk", brk).withColumn(
        "_sid",
        F.sum("_brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_session = t.groupBy(*key_cols, "_sid").agg(
        F.slice(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "_ts",
                        *[f"_t{i}" for i in range(len(tie_cols))],
                        "_s",
                    )
                )
            ),
            1,
            max_steps,
        ).alias("_head")
    )
    path = F.array_join(
        F.transform(F.col("_head"), lambda s: s["_s"]), ">"
    )
    return (
        per_session.select(path.alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
    )


def funnel_steps(
    df,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    ndigits: int = 6,
):
    """Ordered funnel analysis: how many users complete step 1, then
    step 2 STRICTLY AFTER their first step-1 event, then step 3 after
    that, ... One row per step: ``step_idx, step, n_users,
    conv_from_prev, conv_from_first`` (rates NULL on an empty
    predecessor).

    Semantics: a user "reaches" step k at the EARLIEST event of type
    steps[k] that is strictly later than their step-(k−1) reach time
    — the standard strict-order funnel (re-orderings don't count;
    simultaneous events don't count, which makes the result
    tie-independent and engine-exact: everything is MIN over
    timestamps).

    Scale shape: one filtered keyed aggregate per step, each joined
    on ``user_col`` — k−1 co-keyed hash joins; every intermediate is
    one row per surviving user. No windows, no per-user event lists.
    """
    from pyspark.sql import functions as F

    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    base = df.filter(
        F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(type_col).isin(list(steps))
    ).select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.col(type_col).alias("_k"),
    )
    reached = (
        base.filter(F.col("_k") == steps[0])
        .groupBy("_u")
        .agg(F.min("_ts").alias("_t"))
    )
    counts = [reached.count()]
    for step in steps[1:]:
        ev = base.filter(F.col("_k") == step).select(
            "_u", F.col("_ts").alias("_ts2")
        )
        reached = (
            ev.join(reached, "_u")
            .filter(F.col("_ts2") > F.col("_t"))
            .groupBy("_u")
            .agg(F.min("_ts2").alias("_t"))
        )
        reached = reached.localCheckpoint(eager=True)  # one row/user
        counts.append(reached.count())
    spark = df.sparkSession
    import math

    p = float(10 ** ndigits)
    # floor-quantization in float64 — bit-identical to the oracle's
    # FLOOR(x·1e6 + 0.5)/1e6 (Python round() is half-EVEN and would
    # diverge at rate boundaries)
    q = lambda x: math.floor(x * p + 0.5) / p  # noqa: E731
    rows = []
    for i, (step, n) in enumerate(zip(steps, counts)):
        prev = counts[i - 1] if i > 0 else None
        first = counts[0]
        if i == 0:
            conv_prev = 1.0 if n else None
        else:
            conv_prev = q(n / prev) if prev else None
        conv_first = q(n / first) if first else None
        rows.append((i + 1, step, n, conv_prev, conv_first))
    return spark.createDataFrame(
        rows,
        "step_idx int, step string, n_users bigint, "
        "conv_from_prev double, conv_from_first double",
    )
