"""Surrogate-key assignment: global contiguous row ids at scale.

Every warehouse load eventually needs ``ROW_NUMBER() OVER (ORDER BY
...)`` across the whole table — and the naive window is a single-task
bottleneck (one Exchange to ONE partition sorts 100 TB on one core).
The reference sidesteps the problem by numbering rows in its
single-process readers; a distributed engine cannot.

The scalable shape (the classic two-pass zipWithIndex, DataFrame-
first):

1. ``repartitionByRange`` on the order key + ``sortWithinPartitions``
   — a range shuffle, the same cost as any global sort, parallel in
   the partition count. The sorted DataFrame is eagerly
   local-checkpointed so both passes see the SAME range boundaries
   (the range partitioner samples its input; materializing once
   pins the outcome, and checkpoint blocks are ContextCleaner-
   reclaimed when the plan is dropped).
2. count rows per partition — a tiny job collecting #partitions
   longs to the driver (scale-independent).
3. cumulative offsets ship back in the task closure; a single
   ``mapInPandas`` pass numbers each partition locally using
   ``TaskContext.partitionId()`` — Arrow-batched, no extra shuffle,
   no JVM→single-task funnel.

Determinism: ids equal DuckDB's ``ROW_NUMBER() OVER (ORDER BY ...)``
exactly when the order key is unique (enforce with the key columns
you pass); range partitioning keeps equal keys in one partition, so
sortWithinPartitions is a true global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def dense_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "row_id",
    start: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``id_col`` = contiguous global row number (``start``,
    ``start+1``, ...) in ``order_cols`` order, without ever funneling
    the data through one task. ``order_cols`` must be a unique key
    for deterministic output. The sorted input is eagerly
    LOCAL-CHECKPOINTED — materialized once, lineage truncated — which
    pins the sampled range boundaries both passes depend on (a bare
    re-execution would re-sample them and corrupt the offsets).
    Unlike ``persist`` (CacheManager holds a strong reference until
    an explicit unpersist), checkpoint blocks belong to the RDD and
    are reclaimed by the ContextCleaner once the returned plan is
    garbage-collected — repeated calls don't accumulate storage.
    """
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    if id_col in df.columns:
        raise ValueError(
            f"dense_ids: column {id_col!r} already exists in the input "
            "— pass a different id_col (appending would duplicate the "
            "field in the output schema)"
        )
    n = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200"
    )
    sorted_df = df.repartitionByRange(
        int(n), *[F.col(c) for c in order_cols]
    ).sortWithinPartitions(*order_cols)
    sorted_df = sorted_df.localCheckpoint(eager=True)

    sizes = (
        sorted_df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    counts = {r["_pid"]: r["_n"] for r in sizes}
    offsets: dict[int, int] = {}
    acc = start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = StructType(
        list(sorted_df.schema.fields) + [StructField(id_col, LongType())]
    )

    def _number(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        nxt = offsets.get(pid, start)
        for pdf in batches:
            pdf[id_col] = range(nxt, nxt + len(pdf))
            nxt += len(pdf)
            yield pdf

    return sorted_df.mapInPandas(_number, out_schema)


def running_totals(
    df: DataFrame,
    order_cols: list[str],
    weight_col: str | list[str],
    cum_col: str | list[str] = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``cum_col`` = INCLUSIVE running ``SUM(weight_col)`` in
    ``order_cols`` order — the distributed twin of
    ``SUM(w) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`` without
    the single-task global window (``Exchange SinglePartition`` +
    one Sort of the whole input) that the naive plan produces.

    Same two-pass shape as :func:`dense_ids`: range shuffle + local
    sort (eagerly local-checkpointed to pin the sampled boundaries),
    per-partition weight sums collected to the driver (#partitions
    longs — scale-independent), offsets shipped in the task closure,
    one Arrow-batched ``mapInPandas`` cumsum per partition.

    ``weight_col`` must be integral (LONG) so the running sum is
    exact under any partitioning; ``order_cols`` must be a unique key
    for deterministic output. Built for the rank-statistic family
    (Kruskal-Wallis doubled ranks, Lorenz shares, exact order
    statistics), where the cumulative count over DISTINCT values
    replaces ranking the whole corpus.
    """
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    weights = [weight_col] if isinstance(weight_col, str) else list(weight_col)
    cums = [cum_col] if isinstance(cum_col, str) else list(cum_col)
    if len(weights) != len(cums):
        raise ValueError(
            "running_totals: weight_col and cum_col lists must pair up"
        )
    for c in cums:
        if c in df.columns:
            raise ValueError(
                f"running_totals: column {c!r} already exists in the "
                "input — pass a different cum_col"
            )
    n = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200"
    )
    tmp = [f"_w64_{i}" for i in range(len(weights))]
    sorted_df = df
    for t, w in zip(tmp, weights):
        sorted_df = sorted_df.withColumn(t, F.col(w).cast("long"))
    sorted_df = sorted_df.repartitionByRange(
        int(n), *[F.col(c) for c in order_cols]
    ).sortWithinPartitions(*order_cols)
    sorted_df = sorted_df.localCheckpoint(eager=True)

    sums = (
        sorted_df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(
            *[F.sum(t).alias(t) for t in tmp],
            *[
                F.sum(F.col(t).isNull().cast("long")).alias(f"_null_{t}")
                for t in tmp
            ],
        )
        .collect()
    )
    # enforce the documented "must be integral" contract: a NULL
    # weight survives the long cast and the driver-side sum coalesces
    # it to 0, but the pandas cumsum path would turn the column
    # float-with-NaN and fail (or corrupt) inside an executor, far
    # from the cause (ADVICE r7). Checked from the SAME per-partition
    # aggregate — no extra pass.
    bad = sorted(
        {
            w
            for r in sums
            for t, w in zip(tmp, weights)
            if (r[f"_null_{t}"] or 0) > 0
        }
    )
    if bad:
        raise ValueError(
            f"running_totals: weight column(s) {bad} contain NULLs "
            "(or values that cast to NULL as LONG) — weights must be "
            "non-null integral"
        )
    psums = {r["_pid"]: [int(r[t] or 0) for t in tmp] for r in sums}
    offsets: dict[int, list[int]] = {}
    acc = [0] * len(tmp)
    for pid in sorted(psums):
        offsets[pid] = list(acc)
        acc = [a + b for a, b in zip(acc, psums[pid])]

    out_schema = StructType(
        [f for f in sorted_df.schema.fields if f.name not in tmp]
        + [StructField(c, LongType()) for c in cums]
    )

    def _cumsum(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        run = list(offsets.get(pid, [0] * len(tmp)))
        for pdf in batches:
            outs = {}
            for j, (t, c) in enumerate(zip(tmp, cums)):
                col = pdf[t].cumsum() + run[j]
                run[j] = int(col.iloc[-1]) if len(col) else run[j]
                outs[c] = col.astype("int64")
            pdf = pdf.drop(columns=tmp)
            for c, col in outs.items():
                pdf[c] = col
            yield pdf

    return sorted_df.mapInPandas(_cumsum, out_schema)
