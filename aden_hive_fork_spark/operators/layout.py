"""Data-layout maintenance: small-files compaction and sort-clustered
rewrite (SCALING.md §9).

Two chronic operational problems of a large parquet lake, both absent
from the reference (its stores are managed DBs — Postgres/BigQuery —
so layout is the warehouse's problem; here the lake IS the store):

- **Small files.** Streaming sinks, fine-grained partitioning, and
  per-task writes leave thousands of KB-sized files; every subsequent
  query pays per-file open/footer cost and the scheduler pays
  per-split overhead. At 100 TB this dominates scan time long before
  bytes do. ``compact`` rewrites a directory to ~``target_bytes``
  files in one distributed job.
- **No clustering.** Parquet row-group min/max statistics only prune
  when values are physically clustered. ``compact(sort_cols=...)``
  range-partitions on the sort key and sorts within partitions, so a
  range filter on that key skips whole files (disjoint per-file
  ranges) and whole row groups within files.

Swap discipline: the rewrite lands in a sibling ``<path>.__compact__``
directory (Spark job-commit gives all-or-nothing within it), then the
old directory is renamed aside, the new one renamed into place, and
the old removed — the standard HDFS/posix recipe. On an object store
without atomic rename, flip a metastore/manifest location instead
(documented, not emulated here).
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024  # HDFS-block-sized files


def layout_stats(path: str) -> dict:
    """File-level stats for a parquet directory: count, bytes, sizes.

    Driver-side directory listing — this is a METADATA operation, the
    same single listing every planner does before a scan; it never
    reads data bytes. (At cloud scale the listing API differs but the
    cost shape is identical.)
    """
    sizes = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith((".parquet", ".snappy.parquet")) and not f.startswith("_"):
                sizes.append(os.path.getsize(os.path.join(root, f)))
    total = sum(sizes)
    return {
        "n_files": len(sizes),
        "total_bytes": total,
        "min_bytes": min(sizes) if sizes else 0,
        "max_bytes": max(sizes) if sizes else 0,
        "avg_bytes": total // len(sizes) if sizes else 0,
    }


def plan_target_files(total_bytes: int, target_bytes: int = DEFAULT_TARGET_BYTES) -> int:
    """How many output files a compaction should produce. Parquet
    compresses ~uniformly across a rewrite of the same data, so
    planning on current on-disk bytes is accurate."""
    return max(1, math.ceil(total_bytes / max(1, target_bytes)))


def zorder_value(df: DataFrame, cols: list[str], bits: int = 16) -> F.Column:
    """Morton (Z-order) key over numeric ``cols`` as a pure-JVM Column.

    Each column is min/max-scaled to ``bits`` bits (one tiny agg job
    collects the bounds — driver-side metadata, like any stats pass),
    then the bit planes are interleaved: bit i of column j lands at
    position ``i*len(cols)+j``. Nearby points in ANY dimension stay
    nearby in z, so range-clustering on z gives min/max pruning on
    EVERY z-ordered column at once — where a lexicographic sort only
    prunes its leading column. Linear scaling keeps the expression
    whole-stage-codegen-able; heavy skew in a column wastes some of
    its bit range (rank-based scaling would fix that at the cost of a
    per-column sort — not worth it for a layout pass).
    """
    k = len(cols)
    assert 1 <= k * bits <= 63, "z-value must fit a signed long"
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{c}") for c in cols],
    ).first()
    z = F.lit(0).cast("long")
    top = (1 << bits) - 1
    for j, c in enumerate(cols):
        lo, hi = bounds[f"lo_{c}"], bounds[f"hi_{c}"]
        span = (hi - lo) or 1.0
        scaled = F.least(
            F.lit(top),
            F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * top).cast(
                "long"
            ),
        )
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(scaled, i).bitwiseAND(F.lit(1)), i * k + j
            ).cast("long")
    return z


def compact(
    spark: SparkSession,
    path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    sort_cols: list[str] | None = None,
    zorder_cols: list[str] | None = None,
    partition_cols: list[str] | None = None,
    schema: str | None = None,
    n_files: int | None = None,
) -> dict:
    """Rewrite a parquet directory to ~``target_bytes`` files; with
    ``sort_cols`` or ``zorder_cols``, also cluster so min/max pruning
    works.

    - plain compaction: ``repartition(n)`` — even-sized files, one
      round-robin shuffle, no key assumptions;
    - clustered compaction: ``repartitionByRange(n, cols)`` +
      ``sortWithinPartitions(cols)`` — per-file key ranges are
      DISJOINT (range exchange) and row groups inside each file are
      sorted, so a predicate on the sort key prunes at both levels.
      Range boundaries come from Spark's reservoir sample of the key —
      skewed keys still yield even file sizes.
    - z-ordered compaction: same, but clustered on the interleaved
      ``zorder_value`` of several columns — multi-dimension pruning
      for workloads that filter on more than the leading key.
    - hive-partitioned input: pass ``partition_cols`` to preserve the
      directory partitioning — rows are clustered per partition value
      so each partition dir gets ~one file per covering task instead
      of one per (task × partition); ``sort_cols`` then sorts within
      the partition dirs.

    Returns {"before": stats, "after": stats, "n_files_planned": n}.
    """
    if sort_cols and zorder_cols:
        raise ValueError("sort_cols and zorder_cols are mutually exclusive")
    if partition_cols and zorder_cols:
        raise ValueError("partition_cols and zorder_cols are mutually exclusive")
    before = layout_stats(path)
    # n_files pins the output layout exactly (deterministic granularity
    # for tests and for callers that size by row count); otherwise plan
    # from current on-disk bytes.
    n = n_files if n_files else plan_target_files(before["total_bytes"], target_bytes)
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    df = reader.parquet(path)
    if zorder_cols:
        z = zorder_value(df, zorder_cols)
        df = (
            df.withColumn("__z__", z)
            .repartitionByRange(n, F.col("__z__"))
            .sortWithinPartitions("__z__")
            .drop("__z__")
        )
    elif partition_cols:
        # cluster rows of one hive partition into the same task so the
        # writer emits few files per partition dir (round-robin would
        # scatter every partition over every task: n_parts × n files);
        # with sort_cols, also sort inside each task for row-group
        # pruning within the partition dirs
        df = df.repartition(n, *[F.col(c) for c in partition_cols])
        if sort_cols:
            df = df.sortWithinPartitions(*partition_cols, *sort_cols)
    elif sort_cols:
        cols = [F.col(c) for c in sort_cols]
        df = df.repartitionByRange(n, *cols).sortWithinPartitions(*cols)
    else:
        df = df.repartition(n)

    tmp = path.rstrip("/") + ".__compact__"
    bak = path.rstrip("/") + ".__old__"
    shutil.rmtree(tmp, ignore_errors=True)
    writer = df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)
    shutil.rmtree(bak, ignore_errors=True)
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
    return {"before": before, "after": layout_stats(path), "n_files_planned": n}


# ---------------------------------------------------------------------------
# Versioned publish: the object-store-safe alternative to the rename
# swap (public Iceberg/Delta design in miniature — a data layout is
# immutable once written; ONLY a tiny pointer changes).
# ---------------------------------------------------------------------------
_CURRENT = "_current.json"


def read_pointer(table_root: str) -> dict:
    """The current-version pointer payload ({} if none published).
    Carries at least {"version", "path"}; publishers may stash extra
    commit metadata (e.g. the streaming rollup's batch_id) so that
    metadata flips atomically WITH the data pointer."""
    import json

    try:
        with open(os.path.join(table_root, _CURRENT)) as fh:
            d = json.load(fh)
            return d if isinstance(d, dict) else {}
    except (OSError, ValueError):
        return {}


def write_pointer(table_root: str, version: int, **extra) -> None:
    """Atomically flip ``_current.json`` to ``version`` (single-file
    atomic replace — the one primitive every store offers; object
    stores: conditional put)."""
    import json

    tmp = os.path.join(table_root, _CURRENT + ".tmp")
    with open(tmp, "w") as fh:
        json.dump({"version": version, "path": f"v={version}", **extra}, fh)
    os.replace(tmp, os.path.join(table_root, _CURRENT))


def publish_version(df: DataFrame, table_root: str, **write_kw) -> int:
    """Write ``df`` as a NEW immutable version directory
    ``<root>/v=<n>`` and atomically flip the ``_current.json`` pointer
    to it. Readers that resolved the pointer before the flip keep
    reading the old version's files (immutable — never rewritten), so
    there is no torn-read window at all; the pointer write is a
    single-file atomic replace, which every store offers (object
    stores: put-if-absent / conditional put). Returns the version."""
    os.makedirs(table_root, exist_ok=True)
    version = current_version(table_root) + 1
    vdir = os.path.join(table_root, f"v={version}")
    writer = df.write.mode("overwrite")
    if write_kw.get("partition_cols"):
        writer = writer.partitionBy(*write_kw["partition_cols"])
    writer.parquet(vdir)
    write_pointer(table_root, version)
    return version


def current_version(table_root: str) -> int:
    v = read_pointer(table_root).get("version")
    return v if isinstance(v, int) else -1


def read_current(spark: SparkSession, table_root: str) -> DataFrame:
    """Resolve the pointer, read that immutable version."""
    v = current_version(table_root)
    if v < 0:
        raise FileNotFoundError(f"no published version under {table_root}")
    return spark.read.parquet(os.path.join(table_root, f"v={v}"))


def list_versions(table_root: str) -> list[int]:
    """All published versions on disk, ascending — the time-travel
    catalog (current marked by the pointer, older ones readable until
    vacuumed)."""
    try:
        return sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(table_root)
            if d.startswith("v=") and d.split("=", 1)[1].isdigit()
        )
    except OSError:
        return []


def read_version(spark: SparkSession, table_root: str, version: int) -> DataFrame:
    """TIME TRAVEL: read a specific published version. Versions are
    immutable directories, so reading an old one is exactly as safe as
    reading the current one — the Iceberg/Delta snapshot-read analog;
    pair with ``vacuum_versions(keep=...)`` to bound history."""
    vdir = os.path.join(table_root, f"v={version}")
    if not os.path.isdir(vdir):
        raise FileNotFoundError(
            f"version {version} not found under {table_root}"
            f" (have: {list_versions(table_root)})"
        )
    return spark.read.parquet(vdir)


def vacuum_versions(table_root: str, keep: int = 2) -> list[int]:
    """Drop all but the newest ``keep`` versions (never the current
    one). Run with a grace period at scale so in-flight readers of a
    just-superseded version finish first; returns removed versions."""
    current = current_version(table_root)
    versions = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(table_root)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    )
    removable = [v for v in versions[:-keep] if v != current] if keep else []
    for v in removable:
        shutil.rmtree(os.path.join(table_root, f"v={v}"), ignore_errors=True)
    return removable


def file_ranges(path: str, column: str) -> list[tuple]:
    """Per-FILE (min, max) of ``column`` from parquet footer metadata
    only — the exact information a scan planner prunes with. Used by
    tests to prove clustering produced disjoint, prunable ranges."""
    import pyarrow.parquet as pq

    out = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if not f.endswith(".parquet") or f.startswith("_"):
                continue
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            idx = md.schema.names.index(column)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is not None and st.has_min_max:
                    mins.append(st.min)
                    maxs.append(st.max)
            if mins:
                out.append((min(mins), max(maxs)))
    return out


def prunable_fraction(path: str, column: str, lo, hi) -> float:
    """Fraction of row groups a range predicate ``lo <= col < hi`` can
    SKIP using footer stats alone — 0.0 on unclustered data, → 1.0 as
    clustering sharpens. This is the measurable value of
    ``compact(sort_cols=...)`` without needing scan-metrics plumbing."""
    import pyarrow.parquet as pq

    total = skipped = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.endswith(".parquet") or f.startswith("_"):
                continue
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            idx = md.schema.names.index(column)
            for rg in range(md.num_row_groups):
                total += 1
                st = md.row_group(rg).column(idx).statistics
                if st is not None and st.has_min_max and (st.max < lo or st.min >= hi):
                    skipped += 1
    return skipped / total if total else 0.0


def hrw_assign(
    df: DataFrame, key_col: str, n_shards: int, out_col: str = "shard"
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment: key k
    goes to argmax_s md5(s || ':' || k) over shards 0..n_shards-1 —
    the placement scheme whose defining property is MINIMAL MOTION:
    growing to n+1 shards moves only the ~1/(n+1) of keys the new
    shard now wins, and every key moves TO the new shard, never
    between old ones (consistent-hashing's guarantee without the
    ring). md5-prefix weights keep the whole assignment
    engine-replayable.

    Pure map-side: the argmax is a GREATEST over n_shards (weight,
    shard) structs — no explode, no shuffle, whole-stage codegen.
    Ties (md5 collisions across 60 bits) break to the larger shard
    id by struct comparison, deterministically."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    key = F.col(key_col).cast("string")
    cands = [
        F.struct(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{s}:"), key)), 1, 15
                ),
                16,
                10,
            )
            .cast("long")
            .alias("h"),
            F.lit(s).cast("int").alias("s"),
        )
        for s in range(n_shards)
    ]
    best = cands[0] if n_shards == 1 else F.greatest(*cands)
    return df.withColumn(out_col, best.getField("s"))
