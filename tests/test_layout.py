"""Layout maintenance: compaction shrinks file counts losslessly and
sort-clustering produces footer stats a planner can prune with."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from aden_hive_fork_spark.operators.layout import (
    compact,
    file_ranges,
    layout_stats,
    plan_target_files,
    prunable_fraction,
)

SF_SMALL = "/root/testdata/sf0.001"


def _checksum(spark, path):
    """Order-insensitive content checksum: (rows, decimal sum of row hashes)."""
    df = spark.read.parquet(path)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64(*sorted(df.columns)).cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("h"),
    ).first()
    return (row["n"], row["h"])


@pytest.fixture()
def fragmented(spark, tmp_path):
    """customer slice written as 40 deliberately tiny files."""
    out = str(tmp_path / "frag")
    (
        spark.read.parquet(os.path.join(SF_SMALL, "customer.parquet"))
        .select("c_custkey", "c_nationkey", "c_acctbal")
        .repartition(40)
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def test_plan_target_files():
    assert plan_target_files(0) == 1
    assert plan_target_files(1, 128) == 1
    assert plan_target_files(129, 128) == 2
    assert plan_target_files(10 * 128, 128) == 10


def test_compact_shrinks_files_losslessly(spark, fragmented):
    before_sum = _checksum(spark, fragmented)
    stats = compact(spark, fragmented, target_bytes=64 * 1024 * 1024)
    assert stats["before"]["n_files"] == 40
    assert stats["after"]["n_files"] < stats["before"]["n_files"]
    assert stats["after"]["n_files"] == stats["n_files_planned"]
    assert _checksum(spark, fragmented) == before_sum
    # swap dirs cleaned up
    assert not os.path.exists(fragmented + ".__compact__")
    assert not os.path.exists(fragmented + ".__old__")


def test_compact_idempotent(spark, fragmented):
    before_sum = _checksum(spark, fragmented)
    compact(spark, fragmented, target_bytes=64 * 1024 * 1024)
    again = compact(spark, fragmented, target_bytes=64 * 1024 * 1024)
    assert again["after"]["n_files"] == again["before"]["n_files"]
    assert _checksum(spark, fragmented) == before_sum


def test_clustered_compact_disjoint_ranges(spark, fragmented):
    before_sum = _checksum(spark, fragmented)
    # force several output files so disjointness is non-trivial
    compact(spark, fragmented, target_bytes=8 * 1024, sort_cols=["c_custkey"])
    assert _checksum(spark, fragmented) == before_sum
    ranges = sorted(file_ranges(fragmented, "c_custkey"))
    assert len(ranges) >= 3
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev < lo_next  # range exchange ⇒ per-file key ranges disjoint


def test_clustering_enables_pruning(spark, fragmented):
    lo, hi = 100, 200
    # unclustered: every row group's [min,max] spans ~the full key
    # space, nothing prunable
    assert prunable_fraction(fragmented, "c_custkey", lo, hi) < 0.5
    compact(spark, fragmented, target_bytes=8 * 1024, sort_cols=["c_custkey"])
    frac = prunable_fraction(fragmented, "c_custkey", lo, hi)
    assert frac > 0.5  # most row groups now skippable by footer stats
    # and the filtered read still returns exactly the right rows
    got = (
        spark.read.parquet(fragmented)
        .filter((F.col("c_custkey") >= lo) & (F.col("c_custkey") < hi))
        .count()
    )
    want = (
        spark.read.parquet(os.path.join(SF_SMALL, "customer.parquet"))
        .filter((F.col("c_custkey") >= lo) & (F.col("c_custkey") < hi))
        .count()
    )
    assert got == want


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """Lexicographic sort prunes only its leading column; z-order
    makes BOTH filter columns prunable from footer stats."""
    out_lex = str(tmp_path / "lex")
    out_z = str(tmp_path / "zord")
    # two independent uniform dimensions
    df = spark.range(20000).select(
        (F.col("id") % 141).alias("x"),
        ((F.col("id") * 7919) % 149).alias("y"),
        F.col("id").alias("payload"),
    )
    for out in (out_lex, out_z):
        df.repartition(16).write.mode("overwrite").parquet(out)
    # pin the file count: byte-planned granularity jitters with parquet
    # encoding noise, and the prunable fractions below are functions of
    # bucket granularity
    compact(spark, out_lex, sort_cols=["x", "y"], n_files=32)
    compact(spark, out_z, zorder_cols=["x", "y"], n_files=32)

    # content identical either way
    want = sorted(
        (r["x"], r["y"], r["payload"]) for r in df.collect()
    )
    got = sorted(
        (r["x"], r["y"], r["payload"])
        for r in spark.read.parquet(out_z).collect()
    )
    assert got == want

    x_lex = prunable_fraction(out_lex, "x", 40, 60)
    y_lex = prunable_fraction(out_lex, "y", 40, 60)
    x_z = prunable_fraction(out_z, "x", 40, 60)
    y_z = prunable_fraction(out_z, "y", 40, 60)
    assert x_lex > 0.5  # leading column prunes under lexicographic sort
    assert y_lex < 0.2  # ...but the second column does not
    assert x_z > 0.3 and y_z > 0.3  # z-order prunes BOTH dimensions
    assert y_z > y_lex + 0.2


def test_partitioned_compact_preserves_layout(spark, tmp_path):
    """A hive-partitioned directory keeps its partition dirs (and gets
    few files per dir) instead of being flattened."""
    out = str(tmp_path / "part")
    df = spark.read.parquet(os.path.join(SF_SMALL, "orders.parquet")).select(
        "o_orderkey",
        "o_totalprice",
        (F.col("o_orderkey") % 4).alias("bucket"),
    )
    df.repartition(24).write.mode("overwrite").partitionBy("bucket").parquet(out)
    frag = layout_stats(out)
    before_sum = _checksum(spark, out)
    stats = compact(
        spark,
        out,
        target_bytes=64 * 1024 * 1024,
        partition_cols=["bucket"],
        sort_cols=["o_orderkey"],
    )
    assert _checksum(spark, out) == before_sum
    dirs = sorted(d for d in os.listdir(out) if d.startswith("bucket="))
    assert dirs == ["bucket=0", "bucket=1", "bucket=2", "bucket=3"]
    assert stats["after"]["n_files"] < frag["n_files"]
    # each partition dir collapsed to a handful of files
    for d in dirs:
        files = [f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")]
        assert 1 <= len(files) <= 2
    # rows sorted within the partition dirs: per-file ranges exist and
    # the partition's files are internally ordered
    for d in dirs:
        ranges = file_ranges(os.path.join(out, d), "o_orderkey")
        assert ranges and all(lo <= hi for lo, hi in ranges)


def test_layout_stats_counts_only_parquet(tmp_path):
    d = tmp_path / "mixed"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"x" * 10)
    (d / "_SUCCESS").write_bytes(b"")
    (d / "notes.txt").write_bytes(b"y" * 99)
    st = layout_stats(str(d))
    assert st == {
        "n_files": 1,
        "total_bytes": 10,
        "min_bytes": 10,
        "max_bytes": 10,
        "avg_bytes": 10,
    }


def test_versioned_publish_roundtrip(spark, tmp_path):
    from aden_hive_fork_spark.operators.layout import (
        current_version,
        publish_version,
        read_current,
        vacuum_versions,
    )

    root = str(tmp_path / "tbl")
    df1 = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("x"))
    df2 = spark.range(5).select(F.col("id"), (F.col("id") * 3).alias("x"))
    assert current_version(root) == -1
    assert publish_version(df1, root) == 0
    old = read_current(spark, root)  # resolve pointer BEFORE next publish
    assert publish_version(df2, root) == 1
    # a reader that resolved v=0 still sees v=0's immutable files
    assert old.count() == 10
    assert read_current(spark, root).count() == 5
    assert current_version(root) == 1
    # third version, then vacuum to newest 2: v=0 goes, v=1/v=2 stay
    publish_version(df1, root)
    assert vacuum_versions(root, keep=2) == [0]
    assert sorted(d for d in os.listdir(root) if d.startswith("v=")) == [
        "v=1",
        "v=2",
    ]
    assert read_current(spark, root).count() == 10


def test_vacuum_never_drops_current(spark, tmp_path):
    from aden_hive_fork_spark.operators.layout import (
        publish_version,
        read_current,
        vacuum_versions,
    )

    root = str(tmp_path / "tbl")
    df = spark.range(3)
    publish_version(df, root)
    # keep=0 still refuses to remove the version the pointer names
    removed = vacuum_versions(root, keep=0)
    assert 0 not in removed
    assert read_current(spark, root).count() == 3


def test_compact_failure_leaves_original(spark, fragmented, monkeypatch):
    """If the rewrite job dies, the original directory is untouched."""
    before_sum = _checksum(spark, fragmented)
    def boom(*a, **k):
        raise RuntimeError("simulated write failure")

    # patch the CONCRETE DataFrame class (pyspark 4 splits the classic
    # implementation from the abstract pyspark.sql.DataFrame)
    monkeypatch.setattr(
        type(spark.read.parquet(fragmented)), "repartition", boom, raising=True
    )
    with pytest.raises(RuntimeError):
        compact(spark, fragmented)
    assert _checksum(spark, fragmented) == before_sum
    shutil.rmtree(fragmented + ".__compact__", ignore_errors=True)


def test_time_travel_reads(spark, tmp_path):
    """read_version serves any retained snapshot unchanged; vacuum
    bounds history; current pointer is unaffected by old reads."""
    import os

    from aden_hive_fork_spark.operators.layout import (
        current_version,
        list_versions,
        publish_version,
        read_current,
        read_version,
        vacuum_versions,
    )

    root = os.path.join(tmp_path, "tt")
    for n in (3, 5, 7):
        df = spark.range(0, n).withColumnRenamed("id", "k")
        publish_version(df, root)
    assert list_versions(root) == [0, 1, 2]
    assert read_version(spark, root, 0).count() == 3
    assert read_version(spark, root, 1).count() == 5
    assert read_current(spark, root).count() == 7
    assert current_version(root) == 2
    removed = vacuum_versions(root, keep=2)
    assert removed == [0]
    assert list_versions(root) == [1, 2]
    try:
        read_version(spark, root, 0)
        raise AssertionError("expected FileNotFoundError")
    except FileNotFoundError as e:
        assert "have: [1, 2]" in str(e)
