"""SCD-2 interval builder + record-linkage operator tests:
hand-computed episodes, no-op collapse, point-in-time lookups, single
shared Exchange plan guard; similarity kinds, blocking requirement,
best-match selection."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from aden_hive_fork_spark.operators.linkage import link_records, similarity
from aden_hive_fork_spark.operators.scd import build_scd2, scd2_asof


def ts(s):
    return datetime.fromisoformat(s)


CHANGELOG = [
    ("a", ts("2024-01-01T00:00:00"), "bronze"),
    ("a", ts("2024-01-02T00:00:00"), "bronze"),   # no-op → collapsed
    ("a", ts("2024-01-03T00:00:00"), "silver"),
    ("a", ts("2024-01-05T00:00:00"), "gold"),
    ("b", ts("2024-01-02T00:00:00"), "silver"),
]


def test_build_scd2_episodes(spark):
    df = spark.createDataFrame(CHANGELOG, ["k", "ts", "tier"])
    out = sorted(
        build_scd2(df, "k", "ts", ["tier"]).collect(),
        key=lambda r: (r["k"], r["episode"]),
    )
    got = [(r["k"], r["tier"], r["valid_from"], r["valid_to"],
            r["is_current"], r["episode"]) for r in out]
    assert got == [
        ("a", "bronze", ts("2024-01-01T00:00:00"),
         ts("2024-01-03T00:00:00"), False, 1),
        ("a", "silver", ts("2024-01-03T00:00:00"),
         ts("2024-01-05T00:00:00"), False, 2),
        ("a", "gold", ts("2024-01-05T00:00:00"), None, True, 3),
        ("b", "silver", ts("2024-01-02T00:00:00"), None, True, 1),
    ]


def test_build_scd2_multi_attr_and_validation(spark):
    rows = [
        ("a", ts("2024-01-01T00:00:00"), "x", 1),
        ("a", ts("2024-01-02T00:00:00"), "x", 2),   # attr2 change → episode
        ("a", ts("2024-01-03T00:00:00"), "x", 2),   # no-op
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "s", "n"])
    out = build_scd2(df, "k", "ts", ["s", "n"]).collect()
    assert len(out) == 2
    with pytest.raises(ValueError):
        build_scd2(df, "k", "ts", [])


def test_scd2_asof_lookup(spark):
    df = spark.createDataFrame(CHANGELOG, ["k", "ts", "tier"])
    scd = build_scd2(df, "k", "ts", ["tier"])
    probes = spark.createDataFrame(
        [
            ("a", ts("2024-01-02T12:00:00")),   # inside bronze
            ("a", ts("2024-01-03T00:00:00")),   # boundary → silver
            ("a", ts("2025-01-01T00:00:00")),   # current → gold
            ("a", ts("2023-12-01T00:00:00")),   # before history → NULL
            ("c", ts("2024-01-01T00:00:00")),   # unknown key → NULL
        ],
        ["k", "ts"],
    )
    out = {
        (r["k"], r["ts"]): r["tier"]
        for r in scd2_asof(scd, probes, "k", "ts").collect()
    }
    assert out[("a", ts("2024-01-02T12:00:00"))] == "bronze"
    assert out[("a", ts("2024-01-03T00:00:00"))] == "silver"
    assert out[("a", ts("2025-01-01T00:00:00"))] == "gold"
    assert out[("a", ts("2023-12-01T00:00:00"))] is None
    assert out[("c", ts("2024-01-01T00:00:00"))] is None
    # probe cardinality preserved (intervals partition time)
    assert scd2_asof(scd, probes, "k", "ts").count() == 5


def test_build_scd2_single_exchange(spark):
    """Both window passes share the same partitioning → exactly one
    hashpartitioning Exchange in the physical plan."""
    df = spark.createDataFrame(CHANGELOG, ["k", "ts", "tier"])
    plan = (
        build_scd2(df, "k", "ts", ["tier"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------------------
# linkage
# ---------------------------------------------------------------------------
def test_similarity_kinds(spark):
    df = spark.createDataFrame(
        [("kitten", "sitting", 10.0, 12.0, "x", "x")],
        ["a", "b", "n1", "n2", "e1", "e2"],
    )
    row = df.select(
        similarity("levenshtein", F.col("a"), F.col("b")).alias("lev"),
        similarity("exact", F.col("e1"), F.col("e2")).alias("ex"),
        similarity("exact", F.col("a"), F.col("b")).alias("ne"),
        similarity("relative", F.col("n1"), F.col("n2")).alias("rel"),
    ).collect()[0]
    assert abs(row["lev"] - (1 - 3 / 7)) < 1e-9
    assert row["ex"] == 1.0 and row["ne"] == 0.0
    assert abs(row["rel"] - (1 - 2 / 12)) < 1e-9
    with pytest.raises(ValueError):
        similarity("soundex", F.col("a"), F.col("b"))


def test_similarity_null_handling(spark):
    df = spark.createDataFrame([(None, "x")], "a string, b string")
    row = df.select(
        similarity("levenshtein", F.col("a"), F.col("b")).alias("lev"),
        similarity("exact", F.col("a"), F.col("a")).alias("nulls_eq"),
    ).collect()[0]
    assert row["lev"] == 0.0
    assert row["nulls_eq"] == 1.0  # NULL-safe equality


def test_link_records_best_match(spark):
    left = spark.createDataFrame(
        [(1, "blk", "johnathan smith"), (2, "blk", "zzz")],
        ["left_id", "lb", "lname"],
    )
    right = spark.createDataFrame(
        [
            (10, "blk", "jonathan smith"),
            (11, "blk", "johnathan smith"),
            (12, "other", "johnathan smith"),  # blocked out
        ],
        ["right_id", "rb", "rname"],
    )
    out = link_records(
        left, right,
        block_on=[("lb", "rb")],
        fields=[("lname", "rname", 1.0, "levenshtein")],
        threshold=0.8,
    ).collect()
    assert len(out) == 1  # "zzz" matches nothing above threshold
    r = out[0]
    assert r["left_id"] == 1 and r["right_id"] == 11  # exact beats fuzzy
    assert r["score"] == 1.0


def test_link_records_validation(spark):
    df = spark.createDataFrame([(1, "x")], ["left_id", "c"])
    with pytest.raises(ValueError):
        link_records(df, df, block_on=[], fields=[("c", "c", 1.0, "exact")])
    with pytest.raises(ValueError):
        link_records(df, df, block_on=[("c", "c")], fields=[])


def test_link_records_no_all_pairs_plan(spark):
    """Blocking is an equi-join: the plan must contain a hash join on
    the block key and no cartesian/nested-loop join."""
    left = spark.createDataFrame([(1, "b", "n")], ["left_id", "lb", "ln"])
    right = spark.createDataFrame([(2, "b", "n")], ["right_id", "rb", "rn"])
    plan = (
        link_records(
            left, right, block_on=[("lb", "rb")],
            fields=[("ln", "rn", 1.0, "levenshtein")], threshold=0.5,
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_build_scd2_null_attr_transitions(spark):
    """x -> NULL -> x are three episodes: plain struct != would
    return NULL on the comparisons and silently drop the NULL
    episode; the builder must compare null-safely."""
    rows = [
        ("a", ts("2024-01-01T00:00:00"), "x"),
        ("a", ts("2024-01-02T00:00:00"), None),
        ("a", ts("2024-01-03T00:00:00"), None),   # no-op within NULL
        ("a", ts("2024-01-04T00:00:00"), "x"),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, tier string")
    out = sorted(
        build_scd2(df, "k", "ts", ["tier"], tie_col="ts").collect(),
        key=lambda r: r["episode"],
    )
    assert [(r["tier"], r["episode"]) for r in out] == [
        ("x", 1), (None, 2), ("x", 3)
    ]
    assert out[1]["valid_from"] == ts("2024-01-02T00:00:00")
    assert out[1]["valid_to"] == ts("2024-01-04T00:00:00")


def test_scd2_asof_enriches_streams(spark, tmp_path):
    """scd2_asof is a stateless stream-static join, so a live event
    stream can be enriched with point-in-time dimension state —
    availableNow replay equals batch."""
    import os
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    scd = build_scd2(
        spark.createDataFrame(CHANGELOG, ["k", "ts", "tier"]),
        "k", "ts", ["tier"],
    )
    probes = [
        ("a", ts("2024-01-02T12:00:00")),
        ("a", ts("2024-01-04T00:00:00")),
        ("b", ts("2024-01-03T00:00:00")),
    ]
    d = os.path.join(tmp_path, "probes")
    os.makedirs(d)
    pq.write_table(
        pa.table({
            "k": pa.array([p[0] for p in probes]),
            "ts": pa.array([p[1] for p in probes], pa.timestamp("us")),
        }),
        os.path.join(d, "p.parquet"),
    )
    batch = spark.read.parquet(d)
    stream = spark.readStream.schema(batch.schema).parquet(d)
    sink = f"scd_{uuid.uuid4().hex[:8]}"
    q = (
        scd2_asof(scd, stream, "k", "ts")
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    streamed = {(r["k"], r["ts"], r["tier"])
                for r in spark.table(sink).collect()}
    batched = {(r["k"], r["ts"], r["tier"])
               for r in scd2_asof(scd, batch, "k", "ts").collect()}
    assert streamed == batched
    assert ("a", ts("2024-01-02T12:00:00"), "bronze") in streamed
    assert ("a", ts("2024-01-04T00:00:00"), "silver") in streamed
