"""Distributed k-means: deterministic init/assign/update and the
no-join assignment plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from aden_hive_fork_spark.operators.kmeans import assign_clusters, kmeans


def test_assign_argmin_and_tiebreak(spark):
    df = spark.createDataFrame([(0.0,), (4.0,), (5.0,)], "x double")
    # centroids at 0 and 10: 5.0 is equidistant -> lower cid wins
    out = {r["x"]: r["cid"] for r in
           assign_clusters(df, ["x"], [[0.0], [10.0]]).collect()}
    assert out == {0.0: 0, 4.0: 0, 5.0: 0}
    out2 = {r["x"]: r["cid"] for r in
            assign_clusters(df, ["x"], [[0.0], [8.0]]).collect()}
    assert out2[5.0] == 1


def test_assignment_plan_has_no_join_or_exchange(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    plan = (
        assign_clusters(df, ["x"], [[0.0], [50.0], [99.0]])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "join" not in plan.lower()
    assert "exchange" not in plan.lower()


def test_kmeans_converges_on_separated_blobs(spark):
    rows = [(i, float(i % 10)) for i in range(50)]            # blob at 0-9
    rows += [(100 + i, 1000.0 + float(i % 10)) for i in range(50)]
    df = spark.createDataFrame(rows, "pid bigint, x double")
    assigned, cents = kmeans(df, ["x"], "pid", k=2, n_iter=3)
    got = assigned.groupBy("cid").agg(
        F.min("x").alias("lo"), F.max("x").alias("hi"),
        F.count(F.lit(1)).alias("n")
    ).collect()
    by_cid = {r["cid"]: r for r in got}
    assert len(by_cid) == 2
    for r in by_cid.values():
        assert r["n"] == 50
        assert r["hi"] - r["lo"] <= 9.0  # each cluster is one blob
    assert sorted(round(c[0], 1) for c in cents) == [4.5, 1004.5]


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # k=3 over two identical points: at most 2 non-empty clusters;
    # the emptied one must keep its previous (seed) coordinates
    df = spark.createDataFrame(
        [(1, 0.0), (2, 100.0)], "pid bigint, x double"
    )
    _, cents = kmeans(df, ["x"], "pid", k=2, n_iter=2)
    assert sorted(c[0] for c in cents) == [0.0, 100.0]
    _, cents3 = kmeans(
        spark.createDataFrame([(1, 0.0), (2, 0.0), (3, 90.0)],
                              "pid bigint, x double"),
        ["x"], "pid", k=3, n_iter=2,
    )
    assert len(cents3) == 3  # no cluster lost even if emptied


def test_kmeans_deterministic_across_partitionings(spark):
    rows = [(i, float((i * 37) % 500)) for i in range(300)]
    a = spark.createDataFrame(rows, "pid bigint, x double").repartition(2)
    b = spark.createDataFrame(rows, "pid bigint, x double").repartition(17)
    _, ca = kmeans(a, ["x"], "pid", k=4, n_iter=3)
    _, cb = kmeans(b, ["x"], "pid", k=4, n_iter=3)
    assert ca == cb


def test_kmeans_keyed_matches_per_key_fits(spark):
    """kmeans_keyed == per-key kmeans with salt = prefix + str(key),
    byte-equal codebooks (the consumer contract for PQ training)."""
    from aden_hive_fork_spark.operators.kmeans import kmeans_keyed

    rows = []
    for j in range(3):
        for i in range(60):
            rows.append((j, i, float((i * 31 + j * 7) % 97),
                         float((i * 13 + j * 5) % 89)))
    df = spark.createDataFrame(rows, "j int, pid bigint, x double, y double")
    keyed = kmeans_keyed(df, "j", ["x", "y"], "pid", k=4, n_iter=2,
                         salt_prefix="s|")
    for j in range(3):
        _, cents = kmeans(df.filter(F.col("j") == j), ["x", "y"], "pid",
                          k=4, n_iter=2, salt="s|" + str(j))
        assert keyed[j] == cents


def test_kmeans_keyed_seed_phase_invariant_to_tiny_arrow_batches(spark):
    """The incremental per-key top-k fold in the seed phase must be
    bit-identical whatever the Arrow batch size (top-k under the
    total order (_h, _id) is associative), so forcing 3-row batches
    cannot move any codebook."""
    from aden_hive_fork_spark.operators.kmeans import kmeans_keyed

    rows = []
    for j in range(2):
        for i in range(80):
            rows.append((j, i, float((i * 17 + j * 3) % 101)))
    df = spark.createDataFrame(rows, "j int, pid bigint, x double")
    base = kmeans_keyed(df, "j", ["x"], "pid", k=5, n_iter=1,
                        salt_prefix="tiny|")
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "3")
        tiny = kmeans_keyed(df, "j", ["x"], "pid", k=5, n_iter=1,
                            salt_prefix="tiny|")
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert tiny == base


def test_kmeans_assign_kernel_matches_hof(spark):
    """r13: the Arrow Lloyd-assignment kernel must replay the
    interpreted HOF fold bit-for-bit — same dim-sequential binary64
    accumulation, same (distance asc, cid asc) tie-break. Random
    doubles (including duplicated centroids to force exact ties)."""
    import random

    from aden_hive_fork_spark.operators.kmeans import (
        _assign_cids_hof,
        _assign_cids_kernel,
    )

    rng = random.Random(41)
    cents = {
        0: [[rng.uniform(-5, 5) for _ in range(6)] for _ in range(4)],
        1: [[rng.uniform(-5, 5) for _ in range(6)] for _ in range(4)],
    }
    # exact tie: centroid 2 duplicates centroid 0 in key 1 — the
    # tie-break must pick cid 0
    cents[1][2] = list(cents[1][0])
    rows = [
        (i % 2, [rng.uniform(-6, 6) for _ in range(6)])
        for i in range(300)
    ] + [(1, list(cents[1][0]))]  # lands exactly on the dup pair
    df = spark.createDataFrame(rows, "j int, v array<double>")
    kern = {
        (r["j"], tuple(r["v"])): r["cid"]
        for r in _assign_cids_kernel(df, "j", "v", cents).collect()
    }
    hof = {
        (r["j"], tuple(r["v"])): r["cid"]
        for r in _assign_cids_hof(df, "j", "v", cents).collect()
    }
    assert kern and kern == hof
    assert kern[(1, tuple(cents[1][0]))] == 0  # tie -> lowest cid
