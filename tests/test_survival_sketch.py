"""Kaplan-Meier, KMV sketch, label propagation — unit semantics
(suite q177-q179 covers the cross-engine hash contract)."""

from __future__ import annotations


def test_km_textbook_curve(spark):
    from aden_hive_fork_spark.operators.survival import kaplan_meier

    # classic example: events at t=1 (n=5), t=3 (n=3, after a censor
    # at t=2): S(1)=4/5=0.8, S(3)=0.8*(2/3)
    rows = [(1, 1), (2, 0), (3, 1), (4, 0), (5, 0)]
    df = spark.createDataFrame(rows, "t int, ev int")
    got = {r["t"]: r for r in kaplan_meier(df, "t", "ev").collect()}
    assert set(got) == {1, 3}
    assert got[1]["n_risk"] == 5 and got[1]["n_events"] == 1
    assert got[1]["survival"] == 0.8
    assert got[3]["n_risk"] == 3
    assert abs(got[3]["survival"] - 0.8 * (2 / 3)) < 1e-6


def test_km_censored_only_times_absent_but_reduce_risk(spark):
    from aden_hive_fork_spark.operators.survival import kaplan_meier

    # censor at t=1 must not appear in output but must shrink n_risk
    # for the t=2 event: S(2) = 1 - 1/1 = 0 with n_risk 1
    df = spark.createDataFrame([(1, 0), (2, 1)], "t int, ev int")
    got = kaplan_meier(df, "t", "ev").collect()
    assert [(r["t"], r["n_risk"], r["survival"])
            for r in got] == [(2, 1, 0.0)]


def test_km_groups_independent(spark):
    from aden_hive_fork_spark.operators.survival import kaplan_meier

    rows = [("a", 1, 1), ("a", 2, 1), ("b", 1, 1)]
    df = spark.createDataFrame(rows, "g string, t int, ev int")
    got = kaplan_meier(df, "t", "ev", ["g"]).collect()
    by = {(r["g"], r["t"]): r["survival"] for r in got}
    assert by[("a", 1)] == 0.5 and by[("a", 2)] == 0.0
    assert by[("b", 1)] == 0.0


def test_kmv_exact_branch_and_estimate_accuracy(spark):
    from aden_hive_fork_spark.operators.sketch import kmv_estimate, kmv_sketch

    # group "small" has 10 distinct < k → exact; "big" has 5000 → ±20%
    rows = [("small", i) for i in range(10)] + [
        ("big", i) for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    est = {
        r["g"]: r
        for r in kmv_estimate(
            kmv_sketch(df, "v", ["g"], k=64), 64, ["g"]
        ).collect()
    }
    assert est["small"]["est_distinct"] == 10
    assert est["small"]["n_kept"] == 10
    assert abs(est["big"]["est_distinct"] - 5000) < 1000


def test_kmv_merge_equals_sketch_of_union(spark):
    from aden_hive_fork_spark.operators.sketch import kmv_sketch, merge_kmv

    a = spark.createDataFrame([("g", i) for i in range(0, 600)],
                              "g string, v long")
    b = spark.createDataFrame([("g", i) for i in range(300, 900)],
                              "g string, v long")
    sk_a = kmv_sketch(a, "v", ["g"], k=32)
    sk_b = kmv_sketch(b, "v", ["g"], k=32)
    merged = merge_kmv(sk_a.unionByName(sk_b), 32, ["g"]).collect()[0]
    direct = kmv_sketch(a.unionByName(b), "v", ["g"], k=32).collect()[0]
    assert merged["hashes"] == direct["hashes"]
    assert merged["n_kept"] == direct["n_kept"]


def test_label_propagation_two_cliques(spark):
    from aden_hive_fork_spark.operators.graph_rank import label_propagation

    # two triangles joined by nothing: each converges to its min id
    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    df = spark.createDataFrame(tri1 + tri2, "src long, dst long")
    got = {r["id"]: r["label"] for r in
           label_propagation(df, iterations=4).collect()}
    assert {got[1], got[2], got[3]} == {1}
    assert {got[10], got[11], got[12]} == {10}


def test_label_propagation_tie_breaks_to_smallest(spark):
    from aden_hive_fork_spark.operators.graph_rank import label_propagation

    # node 3 sees labels {1, 2} once each after round 1 → picks 1
    df = spark.createDataFrame([(1, 3), (2, 3)], "src long, dst long")
    got = {r["id"]: r["label"] for r in
           label_propagation(df, iterations=1).collect()}
    assert got[3] == 1
