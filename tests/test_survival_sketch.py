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


# ---------------------------------------------------------------------------
# streaming KMV maintenance
# ---------------------------------------------------------------------------
SCHEMA = "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"


def _write_jsonl(path, name, rows):
    import json
    import os

    os.makedirs(path, exist_ok=True)
    with open(f"{path}/{name}", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _ev(i, t):
    return {"event_id": i, "ts": "2024-01-01T00:00:00", "user_id": i,
            "event_type": t, "value": 1.0}


def _df(spark, rows):
    import datetime as dt

    typed = [dict(r, ts=dt.datetime.fromisoformat(r["ts"])) for r in rows]
    return spark.createDataFrame(typed, SCHEMA)


def test_streamed_kmv_equals_batch_sketch(spark, tmp_path):
    from aden_hive_fork_spark.operators.sketch import kmv_sketch
    from aden_hive_fork_spark.streaming.sketch_stream import (
        maintain_kmv, read_kmv,
    )

    in_dir, sk_dir, ckpt = (str(tmp_path / d) for d in ("in", "sk", "ck"))
    b1 = [_ev(i, "click") for i in range(0, 300)]
    b2 = [_ev(i, "click") for i in range(200, 500)] + [
        _ev(i, "view") for i in range(50)
    ]
    _write_jsonl(in_dir, "b1.json", b1)
    q = maintain_kmv(
        spark.readStream.schema(SCHEMA).json(in_dir), sk_dir, ckpt,
        "user_id", ["event_type"], k=32,
    )
    q.awaitTermination(120)
    _write_jsonl(in_dir, "b2.json", b2)
    q = maintain_kmv(
        spark.readStream.schema(SCHEMA).json(in_dir), sk_dir, ckpt,
        "user_id", ["event_type"], k=32,
    )
    q.awaitTermination(120)

    streamed = {r["event_type"]: r["hashes"]
                for r in read_kmv(spark, sk_dir).collect()}
    all_rows = _df(spark, b1 + b2)
    direct = {r["event_type"]: r["hashes"]
              for r in kmv_sketch(all_rows, "user_id",
                                  ["event_type"], k=32).collect()}
    assert streamed == direct


def test_kmv_batch_replay_is_noop(spark, tmp_path):
    from aden_hive_fork_spark.operators.layout import read_pointer
    from aden_hive_fork_spark.streaming.sketch_stream import (
        merge_sketch_batch, read_kmv,
    )

    sk_dir = str(tmp_path / "sk")
    import os

    os.makedirs(sk_dir, exist_ok=True)
    b = _df(spark, [_ev(i, "click") for i in range(100)])
    merge_sketch_batch(b, 0, sk_dir, "user_id", ["event_type"], 16)
    v0 = read_pointer(sk_dir)["version"]
    h0 = read_kmv(spark, sk_dir).collect()[0]["hashes"]
    # replaying the SAME batch id must not double-merge or republish
    merge_sketch_batch(b, 0, sk_dir, "user_id", ["event_type"], 16)
    assert read_pointer(sk_dir)["version"] == v0
    assert read_kmv(spark, sk_dir).collect()[0]["hashes"] == h0


def test_kmv_set_estimates_overlap(spark):
    from aden_hive_fork_spark.operators.sketch import (
        kmv_set_estimates, kmv_sketch,
    )

    a = spark.createDataFrame([(i,) for i in range(0, 2000)], "v long")
    b = spark.createDataFrame([(i,) for i in range(1000, 3000)], "v long")
    r = kmv_set_estimates(
        kmv_sketch(a, "v", k=128), kmv_sketch(b, "v", k=128), 128
    ).collect()[0]
    # truth: union 3000, intersection 1000, jaccard 1/3. k=128 gives
    # ~9% relative stddev and md5 is a FIXED draw (this one lands
    # ~3.5 sigma high on the union) — assert the ~30% envelope, which
    # still rules out off-by-category bugs (exact-branch, double
    # counting, wrong rho denominator).
    assert abs(r["union_est"] - 3000) < 1000
    assert abs(r["intersect_est"] - 1000) < 400
    assert abs(r["jaccard"] - 1 / 3) < 0.12


# ---------------------------------------------------------------------------
# streaming correlation-stats maintenance
# ---------------------------------------------------------------------------
def _cv(i, t, v):
    return {"event_id": i, "ts": "2024-01-01T00:00:00", "user_id": i % 7,
            "event_type": t, "value": v}


def test_streamed_corr_stats_equal_batch_bitwise(spark, tmp_path):
    from aden_hive_fork_spark.operators.stats import (
        corr_from_stats, exact_corr, suffstats,
    )
    from aden_hive_fork_spark.streaming.stats_stream import (
        maintain_corr_stats, read_corr_stats,
    )

    in_dir, st_dir, ckpt = (str(tmp_path / d) for d in ("in", "st", "ck"))
    b1 = [_cv(i, "click", float(i % 13) + 0.25) for i in range(300)]
    b2 = [_cv(i, "click", float(i % 11) - 0.5) for i in range(300, 600)]
    b2 += [_cv(i, "view", float(i % 5)) for i in range(80)]
    _write_jsonl(in_dir, "b1.json", b1)
    q = maintain_corr_stats(
        spark.readStream.schema(SCHEMA).json(in_dir), st_dir, ckpt,
        "event_id", "value", ["event_type"],
    )
    q.awaitTermination(120)
    _write_jsonl(in_dir, "b2.json", b2)
    q = maintain_corr_stats(
        spark.readStream.schema(SCHEMA).json(in_dir), st_dir, ckpt,
        "event_id", "value", ["event_type"],
    )
    q.awaitTermination(120)

    streamed = read_corr_stats(spark, st_dir)
    all_df = _df(spark, b1 + b2)
    direct = suffstats(all_df, "event_id", "value", ["event_type"])
    srows = {r["event_type"]: r.asDict() for r in streamed.collect()}
    drows = {r["event_type"]: r.asDict() for r in direct.collect()}
    assert srows == drows  # bit-identical sufficient statistics
    # and the derived correlation equals the one-pass operator
    sc = {r["event_type"]: r["corr"]
          for r in corr_from_stats(streamed, ["event_type"]).collect()}
    dc = {r["event_type"]: r["corr"]
          for r in exact_corr(all_df, "event_id", "value",
                              ["event_type"]).collect()}
    assert sc == dc


def test_corr_stats_batch_replay_is_noop(spark, tmp_path):
    from aden_hive_fork_spark.operators.layout import read_pointer
    from aden_hive_fork_spark.streaming.stats_stream import (
        merge_stats_batch, read_corr_stats,
    )

    st_dir = str(tmp_path / "st")
    import os as _os

    _os.makedirs(st_dir, exist_ok=True)
    b = _df(spark, [_cv(i, "click", float(i)) for i in range(100)])
    merge_stats_batch(b, 0, st_dir, "event_id", "value", ["event_type"])
    v0 = read_pointer(st_dir)["version"]
    s0 = read_corr_stats(spark, st_dir).collect()
    merge_stats_batch(b, 0, st_dir, "event_id", "value", ["event_type"])
    assert read_pointer(st_dir)["version"] == v0
    assert read_corr_stats(spark, st_dir).collect() == s0
