"""Sampling/curation operators — the load-bearing properties are
DETERMINISM (same sample under any partitioning; cross-table key
consistency) and plan shape (hash split is map-side, contamination
broadcasts the benchmark)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aden_hive_fork_spark.operators.sampling import (
    class_weights,
    contamination_pairs,
    hash_sample,
    quota_sample,
    train_test_split,
)


def test_hash_sample_stable_under_repartition(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = {r.k for r in hash_sample(df, "k", 30).collect()}
    b = {r.k for r in hash_sample(df.repartition(17), "k", 30).collect()}
    assert a == b and 0.2 < len(a) / 2000 < 0.4


def test_hash_sample_consistent_across_tables(spark):
    """Sampling orders and their lineitems by the shared key keeps
    referential integrity — the reason membership is per-key hash."""
    orders = spark.range(0, 500).select(F.col("id").alias("okey"))
    items = spark.range(0, 2000).select((F.col("id") % 500).alias("okey"))
    kept_orders = {r.okey for r in hash_sample(orders, "okey", 25).collect()}
    kept_items = {r.okey for r in hash_sample(items, "okey", 25).collect()}
    assert kept_items == kept_orders


def test_salt_decorrelates(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    a = {r.k for r in hash_sample(df, "k", 50, salt="a").collect()}
    b = {r.k for r in hash_sample(df, "k", 50, salt="b").collect()}
    assert a != b
    inter = len(a & b) / max(1, len(a))
    assert 0.3 < inter < 0.7  # independent ~50% samples overlap ~50%


def test_split_partitions_everything(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    out = train_test_split(df, "k", test_percent=20)
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts["test"] + counts["train"] == 1000
    assert 100 < counts["test"] < 300  # ~20%


def test_hash_split_is_map_side(spark):
    """No Exchange before the filter: the sample is a pure projection."""
    df = spark.range(0, 100).withColumnRenamed("id", "k")
    plan = hash_sample(df, "k", 10)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_quota_sample_deterministic_ties(spark):
    rows = [(i, "s" + str(i % 3), 100) for i in range(30)]  # all-equal order key
    df = spark.createDataFrame(rows, "doc_id long, source string, n long")
    out1 = quota_sample(df, ["source"], 2, [F.desc("n"), F.asc("doc_id")])
    out2 = quota_sample(df.repartition(7), ["source"], 2, [F.desc("n"), F.asc("doc_id")])
    assert sorted((r.doc_id, r.rk) for r in out1.collect()) == sorted(
        (r.doc_id, r.rk) for r in out2.collect()
    )


def test_class_weights_mean_one(spark):
    df = spark.createDataFrame(
        [("a",)] * 60 + [("b",)] * 30 + [("c",)] * 10, "lang string"
    )
    rows = {r.lang: r for r in class_weights(df, "lang").collect()}
    w = {k: r.weight for k, r in rows.items()}
    assert w["c"] > w["b"] > w["a"]
    # balanced-training invariant: the MEAN PER-ROW weight is 1.0
    # (sum over classes of n_c * w_c == N)
    total = sum(r.n_rows * r.weight for r in rows.values())
    assert abs(total / 100 - 1.0) < 1e-6


def test_contamination_broadcasts_benchmark(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "zeta eta theta iota kappa"),
            (10, "alpha beta gamma delta other words"),  # contaminated vs 1
            (11, "completely unrelated text content here"),
        ],
        "doc_id long, text string",
    )
    pairs = contamination_pairs(
        docs.filter(F.col("doc_id") >= 10), docs.filter(F.col("doc_id") < 10)
    )
    got = [(r.id, r.bench_id, r.n_overlap) for r in pairs.collect()]
    assert got == [(10, 1, 2)]
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_pack_sequences_chunks_and_offsets(spark):
    from aden_hive_fork_spark.operators.sampling import pack_sequences

    rows = [(1, "s", 300), (2, "s", 300), (3, "s", 100), (4, "t", 600)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n long")
    out = {
        r.doc_id: (r.chunk_id, r.chunk_offset)
        for r in pack_sequences(df, "n", 512, ["source"], [F.asc("doc_id")]).collect()
    }
    # s: starts 0, 300, 600 -> chunks 0, 0, 1; t restarts at 0
    assert out == {1: (0, 0), 2: (0, 300), 3: (1, 88), 4: (0, 0)}


def test_pack_sequences_stable_under_repartition(spark):
    from aden_hive_fork_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(i, "s" + str(i % 3), 10 + i) for i in range(60)],
        "doc_id long, source string, n long",
    )
    a = sorted(
        (r.doc_id, r.chunk_id, r.chunk_offset)
        for r in pack_sequences(df, "n", 64, ["source"], [F.asc("doc_id")]).collect()
    )
    b = sorted(
        (r.doc_id, r.chunk_id, r.chunk_offset)
        for r in pack_sequences(
            df.repartition(11), "n", 64, ["source"], [F.asc("doc_id")]
        ).collect()
    )
    assert a == b


def test_pack_sequences_tied_order_keys(spark):
    """Tied order keys must still get disjoint running totals (ROWS
    frame, not RANGE) — review finding r3."""
    from aden_hive_fork_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(1, "s", 10, 5), (2, "s", 10, 5)], "doc_id long, source string, ord long, n long"
    )
    out = sorted(
        (r.chunk_id, r.chunk_offset)
        for r in pack_sequences(df, "n", 16, ["source"], [F.asc("ord")]).collect()
    )
    assert out == [(0, 0), (0, 5)]


def test_weighted_sample_tracks_weights(spark):
    """A-ES property: over many independent salts, heavy items are
    sampled proportionally more often."""
    from aden_hive_fork_spark.operators.sampling import weighted_sample

    rows = [(i, 10.0 if i < 10 else 1.0) for i in range(110)]
    df = spark.createDataFrame(rows, ["k", "w"]).cache()
    heavy_hits = light_hits = 0
    for s in range(30):
        got = {r["k"] for r in
               weighted_sample(df, "k", "w", 20, salt=f"s{s}").collect()}
        assert len(got) == 20
        heavy_hits += sum(1 for k in got if k < 10)
        light_hits += sum(1 for k in got if k >= 10)
    # 10 heavy (w=10) vs 100 light (w=1): heavy inclusion rate must be
    # several times the light rate (exact rates are scheme-dependent)
    heavy_rate = heavy_hits / (30 * 10)
    light_rate = light_hits / (30 * 100)
    assert heavy_rate > 3 * light_rate
    df.unpersist()


def test_weighted_sample_deterministic_and_repartition_stable(spark):
    from aden_hive_fork_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, float(i % 7 + 1)) for i in range(200)], ["k", "w"]
    )
    a = sorted(r["k"] for r in weighted_sample(df, "k", "w", 25).collect())
    b = sorted(
        r["k"] for r in
        weighted_sample(df.repartition(13), "k", "w", 25).collect()
    )
    assert a == b
    # zero/negative/null weights excluded
    df2 = spark.createDataFrame(
        [(1, 0.0), (2, -1.0), (3, None), (4, 2.0)],
        "k bigint, w double",
    )
    assert [r["k"] for r in weighted_sample(df2, "k", "w", 10).collect()] == [4]


def test_weighted_sample_per_group_quota(spark):
    from aden_hive_fork_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    rows = [(f"g{i % 3}", i, 1.0 + i % 5) for i in range(90)]
    df = spark.createDataFrame(rows, ["g", "k", "w"])
    out = weighted_sample_per_group(df, "g", "k", "w", 4).collect()
    per = {}
    for r in out:
        per.setdefault(r["g"], []).append(r["k"])
    assert all(len(v) == 4 for v in per.values())
    assert set(per) == {"g0", "g1", "g2"}


def test_temperature_weights_alpha_laws(spark):
    from aden_hive_fork_spark.operators.sampling import temperature_weights

    rows = [("big", i) for i in range(90)] + [("small", i) for i in range(10)]
    df = spark.createDataFrame(rows, ["cls", "k"])

    # alpha=1: natural mixture — every weight exactly 1
    w1 = temperature_weights(df, "cls", 1.0).select("weight").distinct()
    assert [float(r["weight"]) for r in w1.collect()] == [1.0]

    # alpha=0: uniform over classes — per-CLASS total mass equalizes
    w0 = temperature_weights(df, "cls", 0.0)
    mass = {
        r["cls"]: float(r["m"])
        for r in w0.groupBy("cls").agg(F.sum("weight").alias("m")).collect()
    }
    assert abs(mass["big"] - mass["small"]) < 1e-3
    # mean per-row weight is 1 → total mass == row count
    assert abs(sum(mass.values()) - 100) < 1e-3

    # alpha=0.5: w_c = p_c^-0.5 / Z with p=(0.9, 0.1) →
    # Z = 0.9*0.9^-0.5 + 0.1*0.1^-0.5 ≈ 1.2649 →
    # w_small ≈ 3.1623/1.2649 = 2.5, w_big ≈ 1.0541/1.2649 = 0.8333
    w5 = temperature_weights(df, "cls", 0.5)
    per_row = {
        r["cls"]: float(r["weight"])
        for r in w5.select("cls", "weight").distinct().collect()
    }
    assert abs(per_row["small"] - 2.5) < 1e-3
    assert abs(per_row["big"] - 0.8333) < 1e-3


def test_token_budget_sample_prefix_membership(spark):
    from aden_hive_fork_spark.operators.sampling import token_budget_sample

    rows = [(f"d{i}", "s", 100) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id string, source string, cost int")
    kept = token_budget_sample(df, "cost", 450, ["source"], ["doc_id"])
    out = kept.collect()
    # minimal prefix covering 450 at 100/doc = 5 docs (500 total)
    assert len(out) == 5
    assert max(r["cum_cost"] for r in out) == 500
    # membership is repartition-stable
    kept2 = token_budget_sample(
        df.repartition(7), "cost", 450, ["source"], ["doc_id"]
    )
    assert sorted(r["doc_id"] for r in kept2.collect()) == sorted(
        r["doc_id"] for r in out
    )


def test_token_budget_giant_head_does_not_empty_group(spark):
    from aden_hive_fork_spark.operators.sampling import token_budget_sample

    df = spark.createDataFrame(
        [("a", "s", 10_000), ("b", "s", 50), ("c", "s", 50)],
        "doc_id string, source string, cost int",
    )
    kept = token_budget_sample(df, "cost", 100, ["source"], ["doc_id"])
    out = kept.collect()
    # whichever doc hashes first is kept (starts at 0 < budget);
    # the kept set is never empty and never exceeds budget + one doc
    assert 1 <= len(out) <= 3
    first = min(out, key=lambda r: r["cum_cost"])
    assert first["cum_cost"] - 0 >= 0  # starts within budget by contract


def test_token_budget_salt_changes_membership_not_size_law(spark):
    from aden_hive_fork_spark.operators.sampling import token_budget_sample

    rows = [(f"d{i}", "s", 100) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id string, source string, cost int")
    a = {r["doc_id"] for r in token_budget_sample(
        df, "cost", 1000, ["source"], ["doc_id"]).collect()}
    b = {r["doc_id"] for r in token_budget_sample(
        df, "cost", 1000, ["source"], ["doc_id"], salt="v2").collect()}
    assert len(a) == len(b) == 10  # equal-cost rows: exact count either way
    assert a != b  # independent draw


def test_repeated_passages_hand_counts(spark):
    from aden_hive_fork_spark.operators.dedup import repeated_passages

    df = spark.createDataFrame(
        [
            ("a", "the quick brown fox jumps"),
            ("b", "the quick brown fox sleeps"),
            ("c", "the quick brown fox jumps the quick brown fox jumps"),
            ("d", "unrelated words entirely here now"),
        ],
        "doc_id string, text string",
    )
    out = repeated_passages(df, n=4, min_docs=2, k=10).collect()
    by = {r["passage"]: r["n_docs"] for r in out}
    # 'the quick brown fox' in a, b, c — within-doc repeat in c counts once
    assert by["the quick brown fox"] == 3
    # 'quick brown fox jumps' in a and c
    assert by["quick brown fox jumps"] == 2
    assert "unrelated words entirely here" not in by


def test_repeated_passages_validation(spark):
    import pytest

    from aden_hive_fork_spark.operators.dedup import repeated_passages

    df = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    with pytest.raises(ValueError):
        repeated_passages(df, n=0)


def test_mixture_resample_proportions_and_determinism(spark):
    from aden_hive_fork_spark.operators.sampling import mixture_resample

    rows = [(f"a{i}", "web") for i in range(600)]
    rows += [(f"b{i}", "code") for i in range(300)]
    rows += [(f"c{i}", "books") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    # books is binding: T = min(600/.5, 300/.3, 100/.2) = 500
    kept = mixture_resample(
        df, "source", "doc_id", {"web": 0.5, "code": 0.3, "books": 0.2}
    )
    by = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # binding group keeps everything; others hash-binomial around p*T
    assert by["books"] == 100
    assert abs(by["web"] - 250) < 60 and abs(by["code"] - 150) < 45
    # repartition-stable membership
    kept2 = mixture_resample(
        df.repartition(13), "source", "doc_id",
        {"web": 0.5, "code": 0.3, "books": 0.2},
    )
    assert sorted(r["doc_id"] for r in kept2.collect()) == sorted(
        r["doc_id"] for r in kept.collect()
    )


def test_mixture_resample_drops_unlisted_groups_and_validates(spark):
    import pytest

    from aden_hive_fork_spark.operators.sampling import mixture_resample

    df = spark.createDataFrame(
        [("a", "web"), ("b", "junk")], "doc_id string, source string"
    )
    kept = mixture_resample(df, "source", "doc_id", {"web": 1.0})
    assert {r["source"] for r in kept.collect()} == {"web"}
    with pytest.raises(ValueError):
        mixture_resample(df, "source", "doc_id", {})
    with pytest.raises(ValueError):
        mixture_resample(df, "source", "doc_id", {"web": 0.5})  # sums to 0.5
    with pytest.raises(ValueError):
        mixture_resample(df, "source", "doc_id", {"web": 1.5, "junk": -0.5})


def test_contrastive_negatives_label_and_rank_contract(spark):
    from aden_hive_fork_spark.operators.sampling import contrastive_negatives

    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = contrastive_negatives(df, "doc_id", "lang", k=3, num_buckets=4)
    pdf = out.toPandas()
    labels = dict(rows)
    assert len(pdf) > 0
    for r in pdf.itertuples():
        # a negative never shares the anchor's label, never self-pairs
        assert labels[r.neg_key] != labels[r.anchor_key]
        assert r.neg_key != r.anchor_key
    # ranks are contiguous 1..n(anchor) with n <= k
    for _, g in pdf.groupby("anchor_key"):
        assert sorted(g["rank"]) == list(range(1, len(g) + 1))
        assert len(g) <= 3


def test_contrastive_negatives_deterministic_and_salted(spark):
    from aden_hive_fork_spark.operators.sampling import contrastive_negatives

    rows = [(i, str(i % 5)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    a = contrastive_negatives(df, "doc_id", "lang", 2, 8).collect()
    b = contrastive_negatives(
        df.repartition(13), "doc_id", "lang", 2, 8
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    c = contrastive_negatives(df, "doc_id", "lang", 2, 8, salt="x").collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_contrastive_negatives_anchor_filter_and_autosize(spark):
    import pytest

    from pyspark.sql import functions as F

    from aden_hive_fork_spark.operators.sampling import contrastive_negatives

    rows = [(i, "a" if i < 50 else "b") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = contrastive_negatives(
        df, "doc_id", "lang", k=2,
        anchor_filter=F.col("doc_id") < 10,
    )
    anchors = {r["anchor_key"] for r in out.collect()}
    assert anchors and all(a < 10 for a in anchors)
    with pytest.raises(ValueError):
        contrastive_negatives(df, "doc_id", "lang", k=0)


def test_decontaminate_split_drops_only_contaminated_train(spark):
    from aden_hive_fork_spark.operators.sampling import decontaminate_split

    split = spark.createDataFrame(
        [(1, "train"), (2, "train"), (3, "test"), (4, "test"), (5, "train")],
        "doc_id bigint, split string",
    )
    # 1~3 (train-test: drop 1), 2~5 (train-train: keep), 4~5 (test-
    # train: drop 5; symmetric direction), 3~4 (test-test: keep)
    pairs = spark.createDataFrame(
        [(1, 3, 2), (2, 5, 1), (4, 5, 3), (3, 4, 0)],
        "id_a bigint, id_b bigint, hamming int",
    )
    clean, report = decontaminate_split(
        split, pairs, id_col="doc_id", score_col="hamming"
    )
    rep = {r["doc_id"]: r for r in report.collect()}
    assert set(rep) == {1, 5}
    assert rep[1]["n_test_matches"] == 1 and rep[1]["min_hamming"] == 2
    assert rep[5]["min_hamming"] == 3
    kept = {(r["doc_id"], r["split"]) for r in clean.collect()}
    # test rows always survive; train 2 survives (only train-train pair)
    assert kept == {(2, "train"), (3, "test"), (4, "test")}


def test_decontaminate_split_no_pairs_is_identity(spark):
    from aden_hive_fork_spark.operators.sampling import decontaminate_split

    split = spark.createDataFrame(
        [(1, "train"), (2, "test")], "doc_id bigint, split string"
    )
    pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    clean, report = decontaminate_split(split, pairs, id_col="doc_id")
    assert report.count() == 0
    assert clean.count() == 2
