"""Naive Bayes classifier tests: hand-computed odds on a tiny corpus,
unseen-token fallback, holdout scoring direction, decimal exactness
under repartitioning."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aden_hive_fork_spark.operators.classifier import nb_score, nb_train

CORPUS = [
    (1, "spam spam buy", True),    # "good" class here = spam
    (2, "buy now", True),
    (3, "hello world", False),
    (4, "hello friend now", False),
]


def train(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text", "label"])
    return df, *nb_train(df, "label")


def test_nb_train_hand_computed(spark):
    _, odds, consts = train(spark)
    o = {r["token"]: r for r in odds.collect()}
    # corpus: good tokens = 5 (spam x2, buy x2, now), bad tokens = 5;
    # vocab = 6 (spam buy now hello world friend)
    Ng = Nb = 5
    V = 6
    assert set(o) == {"spam", "buy", "now", "hello", "world", "friend"}
    assert o["spam"]["n_good"] == 2 and o["spam"]["n_bad"] == 0

    def expected(cg, cb):
        return round(
            math.log((cg + 1) / (Ng + V)) - math.log((cb + 1) / (Nb + V)), 6
        )

    assert float(o["spam"]["odds"]) == expected(2, 0)
    assert float(o["hello"]["odds"]) == expected(0, 2)
    assert float(o["now"]["odds"]) == expected(1, 1) == 0.0
    c = consts.collect()[0]
    assert float(c["prior"]) == 0.0  # balanced classes
    assert float(c["unseen_odds"]) == expected(0, 0) == 0.0


def test_nb_score_direction_and_unseen(spark):
    df, odds, consts = train(spark)
    probes = spark.createDataFrame(
        [(10, "spam buy spam"), (11, "hello world friend"),
         (12, "zebra qux")],  # all tokens unseen
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: float(r["nb_score"])
           for r in nb_score(probes, odds, consts).collect()}
    assert out[10] > 0      # spammy text scores positive
    assert out[11] < 0      # hammy text scores negative
    assert out[12] == 0.0   # unseen-only = prior + n*unseen_odds = 0


def test_nb_score_exact_under_repartition(spark):
    """DECIMAL odds make the per-doc sum exact: scores must be
    bit-identical whatever the partitioning."""
    df, odds, consts = train(spark)
    a = {r["doc_id"]: r["nb_score"]
         for r in nb_score(df, odds, consts).collect()}
    b = {r["doc_id"]: r["nb_score"]
         for r in nb_score(df.repartition(7), odds.repartition(5),
                           consts).collect()}
    assert a == b


def test_nb_model_is_a_table(spark):
    """The model round-trips through parquet — it is data, not a
    Python object (persist once, score forever)."""
    import tempfile

    df, odds, consts = train(spark)
    with tempfile.TemporaryDirectory() as d:
        odds.write.mode("overwrite").parquet(f"{d}/odds")
        consts.write.mode("overwrite").parquet(f"{d}/consts")
        odds2 = spark.read.parquet(f"{d}/odds")
        consts2 = spark.read.parquet(f"{d}/consts")
        a = sorted(
            (r["doc_id"], r["nb_score"])
            for r in nb_score(df, odds, consts).collect()
        )
        b = sorted(
            (r["doc_id"], r["nb_score"])
            for r in nb_score(df, odds2, consts2).collect()
        )
        assert a == b
