"""operators/langid — Cavnar–Trenkle character-n-gram rank-profile
language identification: held-out accuracy on a real-signal fixture,
determinism/tie-break edges, and physical-plan guards (broadcast
profile join, no cartesian on the data side)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

# Three mini-languages with genuinely distinct character statistics
# (the synthetic `documents` corpus has random labels, so the accuracy
# pin lives here on signal the algorithm can actually learn).
_EN = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "she sells sea shells by the sea shore every sunny morning",
    "a journey of a thousand miles begins with a single step forward",
    "the rain in spain stays mainly in the plain they always say",
    "to be or not to be that is the question for the ages",
    "all that glitters is not gold but it shines brightly enough",
]
_DE = [
    "der schnelle braune fuchs springt ueber den faulen hund am fluss",
    "sie verkauft muscheln am meeresufer an jedem sonnigen morgen",
    "eine reise von tausend meilen beginnt mit einem einzigen schritt",
    "der regen in spanien bleibt hauptsaechlich in der ebene sagen sie",
    "sein oder nicht sein das ist hier die entscheidende frage",
    "es ist nicht alles gold was glaenzt aber es funkelt genug",
]
_FR = [
    "le renard brun rapide saute par dessus le chien paresseux pres du fleuve",
    "elle vend des coquillages au bord de la mer chaque matin ensoleille",
    "un voyage de mille lieues commence par un seul petit pas en avant",
    "la pluie en espagne reste principalement dans la plaine disent ils",
    "etre ou ne pas etre voila la grande question des siecles",
    "tout ce qui brille n est pas or mais cela suffit bien",
]


@pytest.fixture()
def labeled(spark):
    rows = []
    i = 0
    for lang, texts in (("en", _EN), ("de", _DE), ("fr", _FR)):
        for t in texts:
            rows.append((i, t, lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def test_held_out_accuracy_pin(spark, labeled):
    """Train on 4 docs/language, classify the held-out 2/language:
    with genuinely distinct trigram statistics the classifier must be
    100% correct — the accuracy pin VERDICT r8 task 1 requires."""
    from aden_hive_fork_spark.operators.langid import (
        langid_classify,
        langid_profiles,
    )

    train = labeled.filter(F.col("doc_id") % 3 != 2)
    test = labeled.filter(F.col("doc_id") % 3 == 2)
    prof = langid_profiles(train, profile_size=200)
    pred = langid_classify(test, prof, profile_size=200)
    joined = pred.join(
        test.select("doc_id", F.col("lang").alias("true_lang")), "doc_id"
    )
    rows = joined.collect()
    assert len(rows) == 6
    for r in rows:
        assert r["pred_lang"] == r["true_lang"], (
            r["doc_id"], r["pred_lang"], r["true_lang"]
        )


def test_profile_ranks_deterministic_and_bounded(spark, labeled):
    from aden_hive_fork_spark.operators.langid import langid_profiles

    prof = langid_profiles(labeled, profile_size=20).collect()
    by_lang: dict[str, list] = {}
    for r in prof:
        by_lang.setdefault(r["lang"], []).append(r)
    assert set(by_lang) == {"en", "de", "fr"}
    for lang, rows in by_lang.items():
        assert len(rows) <= 20
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))  # dense 1..k
        # ties broken by gram ascending: equal counts must be in
        # ascending gram order along the rank
        rows.sort(key=lambda r: r["rank"])
        for a, b in zip(rows, rows[1:]):
            assert (a["gram_count"], b["gram"]) >= (
                b["gram_count"], a["gram"]
            ) or a["gram_count"] > b["gram_count"]


def test_empty_and_short_text_fallback(spark, labeled):
    """Zero-gram docs (empty or shorter than n) get the
    lexicographically first language at distance 0 with
    n_doc_grams = 0 — deterministic and filterable."""
    from aden_hive_fork_spark.operators.langid import (
        langid_classify,
        langid_profiles,
    )

    prof = langid_profiles(labeled, profile_size=50)
    test = spark.createDataFrame(
        [(100, ""), (101, "ab"), (102, "the sea shore morning")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in langid_classify(test, prof).collect()}
    assert out[100]["pred_lang"] == "de"  # min(lang)
    assert out[100]["n_doc_grams"] == 0
    assert out[100]["distance"] == 0
    assert out[101]["pred_lang"] == "de"
    assert out[101]["n_doc_grams"] == 0
    assert out[102]["n_doc_grams"] > 0
    assert out[102]["pred_lang"] == "en"


def test_whitespace_normalization_collapses_runs(spark, labeled):
    """'a  b' and 'a b' must classify identically (the \\s+ collapse
    is the only canonicalization)."""
    from aden_hive_fork_spark.operators.langid import (
        langid_classify,
        langid_profiles,
    )

    prof = langid_profiles(labeled, profile_size=100)
    test = spark.createDataFrame(
        [
            (1, "the   quick \t brown  fox"),
            (2, "the quick brown fox"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in langid_classify(test, prof).collect()}
    assert rows[1]["pred_lang"] == rows[2]["pred_lang"]
    assert rows[1]["distance"] == rows[2]["distance"]
    assert rows[1]["n_doc_grams"] == rows[2]["n_doc_grams"]


def test_classify_plan_broadcasts_profile_no_data_cartesian(spark):
    """Plan guard: the profile join must be a broadcast (the profile
    is |langs| * profile_size rows); the only nested-loop joins are
    the |langs|-row and 1-row broadcast cross joins; the corpus side
    must never be cartesian-joined against itself."""
    from aden_hive_fork_spark.catalog import load_table
    from aden_hive_fork_spark.operators.langid import (
        langid_classify,
        langid_profiles,
    )

    d = load_table(spark, SF_SMALL, "documents")
    prof = langid_profiles(d, profile_size=50)
    out = langid_classify(d, prof, profile_size=50)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # gram-side profile join
    # the single nested-loop join is the broadcast of the tiny
    # distinct-language list against per-doc gram counts
    assert len(re.findall(r"BroadcastNestedLoopJoin", plan)) == 1


def test_train_predict_fused_equals_separate(spark, labeled):
    """langid_train_predict (ONE corpus gram explode, r12) must be
    row-identical to the separate langid_profiles + langid_classify
    passes — profiles (summed per-doc counts == direct occurrence
    counts, exact integers) AND predictions. NULL-lang docs classify
    but never train, as in the separate form."""
    from aden_hive_fork_spark.operators.langid import (
        langid_classify,
        langid_profiles,
        langid_train_predict,
    )

    docs = labeled.withColumn(
        "lang",
        F.when(F.col("doc_id") % 7 == 3, F.lit(None)).otherwise(
            F.col("lang")
        ),
    )
    prof_sep = langid_profiles(
        docs, text_col="text", lang_col="lang", n=3, profile_size=50
    )
    pred_sep = langid_classify(
        docs, prof_sep, text_col="text", id_col="doc_id", n=3,
        profile_size=50,
    )
    prof_fused, pred_fused = langid_train_predict(
        docs, text_col="text", lang_col="lang", id_col="doc_id", n=3,
        profile_size=50,
    )
    key = lambda r: (r["lang"], r["gram"])  # noqa: E731
    assert sorted(
        (r.asDict() for r in prof_fused.collect()), key=key
    ) == sorted((r.asDict() for r in prof_sep.collect()), key=key)
    pk = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(
        (r.asDict() for r in pred_fused.collect()), key=pk
    ) == sorted((r.asDict() for r in pred_sep.collect()), key=pk)
