"""Unit invariants for the pretraining-pipeline capstone
(operators/pretrain_pipeline, suite q336/q337): stage subset
monotonicity, exact-dup removal, near-dup removal, quality screen,
packing identities — on a controlled synthetic corpus engineered so
every interesting stage provably bites."""

from __future__ import annotations

import math

import pytest

from aden_hive_fork_spark.operators.pretrain_pipeline import (
    PACK_CAPACITY,
    pretrain_pipeline_census,
    pretrain_pipeline_stages,
)

SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"

# Disjoint-alphabet vocabularies so trigram langid is exact: 'en'
# words use only a-m, 'fr' words only n-z.
_EN = [a + b + c for a in "abcde" for b in "fghij" for c in "klm"]
_FR = [a + b + c for a in "nopqr" for b in "stuvw" for c in "xyz"]


def _doc(i: int, vocab: list[str], n_words: int = 60) -> str:
    return " ".join(
        vocab[(i * 17 + j * j) % len(vocab)] for j in range(n_words)
    )


def _corpus() -> list[tuple]:
    rows = []
    did = 0
    for i in range(12):
        t = _doc(i, _EN)
        rows.append((did, t, "en", f"src{did % 3}", len(t)))
        did += 1
    for i in range(8):
        t = _doc(100 + i, _FR)
        rows.append((did, t, "fr", f"src{did % 3}", len(t)))
        did += 1
    # exact duplicates of doc 0's text (stage 4 must collapse them)
    t0 = _doc(0, _EN)
    for _ in range(3):
        rows.append((did, t0, "en", f"src{did % 3}", len(t0)))
        did += 1
    # a winnowing near-dup of doc 1: same first 50 words (stage 5)
    t1 = _doc(1, _EN)
    tnd = " ".join(t1.split(" ")[:50] + [_EN[(7 * j) % len(_EN)] for j in range(10)])
    rows.append((did, tnd, "en", f"src{did % 3}", len(tnd)))
    did += 1
    # a spam doc that fails the Gopher top-2-gram screen (stage 3)
    spam = " ".join([_EN[0]] * 60)
    rows.append((did, spam, "en", f"src{did % 3}", len(spam)))
    did += 1
    return rows


@pytest.fixture(scope="module")
def census(spark):
    df = spark.createDataFrame(_corpus(), SCHEMA)
    return {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in pretrain_pipeline_census(df).collect()
    }


@pytest.fixture(scope="module")
def stages(spark):
    # ONE chain shared by every test that reads stage frames (r13:
    # each chain costs ~7 s of fixed job overhead; three tests built
    # their own)
    df = spark.createDataFrame(_corpus(), SCHEMA)
    return pretrain_pipeline_stages(df)


def test_stage_names_and_monotone_shrinkage(census):
    names = sorted(census)
    assert names == [
        "1_base", "1b_normalize", "2_langid", "3_quality",
        "4_exact_dedup", "5_near_dedup", "6_decontam", "7_dsir",
        "8_mixture", "8b_pii", "8c_redactions", "9_packed",
    ]
    # corpus stages 1 through 8 are successive subsets: docs and
    # tokens both monotonically nonincreasing (8b rewrites text so
    # only its DOC count is pinned to stage 8's; 8c is the redaction
    # ledger, not a corpus)
    corpus = names[:9]  # 1_base .. 8_mixture
    for a, b in zip(corpus[:-1], corpus[1:]):
        assert census[b][0] <= census[a][0], (a, b, census)
        assert census[b][1] <= census[a][1], (a, b, census)
    assert census["8b_pii"][0] == census["8_mixture"][0]
    # redaction ledger: touched docs bounded by the corpus; hit count
    # bounded below by touched docs
    assert census["8c_redactions"][0] <= census["8_mixture"][0]
    assert census["8c_redactions"][1] >= census["8c_redactions"][0]


def test_stages_bite(spark, census, stages):
    # disjoint alphabets -> langid agrees on every doc (no drops at
    # stage 2 besides none), spam doc survives classification
    assert census["2_langid"][0] == census["1_base"][0]
    # the spam doc fails the top-2-gram screen
    assert census["3_quality"][0] == census["2_langid"][0] - 1
    spam_id = max(r[0] for r in _corpus())
    s3_ids = {r["doc_id"] for r in stages["3_quality"].collect()}
    assert spam_id not in s3_ids
    # 3 exact copies of doc 0 collapse to the min doc_id
    assert census["4_exact_dedup"][0] == census["3_quality"][0] - 3
    s4_ids = {r["doc_id"] for r in stages["4_exact_dedup"].collect()}
    assert 0 in s4_ids
    # the engineered 50/60-word-overlap near-dup of doc 1 is removed
    assert census["5_near_dedup"][0] == census["4_exact_dedup"][0] - 1
    s5_ids = {r["doc_id"] for r in stages["5_near_dedup"].collect()}
    assert 1 in s5_ids
    # DSIR with target lang='en' drops every fr doc
    s7 = stages["7_dsir"].collect()
    assert all(r["lang"] == "en" for r in s7)
    assert census["7_dsir"][0] > 0


def test_packing_identities(census):
    packed_windows, packed_tokens = census["9_packed"]
    pii_docs, pii_tokens = census["8b_pii"]
    assert packed_tokens == pii_tokens  # gapless: every token packed
    assert packed_windows == math.ceil(pii_tokens / PACK_CAPACITY)


def test_budget_cap_is_prefix_law(spark):
    # every kept doc's preceding cumulative cost is under the budget
    from aden_hive_fork_spark.operators.pretrain_pipeline import (
        BUDGET_PER_SOURCE,
    )
    from aden_hive_fork_spark.operators.sampling import (
        token_budget_sample,
    )

    df = spark.createDataFrame(_corpus(), SCHEMA)
    kept = token_budget_sample(
        df, "n_chars", BUDGET_PER_SOURCE, ["source"], ["doc_id"]
    ).collect()
    for r in kept:
        assert r["cum_cost"] - r["n_chars"] < BUDGET_PER_SOURCE


def test_normalize_and_pii_stages_bite(spark):
    """Round 11: stage 1b canonicalizes an NFD + messy-whitespace
    twin so stage 4's content hash collapses it onto the original;
    stage 8b rewrites every surviving PII hit with its typed
    placeholder and the 8c ledger accounts for exactly those docs."""
    import unicodedata

    rows = _corpus()
    next_id = max(r[0] for r in rows) + 1
    # an NFD/extra-space twin of doc 0: normalization must make it
    # byte-identical to doc 0, so exact dedup removes it
    t0 = _doc(0, _EN)
    twin = unicodedata.normalize("NFD", t0).replace(" ", "  ", 3)
    twin_id = next_id
    rows.append((twin_id, twin, "en", "src0", len(twin)))
    next_id += 1
    # an en doc carrying two emails (redacted at 8b if it survives)
    mail = _doc(2, _EN) + " contact a@b.com and c@d.org now"
    mail_id = next_id
    rows.append((mail_id, mail, "en", "src1", len(mail)))

    df = spark.createDataFrame(rows, SCHEMA)
    stages = pretrain_pipeline_stages(df)

    s1b = {r["doc_id"]: r["text"] for r in stages["1b_normalize"].collect()}
    assert s1b[twin_id] == t0  # canonicalized to the original bytes
    s4_ids = {r["doc_id"] for r in stages["4_exact_dedup"].collect()}
    assert twin_id not in s4_ids  # collapsed onto doc 0
    assert 0 in s4_ids

    s8 = {r["doc_id"]: r["text"] for r in stages["8_mixture"].collect()}
    s8b = {r["doc_id"]: r["text"] for r in stages["8b_pii"].collect()}
    assert set(s8) == set(s8b)
    import re

    email_re = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    for did, text in s8.items():
        assert email_re.sub("[EMAIL]", text) == s8b[did]
        assert "@" not in s8b[did]

    census = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in pretrain_pipeline_census(df).collect()
    }
    touched = sum(1 for t in s8.values() if email_re.search(t))
    hits = sum(len(email_re.findall(t)) for t in s8.values())
    assert census["8c_redactions"] == (touched, hits)
    if mail_id in s8:
        assert "[EMAIL] and [EMAIL]" in s8b[mail_id]


def test_census_observed_rows_match_direct_aggregates(
    spark, census, stages
):
    """r13: the single-consumer stage rows (1_base, 3_quality,
    7_dsir, 8_mixture) and the 8c ledger arrive as Dataset.observe
    metrics riding the chain's own materializations. Pin every
    census row against a direct aggregate over the stage frame — the
    pre-r13 law — which also proves Catalyst did not push any
    downstream filter below the CollectMetrics nodes."""
    from pyspark.sql import functions as F

    from aden_hive_fork_spark.operators.pii import detect_pii

    for name, sdf in stages.items():
        if name == "9_packed":
            row = sdf.agg(
                F.countDistinct("window_id").cast("bigint"),
                F.sum("n_tokens").cast("bigint"),
            ).collect()[0]
        else:
            row = sdf.agg(
                F.count(F.lit(1)).cast("bigint"),
                F.sum("n_chars").cast("bigint"),
            ).collect()[0]
        assert census[name] == (row[0], row[1]), name
    red = detect_pii(stages["8_mixture"], "text").agg(
        F.sum((F.col("pii_total") > 0).cast("int")).cast("bigint"),
        F.sum("pii_total").cast("bigint"),
    ).collect()[0]
    assert census["8c_redactions"] == (red[0], red[1])
