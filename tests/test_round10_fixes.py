"""Regression tests for the round-10 ADVICE fixes: dsir probability
floor under large totals, cohens_kappa NULL-rater policy, datasheet
left-join to vocab, and the wordpiece_segment max_rounds bound."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def sp():
    from aden_hive_fork_spark.session import build_session

    return build_session(
        app_name="r10-fixes", cpus=4, shuffle_partitions=5
    )


# ---------------------------------------------------------------------------
# dsir_importance: rounded probability must floor at 10**-ndigits —
# at ndigits=2 a corpus of > ~200 total tokens makes round(1/(N+V), 2)
# underflow to 0.0, and before the fix F.log(0.0) returned NULL and
# det_sum's collect_list silently dropped the term.
# ---------------------------------------------------------------------------


def _model_dsir(rows, ndigits):
    """Exact Python replay of dsir_importance with the floor."""
    toks = []
    for doc_id, tgt, text in rows:
        for w in text.split():
            toks.append((doc_id, tgt, w))
    c_raw, c_tgt = {}, {}
    for _, tgt, w in toks:
        c_raw[w] = c_raw.get(w, 0) + 1
        if tgt:
            c_tgt[w] = c_tgt.get(w, 0) + 1
    v = len(c_raw)
    n_raw = sum(c_raw.values())
    n_tgt = sum(1 for _, tgt, _ in toks if tgt)
    floor = 10.0**-ndigits
    term = {}
    for w in c_raw:
        p_t = max(round((c_tgt.get(w, 0) + 1) / (n_tgt + v), ndigits), floor)
        p_r = max(round((c_raw[w] + 1) / (n_raw + v), ndigits), floor)
        term[w] = math.floor((math.log(p_t) - math.log(p_r)) * 1e9) / 1e9
    out = {}
    for doc_id, _, w in toks:
        n, s = out.get(doc_id, (0, []))
        s.append(term[w])
        out[doc_id] = (n + 1, s)
    return {
        d: (n, round(round(sum(sorted(s)), 9), ndigits))
        for d, (n, s) in out.items()
    }


def test_dsir_large_total_no_null_terms(sp):
    from aden_hive_fork_spark.operators.sampling import dsir_importance

    # 3 distinct words, 300 total tokens → N+V > 300, so at
    # ndigits=2 round(1/(N+V), 2) = 0.0 without the floor.
    rows = [
        (1, True, " ".join(["alpha"] * 100)),
        (2, False, " ".join(["beta"] * 150)),
        (3, False, " ".join(["gamma"] * 50)),
    ]
    df = sp.createDataFrame(rows, "doc_id int, tgt boolean, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["log_ratio"])
        for r in dsir_importance(
            df, "doc_id", "text", "tgt", ndigits=2
        ).collect()
    }
    want = _model_dsir(rows, 2)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], f"n_tokens mismatch doc {d}"
        assert got[d][1] is not None, f"NULL log_ratio doc {d}"
        assert got[d][1] == pytest.approx(want[d][1], abs=1e-9)


def test_dsir_stream_ratio_table_floor(sp, tmp_path):
    """The streaming twin's read_ratio_table must apply the same
    probability floor — no NULL terms on large-total count tables."""
    import json
    import os

    from aden_hive_fork_spark.operators.layout import write_pointer
    from aden_hive_fork_spark.streaming.dsir_stream import read_ratio_table

    base = str(tmp_path / "dsir_state")
    os.makedirs(base, exist_ok=True)
    counts = sp.createDataFrame(
        [("alpha", 1000000, 900000), ("beta", 3000000, 1)],
        "word string, c_raw bigint, c_tgt bigint",
    )
    counts.coalesce(1).write.parquet(os.path.join(base, "v=1"))
    write_pointer(base, 1, dsir=json.dumps({"ndigits": 6}))
    rows = {r["word"]: r["term"] for r in read_ratio_table(sp, base).collect()}
    # 4M+ total raw tokens → round(p_r, 6) can hit 0 for rare words;
    # with the floor every term is finite and non-NULL.
    assert all(t is not None and math.isfinite(t) for t in rows.values())


# ---------------------------------------------------------------------------
# cohens_kappa: NULL raters excluded from ALL counts, n included
# ---------------------------------------------------------------------------


def test_cohens_kappa_null_raters_excluded(sp):
    from aden_hive_fork_spark.operators.metrics import cohens_kappa

    rows = [
        (True, True),
        (True, False),
        (False, True),
        (False, False),
        (None, True),
        (True, None),
        (None, None),
    ]
    df = sp.createDataFrame(rows, "a boolean, b boolean")
    got = cohens_kappa(df, F.col("a"), F.col("b")).collect()[0]
    # only the 4 fully-observed rows count
    assert got["n"] == 4
    assert (got["n11"], got["n10"], got["n01"], got["n00"]) == (1, 1, 1, 1)
    assert got["n"] == got["n11"] + got["n10"] + got["n01"] + got["n00"]
    assert got["po"] == pytest.approx(0.5)
    assert got["pe"] == pytest.approx(0.5)
    assert got["kappa"] == pytest.approx(0.0)


# ---------------------------------------------------------------------------
# dataset_datasheet: a language whose docs are all whitespace still
# gets its row (distinct_words = 0), honoring one-row-per-language
# ---------------------------------------------------------------------------


def test_datasheet_keeps_empty_vocab_language(sp):
    from aden_hive_fork_spark.operators.quality import dataset_datasheet

    rows = [
        (1, "hello world", "en", "web", 11),
        (2, "   ", "zz", "web", 3),
        (3, "", "zz", "crawl", 0),
    ]
    df = sp.createDataFrame(
        rows, "doc_id int, text string, lang string, source string, n_chars int"
    )
    out = {
        r["lang"]: r
        for r in dataset_datasheet(df, "doc_id").collect()
    }
    assert set(out) == {"en", "zz"}
    zz = out["zz"]
    assert zz["n_docs"] == 2
    assert zz["distinct_words"] == 0
    assert zz["dup_docs"] == 0
    assert zz["removable_docs"] == 0
    assert zz["dup_rate"] == pytest.approx(0.0)


# ---------------------------------------------------------------------------
# wordpiece_segment: pathological unsplit token trips max_rounds
# loudly instead of looping one driver round per character
# ---------------------------------------------------------------------------


def test_wordpiece_segment_max_rounds_guard(sp):
    from aden_hive_fork_spark.operators.bpe_train import wordpiece_segment

    df = sp.createDataFrame(
        [("x" * 50 + " short words here",)], "text string"
    )
    with pytest.raises(ValueError, match="max_rounds"):
        wordpiece_segment(df, max_rounds=10)
    # and succeeds when the bound admits the corpus
    out = wordpiece_segment(df, max_rounds=64)
    assert out.filter(F.col("word") == "short").count() == 1
