"""Differential property tests for the round-9b operators
(winnowing fingerprints, edit-distance verification, vocabulary
growth, WordPiece segmentation): Spark results vs exact plain-Python
models on randomized inputs — the round-7/8/9 discipline (few
examples, exact models, loud failures)."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pytest

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

WORDS = st.text(alphabet="abcdef", min_size=1, max_size=5)
DOC = st.lists(WORDS, min_size=0, max_size=25).map(" ".join)


@pytest.fixture(scope="module")
def sp():
    from aden_hive_fork_spark.session import build_session

    return build_session(
        app_name="r9b-props", cpus=4, shuffle_partitions=5
    )


# ---------------------------------------------------------------------------
# winnowing ≡ plain-Python Schleimer/Wilkerson/Aiken selection
# ---------------------------------------------------------------------------


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _model_winnow(text: str, k: int, w: int) -> set[int]:
    words = [t for t in text.strip().split(" ")]
    # Spark's split on " " keeps empties; the operator filters docs
    # with < k tokens on the RAW split — mirror that exactly.
    if len(words) < k or text.strip() == "":
        return set()
    hs = [
        _md5_60(" ".join(words[i : i + k]))
        for i in range(len(words) - k + 1)
    ]
    m = len(hs)
    last = max(m - w + 1, 1)
    fps = set()
    for s in range(1, last + 1):
        window = hs[s - 1 : min(s - 1 + w, m)]
        best_h, best_off = None, None
        for off, h in enumerate(window):
            if best_h is None or h <= best_h:
                best_h, best_off = h, off
        fps.add(best_h)
    return fps


@given(docs=st.lists(DOC, min_size=1, max_size=12))
@settings(**SETTINGS)
def test_winnowing_matches_python_model(sp, docs):
    from aden_hive_fork_spark.operators.dedup import (
        winnowing_fingerprints,
    )

    df = sp.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["fingerprint"])
        for r in winnowing_fingerprints(
            df, "doc_id", "text", k=2, window=3
        ).collect()
    }
    want = {
        (i, h)
        for i, d in enumerate(docs)
        for h in _model_winnow(d, k=2, w=3)
    }
    assert got == want


def test_winnowing_guarantee_and_pairs(sp):
    # the MOSS guarantee: two docs sharing a run of >= k + window - 1
    # words share at least one fingerprint; an exact duplicate pair
    # scores overlap 1.0.
    base = "one two three four five six seven eight nine ten"
    docs = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, "zz yy " + base + " xx qq"),  # containment superset
        (3, "totally different words entirely here now"),
    ]
    from aden_hive_fork_spark.operators.dedup import (
        winnowing_neardup_pairs,
    )

    df = sp.createDataFrame(docs, "doc_id long, text string")
    out = {
        (r["id_a"], r["id_b"]): (r["shared"], r["overlap"])
        for r in winnowing_neardup_pairs(
            df, "doc_id", "text", k=3, window=4,
            min_overlap=0.5, max_fp_df=100,
        ).collect()
    }
    assert (0, 1) in out and out[(0, 1)][1] == 1.0
    assert (0, 2) in out and out[(0, 2)][0] >= 1  # shared run
    assert not any(3 in pair for pair in out)


# ---------------------------------------------------------------------------
# edit-distance verification ≡ plain-Python Levenshtein
# ---------------------------------------------------------------------------


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb),
                )
            )
        prev = cur
    return prev[-1]


@given(
    texts=st.lists(
        st.text(alphabet="abc ", min_size=1, max_size=12),
        min_size=2,
        max_size=6,
    )
)
@settings(**SETTINGS)
def test_editdist_verify_matches_python(sp, texts):
    from aden_hive_fork_spark.operators.dedup import (
        editdist_verify_pairs,
    )

    docs = sp.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    cand = sp.createDataFrame(
        [
            (a, b)
            for a in range(len(texts))
            for b in range(a + 1, len(texts))
        ],
        "id_a long, id_b long",
    )
    got = {
        (r["id_a"], r["id_b"]): (r["edit_dist"], r["edit_sim"])
        for r in editdist_verify_pairs(
            cand, docs, "doc_id", "text", min_sim=0.0
        ).collect()
    }
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            d = _lev(texts[a], texts[b])
            sim = 1.0 - d / max(len(texts[a]), len(texts[b]))
            assert got[(a, b)][0] == d
            assert abs(got[(a, b)][1] - round(sim, 6)) < 1e-9


# ---------------------------------------------------------------------------
# vocabulary growth ≡ plain-Python first-occurrence cumsums
# ---------------------------------------------------------------------------


@given(docs=st.lists(DOC, min_size=1, max_size=20))
@settings(**SETTINGS)
def test_vocab_growth_matches_python(sp, docs):
    from aden_hive_fork_spark.operators.quality import (
        vocabulary_growth,
    )

    buckets = 4
    lo, hi = 0, len(docs)
    seen: set[str] = set()
    per = {}
    for i, d in enumerate(docs):
        b = (i - lo) * buckets // (hi - lo)
        ws = [w for w in d.strip().split(" ") if w != ""]
        st_ = per.setdefault(b, [0, 0, 0])  # docs, toks, new
        st_[0] += 1
        st_[1] += len(ws)
        for w in ws:
            if w not in seen:
                seen.add(w)
                st_[2] += 1
    want, tc, vc = {}, 0, 0
    for b in sorted(per):
        tc += per[b][1]
        vc += per[b][2]
        want[b] = (per[b][0], tc, vc)

    df = sp.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r["bucket"]: (r["n_docs"], r["tokens_cum"], r["vocab_cum"])
        for r in vocabulary_growth(
            df, "doc_id", "text", buckets=buckets
        ).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# WordPiece greedy segmentation ≡ plain-Python maximal munch
# ---------------------------------------------------------------------------


def _model_wordpiece(docs, min_occ, max_len):
    from collections import Counter

    words = Counter()
    for d in docs:
        for w in d.strip().split(" "):
            if w:
                words[w] += 1
    vocab = {c for w in words for c in w}
    occ = Counter()
    for w, f in words.items():
        for i in range(len(w)):
            for l in range(2, max_len + 1):
                if i + l <= len(w):
                    occ[w[i : i + l]] += f
    vocab |= {s for s, c in occ.items() if c >= min_occ}
    out = {}
    for w, f in words.items():
        pos, toks = 0, []
        while pos < len(w):
            for l in range(min(max_len, len(w) - pos), 0, -1):
                if w[pos : pos + l] in vocab:
                    toks.append(w[pos : pos + l])
                    pos += l
                    break
        out[w] = (f, " ".join(toks), len(toks))
    return out


@given(
    docs=st.lists(DOC, min_size=1, max_size=10),
    min_occ=st.integers(min_value=1, max_value=6),
)
@settings(**SETTINGS)
def test_wordpiece_matches_python_model(sp, docs, min_occ):
    from aden_hive_fork_spark.operators.bpe_train import (
        wordpiece_segment,
    )

    df = sp.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r["word"]: (r["word_freq"], r["wordpiece"], r["n_pieces"])
        for r in wordpiece_segment(
            df, "text", min_occ=min_occ, max_sub_len=3
        ).collect()
    }
    want = _model_wordpiece(docs, min_occ, 3)
    assert got == want


# ---------------------------------------------------------------------------
# DSIR importance ≡ plain-Python Spark-faithful model (HALF_UP
# rounds on the double's SHORTEST-DECIMAL repr — Spark's F.round
# builds the BigDecimal from the shortest repr, and DuckDB's round
# agrees; Decimal(x) on the exact binary value diverges one ulp
# below .5 boundaries, e.g. round(1.4987095, 6): engines say
# 1.49871, the binary expansion 1.4987094999... says 1.498709 —
# floor-quantized ln terms, sorted-fold sum)
# ---------------------------------------------------------------------------


def _r(x: float, d: int) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(x)).quantize(
            Decimal(1).scaleb(-d), rounding=ROUND_HALF_UP
        )
    )


def _model_dsir(docs_tgt):
    import math
    import re
    from collections import Counter

    tok = []
    for i, (d, tgt) in enumerate(docs_tgt):
        for w in re.split(r"\s+", d):
            if w:
                tok.append((i, tgt, w))
    c_raw, c_tgt = Counter(), Counter()
    for _i, tgt, w in tok:
        c_raw[w] += 1
        if tgt:
            c_tgt[w] += tgt
    v = len(c_raw)
    n_raw = sum(c_raw.values())
    n_tgt = sum(c_tgt.values())
    term = {}
    for w in c_raw:
        pt = _r((c_tgt.get(w, 0) + 1) / (n_tgt + v), 6)
        pr = _r((c_raw[w] + 1) / (n_raw + v), 6)
        x = math.log(pt) - math.log(pr)
        term[w] = math.floor(x * 1e9) / 1e9
    out = {}
    for i in {i for i, _t, _w in tok}:
        terms = sorted(term[w] for j, _t, w in tok if j == i)
        s = 0.0
        for t in terms:
            s += t
        s = _r(s, 9)
        out[i] = (len(terms), _r(s, 6))
    return out


@given(
    docs=st.lists(
        st.tuples(DOC, st.booleans()), min_size=1, max_size=10
    )
)
@settings(**SETTINGS)
def test_dsir_matches_python_model(sp, docs):
    from aden_hive_fork_spark.operators.sampling import dsir_importance

    df = sp.createDataFrame(
        [(i, d, t) for i, (d, t) in enumerate(docs)],
        "doc_id long, text string, tgt boolean",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["log_ratio"])
        for r in dsir_importance(df, "doc_id", "text", "tgt").collect()
    }
    assert got == _model_dsir(docs)


def test_dsir_prefers_target_like_docs(sp):
    # docs made of target-only words must outrank docs of raw-only
    # words — the selection property the operator exists for.
    rows = [
        (0, "alpha alpha beta", True),
        (1, "alpha beta beta alpha", True),
        (2, "gamma delta gamma delta", False),
        (3, "alpha beta alpha", False),   # target-like but unlabeled
        (4, "gamma gamma delta", False),
    ]
    from aden_hive_fork_spark.operators.sampling import dsir_importance

    df = sp.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    got = {
        r["doc_id"]: r["log_ratio"]
        for r in dsir_importance(df, "doc_id", "text", "tgt").collect()
    }
    assert got[3] > got[2] and got[3] > got[4]
    assert got[0] > got[2]


# ---------------------------------------------------------------------------
# curriculum interleave: per-domain rank + round-robin order
# ---------------------------------------------------------------------------


def test_curriculum_interleave(sp):
    rows = [
        (1, "a", 10), (2, "a", 30), (3, "a", 20),
        (4, "b", 5), (5, "b", 50),
        (6, "c", 7),
    ]
    from aden_hive_fork_spark.operators.sampling import (
        curriculum_interleave,
    )

    df = sp.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    out = [
        (r["round"], r["lang"], r["doc_id"])
        for r in curriculum_interleave(df, "doc_id", "lang", "n_chars")
        .orderBy("round", "lang", "doc_id")
        .collect()
    ]
    assert out == [
        (1, "a", 2), (1, "b", 5), (1, "c", 6),
        (2, "a", 3), (2, "b", 4),
        (3, "a", 1),
    ]


# ---------------------------------------------------------------------------
# ROUGE-2/BLEU-2 overlap ≡ plain-Python clipped-count model
# ---------------------------------------------------------------------------


def _model_overlap(cand: str, ref: str):
    import math
    import re
    from collections import Counter

    cw = [w for w in re.split(r"\s+", cand.strip()) if w]
    rw = [w for w in re.split(r"\s+", ref.strip()) if w]

    def grams(ws, n):
        return Counter(
            " ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)
        )

    def clip(n):
        c, r = grams(cw, n), grams(rw, n)
        return sum(min(v, r[g]) for g, v in c.items() if g in r)

    ct, rt = len(cw), len(rw)
    c1, c2 = clip(1), clip(2)
    p2 = c2 / (ct - 1) if ct - 1 > 0 else 0.0
    r2 = c2 / (rt - 1) if rt - 1 > 0 else 0.0
    f1 = 2 * p2 * r2 / (p2 + r2) if p2 + r2 > 0 else 0.0
    p1 = c1 / ct if ct > 0 else 0.0
    if c1 > 0 and c2 > 0 and ct > 0:
        bp = (
            1.0
            if ct >= rt
            else math.floor(math.exp(1.0 - rt / ct) * 1e9) / 1e9
        )
        bleu2 = bp * math.sqrt(p1 * p2)
    else:
        bleu2 = 0.0
    return (
        ct, rt, c1, c2,
        _r(p2, 6), _r(r2, 6), _r(f1, 6), _r(bleu2, 6),
    )


@given(
    pairs=st.lists(st.tuples(DOC, DOC), min_size=1, max_size=8)
)
@settings(**SETTINGS)
def test_ngram_overlap_matches_python(sp, pairs):
    from aden_hive_fork_spark.operators.metrics import (
        ngram_overlap_eval,
    )

    df = sp.createDataFrame(
        [(i, c, r) for i, (c, r) in enumerate(pairs)],
        "pid long, cand string, ref string",
    )
    got = {
        r["pid"]: (
            r["cand_tokens"], r["ref_tokens"], r["clip1"], r["clip2"],
            r["rouge2_p"], r["rouge2_r"], r["rouge2_f1"], r["bleu2"],
        )
        for r in ngram_overlap_eval(df, "pid", "cand", "ref").collect()
    }
    want = {i: _model_overlap(c, r) for i, (c, r) in enumerate(pairs)}
    assert got == want


def test_overlap_identity_pair_is_perfect(sp):
    from aden_hive_fork_spark.operators.metrics import (
        ngram_overlap_eval,
    )

    df = sp.createDataFrame(
        [(0, "a b c d e", "a b c d e")], "pid long, cand string, ref string"
    )
    row = ngram_overlap_eval(df, "pid", "cand", "ref").collect()[0]
    assert row["rouge2_f1"] == 1.0 and row["bleu2"] == 1.0


# ---------------------------------------------------------------------------
# Cohen's kappa ≡ closed-form on known confusion counts
# ---------------------------------------------------------------------------


def test_cohens_kappa_known_value(sp):
    from pyspark.sql import functions as F

    from aden_hive_fork_spark.operators.metrics import cohens_kappa

    # 20 rows: n11=8, n10=2, n01=3, n00=7
    rows = (
        [(True, True)] * 8 + [(True, False)] * 2
        + [(False, True)] * 3 + [(False, False)] * 7
    )
    df = sp.createDataFrame(rows, "a boolean, b boolean")
    got = cohens_kappa(df, F.col("a"), F.col("b")).collect()[0]
    po = 15 / 20
    pe = (10 / 20) * (11 / 20) + (10 / 20) * (9 / 20)
    kappa = (po - pe) / (1 - pe)
    assert (got["n11"], got["n10"], got["n01"], got["n00"]) == (8, 2, 3, 7)
    assert got["po"] == _r(po, 6)
    assert got["pe"] == _r(pe, 6)
    assert got["kappa"] == _r(kappa, 6)


def test_cohens_kappa_constant_raters_null(sp):
    from pyspark.sql import functions as F

    from aden_hive_fork_spark.operators.metrics import cohens_kappa

    df = sp.createDataFrame(
        [(True, True)] * 5, "a boolean, b boolean"
    )
    got = cohens_kappa(df, F.col("a"), F.col("b")).collect()[0]
    assert got["kappa"] is None  # pe = 1: undefined by contract


# ---------------------------------------------------------------------------
# rendezvous sharding: minimal motion + map-side plan
# ---------------------------------------------------------------------------


def test_hrw_minimal_motion_and_balance(sp):
    from aden_hive_fork_spark.operators.layout import hrw_assign

    df = sp.range(0, 2000).withColumnRenamed("id", "k")
    a8 = {r["k"]: r["shard"] for r in hrw_assign(df, "k", 8).collect()}
    a9 = {r["k"]: r["shard"] for r in hrw_assign(df, "k", 9).collect()}
    moved = {k for k in a8 if a8[k] != a9[k]}
    # every moved key moved TO the new shard — never between old ones
    assert all(a9[k] == 8 for k in moved)
    # moved fraction ~ 1/9 (loose band: binomial around 222/2000)
    assert 120 <= len(moved) <= 340
    # balance: each of 8 shards holds 2000/8 = 250 +- wide band
    from collections import Counter

    c = Counter(a8.values())
    assert set(c) == set(range(8))
    assert all(150 <= v <= 350 for v in c.values())


def test_hrw_plan_is_mapside(sp):
    from aden_hive_fork_spark.operators.layout import hrw_assign

    df = sp.range(0, 10).withColumnRenamed("id", "k")
    plan = hrw_assign(df, "k", 8)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: pure projection
    assert "Generate" not in plan  # no explode


# ---------------------------------------------------------------------------
# dataset datasheet ≡ plain-Python census (incl. dup exposure)
# ---------------------------------------------------------------------------


def test_datasheet_matches_python_model(sp):
    import re
    from collections import Counter, defaultdict

    from aden_hive_fork_spark.operators.quality import dataset_datasheet

    rows = [
        (0, "en", "s1", "the quick fox", 13),
        (1, "en", "s2", "the quick fox", 13),   # exact dup of 0
        (2, "en", "s1", "a different doc", 15),
        (3, "de", "s3", "der schnelle fuchs", 18),
        (4, "de", "s3", "der schnelle fuchs", 18),  # dup
        (5, "de", "s3", "der schnelle fuchs", 18),  # dup (triple)
        (6, "fr", "s4", "le renard", 9),
    ]
    df = sp.createDataFrame(
        rows, "doc_id long, lang string, source string, text string,"
        " n_chars long"
    )
    got = {
        r["lang"]: (
            r["n_docs"], r["n_sources"], r["n_tokens"],
            r["distinct_words"], r["dup_docs"], r["removable_docs"],
            r["dup_rate"],
        )
        for r in dataset_datasheet(
            df, "doc_id", "text", "lang", "source", "n_chars"
        ).collect()
    }
    by_lang = defaultdict(list)
    for _i, lang, src, text, nc in rows:
        by_lang[lang].append((src, text, nc))
    want = {}
    for lang, docs in by_lang.items():
        toks = [
            [w for w in re.split(r"\s+", t.strip()) if w]
            for _s, t, _c in docs
        ]
        texts = Counter(t for _s, t, _c in docs)
        dup_docs = sum(c for c in texts.values() if c > 1)
        removable = sum(c - 1 for c in texts.values())
        want[lang] = (
            len(docs),
            len({s for s, _t, _c in docs}),
            sum(len(t) for t in toks),
            len({w for t in toks for w in t}),
            dup_docs,
            removable,
            _r(removable / len(docs), 6),
        )
    assert got == want
    assert got["de"][4] == 3 and got["de"][5] == 2  # triple → 2 removable
