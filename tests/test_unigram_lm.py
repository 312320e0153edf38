"""Differential property tests for the unigram-LM tokenizer trainer
(operators/unigram_lm): Spark results vs an exact plain-Python
Viterbi-EM model on randomized corpora — the round-7/8/9 discipline
(few examples, exact models, loud failures)."""

from __future__ import annotations

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pytest

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

WORDS = st.text(alphabet="abc", min_size=1, max_size=6)
DOC = st.lists(WORDS, min_size=1, max_size=20).map(" ".join)


@pytest.fixture(scope="module")
def sp():
    from aden_hive_fork_spark.session import build_session

    return build_session(
        app_name="unigram-props", cpus=4, shuffle_partitions=5
    )


def _r(x: float, d: int) -> float:
    """Spark ROUND: HALF_UP on the SHORTEST decimal rendering of the
    double (BigDecimal.valueOf == Double.toString), so quantize
    Decimal(repr(x)), NOT Decimal(x) — the exact binary expansion
    disagrees with both engines on half-boundary values like
    -6.4821915 (stored as ...149999…): engines say -6.482192, the
    exact expansion says -6.482191. Same fix as the round-12
    test_round9b _r repair; hypothesis found this model's instance
    in round 13."""
    return float(
        Decimal(repr(x)).quantize(
            Decimal(1).scaleb(-d), rounding=ROUND_HALF_UP
        )
    )


def _model_unigram(docs, min_occ, L, em_rounds):
    """Exact Python replay of operators/unigram_lm._train_chain."""
    words = Counter()
    for d in docs:
        for w in d.strip().split(" "):
            if w:
                words[w] += 1
    seed = Counter()
    for w, f in words.items():
        for i in range(len(w)):
            for l in range(1, min(L, len(w) - i) + 1):
                seed[w[i : i + l]] += f
    seed = {t: c for t, c in seed.items() if len(t) == 1 or c >= min_occ}

    def logp_table(cnts):
        v = len(cnts)
        t = sum(cnts.values())
        return {
            tok: math.floor(
                math.log(max(_r((c + 1) / (t + v), 6), 1e-6)) * 1e9
            )
            / 1e9
            for tok, c in cnts.items()
        }

    def viterbi(word, logp):
        n = len(word)
        best = [0.0] + [-1e300] * n
        bp = [0] * (n + 1)
        for j in range(1, n + 1):
            bs, bl = -1e300, 0
            for l in range(1, min(L, j) + 1):
                tok = word[j - l : j]
                if tok in logp:
                    s = best[j - l] + logp[tok]
                    if s >= bs:
                        bs, bl = s, l
            best[j] = bs
            bp[j] = bl
        ps, cur = [], n
        while cur > 0:
            l = bp[cur]
            ps.insert(0, word[cur - l : cur])
            cur -= l
        return ps, best[n]

    cnts = dict(seed)
    for _ in range(em_rounds):
        logp = logp_table(cnts)
        newc = {t: 0 for t in seed}
        for w, f in words.items():
            ps, _ = viterbi(w, logp)
            for p in ps:
                newc[p] += f
        cnts = newc
    final_logp = logp_table(cnts)
    model = {
        t: (seed[t], cnts[t], _r(final_logp[t], 6)) for t in seed
    }
    segs = {}
    for w, f in words.items():
        ps, sc = viterbi(w, final_logp)
        segs[w] = (f, " ".join(ps), len(ps), _r(sc, 6))
    return model, segs


@given(docs=st.lists(DOC, min_size=1, max_size=8), min_occ=st.integers(1, 4))
@settings(**SETTINGS)
def test_unigram_lm_matches_python_model(sp, docs, min_occ):
    from aden_hive_fork_spark.operators.unigram_lm import (
        unigram_lm_segment,
        unigram_lm_train,
    )

    df = sp.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    want_model, want_segs = _model_unigram(docs, min_occ, 3, 2)
    got_model = {
        r["token"]: (r["seed_cnt"], r["cnt"], r["logp"])
        for r in unigram_lm_train(
            df, "text", min_occ=min_occ, max_piece_len=3, em_rounds=2
        ).collect()
    }
    assert got_model == want_model
    got_segs = {
        r["word"]: (
            r["word_freq"],
            r["pieces"],
            r["n_pieces"],
            r["score"],
        )
        for r in unigram_lm_segment(
            df, "text", min_occ=min_occ, max_piece_len=3, em_rounds=2
        ).collect()
    }
    assert got_segs == want_segs


def test_unigram_lm_known_small_corpus(sp):
    """Pinned example: 'ab' dominant → 'ab' becomes one piece."""
    from aden_hive_fork_spark.operators.unigram_lm import (
        unigram_lm_segment,
    )

    docs = [("ab ab ab ab ab ab cd",)]
    df = sp.createDataFrame(docs, "text string")
    segs = {
        r["word"]: (r["pieces"], r["n_pieces"])
        for r in unigram_lm_segment(
            df, "text", min_occ=2, max_piece_len=2, em_rounds=2
        ).collect()
    }
    assert segs["ab"] == ("ab", 1)
    # 'cd' occurs once < min_occ → segments to chars
    assert segs["cd"] == ("c d", 2)
