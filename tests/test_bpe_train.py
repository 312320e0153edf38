"""Differential test for the distributed BPE trainer
(operators/bpe_train): the relational gaps-and-islands merge
application must agree with a sequential greedy reference scan,
including the run-overlap case (left == right, e.g. merging "aa" in
"aaaa") where greedy selection actually matters.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from aden_hive_fork_spark.operators.bpe_train import (
    bpe_train_relational,
    bpe_word_freqs,
)


def _ref_train(texts: list[str], n_merges: int, top_words: int = 500):
    """Sequential reference with the operator's exact contract:
    [^a-zA-Z]+ split, ASCII lowercase, top_words by (freq DESC, word),
    argmax pair by (count DESC, pair ASC), greedy left-to-right merge."""
    freq: Counter = Counter()
    for t in texts:
        for w in re.split(r"[^a-zA-Z]+", t):
            if w:
                freq[w.lower()] += 1
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:top_words]
    words = {tuple(w): f for w, f in top}
    merges = []
    for r in range(1, n_merges + 1):
        pc: Counter = Counter()
        for syms, f in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((r, a, b, cnt))
        merged = a + b
        new = {}
        for syms, f in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + f
        words = new
    return merges


CORPUS = [
    "the cat sat on the mat the cat ran",
    "banana bandana banana banana",
    "aaaa aaa aaaa aa aaaa",  # runs: greedy parity matters
    "Mississippi mississippi MISSISSIPPI",
    "deep deeper deepest deep deep",
    "12 punct! the-cat, the_cat",
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame([(t,) for t in CORPUS], ["text"])


def test_relational_matches_sequential_reference(corpus_df):
    got = bpe_train_relational(corpus_df, "text", n_merges=8)
    want = _ref_train(CORPUS, n_merges=8)
    assert got == want


def test_word_freqs_cap_is_deterministic(corpus_df):
    rows = {
        r["word"]: r["freq"]
        for r in bpe_word_freqs(corpus_df, "text", top_words=3).collect()
    }
    freq: Counter = Counter()
    for t in CORPUS:
        for w in re.split(r"[^a-zA-Z]+", t):
            if w:
                freq[w.lower()] += 1
    want = dict(sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:3])
    assert rows == want


def test_min_count_stops_training(spark):
    df = spark.createDataFrame([("ab zz qq xy",)], ["text"])
    # every pair occurs once -> no merge reaches min_count=2
    assert bpe_train_relational(df, "text", n_merges=4) == []
