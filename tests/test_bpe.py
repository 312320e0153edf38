"""BPE tokenizer tests: hand-computed merges on the classic toy
corpus, deterministic training, greedy-encode correctness, decode
round-trip, and a driver-vs-distributed differential over testdata."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from aden_hive_fork_spark.functions.bpe import (
    EOW,
    bpe_token_counts,
    bpe_tokens,
    decode_tokens,
    encode_text,
    encode_word,
    pretokenize,
    train_bpe,
)

SF = "/root/testdata/sf0.001"


def test_pretokenize_runs():
    assert pretokenize("Hello, world!  x2") == [
        "Hello", ",", "world", "!", "x", "2"
    ]
    assert pretokenize("") == []
    assert pretokenize(None) == []


def test_train_bpe_classic_toy_corpus(spark):
    """Sennrich-paper-style toy corpus: 'low' x5, 'lowest' x2,
    'newer' x6, 'wider' x3. First merges are hand-computable from
    pair frequencies with the (count desc, lexicographic) tie-break."""
    rows = [(1, " ".join(["low"] * 5 + ["lowest"] * 2
                         + ["newer"] * 6 + ["wider"] * 3))]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    bpe = train_bpe(df, n_merges=4)
    merges = [tuple(m) for m in bpe["merges"]]
    # pair counts round 1: ('e','r</w>') from newer(6)+wider(3)=9 is
    # the max ( 'l','o' has 7, 'w','e' has 8... newer: n-e,e-w,w-e,e-r</w>;
    # wider: w-i,i-d,d-e,e-r</w>) → ('e','r</w>')=9 wins
    assert merges[0] == ("e", "r" + EOW)
    # every merge is a pair of strings and vocab contains the results
    assert all(len(m) == 2 for m in merges)
    assert "er" + EOW in bpe["vocab"]
    # deterministic: retraining gives identical merges
    again = train_bpe(df, n_merges=4)
    assert again["merges"] == bpe["merges"]


def test_encode_word_greedy_rank_order():
    # ranks: merge (l,o) first, then (lo,w</w>)
    ranks = {("l", "o"): 0, ("lo", "w" + EOW): 1}
    assert encode_word("low", ranks) == ["low" + EOW]
    # unseen word falls back to chars (+EOW on the last)
    assert encode_word("xyz", ranks) == ["x", "y", "z" + EOW]
    # lower rank wins even when a higher-rank pair appears earlier
    ranks2 = {("b", "c"): 0, ("a", "b"): 1}
    assert encode_word("abcd", ranks2) == ["a", "bc", "d" + EOW]


def test_encode_matches_manual_merge_walk():
    ranks = {("a", "b"): 0, ("ab", "c" + EOW): 1, ("x", "y" + EOW): 2}
    assert encode_text("abc xy", ranks) == ["abc" + EOW, "xy" + EOW]


def test_decode_round_trip(spark):
    df = spark.createDataFrame(
        [(1, "the newer low wider lowest newer")], ["doc_id", "text"]
    )
    bpe = train_bpe(df, n_merges=30)
    ranks = {tuple(m): i for i, m in enumerate(bpe["merges"])}
    text = "newer lowest wider low"
    toks = encode_text(text, ranks)
    assert decode_tokens(toks) == text


def test_distributed_encode_differential(spark):
    """pandas-UDF encode must equal the driver-side reference encode
    row for row (the slow-vs-fast differential)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(60)
    bpe = train_bpe(docs, text_col="text", n_merges=80,
                    order_col="doc_id")
    ranks = {tuple(m): i for i, m in enumerate(bpe["merges"])}

    out = bpe_tokens(docs, bpe, "text").select("doc_id", "text",
                                               "bpe_tokens").collect()
    assert len(out) == 60
    for r in out:
        assert r["bpe_tokens"] == encode_text(r["text"], ranks)

    counted = bpe_token_counts(docs, bpe, "text").collect()
    for r in counted:
        assert r["n_bpe_tokens"] == len(encode_text(r["text"], ranks))


def test_token_counts_compress_vs_chars(spark):
    """BPE must compress: token count strictly below character count
    on real text once merges are learned, and above the word count
    (subword granularity)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(100)
    bpe = train_bpe(docs, text_col="text", n_merges=150,
                    order_col="doc_id")
    row = (
        bpe_token_counts(docs, bpe, "text")
        .select(
            F.sum("n_bpe_tokens").alias("toks"),
            F.sum(F.length("text")).alias("chars"),
            F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("words"),
        )
        .collect()[0]
    )
    assert row["toks"] < row["chars"]
    assert row["toks"] >= row["words"]


def test_bpe_dict_json_persistable(spark):
    df = spark.createDataFrame([(1, "aa ab aa ab aa")], ["doc_id", "text"])
    bpe = train_bpe(df, n_merges=5)
    restored = json.loads(json.dumps(bpe))
    ranks = {tuple(m): i for i, m in enumerate(restored["merges"])}
    assert encode_text("aa ab", ranks) == encode_text(
        "aa ab", {tuple(m): i for i, m in enumerate(bpe["merges"])}
    )
