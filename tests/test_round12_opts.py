"""Round-12 optimization equivalence pins: the WordPiece Arrow-kernel
munch vs the retained driver-rounds reference, and the langid classify
argmin (min-struct, no language cross join) vs an independent Python
recomputation of the out-of-place law."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# WordPiece: _wordpiece_segment_tail (Arrow kernel) must be
# row-identical to _wordpiece_segment_rounds (driver rounds) on a
# corpus with multibyte codepoints, long words, and mixed frequencies.
# ---------------------------------------------------------------------------
@pytest.fixture()
def wp_words(spark):
    corpus = [
        ("internationalization", 40),
        ("internal", 55),
        ("nation", 70),
        ("nationalization", 12),
        ("ization", 33),
        ("héllo", 21),
        ("héllos", 9),
        ("日本語テキスト", 17),
        ("日本語", 44),
        ("a", 100),
        ("ab", 60),
        ("abcd", 31),
        ("abcdabcd", 8),
        ("xyzzy", 3),
        ("ß", 5),
        ("straße", 27),
    ]
    return spark.createDataFrame(corpus, "word string, freq bigint")


def test_wordpiece_kernel_matches_rounds(spark, wp_words):
    from aden_hive_fork_spark.operators.bpe_train import (
        _wordpiece_segment_rounds,
        _wordpiece_segment_tail,
    )

    for min_occ, max_sub_len in ((10, 4), (25, 3), (2, 2)):
        kern = sorted(
            (
                r.asDict()
                for r in _wordpiece_segment_tail(
                    wp_words, min_occ, max_sub_len, 4096
                ).collect()
            ),
            key=lambda d: d["word"],
        )
        ref = sorted(
            (
                r.asDict()
                for r in _wordpiece_segment_rounds(
                    wp_words, min_occ, max_sub_len, 4096
                ).collect()
            ),
            key=lambda d: d["word"],
        )
        assert kern == ref, (min_occ, max_sub_len)
        # every word survives (single chars are always in-vocab) and
        # pieces reconstruct the word exactly
        assert len(kern) == wp_words.count()
        for row in kern:
            assert "".join(row["wordpiece"].split(" ")) == row["word"]


def test_wordpiece_kernel_public_seam(spark):
    """The public wordpiece_segment (df entry form) rides the kernel:
    same guard, same output shape, empty corpus handled."""
    from aden_hive_fork_spark.operators.bpe_train import (
        wordpiece_segment,
    )

    df = spark.createDataFrame(
        [("aa bb aa",), ("aa cc",)], "text string"
    )
    rows = {
        r["word"]: r
        for r in wordpiece_segment(df, min_occ=2, max_sub_len=2).collect()
    }
    assert rows["aa"]["word_freq"] == 3
    assert rows["aa"]["wordpiece"] == "aa"
    assert rows["aa"]["n_pieces"] == 1
    # 'cc' occurs once (< min_occ): not in the substring vocab, so it
    # munches to single chars
    assert rows["cc"]["wordpiece"] == "c c"
    assert rows["cc"]["n_pieces"] == 2
    with pytest.raises(ValueError, match="max_rounds"):
        wordpiece_segment(
            spark.createDataFrame([("x" * 99,)], "text string"),
            max_rounds=10,
        )


# ---------------------------------------------------------------------------
# BPE: the driver-side merge rounds must be bit-identical to the
# relational rounds — merges (rank, lhs, rhs, count) AND the final
# token table, including overlapping-pair counting ("aaa") and the
# greedy left-to-right non-overlap merge law.
# ---------------------------------------------------------------------------
def test_bpe_driver_matches_relational(spark):
    from aden_hive_fork_spark.operators.bpe_train import (
        _train_with_tokens_driver,
        _train_with_tokens_relational,
    )

    df = spark.createDataFrame(
        [
            ("the theme of the thesis is these themes",),
            ("aaa aaaa banana bandana the theme",),
            ("low lower lowest newer newest wider the",),
            ("Mixed CASE words THE the ThE",),
        ],
        "text string",
    )
    for n_merges, top_words, min_count in ((6, 500, 2), (3, 5, 1), (8, 500, 3)):
        m_d, t_d = _train_with_tokens_driver(
            df, "text", n_merges, top_words, min_count
        )
        m_r, t_r = _train_with_tokens_relational(
            df, "text", n_merges, top_words, min_count
        )
        assert m_d == m_r, (n_merges, top_words, min_count)
        key = lambda d: (d["wid"], d["pos"])  # noqa: E731
        assert sorted((r.asDict() for r in t_d.collect()), key=key) == sorted(
            (r.asDict() for r in t_r.collect()), key=key
        ), (n_merges, top_words, min_count)
        assert dict(t_d.dtypes) == dict(t_r.dtypes)


# ---------------------------------------------------------------------------
# Viterbi: the Arrow kernel must replay the HOF DP bit for bit —
# pieces, n_pieces, AND the raw double score (exact equality, not
# approx), including longest-piece tie-breaks and mixed coverage.
# ---------------------------------------------------------------------------
def test_viterbi_kernel_matches_hof_exactly(spark):
    from aden_hive_fork_spark.operators.unigram_lm import (
        viterbi_segment,
        viterbi_segment_hof,
    )

    words = spark.createDataFrame(
        [
            ("abab", 3),
            ("ab", 7),
            ("banana", 2),
            ("internationalization", 1),
            ("héllo", 4),
            ("日本語", 5),
            ("x", 9),
        ],
        "word string, freq bigint",
    )
    vocab = spark.createDataFrame(
        [
            ("a", -1.0),
            ("b", -1.0),
            ("ab", -2.0),  # exact tie with [a, b]: longer piece wins
            ("ba", -1.7),
            ("an", -1.3),
            ("ana", -2.9),
            ("n", -2.2),
            ("i", -1.9),
            ("t", -1.8),
            ("e", -1.6),
            ("r", -2.0),
            ("o", -2.1),
            ("l", -2.3),
            ("z", -2.4),
            ("na", -1.2),
            ("tion", -3.1),
            ("h", -1.5),
            ("é", -2.6),
            ("日", -1.1),
            ("本", -1.2),
            ("語", -1.3),
            ("日本", -2.0),
            ("x", -0.5),
        ],
        "token string, logp double",
    )
    for L in (2, 3, 4):
        key = lambda d: d["word"]  # noqa: E731
        kern = sorted(
            (r.asDict() for r in viterbi_segment(words, vocab, L).collect()),
            key=key,
        )
        ref = sorted(
            (
                r.asDict()
                for r in viterbi_segment_hof(words, vocab, L).collect()
            ),
            key=key,
        )
        assert kern == ref, L  # exact — including the double scores
    # the tie law: with [a b] and [ab] scoring EQUAL, the longer
    # piece must win (ascending-l replace-on->= order)
    tie_vocab = spark.createDataFrame(
        [("a", -1.0), ("b", -1.0), ("ab", -2.0)],
        "token string, logp double",
    )
    out = {
        r["word"]: r
        for r in viterbi_segment(
            spark.createDataFrame(
                [("abab", 3)], "word string, freq bigint"
            ),
            tie_vocab,
            2,
        ).collect()
    }
    assert out["abab"]["pieces"] == "ab ab"
    assert out["abab"]["score"] == -4.0


# ---------------------------------------------------------------------------
# Langid classify argmin: the r12 min-struct form (no doc x lang
# cross join) vs an independent row-at-a-time Python recomputation of
# the Cavnar–Trenkle out-of-place distance over ALL languages
# (including absent ones — the law the dense form materialized).
# ---------------------------------------------------------------------------
def test_classify_argmin_matches_dense_python(spark):
    from aden_hive_fork_spark.operators.langid import (
        langid_classify,
        langid_profiles,
    )

    train = spark.createDataFrame(
        [
            (1, "aaa aab aba baa aaa aab", "aa"),
            (2, "bbb bba bab abb bbb bba", "bb"),
            (3, "ccc cca cac acc ccc", "cc"),
            (4, "aaa bbb ccc mixed text here", "zz"),
        ],
        "doc_id bigint, text string, lang string",
    )
    test = spark.createDataFrame(
        [
            (10, "aaa aab aaa"),
            (11, "bbb bba"),
            (12, "qqq qqv qvq"),  # grams in NO profile: fallback law
            (13, ""),  # zero grams
            (14, "aaa bbb"),  # competitive: exercises tie-break path
        ],
        "doc_id bigint, text string",
    )
    P = 7
    prof = langid_profiles(train, n=3, profile_size=P)
    got = {
        r["doc_id"]: r
        for r in langid_classify(
            test, prof, n=3, profile_size=P
        ).collect()
    }

    # independent recomputation
    prof_rows = prof.collect()
    langs = sorted({r["lang"] for r in prof_rows})
    lrank = {(r["lang"], r["gram"]): r["rank"] for r in prof_rows}
    import re as _re
    from collections import Counter

    for trow in test.collect():
        t = _re.sub(r"\s+", " ", trow["text"].lower())
        grams = (
            [t[i : i + 3] for i in range(len(t) - 2)]
            if len(t) >= 3
            else []
        )
        cnt = Counter(grams)
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:P]
        doc_rank = {g: i + 1 for i, (g, _) in enumerate(ranked)}
        n = len(doc_rank)
        dists = {}
        for lang in langs:
            d = 0
            for g, dr in doc_rank.items():
                lr = lrank.get((lang, g))
                d += abs(dr - lr) if lr is not None else P
            dists[lang] = d
        pred = min(langs, key=lambda l: (dists[l], l))
        r = got[trow["doc_id"]]
        assert r["n_doc_grams"] == n, trow["doc_id"]
        assert r["pred_lang"] == pred, (trow["doc_id"], dists)
        assert r["distance"] == dists[pred], (trow["doc_id"], dists)


# ---------------------------------------------------------------------------
# Poisson bootstrap: _with_poisson_weight (single-eval Generate
# barrier) must draw exactly the same multiplicities as the direct
# poisson1_weight(md5_uniform(...)) expression — including after a
# _w > 0 filter (the shape whose pushdown duplicated the md5 chain).
# ---------------------------------------------------------------------------
def test_poisson_weight_barrier_matches_direct(spark):
    from aden_hive_fork_spark.operators.bootstrap import (
        _with_poisson_weight,
        md5_uniform,
        poisson1_weight,
    )

    base = spark.range(0, 500).select(
        F.col("id").alias("k"),
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("_b"),
    )
    rkey = F.concat(
        F.col("_b").cast("string"), F.lit("|"), F.col("k").cast("string")
    )
    direct = (
        base.withColumn("_w", poisson1_weight(md5_uniform(rkey, "s12")))
        .filter(F.col("_w") > 0)
        .select("k", "_b", "_w")
    )
    barrier = (
        _with_poisson_weight(base, rkey, "s12")
        .filter(F.col("_w") > 0)
        .select("k", "_b", "_w")
    )
    d = sorted(tuple(r) for r in direct.collect())
    b = sorted(tuple(r) for r in barrier.collect())
    assert d == b and len(d) > 0


# ---------------------------------------------------------------------------
# ANN bucket kernel: ann_md5_buckets (int64 matmul + LUT strings)
# must emit exactly the rows of the retained expression form,
# including NULL embeddings (all-"0" bit strings).
# ---------------------------------------------------------------------------
def test_ann_bucket_kernel_matches_hof_exactly(spark):
    import math

    from aden_hive_fork_spark.operators.similarity import (
        ann_md5_buckets,
        ann_md5_buckets_hof,
    )

    dim = 16
    rows = []
    for i in range(40):
        vec = [
            math.sin(i * 37 + j) * (j + 1) - (i % 5) for j in range(dim)
        ]
        rows.append((i, vec))
    rows.append((100, None))  # NULL embedding -> all-"0" buckets
    rows.append((101, [0.0] * dim))  # zero vector -> all-zero qvec
    emb = spark.createDataFrame(
        rows, schema="vec_id long, embedding array<double>"
    )
    key = lambda r: (  # noqa: E731
        r["id"],
        tuple(r["qvec"]) if r["qvec"] is not None else None,
        r["bucket"],
    )
    a = sorted(
        key(r)
        for r in ann_md5_buckets(
            emb, num_tables=3, num_planes=5, dim=dim
        ).collect()
    )
    b = sorted(
        key(r)
        for r in ann_md5_buckets_hof(
            emb, num_tables=3, num_planes=5, dim=dim
        ).collect()
    )
    assert a == b and len(a) == 42 * 3


# ---------------------------------------------------------------------------
# PCA power rounds: the driver fast path must replay the relational
# rounds bit for bit (same sorted fold, quantization, sign law).
# ---------------------------------------------------------------------------
def test_power_rounds_driver_matches_relational(spark, monkeypatch):
    import math

    from aden_hive_fork_spark.operators import pca

    rows = []
    for i in range(60):
        vec = [
            math.sin(i * 13 + j) * (1 + (j % 5)) + (i % 7) * 0.25
            for j in range(12)
        ]
        rows.append((i, vec))
    emb = spark.createDataFrame(
        rows, schema="vec_id long, embedding array<double>"
    )
    v_fast, lam_fast = pca.power_iteration_pc1(emb, "embedding", iters=4)
    monkeypatch.setattr(pca, "_PCA_DRIVER_MAX_DIM", 0)
    v_rel, lam_rel = pca.power_iteration_pc1(emb, "embedding", iters=4)
    assert v_fast == v_rel
    assert lam_fast == lam_rel
