"""SoftDeDup reweighting (operators/sampling.softdedup_weights,
suite q346): duplicated content is down-weighted proportionally, not
dropped."""

from __future__ import annotations

from aden_hive_fork_spark.operators.sampling import softdedup_weights


def _rows(out):
    return {
        r[0]: (r["n_grams"], r["commonness"], r["weight"])
        for r in out.collect()
    }


def test_exact_triplicate_weights_one_third(spark):
    """Three byte-identical docs: every gram occurs 3x corpus-wide ->
    commonness 3.0, weight 1/3; a unique doc keeps weight 1.0. The
    expected total contribution of the duplicated content (3 copies x
    1/3) equals one unique copy."""
    t = " ".join(f"tok{i}" for i in range(12))
    u = " ".join(f"uniq{i}" for i in range(12))
    df = spark.createDataFrame(
        [(1, t), (2, t), (3, t), (4, u)], "doc_id bigint, text string"
    )
    got = _rows(softdedup_weights(df, n=8))
    for i in (1, 2, 3):
        assert got[i] == (5, 3.0, 0.333333)
    assert got[4] == (5, 1.0, 1.0)


def test_partial_duplication_interpolates(spark):
    """A doc that is half-shared, half-unique lands strictly between
    weight 1/2 and 1.0 — soft, not a drop decision."""
    shared = " ".join(f"s{i}" for i in range(20))
    a = shared + " " + " ".join(f"a{i}" for i in range(20))
    b = shared + " " + " ".join(f"b{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id bigint, text string"
    )
    got = _rows(softdedup_weights(df, n=8))
    for i in (1, 2):
        n_grams, c, w = got[i]
        assert n_grams == 33
        assert 1.0 < c < 2.0 and 0.5 < w < 1.0


def test_short_and_self_repeat_docs(spark):
    """< n tokens -> commonness 1.0 (nothing to count); a within-doc
    self-repeat raises its own commonness (concatenated-corpus
    counting, consistent with q345)."""
    phrase = " ".join(f"p{i}" for i in range(8))
    df = spark.createDataFrame(
        [(1, "tiny"), (2, phrase + " " + phrase)],
        "doc_id bigint, text string",
    )
    got = _rows(softdedup_weights(df, n=8))
    assert got[1] == (0, 1.0, 1.0)
    assert got[2][1] > 1.0 and got[2][2] < 1.0


def test_python_differential(spark):
    import random

    rng = random.Random(346)
    vocab = [f"w{i}" for i in range(9)]
    docs = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 25)))
        for i in range(50)
    }
    n = 5
    cnt: dict[str, int] = {}
    toks = {i: t.split(" ") for i, t in docs.items()}
    for ws in toks.values():
        for p in range(len(ws) - n + 1):
            g = " ".join(ws[p : p + n])
            cnt[g] = cnt.get(g, 0) + 1

    import math

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    want = {}
    for i, ws in toks.items():
        gs = [" ".join(ws[p : p + n]) for p in range(len(ws) - n + 1)]
        if not gs:
            want[i] = (0, 1.0, 1.0)
        else:
            c = r6(sum(cnt[g] for g in gs) / len(gs))
            want[i] = (len(gs), c, r6(1.0 / c))
    df = spark.createDataFrame(
        list(docs.items()), "doc_id bigint, text string"
    )
    got = _rows(softdedup_weights(df, n=n))
    assert got == want
