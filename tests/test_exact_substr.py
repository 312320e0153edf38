"""ExactSubstr repeated-substring removal
(operators/dedup.trim_repeated_passages, suite q343): bite tests,
edge cases, and a pure-Python differential replay."""

from __future__ import annotations

import random

from aden_hive_fork_spark.operators.dedup import trim_repeated_passages


def _rows(out):
    return {
        r[0]: (r["text"], r["n_tokens_removed"]) for r in out.collect()
    }


def test_bite_middle_run_removed_exactly(spark):
    """Two docs share a middle 60-word run; removal strips exactly
    that run from BOTH, keeping the distinct prefix/suffix tokens; a
    third unrelated doc is untouched."""
    run = " ".join(f"dup{i}" for i in range(60))
    a = "alpha one two three " + run + " omega four five"
    b = "beta six seven " + run + " gamma eight"
    c = "unrelated words only here nothing shared at all"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id bigint, text string"
    )
    got = _rows(trim_repeated_passages(df, "doc_id", "text", n=8))
    assert got[1] == ("alpha one two three omega four five", 60)
    assert got[2] == ("beta six seven gamma eight", 60)
    assert got[3] == (c, 0)


def test_short_docs_and_min_docs_respected(spark):
    """Docs shorter than n pass through unchanged even if identical
    (no n-gram exists); a run duplicated in only ONE doc's corpus
    position is kept when min_docs isn't met."""
    df = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc"), (3, "a b c d e f g h i")],
        "doc_id bigint, text string",
    )
    got = _rows(trim_repeated_passages(df, "doc_id", "text", n=8))
    assert got[1] == ("tiny doc", 0)
    assert got[2] == ("tiny doc", 0)
    assert got[3] == ("a b c d e f g h i", 0)


def test_overlapping_hot_spans_merge(spark):
    """Two hot 8-gram families overlapping inside one doc remove the
    union of their covered positions (per-position coverage IS the
    span merge)."""
    s1 = " ".join(f"x{i}" for i in range(8))      # tokens 1-8
    s2 = " ".join(f"x{i}" for i in range(4, 12))  # tokens 5-12
    doc = s1 + " " + " ".join(f"x{i}" for i in range(8, 12)) + " tail"
    # doc tokens: x0..x11 tail -> s1 at pos 1, s2 at pos 5
    df = spark.createDataFrame(
        [(1, doc), (2, s1), (3, s2)], "doc_id bigint, text string"
    )
    got = _rows(trim_repeated_passages(df, "doc_id", "text", n=8))
    assert got[1] == ("tail", 12)
    assert got[2] == ("", 8)
    assert got[3] == ("", 8)


def test_self_repeat_alone_is_not_hot(spark):
    """A doc spamming its own phrase cannot hot-list itself: the
    document-frequency count is distinct-per-doc."""
    phrase = " ".join(f"p{i}" for i in range(8))
    df = spark.createDataFrame(
        [(1, phrase + " mid " + phrase), (2, "other words here")],
        "doc_id bigint, text string",
    )
    got = _rows(trim_repeated_passages(df, "doc_id", "text", n=8))
    assert got[1][1] == 0


def _py_replay(docs: dict[int, str], n: int, min_docs: int):
    toks = {i: t.strip().split(" ") for i, t in docs.items()}
    seen: dict[str, set[int]] = {}
    for i, ws in toks.items():
        for p in range(len(ws) - n + 1):
            seen.setdefault(" ".join(ws[p : p + n]), set()).add(i)
    hot = {g for g, ds in seen.items() if len(ds) >= min_docs}
    out = {}
    for i, ws in toks.items():
        covered = set()
        for p in range(len(ws) - n + 1):
            if " ".join(ws[p : p + n]) in hot:
                covered.update(range(p, p + n))
        kept = [w for q, w in enumerate(ws) if q not in covered]
        out[i] = (" ".join(kept), len(ws) - len(kept))
    return out


def test_differential_vs_python_replay(spark):
    """Random word soup from a 10-word vocabulary (seeded): the Spark
    plan must equal the direct Python replay doc-for-doc."""
    rng = random.Random(343)
    vocab = [f"w{i}" for i in range(10)]
    docs = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30)))
        for i in range(60)
    }
    df = spark.createDataFrame(
        list(docs.items()), "doc_id bigint, text string"
    )
    for n, md in [(4, 2), (6, 3)]:
        got = _rows(trim_repeated_passages(df, "doc_id", "text", n=n,
                                           min_docs=md))
        assert got == _py_replay(docs, n, md)


def test_occurrence_mode_removes_self_repeats(spark):
    """count_mode='occurrences' (the paper's concatenated-corpus
    counting): a doc repeating its own 8-token run loses BOTH copies,
    while docs mode keeps them (self-repeats can't hot-list)."""
    phrase = " ".join(f"p{i}" for i in range(8))
    df = spark.createDataFrame(
        [(1, phrase + " mid " + phrase), (2, "other words here")],
        "doc_id bigint, text string",
    )
    occ = _rows(trim_repeated_passages(df, "doc_id", "text", n=8,
                                       count_mode="occurrences"))
    assert occ[1] == ("mid", 16)
    assert occ[2] == ("other words here", 0)
    docs = _rows(trim_repeated_passages(df, "doc_id", "text", n=8,
                                        count_mode="docs"))
    assert docs[1][1] == 0


def test_occurrence_mode_differential_vs_python(spark):
    """Seeded word-soup differential for the occurrence counter."""
    import random

    rng = random.Random(345)
    vocab = [f"w{i}" for i in range(8)]
    docs = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 25)))
        for i in range(50)
    }

    def replay(n, min_count):
        toks = {i: t.strip().split(" ") for i, t in docs.items()}
        cnt: dict[str, int] = {}
        for ws in toks.values():
            for p in range(len(ws) - n + 1):
                g = " ".join(ws[p : p + n])
                cnt[g] = cnt.get(g, 0) + 1
        hot = {g for g, c in cnt.items() if c >= min_count}
        out = {}
        for i, ws in toks.items():
            covered = set()
            for p in range(len(ws) - n + 1):
                if " ".join(ws[p : p + n]) in hot:
                    covered.update(range(p, p + n))
            kept = [w for q, w in enumerate(ws) if q not in covered]
            out[i] = (" ".join(kept), len(ws) - len(kept))
        return out

    df = spark.createDataFrame(
        list(docs.items()), "doc_id bigint, text string"
    )
    got = _rows(trim_repeated_passages(df, "doc_id", "text", n=5,
                                       min_docs=3,
                                       count_mode="occurrences"))
    assert got == replay(5, 3)


def test_count_mode_validation(spark):
    import pytest

    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="count_mode"):
        trim_repeated_passages(df, "doc_id", "text", count_mode="bogus")
