"""Regression tests for the round-11 ADVICE fixes: viterbi_segment's
loud vocabulary-coverage guard, the fetch_urls transport-envelope
allowlist, _LinkExtractor anchor nesting, the unsorted near-dup pair
scorer, and the pretrain stream's census_every throttle."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def sp():
    from aden_hive_fork_spark.session import build_session

    return build_session(
        app_name="r11-fixes", cpus=4, shuffle_partitions=5
    )


# ---------------------------------------------------------------------------
# viterbi_segment: a word containing a character the vocab misses used
# to (a) silently drop at the inner candidate join when NO substring
# matched, or (b) backtrack through bp=0 and emit empty pieces at a
# ~-1e300 score. Both now fail loudly via assert_true.
# ---------------------------------------------------------------------------


def _words(sp, items):
    return sp.createDataFrame(items, "word string, freq bigint")


def _vocab(sp, toks):
    return sp.createDataFrame(
        [(t, -1.5) for t in toks], "token string, logp double"
    )


def test_viterbi_covered_word_still_segments(sp):
    from aden_hive_fork_spark.operators.unigram_lm import viterbi_segment

    out = viterbi_segment(
        _words(sp, [("abab", 3)]),
        _vocab(sp, ["a", "b", "ab"]),
        max_piece_len=2,
    ).collect()
    assert len(out) == 1
    assert out[0]["pieces"] == "ab ab"
    assert out[0]["n_pieces"] == 2
    assert out[0]["score"] == pytest.approx(-3.0)


def test_viterbi_uncovered_char_fails_loudly(sp):
    from aden_hive_fork_spark.operators.unigram_lm import viterbi_segment

    seg = viterbi_segment(
        _words(sp, [("axb", 1)]),
        _vocab(sp, ["a", "b"]),  # no 'x'
        max_piece_len=2,
    )
    with pytest.raises(Exception, match="does not cover"):
        seg.collect()


def test_viterbi_fully_unmatched_word_fails_instead_of_dropping(sp):
    from aden_hive_fork_spark.operators.unigram_lm import viterbi_segment

    seg = viterbi_segment(
        _words(sp, [("zzz", 1)]),
        _vocab(sp, ["a", "b"]),
        max_piece_len=2,
    )
    with pytest.raises(Exception, match="does not cover"):
        seg.collect()


# ---------------------------------------------------------------------------
# fetch_urls: the transport envelope may only override
# status/content_type/body/error — a buggy fixture returning 'url'
# (the documented join-back key) or n_bytes/truncated must not desync
# result rows from input rows.
# ---------------------------------------------------------------------------


def test_fetch_urls_envelope_allowlist(sp):
    from aden_hive_fork_spark.sources.http_source import fetch_urls

    urls = sp.createDataFrame(
        [("http://a.example/page",)], "url string"
    )
    out = fetch_urls(
        urls,
        transport_factory=lambda: (
            lambda u: {
                "status": 200,
                "body": "hello",
                "url": "http://EVIL.example/other",
                "n_bytes": 9999,
                "truncated": True,
            }
        ),
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["url"] == "http://a.example/page"  # join-back key intact
    assert r["status"] == 200
    assert bytes(r["body"]) == b"hello"
    assert r["n_bytes"] == 5  # derived from body, not fixture-spoofed
    assert r["truncated"] is False


# ---------------------------------------------------------------------------
# _LinkExtractor: nested / href-less anchors.
# ---------------------------------------------------------------------------


def test_html_links_nested_hrefless_anchor_keeps_text():
    from aden_hive_fork_spark.sources.html_source import html_links

    links = html_links('<a href="/x">one <a>inner</a> two</a>')
    assert links == [{"href": "/x", "text": "one inner two"}]


def test_html_links_hrefless_anchor_after_link_leaks_nothing():
    from aden_hive_fork_spark.sources.html_source import html_links

    links = html_links('<a href="/x">link</a><a>stray</a> tail')
    assert links == [{"href": "/x", "text": "link"}]


def test_html_links_plain_still_works():
    from aden_hive_fork_spark.sources.html_source import html_links

    links = html_links(
        '<p>pre</p><a href="/a">A</a> mid <a href="/b">B</a>'
    )
    assert links == [
        {"href": "/a", "text": "A"},
        {"href": "/b", "text": "B"},
    ]


# ---------------------------------------------------------------------------
# cosine_neardup_pairs_exact_unsorted: same SET of rows as the sorted
# public scorer (the presentation orderBy is the only difference).
# ---------------------------------------------------------------------------


def test_unsorted_pair_scorer_same_set(sp):
    from aden_hive_fork_spark.operators.similarity import (
        cosine_neardup_pairs_exact,
        cosine_neardup_pairs_exact_unsorted,
    )

    emb = sp.createDataFrame(
        [
            (1, 0, [1.0, 0.0, 0.0]),
            (2, 0, [0.9, 0.1, 0.0]),
            (3, 0, [0.0, 1.0, 0.0]),
            (4, 1, [0.5, 0.5, 0.0]),
            (5, 1, [0.5, 0.49, 0.0]),
        ],
        "vec_id long, label int, embedding array<double>",
    )
    srt = cosine_neardup_pairs_exact(emb, threshold=0.9).collect()
    uns = cosine_neardup_pairs_exact_unsorted(emb, threshold=0.9).collect()
    key = lambda r: (r["id_a"], r["id_b"], r["cosine"])  # noqa: E731
    assert sorted(map(key, srt)) == sorted(map(key, uns))
    assert len(srt) > 0
    # sorted variant is ordered by cosine desc
    cosines = [r["cosine"] for r in srt]
    assert cosines == sorted(cosines, reverse=True)


# ---------------------------------------------------------------------------
# pretrain stream census_every: corpus merges every batch; the census
# recompute runs only on every Nth generation, and census_version in
# the pointer tracks which generation the visible census belongs to.
# ---------------------------------------------------------------------------


def test_pretrain_stream_census_every(sp, tmp_path):
    import os

    from aden_hive_fork_spark.operators.layout import read_pointer
    from aden_hive_fork_spark.operators.pretrain_pipeline import (
        pretrain_pipeline_census,
    )
    from aden_hive_fork_spark.streaming.pretrain_stream import (
        init_pretrain_pipeline,
        merge_pretrain_batch,
        read_census,
        read_corpus,
    )

    path = str(tmp_path / "pp")
    init_pretrain_pipeline(sp, path)

    def batch(ids):
        return sp.createDataFrame(
            [
                (i, f"doc text number {i} alpha beta", "en", "web", 30)
                for i in ids
            ],
            "doc_id bigint, text string, lang string, source string,"
            " n_chars bigint",
        )

    merge_pretrain_batch(batch([1, 2]), 0, path, census_every=2)
    ptr = read_pointer(path)
    assert ptr["version"] == 1
    assert ptr["census_version"] == 0  # v1 skipped the recompute
    assert read_census(sp, path).count() == 0  # generation-0 census

    merge_pretrain_batch(batch([3, 4]), 1, path, census_every=2)
    ptr = read_pointer(path)
    assert ptr["version"] == 2
    assert ptr["census_version"] == 2  # epoch hit: recomputed at v2
    got = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in read_census(sp, path).collect()
    }
    want = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in pretrain_pipeline_census(read_corpus(sp, path)).collect()
    }
    assert got == want  # census consistent with v2's corpus

    merge_pretrain_batch(batch([5]), 2, path, census_every=2)
    ptr = read_pointer(path)
    assert ptr["version"] == 3
    assert ptr["census_version"] == 2  # carried forward
    assert read_corpus(sp, path).count() == 5  # corpus still merged
    # v3 wrote no census directory
    assert not os.path.exists(os.path.join(path, "v=3", "census"))

    # replay of batch 2 is a no-op
    merge_pretrain_batch(batch([5]), 2, path, census_every=2)
    assert read_pointer(path)["version"] == 3

    with pytest.raises(ValueError):
        merge_pretrain_batch(batch([9]), 3, path, census_every=0)


def test_html_links_nested_href_anchor_text_attribution():
    """ADVICE r12: text after a CLOSED nested href link belongs to the
    still-open OUTER link, not the closed inner one."""
    from aden_hive_fork_spark.sources.html_source import html_links

    links = html_links('<a href="1">A<a href="2">B</a>C</a>')
    assert links == [
        {"href": "1", "text": "AC"},
        {"href": "2", "text": "B"},
    ]
