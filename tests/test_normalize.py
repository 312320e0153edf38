"""operators/normalize (suite q342, pipeline stage 1b): the Spark
Arrow kernel, the pure-Python reference, and the DuckDB oracle
expression must agree byte-for-byte; chars are CODEPOINTS."""

from __future__ import annotations

import duckdb
import pytest

from aden_hive_fork_spark.operators.normalize import (
    normalize_corpus,
    normalize_sql_expr,
    normalize_text,
)

TRICKY = [
    "plain ascii",
    "  leading and trailing   ",
    "tab\tand\nnewline\r\nmix",
    "NFD: é vs NFC: é",
    "zero​width‌join‍er⁠bom﻿",
    "ctrlcharshere",
    "spaces    　everywhere",
    "emoji \U0001f600 survives",
    "​ \t ",  # normalizes to empty
    "",
    "line and paragraph",
]


def test_python_reference_properties():
    assert normalize_text("plain ascii") == "plain ascii"
    assert normalize_text("  a   b  ") == "a b"
    assert normalize_text("é") == "é"  # NFC composes
    assert normalize_text("a​b") == "ab"
    assert normalize_text("​ \t") == ""
    assert normalize_text(None) is None
    # idempotent
    for t in TRICKY:
        once = normalize_text(t)
        assert normalize_text(once) == once


def test_duckdb_oracle_expression_matches_python():
    con = duckdb.connect()
    for t in TRICKY:
        sql = f"SELECT {normalize_sql_expr('?')}"
        got = con.execute(sql, [t]).fetchone()[0]
        assert got == normalize_text(t), repr(t)


def test_spark_kernel_matches_python_and_counts_codepoints(spark):
    rows = [(i, t, -1) for i, t in enumerate(TRICKY)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, n_chars bigint"
    )
    out = {
        r["doc_id"]: (r["text"], r["n_chars"])
        for r in normalize_corpus(df).collect()
    }
    for i, t in enumerate(TRICKY):
        want = normalize_text(t)
        if want == "":
            assert i not in out  # drop_empty
        else:
            assert out[i][0] == want, repr(t)
            assert out[i][1] == len(want)  # codepoints: emoji == 1
    # the emoji row proves codepoint (not UTF-16) counting
    emoji_i = TRICKY.index("emoji \U0001f600 survives")
    assert out[emoji_i][1] == len(normalize_text(TRICKY[emoji_i]))


def test_drop_empty_false_keeps_empty_rows(spark):
    df = spark.createDataFrame(
        [(1, "​ ", 5), (2, "keep", 4)],
        "doc_id bigint, text string, n_chars bigint",
    )
    out = {
        r["doc_id"]: (r["text"], r["n_chars"])
        for r in normalize_corpus(df, drop_empty=False).collect()
    }
    assert out[1] == ("", 0)
    assert out[2] == ("keep", 4)


def test_extra_columns_carried_through(spark):
    df = spark.createDataFrame(
        [(1, " a  b ", 9, "en", "web")],
        "doc_id bigint, text string, n_chars bigint, lang string,"
        " source string",
    )
    r = normalize_corpus(df).collect()[0]
    assert (r["text"], r["n_chars"], r["lang"], r["source"]) == (
        "a b", 3, "en", "web",
    )


def test_drop_empty_keeps_null_text_rows(spark):
    """ADVICE r12: NULL text stays NULL and is KEPT under drop_empty
    (length(NULL) is NULL, so the naive length>0 filter silently
    dropped those rows, contradicting the documented contract)."""
    from aden_hive_fork_spark.operators.normalize import normalize_corpus

    df = spark.createDataFrame(
        [(1, "ok", 0), (2, None, 0), (3, "​  ", 0)],
        "doc_id bigint, text string, n_chars bigint",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in normalize_corpus(df).collect()
    }
    assert out == {1: "ok", 2: None}  # 3 normalizes empty -> dropped
