"""Full Gopher rule set (operators/quality.gopher_quality_signals,
suite q344): one bite test per rule, zero-word edge, and the
pipeline stage-3b option."""

from __future__ import annotations

from aden_hive_fork_spark.operators.quality import (
    GOPHER_STOPWORDS,
    gopher_quality_signals,
)

GOOD = (
    "the quick brown fox jumps over that lazy dog and all of the "
    "other animals have been seen running with great speed through "
    "many fields and the forest paths while birds that sing above "
    "keep watch over the scene with patient eyes and careful note "
    "of every movement below them in the tall green summer grass"
)  # 59 words, all alphabetic, plenty of stopwords


def _one(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    return gopher_quality_signals(df, **kw).collect()[0]


def test_good_doc_passes_all_rules(spark):
    r = _one(spark, GOOD)
    assert r["gopher_pass"] == 1
    for f in ("pass_words", "pass_mean_word_len", "pass_symbol",
              "pass_bullet", "pass_ellipsis", "pass_alpha",
              "pass_stopwords"):
        assert r[f] == 1, f


def test_word_count_bounds_bite(spark):
    assert _one(spark, "too short to pass")["pass_words"] == 0
    assert _one(spark, GOOD, max_words=50)["pass_words"] == 0
    assert _one(spark, GOOD, min_words=10)["pass_words"] == 1


def test_mean_word_length_bites_both_ways(spark):
    short = " ".join(["a b c d"] * 20)
    assert _one(spark, short)["pass_mean_word_len"] == 0  # mean 1.0
    long = " ".join(["extraordinarily incomprehensibilities"] * 30)
    assert _one(spark, long)["pass_mean_word_len"] == 0  # mean > 10
    assert _one(spark, GOOD)["pass_mean_word_len"] == 1


def test_symbol_ratio_bites(spark):
    r = _one(spark, GOOD + " # # # # # # #")
    assert r["symbol_ratio"] > 0.1 and r["pass_symbol"] == 0
    r2 = _one(spark, GOOD + " trailing dots everywhere... more... yes...")
    assert r2["symbol_ratio"] == round(3 / 62, 6) or r2["symbol_ratio"] > 0
    uni = _one(spark, GOOD + " …")
    assert uni["symbol_ratio"] > 0.0  # one-char ellipsis counted


def test_bullet_fraction_bites(spark):
    bullets = "\n".join(f"- point {i} here" for i in range(10))
    r = _one(spark, bullets)
    assert r["bullet_frac"] == 1.0 and r["pass_bullet"] == 0
    mixed = bullets + "\n" + "\n".join(["a plain prose line"] * 10)
    assert _one(spark, mixed)["pass_bullet"] == 1  # 0.5 <= 0.9
    star = _one(spark, "* starred item\nplain")
    assert star["bullet_frac"] == 0.5
    dot = _one(spark, "• unicode bullet\nplain")
    assert dot["bullet_frac"] == 0.5


def test_ellipsis_fraction_bites(spark):
    lines = "\n".join(["this line trails off..."] * 4 + ["solid line"] * 4)
    r = _one(spark, lines)
    assert r["ellipsis_frac"] == 0.5 and r["pass_ellipsis"] == 0
    uni = _one(spark, "trails…\nsolid\nsolid\nsolid\nsolid")
    assert uni["ellipsis_frac"] == 0.2 and uni["pass_ellipsis"] == 1


def test_alpha_fraction_bites(spark):
    nums = " ".join(str(i) for i in range(40)) + " one two three"
    r = _one(spark, nums)
    assert r["pass_alpha"] == 0
    assert _one(spark, GOOD)["alpha_frac"] == 1.0


def test_stopword_presence_bites(spark):
    none = " ".join(["alpha beta gamma delta"] * 15)
    r = _one(spark, none)
    assert r["stop_hits"] == 0 and r["pass_stopwords"] == 0
    one = none + " the"
    assert _one(spark, one)["stop_hits"] == 1
    assert _one(spark, GOOD)["stop_hits"] >= 2
    assert len(GOPHER_STOPWORDS) == 8


def test_zero_word_doc_fails_cleanly(spark):
    r = _one(spark, "   ")
    assert r["n_words"] == 0 and r["gopher_pass"] == 0
    assert r["mean_word_len"] == 0.0 and r["alpha_frac"] == 0.0


def test_pipeline_stage3b_option(spark):
    """gopher=True inserts stage 3b after the repetition filter; a
    crafted stopword-free doc survives stage 3 but dies at 3b, and
    the DEFAULT chain is unchanged (no 3b key, same stage names)."""
    from aden_hive_fork_spark.operators.pretrain_pipeline import (
        pretrain_pipeline_stages,
    )

    bad = " ".join(f"tok{i % 23}xq" for i in range(80))  # no stopwords
    rows = [(i, GOOD + f" filler{i} extra{i * 7} more{i * 13}",
             "en", f"src{i % 3}", len(GOOD)) for i in range(12)]
    rows.append((99, bad, "en", "src0", len(bad)))
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    )
    default = pretrain_pipeline_stages(df)
    assert "3b_gopher" not in default
    got = pretrain_pipeline_stages(df, gopher=True)
    assert list(got)[:5] == [
        "1_base", "1b_normalize", "2_langid", "3_quality", "3b_gopher",
    ]
    s3_ids = {r["doc_id"] for r in got["3_quality"].collect()}
    s3b_ids = {r["doc_id"] for r in got["3b_gopher"].collect()}
    if 99 in s3_ids:  # survived langid + repetition
        assert 99 not in s3b_ids  # bitten by the stopword rule
    assert s3b_ids <= s3_ids
