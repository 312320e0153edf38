"""Streaming langid profile maintenance: streamed counts == batch
langid_profiles bit-exact, replay idempotence, classify integration,
real readStream end-to-end."""

from __future__ import annotations

import pytest

from aden_hive_fork_spark.operators.langid import (
    langid_classify,
    langid_profiles,
)
from aden_hive_fork_spark.streaming.langid_stream import (
    init_langid_profiles,
    merge_langid_batch,
    read_profiles,
)
from tests.test_langid import _DE, _EN, _FR

SCHEMA = "doc_id bigint, text string, lang string"


def _rows():
    rows = []
    i = 0
    for lang, texts in (("en", _EN), ("de", _DE), ("fr", _FR)):
        for t in texts:
            rows.append((i, t, lang))
            i += 1
    return rows


def test_streamed_profiles_equal_batch(spark, tmp_path):
    path = str(tmp_path / "prof")
    init_langid_profiles(spark, path, profile_size=150)
    rows = _rows()
    # three arbitrary batches
    for bid, chunk in enumerate((rows[:5], rows[5:12], rows[12:])):
        merge_langid_batch(
            spark.createDataFrame(chunk, SCHEMA), bid, path
        )
    streamed = {
        (r["lang"], r["gram"]): (r["rank"], r["gram_count"])
        for r in read_profiles(spark, path).collect()
    }
    batch = {
        (r["lang"], r["gram"]): (r["rank"], r["gram_count"])
        for r in langid_profiles(
            spark.createDataFrame(rows, SCHEMA), profile_size=150
        ).collect()
    }
    assert streamed == batch  # dict equality: bit-exact


def test_replay_noop_and_classify_integration(spark, tmp_path):
    path = str(tmp_path / "prof")
    init_langid_profiles(spark, path, profile_size=150)
    df = spark.createDataFrame(_rows(), SCHEMA)
    merge_langid_batch(df, 0, path)
    before = read_profiles(spark, path).count()
    merge_langid_batch(df, 0, path)  # replay must not double counts
    after = read_profiles(spark, path).collect()
    assert len(after) == before
    # live profiles feed the classifier unchanged
    test_docs = spark.createDataFrame(
        [(100, "der schnelle fuchs springt ueber den hund")],
        "doc_id bigint, text string",
    )
    out = langid_classify(
        test_docs, read_profiles(spark, path), profile_size=150
    ).collect()
    assert out[0]["pred_lang"] == "de"


def test_merge_without_init_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        merge_langid_batch(
            spark.createDataFrame(_rows()[:2], SCHEMA),
            0,
            str(tmp_path / "nope"),
        )


def test_streaming_source_end_to_end(spark, tmp_path):
    import json as _json
    import os

    from aden_hive_fork_spark.streaming.langid_stream import (
        maintain_langid_profiles,
    )

    path, ckpt, in_dir = (str(tmp_path / d) for d in ("prof", "ckpt", "in"))
    init_langid_profiles(spark, path, profile_size=100)
    os.makedirs(in_dir, exist_ok=True)
    with open(os.path.join(in_dir, "b1.json"), "w") as fh:
        for doc_id, text, lang in _rows():
            fh.write(
                _json.dumps({"doc_id": doc_id, "text": text, "lang": lang})
                + "\n"
            )
    st = spark.readStream.schema(SCHEMA).json(in_dir)
    maintain_langid_profiles(st, path, ckpt).awaitTermination(120)
    live = read_profiles(spark, path)
    assert live.count() > 0
    assert set(r["lang"] for r in live.select("lang").distinct().collect()) == {
        "en", "de", "fr",
    }
