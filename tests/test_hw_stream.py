"""Streaming Holt-Winters twin: streamed (l, b, ring) state across
micro-batches == batch holt_winters bit-exact (dict equality, the
q252/q304 twin discipline), buffering below 2·period, replay
idempotence, exactly-once pointer commits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aden_hive_fork_spark.operators.timeseries import holt_winters
from aden_hive_fork_spark.streaming.hw_stream import (
    init_holt_winters,
    merge_holt_winters_batch,
    read_holt_winters,
)

SCHEMA = "k bigint, t bigint, x double"


def _series(k: int, n: int):
    # deterministic seasonal-ish series: trend + period-4 wave
    wave = [2.0, 5.0, 3.0, -1.0]
    return [
        (k, t, float(10 + k) + 0.5 * t + wave[t % 4] * (1 + k * 0.1))
        for t in range(n)
    ]


def _rows_df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _init(spark, path, period=4):
    init_holt_winters(
        spark,
        str(path),
        key_cols=["k"],
        order_col="t",
        value_col="x",
        period=period,
        alpha=0.3,
        beta=0.1,
        gamma=0.2,
    )


def test_streamed_equals_batch_bitexact(spark, tmp_path):
    """Three in-order micro-batches splitting two keyed series at
    arbitrary points (mid-buffer, mid-recursion) must reduce to the
    IDENTICAL rows as one batch holt_winters over the union."""
    path = tmp_path / "hw"
    _init(spark, path)
    rows = _series(1, 20) + _series(2, 17)
    rows.sort(key=lambda r: (r[1], r[0]))  # arrival in time order
    cut1, cut2 = 11, 25  # splits keys mid-init and mid-fold
    for bid, chunk in enumerate(
        (rows[:cut1], rows[cut1:cut2], rows[cut2:])
    ):
        merge_holt_winters_batch(
            _rows_df(spark, chunk), bid, str(path)
        )
    streamed = {
        r["k"]: r.asDict()
        for r in read_holt_winters(spark, str(path), horizon=3).collect()
    }
    batch = {
        r["k"]: r.asDict()
        for r in holt_winters(
            _rows_df(spark, rows),
            ["k"],
            "t",
            "x",
            period=4,
            alpha=0.3,
            beta=0.1,
            gamma=0.2,
            horizon=3,
        ).collect()
    }
    assert streamed == batch  # dict equality: bit-exact, not approx


def test_buffering_below_two_periods(spark, tmp_path):
    path = tmp_path / "hw"
    _init(spark, path)
    merge_holt_winters_batch(
        _rows_df(spark, _series(1, 7)), 0, str(path)
    )  # 7 < 2*4 -> still buffering
    assert read_holt_winters(spark, str(path)).count() == 0
    merge_holt_winters_batch(
        _rows_df(spark, _series(1, 9)[7:]), 1, str(path)
    )  # now 9 >= 8 -> initialized
    out = read_holt_winters(spark, str(path)).collect()
    assert len(out) == 1
    assert out[0]["n_obs"] == 9
    batch = holt_winters(
        _rows_df(spark, _series(1, 9)), ["k"], "t", "x", period=4,
        alpha=0.3, beta=0.1, gamma=0.2,
    ).collect()
    assert out[0].asDict() == batch[0].asDict()


def test_replay_is_noop(spark, tmp_path):
    path = tmp_path / "hw"
    _init(spark, path)
    df = _rows_df(spark, _series(1, 12))
    merge_holt_winters_batch(df, 0, str(path))
    before = read_holt_winters(spark, str(path)).collect()
    # replaying batch 0 (or anything <= committed) must change nothing
    merge_holt_winters_batch(df, 0, str(path))
    after = read_holt_winters(spark, str(path)).collect()
    assert [r.asDict() for r in before] == [r.asDict() for r in after]
    assert before[0]["n_obs"] == 12


def test_merge_without_init_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        merge_holt_winters_batch(
            _rows_df(spark, _series(1, 8)), 0, str(tmp_path / "nope")
        )


def test_param_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="period"):
        init_holt_winters(
            spark, str(tmp_path / "a"), ["k"], "t", "x", period=1
        )
    with pytest.raises(ValueError, match="alpha"):
        init_holt_winters(
            spark, str(tmp_path / "b"), ["k"], "t", "x", alpha=0.0
        )
    _init(spark, tmp_path / "c")
    merge_holt_winters_batch(
        _rows_df(spark, _series(1, 12)), 0, str(tmp_path / "c")
    )
    with pytest.raises(ValueError, match="horizon"):
        read_holt_winters(spark, str(tmp_path / "c"), horizon=9)


def test_streaming_source_end_to_end(spark, tmp_path):
    """Through a real readStream + foreachBatch sink (availableNow),
    not just the merge function."""
    import json as _json
    import os

    from aden_hive_fork_spark.streaming.hw_stream import (
        maintain_holt_winters,
    )

    path, ckpt, in_dir = (
        str(tmp_path / d) for d in ("hw", "ckpt", "in")
    )
    _init(spark, path)
    os.makedirs(in_dir, exist_ok=True)
    with open(os.path.join(in_dir, "b1.json"), "w") as fh:
        for k, t, x in _series(5, 15):
            fh.write(_json.dumps({"k": k, "t": t, "x": x}) + "\n")
    st = spark.readStream.schema(SCHEMA).json(in_dir)
    maintain_holt_winters(st, path, ckpt).awaitTermination(120)
    out = read_holt_winters(spark, path).collect()
    assert len(out) == 1
    batch = holt_winters(
        _rows_df(spark, _series(5, 15)), ["k"], "t", "x", period=4,
        alpha=0.3, beta=0.1, gamma=0.2,
    ).collect()
    assert out[0].asDict() == batch[0].asDict()
