"""Marketing-touch attribution over an event stream: for every
conversion event, credit the first and the last qualifying touch
inside a lookback window (the classic first-touch / last-touch
models; multi-touch falls out of the same pair set).

Shape, 100 TB-safe: conversions join candidate touches on the USER
key with a bounded time-range predicate — a keyed equi-join whose
range condition AQE evaluates post-shuffle (the q75 range-join
pattern), never a cross join. Pair volume is bounded by
touches-per-user-per-window, independent of corpus size. Credit
assignment is one window function over the pair set keyed by
conversion id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def touch_attribution(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    conversion_type: str = "purchase",
    lookback_days: int = 7,
) -> DataFrame:
    """Per-channel conversion credit: ``channel, n_first_touch,
    n_last_touch`` — how many conversions each non-conversion event
    type initiated (first touch in the window) vs closed (last touch
    before the conversion). Touch order ties break on ``id_col`` so
    credit is deterministic under equal timestamps. Conversions with
    no qualifying touch are unattributed (dropped — report them from
    the conversion count delta if needed)."""
    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(id_col).alias("_conv_id"),
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_conv_ts"),
    )
    touch = events.filter(F.col(type_col) != conversion_type).select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_touch_ts"),
        F.col(id_col).alias("_touch_id"),
        F.col(type_col).alias("channel"),
    )
    pairs = conv.join(
        touch,
        on=[
            conv["_u"] == touch["_u"],
            touch["_touch_ts"] < conv["_conv_ts"],
            touch["_touch_ts"]
            >= conv["_conv_ts"] - F.expr(f"INTERVAL {int(lookback_days)} DAYS"),
        ],
    )
    w = Window.partitionBy("_conv_id")
    asc = w.orderBy(F.col("_touch_ts").asc(), F.col("_touch_id").asc())
    desc = w.orderBy(F.col("_touch_ts").desc(), F.col("_touch_id").desc())
    credited = pairs.select(
        "channel",
        F.row_number().over(asc).alias("_rn_first"),
        F.row_number().over(desc).alias("_rn_last"),
    )
    return (
        credited.groupBy("channel")
        .agg(
            F.sum(F.when(F.col("_rn_first") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_first_touch"),
            F.sum(F.when(F.col("_rn_last") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_last_touch"),
        )
    )
