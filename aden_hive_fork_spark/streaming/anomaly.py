"""Streaming twin of ``operators/timeseries.rolling_zscore``: trailing
-window z-score anomaly flags over a LIVE keyed stream, via
``applyInPandasWithState`` (the custom-stateful-operator surface the
reference exposes through its event loop; same seam as
``streaming/stateful.running_user_state``).

Per-key state = the trailing ``window - 1`` values (a bounded
array<double> in the state store — RocksDB/HDFS-backed on a
cluster). Each arriving observation completes a window, is scored
with the SAME mean/population-std/round-then-compare formula as the
batch operator, and slides the buffer. Memory is O(window) per key,
independent of stream length — the state never grows.

Ordering contract: rows are sorted by the order column INSIDE each
micro-batch (Arrow chunks of one group are concatenated first, so
chunk boundaries can't reorder); across micro-batches the source
must deliver a key's data in order (file-sequence sources and
watermarked, sorted upstreams qualify). Out-of-order delivery across
batches scores against the wrong trailing window — the same contract
every streaming LOCF/gapfill operator carries.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_zscore(
    stream: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    window: int = 28,
    z_threshold: float = 3.0,
    ndigits: int = 6,
) -> DataFrame:
    """Transform a streaming frame into the stream of anomaly rows
    ``(key, t, value, z)`` — only full-window observations with
    ``|z| > z_threshold`` are emitted, matching the batch operator's
    output row-for-row on ordered input."""
    if window < 2:
        raise ValueError("window must be >= 2")
    out_schema = (
        f"{key_col} string, t string, value double, z double"
    )
    state_schema = "vals array<double>"
    w, thr = int(window), float(z_threshold)

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (k,) = key
        buf: list[float] = list(state.get[0]) if state.exists else []
        chunks = [p for p in pdfs if not p.empty]
        if not chunks:
            if state.exists:
                state.update((buf,))
            return
        pdf = pd.concat(chunks).sort_values(order_col)
        out = []
        for t, x in zip(pdf[order_col], pdf[value_col]):
            x = float(x)
            if len(buf) == w - 1:
                vals = buf + [x]
                s1 = 0.0
                s2 = 0.0
                for v in vals:  # fixed fold order — deterministic
                    s1 += v
                    s2 += v * v
                mean = s1 / w
                var = s2 / w - mean * mean
                std = (var if var > 0.0 else 0.0) ** 0.5
                if std > 0.0:
                    z = round((x - mean) / std, ndigits)
                    if abs(z) > thr:
                        out.append((k, str(t), x, z))
            buf.append(x)
            if len(buf) > w - 1:
                buf = buf[-(w - 1):]
        state.update((buf,))
        if out:
            yield pd.DataFrame(out, columns=[key_col, "t", "value", "z"])

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
