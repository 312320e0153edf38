"""Custom stateful streaming operator via applyInPandasWithState.

The live twin of the keyed shared state (reference SharedStateManager,
core/framework/runtime/shared_state.py:152-278): per-key state that
survives across micro-batches, updated as events arrive. Spark keeps
the state in its state store (RocksDB/HDFS-backed on a cluster),
keyed by the groupBy key — per-key serialization gives the
SYNCHRONIZED isolation level for free.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, n_events long, total_value double, last_event_type string"
# "last" must be ORDER-CORRECT across chunks and micro-batches, so the
# state carries the (ts, event_id) key of the winner — comparing only
# within the current chunk would silently report the last chunk's max
# instead of the global max whenever a group spans Arrow chunks
# (maxRecordsPerBatch) or events arrive out of order across batches.
STATE_SCHEMA = "n long, total double, last_us long, last_eid long, last string"


def _update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last_us, last_eid, last = state.get
    else:
        n, total, last_us, last_eid, last = 0, 0.0, None, None, None
    for pdf in pdfs:
        if pdf.empty:
            continue
        n += len(pdf)
        total += float(pdf["value"].sum())
        top = pdf.sort_values(["ts", "event_id"]).iloc[-1]
        top_us = int(top["ts"].value // 1000)  # pandas Timestamp -> epoch us
        top_eid = int(top["event_id"])
        if last_us is None or (top_us, top_eid) > (last_us, last_eid):
            last_us, last_eid = top_us, top_eid
            last = str(top["event_type"])
    state.update((n, total, last_us, last_eid, last))
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "total_value": round(total, 2),
          "last_event_type": last}]
    )


def running_user_state(events: DataFrame) -> DataFrame:
    """Running per-user counters (count, value sum, last event type),
    maintained in keyed state across micro-batches. Output mode:
    update."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
