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


SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.LongType()),
        T.StructField("session_end", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_start", T.LongType()),
        T.StructField("last_ts", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def streaming_sessionizer(
    events_stream: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts_sec",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessionization with custom state — the stateful twin of
    the batch ``session_window_agg`` query (SURVEY §2.9).

    The open session per key lives in the state store across
    micro-batches: an arriving event either extends it (gap not
    exceeded) or closes it — closed sessions are EMITTED, the open one
    is retained. Events are processed in timestamp order within each
    batch; state is O(1) per key (start/last/count/sum), never a row
    buffer. Production pairs this with a watermark on the source and
    GroupStateTimeout to flush idle sessions; the availableNow test
    harness closes sessions with a sentinel event instead.
    """

    def sessionize(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (uid,) = key
        if state.exists:
            start, last, n, total = state.get
        else:
            start, last, n, total = None, None, 0, 0.0
        closed: list[tuple] = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(ts_col)
            for ts, val in zip(pdf[ts_col], pdf[value_col]):
                ts = int(ts)
                if start is None:
                    start, last, n, total = ts, ts, 1, float(val)
                elif ts - last > gap_seconds:
                    closed.append((uid, start, last, n, total))
                    start, last, n, total = ts, ts, 1, float(val)
                else:
                    last, n, total = ts, n + 1, total + float(val)
        if start is not None:
            state.update((start, last, n, total))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id", "session_start", "session_end", "n_events", "sum_value",
                ],
            )

    return events_stream.groupBy(key_col).applyInPandasWithState(
        sessionize,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FUNNEL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("funnel_depth", T.IntegerType()),
        T.StructField("t_prev", T.LongType()),
    ]
)

FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("depth", T.IntegerType()),
        T.StructField("t_prev", T.LongType()),
    ]
)


def streaming_funnel_tracker(
    events_stream: DataFrame,
    stages: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts_sec",
    type_col: str = "event_type",
) -> DataFrame:
    """Stateful twin of the batch ``ext/events.funnel_conversion``:
    each user's greedy first-qualifying stage chain advanced
    incrementally across micro-batches, O(1) state per user
    (current depth + last stage time — never an event buffer).

    Exactness contract: under in-order delivery (each user's events
    non-decreasing in timestamp across batches — the watermark/
    ordered-replay assumption the sessionizer also carries), the
    greedy in-order advance IS the batch min-chain: the first seen
    qualifying stage-k event is the minimal one, so final depths
    replayed == batch funnel counts (asserted by the differential
    test). A late out-of-order stage event can only under-advance,
    never mis-advance.
    """
    n_stages = len(stages)

    def step(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (uid,) = key
        depth, t_prev = state.get if state.exists else (0, -1)
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(ts_col)
            for ts, et in zip(pdf[ts_col], pdf[type_col]):
                if depth < n_stages and et == stages[depth] and (
                    depth == 0 or int(ts) > t_prev
                ):
                    t_prev = int(ts)
                    depth += 1
        state.update((depth, t_prev))
        yield pd.DataFrame(
            {
                "user_id": [uid],
                "funnel_depth": [depth],
                "t_prev": [t_prev],
            }
        )

    return events_stream.groupBy(key_col).applyInPandasWithState(
        step,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
