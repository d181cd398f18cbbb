"""Custom STATEFUL streaming operator: gap-based sessionization via
``applyInPandasWithState`` — the Structured Streaming seam for
operators the built-in window aggs can't express (a session's length
is data-dependent, unlike fixed windows).

State per user = the currently-open session (start, last event ts,
count, value sum), held in the state store across micro-batches. Each
batch folds its (sorted) events into the open session: a gap larger
than ``gap_seconds`` CLOSES the session (emitted downstream) and opens
a new one. Closed sessions are exactly those the batch twin
(operators/sessions.sessionize_batch) computes over the concatenated
input — pinned by tests/test_streaming.py.

Scale shape: state is O(active users), each entry 4 scalars; the
per-batch work is one sorted fold per user with events arriving
already grouped by the state machinery.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

# open session: start_epoch_us, last_epoch_us, n_events, total_value
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _make_fold(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def fold(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start_us, last_us, n, total = state.get
        else:
            start_us = last_us = None
            n, total = 0, 0.0
        closed = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"], kind="stable")
            for ts, val in zip(pdf["ts"], pdf["value"]):
                ts_us = int(ts.value // 1000)  # pandas ns -> us
                if last_us is not None and ts_us - last_us > gap_us:
                    closed.append(
                        (user_id, start_us, last_us, n, round(total, 6))
                    )
                    start_us, n, total = ts_us, 0, 0.0
                if start_us is None:
                    start_us = ts_us
                last_us = ts_us
                n += 1
                total += float(val)
        state.update((start_us, last_us, n, total))
        if closed:
            out = pd.DataFrame(
                closed,
                columns=[
                    "user_id", "start_us", "last_us", "n_events", "total_value"
                ],
            )
            yield pd.DataFrame(
                {
                    "user_id": out["user_id"].astype("int64"),
                    "session_start": pd.to_datetime(out["start_us"], unit="us"),
                    "session_end": pd.to_datetime(out["last_us"], unit="us"),
                    "n_events": out["n_events"].astype("int64"),
                    "total_value": out["total_value"],
                }
            )

    return fold


def sessionize_stream(
    events_stream: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """events (streaming; user_id, event_id, ts, value) -> CLOSED
    sessions as they are detected. The still-open session per user
    stays in the state store (it closes when a later batch brings an
    event past the gap — or at stream end by a final sentinel batch,
    the standard pattern)."""
    return (
        events_stream.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_fold(gap_seconds),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            "NoTimeout",
        )
    )
