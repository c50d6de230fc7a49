"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (SURVEY.md §7E; no counterpart in the
batch-only reference).

A session is a maximal run of a user's events where consecutive events
are no more than ``gap`` apart — the same definition as the batch
``view_sessionize_events`` catalog query, which is the correctness
oracle: every session this operator CLOSES must equal the corresponding
batch session.

State per user: (session_start_us, last_event_us, n_events) as plain
longs — epoch MICROS (the parquet timestamps' native precision, so
session bounds round-trip exactly) avoid timezone/py-datetime
marshalling across the Arrow state boundary. A session closes either (a) in-batch, when a later
event arrives more than ``gap`` after the previous one, or (b) by
event-time timeout, when the watermark passes last_event + gap. Open
sessions whose timeout the final watermark never passes stay open — in a
real deployment the stream keeps running; in availableNow tests only
sessions closed by (a) or (b) are emitted.

Scale: state is O(active users) x 24 bytes; shuffle is one exchange on
the grouping key per micro-batch — the minimum any keyed stateful
operator needs. Batches arrive per-group as Arrow record batches (no
row-at-a-time Python).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def _session_row(user_id: int, start_us: int, last_us: int, n: int) -> dict[str, Any]:
    return {
        "user_id": user_id,
        "session_start": pd.Timestamp(start_us, unit="us"),
        "session_end": pd.Timestamp(last_us, unit="us"),
        "n_events": n,
    }


def sessionize_stream(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Gap-based sessions over a stream of (user, timestamp) events.

    Output: one row per CLOSED session (user_id, session_start,
    session_end, n_events), append mode.
    """
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame([_session_row(user_id, start_us, last_us, n)])
            return

        rows = pd.concat(list(pdfs))
        # datetime64[ns] -> epoch micros (exact for parquet micro precision)
        ts_us = (rows[ts_col].astype("int64") // 1000).sort_values()
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = None, None, 0

        closed: list[dict[str, Any]] = []
        for t in ts_us:
            t = int(t)
            if last_us is not None and t - last_us > gap_us:
                closed.append(_session_row(user_id, start_us, last_us, n))
                start_us, n = None, 0
            if start_us is None:
                start_us = t
            last_us = t
            n += 1
        state.update((start_us, last_us, n))
        # close the open session when event-time passes last event + gap;
        # timeout API is epoch millis — round UP so we never fire early
        state.setTimeoutTimestamp((last_us + gap_us + 999) // 1000)
        if closed:
            yield pd.DataFrame(closed)

    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
