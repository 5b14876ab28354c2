"""Custom stateful streaming operator: per-user session tracking via
``applyInPandasWithState`` (Arrow-batched, grouped state).

This is the engine's template for operators Spark's built-in windows
can't express (per-key custom state machines). The batch-side twin —
``F.session_window`` / gaps-and-islands — covers the SQL-expressible
cases; this path exists for genuinely procedural state.

State flows per user_id: we accumulate (count, min_ts, max_ts, sum)
and emit the session when the event-time gap exceeds ``gap_minutes``
or the state times out on watermark advance.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def make_sessionizer(gap_minutes: int = 30):
    gap_us = gap_minutes * 60 * 1_000_000

    def _emit(completed: list[tuple]) -> pd.DataFrame:
        out = pd.DataFrame(
            completed,
            columns=["user_id", "session_start", "session_end", "n_events"],
        )
        out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
        out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
        return out

    def sessionize(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        if state.hasTimedOut:
            # watermark passed the open session's gap horizon: close it
            start_us, end_us, n = state.get
            state.remove()
            yield _emit([(user_id, start_us, end_us, n)])
            return

        rows = pd.concat(list(pdfs)).sort_values("ts")
        ts_us = rows["ts"].astype("int64") // 1000  # ns -> us

        if state.exists:
            start_us, end_us, n = state.get
        else:
            start_us, end_us, n = None, None, 0

        completed: list[tuple] = []
        for t in ts_us:
            if start_us is None:
                start_us, end_us, n = int(t), int(t), 1
            elif t - end_us > gap_us:
                completed.append((user_id, start_us, end_us, n))
                start_us, end_us, n = int(t), int(t), 1
            else:
                end_us, n = int(t), n + 1

        state.update((start_us, end_us, n))
        # timeout must stay ahead of the current watermark
        timeout_ms = max(
            end_us // 1000 + gap_minutes * 60 * 1000,
            state.getCurrentWatermarkMs() + 1,
        )
        state.setTimeoutTimestamp(timeout_ms)

        if completed:
            yield _emit(completed)

    return sessionize


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Attach the stateful sessionizer to a (streaming) events frame.
    Requires a watermark on ts for state cleanup."""
    return (
        events.withWatermark("ts", f"{gap_minutes} minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_sessionizer(gap_minutes),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
