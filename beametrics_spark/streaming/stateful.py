"""Custom stateful streaming operator: per-key session aggregation via
``applyInPandasWithState``.

The reference exposes no stateful API at all (SURVEY.md §2.2 — no user
state, no session windows). This is the Spark-native extension point for
operators that windowed aggregation can't express: arbitrary per-key
state carried across micro-batches with watermark-driven eviction.

Semantics: events for a key extend an open session while event-time gaps
stay under ``gap_seconds``; when the WATERMARK passes session_end + gap,
the state times out and EMITS one closed-session row (session_start,
session_end, n_events, total_value). This is the streaming twin of the
batch `sessions_per_user` query (operators/relational.py).

EventTimeTimeout (not ProcessingTimeTimeout) on purpose: processing-time
timeouts make Spark schedule state-cleanup micro-batches forever — a
drained test harness (processAllAvailable) never returns, and at scale
the cluster burns empty batches. Event-time timeouts fire only when new
data advances the watermark.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.DoubleType()),
        T.StructField("session_end", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_start", T.DoubleType()),
        T.StructField("session_end", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def make_session_fn(gap_seconds: float = 1800.0):
    """Build the applyInPandasWithState callback (gap injected)."""

    def _emit(user_id, sessions) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(sessions),
                "session_start": [s[0] for s in sessions],
                "session_end": [s[1] for s in sessions],
                "n_events": [s[2] for s in sessions],
                "total_value": [s[3] for s in sessions],
            }
        )

    def update_sessions(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # watermark passed session_end + gap: close, emit, drop state
            start, end, n, total = state.get
            state.remove()
            yield _emit(user_id, [(start, end, n, total)])
            return

        rows = pd.concat(list(pdfs)).sort_values("ts_epoch")
        closed: list[tuple[float, float, int, float]] = []
        if state.exists:
            start, end, n, total = state.get
        else:
            start = end = float(rows.iloc[0]["ts_epoch"])
            n, total = 0, 0.0
        for ts, value in zip(rows["ts_epoch"], rows["value"]):
            ts = float(ts)
            if n > 0 and ts - end > gap_seconds:
                closed.append((start, end, n, total))
                start, n, total = ts, 0, 0.0
            end = max(end, ts) if n > 0 else ts
            n += 1
            total += float(value)
        state.update((start, end, n, total))
        # close when the watermark passes the gap horizon (must be strictly
        # ahead of the current watermark or Spark rejects it)
        timeout_ms = int((end + gap_seconds) * 1000)
        state.setTimeoutTimestamp(
            max(timeout_ms, state.getCurrentWatermarkMs() + 1)
        )
        if closed:
            yield _emit(user_id, closed)

    return update_sessions


def sessionize_stream(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_seconds: float = 1800.0,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """events stream → closed-session rows (append mode).

    The watermark (event-time) both bounds late data and drives session
    timeouts; idle keys flush as soon as newer events advance it.
    """
    prepped = events.select(
        F.col(ts_col).alias("ts"),
        F.col(key_col).cast("long").alias("user_id"),
        F.col(ts_col).cast("double").alias("ts_epoch"),
        F.col(value_col).cast("double").alias("value"),
    ).withWatermark("ts", watermark_delay)
    return prepped.groupBy("user_id").applyInPandasWithState(
        make_session_fn(gap_seconds),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


DEBOUNCE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_kept", T.LongType()),
    ]
)

DEBOUNCE_STATE_SCHEMA = T.StructType(
    [T.StructField("last_us", T.LongType())]
)


def make_debounce_fn(gap_us: int):
    """applyInPandasWithState callback for the per-type rate limiter:
    state is ONE long (the last-seen event-time in microseconds); each
    invocation sorts its batch's rows into the (ts_us, event_id) total
    order, counts arrivals >= gap_us after their predecessor (the
    predecessor of the first row being the carried state), and emits
    the batch INCREMENT (n_events, n_kept) — the caller sums increments
    batch-side. Single-lag semantics across micro-batch boundaries are
    exact as long as the source feeds batches in event-time order,
    which the parity harness guarantees by construction."""

    def update_debounce(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        rows = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
        prev = state.get[0] if state.exists else None
        kept = 0
        for us in rows["ts_us"]:
            us = int(us)
            if prev is None or us - prev >= gap_us:
                kept += 1
            prev = us
        state.update((prev,))
        yield pd.DataFrame(
            {
                "event_type": [event_type],
                "n_events": [len(rows)],
                "n_kept": [kept],
            }
        )

    return update_debounce


def debounce_stream(events: DataFrame, *, gap_us: int) -> DataFrame:
    """events stream → per-micro-batch (type, n_events, n_kept)
    increments (append mode, NoTimeout — state is one long per key and
    lives for the stream's lifetime, the correct shape for a rate
    limiter that never forgets its last emission)."""
    # cast handles TIMESTAMP_NTZ sources (session tz is pinned to UTC
    # engine-wide, so the reinterpretation is identity)
    prepped = events.select(
        F.col("event_type"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.col("event_id"),
    )
    return prepped.groupBy("event_type").applyInPandasWithState(
        make_debounce_fn(gap_us),
        outputStructType=DEBOUNCE_OUTPUT_SCHEMA,
        stateStructType=DEBOUNCE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
