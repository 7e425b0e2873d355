"""Custom stateful streaming: gap-based sessionization via
``applyInPandasWithState`` (SURVEY.md §2.3). This is the escape hatch
for stateful logic Spark's built-in windows can't express (e.g. session
attributes that depend on event order within the session).

State is one small record per (user) key, bounded by event-time timeout
— the 100 TB discipline is that state size is O(active keys), never
O(events).
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("status", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_cents", LongType()),
    ]
)

GAP_MS = 30 * 60 * 1000


def _sessionize_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events for one user into the open
    session; emit closed sessions. Value sums are kept in exact integer
    cents inside the state (see functions/money.py)."""
    (user_id,) = key
    if state.hasTimedOut:
        if state.exists:
            start_ms, end_ms, n, cents_sum = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(end_ms, unit="ms")],
                    "n_events": [n],
                    "sum_value": [cents_sum / 100.0],
                    "status": ["closed_by_timeout"],
                }
            )
        return

    rows = pd.concat(list(pdfs)).sort_values("ts")
    out: list[dict] = []
    if state.exists:
        start_ms, end_ms, n, cents_sum = state.get
    else:
        start_ms = end_ms = None, None  # type: ignore[assignment]
        start_ms, end_ms, n, cents_sum = None, None, 0, 0
    for ts, value in zip(rows["ts"], rows["value"]):
        t_ms = int(pd.Timestamp(ts).value // 1_000_000)
        # floor(v*100 + 0.5), NOT round(): Python round() is half-to-even
        # while the DuckDB replay oracle's round() is half-away-from-zero,
        # so values whose v*100 is an exact binary .5 (0.125, 2.375)
        # would diverge by 1 cent (ADVICE r6). Both sides use the same
        # explicit fold. NOTE this rounds half toward +inf (-12.5 → -12),
        # which DIVERGES from money.cents()'s Spark HALF_UP
        # (-12.5 → -13) on negative exact-.5 ties — harmless on the
        # non-negative 2-decimal corpus, mirrored exactly by the s02
        # oracle, and intentionally NOT unified (ADVICE r7): see
        # functions/money.py.
        v_cents = int(math.floor(value * 100 + 0.5))
        if start_ms is None:
            start_ms, end_ms, n, cents_sum = t_ms, t_ms, 1, v_cents
        elif t_ms - end_ms > GAP_MS:
            out.append(
                {
                    "user_id": user_id,
                    "session_start": pd.Timestamp(start_ms, unit="ms"),
                    "session_end": pd.Timestamp(end_ms, unit="ms"),
                    "n_events": n,
                    "sum_value": cents_sum / 100.0,
                    "status": "closed_by_gap",
                }
            )
            start_ms, end_ms, n, cents_sum = t_ms, t_ms, 1, v_cents
        else:
            end_ms = max(end_ms, t_ms)
            n += 1
            cents_sum += v_cents
    state.update((start_ms, end_ms, n, cents_sum))
    state.setTimeoutTimestamp(end_ms + GAP_MS)
    if out:
        yield pd.DataFrame(out)


def sessionize_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Gap-based sessionization with explicit state management. Emits a
    row per *closed* session (closed by gap or by event-time timeout)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
