"""Stateful streaming rate limiter — the faithful analog of the
reference's sliding-window RPM/TPM limiter
(pipeline/recognition/api/ratelimit.py:24-140: a deque of request
timestamps per 60 s window + running counters), expressed as an
``applyInPandasWithState`` operator.

Per key (e.g. event_type or api-route), state carries the rolling
window's (bucket_start_epoch, count) pairs; each micro-batch appends
its events, evicts expired buckets, and emits one decision row per
input event: allowed / throttled under ``max_per_window``.

Deterministic: decisions depend only on event timestamps (event time,
not wall clock), so replays produce identical output.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

WINDOW_SECONDS = 60  # REQUEST_WINDOW_SECONDS (reference constants.py:6)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("in_window_before", T.IntegerType()),
        T.StructField("allowed", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("bucket_starts", T.ArrayType(T.LongType())),
        T.StructField("bucket_counts", T.ArrayType(T.LongType())),
    ]
)


def _limit_group(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    max_per_window: int,
) -> Iterator[pd.DataFrame]:
    """Process one key's events: second-granularity ring of counts."""
    if state.exists:
        starts, counts = state.get
        window: dict[int, int] = dict(zip(starts, counts))
    else:
        window = {}

    out_rows: list[dict[str, Any]] = []
    # applyInPandasWithState may split one key's micro-batch across
    # several pandas chunks; sorting per-chunk would let a later chunk
    # with earlier timestamps arrive after the window already advanced
    # (evicted buckets are never re-admitted).  Concatenate ALL chunks
    # and sort ONCE globally by (ts, event_id) for deterministic replay.
    chunks = [pdf for pdf in batches if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        for ev_id, ts in zip(pdf["event_id"], pdf["ts"]):
            sec = int(ts.value // 1_000_000_000)
            # evict buckets outside [sec - WINDOW + 1, sec]
            horizon = sec - WINDOW_SECONDS + 1
            if window:
                window = {s: c for s, c in window.items() if s >= horizon}
            in_window = sum(window.values())
            allowed = in_window < max_per_window
            if allowed:
                window[sec] = window.get(sec, 0) + 1
            out_rows.append(
                {
                    "key": key[0],
                    "event_id": int(ev_id),
                    "ts": ts,
                    "in_window_before": int(in_window),
                    "allowed": bool(allowed),
                }
            )
    state.update((list(window.keys()), list(window.values())))
    yield pd.DataFrame(out_rows, columns=[f.name for f in OUTPUT_SCHEMA.fields])


def rate_limit_stream(
    events: DataFrame,
    key_col: str = "event_type",
    max_per_window: int = 15,  # the reference's free-tier 15 RPM default
) -> DataFrame:
    """Apply the stateful limiter to a (streaming) events DataFrame with
    columns (event_id, ts, ``key_col``)."""

    def fn(key, pdfs, state):
        return _limit_group(key, pdfs, state, max_per_window)

    grouped = events.select(
        F.col(key_col).alias("key"), "event_id", "ts"
    ).groupBy("key")
    return grouped.applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
