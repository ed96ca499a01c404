"""Streaming time-series transforms — the stateful streaming twins of
operators/timeseries.py, following the sessionize.py conventions
(``applyInPandasWithState``, event-time watermark, per-key fixed-size
state, event-clock-anchored timeouts).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_EWMA_OUTPUT = StructType(
    [
        StructField("key", StringType()),
        StructField("ts", LongType()),
        StructField("value", DoubleType()),
        StructField("ewma", DoubleType()),
    ]
)

_EWMA_STATE = StructType(
    [
        StructField("y", DoubleType()),
        StructField("last_ts", LongType()),
    ]
)


def streaming_ewma(
    events: DataFrame,
    alpha: float,
    key_col: str = "uid",
    value_col: str = "value",
    epoch_col: str = "timestamp",
    ts_col: str = "event_ts",
    watermark_delay: str = "1 hour",
    state_ttl_sec: int = 86400,
) -> DataFrame:
    """Streaming twin of :func:`polaroam_spark.operators.timeseries.
    ewma`: one output row per observation carrying the running
    ``y = alpha*x + (1-alpha)*y_prev`` — the live smoothed metric a
    monitoring/feature pipeline reads per event. Emits in append mode;
    state per key is ONE (y, last_ts) pair (the minimum any exact
    EWMA can hold), evicted after ``state_ttl_sec`` of event-time
    silence.

    Ordering contract: within a micro-batch rows replay in
    ``(epoch, value)`` order with duplicate epochs collapsed to their
    MIN value (the batch operator's exact semantics, so a
    one-micro-batch replay reproduces batch EWMA bit-for-bit — the
    st7 gate pins that). ACROSS micro-batches a row at or behind the
    key's last processed epoch is DROPPED: the recursion cannot be
    retroactively reordered with O(1) state — that is the inherent
    exactness/state trade of a streaming fold, and silently
    mis-ordered output would be worse than a documented drop. Size
    ``watermark_delay`` to bound how late data can arrive at all.

    The step arithmetic keeps the ``alpha*x + beta*y`` shape of the
    batch operator, so batch, stream, and the DuckDB recursive-CTE
    oracle all produce identical doubles.
    """
    alpha = float(alpha)
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    beta = 1.0 - alpha
    ttl_ms = int(state_ttl_sec) * 1000

    def _fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return

        rows = pd.concat(list(pdfs))
        # drop null/NaN observations FIRST — the batch twin's
        # _collapsed_obs rule (NaN is treated as NULL, the repo-wide
        # policy). A null epoch would otherwise make the int64 cast
        # below raise (a poison pill that kills the query on every
        # retry of the micro-batch); a NaN value would fold into y
        # and permanently corrupt the key's state.
        rows = rows.dropna(subset=[epoch_col, value_col, ts_col])
        if rows.empty:
            return
        rows = rows.sort_values(
            [epoch_col, value_col], kind="mergesort"
        )
        # collapse duplicate epochs to their min value (first after
        # the sort) — the batch operator's dedup rule
        rows = rows.drop_duplicates(subset=[epoch_col], keep="first")

        if state.exists:
            y, last_ts = tuple(state.get)
        else:
            y, last_ts = None, None

        out_ts, out_v, out_y = [], [], []
        for ts, v in zip(
            rows[epoch_col].astype("int64"), rows[value_col].astype("float64")
        ):
            ts = int(ts)
            v = float(v)
            if last_ts is not None and ts <= last_ts:
                continue  # late/duplicate vs state: documented drop
            y = v if y is None else alpha * v + beta * y
            last_ts = ts
            out_ts.append(ts)
            out_v.append(v)
            out_y.append(y)

        if last_ts is not None:
            state.update((y, last_ts))
            event_clock_ms = int(rows[ts_col].max().timestamp() * 1000)
            state.setTimeoutTimestamp(event_clock_ms + ttl_ms)
        if out_ts:
            yield pd.DataFrame(
                {
                    "key": str(key[0]),
                    "ts": out_ts,
                    "value": out_v,
                    "ewma": out_y,
                }
            )

    wm = events.withWatermark(ts_col, watermark_delay)
    return wm.groupBy(key_col).applyInPandasWithState(
        _fn,
        outputStructType=_EWMA_OUTPUT,
        stateStructType=_EWMA_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
