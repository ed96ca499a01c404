"""Stream-stream joins — watermarked interval equi-joins.

Structured Streaming's stream-stream inner join buffers both sides in
join state keyed by the equi-key. The watermark plus an explicit
event-time range condition is what lets Spark EXPIRE buffered rows
once no future match can arrive, bounding state to
(watermark window × arrival rate) instead of the whole stream history
— the property that keeps a forever-running join viable at
100 TB/day. Without the time-range condition Spark must keep every
row of both sides in state indefinitely; this module therefore makes
the range mandatory.

Beyond-reference component: the reference engine (PolaRoam) is a
batch mobility library with no streaming surface; this generalizes
its event-sequence semantics (signup→purchase funnels, ping→stop
attribution) to unbounded inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "1 hour",
    watermark_delay: str = "2 hours",
    prefixes: tuple[str, str] = ("l_", "r_"),
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``on`` where the right event lands in
    ``[left_ts, left_ts + max_delay]`` (e.g. purchases within an hour
    of the signup). Both sides get ``watermark_delay`` watermarks, so
    left state older than the watermark minus ``max_delay`` and right
    state older than the watermark are dropped by the state store —
    bounded memory on unbounded streams.

    ``how='left_outer'`` additionally emits NULL-padded rows for left
    events whose window closed with no match ("signups that never
    purchased") — Spark can only emit those once the WATERMARK passes
    ``left_ts + max_delay`` (no earlier batch can prove absence), so
    unmatched rows surface a batch later than their matches and the
    final micro-batch's unmatched tail stays in state until a later
    batch advances the watermark. Plan availableNow replays
    accordingly (a trailing empty trigger flushes nothing by itself).

    Output columns: ``on`` once (from the left), every other column
    prefixed with ``prefixes[0]`` / ``prefixes[1]`` so same-named
    metric/timestamp columns from the two sides never collide.

    Also correct on batch DataFrames (withWatermark is a no-op there),
    which is how the correctness oracle replays it as a plain SQL
    interval join.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(
            f"how must be 'inner' or 'left_outer', got {how!r}"
        )
    lw = left.withWatermark(left_ts, watermark_delay).alias("_ssl")
    rw = right.withWatermark(right_ts, watermark_delay).alias("_ssr")
    cond = (
        (F.col(f"_ssl.{on}") == F.col(f"_ssr.{on}"))
        & (F.col(f"_ssr.{right_ts}") >= F.col(f"_ssl.{left_ts}"))
        & (
            F.col(f"_ssr.{right_ts}")
            <= F.col(f"_ssl.{left_ts}") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    joined = lw.join(rw, cond, how)
    out = [F.col(f"_ssl.{on}").alias(on)]
    out += [
        F.col(f"_ssl.{c}").alias(f"{prefixes[0]}{c}")
        for c in left.columns
        if c != on
    ]
    out += [
        F.col(f"_ssr.{c}").alias(f"{prefixes[1]}{c}")
        for c in right.columns
        if c != on
    ]
    return joined.select(*out)
