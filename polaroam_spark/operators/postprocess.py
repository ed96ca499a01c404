"""Interval compaction — merge consecutive same-label points into
``[label, t_start, t_end]`` intervals.

Reimplements ``compute_intervals`` (reference postprocess.py:3-40,
a per-user numpy loop) as the classic gaps-and-islands window plan:
lag-based change flag → running-sum interval id → groupBy min/max.
Two shuffles (both on uid), all whole-stage codegen, no Python loop —
the reference iterates rows on one core; this scales with partitions.

Semantics preserved: a point continues the current interval iff its
label equals the previous label AND the gap to the *previous point's
time* is strictly less than ``max_time_between`` (reference
postprocess.py:42-66 — note ``<``, not ``<=``, and the gap is measured
to the running interval end, which is the previous point's time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compute_intervals(
    df: DataFrame,
    label_col: str = "stop_locations",
    time_col: str = "timestamp",
    uid_col: str = "uid",
    max_time_between: int = 86400,
) -> DataFrame:
    """Compact per-user (label, time) sequences into intervals.

    Output: ``uid, label, t_start, t_end`` — one row per maximal run
    of a label with no internal gap ≥ ``max_time_between``, ordered
    semantics identical to the reference loop.
    """
    w = Window.partitionBy(uid_col).orderBy(time_col)
    prev_label = F.lag(label_col).over(w)
    prev_time = F.lag(time_col).over(w)
    new_interval = (
        prev_label.isNull()
        | (F.col(label_col) != prev_label)
        | ((F.col(time_col) - prev_time) >= F.lit(int(max_time_between)))
    )
    interval_id = F.sum(new_interval.cast("int")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_interval", interval_id)
        .groupBy(uid_col, "_interval")
        .agg(
            F.first(label_col).alias("label"),
            F.min(time_col).alias("t_start"),
            F.max(time_col).alias("t_end"),
        )
        .select(uid_col, "label", "t_start", "t_end")
    )
