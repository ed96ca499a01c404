"""Stop-event detection — per-user trajectory sessionization.

Reimplements the reference's ``get_stationary_events``
(reference utils.py:350-413) and the ``fit_predict`` →
``compute_label_medians`` pipeline (reference models.py:112-177) as
pure Spark window + aggregate expressions. The reference runs the
whole thing as a per-user ``map_groups`` Python callback; here the
identical semantics compile to two shuffles (by ``uid`` for the
sequential windows, by ``(uid, stop_events)`` for event stats) with
every expression inside whole-stage codegen — no Python in the path.

Semantics preserved exactly (SURVEY.md §2i quirks):

- distance/time_diff between row i and row i+1 are stored on row i
  (lead, reference utils.py:294-295), so the LAST ping of each user —
  and the last ping of each physical stay — carries ``stationary =
  false`` and lands in the -1 (transit) class;
- ``within_time`` treats a null gap as true (reference utils.py:358),
  but the null distance of the last row makes the conjunction null →
  treated as not-stationary;
- event ids are a gated running count of rising edges, starting at 1
  per user (reference utils.py:366-380);
- events are kept only when ``count(rows) >= min_size`` AND
  ``sum(time_diff) >= min_staying_time`` (reference utils.py:383-388);
  note event rows exclude the stay's final ping, so ``sum(time_diff)``
  spans first-ping→last-ping — the true dwell time;
- invalid events collapse to -1 (reference utils.py:391-400).

Scale: partitioning is by ``uid`` — embarrassingly parallel, no skew
risk for GPS data (a single user's pings are bounded). The event-stat
validity check is a second window over ``(uid, stop_events)`` rather
than an agg+join: one shuffle instead of two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polaroam_spark.functions.distance import pair_distance


def detect_stops(
    pings: DataFrame,
    r1: float = 10.0,
    min_size: int = 2,
    min_staying_time: int = 300,
    max_time_between: int = 86400,
    distance_metric: str = "haversine",
    tiebreaker: str | None = None,
) -> DataFrame:
    """Segment each user's trajectory into stop events.

    Input: ``uid, latitude, longitude, timestamp`` (unix seconds;
    extra columns are dropped, reference models.py:143).
    Output: ``uid, stop_events, latitude, longitude, timestamp`` with
    ``stop_events = -1`` for transit/noise pings.

    ``tiebreaker`` names an extra column used as a secondary sort key
    so duplicate timestamps order deterministically (the reference
    relies on Polars' stable input order, which Spark does not have).
    """
    order = ["timestamp"] + ([tiebreaker] if tiebreaker else [])
    w = Window.partitionBy("uid").orderBy(*order)

    keep = ["uid", "latitude", "longitude", "timestamp"] + (
        [tiebreaker] if tiebreaker else []
    )
    df = pings.select(*keep)

    lead_lat = F.lead("latitude").over(w)
    lead_lon = F.lead("longitude").over(w)
    lead_ts = F.lead("timestamp").over(w)

    df = df.withColumns(
        {
            "distance": pair_distance(
                "latitude", "longitude", lead_lat, lead_lon, distance_metric
            ),
            "time_diff": lead_ts - F.col("timestamp"),
        }
    )

    # Null distance (last row per uid) => null AND => not stationary,
    # matching the reference's three-valued logic (utils.py:356-364).
    stationary = F.coalesce(
        (F.col("distance") <= F.lit(float(r1)))
        & (
            F.col("time_diff").isNull()
            | (F.col("time_diff") <= F.lit(int(max_time_between)))
        ),
        F.lit(False),
    )
    df = df.withColumn("stationary", stationary)

    rising_edge = F.col("stationary") & ~F.lag("stationary", 1, False).over(w)
    run_id = F.sum(rising_edge.cast("int")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = df.withColumn(
        "event_id",
        F.when(F.col("stationary"), run_id).otherwise(F.lit(-1)).cast("long"),
    )

    # Event validity (HAVING semantics, reference utils.py:383-400):
    # count/sum per (uid, event_id). Partitioning by (uid, event_id)
    # would force a SECOND full shuffle of the ping table; instead keep
    # the existing uid partitioning and use a RANGE frame over
    # event_id — CURRENT ROW..CURRENT ROW in RANGE mode spans all
    # peer rows with the same event_id, i.e. exactly the per-event
    # aggregate, at the cost of one in-partition sort. One Exchange
    # total for the whole operator (verified via .explain).
    we = (
        Window.partitionBy("uid")
        .orderBy("event_id")
        .rangeBetween(Window.currentRow, Window.currentRow)
    )
    valid = (
        (F.col("event_id") != -1)
        & (F.count("*").over(we) >= F.lit(int(min_size)))
        & (F.sum("time_diff").over(we) >= F.lit(int(min_staying_time)))
    )
    df = df.withColumn(
        "stop_events", F.when(valid, F.col("event_id")).otherwise(F.lit(-1))
    )

    return df.select(
        "uid",
        F.col("stop_events").cast("long").alias("stop_events"),
        "latitude",
        "longitude",
        "timestamp",
    )


def stop_medians(stop_events: DataFrame) -> DataFrame:
    """Reduce each stop event to its median coordinate + time span
    (reference models.py:163-177). Exact ``median`` (not approx) —
    the result is a downstream clustering input and oracle-checked.
    """
    return (
        stop_events.filter(F.col("stop_events") != -1)
        .groupBy("uid", "stop_events")
        .agg(
            F.median("latitude").alias("latitude"),
            F.median("longitude").alias("longitude"),
            F.min("timestamp").alias("start_timestamp"),
            F.max("timestamp").alias("end_timestamp"),
        )
    )
