"""Golden home/work labeling fixture: night stays -> H, weekday noon
stays -> W, transit/-1 untouched (reference models.py:349-453)."""

import pyspark.sql.functions as F
import pytest

from polaroam_spark.operators.homework import (
    detect_home,
    detect_work,
    home_work_wide,
    prepare_labeling,
    rolling_home_candidates,
)
from polaroam_spark.operators.postprocess import compute_intervals

DAY = 86400
T0 = 1700006400  # midnight UTC


@pytest.fixture(scope="module")
def labeled(spark):
    rows = []
    for d in range(5):
        base = T0 + d * DAY
        # night stay at cluster 0 (22:00), work stay cluster 1 (12:00)
        rows.append(("A", d * 2, 0, base + 22 * 3600, base + 23 * 3600))
        rows.append(("A", d * 2 + 1, 1, base + 12 * 3600, base + 14 * 3600))
    rows.append(("A", 100, -1, T0 + 5 * DAY, T0 + 5 * DAY + 60))
    df = spark.createDataFrame(
        rows,
        "uid string, stop_events long, stop_locations long, "
        "start_timestamp long, end_timestamp long",
    )
    prep = prepare_labeling(df)
    homed = detect_home(
        prep, min_periods_over_window=0.5, span_period=0.1, total_days=5
    )
    return detect_work(
        homed, min_periods_over_window=0.5, span_period=0.1, total_days=5
    )


def test_home_and_work_labels(labeled):
    rows = labeled.collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.stop_locations, set()).add(r.location_type)
    assert by_cluster[0] == {"H"}
    assert by_cluster[1] == {"W"}
    assert by_cluster[-1] == {"O"}


def test_labels_carry_cluster_id(labeled):
    h = labeled.filter(F.col("location_type") == "H").select("home_label")
    assert {r.home_label for r in h.collect()} == {0}
    w = labeled.filter(F.col("location_type") == "W").select("work_label")
    assert {r.work_label for r in w.collect()} == {1}


def test_datetime_expansion(labeled):
    r = labeled.filter(
        (F.col("stop_locations") == 0)
        & (F.col("start_timestamp") == T0 + 22 * 3600)
    ).first()
    assert r.hour == 22
    assert r.duration == 3600
    assert 1 <= r.weekday <= 7


def test_wide_export(spark, labeled):
    wide_in = labeled.withColumns(
        {
            "cluster_latitude": F.col("stop_locations") * 1.0 + 10.0,
            "cluster_longitude": F.col("stop_locations") * 1.0 + 20.0,
            "cluster_counts": F.lit(5).cast("long"),
        }
    )
    wide = home_work_wide(wide_in).collect()
    assert len(wide) == 1
    r = wide[0]
    assert r.h_lat == 10.0 and r.w_lat == 11.0
    assert r.h_lon == 20.0 and r.w_lon == 21.0


def test_intervals_gap_semantics(spark):
    # same label, gap exactly == max_time_between -> new interval
    df = spark.createDataFrame(
        [("A", 1, 0), ("A", 1, 100), ("A", 1, 100 + 3600), ("A", 2, 8000)],
        "uid string, label long, t long",
    )
    out = compute_intervals(
        df, label_col="label", time_col="t", max_time_between=3600
    ).orderBy("t_start").collect()
    assert [(r.label, r.t_start, r.t_end) for r in out] == [
        (1, 0, 100),
        (1, 3700, 3700),
        (2, 8000, 8000),
    ]


def test_rolling_home_candidates(spark):
    rows = []
    for d in range(10):
        rows.append(("A", 0, 1700006400 + d * DAY, 3600))
    df = spark.createDataFrame(
        rows, "uid string, stop_locations long, start_timestamp long, "
        "duration long"
    ).withColumn("date", F.to_date(F.timestamp_seconds("start_timestamp")))
    out = rolling_home_candidates(df, window_days=7, min_stays=3)
    rows = out.orderBy("date").collect()
    # first two days have <3 stays in window -> dropped
    assert len(rows) == 8
    assert rows[0].rolling_stays == 3
    assert rows[-1].rolling_stays == 7  # window saturates at 7 days
    assert rows[-1].rolling_duration == 7 * 3600
