"""Golden-trajectory tests for stop detection (SURVEY.md §5 strategy:
edge cases the reference's semantics pin down — uid boundaries, gaps,
min_size/min_staying_time, last-ping convention)."""

import pyspark.sql.functions as F

from polaroam_spark.operators.stops import detect_stops, stop_medians
from tests.conftest import make_pings

T0 = 1700000000


def events_of(df):
    rows = df.orderBy("uid", "timestamp").collect()
    return [(r.uid, r.timestamp, r.stop_events) for r in rows]


def test_simple_stay_last_ping_is_transit(spark):
    pings = make_pings(
        spark, [("A", 10.0, 10.0, T0 + i * 100) for i in range(5)]
    )
    out = events_of(detect_stops(pings, r1=20))
    # rows 0-3 form event 1; the final ping has null lead distance ->
    # stationary=false -> -1 (reference utils.py:341, 356-359)
    assert [e for _, _, e in out] == [1, 1, 1, 1, -1]


def test_gap_splits_events(spark):
    rows = [("A", 10.0, 10.0, T0 + i * 200) for i in range(3)]
    rows += [("A", 10.0, 10.0, T0 + 90000 + i * 200) for i in range(3)]
    out = events_of(detect_stops(pings=make_pings(spark, rows), r1=20,
                                 max_time_between=3600))
    labels = [e for _, _, e in out]
    # two separate events; each stay's last ping joins the event only
    # if still stationary (gap row breaks the first run)
    assert labels[0] == labels[1] == 1
    assert labels[2] == -1  # gap to next stay exceeds max_time_between
    assert labels[3] == labels[4] == 2
    assert labels[5] == -1


def test_min_size_filters_small_events(spark):
    # 2-ping stay -> only 1 stationary row (the last ping never counts)
    pings = make_pings(
        spark, [("A", 10.0, 10.0, T0), ("A", 10.0, 10.0, T0 + 400)]
    )
    out = events_of(detect_stops(pings, r1=20, min_size=2))
    assert [e for _, _, e in out] == [-1, -1]


def test_min_staying_time(spark):
    # 3 pings 10s apart: event duration 20s < 300 -> invalid
    pings = make_pings(
        spark, [("A", 10.0, 10.0, T0 + i * 10) for i in range(3)]
    )
    out = events_of(detect_stops(pings, r1=20, min_staying_time=300))
    assert [e for _, _, e in out] == [-1, -1, -1]


def test_single_ping_user(spark):
    pings = make_pings(spark, [("A", 10.0, 10.0, T0)])
    out = events_of(detect_stops(pings, r1=20))
    assert out == [("A", T0, -1)]


def test_uid_boundary_isolation(spark):
    # user B's pings must not leak into A's windows
    rows = [("A", 10.0, 10.0, T0 + i * 100) for i in range(4)]
    rows += [("B", 50.0, 50.0, T0 + i * 100) for i in range(4)]
    out = events_of(detect_stops(make_pings(spark, rows), r1=20))
    a = [e for u, _, e in out if u == "A"]
    b = [e for u, _, e in out if u == "B"]
    assert a == [1, 1, 1, -1]
    assert b == [1, 1, 1, -1]


def test_moving_user_all_transit(spark):
    rows = [("A", 10.0 + i * 0.01, 10.0, T0 + i * 100) for i in range(5)]
    out = events_of(detect_stops(make_pings(spark, rows), r1=20))
    assert all(e == -1 for _, _, e in out)


def test_stop_medians_values(spark):
    rows = [
        ("A", 10.0, 20.0, T0),
        ("A", 10.2, 20.2, T0 + 200),
        ("A", 10.1, 20.4, T0 + 400),
        ("A", 10.1, 20.4, T0 + 600),  # last stay ping -> excluded (-1)
        ("A", 99.0, 99.0, T0 + 100000),
    ]
    ev = detect_stops(make_pings(spark, rows), r1=100000)
    med = stop_medians(ev).collect()
    assert len(med) == 1
    m = med[0]
    assert m.latitude == 10.1 and abs(m.longitude - 20.2) < 1e-9
    assert m.start_timestamp == T0 and m.end_timestamp == T0 + 400


def test_null_coordinates_become_transit(spark):
    rows = [
        ("A", 10.0, 10.0, T0),
        ("A", None, 10.0, T0 + 200),  # corrupt ping
        ("A", 10.0, 10.0, T0 + 400),
        ("A", 10.0, 10.0, T0 + 600),
    ]
    df = spark.createDataFrame(
        rows,
        "uid string, latitude double, longitude double, timestamp long",
    )
    out = events_of(detect_stops(df, r1=20))
    labels = [e for _, _, e in out]
    # null distance -> three-valued logic -> not stationary; the pings
    # around the corrupt one can't bridge it
    assert labels[0] == -1 and labels[1] == -1
    # rows 2,3: row 2 stationary, row 3 is last -> single-row event
    # fails min_size -> all -1 (no crash, no null labels)
    assert all(e is not None for e in labels)


def test_duplicate_timestamp_determinism(spark):
    rows = [
        ("A", 10.0, 10.0, T0),
        ("A", 10.5, 10.5, T0),  # same timestamp, far away
        ("A", 10.0, 10.0, T0 + 100),
        ("A", 10.0, 10.0, T0 + 200),
    ]
    df = spark.createDataFrame(
        [(u, la, lo, ts, i) for i, (u, la, lo, ts) in enumerate(rows)],
        "uid string, latitude double, longitude double, timestamp long, "
        "ping_id long",
    )
    out1 = detect_stops(df, r1=20, tiebreaker="ping_id").collect()
    out2 = detect_stops(df.repartition(4), r1=20, tiebreaker="ping_id").collect()
    key = lambda rs: sorted((r.timestamp, r.latitude, r.stop_events) for r in rs)
    assert key(out1) == key(out2)
