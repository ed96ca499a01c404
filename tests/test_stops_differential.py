"""Differential test: detect_stops vs an independent pure-Python
reimplementation of the reference algorithm (reference
utils.py:350-413), on randomized small trajectories (SURVEY.md §5
item 4). Catches window-frame/null-semantics drift that golden cases
miss."""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from polaroam_spark.operators.stops import detect_stops
from tests.conftest import make_pings

R1 = 60.0
MIN_SIZE = 2
MIN_STAY = 300
MAX_GAP = 3600


def _haversine(lat1, lon1, lat2, lon2):
    la1, lo1, la2, lo2 = map(math.radians, (lat1, lon1, lat2, lon2))
    a = (
        math.sin((la2 - la1) / 2) ** 2
        + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
    )
    return 2 * 6371000.0 * math.asin(math.sqrt(a))


def _python_stationary_events(rows):
    """Independent reimplementation: per-user lead-based pairwise
    stationarity, rising-edge run ids, size/duration validity."""
    out = {}
    by_uid = {}
    for uid, lat, lon, ts in rows:
        by_uid.setdefault(uid, []).append((lat, lon, ts))
    for uid, pts in by_uid.items():
        pts.sort(key=lambda p: p[2])
        n = len(pts)
        stationary = []
        for i in range(n):
            if i == n - 1:
                stationary.append(False)  # null lead distance
                continue
            d = _haversine(pts[i][0], pts[i][1], pts[i + 1][0], pts[i + 1][1])
            gap = pts[i + 1][2] - pts[i][2]
            stationary.append(d <= R1 and gap <= MAX_GAP)
        run_id = 0
        event_ids = []
        prev = False
        for i in range(n):
            if stationary[i] and not prev:
                run_id += 1
            event_ids.append(run_id if stationary[i] else -1)
            prev = stationary[i]
        # validity: count >= MIN_SIZE and sum(time_diff) >= MIN_STAY
        stats = {}
        for i in range(n):
            e = event_ids[i]
            if e == -1:
                continue
            gap = pts[i + 1][2] - pts[i][2] if i < n - 1 else 0
            c, s = stats.get(e, (0, 0))
            stats[e] = (c + 1, s + gap)
        labels = []
        for i in range(n):
            e = event_ids[i]
            if e != -1:
                c, s = stats[e]
                if c < MIN_SIZE or s < MIN_STAY:
                    e = -1
            labels.append(e)
        out[uid] = [(pts[i][2], labels[i]) for i in range(n)]
    return out


# trajectories: steps either tiny (stay) or large (move), gaps mixed
@st.composite
def trajectory(draw):
    n_users = draw(st.integers(1, 3))
    rows = []
    for u in range(n_users):
        n = draw(st.integers(1, 15))
        lat, lon, ts = 10.0, 20.0, 1700000000
        for _ in range(n):
            move = draw(st.sampled_from(["stay", "jump"]))
            if move == "jump":
                lat += draw(st.sampled_from([0.01, -0.02, 0.05]))
            else:
                lat += draw(st.sampled_from([0.0, 1e-6, -1e-6]))
            ts += draw(st.sampled_from([30, 200, 400, 4000]))
            rows.append((f"u{u}", round(lat, 7), lon, ts))
    return rows


@pytest.mark.slow
@settings(max_examples=12, deadline=None)
@given(trajectory())
def test_detect_stops_matches_python_reference(spark, rows):
    spark_out = detect_stops(
        make_pings(spark, rows),
        r1=R1,
        min_size=MIN_SIZE,
        min_staying_time=MIN_STAY,
        max_time_between=MAX_GAP,
    ).collect()
    got = {}
    for r in spark_out:
        got.setdefault(r.uid, []).append((r.timestamp, r.stop_events))
    for uid in got:
        got[uid].sort()
    expected = _python_stationary_events(rows)
    for uid in expected:
        expected[uid].sort()
    assert got == expected
