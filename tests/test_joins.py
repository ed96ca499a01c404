"""Temporal joins: as-of and point-in-interval."""

import pyspark.sql.functions as F
import pytest

from polaroam_spark.operators.joins import asof_join, point_in_interval_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [("u1", 10, "a"), ("u1", 25, "b"), ("u2", 5, "c"), ("u1", 8, "d")],
        "uid string, timestamp long, v string",
    )
    right = spark.createDataFrame(
        [("u1", 8, 1.0), ("u1", 20, 2.0), ("u2", 9, 3.0)],
        "uid string, timestamp long, px double",
    )
    return left, right


def test_asof_backward(frames):
    left, right = frames
    out = {
        (r.uid, r.timestamp): r.px
        for r in asof_join(left, right, on="uid").collect()
    }
    assert out[("u1", 10)] == 1.0   # latest right <= 10 is ts=8
    assert out[("u1", 25)] == 2.0   # ts=20
    assert out[("u1", 8)] == 1.0    # equal ts matches
    assert out[("u2", 5)] is None   # nothing at or before 5


def test_asof_tolerance(frames):
    left, right = frames
    out = {
        (r.uid, r.timestamp): r.px
        for r in asof_join(left, right, on="uid", tolerance=3).collect()
    }
    assert out[("u1", 10)] == 1.0   # 10-8=2 <= 3
    assert out[("u1", 25)] is None  # 25-20=5 > 3


def test_asof_matches_duckdb(spark, frames):
    import duckdb

    left, right = frames
    got = sorted(
        (r.uid, r.timestamp, r.px)
        for r in asof_join(left, right, on="uid").collect()
    )
    con = duckdb.connect()
    con.register("l", left.toPandas())
    con.register("r", right.toPandas())
    expected = sorted(
        map(
            tuple,
            con.execute(
                "SELECT l.uid, l.timestamp, r.px FROM l ASOF LEFT JOIN r "
                "ON l.uid = r.uid AND l.timestamp >= r.timestamp"
            ).fetchall(),
        )
    )
    assert got == expected


def test_point_in_interval(spark):
    points = spark.createDataFrame(
        [("u1", 15), ("u1", 50), ("u2", 15)],
        "uid string, timestamp long",
    )
    intervals = spark.createDataFrame(
        [("u1", 10, 20, "home"), ("u1", 40, 45, "work"), ("u2", 10, 20, "gym")],
        "uid string, t_start long, t_end long, label string",
    )
    out = point_in_interval_join(
        points, intervals, on="uid", bucket_size=16
    ).collect()
    got = {(r.uid, r.timestamp): r.label for r in out}
    assert got == {("u1", 15): "home", ("u2", 15): "gym"}
    # point 50 matches nothing -> absent under inner join
    assert ("u1", 50) not in got


def test_point_in_interval_bucket_boundary(spark):
    # interval spanning multiple buckets must match points in each
    points = spark.createDataFrame(
        [("p", t) for t in (0, 31, 63, 64)], "uid string, timestamp long"
    )
    intervals = spark.createDataFrame(
        [("p", 0, 63, "long")], "uid string, t_start long, t_end long, label string"
    )
    out = point_in_interval_join(
        points, intervals, on="uid", bucket_size=16
    ).collect()
    assert sorted(r.timestamp for r in out) == [0, 31, 63]
