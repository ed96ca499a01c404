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


def test_asof_tolerance_on_timestamp_type(spark):
    """Review regression: tolerance compared TIMESTAMP payload against
    BIGINT and threw DATATYPE_MISMATCH."""
    left = spark.createDataFrame(
        [("u", 100, "x")], "uid string, epoch long, v string"
    ).select("uid", F.timestamp_seconds("epoch").alias("timestamp"), "v")
    right = spark.createDataFrame(
        [("u", 40, 1.0)], "uid string, epoch long, px double"
    ).select("uid", F.timestamp_seconds("epoch").alias("timestamp"), "px")
    out = asof_join(left, right, on="uid", tolerance=50).first()
    assert out.px is None  # 100-40=60 > 50
    out2 = asof_join(left, right, on="uid", tolerance=70).first()
    assert out2.px == 1.0


def test_band_hashes_non_dividing_and_oversized(spark):
    """Review regression: bands not dividing num_hashes dropped the
    signature tail; bands > length hashed everyone into one bucket."""
    from polaroam_spark.functions.text import band_hashes

    df = spark.createDataFrame(
        [(list(range(16)),), (list(range(16, 32)),)],
        "sig array<long>",
    )
    out = df.select(band_hashes("sig", 5).alias("b")).collect()
    # ceil(16/5)=4 rows/band -> bands cover all 16 elements, none empty
    assert all(len(r.b) == 4 for r in out)  # 5th band slice empty -> filtered
    covered = 4 * 4
    assert covered == 16
    # oversized bands: every slice shorter, but no empty-string bucket
    out2 = df.select(band_hashes("sig", 32).alias("b")).first()
    assert all(s.bucket is not None for s in out2.b)


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


def test_asof_time_chunk_matches_base(spark):
    """The hot-key guard (time_chunk) must reproduce the base plan's
    results exactly: random data with duplicate timestamps, sparse
    chunks (empty chunks between right rows), multiple keys, and a
    tolerance — across chunk sizes from smaller-than-gaps to
    larger-than-horizon."""
    import random

    rng = random.Random(11)
    left_rows = [
        (rng.randrange(3), rng.randrange(1000))
        for _ in range(400)
    ]
    right_rows = [
        (rng.randrange(3), rng.randrange(1000), i)
        for i in range(60)
    ]
    # force tie cases: right rows exactly at some left timestamps
    right_rows += [(u, t, 100 + i) for i, (u, t) in
                   enumerate(left_rows[:10])]
    left = spark.createDataFrame(left_rows, "uid long, timestamp long")
    right = spark.createDataFrame(
        right_rows, "uid long, timestamp long, ival long"
    )

    def snap(df):
        return sorted(
            (r.uid, r.timestamp, r.ival, r.timestamp_right)
            for r in df.collect()
        )

    for tol in (None, 150):
        base = snap(asof_join(left, right, on="uid", tolerance=tol))
        for chunk in (7, 100, 5000):
            got = snap(
                asof_join(
                    left, right, on="uid", tolerance=tol,
                    time_chunk=chunk,
                )
            )
            assert got == base, (tol, chunk)


def test_point_in_interval_left(spark):
    pts = spark.createDataFrame(
        [(1, 5, 100), (1, 50, 101), (2, 5, 102)],
        "uid long, timestamp long, pid long",
    )
    ivals = spark.createDataFrame(
        [(1, 0, 10, 7), (1, 4, 6, 8)],
        "uid long, t_start long, t_end long, ival long",
    )
    with pytest.raises(ValueError):
        point_in_interval_join(pts, ivals, on="uid", how="left")
    out = point_in_interval_join(
        pts, ivals, on="uid", bucket_size=10, how="left", point_id="pid"
    )
    rows = sorted((r.pid, r.ival) for r in out.collect())
    # pid 100 in both intervals; 101 (t=50) and 102 (uid 2) unmatched
    assert rows == [(100, 7), (100, 8), (101, None), (102, None)]


def test_asof_forward(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 25), (1, 99)], "uid long, timestamp long"
    )
    right = spark.createDataFrame(
        [(1, 9, 100), (1, 10, 101), (1, 30, 102)],
        "uid long, timestamp long, ival long",
    )
    out = asof_join(left, right, on="uid", direction="forward")
    got = {r.timestamp: r.ival for r in out.collect()}
    # t=10: right at exactly 10 matches; t=25 -> next at 30; t=99 -> none
    assert got == {10: 101, 25: 102, 99: None}
    tol = asof_join(
        left, right, on="uid", direction="forward", tolerance=4
    )
    got_tol = {r.timestamp: r.ival for r in tol.collect()}
    assert got_tol == {10: 101, 25: None, 99: None}  # 30-25 > 4


def test_asof_forward_chunked_matches_base(spark):
    import random

    rng = random.Random(5)
    left = spark.createDataFrame(
        [(rng.randrange(3), rng.randrange(1000)) for _ in range(300)],
        "uid long, timestamp long",
    )
    right = spark.createDataFrame(
        [(rng.randrange(3), rng.randrange(1000), i) for i in range(50)],
        "uid long, timestamp long, ival long",
    )

    def snap(df):
        return sorted(
            (r.uid, r.timestamp, r.ival) for r in df.collect()
        )

    base = snap(asof_join(left, right, on="uid", direction="forward"))
    for chunk in (13, 250):
        got = snap(
            asof_join(
                left, right, on="uid", direction="forward",
                time_chunk=chunk,
            )
        )
        assert got == base, chunk


def test_asof_null_keys_never_match(spark):
    from polaroam_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(None, 100), ("u1", 100), ("u1", None)],
        "uid string, timestamp long",
    )
    right = spark.createDataFrame(
        [(None, 50, 1.0), ("u1", 50, 2.0), ("u1", None, 3.0)],
        "uid string, timestamp long, px double",
    )
    got = {
        (r.uid, r.timestamp): r.px
        for r in asof_join(left, right, on="uid").collect()
    }
    # null key matches nothing (SQL semantics), null-ts left row
    # matches nothing, and the null-ts right row is never a match
    assert got[(None, 100)] is None
    assert got[("u1", 100)] == 2.0
    assert got[("u1", None)] is None


def test_asof_suffix_double_collision_raises(spark):
    from polaroam_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [("u1", 100, 1.0, 2.0)],
        "uid string, timestamp long, px double, px_right double",
    )
    right = spark.createDataFrame(
        [("u1", 50, 9.0)], "uid string, timestamp long, px double"
    )
    with pytest.raises(ValueError, match="duplicate column"):
        asof_join(left, right, on="uid")


def test_interval_join_shared_columns_suffixed(spark):
    from polaroam_spark.operators.joins import point_in_interval_join

    pts = spark.createDataFrame(
        [(1, 100, "p")], "pid long, timestamp long, label string"
    )
    ivals = spark.createDataFrame(
        [(50, 150, "i")], "t_start long, t_end long, label string"
    )
    inner = point_in_interval_join(pts, ivals, bucket_size=100)
    assert inner.columns.count("label") == 1
    assert "label_ival" in inner.columns
    row = inner.collect()[0]
    assert row.label == "p" and row.label_ival == "i"
    left = point_in_interval_join(
        pts, ivals, bucket_size=100, how="left", point_id="pid"
    )
    assert "label_ival" in left.columns  # not silently dropped


def test_interval_join_bad_bucket_size_raises(spark):
    from polaroam_spark.operators.joins import point_in_interval_join

    pts = spark.createDataFrame([(1, 100)], "pid long, timestamp long")
    ivals = spark.createDataFrame([(50, 150)], "t_start long, t_end long")
    with pytest.raises(ValueError, match="positive"):
        point_in_interval_join(pts, ivals, bucket_size=0)


def test_interval_overlap_join_dedup_and_bounds(spark):
    from polaroam_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame(
        [
            ("a", 1, 0, 250),      # spans 3 buckets at b=100
            ("a", 2, 400, 450),
            ("b", 3, 0, 100),
        ],
        "k string, lid long, t_start long, t_end long",
    )
    right = spark.createDataFrame(
        [
            ("a", 10, 200, 600),   # overlaps lid 1 (at 200..250) and 2
            ("a", 11, 260, 380),   # overlaps neither (gap)
            ("b", 12, 100, 120),   # touches lid 3 at the boundary
            ("c", 13, 0, 50),      # other key
        ],
        "k string, rid long, t_start long, t_end long",
    )
    out = interval_overlap_join(
        left, right, on="k", bucket_size=100
    )
    pairs = sorted((r.lid, r.rid) for r in out.collect())
    # each overlapping pair appears EXACTLY once despite sharing
    # multiple buckets (canonical-bucket dedup, no distinct)
    assert pairs == [(1, 10), (2, 10), (3, 12)]
    # suffix renames collide-free columns
    assert "t_start_r" in out.columns and "t_end_r" in out.columns

    # no key: global overlap join
    allp = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            left.drop("k"), right.drop("k"), bucket_size=100
        ).collect()
    )
    assert (3, 13) in allp and (1, 12) in allp

    import pytest

    with pytest.raises(ValueError):
        interval_overlap_join(left, right, bucket_size=0)
