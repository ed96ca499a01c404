"""resample_interpolate: grid alignment, interpolation exactness,
LOCF, duplicate collapse, per-key isolation."""

import pytest


def test_linear_interpolation_basic(spark):
    from polaroam_spark.operators.timeseries import resample_interpolate

    df = spark.createDataFrame(
        [("a", 95, 10.0), ("a", 205, 32.0)],
        "k string, ts long, v double",
    )
    out = {
        r.ts: r.v
        for r in resample_interpolate(df, "k", "ts", "v", 100).collect()
    }
    # grid: 100, 200 — both inside [95, 205]
    assert set(out) == {100, 200}
    assert abs(out[100] - (10.0 + 22.0 * 5 / 110)) < 1e-12
    assert abs(out[200] - (10.0 + 22.0 * 105 / 110)) < 1e-12


def test_exact_at_observation_points(spark):
    from polaroam_spark.operators.timeseries import resample_interpolate

    df = spark.createDataFrame(
        [("a", 100, 1.1), ("a", 200, 2.2), ("a", 300, 3.3)],
        "k string, ts long, v double",
    )
    out = {
        r.ts: r.v
        for r in resample_interpolate(df, "k", "ts", "v", 100).collect()
    }
    assert out == {100: 1.1, 200: 2.2, 300: 3.3}


def test_locf_and_duplicate_min_collapse(spark):
    from polaroam_spark.operators.timeseries import resample_interpolate

    df = spark.createDataFrame(
        [("a", 0, 5.0), ("a", 0, 3.0), ("a", 250, 9.0)],
        "k string, ts long, v double",
    )
    out = {
        r.ts: r.v
        for r in resample_interpolate(
            df, "k", "ts", "v", 100, how="locf"
        ).collect()
    }
    # dup ts 0 collapses to min=3.0; LOCF holds it until 250
    assert out == {0: 3.0, 100: 3.0, 200: 3.0}


def test_keys_are_isolated_and_sparse_key_empty(spark):
    from polaroam_spark.operators.timeseries import resample_interpolate

    df = spark.createDataFrame(
        [("a", 100, 1.0), ("a", 300, 3.0), ("b", 130, 7.0), ("b", 180, 9.0)],
        "k string, ts long, v double",
    )
    rows = resample_interpolate(df, "k", "ts", "v", 100).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.k, {})[r.ts] = r.v
    assert set(by_key["a"]) == {100, 200, 300}
    assert abs(by_key["a"][200] - 2.0) < 1e-12
    # key b's range [130, 180] contains no multiple of 100 -> no rows
    assert "b" not in by_key


def test_rejects_bad_args(spark):
    from polaroam_spark.operators.timeseries import resample_interpolate

    df = spark.createDataFrame([("a", 0, 1.0)], "k string, ts long, v double")
    with pytest.raises(ValueError):
        resample_interpolate(df, "k", "ts", "v", 100, how="cubic")
    with pytest.raises(ValueError):
        resample_interpolate(df, "k", "ts", "v", 0)
