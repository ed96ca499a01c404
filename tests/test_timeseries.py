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


# ------------------------------------------------------------------ ewma
def test_ewma_recursion_exact(spark):
    from polaroam_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 0.0), ("b", 1, 5.0)],
        "k string, ts long, v double",
    )
    out = {
        (r.k, r.ts): r.ewma
        for r in ewma(df, "k", "ts", "v", alpha=0.5).collect()
    }
    assert out[("a", 1)] == 10.0
    assert out[("a", 2)] == 0.5 * 20.0 + 0.5 * 10.0
    assert out[("a", 3)] == 0.5 * 0.0 + 0.5 * 15.0
    assert out[("b", 1)] == 5.0


def test_ewma_duplicate_ts_min_collapse_and_nulls(spark):
    from polaroam_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [("a", 1, 4.0), ("a", 1, 2.0), ("a", 2, None), ("a", 3, 6.0),
         (None, 9, 1.0)],
        "k string, ts long, v double",
    )
    rows = ewma(df, "k", "ts", "v", alpha=0.25).collect()
    out = {(r.k, r.ts): r.ewma for r in rows}
    # (a,1) collapses to min 2.0; null value and null key rows dropped
    assert set(out) == {("a", 1), ("a", 3)}
    assert out[("a", 1)] == 2.0
    assert out[("a", 3)] == 0.25 * 6.0 + 0.75 * 2.0


def test_ewma_alpha_validation(spark):
    from polaroam_spark.operators.timeseries import ewma

    df = spark.createDataFrame([("a", 1, 1.0)], "k string, ts long, v double")
    with pytest.raises(ValueError):
        ewma(df, "k", "ts", "v", alpha=0.0)
    with pytest.raises(ValueError):
        ewma(df, "k", "ts", "v", alpha=1.5)


def test_ewma_nan_dropped_as_null(spark):
    """NaN-as-NULL policy: a NaN observation is dropped, never folded
    into the running value (it would poison every later y)."""
    from polaroam_spark.operators.timeseries import ewma, ewma_blocked

    df = spark.createDataFrame(
        [("a", 1, 2.0), ("a", 2, float("nan")), ("a", 3, 6.0)],
        "k string, ts long, v double",
    )
    for fn in (ewma, ewma_blocked):
        out = {(r.k, r.ts): r.ewma for r in fn(df, "k", "ts", "v", 0.25).collect()}
        assert set(out) == {("a", 1), ("a", 3)}
        assert out[("a", 3)] == 0.25 * 6.0 + 0.75 * 2.0


def test_ewma_blocked_bitwise_matches_fold(spark):
    """ewma_blocked must reproduce the fold's doubles BIT-FOR-BIT for
    a non-dyadic alpha (the hard case: any reordered or vectorized
    rewrite diverges in the last ulp), across multiple keys, duplicate
    timestamps, and Arrow batch boundaries."""
    import random

    from polaroam_spark.operators.timeseries import ewma, ewma_blocked

    random.seed(11)
    rows = []
    for k in range(6):
        for t in random.sample(range(100000), 400):
            rows.append((f"k{k}", t, round(random.uniform(-9, 9), 3)))
    rows.append(("k0", rows[0][1], 1e9))  # duplicate ts, loses to min
    df = spark.createDataFrame(rows, "k string, ts long, v double")
    # force several Arrow batches per partition
    df.sparkSession.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", "97"
    )
    try:
        a = ewma(df, "k", "ts", "v", alpha=0.3).collect()
        b = ewma_blocked(df, "k", "ts", "v", alpha=0.3).collect()
    finally:
        df.sparkSession.conf.unset(
            "spark.sql.execution.arrow.maxRecordsPerBatch"
        )
    key = lambda r: (r.k, r.ts)  # noqa: E731
    am = {key(r): r.ewma for r in a}
    bm = {key(r): r.ewma for r in b}
    assert am == bm  # exact float equality, not approx
    with pytest.raises(ValueError):
        ewma_blocked(df, "k", "ts", "v", alpha=0.0)


# -------------------------------------------------------- rolling_zscore
def test_rolling_zscore_flags_planted_outlier(spark):
    from polaroam_spark.operators.timeseries import rolling_zscore

    rows = [("a", t, 10.0 + (t % 3)) for t in range(1, 21)]
    rows.append(("a", 21, 500.0))  # planted spike
    df = spark.createDataFrame(rows, "k string, ts long, v double")
    out = rolling_zscore(
        df, "k", "ts", "v", window=10, min_periods=5, threshold=3.0
    ).collect()
    by_ts = {r.ts: r for r in out}
    assert by_ts[21].is_anomaly
    assert by_ts[21].zscore > 3.0
    # warm-up rows (fewer than min_periods preceding) have NULL score
    for t in range(1, 6):
        assert by_ts[t].zscore is None
        assert by_ts[t].is_anomaly is False
    # normal rows in steady state are not anomalous
    assert not by_ts[15].is_anomaly


def test_rolling_zscore_excludes_current_row(spark):
    from polaroam_spark.operators.timeseries import rolling_zscore

    # constant history then a jump: if the current row leaked into its
    # own baseline, the variance would be nonzero and z finite but
    # diluted; with the exclusive frame history is constant -> var 0
    # -> NULL score for the jump over an all-constant window
    rows = [("a", t, 7.0) for t in range(1, 11)] + [("a", 11, 100.0)]
    df = spark.createDataFrame(rows, "k string, ts long, v double")
    out = {r.ts: r for r in rolling_zscore(df, "k", "ts", "v", 5, 3, 2.0).collect()}
    assert out[11].zscore is None  # zero-variance baseline
    assert out[11].is_anomaly is False


def test_rolling_zscore_param_validation(spark):
    from polaroam_spark.operators.timeseries import rolling_zscore

    df = spark.createDataFrame([("a", 1, 1.0)], "k string, ts long, v double")
    with pytest.raises(ValueError):
        rolling_zscore(df, "k", "ts", "v", window=4, min_periods=5)
    with pytest.raises(ValueError):
        rolling_zscore(df, "k", "ts", "v", window=0)
