"""validate_expectations / enforce_expectations."""

import pyspark.sql.functions as F
import pytest


def test_validate_expectations_null_counts_as_fail(spark):
    from polaroam_spark.operators.validation import validate_expectations

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (None, 5.0)],
        "id long, v double",
    )
    report = {
        r.rule: r
        for r in validate_expectations(
            df,
            {
                "id_present": F.col("id").isNotNull(),
                "v_positive": F.col("v") > 0,  # NULL v -> fail
            },
        ).collect()
    }
    assert report["id_present"].n_pass == 2
    assert report["id_present"].n_fail == 1
    assert report["v_positive"].n_pass == 2  # the NULL row fails
    assert abs(report["v_positive"].pass_rate - 2 / 3) < 1e-12
    with pytest.raises(ValueError):
        validate_expectations(df, {})


def test_enforce_expectations_raises_with_rule_names(spark):
    from polaroam_spark.operators.validation import enforce_expectations

    df = spark.createDataFrame([(1,), (None,)], "id long")
    rules = {"id_present": F.col("id").isNotNull()}
    with pytest.raises(ValueError, match="id_present"):
        enforce_expectations(df, rules)
    # passes at a tolerant threshold and returns the frame unchanged
    out = enforce_expectations(df, rules, min_pass_rate=0.5)
    assert out.count() == 2


def test_validation_empty_batch_passes_vacuously(spark):
    from polaroam_spark.operators.validation import (
        enforce_expectations,
        validate_expectations,
    )

    empty = spark.createDataFrame([], "id long")
    rules = {"id_present": F.col("id").isNotNull()}
    report = validate_expectations(empty, rules).collect()[0]
    assert report.n_rows == 0 and report.n_pass == 0
    assert report.pass_rate == 1.0
    # an empty ingest increment must not quarantine
    out = enforce_expectations(empty, rules)
    assert out.count() == 0
