"""Sketch aggregates: approx_count_distinct error bound vs exact."""

import pyspark.sql.functions as F


def test_approx_count_distinct_error_bound(spark):
    df = spark.range(0, 20000).select(
        (F.col("id") % 5).alias("g"), (F.col("id") % 3777).alias("u")
    )
    joined = (
        df.groupBy("g")
        .agg(
            F.approx_count_distinct("u", 0.02).alias("approx"),
            F.countDistinct("u").alias("exact"),
        )
        .collect()
    )
    for r in joined:
        assert abs(r.approx - r.exact) / r.exact < 0.05, r
