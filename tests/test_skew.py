"""Skew utilities: salted aggregation and hot-key salted join must be
result-identical to their plain counterparts."""

import pyspark.sql.functions as F
import pytest

from polaroam_spark.functions.skew import (
    hot_keys,
    salted_groupby_agg,
    salted_join_hot_keys,
    with_salt,
)


@pytest.fixture(scope="module")
def skewed(spark):
    rows = [("hot", float(i % 7), i) for i in range(500)]
    rows += [(f"cold{i}", float(i), i) for i in range(20)]
    return spark.createDataFrame(rows, "k string, v double, t long")


def test_with_salt_bounded(skewed):
    out = with_salt(skewed, 8).select("_salt").distinct().collect()
    vals = {r._salt for r in out}
    assert vals <= set(range(8)) and len(vals) > 1


def test_salted_agg_matches_plain(skewed):
    plain = {
        r.k: (r.n, r.sv, r.mn, r.mx)
        for r in skewed.groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("sv"),
            F.min("t").alias("mn"),
            F.max("t").alias("mx"),
        )
        .collect()
    }
    salted = {
        r.k: (r.n, r.sv, r.mn, r.mx)
        for r in salted_groupby_agg(
            skewed,
            ["k"],
            {
                "n": ("*", "count"),
                "sv": ("v", "sum"),
                "mn": ("t", "min"),
                "mx": ("t", "max"),
            },
            buckets=8,
        ).collect()
    }
    assert salted == plain


def test_non_algebraic_agg_rejected(skewed):
    with pytest.raises(ValueError):
        salted_groupby_agg(skewed, ["k"], {"m": ("v", "median")})


def test_hot_keys_detection(skewed):
    hot = {r.k for r in hot_keys(skewed, "k", threshold_rows=100).collect()}
    assert hot == {"hot"}


def test_salted_join_matches_plain(spark, skewed):
    small = spark.createDataFrame(
        [("hot", "H"), ("cold1", "C1"), ("cold2", "C2")],
        "k string, label string",
    )
    hot = hot_keys(skewed, "k", threshold_rows=100)
    plain = (
        skewed.join(small, on="k", how="inner")
        .groupBy("k", "label")
        .count()
        .collect()
    )
    salted = (
        salted_join_hot_keys(skewed, small, "k", hot, buckets=4)
        .groupBy("k", "label")
        .count()
        .collect()
    )
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))
