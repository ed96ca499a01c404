"""Vector functions: norms, normalization, int8 quantization."""

import math

import pyspark.sql.functions as F
import pytest

from polaroam_spark.functions.vectors import (
    cosine_similarity,
    dequantize_int8,
    l2_norm,
    l2_normalize,
    quantize_int8,
)


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(
        [
            (0, [3.0, 4.0]),
            (1, [0.0, 0.0]),
            (2, [-1.0, 2.0, -3.0]),
        ],
        "vid long, v array<double>",
    )


def test_l2_normalize(vecs):
    out = {r.vid: r.n for r in vecs.select(
        "vid", l2_normalize("v").alias("n")).collect()}
    assert out[0] == [0.6, 0.8]
    assert out[1] == [0.0, 0.0]  # zero vector untouched, no NaN
    assert abs(math.sqrt(sum(x * x for x in out[2])) - 1.0) < 1e-12


def test_quantize_roundtrip_error_bound(vecs):
    out = vecs.select(
        "vid",
        "v",
        dequantize_int8(quantize_int8("v")).alias("back"),
        quantize_int8("v").alias("q"),
    ).collect()
    for r in out:
        scale = r.q.scale
        assert all(-127 <= c <= 127 for c in r.q.codes)
        for orig, back in zip(r.v, r.back):
            assert abs(orig - back) <= scale / 2 + 1e-12
    zero = [r for r in out if r.vid == 1][0]
    assert zero.q.scale == 0.0 and zero.back == [0.0, 0.0]


def test_quantized_cosine_close_to_exact(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    rows = [(i, rng.standard_normal(32).tolist()) for i in range(20)]
    df = spark.createDataFrame(rows, "vid long, v array<double>")
    pair = df.alias("a").crossJoin(df.alias("b")).filter(
        F.col("a.vid") < F.col("b.vid")
    ).limit(50)
    out = pair.select(
        cosine_similarity(F.col("a.v"), F.col("b.v")).alias("exact"),
        cosine_similarity(
            dequantize_int8(quantize_int8(F.col("a.v"))),
            dequantize_int8(quantize_int8(F.col("b.v"))),
        ).alias("approx"),
    ).collect()
    for r in out:
        assert abs(r.exact - r.approx) < 0.02


def test_arrow_scorer_null_vectors_score_null(spark):
    from polaroam_spark.functions.vectors import (
        cosine_similarity,
        cosine_similarity_arrow,
    )
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], [1.0, 0.0]),
            (2, None, [1.0, 0.0]),
            (3, [0.0, 1.0], None),
        ],
        "i long, a array<double>, b array<double>",
    )
    udf = cosine_similarity_arrow()
    got = {
        r.i: r.c
        for r in df.select("i", udf("a", "b").alias("c")).collect()
    }
    nat = {
        r.i: r.c
        for r in df.select(
            "i", cosine_similarity("a", "b").alias("c")
        ).collect()
    }
    assert got[2] is None and got[3] is None
    assert nat[2] is None and nat[3] is None
    assert abs(got[1] - 1.0) < 1e-12
