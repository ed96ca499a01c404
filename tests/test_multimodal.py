"""Multimodal plumbing: schemas, Arrow batch transforms, byte-sized
repartitioning, frame-sample planning — with the deterministic fake
codec (real codecs are stubbed, see operators/multimodal.py)."""

import math

import pyspark.sql.functions as F
import pytest

from polaroam_spark.operators.multimodal import (
    attach_media_meta,
    deterministic_fake_decode,
    extract_media_features,
    frame_sample_plan,
    media_repartition,
    strict_decode,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [(i, bytes([i % 256] * (100 * (i + 1)))) for i in range(5)]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    return attach_media_meta(df, kind="image", fmt="raw")


def test_meta_n_bytes_computed_jvm_side(media):
    out = {r.media_id: r.meta.n_bytes for r in media.collect()}
    assert out == {i: 100 * (i + 1) for i in range(5)}


def test_fake_decode_entropy():
    flat = deterministic_fake_decode(bytes([7] * 100), "image")
    assert flat["byte_entropy"] == 0.0
    assert flat["byte_mean"] == 7.0
    mixed = deterministic_fake_decode(bytes(range(256)), "image")
    assert abs(mixed["byte_entropy"] - 8.0) < 1e-9


def test_strict_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        strict_decode(b"...", "image")


def test_extract_features(media):
    out = {r.media_id: r for r in extract_media_features(media).collect()}
    assert out[3].byte_mean == 3.0
    assert out[3].byte_entropy == 0.0
    assert out[3].n_bytes == 400
    assert out[0].kind == "image"


def test_media_repartition_by_bytes(media):
    out = media_repartition(media, target_bytes_per_partition=500)
    assert out.count() == 5  # lossless
    assert out.rdd.getNumPartitions() >= 2  # 1500 bytes / 500 target


def test_frame_sample_plan(spark):
    df = spark.createDataFrame(
        [(1, b"v")], "media_id long, content binary"
    )
    vid = attach_media_meta(df, kind="video").withColumn(
        "meta",
        F.col("meta").withField("duration_s", F.lit(3.5)),
    )
    frames = frame_sample_plan(vid, every_n_seconds=1.0).collect()
    assert [r.frame_ts for r in frames] == [0.0, 1.0, 2.0]
