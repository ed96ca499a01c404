"""Multimodal column plumbing — image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The Spark-side design is fully real and tested: schemas, batch
iteration, partition sizing, and UDF signatures are exactly what a
production pipeline uses. Only the *codec* step is stubbed — the
image/audio libraries are not in this container — behind
``decode_fn`` hooks: the default ``deterministic_fake_decode``
produces a reproducible fake "decoded" payload from the bytes (so the
plumbing is testable end-to-end), and ``strict_decode`` raises
``NotImplementedError`` marking where PIL/ffmpeg plug in.

Scale design notes:
- binary payloads ride in parquet binary columns; target partition
  sizing with ``media_repartition`` by *cumulative byte size*, not row
  count (a 4 KB thumbnail and a 40 MB video must not be balanced by
  rows);
- metadata lives in a typed struct column, filterable without
  touching bytes (column pruning keeps scans cheap — a query on
  ``meta.width`` never reads the blob);
- transforms are ``mapInPandas`` so one Python worker sees an Arrow
  batch of rows, amortizing interpreter overhead.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical media row: opaque bytes + typed, promotable metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("kind", StringType()),  # image|audio|video
                    StructField("format", StringType()),
                    StructField("n_bytes", LongType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_s", DoubleType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_mean", DoubleType()),
        StructField("byte_entropy", DoubleType()),
        StructField("feature_hash", LongType()),
    ]
)


def strict_decode(content: bytes, kind: str):  # pragma: no cover - stub
    """Real-codec hook. Plug PIL / soundfile / ffmpeg here."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use deterministic_fake_decode for plumbing tests"
    )


def deterministic_fake_decode(content: bytes, kind: str) -> dict:
    """Reproducible stand-in decode: summary statistics of the raw
    bytes. Keeps the full pipeline runnable + assertable without
    codec libraries. Byte stats are vectorized (np.frombuffer +
    bincount — ~100x a per-byte Python loop on megabyte blobs), so
    the fake stays honest about per-row cost when a real codec
    replaces it."""
    import hashlib

    import numpy as np

    n = len(content)
    if n == 0:
        return {"byte_mean": 0.0, "byte_entropy": 0.0, "feature_hash": 0}
    arr = np.frombuffer(content, dtype=np.uint8)
    counts = np.bincount(arr, minlength=256)
    p = counts[counts > 0] / n
    entropy = float(-(p * np.log2(p)).sum())

    # md5-derived, NOT hash(): Python's bytes hash is salted per
    # process, which would break the "deterministic fake" contract
    digest = hashlib.md5(content).digest()
    return {
        "byte_mean": float(arr.mean()),
        "byte_entropy": entropy,
        "feature_hash": int.from_bytes(digest[:8], "big") >> 1,
    }


def attach_media_meta(
    df: DataFrame,
    content_col: str = "content",
    kind: str = "image",
    fmt: str = "raw",
) -> DataFrame:
    """Build the typed ``meta`` struct from an existing binary column.
    n_bytes comes from ``length`` on the binary column — computed
    JVM-side without shipping the payload to Python."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit(fmt).alias("format"),
            F.length(F.col(content_col)).cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("double").alias("duration_s"),
        ),
    )


def extract_media_features(
    media: DataFrame,
    decode_fn: Callable[[bytes, str], dict] = deterministic_fake_decode,
    batch_hint: int | None = None,
) -> DataFrame:
    """Per-media feature extraction over Arrow batches.

    ``decode_fn`` is called once per row inside ``mapInPandas`` —
    swap ``deterministic_fake_decode`` for a real codec wrapper.
    """

    def _extract(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                content = bytes(row["content"]) if row["content"] is not None else b""
                kind = row["meta"]["kind"] if row["meta"] is not None else "unknown"
                feats = decode_fn(content, kind)
                rows.append(
                    {
                        "media_id": row["media_id"],
                        "kind": kind,
                        "n_bytes": len(content),
                        "byte_mean": feats["byte_mean"],
                        "byte_entropy": feats["byte_entropy"],
                        "feature_hash": feats["feature_hash"],
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in FEATURE_SCHEMA.fields],
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def media_repartition(
    media: DataFrame,
    target_bytes_per_partition: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Repartition media rows so each partition holds roughly
    ``target_bytes_per_partition`` of payload — the correct sizing
    for blob columns where row count is a meaningless proxy.

    The byte cumsum runs per hash-shard (256 shards), NOT in one
    global window: a global ordered window would funnel every blob
    through a single task — an OOM at exactly the scale this helper
    exists for. Each shard range-partitions its own buckets;
    ``repartitionByRange`` keeps (shard, bucket) pairs in distinct
    partitions instead of hash-colliding them.
    """
    from pyspark.sql import Window

    sized = media.withColumn(
        "_sz", F.coalesce(F.col("meta.n_bytes"), F.lit(0))
    ).withColumn("_shard", F.pmod(F.xxhash64("media_id"), F.lit(256)))
    w = (
        Window.partitionBy("_shard")
        .orderBy(F.col("_sz").desc(), F.col("media_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bucketed = sized.withColumn(
        "_bucket",
        (F.sum("_sz").over(w) / F.lit(target_bytes_per_partition)).cast(
            "long"
        ),
    )
    n = bucketed.select("_shard", "_bucket").dropDuplicates().count()
    return (
        bucketed.repartitionByRange(
            max(int(n), 1), "_shard", "_bucket"
        ).drop("_sz", "_shard", "_bucket")
    )


def frame_sample_plan(
    media: DataFrame,
    every_n_seconds: float = 1.0,
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (media_id,
    frame_ts) the decoder should materialize — the shuffle-friendly
    half of frame extraction, computed natively from metadata; the
    decode itself plugs into ``extract_media_features``'s decode_fn.
    """
    n_frames = F.greatest(
        (F.col("meta.duration_s") / F.lit(float(every_n_seconds))).cast(
            "int"
        ),
        F.lit(1),
    )
    return (
        media.filter(F.col("meta.kind") == "video")
        .withColumn(
            "frame_ts",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_frames - 1),
                    lambda i: i.cast("double")
                    * F.lit(float(every_n_seconds)),
                )
            ),
        )
        .select("media_id", "frame_ts")
    )
