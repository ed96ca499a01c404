"""Multimodal column plumbing — image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The Spark-side design is fully real and tested: schemas, batch
iteration, partition sizing, and UDF signatures are exactly what a
production pipeline uses. Codecs plug in behind ``decode_fn`` hooks:
``strict_decode`` really decodes images (Pillow when installed, else
a pure-stdlib PNG decoder — full filter support, no optional deps)
and raises a clear ``NotImplementedError`` for audio/video, whose
libraries are not bundled; ``deterministic_fake_decode`` produces a
reproducible fake payload from the raw bytes for oracle-gated
plumbing tests.

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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
#: PNG color_type -> samples per pixel (8-bit, non-palette).
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _unfilter_png_scanlines(
    raw: bytes, height: int, stride: int, bpp: int
) -> bytes:
    """Reverse the five PNG scanline filters (None/Sub/Up/Average/
    Paeth, PNG spec §6). Sequential per-byte reconstruction — each
    byte depends on the already-reconstructed left/up neighbors — so
    this is a plain loop; the PIL path below is the production-speed
    codec, this one exists so PNG decoding works with zero optional
    deps."""
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(height):
        ftype = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"invalid PNG filter type {ftype}")
        out += line
        prev = line
    return bytes(out)


def _decode_png_stdlib(content: bytes) -> "tuple":
    """Decode a non-interlaced 8-bit PNG (greyscale / RGB /
    grey+alpha / RGBA) with stdlib ``zlib``/``struct`` only. Returns
    ``(pixels: np.ndarray[h, w, c] uint8, width, height, channels)``.
    Palette, 16-bit, and interlaced PNGs need Pillow and raise
    ``NotImplementedError``."""
    import struct
    import zlib

    import numpy as np

    if content[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG byte stream")
    pos = 8
    width = height = color_type = None
    idat = bytearray()
    while pos + 8 <= len(content):
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _c, _f, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if bit_depth != 8 or interlace != 0:
                raise NotImplementedError(
                    "stdlib PNG path handles 8-bit non-interlaced only; "
                    "install Pillow for other variants"
                )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    channels = _PNG_CHANNELS.get(color_type)
    if width is None or channels is None:
        raise NotImplementedError(
            f"unsupported PNG color_type {color_type}; "
            "install Pillow for palette PNGs"
        )
    stride = width * channels
    flat = _unfilter_png_scanlines(
        zlib.decompress(bytes(idat)), height, stride, channels
    )
    pixels = np.frombuffer(flat, dtype=np.uint8).reshape(
        height, width, channels
    )
    return pixels, width, height, channels


def _pixel_features(pixels, width: int, height: int, channels: int) -> dict:
    """Feature dict over DECODED pixel bytes (same stat definitions as
    ``deterministic_fake_decode``, but post-codec, so two encodings of
    the same image agree)."""
    import hashlib

    import numpy as np

    flat = np.ascontiguousarray(pixels).reshape(-1)
    counts = np.bincount(flat, minlength=256)
    p = counts[counts > 0] / flat.size
    digest = hashlib.md5(flat.tobytes()).digest()
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "byte_mean": float(flat.mean()),
        "byte_entropy": float(-(p * np.log2(p)).sum()),
        "feature_hash": int.from_bytes(digest[:8], "big") >> 1,
    }


def _decode_pixel_array(content: bytes):
    """Decode to an (h, w, c) uint8 pixel array: Pillow when
    importable (any format PIL reads), else the stdlib PNG decoder
    above. Raises ``NotImplementedError`` for formats neither path
    can read — including bytes Pillow cannot identify (PIL's own
    UnidentifiedImageError never escapes: callers are promised ONE
    exception type for undecodable media regardless of environment).

    Pixel-fidelity contract (same for both paths): palette images
    are expanded to true RGB/RGBA pixels — feeding palette INDICES
    downstream would make two encodings of the same image disagree —
    and >8-bit depths raise rather than silently clipping (the
    stdlib path only reads 8-bit, so clipping on the Pillow path
    would diverge by environment)."""
    import numpy as np

    try:
        from PIL import Image
    except ImportError:
        Image = None
    if Image is not None:
        import io

        arr = None
        try:
            with Image.open(io.BytesIO(content)) as img:
                if img.mode == "P":
                    img = img.convert(
                        "RGBA" if "transparency" in img.info else "RGB"
                    )
                elif img.mode == "PA":
                    img = img.convert("RGBA")
                arr = np.asarray(img)
            if arr.dtype != np.uint8:
                raise NotImplementedError(
                    f"only 8-bit images are supported (got mode "
                    f"{img.mode!r}, dtype {arr.dtype}) — matching the "
                    "stdlib decoder's 8-bit-only contract"
                )
        except NotImplementedError:
            raise
        except Exception:
            arr = None  # unreadable by Pillow — try stdlib, else raise
        if arr is not None:
            if arr.ndim == 2:
                arr = arr[:, :, None]
            return arr
    if content[:8] == _PNG_MAGIC:
        pixels, w, h, c = _decode_png_stdlib(content)
        return pixels
    raise NotImplementedError(
        "no codec could read this image: "
        + (
            "Pillow could not identify the bytes"
            if Image is not None
            else "Pillow is not installed"
        )
        + " and the stdlib fallback reads PNG only"
    )


def decode_image(content: bytes) -> dict:
    """Real image decode to the feature dict (see
    :func:`_decode_pixel_array` for the codec paths and the
    pixel-fidelity contract)."""
    arr = _decode_pixel_array(content)
    h, w, c = arr.shape
    return _pixel_features(arr, w, h, c)


def strict_decode(content: bytes, kind: str) -> dict:
    """Real-codec decode hook (the production counterpart of
    ``deterministic_fake_decode``). Images decode via Pillow or the
    stdlib PNG path; audio/video codecs (soundfile / ffmpeg) are not
    bundled and raise with a clear message. The returned dict is a
    superset of the fake's keys, so it drops into
    ``extract_media_features(decode_fn=strict_decode)`` unchanged."""
    if kind == "image":
        return decode_image(content)
    raise NotImplementedError(
        f"no {kind!r} codec available in this environment (audio/video "
        "decoding requires soundfile/ffmpeg); use "
        "deterministic_fake_decode for plumbing tests"
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
    probe_headers: bool = False,
) -> DataFrame:
    """Build the typed ``meta`` struct from an existing binary column.
    n_bytes comes from ``length`` on the binary column — computed
    JVM-side without shipping the payload to Python.

    ``probe_headers=True`` additionally sniffs the payload's magic
    bytes with the pure-expression header parsers
    (:func:`png_dimensions`, :func:`wav_header_meta`,
    :func:`mp4_header_meta`) and fills kind/format/width/height/
    duration_s from whichever format matches — still zero decode,
    zero Python, tens of bytes read per row. Rows matching no known
    header keep the caller-supplied ``kind``/``fmt`` defaults and
    NULL dimensions. Default False: the caller-declared constants
    are the contract when the corpus is pre-sorted by modality (and
    what the existing gates pin)."""
    c = F.col(content_col)
    if not probe_headers:
        return df.withColumn(
            "meta",
            F.struct(
                F.lit(kind).alias("kind"),
                F.lit(fmt).alias("format"),
                F.length(c).cast("long").alias("n_bytes"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("double").alias("duration_s"),
            ),
        )
    png = png_dimensions(content_col)
    jpg = jpeg_dimensions(content_col)
    gif = gif_dimensions(content_col)
    wav = wav_header_meta(content_col)
    mp4 = mp4_header_meta(content_col)
    is_image = png["is_png"] | jpg["is_jpeg"] | gif["is_gif"]
    return df.withColumn(
        "meta",
        F.struct(
            F.when(is_image, F.lit("image"))
            .when(wav["is_wav"], F.lit("audio"))
            .when(mp4["is_mp4"], F.lit("video"))
            .otherwise(F.lit(kind))
            .alias("kind"),
            F.when(png["is_png"], F.lit("png"))
            .when(jpg["is_jpeg"], F.lit("jpeg"))
            .when(gif["is_gif"], F.lit("gif"))
            .when(wav["is_wav"], F.lit("wav"))
            .when(mp4["is_mp4"], F.lit("mp4"))
            .otherwise(F.lit(fmt))
            .alias("format"),
            F.length(c).cast("long").alias("n_bytes"),
            F.coalesce(png["width"], jpg["width"], gif["width"])
            .cast("int")
            .alias("width"),
            F.coalesce(png["height"], jpg["height"], gif["height"])
            .cast("int")
            .alias("height"),
            F.coalesce(
                wav["duration_s"], mp4["duration_s"]
            ).alias("duration_s"),
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


def png_dimensions(content) -> "Column":
    """``struct<is_png, width, height>`` parsed from a binary column's
    PNG header — PURE Column expressions (substring on binary → hex →
    base-16 conv), no UDF, no decode: the IHDR width/height live at
    fixed offsets 17–20/21–24 big-endian, so sizing a 100 TB image
    corpus reads 24 bytes per row inside whole-stage codegen instead
    of decompressing pixels. Non-PNG bytes yield
    ``(false, NULL, NULL)``.
    """
    from pyspark.sql import functions as F

    c = F.col(content) if isinstance(content, str) else content
    # coalesce: NULL bytes must verdict FALSE, not NULL — a NULL
    # verdict vanishes from both filter(is_png) and filter(~is_png),
    # breaking kept+rejected accounting (same contract as
    # gopher_quality_flags)
    is_png = F.coalesce(
        F.hex(F.substring(c, 1, 8)) == "89504E470D0A1A0A",
        F.lit(False),
    )
    be32 = lambda pos: F.conv(  # noqa: E731
        F.hex(F.substring(c, pos, 4)), 16, 10
    ).cast("long")
    return F.struct(
        is_png.alias("is_png"),
        F.when(is_png, be32(17)).alias("width"),
        F.when(is_png, be32(21)).alias("height"),
    )


def _tag_hex(c, pos) -> "Column":
    """Hex string of the 4 bytes at 1-based Column position ``pos``."""
    from pyspark.sql import functions as F

    return F.hex(c.substr(pos, F.lit(4)))


def _be_uint(c, pos, nbytes: int) -> "Column":
    """Big-endian unsigned int of ``nbytes`` at Column position.
    try_cast, not cast: an 8-byte field ≥ 2^63 (garbage or a
    pathological mvhd duration) conv's to a decimal string that an
    ANSI cast-to-long would ERROR on; NULL is the right verdict."""
    from pyspark.sql import functions as F

    return F.conv(
        F.hex(c.substr(pos, F.lit(nbytes))), 16, 10
    ).try_cast("long")


def _le_uint(c, pos, nbytes: int) -> "Column":
    """Little-endian unsigned int at Column position: hex the bytes,
    reverse the hex PAIRS (pair order = byte order), conv base 16."""
    from pyspark.sql import functions as F

    h = F.hex(c.substr(pos, F.lit(nbytes)))
    pairs = [
        F.substring(h, 2 * i + 1, 2) for i in reversed(range(nbytes))
    ]
    return F.conv(F.concat(*pairs), 16, 10).try_cast("long")


def _walk_offsets(step_fn, start, max_steps: int) -> "Column":
    """1-based offsets of up to ``max_steps`` consecutive
    chunks/boxes: ``F.aggregate`` over a STATIC sequence appends
    ``step_fn(last_offset)`` each iteration, so the walk runs at
    RUNTIME inside one expression — an unrolled Python loop would
    re-embed the whole previous-offset tree in every step's size
    read (~5 copies per level = 5^n nodes) and OOM the analyzer
    before ever executing. A null step (truncated/absent structure)
    poisons the remaining offsets to null, which every downstream
    tag probe treats as not-found. Offsets above ~2^31 are nulled
    the same way rather than passed through: a garbage 4-byte size
    field can claim a multi-GB chunk, and ``substr``'s position is
    an int — under ANSI mode the overflow would ERROR an entire
    100 TB scan off one corrupt blob (caught by the truncation-fuzz
    test, not hypothetically)."""
    from pyspark.sql import functions as F

    # sequence(1, max_steps-1) must ascend: Spark's sequence(1, 0)
    # DESCENDS [1, 0], which would append two extra steps instead of
    # zero for max_steps=1 — reject rather than walk wrong
    if int(max_steps) < 2:
        raise ValueError(
            f"max_steps must be >= 2, got {max_steps}: a 1-step walk "
            "is just the start offset — use F.array(start) directly"
        )

    def _step(prev):
        nxt = step_fn(prev)
        return F.when(nxt <= F.lit(2_147_483_000), nxt)

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(int(max_steps) - 1)),
        F.array(start.cast("long")),
        lambda acc, _: F.concat(
            acc, F.array(_step(F.element_at(acc, -1)))
        ),
    )


def _first_with_tag(c, offs, tag_hex: str, tag_at: int = 0) -> "Column":
    """First offset in ``offs`` whose 4-byte tag at ``offset +
    tag_at`` hex-matches; NULL if none (F.get, not element_at — the
    latter throws on empty arrays under ANSI mode)."""
    from pyspark.sql import functions as F

    return F.get(
        F.filter(
            offs,
            lambda o: F.hex(c.substr(o + tag_at, F.lit(4)))
            == F.lit(tag_hex),
        ),
        0,
    )


#: SOF marker bytes that carry frame dimensions (C4=DHT, C8=JPG
#: extension, CC=DAC are NOT frame headers and are excluded).
_JPEG_SOF_MARKERS = (
    "C0", "C1", "C2", "C3", "C5", "C6", "C7",
    "C9", "CA", "CB", "CD", "CE", "CF",
)


def jpeg_dimensions(content, max_segments: int = 32) -> "Column":
    """``struct<is_jpeg, width, height>`` parsed from a binary
    column's JPEG segment list — PURE Column expressions, mm2 style.
    JPEG has no fixed-offset dimensions: SOI (FFD8) is followed by
    variable-length segments (``FF`` + marker + 2-byte BE length
    including itself — APPn/EXIF blobs, COM, DQT, DHT...) and the
    frame size lives in the first SOF marker, wherever the metadata
    pushed it. The walk (runtime loop via :func:`_walk_offsets`)
    steps ``offset += 2 + len`` for up to ``max_segments`` segments
    and DIES (nulls the offset) at SOS/EOI or any non-``FF`` byte —
    entropy-coded data after SOS contains byte patterns that would
    otherwise false-positive as markers. Width/height are the
    big-endian 16-bit fields at SOF+8/+6 (precision byte first,
    HEIGHT before width — the spec's order, a classic swap bug).
    Non-JPEG bytes yield ``(false, NULL, NULL)``; NULL content
    verdicts false. A JPEG whose SOF sits beyond ``max_segments``
    metadata segments yields NULL dimensions, never wrong ones."""
    from pyspark.sql import functions as F

    c = F.col(content) if isinstance(content, str) else content
    is_jpeg = F.coalesce(
        F.hex(c.substr(F.lit(1), F.lit(2))) == "FFD8", F.lit(False)
    )

    def marker_at(o):
        return F.hex(c.substr(o + 1, F.lit(1)))

    def step(o):
        ok = (
            (F.hex(c.substr(o, F.lit(1))) == "FF")
            & (marker_at(o) != F.lit("DA"))  # SOS: entropy data next
            & (marker_at(o) != F.lit("D9"))  # EOI
        )
        return F.when(ok, o + 2 + _be_uint(c, o + 2, 2))

    offs = _walk_offsets(step, F.lit(3), max_segments)
    sof = F.get(
        F.filter(
            offs,
            lambda o: (F.hex(c.substr(o, F.lit(1))) == "FF")
            & marker_at(o).isin(*_JPEG_SOF_MARKERS),
        ),
        0,
    )
    return F.struct(
        is_jpeg.alias("is_jpeg"),
        F.when(is_jpeg, _be_uint(c, sof + 7, 2)).alias("width"),
        F.when(is_jpeg, _be_uint(c, sof + 5, 2)).alias("height"),
    )


def gif_dimensions(content) -> "Column":
    """``struct<is_gif, width, height>`` from a binary column's GIF
    logical-screen descriptor — fixed offsets (width LE16 at byte 7,
    height at 9, right after the ``GIF87a``/``GIF89a`` magic), the
    cheapest member of the header-parser family. Non-GIF bytes yield
    ``(false, NULL, NULL)``; NULL content verdicts false."""
    from pyspark.sql import functions as F

    c = F.col(content) if isinstance(content, str) else content
    is_gif = F.coalesce(
        F.hex(c.substr(F.lit(1), F.lit(6))).isin(
            "474946383761", "474946383961"
        ),
        F.lit(False),
    )
    return F.struct(
        is_gif.alias("is_gif"),
        F.when(is_gif, _le_uint(c, F.lit(7), 2)).alias("width"),
        F.when(is_gif, _le_uint(c, F.lit(9), 2)).alias("height"),
    )


def wav_header_meta(content, max_chunks: int = 8) -> "Column":
    """``struct<is_wav, audio_format, num_channels, sample_rate,
    bits_per_sample, data_bytes, duration_s>`` parsed from a binary
    column's RIFF/WAVE headers — PURE Column expressions (mm2 /
    :func:`png_dimensions` style): no UDF, no decode, no audio
    library. The RIFF chunk list is walked (runtime loop via
    :func:`_walk_offsets`; each chunk header is id(4) + size(4, LE),
    payload padded to even length) for up to ``max_chunks`` chunks,
    picking up the ``fmt `` field block and the ``data`` chunk size
    wherever they sit — fixed-offset parsers silently misread files
    that lead with LIST/INFO chunks. Sizing a 100 TB audio corpus
    this way reads tens of bytes per row JVM-side;
    ``duration_s = data_bytes / byte_rate`` needs no sample decoded.
    Non-WAV bytes (or WAVs whose fmt/data chunks sit beyond
    ``max_chunks``) yield ``(false, NULL, ...)`` / NULL fields; NULL
    content verdicts false, matching the kept+rejected accounting
    contract of ``png_dimensions``."""
    from pyspark.sql import functions as F

    c = F.col(content) if isinstance(content, str) else content
    is_wav = F.coalesce(
        (F.hex(c.substr(F.lit(1), F.lit(4))) == "52494646")
        & (F.hex(c.substr(F.lit(9), F.lit(4))) == "57415645"),
        F.lit(False),
    )

    def le32_at(pos):
        return _le_uint(c, pos, 4)

    # FAST PATH (r8 verdict #8): virtually every muxer writes "fmt "
    # as the FIRST chunk (offset 13) with "data" immediately after
    # it, which makes both offsets fixed arithmetic on the fmt size —
    # a pure substr/conv chain that whole-stage codegen compiles,
    # with no interpreted higher-order function anywhere. coalesce is
    # lazy per row, so the F.aggregate walk below only evaluates for
    # the rows that do NOT match the canonical layout (LIST/INFO-led
    # files, oversized fmt extensions) — and finds the same offsets
    # the fast probes would have (fmt at 13 IS the first fmt; data
    # right after the first chunk IS the first data).
    fast_fmt = F.when(
        F.hex(c.substr(F.lit(13), F.lit(4))) == "666D7420",
        F.lit(13).cast("long"),
    )
    fmt_size0 = le32_at(F.lit(17))
    after_fmt = F.when(
        fast_fmt.isNotNull()
        & fmt_size0.isNotNull()
        & (fmt_size0 <= 4096),  # real fmt is 16/18/40 B; garbage walks
        (F.lit(21) + fmt_size0 + F.pmod(fmt_size0, 2)).cast("int"),
    )
    fast_data = F.when(
        F.hex(c.substr(after_fmt, F.lit(4))) == "64617461", after_fmt
    ).cast("long")

    offs = _walk_offsets(
        lambda o: o + 8 + le32_at(o + 4) + F.pmod(le32_at(o + 4), 2),
        F.lit(13),
        max_chunks,
    )
    fmt_off = F.coalesce(
        fast_fmt, _first_with_tag(c, offs, "666D7420")  # "fmt "
    )
    data_off = F.coalesce(
        fast_data, _first_with_tag(c, offs, "64617461")  # "data"
    )
    data_size = le32_at(data_off + 4)
    byte_rate = le32_at(fmt_off + 16)
    dur = F.when(
        byte_rate > 0,
        data_size.cast("double") / byte_rate.cast("double"),
    )
    return F.struct(
        is_wav.alias("is_wav"),
        F.when(is_wav, _le_uint(c, fmt_off + 8, 2)).alias("audio_format"),
        F.when(is_wav, _le_uint(c, fmt_off + 10, 2)).alias("num_channels"),
        F.when(is_wav, _le_uint(c, fmt_off + 12, 4)).alias("sample_rate"),
        F.when(is_wav, _le_uint(c, fmt_off + 22, 2)).alias(
            "bits_per_sample"
        ),
        F.when(is_wav, data_size).alias("data_bytes"),
        F.when(is_wav, dur).alias("duration_s"),
    )


def mp4_header_meta(
    content, max_boxes: int = 8, max_moov_children: int = 4
) -> "Column":
    """``struct<is_mp4, mvhd_version, timescale, duration,
    duration_s>`` parsed from a binary column's ISO-BMFF (MP4/MOV)
    box tree — PURE Column expressions, no UDF, no ffmpeg. Walks up
    to ``max_boxes`` top-level boxes (header = size(4, BE) +
    type(4); runtime loop via :func:`_walk_offsets`) to find
    ``moov``, then up to ``max_moov_children`` of its children to
    find ``mvhd``, whose version decides the layout (v0:
    timescale@+20 dur32@+24; v1: timescale@+28 dur64@+32 — the
    64-bit create/modify times shift everything). The walk is
    offset-arithmetic on box sizes, so it lands on ``moov`` whether
    the muxer wrote it faststart (front) or trailer (end) — no
    byte-pattern search that could false-positive inside ``mdat``
    payload bytes. A box with size < 8 (including the size==1
    64-bit-largesize escape, which never applies to the tiny moov)
    NULLs the running offset and the walk dies cleanly. Non-MP4
    bytes yield ``(false, NULL, ...)``; NULL content verdicts
    false."""
    from pyspark.sql import functions as F

    c = F.col(content) if isinstance(content, str) else content
    is_mp4 = F.coalesce(
        _tag_hex(c, F.lit(5)) == "66747970", F.lit(False)
    )

    def box_step(o):
        size = _be_uint(c, o, 4)
        return o + F.when(size >= 8, size)

    top = _walk_offsets(box_step, F.lit(1), max_boxes)
    moov_off = _first_with_tag(c, top, "6D6F6F76", tag_at=4)  # "moov"
    kids = _walk_offsets(box_step, moov_off + 8, max_moov_children)
    mvhd_off = _first_with_tag(c, kids, "6D766864", tag_at=4)  # "mvhd"
    version = _be_uint(c, mvhd_off + 8, 1)
    timescale = F.when(version == 0, _be_uint(c, mvhd_off + 20, 4)).when(
        version == 1, _be_uint(c, mvhd_off + 28, 4)
    )
    duration = F.when(version == 0, _be_uint(c, mvhd_off + 24, 4)).when(
        version == 1, _be_uint(c, mvhd_off + 32, 8)
    )
    dur_s = F.when(
        timescale > 0, duration.cast("double") / timescale.cast("double")
    )
    return F.struct(
        is_mp4.alias("is_mp4"),
        F.when(is_mp4, version).alias("mvhd_version"),
        F.when(is_mp4, timescale).alias("timescale"),
        F.when(is_mp4, duration).alias("duration"),
        F.when(is_mp4, dur_s).alias("duration_s"),
    )


def _let(value, fn) -> "Column":
    """LET-BINDING for Column expressions: evaluate ``value`` once
    and hand it to ``fn`` as a HOF lambda VARIABLE (``transform``
    over a one-element array, then ``get(…, 0)``). Column references
    in the DataFrame API are TREES — every re-use of a sub-Column
    copies its whole subtree, so a chain of derived offsets (VINT
    length → size position → size → payload …) grows multiplicatively
    and a deep parser OOMs the py4j plan BUILD before Spark ever sees
    it (hit for real by mkv_header_meta's first draft). A lambda
    variable is a single leaf node no matter how often the body
    references it, which makes the tree linear in the number of
    bindings. Runtime cost: a one-element array per binding inside
    the interpreted HOF evaluator — noise against the header-probe
    substrs around it."""
    from pyspark.sql import functions as F

    return F.get(F.transform(F.array(value), fn), 0)


def _vint_len(c, pos) -> "Column":
    """EBML VINT length from the leading byte's first set bit
    (Matroska/EBML spec, RFC 8794 §4): ``1xxx xxxx`` → 1 byte,
    ``01xx`` → 2, ... ``0000 0001`` → 8, computed arithmetically as
    ``8 − floor(log2(lead))`` (exact: log2 of an integer in 1..255
    floors correctly in double); a 0x00 lead byte is invalid and
    NULLs (poisoning the walk, the mm3 die-cleanly contract).
    Deliberately _let-free: it sits inside every _vint_val/_let
    chain and each binding level costs analyzer resolution
    iterations (see _let) — the lead byte is re-read twice instead."""
    from pyspark.sql import functions as F

    b = _be_uint(c, pos, 1)
    return F.when(b > 0, (F.lit(8) - F.floor(F.log2(b))).cast("long"))


def _vint_val(c, pos) -> "Column":
    """EBML VINT data value at Column position: read the length from
    the lead byte, big-endian the whole field, clear the marker bit
    (``raw − 2^(7·len)``). The all-ones value is the spec's
    "unknown size" — NULLed, so a walk over an unknown-sized parent
    dies cleanly instead of striding garbage. _let-free by the same
    budget as :func:`_vint_len` — callers pass lambda-variable-based
    positions, so the ~6 duplicated reads stay cheap."""
    from pyspark.sql import functions as F

    ln = _vint_len(c, pos)
    raw = F.conv(F.hex(c.substr(pos, ln)), 16, 10).try_cast("long")
    marker = F.pow(F.lit(2.0), (F.lit(7) * ln).cast("double")).cast(
        "long"
    )
    return F.when(raw != marker * 2 - 1, raw - marker)


def _ebml_child_step(c, end):
    """Step function for :func:`_walk_offsets` over an EBML child
    list: each element is id-VINT + size-VINT + payload; the next
    offset must stay strictly inside the parent (``end`` is one past
    the parent payload's last 1-based byte) or the walk dies —
    stepping past the end would misparse sibling bytes as
    children."""
    from pyspark.sql import functions as F

    def step(o):
        szp = o + _vint_len(c, o)
        nxt = szp + _vint_len(c, szp) + _vint_val(c, szp)
        return F.when(nxt < end, nxt)

    return step


def _ebml_find(c, offs, id_hex: str) -> "Column":
    """First offset whose element ID hex-matches ``id_hex`` (EBML
    IDs keep their length-marker bits and are prefix-free, so a
    fixed-width compare cannot collide with a longer ID)."""
    from pyspark.sql import functions as F

    n = len(id_hex) // 2
    return F.get(
        F.filter(
            offs,
            lambda o: F.hex(c.substr(o, F.lit(n))) == F.lit(id_hex),
        ),
        0,
    )


def _be_float(c, pos, size) -> "Column":
    """IEEE-754 big-endian float at Column position, ``size`` a
    Column of 4 or 8 (EBML float element sizes) — decoded
    ARITHMETICALLY from the bit fields (sign byte split off first so
    the 8-byte path never overflows a signed long): ``(−1)^s ·
    (1 + m·2^−p) · 2^(e−bias)``. Every factor is a power-of-two
    scale of an ≤53-bit integer, so the arithmetic is EXACT — the
    decoded double is bit-identical to a native reinterpret. Inf/NaN
    (max exponent) NULL; denormals decode via the 2^(1−bias−p)
    scale. Other sizes NULL (EBML floats are 0, 4, or 8 bytes;
    0-byte means 0.0 per spec but carries no information — NULL is
    the honest verdict for a metadata probe)."""
    from pyspark.sql import functions as F

    def _decode(p, nrest, ebits, mbits, bias):
        # lead byte: sign bit + the exponent's TOP 7 bits; the
        # remaining ebits-7 exponent bits lead ``rest``. _let-free
        # (the analyzer-iteration budget again): p arrives
        # lambda-variable-based, so the duplicated byte reads are
        # cheap
        b0 = _be_uint(c, p, 1)
        rest = _be_uint(c, p + 1, nrest)
        sign = F.when(b0 >= 128, F.lit(-1.0)).otherwise(F.lit(1.0))
        frac = F.pmod(rest, F.lit(1 << mbits).cast("long")).cast(
            "double"
        ) / F.lit(float(1 << mbits))
        e = F.pmod(b0, 128) * F.lit(1 << (ebits - 7)) + F.shiftright(
            rest, mbits
        )
        return (
            F.when(e == (1 << ebits) - 1, F.lit(None).cast("double"))
            .when(
                e == 0,
                sign * frac * F.pow(F.lit(2.0), F.lit(float(1 - bias))),
            )
            .otherwise(
                sign
                * (F.lit(1.0) + frac)
                * F.pow(F.lit(2.0), (e - bias).cast("double"))
            )
        )

    p = pos if not isinstance(pos, int) else F.lit(pos)
    return F.when(size == 4, _decode(p, 3, 8, 23, 127)).when(
        size == 8, _decode(p, 7, 11, 52, 1023)
    )


def mkv_header_meta(
    content, max_children: int = 12, max_info_children: int = 12
) -> "Column":
    """``struct<is_mkv, doctype, timestamp_scale, duration,
    duration_s>`` parsed from a binary column's Matroska/WebM EBML
    tree — PURE Column expressions (the mm2/mm3 discipline): no UDF,
    no libmatroska. EBML (RFC 8794) is the one mainstream container
    family mm2/mm3 don't cover: every element is a variable-length
    id + a variable-length size + payload, so unlike RIFF/ISO-BMFF
    the walk must parse VINTs (:func:`_vint_len`/:func:`_vint_val`)
    at every step. The walk: EBML header (``1A45DFA3``) → its
    children for ``DocType`` (``4282`` — "matroska"/"webm") →
    ``Segment`` (``18538067``) → its children for ``Info``
    (``1549A966``), bounded by ``max_children`` and by the parent's
    extent (a child stepping past its parent dies) → Info's children
    for ``TimestampScale`` (``2AD7B1``, uint, default 1 000 000 ns
    per spec) and ``Duration`` (``4489``, an IEEE float of 4 or 8
    bytes — :func:`_be_float` decodes it arithmetically, exact).
    ``duration_s = duration × timestamp_scale / 1e9``. Junk bytes
    verdict ``(false, NULL, ...)``; NULL content verdicts false; an
    unknown-size parent or out-of-bounds child NULLs the affected
    fields, never misreads. Sizing a 100 TB video corpus this way
    reads tens of header bytes per row JVM-side."""
    from pyspark.sql import functions as F

    c = F.col(content) if isinstance(content, str) else content
    is_mkv = F.coalesce(
        F.hex(c.substr(F.lit(1), F.lit(4))) == "1A45DFA3",
        F.lit(False),
    )

    # Derived offsets are _let-bound, but SPARINGLY: tree-copying
    # references OOM'd the plan build of the first draft, while the
    # let-everything second draft exceeded the analyzer's 100
    # resolution-iteration budget (each lambda/HOF nesting level
    # costs iterations). Bindings hold only the found offsets whose
    # trees are walk-sized; literal-rooted arithmetic (the EBML
    # header end, VINT reads at bound offsets) re-inlines.

    # EBML header end: id(4) at 1, size VINT at 5, payload after it
    # — literal-rooted, so duplication is a few dozen nodes. Clamped
    # like _walk_offsets' steps: a garbage size VINT can claim a
    # multi-GB header and substr's int position would CAST_OVERFLOW
    # an ANSI scan off one corrupt blob (truncation-fuzz test)
    _hend_raw = (
        F.lit(5) + _vint_len(c, F.lit(5)) + _vint_val(c, F.lit(5))
    )
    hend = F.when(_hend_raw <= F.lit(2_147_483_000), _hend_raw)

    def _doctype():
        hoffs = _walk_offsets(
            _ebml_child_step(c, hend),
            F.lit(5) + _vint_len(c, F.lit(5)),
            max_children,
        )
        return _let(
            _ebml_find(c, hoffs, "4282"),  # DocType
            lambda doc_off: F.when(
                _vint_val(c, doc_off + 2).between(1, 32),
                c.substr(
                    doc_off + 2 + _vint_len(c, doc_off + 2),
                    _vint_val(c, doc_off + 2),
                ).cast("string"),
            ),
        )

    def _ioffs(info_off):
        # Info's child list (payload offset inlined — cheap
        # arithmetic around the _let-bound info_off)
        return _walk_offsets(
            _ebml_child_step(
                c,
                info_off
                + 4
                + _vint_len(c, info_off + 4)
                + _vint_val(c, info_off + 4),
            ),
            info_off + 4 + _vint_len(c, info_off + 4),
            max_info_children,
        )

    def _tscale(info_off, ts_off):
        return F.coalesce(
            F.when(
                _vint_val(c, ts_off + 3).between(1, 8),
                F.conv(
                    F.hex(
                        c.substr(
                            ts_off + 3 + _vint_len(c, ts_off + 3),
                            _vint_val(c, ts_off + 3),
                        )
                    ),
                    16,
                    10,
                ).try_cast("long"),
            ),
            # spec default when Info exists but carries no scale
            F.when(
                info_off.isNotNull(), F.lit(1_000_000).cast("long")
            ),
        )

    def _fields():
        # Segment: id(4) + size VINT (often unknown-size — only its
        # payload START matters; the child walk bounds itself via
        # max_children and per-child size checks)
        soffs = _walk_offsets(
            _ebml_child_step(c, F.lit(2_147_483_000)),
            F.when(
                F.hex(c.substr(hend, F.lit(4))) == "18538067",
                hend + 4 + _vint_len(c, hend + 4),
            ),
            max_children,
        )
        return _let(
            _ebml_find(c, soffs, "1549A966"),  # Info
            lambda info_off: _let(
                F.struct(
                    _ebml_find(c, _ioffs(info_off), "2AD7B1").alias(
                        "t"
                    ),  # TimestampScale
                    _ebml_find(c, _ioffs(info_off), "4489").alias(
                        "d"
                    ),  # Duration (float)
                ),
                lambda td: F.struct(
                    _tscale(info_off, td["t"]).alias("ts"),
                    _be_float(
                        c,
                        td["d"] + 2 + _vint_len(c, td["d"] + 2),
                        _vint_val(c, td["d"] + 2),
                    ).alias("du"),
                ),
            ),
        )

    return _let(
        F.struct(_doctype().alias("dt"), _fields().alias("f")),
        lambda s: F.struct(
            is_mkv.alias("is_mkv"),
            F.when(is_mkv, s["dt"]).alias("doctype"),
            F.when(is_mkv, s["f"]["ts"]).alias("timestamp_scale"),
            F.when(is_mkv, s["f"]["du"]).alias("duration"),
            F.when(
                is_mkv & (s["f"]["ts"] > 0),
                s["f"]["du"]
                * s["f"]["ts"].cast("double")
                / F.lit(1e9),
            ).alias("duration_s"),
        ),
    )


def mkv_track_meta(
    content,
    max_children: int = 12,
    max_tracks: int = 8,
    max_entry_children: int = 12,
) -> "Column":
    """``array<struct<track_type, track_kind, codec_id, pixel_width,
    pixel_height, channels, sampling_hz>>`` — one element per
    TrackEntry of a Matroska/WebM binary column, PURE Column
    expressions: the ffprobe-class per-track card mm2/mm3 give
    MP4/WAV, one EBML level deeper than :func:`mkv_header_meta`'s
    Info walk. The walk: EBML header → Segment children for
    ``Tracks`` (``1654AE6B``) → its children filtered to
    ``TrackEntry`` (``AE``) → per entry, children for ``TrackType``
    (``83``, uint: 1 video / 2 audio / 17 subtitle), ``CodecID``
    (``86``, string), and the ``Video`` (``E0``) / ``Audio``
    (``E1``) sub-parents — ``PixelWidth``/``PixelHeight``
    (``B0``/``BA``, uints, mandatory in Video) and ``Channels``/
    ``SamplingFrequency`` (``9F`` uint default 1, ``B5`` float
    default 8000.0 per spec — defaults apply only when the Audio
    parent EXISTS; a video track's audio fields stay NULL).

    Same discipline as mkv_header_meta: every found offset is
    ``_let``-bound exactly once (the tree-copy budget), every size
    clamped before it can reach ``substr`` as an overflowing int,
    unknown-size / truncated structures NULL their subtree instead
    of misreading, junk verdicts NULL (array), and the per-entry
    body lives inside ONE ``transform`` lambda so the tree is
    per-entry-sized regardless of ``max_tracks``. Reads tens of
    header bytes per row JVM-side — the 100 TB-corpus sizing probe
    shape."""
    from pyspark.sql import functions as F

    c = F.col(content) if isinstance(content, str) else content
    is_mkv = F.coalesce(
        F.hex(c.substr(F.lit(1), F.lit(4))) == "1A45DFA3",
        F.lit(False),
    )
    _hend_raw = (
        F.lit(5) + _vint_len(c, F.lit(5)) + _vint_val(c, F.lit(5))
    )
    hend = F.when(_hend_raw <= F.lit(2_147_483_000), _hend_raw)

    def _uval(off):
        # uint element value, 1-byte id at off
        sz = _vint_val(c, off + 1)
        return F.when(
            sz.between(1, 8),
            F.conv(
                F.hex(c.substr(off + 1 + _vint_len(c, off + 1), sz)),
                16,
                10,
            ).try_cast("long"),
        )

    def _sval(off):
        sz = _vint_val(c, off + 1)
        return F.when(
            sz.between(1, 64),
            c.substr(off + 1 + _vint_len(c, off + 1), sz).cast(
                "string"
            ),
        )

    def _fval(off):
        sz = _vint_val(c, off + 1)
        return _be_float(c, off + 1 + _vint_len(c, off + 1), sz)

    def _sub_find(parent_off, id_hex):
        # child list of a 1-byte-id parent, probe one grandchild id
        pps = parent_off + 1 + _vint_len(c, parent_off + 1)
        ppe_raw = pps + _vint_val(c, parent_off + 1)
        offs = _walk_offsets(
            _ebml_child_step(
                c, F.when(ppe_raw <= F.lit(2_147_483_000), ppe_raw)
            ),
            pps,
            max_entry_children,
        )
        return _ebml_find(c, offs, id_hex)

    def _entry(te):
        ps = te + 1 + _vint_len(c, te + 1)
        pe_raw = ps + _vint_val(c, te + 1)
        eoffs = _walk_offsets(
            _ebml_child_step(
                c, F.when(pe_raw <= F.lit(2_147_483_000), pe_raw)
            ),
            ps,
            max_entry_children,
        )
        return _let(
            eoffs,
            lambda eo: _let(
                F.struct(
                    _ebml_find(c, eo, "83").alias("ty"),
                    _ebml_find(c, eo, "86").alias("co"),
                    _ebml_find(c, eo, "E0").alias("vi"),
                    _ebml_find(c, eo, "E1").alias("au"),
                ),
                lambda ids: _let(
                    F.struct(
                        _sub_find(ids["vi"], "B0").alias("w"),
                        _sub_find(ids["vi"], "BA").alias("h"),
                        _sub_find(ids["au"], "9F").alias("ch"),
                        _sub_find(ids["au"], "B5").alias("sf"),
                        _uval(ids["ty"]).alias("tt"),
                    ),
                    lambda s: F.struct(
                        s["tt"].alias("track_type"),
                        F.when(s["tt"] == 1, F.lit("video"))
                        .when(s["tt"] == 2, F.lit("audio"))
                        .when(s["tt"] == 17, F.lit("subtitle"))
                        .alias("track_kind"),
                        _sval(ids["co"]).alias("codec_id"),
                        _uval(s["w"]).alias("pixel_width"),
                        _uval(s["h"]).alias("pixel_height"),
                        F.coalesce(
                            _uval(s["ch"]),
                            F.when(
                                ids["au"].isNotNull(),
                                F.lit(1).cast("long"),
                            ),
                        ).alias("channels"),
                        F.coalesce(
                            _fval(s["sf"]),
                            F.when(
                                ids["au"].isNotNull(), F.lit(8000.0)
                            ),
                        ).alias("sampling_hz"),
                    ),
                ),
            ),
        )

    # Segment children (the mkv_header_meta walk) -> Tracks
    soffs = _walk_offsets(
        _ebml_child_step(c, F.lit(2_147_483_000)),
        F.when(
            F.hex(c.substr(hend, F.lit(4))) == "18538067",
            hend + 4 + _vint_len(c, hend + 4),
        ),
        max_children,
    )
    return _let(
        _ebml_find(c, soffs, "1654AE6B"),  # Tracks
        lambda tr_off: F.when(
            is_mkv & tr_off.isNotNull(),
            _let(
                F.slice(
                    F.filter(
                        _walk_offsets(
                            _ebml_child_step(
                                c,
                                F.when(
                                    tr_off
                                    + 4
                                    + _vint_len(c, tr_off + 4)
                                    + _vint_val(c, tr_off + 4)
                                    <= F.lit(2_147_483_000),
                                    tr_off
                                    + 4
                                    + _vint_len(c, tr_off + 4)
                                    + _vint_val(c, tr_off + 4),
                                ),
                            ),
                            tr_off + 4 + _vint_len(c, tr_off + 4),
                            max_children,
                        ),
                        lambda o: F.hex(c.substr(o, F.lit(1)))
                        == "AE",
                    ),
                    1,
                    int(max_tracks),
                ),
                lambda toffs: F.transform(toffs, _entry),
            ),
        ),
    )


def image_dhash_bytes(content: bytes, hash_size: int = 8) -> int:
    """Perceptual dHash of one encoded image: decode
    (:func:`_decode_pixel_array`), integer luma (BT.601 8-bit
    weights 77/151/28, summing to 256), block-mean downsample to
    (hash_size, hash_size + 1), emit one bit per horizontal gradient
    sign — 64 bits at the default size. Returns a SIGNED 64-bit int
    (two's complement) so the value lands in a Spark ``long`` and
    ``bit_count(a ^ b)`` computes hamming distance exactly.

    ALL-INTEGER arithmetic: block means compare by cross
    multiplication (``sum_a * n_b > sum_b * n_a``), so the
    fingerprint is bit-stable across platforms and EXACTLY invariant
    under a uniform brightness shift (every block sum moves by the
    same per-pixel amount — float luma flipped near-tie bits 3/500
    times on the gate fixture). Near-identical images (re-encodes,
    brightness shifts, small noise) land within a few bits;
    unrelated images differ in ~half."""
    import numpy as np

    arr = _decode_pixel_array(content).astype(np.int64)
    if arr.shape[2] >= 3:
        gray = (
            77 * arr[:, :, 0]
            + 151 * arr[:, :, 1]
            + 28 * arr[:, :, 2]
        )
    else:
        gray = 256 * arr[:, :, 0]
    h = int(hash_size)
    # block resample to (h, h+1): deterministic linspace bounds
    ys = np.linspace(0, gray.shape[0], h + 1).astype(int)
    xs = np.linspace(0, gray.shape[1], h + 2).astype(int)
    sums = np.empty((h, h + 1), dtype=np.int64)
    cnts = np.empty((h, h + 1), dtype=np.int64)
    for i in range(h):
        for j in range(h + 1):
            block = gray[
                ys[i]: max(ys[i + 1], ys[i] + 1),
                xs[j]: max(xs[j + 1], xs[j] + 1),
            ]
            sums[i, j] = int(block.sum())
            cnts[i, j] = block.size
    # mean_right > mean_left, exactly: s_r * n_l > s_l * n_r
    bits = (
        sums[:, 1:] * cnts[:, :-1] > sums[:, :-1] * cnts[:, 1:]
    ).reshape(-1)
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    n = h * h
    if v >= 1 << (n - 1):  # two's complement into a signed long
        v -= 1 << n
    return v


def attach_image_dhash(
    df,
    content_col: str = "content",
    out_col: str = "dhash",
    hash_size: int = 8,
):
    """Append the perceptual dHash (``long``) per row — Arrow-batched
    pandas UDF, map-side only. NULL content and UNDECODABLE bytes
    both yield NULL (on a web-scale media corpus a decode failure is
    a data condition, not a job failure; count NULLs to monitor it —
    use :func:`decode_image` directly where a loud failure is
    wanted)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    hs = int(hash_size)

    def _one(content):
        if content is None:
            return None
        try:
            return image_dhash_bytes(bytes(content), hs)
        except NotImplementedError:
            return None

    def _batch(col):
        return col.map(_one).astype("Int64")

    # asNondeterministic is an optimizer fence, not a semantics
    # change (the hash is a pure function of the bytes): without it
    # the downstream isNotNull filter on the hash column is pushed
    # below this UDF and the optimizer DUPLICATES the evaluation —
    # two stacked ArrowEvalPython nodes, every image decoded and
    # hashed twice per action (observed on the r19 bench plan;
    # guide §4.4).
    udf = pandas_udf(_batch, "long").asNondeterministic()
    return df.withColumn(out_col, udf(F.col(content_col)))


def image_neardup_pairs(
    df,
    content_col: str = "content",
    id_col: str = "media_id",
    max_hamming: int = 3,
    chunks: int = 4,
    max_bucket_size: int = 1000,
    hash_size: int = 8,
    materialize: bool = False,
):
    """Near-duplicate IMAGE pairs: perceptual dHash per row
    (:func:`attach_image_dhash` — one decode each, map-side), then
    the same chunk-bucket pigeonhole machinery the text dedup family
    uses (:func:`~polaroam_spark.operators.dedup.
    fingerprint_hamming_pairs`): candidates share a fingerprint
    chunk, exact ``bit_count(xor)`` verifies, hot buckets degrade to
    star pairs. Catches re-encodes, brightness/contrast shifts and
    small edits — the image analogue of :func:`~polaroam_spark.
    operators.dedup.simhash_pairs`, with the identical output shape
    ``id_a, id_b, hamming`` so survivors/components compose through
    the same downstream ops. Undecodable rows drop (NULL hash)."""
    from polaroam_spark.operators.dedup import (
        fingerprint_hamming_pairs,
    )

    hashed = attach_image_dhash(
        df.select(id_col, content_col),
        content_col,
        out_col="_dhash",
        hash_size=hash_size,
    )
    return fingerprint_hamming_pairs(
        hashed,
        "_dhash",
        id_col=id_col,
        bits=int(hash_size) * int(hash_size),
        max_hamming=max_hamming,
        chunks=chunks,
        max_bucket_size=max_bucket_size,
        materialize=materialize,
    )


def _decode_wav_samples(content: bytes):
    """Parse a RIFF/WAVE PCM payload into (mono int64 samples,
    sample_rate): chunk-list walk (fmt/data wherever they sit, same
    tolerance as :func:`wav_header_meta`), 8-bit unsigned and
    16-bit signed little-endian PCM supported, channels averaged by
    SUM (a constant channel-count factor — keeps everything integer;
    envelope comparisons divide it out). Raises
    ``NotImplementedError`` for non-PCM codecs or other depths —
    the same one-exception contract as :func:`_decode_pixel_array`."""
    import struct

    import numpy as np

    if (
        len(content) < 12
        or content[:4] != b"RIFF"
        or content[8:12] != b"WAVE"
    ):
        raise NotImplementedError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(content):
        cid = content[pos: pos + 4]
        (clen,) = struct.unpack("<I", content[pos + 4: pos + 8])
        body = content[pos + 8: pos + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise NotImplementedError("WAVE without fmt/data chunks")
    code, ch, rate, _br, _blk, bits = fmt
    if code != 1:
        raise NotImplementedError(
            f"only PCM WAV is supported (fmt code {code})"
        )
    if bits == 16:
        x = np.frombuffer(
            data[: len(data) - len(data) % (2 * ch)], dtype="<i2"
        ).astype(np.int64)
    elif bits == 8:
        x = np.frombuffer(
            data[: len(data) - len(data) % ch], dtype=np.uint8
        ).astype(np.int64) - 128
    else:
        raise NotImplementedError(
            f"only 8/16-bit PCM is supported (got {bits})"
        )
    if ch > 1:
        x = x[: len(x) - len(x) % ch].reshape(-1, ch).sum(axis=1)
    return x, int(rate)


def audio_fingerprint_bytes(content: bytes, hash_size: int = 8) -> int:
    """Energy-envelope fingerprint of one WAV payload: split the
    signal into ``hash_size² + 1`` equal time frames, one bit per
    consecutive-frame energy gradient (``sum(x²)`` compared by cross
    multiplication over frame lengths) — 64 bits at the default, a
    signed Spark ``long`` like :func:`image_dhash_bytes`.

    ALL-INTEGER: energies are integer sums of squared samples, so
    the fingerprint is bit-stable and EXACTLY invariant under any
    uniform integer gain (×g scales every energy by g² — inequality
    AND ties preserved). Silence-padded or re-encoded copies land
    within a few bits; unrelated audio differs in ~half. Needs at
    least ``hash_size² + 1`` samples (raises otherwise — a clip
    shorter than the frame grid has no envelope to speak of)."""
    import numpy as np

    x, _rate = _decode_wav_samples(content)
    n_frames = int(hash_size) * int(hash_size) + 1
    if len(x) < n_frames:
        raise NotImplementedError(
            f"audio too short to fingerprint: {len(x)} samples "
            f"< {n_frames} frames"
        )
    bounds = np.linspace(0, len(x), n_frames + 1).astype(int)
    e = np.empty(n_frames, dtype=object)  # python ints: no overflow
    cnt = np.empty(n_frames, dtype=np.int64)
    sq = x * x
    for i in range(n_frames):
        e[i] = int(sq[bounds[i]: bounds[i + 1]].sum())
        cnt[i] = bounds[i + 1] - bounds[i]
    bits = [
        e[i + 1] * int(cnt[i]) > e[i] * int(cnt[i + 1])
        for i in range(n_frames - 1)
    ]
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    n = len(bits)
    if v >= 1 << (n - 1):
        v -= 1 << n
    return v


def attach_audio_fingerprint(
    df,
    content_col: str = "content",
    out_col: str = "audio_fp",
    hash_size: int = 8,
):
    """Append the energy-envelope fingerprint (``long``) per row —
    Arrow-batched pandas UDF, map-side only. NULL content and
    undecodable/too-short audio yield NULL (same monitoring contract
    as :func:`attach_image_dhash`)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    hs = int(hash_size)

    def _one(content):
        if content is None:
            return None
        try:
            return audio_fingerprint_bytes(bytes(content), hs)
        except NotImplementedError:
            return None

    def _batch(col):
        return col.map(_one).astype("Int64")

    # optimizer fence against duplicated evaluation under a pushed
    # isNotNull filter — see attach_image_dhash (guide §4.4)
    udf = pandas_udf(_batch, "long").asNondeterministic()
    return df.withColumn(out_col, udf(F.col(content_col)))


def audio_neardup_pairs(
    df,
    content_col: str = "content",
    id_col: str = "media_id",
    max_hamming: int = 3,
    chunks: int = 4,
    max_bucket_size: int = 1000,
    hash_size: int = 8,
    materialize: bool = False,
):
    """Near-duplicate AUDIO pairs: energy-envelope fingerprint per
    row, then the shared chunk-bucket hamming machinery
    (:func:`~polaroam_spark.operators.dedup.
    fingerprint_hamming_pairs`) — the audio member of the
    text/image/audio near-dup family, identical ``id_a, id_b,
    hamming`` output so survivors/components compose downstream.
    Catches gain-scaled and re-encoded copies; undecodable rows
    drop."""
    from polaroam_spark.operators.dedup import (
        fingerprint_hamming_pairs,
    )

    hashed = attach_audio_fingerprint(
        df.select(id_col, content_col),
        content_col,
        out_col="_afp",
        hash_size=hash_size,
    )
    return fingerprint_hamming_pairs(
        hashed,
        "_afp",
        id_col=id_col,
        bits=int(hash_size) * int(hash_size),
        max_hamming=max_hamming,
        chunks=chunks,
        max_bucket_size=max_bucket_size,
        materialize=materialize,
    )
