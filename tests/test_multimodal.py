"""Multimodal plumbing: schemas, Arrow batch transforms, byte-sized
repartitioning, frame-sample planning — plus the real image decode
path (stdlib PNG / optional Pillow, see operators/multimodal.py)."""

import math
import struct
import zlib

import numpy as np
import pyspark.sql.functions as F
import pytest

from polaroam_spark.operators.multimodal import (
    attach_media_meta,
    decode_image,
    deterministic_fake_decode,
    extract_media_features,
    frame_sample_plan,
    media_repartition,
    strict_decode,
)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _filter_row(cur, prev, ftype: int, bpp: int) -> bytes:
    """Forward-apply a PNG scanline filter (encoder side) so the
    decoder's reconstruction can be verified against ground truth."""
    n = len(cur)
    out = bytearray(n)
    for i in range(n):
        a = cur[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        out[i] = (cur[i] - pred) & 0xFF
    return bytes(out)


def make_png(pixels: np.ndarray, filters=None) -> bytes:
    """Encode an (h, w, c) uint8 array as a real PNG, one filter type
    per scanline (default all-None)."""
    h, w, c = pixels.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    filters = filters or [0] * h
    raw = bytearray()
    prev = bytes(w * c)
    for y, ftype in zip(range(h), filters):
        cur = pixels[y].tobytes()
        raw += bytes([ftype]) + _filter_row(cur, prev, ftype, c)
        prev = cur
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(
            b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        )
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
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


def test_strict_decode_unsupported_raises():
    with pytest.raises(NotImplementedError):
        strict_decode(b"...", "image")  # not a PNG, Pillow absent
    with pytest.raises(NotImplementedError):
        strict_decode(b"RIFF....WAVE", "audio")


def test_strict_decode_1x1_png():
    png = make_png(np.array([[[255, 0, 0]]], dtype=np.uint8))
    feats = strict_decode(png, "image")
    assert (feats["width"], feats["height"], feats["channels"]) == (1, 1, 3)
    assert feats["byte_mean"] == pytest.approx(85.0)
    assert feats["feature_hash"] >= 0


def test_png_all_filter_types_roundtrip():
    rng = np.random.default_rng(7)
    pixels = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    baseline = decode_image(make_png(pixels))
    for filters in ([1] * 5, [2] * 5, [3] * 5, [4] * 5, [0, 1, 2, 3, 4]):
        feats = decode_image(make_png(pixels, filters=filters))
        assert feats == baseline  # same pixels whatever the encoder chose


def test_png_greyscale_and_alpha_channels():
    grey = make_png(np.full((2, 3, 1), 9, dtype=np.uint8))
    feats = decode_image(grey)
    assert feats["channels"] == 1 and feats["byte_mean"] == 9.0
    rgba = make_png(np.zeros((2, 2, 4), dtype=np.uint8))
    assert decode_image(rgba)["channels"] == 4


def test_extract_features_with_strict_decode(spark):
    imgs = [
        make_png(np.full((2, 2, 3), fill, dtype=np.uint8))
        for fill in (0, 128, 255)
    ]
    df = spark.createDataFrame(
        [(i, png) for i, png in enumerate(imgs)],
        "media_id long, content binary",
    )
    media = attach_media_meta(df, kind="image", fmt="png")
    out = {
        r.media_id: r
        for r in extract_media_features(
            media, decode_fn=strict_decode
        ).collect()
    }
    assert out[1].byte_mean == 128.0  # pixel stats, post-decode
    assert out[1].byte_entropy == 0.0
    assert out[0].n_bytes == len(imgs[0])  # encoded size, pre-decode
    assert len({out[i].feature_hash for i in range(3)}) == 3


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


def test_pillow_palette_png_matches_rgb_stats():
    """Palette-encoded and RGB-encoded versions of the same image
    must produce identical pixel features (requires Pillow)."""
    Image = pytest.importorskip("PIL.Image")
    import io

    from polaroam_spark.operators.multimodal import decode_image

    rgb = Image.new("RGB", (4, 2))
    rgb.putdata([(255, 0, 0)] * 4 + [(0, 0, 255)] * 4)
    pal = rgb.convert("P", palette=Image.ADAPTIVE)
    bufs = {}
    for name, img in (("rgb", rgb), ("pal", pal)):
        b = io.BytesIO()
        img.save(b, format="PNG")
        bufs[name] = decode_image(b.getvalue())
    assert bufs["pal"]["channels"] == 3
    for k in ("byte_mean", "byte_entropy", "feature_hash", "channels"):
        assert bufs["pal"][k] == bufs["rgb"][k], k


def test_pillow_unidentified_bytes_raise_not_implemented():
    """PIL's UnidentifiedImageError must not escape decode_image —
    callers are promised NotImplementedError (requires Pillow)."""
    pytest.importorskip("PIL.Image")
    from polaroam_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"definitely not an image")


def test_png_dimensions_native_header_parse(spark):
    import struct
    import zlib

    from pyspark.sql import functions as F

    from polaroam_spark.operators.multimodal import png_dimensions

    def mk(w, h):
        def chunk(t, d):
            return (struct.pack(">I", len(d)) + t + d
                    + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))
        raw = b"".join(b"\x00" + b"\x00" * (w * 3) for _ in range(h))
        return (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b""))

    df = spark.createDataFrame(
        [(0, mk(640, 480)), (1, mk(1, 1)), (2, b"JFIF junk bytes"),
         (3, None)],
        "id long, content binary",
    )
    out = {
        r.id: r
        for r in df.select(
            "id", png_dimensions("content").alias("d")
        ).select("id", "d.is_png", "d.width", "d.height").collect()
    }
    assert (out[0].width, out[0].height) == (640, 480)
    assert (out[1].width, out[1].height) == (1, 1)
    assert out[2].is_png is False and out[2].width is None
    # NULL bytes -> hard False (kept+rejected accounting), NULL dims
    assert out[3].is_png is False and out[3].width is None
    # plan stays native: no BatchEvalPython / ArrowEval nodes
    plan = df.select(png_dimensions("content"))._jdf.queryExecution() \
        .explainString(spark._jvm.org.apache.spark.sql.execution
                       .ExplainMode.fromString("simple"))
    assert "EvalPython" not in plan


def _mk_wav(ch, rate, bits, n_frames, lead_list=False, fmt_code=1):
    import struct

    block = ch * bits // 8
    byte_rate = rate * block
    data = bytes(n_frames * block)
    fmt = struct.pack("<HHIIHH", fmt_code, ch, rate, byte_rate, block, bits)
    chunks = b""
    if lead_list:
        chunks += b"LIST" + struct.pack("<I", 4) + b"INFO"
    chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        chunks += b"\x00"
    riff = b"WAVE" + chunks
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _mp4_box(t, payload):
    import struct

    return struct.pack(">I", 8 + len(payload)) + t + payload


def _mk_mp4(version, timescale, duration, trailer_moov=False,
            lead_child=False):
    import struct

    ftyp = _mp4_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    if version == 0:
        mvhd = _mp4_box(
            b"mvhd",
            b"\x00\x00\x00\x00"
            + struct.pack(">IIII", 0, 0, timescale, duration)
            + bytes(80),
        )
    else:
        mvhd = _mp4_box(
            b"mvhd",
            b"\x01\x00\x00\x00"
            + struct.pack(">QQIQ", 0, 0, timescale, duration)
            + bytes(76),
        )
    kids = (_mp4_box(b"udta", bytes(4)) if lead_child else b"") + mvhd
    moov = _mp4_box(b"moov", kids)
    mdat = _mp4_box(b"mdat", bytes(32))
    free = _mp4_box(b"free", bytes(4))
    return (ftyp + free + mdat + moov) if trailer_moov else (
        ftyp + moov + free + mdat
    )


def test_wav_header_meta_native(spark):
    from polaroam_spark.operators.multimodal import wav_header_meta

    rows = [
        (0, _mk_wav(1, 8000, 8, 4001)),          # odd data size -> pad
        (1, _mk_wav(2, 44100, 16, 44100)),        # 1.0 s stereo CD
        (2, _mk_wav(2, 48000, 24, 12000, lead_list=True)),  # LIST first
        (3, b"RIFF\x10\x00\x00\x00AVI LIST"),     # RIFF but not WAVE
        (4, b"garbage"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id long, content binary")
    out = {
        r.id: r
        for r in df.select(
            "id", wav_header_meta("content").alias("m")
        ).select("id", "m.*").collect()
    }
    assert out[0].is_wav and out[0].num_channels == 1
    assert out[0].sample_rate == 8000 and out[0].bits_per_sample == 8
    assert out[0].data_bytes == 4001
    assert abs(out[0].duration_s - 4001 / 8000) < 1e-12
    assert out[1].duration_s == 1.0 and out[1].num_channels == 2
    # chunk walk skips the leading LIST chunk
    assert out[2].is_wav and out[2].sample_rate == 48000
    assert out[2].bits_per_sample == 24
    assert abs(out[2].duration_s - 12000 / 48000) < 1e-12
    assert out[3].is_wav is False and out[3].sample_rate is None
    assert out[4].is_wav is False
    assert out[5].is_wav is False and out[5].duration_s is None
    plan = df.select(wav_header_meta("content"))._jdf.queryExecution() \
        .explainString(spark._jvm.org.apache.spark.sql.execution
                       .ExplainMode.fromString("simple"))
    assert "EvalPython" not in plan


def test_mp4_header_meta_native(spark):
    from polaroam_spark.operators.multimodal import mp4_header_meta

    rows = [
        (0, _mk_mp4(0, 1000, 2500)),                     # faststart v0
        (1, _mk_mp4(1, 90000, 270000, trailer_moov=True)),  # trailer v1
        (2, _mk_mp4(0, 600, 0, lead_child=True)),        # mvhd not 1st kid
        (3, b"\x00\x00\x00\x08notf"),                    # not ftyp
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, content binary")
    out = {
        r.id: r
        for r in df.select(
            "id", mp4_header_meta("content").alias("m")
        ).select("id", "m.*").collect()
    }
    assert out[0].is_mp4 and out[0].mvhd_version == 0
    assert out[0].timescale == 1000 and out[0].duration == 2500
    assert out[0].duration_s == 2.5
    # moov at END of file (non-faststart muxers) + 64-bit v1 duration
    assert out[1].is_mp4 and out[1].mvhd_version == 1
    assert out[1].timescale == 90000 and out[1].duration == 270000
    assert out[1].duration_s == 3.0
    # mvhd behind a leading udta child; duration 0 -> 0.0 s
    assert out[2].timescale == 600 and out[2].duration_s == 0.0
    assert out[3].is_mp4 is False and out[3].timescale is None
    assert out[4].is_mp4 is False


def test_attach_media_meta_probe_headers(spark):
    """probe_headers=True sniffs kind/format/dims/duration from magic
    bytes with the pure-expression parsers; unknown bytes keep the
    caller defaults; default stays declare-only (existing contract)."""
    import struct
    import zlib

    from polaroam_spark.operators.multimodal import attach_media_meta

    def mk_png(w, h):
        def chunk(t, d):
            return (struct.pack(">I", len(d)) + t + d
                    + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))
        raw = b"".join(b"\x00" + b"\x00" * (w * 3) for _ in range(h))
        return (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b""))

    rows = [
        (0, mk_png(8, 4)),
        (1, _mk_wav(2, 16000, 16, 16000)),
        (2, _mk_mp4(0, 1000, 1500)),
        (3, b"opaque payload"),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {
        r.media_id: r.meta
        for r in attach_media_meta(
            df, kind="unknown", fmt="raw", probe_headers=True
        ).collect()
    }
    assert out[0].kind == "image" and out[0].format == "png"
    assert (out[0].width, out[0].height) == (8, 4)
    assert out[1].kind == "audio" and out[1].format == "wav"
    assert out[1].duration_s == 1.0
    assert out[2].kind == "video" and out[2].format == "mp4"
    assert out[2].duration_s == 1.5
    assert out[3].kind == "unknown" and out[3].format == "raw"
    assert out[3].width is None and out[3].duration_s is None
    # default: declare-only, no sniffing
    plain = attach_media_meta(df, kind="image").collect()
    assert all(r.meta.kind == "image" for r in plain)


def _mk_jpeg(w, h, n_app_segments=1, progressive=False, app_len=64):
    """Minimal JPEG header stream: SOI + APPn metadata segments +
    SOF0/SOF2 + SOS + fake entropy bytes (never parsed)."""
    import struct

    def seg(marker, payload):
        return b"\xff" + bytes([marker]) + struct.pack(
            ">H", 2 + len(payload)
        ) + payload

    out = b"\xff\xd8"  # SOI
    for i in range(n_app_segments):
        out += seg(0xE0 + (i % 4), bytes(app_len))
    sof_marker = 0xC2 if progressive else 0xC0
    sof = bytes([8]) + struct.pack(">HH", h, w) + b"\x03" + bytes(9)
    out += seg(sof_marker, sof)
    out += seg(0xDA, b"\x03" + bytes(6))  # SOS
    out += b"\xff\xc0\x99\x99" + bytes(16)  # entropy bytes w/ fake marker
    return out


def _mk_gif(w, h, v89=True):
    import struct

    magic = b"GIF89a" if v89 else b"GIF87a"
    return magic + struct.pack("<HH", w, h) + bytes(5)


def test_jpeg_gif_dimensions_native(spark):
    from polaroam_spark.operators.multimodal import (
        gif_dimensions,
        jpeg_dimensions,
    )

    rows = [
        (0, _mk_jpeg(640, 480)),
        (1, _mk_jpeg(33, 7, n_app_segments=5, progressive=True)),
        (2, _mk_jpeg(100, 50, n_app_segments=0)),     # SOF first segment
        (3, b"\xff\xd8" + b"\xff\xda\x00\x04\x03\x00"  # SOS before any SOF
            + b"\xff\xc0\x00\x11\x08\x01\x01\x01\x01" + bytes(8)),
        (4, b"not a jpeg"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id long, content binary")
    out = {
        r.id: r
        for r in df.select(
            "id", jpeg_dimensions("content").alias("d")
        ).select("id", "d.*").collect()
    }
    assert out[0].is_jpeg and (out[0].width, out[0].height) == (640, 480)
    # SOF2 (progressive) behind a pile of APP segments
    assert (out[1].width, out[1].height) == (33, 7)
    assert (out[2].width, out[2].height) == (100, 50)
    # the walk dies at SOS: the FFC0-looking bytes in entropy data
    # must NOT be read as a frame header
    assert out[3].is_jpeg and out[3].width is None
    assert out[4].is_jpeg is False and out[4].width is None
    assert out[5].is_jpeg is False

    gout = {
        r.id: r
        for r in spark.createDataFrame(
            [(0, _mk_gif(320, 200)), (1, _mk_gif(16, 9, v89=False)),
             (2, b"GIFnotreally"), (3, None)],
            "id long, content binary",
        ).select("id", gif_dimensions("content").alias("d"))
        .select("id", "d.*").collect()
    }
    assert gout[0].is_gif and (gout[0].width, gout[0].height) == (320, 200)
    assert gout[1].is_gif and (gout[1].width, gout[1].height) == (16, 9)
    assert gout[2].is_gif is False and gout[3].is_gif is False


def test_attach_media_meta_probes_jpeg_gif(spark):
    from polaroam_spark.operators.multimodal import attach_media_meta

    df = spark.createDataFrame(
        [(0, _mk_jpeg(24, 12)), (1, _mk_gif(8, 8))],
        "media_id long, content binary",
    )
    out = {
        r.media_id: r.meta
        for r in attach_media_meta(df, probe_headers=True).collect()
    }
    assert out[0].kind == "image" and out[0].format == "jpeg"
    assert (out[0].width, out[0].height) == (24, 12)
    assert out[1].format == "gif" and (out[1].width, out[1].height) == (8, 8)


def test_wav_header_meta_differential_vs_stdlib_wave(spark):
    """Differential against an independent parser: files written by
    the stdlib `wave` MODULE (not our own byte builder) must parse to
    the same channels/rate/width/frames — catches a systematic
    offset/endianness bug that a builder sharing assumptions with the
    parser would mirror."""
    import io
    import wave

    cases = [(1, 8000, 1, 800), (2, 44100, 2, 4410), (1, 22050, 2, 999)]
    rows = []
    for i, (ch, rate, sampwidth, n_frames) in enumerate(cases):
        buf = io.BytesIO()
        w = wave.open(buf, "wb")
        w.setnchannels(ch)
        w.setframerate(rate)
        w.setsampwidth(sampwidth)
        w.writeframes(bytes(n_frames * ch * sampwidth))
        w.close()
        rows.append((i, buf.getvalue()))

    from polaroam_spark.operators.multimodal import wav_header_meta

    df = spark.createDataFrame(rows, "id long, content binary")
    out = {
        r.id: r
        for r in df.select(
            "id", wav_header_meta("content").alias("m")
        ).select("id", "m.*").collect()
    }
    for i, (ch, rate, sampwidth, n_frames) in enumerate(cases):
        # re-read with the stdlib to get its own view of the bytes
        rd = wave.open(io.BytesIO(rows[i][1]), "rb")
        assert out[i].is_wav
        assert out[i].num_channels == rd.getnchannels() == ch
        assert out[i].sample_rate == rd.getframerate() == rate
        assert out[i].bits_per_sample == 8 * rd.getsampwidth()
        assert out[i].data_bytes == rd.getnframes() * ch * sampwidth
        expected_dur = out[i].data_bytes / (rate * ch * sampwidth)
        assert abs(out[i].duration_s - expected_dur) < 1e-12


def test_header_parsers_survive_truncation_and_garbage(spark):
    """Every PREFIX of a valid file (the classic corrupt-upload
    shape) plus seeded random garbage must parse without raising —
    fields may be NULL, classification may be false, but the pure-
    expression walks must never error out a 100 TB scan."""
    import random

    from polaroam_spark.operators.multimodal import (
        gif_dimensions,
        jpeg_dimensions,
        mp4_header_meta,
        png_dimensions,
        wav_header_meta,
    )

    wav = _mk_wav(2, 44100, 16, 500, lead_list=True)
    mp4 = _mk_mp4(1, 90000, 1234, trailer_moov=True)
    jpg = _mk_jpeg(64, 32, n_app_segments=3)
    gif = _mk_gif(10, 20)
    rng = random.Random(42)
    rows = []
    rid = 0
    for blob in (wav, mp4, jpg, gif):
        for cut in range(0, min(len(blob), 96)):  # every early prefix
            rows.append((rid, blob[:cut])); rid += 1
        for cut in (len(blob) // 2, len(blob) - 1):
            rows.append((rid, blob[:cut])); rid += 1
    for _ in range(100):  # seeded garbage incl. magic-byte prefixes
        junk = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 64)))
        prefix = rng.choice(
            [b"", b"RIFF", b"\xff\xd8", b"GIF89a", b"\x89PNG\r\n\x1a\n",
             b"\x00\x00\x00\x18ftyp"]
        )
        rows.append((rid, prefix + junk)); rid += 1
    df = spark.createDataFrame(rows, "id long, content binary")
    out = df.select(
        "id",
        png_dimensions("content").alias("p"),
        jpeg_dimensions("content").alias("j"),
        gif_dimensions("content").alias("g"),
        wav_header_meta("content").alias("w"),
        mp4_header_meta("content").alias("m"),
    ).collect()  # must not raise
    assert len(out) == len(rows)
    for r in out:
        # classification booleans are always concrete, never NULL
        for b in (r.p.is_png, r.j.is_jpeg, r.g.is_gif,
                  r.w.is_wav, r.m.is_mp4):
            assert b in (True, False)


def _rgb_png(px_fn, w=16, h=16):
    """Minimal 8-bit RGB PNG from a pixel function (x, y) -> (r,g,b)."""
    import struct
    import zlib

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    raw = b"".join(
        b"\x00"
        + bytes(v for x in range(w) for v in px_fn(x, y))
        for y in range(h)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_image_dhash_invariances_and_neardup_pairs(spark):
    """Perceptual dHash: invariant to uniform brightness shift and
    re-encode-identical bytes; distinct structured images land far
    apart; image_neardup_pairs finds exactly the planted twins;
    undecodable/NULL content yields NULL hash and never pairs."""
    from polaroam_spark.operators.multimodal import (
        attach_image_dhash,
        image_dhash_bytes,
        image_neardup_pairs,
    )

    def base_px(seed):
        def f(x, y):
            v = (x * (3 + seed % 17) + y * y * (1 + seed % 13)
                 + seed * 97) % 251
            return (v, (v * 7) % 251, (v * 13) % 251)
        return f

    img0 = _rgb_png(base_px(0))
    # twin: +4 uniform brightness — gradients (strict >) preserved
    twin = _rgb_png(
        lambda x, y: tuple(min(c + 4, 255) for c in base_px(0)(x, y))
    )
    assert image_dhash_bytes(img0) == image_dhash_bytes(twin)
    others = [_rgb_png(base_px(s)) for s in (1, 2, 3)]
    d0 = image_dhash_bytes(img0)
    for o in others:
        dh = bin((image_dhash_bytes(o) ^ d0) & ((1 << 64) - 1)).count("1")
        assert dh > 10, dh

    rows = [(0, img0), (100, twin)] + [
        (i, others[i - 1]) for i in (1, 2, 3)
    ] + [(50, b"not an image"), (51, None)]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    hashed = attach_image_dhash(df)
    got = {r.media_id: r.dhash for r in hashed.collect()}
    assert got[50] is None and got[51] is None
    assert got[0] == got[100]
    pairs = image_neardup_pairs(df, max_hamming=3).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in pairs] == [(0, 100, 0)]


def test_audio_fingerprint_gain_invariance_and_pairs(spark):
    """Energy-envelope audio fingerprint: EXACTLY invariant under
    uniform integer gain (all-integer energies, cross-multiplied
    comparisons — ties included), distinct waveforms far apart,
    stereo collapses by channel sum, 8-bit path works, undecodable/
    short/NULL rows hash NULL; audio_neardup_pairs finds exactly the
    planted gain twin."""
    import struct

    from polaroam_spark.operators.multimodal import (
        attach_audio_fingerprint,
        audio_fingerprint_bytes,
        audio_neardup_pairs,
    )

    def wav16(samples, rate=8000, ch=1):
        data = b"".join(
            struct.pack("<h", s) for s in samples for _ in range(ch)
        )
        fmt = struct.pack(
            "<HHIIHH", 1, ch, rate, rate * 2 * ch, 2 * ch, 16
        )
        chunks = (
            b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        riff = b"WAVE" + chunks
        return b"RIFF" + struct.pack("<I", len(riff)) + riff

    def wave(seed, n=400):
        return [
            ((i * (seed * 7 + 3) + (i * i * (seed + 1)) // 5) % 2000)
            - 1000
            for i in range(n)
        ]

    base = wav16(wave(0))
    gained = wav16([s * 3 for s in wave(0)])  # |s| < 1000 -> no clip
    assert audio_fingerprint_bytes(base) == audio_fingerprint_bytes(
        gained
    )
    d0 = audio_fingerprint_bytes(base)
    for s in (1, 2, 3):
        dh = bin(
            (audio_fingerprint_bytes(wav16(wave(s))) ^ d0)
            & ((1 << 64) - 1)
        ).count("1")
        assert dh > 10, (s, dh)
    # stereo duplicate of mono content fingerprints identically
    # (channel SUM scales energy by 4 uniformly: 2 equal channels)
    assert audio_fingerprint_bytes(wav16(wave(0), ch=2)) == d0
    # 8-bit path decodes (no assert on equality with 16-bit: the
    # quantization changes the envelope)
    eight = (
        b"RIFF" + struct.pack("<I", 36 + 200) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        + b"data" + struct.pack("<I", 200)
        + bytes((i * 13) % 256 for i in range(200))
    )
    assert isinstance(audio_fingerprint_bytes(eight), int)

    rows = [(0, base), (100, gained), (1, wav16(wave(1))),
            (2, wav16(wave(2))), (50, b"not audio"),
            (51, wav16(wave(0, n=10))), (52, None)]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    fp = {r.media_id: r.audio_fp
          for r in attach_audio_fingerprint(df).collect()}
    assert fp[50] is None and fp[51] is None and fp[52] is None
    assert fp[0] == fp[100]
    pairs = audio_neardup_pairs(df, max_hamming=3).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in pairs] == [(0, 100, 0)]


def _mk_mkv(m: int) -> bytes:
    """Synthesized Matroska/WebM fixture #m: doctype alternates,
    timestamp scale cycles explicit/default, Duration alternates
    float4/float8, Info is padded by Void / preceded by SeekHead on
    some rows, and every 5th Segment uses the unknown-size VINT."""
    import struct

    def vint(n, length=None):
        if length is None:
            length = 1
            while n >= (1 << (7 * length)) - 1:
                length += 1
        return (n | (1 << (7 * length))).to_bytes(length, "big")

    def elem(eid, payload):
        return eid + vint(len(payload)) + payload

    doctype = b"webm" if m % 2 else b"matroska"
    hdr = elem(b"\x42\x86", b"\x01") + elem(b"\x42\x82", doctype)
    ebml = elem(b"\x1a\x45\xdf\xa3", hdr)
    tscale = [1000000, 100000, 1000][m % 3]
    dur = struct.unpack(">f", struct.pack(">f", (m + 1) * 2500.125))[0]
    info = b""
    if m % 2:
        info += elem(b"\xec", bytes(7))  # leading Void
    if m % 3 != 2:  # explicit scale (else spec default)
        info += elem(b"\x2a\xd7\xb1", tscale.to_bytes(3, "big"))
    if m % 2:
        info += elem(b"\x44\x89", struct.pack(">f", dur))
    else:
        info += elem(b"\x44\x89", struct.pack(">d", dur))
    seg_children = b""
    if m % 4 >= 2:
        seg_children += elem(b"\x11\x4d\x9b\x74", bytes(11))  # SeekHead
    seg_children += elem(b"\x15\x49\xa9\x66", info)
    seg_children += elem(b"\x1f\x43\xb6\x75", bytes(16))  # Cluster
    if m % 5 == 0:  # unknown-size Segment (streaming muxers)
        seg = b"\x18\x53\x80\x67" + b"\x01" + b"\xff" * 7 + seg_children
    else:
        seg = elem(b"\x18\x53\x80\x67", seg_children)
    return ebml + seg


@pytest.mark.slow
def test_mkv_header_meta_native(spark):
    """EBML/Matroska header walk: doctype, explicit + default
    TimestampScale, float4 AND float8 Duration decoded BIT-EXACTLY
    (2500.125-based values are not round in float32 — any arithmetic
    slip in the IEEE decode shows), Void/SeekHead padding and
    unknown-size Segments walked correctly, junk rejected, and the
    plan stays pure-JVM (no EvalPython)."""
    import struct

    from polaroam_spark.operators.multimodal import mkv_header_meta

    rows = [(m, _mk_mkv(m)) for m in range(12)] + [
        (97, b"\x00junkbytes" + bytes(24)),
        (98, b""),
        (99, None),
    ]
    df = spark.createDataFrame(rows, "i long, content binary")
    p = mkv_header_meta("content")
    out = {
        r.i: r.m
        for r in df.select("i", p.alias("m")).collect()
    }
    for m in range(12):
        r = out[m]
        assert r.is_mkv is True
        assert r.doctype == ("webm" if m % 2 else "matroska")
        exp_ts = [1000000, 100000, 1000][m % 3] if m % 3 != 2 else 1000000
        assert r.timestamp_scale == exp_ts, (m, r)
        exp_dur = struct.unpack(
            ">f", struct.pack(">f", (m + 1) * 2500.125)
        )[0]
        assert r.duration == exp_dur, (m, r.duration, exp_dur)
        assert r.duration_s == exp_dur * exp_ts / 1e9
    for i in (97, 98, 99):
        assert out[i].is_mkv is False
        assert out[i].doctype is None
        assert out[i].duration is None
    plan = df.select(mkv_header_meta("content"))._jdf.queryExecution() \
        .explainString(spark._jvm.org.apache.spark.sql.execution
                       .ExplainMode.fromString("simple"))
    assert "EvalPython" not in plan


def _mk_mkv_tracks(m: int) -> bytes:
    """MKV fixture #m with a Tracks element: a video TrackEntry
    (VP9/AVC, 640+m x 360+m) and an audio TrackEntry (Opus/AAC;
    every 3rd row omits Channels/SamplingFrequency to exercise the
    spec defaults), order flipped on m%4>=2, Void padding inside
    Tracks, unknown-size Segment on m%5==0."""
    import struct

    def vint(n, length=None):
        if length is None:
            length = 1
            while n >= (1 << (7 * length)) - 1:
                length += 1
        return (n | (1 << (7 * length))).to_bytes(length, "big")

    def elem(eid, payload):
        return eid + vint(len(payload)) + payload

    hdr = elem(b"\x42\x86", b"\x01") + elem(
        b"\x42\x82", b"webm" if m % 2 else b"matroska"
    )
    video = elem(b"\xb0", (640 + m).to_bytes(2, "big")) + elem(
        b"\xba", (360 + m).to_bytes(2, "big")
    )
    te_v = elem(
        b"\xae",
        elem(b"\x83", b"\x01")
        + elem(b"\x86", b"V_VP9" if m % 2 else b"V_MPEG4/ISO/AVC")
        + elem(b"\xe0", video),
    )
    audio = b"" if m % 3 == 0 else (
        elem(b"\x9f", bytes([2 if m % 2 else 6]))
        + elem(
            b"\xb5",
            struct.pack(
                ">f" if m % 2 else ">d",
                48000.0 if m % 2 else 44100.0,
            ),
        )
    )
    te_a = elem(
        b"\xae",
        elem(b"\x83", b"\x02")
        + elem(b"\x86", b"A_OPUS" if m % 2 else b"A_AAC")
        + elem(b"\xe1", audio),
    )
    entries = te_a + te_v if m % 4 >= 2 else te_v + te_a
    tracks = elem(b"\x16\x54\xae\x6b", elem(b"\xec", bytes(3)) + entries)
    kids = elem(
        b"\x15\x49\xa9\x66",
        elem(b"\x2a\xd7\xb1", (1_000_000).to_bytes(3, "big")),
    )
    kids += tracks + elem(b"\x1f\x43\xb6\x75", bytes(16))
    if m % 5 == 0:
        seg = b"\x18\x53\x80\x67" + b"\x01" + b"\xff" * 7 + kids
    else:
        seg = elem(b"\x18\x53\x80\x67", kids)
    return elem(b"\x1a\x45\xdf\xa3", hdr) + seg


@pytest.mark.slow
def test_mkv_track_meta_native(spark):
    """TrackEntry walk: per-track type/kind/codec, video dimensions,
    audio channels/rate (explicit float4 AND float8, spec defaults
    when the elements are absent BUT the Audio parent exists), track
    order preserved, no-Tracks and junk rows NULL, plan pure-JVM."""
    from polaroam_spark.operators.multimodal import (
        mkv_track_meta,
    )

    rows = [(m, _mk_mkv_tracks(m)) for m in range(12)] + [
        (100, _mk_mkv(3)),          # valid MKV, no Tracks element
        (101, b"\x00junk" + bytes(20)),
        (102, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {
        r.media_id: r.t
        for r in df.select(
            "media_id", mkv_track_meta("content").alias("t")
        ).collect()
    }
    assert out[100] is None and out[101] is None and out[102] is None
    for m in range(12):
        tr = out[m]
        assert tr is not None and len(tr) == 2, m
        by_kind = {t.track_kind: t for t in tr}
        v, a = by_kind["video"], by_kind["audio"]
        # order follows the container
        first = tr[0].track_kind
        assert first == ("audio" if m % 4 >= 2 else "video")
        assert v.track_type == 1 and a.track_type == 2
        assert v.codec_id == ("V_VP9" if m % 2 else "V_MPEG4/ISO/AVC")
        assert a.codec_id == ("A_OPUS" if m % 2 else "A_AAC")
        assert (v.pixel_width, v.pixel_height) == (640 + m, 360 + m)
        assert v.channels is None and v.sampling_hz is None
        if m % 3 == 0:
            assert (a.channels, a.sampling_hz) == (1, 8000.0)
        else:
            assert a.channels == (2 if m % 2 else 6)
            assert a.sampling_hz == (48000.0 if m % 2 else 44100.0)
        assert a.pixel_width is None and a.pixel_height is None
    plan = (
        df.select(mkv_track_meta("content"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


@pytest.mark.slow
def test_mkv_track_meta_truncation_fuzz(spark):
    """Every prefix of a valid tracked MKV plus seeded random
    garbage parses without raising — NULL or partial arrays, never
    an errored scan."""
    import random

    from polaroam_spark.operators.multimodal import mkv_track_meta

    full = _mk_mkv_tracks(7)
    rnd = random.Random(31)
    rows = [(i, full[:i]) for i in range(len(full))] + [
        (1000 + j, bytes(rnd.randrange(256) for _ in range(40)))
        for j in range(25)
    ]
    df = spark.createDataFrame(rows, "i long, content binary")
    got = df.select(mkv_track_meta("content").alias("t")).collect()
    assert len(got) == len(rows)  # no row errored
    last = (
        df.filter(df.i == len(full) - 1)
        .select(mkv_track_meta("content").alias("t"))
        .collect()
    )
    # one byte short of complete: must not raise; the full fixture
    # parses both tracks (checked in the native test)


@pytest.mark.slow
def test_mkv_header_meta_truncation_fuzz(spark):
    """Every prefix of a valid MKV plus seeded random garbage parses
    without raising — NULL fields, never an errored scan."""
    import random

    from polaroam_spark.operators.multimodal import mkv_header_meta

    full = _mk_mkv(3)
    rnd = random.Random(23)
    rows = [(i, full[:i]) for i in range(len(full))] + [
        (1000 + j, bytes(rnd.randrange(256) for _ in range(40)))
        for j in range(25)
    ]
    df = spark.createDataFrame(rows, "i long, content binary")
    got = df.select(mkv_header_meta("content").alias("m")).collect()
    assert len(got) == len(rows)  # no row errored
    # the complete file still parses at its full-length prefix
    whole = [r.m for r in got][0:0]  # noqa: F841 (clarity only)
    last = (
        df.filter(df.i == len(full) - 1)
        .select(mkv_header_meta("content").alias("m"))
        .collect()
    )
    assert last[0].m.is_mkv is True
