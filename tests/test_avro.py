"""Avro object-container source/sink tests: zigzag codec vs
hand-computed spec bytes, full write->read roundtrips across
types/nulls/codecs, URI paths, block/sync integrity, and loud
failures on unsupported shapes."""
import os

import pytest

from pyspark.sql import functions as F


def test_zigzag_spec_vectors():
    """The Avro spec's published zigzag examples (0,-1,1,-2,2 ->
    00,01,02,03,04) plus varint continuation and 64-bit edges,
    decode inverting encode."""
    from polaroam_spark.sources.avro import (
        _zigzag_decode,
        _zigzag_encode,
    )

    vectors = {
        0: b"\x00",
        -1: b"\x01",
        1: b"\x02",
        -2: b"\x03",
        2: b"\x04",
        -64: b"\x7f",
        64: b"\x80\x01",
    }
    for n, want in vectors.items():
        assert _zigzag_encode(n) == want, n
    for n in [0, 1, -1, 127, -128, 300, -300, 2**40, -(2**40),
              2**62, -(2**62)]:
        got, pos = _zigzag_decode(memoryview(_zigzag_encode(n)), 0)
        assert got == n and pos == len(_zigzag_encode(n))


def test_container_golden_bytes():
    """One record {'k': 1, 's': 'hi'} written with the null codec:
    the container layout (magic, meta map, sync, block framing and
    the union-branch + value bytes) matches bytes assembled BY HAND
    from the spec — independent of the writer's own helpers."""
    import hashlib
    import json

    from polaroam_spark.sources.avro import _iter_file_rows

    schema = {
        "type": "record",
        "name": "spark_row",
        "fields": [
            {"name": "k", "type": ["null", "long"]},
            {"name": "s", "type": ["null", "string"]},
        ],
    }
    sj = json.dumps(schema).encode()
    sync = hashlib.md5(b"golden").digest()

    def vint(n):  # non-negative zigzag varints assembled by hand
        u = n << 1
        out = b""
        while True:
            b = u & 0x7F
            u >>= 7
            if u:
                out += bytes([b | 0x80])
            else:
                return out + bytes([b])

    meta = b""
    # sorted: avro.codec then avro.schema
    meta += vint(len(b"avro.codec")) + b"avro.codec"
    meta += vint(len(b"null")) + b"null"
    meta += vint(len(b"avro.schema")) + b"avro.schema"
    meta += vint(len(sj)) + sj
    header = b"Obj\x01" + vint(2) + meta + vint(0) + sync
    # row: union branch 1 (zigzag -> 02), long 1 (02);
    #      branch 1, string len 2, 'hi'
    rowdata = b"\x02\x02" + b"\x02" + vint(2) + b"hi"
    block = vint(1) + vint(len(rowdata)) + rowdata + sync
    raw = header + block
    rows = list(_iter_file_rows(raw))
    assert rows == [(1, "hi")]


@pytest.fixture()
def typed_df(spark):
    rows = [
        (1, "alpha", 1.5, 2.25, True, b"\x00\xff", 7),
        (2, "", -3.25, -0.5, False, b"", -7),
        (3, None, None, None, None, None, None),
        (4, "unicode ✓ 漢字", 0.0, 1e300, True, b"\x80", 2**31 - 1),
    ]
    return spark.createDataFrame(
        rows,
        "k long, s string, f float, d double, b boolean, "
        "y binary, i int",
    )


@pytest.mark.slow
def test_roundtrip_all_types_and_codecs(spark, typed_df, tmp_path):
    """Exact value roundtrip for every supported type including
    NULLs, under both codecs; deflate writes measurably smaller
    files on compressible data; schema survives."""
    from polaroam_spark.sources.avro import read_avro, write_avro

    for codec in ("null", "deflate"):
        p = str(tmp_path / codec)
        nf, nr = write_avro(typed_df, p, codec=codec)
        assert nr == 4 and nf >= 1
        back = read_avro(spark, p)
        assert [f.name for f in back.schema.fields] == [
            "k", "s", "f", "d", "b", "y", "i",
        ]
        got = {r.k: r for r in back.collect()}
        want = {r.k: r for r in typed_df.collect()}
        assert set(got) == set(want)
        for k in want:
            for c in ("s", "f", "d", "b", "i"):
                assert got[k][c] == want[k][c], (codec, k, c)
            gy, wy = got[k]["y"], want[k]["y"]
            assert (gy is None) == (wy is None)
            if gy is not None:
                assert bytes(gy) == bytes(wy)


def test_deflate_compresses(spark, tmp_path):
    from polaroam_spark.sources.avro import write_avro

    df = spark.range(1).select(
        F.lit("the same compressible sentence " * 200).alias("t")
    )
    pn, pz = str(tmp_path / "n"), str(tmp_path / "z")
    write_avro(df, pn, codec="null")
    write_avro(df, pz, codec="deflate")

    def size(d):
        return sum(
            os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
        )

    assert size(pz) < size(pn) / 3


def test_partition_files_and_order_identity(spark, tmp_path):
    """One file per non-empty partition; (file, in-file order) is
    stable; empty partitions write nothing."""
    from polaroam_spark.sources.avro import read_avro, write_avro

    df = spark.range(100).select(
        F.col("id").alias("k"),
        F.concat(F.lit("row "), F.col("id")).alias("s"),
    ).repartition(8)
    p = str(tmp_path / "parts")
    nf, nr = write_avro(df, p)
    assert nr == 100 and 1 <= nf <= 8
    files = [f for f in os.listdir(p) if f.endswith(".avro")]
    assert len(files) == nf
    back = read_avro(spark, p)
    assert back.count() == 100
    assert (
        back.select(F.sum("k")).first()[0]
        == df.select(F.sum("k")).first()[0]
    )


def test_corrupt_sync_is_loud(spark, tmp_path):
    from polaroam_spark.sources.avro import read_avro, write_avro

    df = spark.range(10).select(F.col("id").alias("k"))
    p = str(tmp_path / "c")
    write_avro(df, p)
    f = os.path.join(
        p, [x for x in os.listdir(p) if x.endswith(".avro")][0]
    )
    raw = bytearray(open(f, "rb").read())
    raw[-1] ^= 0xFF  # flip a sync byte
    open(f, "wb").write(bytes(raw))
    with pytest.raises(Exception, match="sync marker"):
        read_avro(spark, p).collect()


def test_unsupported_shapes_are_loud(spark, tmp_path):
    from polaroam_spark.sources.avro import write_avro

    nested = spark.range(3).select(
        F.array(F.col("id")).alias("a")
    )
    with pytest.raises(ValueError, match="flat atomic"):
        write_avro(nested, str(tmp_path / "x"))
    flat = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="codec"):
        write_avro(flat, str(tmp_path / "y"), codec="snappy")
    p = str(tmp_path / "z")
    write_avro(flat, p)
    with pytest.raises(FileExistsError):
        write_avro(flat, p, mode="error")
    # overwrite mode replaces
    write_avro(flat, p, mode="overwrite")


def test_temporal_logical_types_roundtrip(spark, tmp_path):
    """date and timestamp-micros logical types: the TPC-H orders
    slice (o_orderdate is a DATE) and an explicit timestamp column
    roundtrip exactly; NULL temporals survive; the written schema
    carries the spec's annotated form."""
    import datetime
    import json

    from polaroam_spark.sources.avro import read_avro, write_avro

    rows = [
        (1, datetime.date(1995, 3, 15),
         datetime.datetime(2020, 6, 1, 12, 30, 45, 123456)),
        (2, None, None),
        (3, datetime.date(1970, 1, 1),
         datetime.datetime(1969, 12, 31, 23, 59, 59, 999999)),
    ]
    df = spark.createDataFrame(
        rows, "k long, d date, ts timestamp"
    )
    p = str(tmp_path / "tmp")
    write_avro(df, p, codec="deflate")
    import os

    f = os.path.join(
        p, [x for x in os.listdir(p) if x.endswith(".avro")][0]
    )
    head = open(f, "rb").read()
    assert b'"logicalType": "date"' in head.replace(b'":"', b'": "') \
        or b'"logicalType"' in head
    back = {r.k: r for r in read_avro(spark, p).collect()}
    want = {r[0]: r for r in rows}
    for k, r in want.items():
        assert back[k].d == r[1], (k, back[k].d, r[1])
        assert back[k].ts == r[2], (k, back[k].ts, r[2])

    # the TPC-H orders slice (real DATE column from parquet)
    orders = spark.read.parquet(
        "/root/testdata/sf0.001/orders.parquet"
    ).select("o_orderkey", "o_orderdate").limit(200)
    if dict(orders.dtypes)["o_orderdate"] == "date":
        p2 = str(tmp_path / "orders")
        write_avro(orders, p2)
        got = read_avro(spark, p2)
        from pyspark.sql import functions as F

        a = orders.agg(
            F.count("*"), F.min("o_orderdate"), F.max("o_orderdate")
        ).first()
        b = got.agg(
            F.count("*"), F.min("o_orderdate"), F.max("o_orderdate")
        ).first()
        assert a == b


def test_value_first_union_order():
    """Spec-valid [T, "null"] unions (value branch FIRST): a
    third-party file with that ordering must decode values as
    values and nulls as nulls — a decoder that assumes branch 0 is
    null reads every value as null and desyncs the stream (r18
    ADVICE fix)."""
    import hashlib
    import json

    from polaroam_spark.sources.avro import _iter_file_rows

    schema = {
        "type": "record",
        "name": "spark_row",
        "fields": [
            {"name": "k", "type": ["long", "null"]},
            {"name": "s", "type": ["string", "null"]},
        ],
    }
    sj = json.dumps(schema).encode()
    sync = hashlib.md5(b"valuefirst").digest()

    def vint(n):
        u = n << 1
        out = b""
        while True:
            b = u & 0x7F
            u >>= 7
            if u:
                out += bytes([b | 0x80])
            else:
                return out + bytes([b])

    meta = b""
    meta += vint(len(b"avro.codec")) + b"avro.codec"
    meta += vint(len(b"null")) + b"null"
    meta += vint(len(b"avro.schema")) + b"avro.schema"
    meta += vint(len(sj)) + sj
    header = b"Obj\x01" + vint(2) + meta + vint(0) + sync
    # row 1: k = branch 0 (value) long 7; s = branch 0 string 'hi'
    r1 = vint(0) + vint(7) + vint(0) + vint(2) + b"hi"
    # row 2: k = branch 1 (null); s = branch 1 (null)
    r2 = vint(1) + vint(1)
    block = vint(2) + vint(len(r1 + r2)) + r1 + r2 + sync
    rows = list(_iter_file_rows(header + block))
    assert rows == [(7, "hi"), (None, None)]

    # a union index that is neither branch is loud, not garbage
    bad = vint(2) + vint(7)
    badblock = vint(1) + vint(len(bad)) + bad + sync
    with pytest.raises(ValueError, match="union branch"):
        list(_iter_file_rows(header + badblock))


def test_mismatched_file_schema_is_loud(spark, tmp_path):
    """A file whose header declares a different field list than the
    driver-resolved schema raises instead of silently landing
    values in the wrong columns (r18 ADVICE fix: the reader ships
    the resolved (name, type) list to executors)."""
    import shutil

    from polaroam_spark.sources.avro import read_avro, write_avro

    a = spark.range(5).select(
        F.col("id").alias("k"), F.lit("x").alias("s")
    ).coalesce(1)
    b = spark.range(5).select(
        F.lit("y").alias("s"), F.col("id").alias("k")  # reordered
    ).coalesce(1)
    pa_, pb = str(tmp_path / "a"), str(tmp_path / "b")
    write_avro(a, pa_)
    write_avro(b, pb)
    # drop b's file into a's directory under a distinct name
    fb = [x for x in os.listdir(pb) if x.endswith(".avro")][0]
    shutil.copy(
        os.path.join(pb, fb), os.path.join(pa_, "zz-" + fb)
    )
    with pytest.raises(Exception, match="driver-resolved"):
        read_avro(spark, pa_).collect()


def test_timestamp_micros_on_disk_is_utc(spark, tmp_path):
    """With a non-UTC session timezone the on-disk micros must be
    the UTC INSTANT, not session wall time reinterpreted as UTC —
    third-party Avro consumers read the raw micros (r18 ADVICE
    fix); and the read side must return the same instant regardless
    of the worker's system timezone (decode yields tz-aware UTC)."""
    import datetime

    from polaroam_spark.sources.avro import (
        _iter_file_rows,
        read_avro,
        write_avro,
    )

    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set(
            "spark.sql.session.timeZone", "America/Mexico_City"
        )
        df = spark.sql(
            "select 1 as k, timestamp'2024-01-15 12:00:00' as ts"
        ).coalesce(1)
        src_epoch = df.select(
            F.unix_timestamp("ts").alias("e")
        ).first()["e"]
        # 12:00 MX wall time in January == 18:00:00Z
        assert src_epoch == 1705341600
        p = str(tmp_path / "tz")
        write_avro(df, p)
        f = os.path.join(
            p, [x for x in os.listdir(p) if x.endswith(".avro")][0]
        )
        rows = list(_iter_file_rows(open(f, "rb").read()))
        assert rows[0][1] == datetime.datetime(
            2024, 1, 15, 18, 0, tzinfo=datetime.timezone.utc
        )
        back = read_avro(spark, p)
        assert back.select(
            F.unix_timestamp("ts").alias("e")
        ).first()["e"] == src_epoch
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)

