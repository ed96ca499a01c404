"""Avro Object Container File source/sink — the remaining mainstream
Hive-ecosystem format next to parquet/ORC/CSV/JSONL/WARC (row-
oriented ingest / CDC interchange side), implemented FROM THE PUBLIC
SPEC (Apache Avro 1.12 specification: zigzag-varint primitives,
``Obj\\x01`` container magic, metadata map carrying ``avro.schema``
JSON + ``avro.codec``, 16-byte sync-marker-delimited blocks) because
this distribution ships only the core avro-* jars, not the
spark-avro DataSource connector, and no Python avro package is baked
in. The codec is ~200 lines of well-specified byte arithmetic — the
same write-it-from-the-spec posture as the WARC/PNG/MKV parsers.

Scope: FLAT record schemas over the atomic types (boolean, int,
long, float, double, string, bytes) plus the two temporal LOGICAL
types real CDC rows carry — ``{"type": "int", "logicalType":
"date"}`` (days since epoch) and ``{"type": "long", "logicalType":
"timestamp-micros"}`` — with nullability as the spec's
``["null", T]`` union. Nested records/arrays/maps and other logical
types raise loudly on both sides (use parquet once inside the
pipeline; Avro is the one-hop ingest format here, exactly like
WARC).

Scale shape: writing is one output file per partition (mapInPandas
over Arrow batches, streamed block-per-batch — constant memory per
task; files route through pyarrow.fs so object-store URIs work);
reading is one input partition per .avro file via a PySpark 4
Python Data Source (``spark.read.format("avro")``), schema resolved
driver-side from the first file's header. A Python codec is the
SLOW PATH relative to built-in scans — right for the ingest hop
that turns .avro into parquet, wrong as a steady-state table format
(the module docstring of warc.py makes the same argument).

Reference parity: the reference engine reads parquet/CSV only
(reference read_localize_write.py); Avro is part of the
beyond-reference ingest surface.
"""

from __future__ import annotations

import glob as _glob
import io
import json
import os
import struct
import zlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql import types as T

from polaroam_spark.sources.warc import _fs_for, _has_scheme

_MAGIC = b"Obj\x01"

# Spark atomic type <-> Avro primitive name (flat schemas only)
_SPARK_TO_AVRO = {
    T.BooleanType: "boolean",
    T.IntegerType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.StringType: "string",
    T.BinaryType: "bytes",
    T.DateType: "date",
    T.TimestampType: "timestamp-micros",
}
# the annotated on-disk form per internal logical name
_LOGICAL_WRITTEN = {
    "date": {"type": "int", "logicalType": "date"},
    "timestamp-micros": {
        "type": "long",
        "logicalType": "timestamp-micros",
    },
}
_AVRO_TO_SPARK = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
    # internal names for the two supported logical types (stored in
    # the field list as these, written/read as the annotated form)
    "date": T.DateType(),
    "timestamp-micros": T.TimestampType(),
}
_EPOCH = None  # lazily-initialized date(1970, 1, 1)


def _epoch():
    global _EPOCH
    if _EPOCH is None:
        import datetime

        _EPOCH = datetime.date(1970, 1, 1)
    return _EPOCH


# ---------------------------------------------------------------
# primitive codec (spec: binary encoding)
# ---------------------------------------------------------------


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: memoryview, pos: int) -> "tuple[int, int]":
    shift = 0
    u = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), pos


def _enc_value(avro_type: str, v) -> bytes:
    if avro_type == "boolean":
        return b"\x01" if v else b"\x00"
    if avro_type in ("int", "long"):
        return _zigzag_encode(int(v))
    if avro_type == "date":
        return _zigzag_encode((v - _epoch()).days)
    if avro_type == "timestamp-micros":
        # tz-aware pandas Timestamp: .value is UTC epoch nanos (the
        # writer localizes session-naive columns BEFORE encode, so a
        # naive value reaching here means the caller bypassed
        # write_avro — treat as UTC, the spec's only interpretation)
        import pandas as _pd

        ts = _pd.Timestamp(v)
        return _zigzag_encode(ts.value // 1000)
    if avro_type == "float":
        return struct.pack("<f", float(v))
    if avro_type == "double":
        return struct.pack("<d", float(v))
    if avro_type == "string":
        b = str(v).encode("utf-8")
        return _zigzag_encode(len(b)) + b
    if avro_type == "bytes":
        b = bytes(v)
        return _zigzag_encode(len(b)) + b
    raise ValueError(f"unsupported avro type {avro_type!r}")


def _dec_value(avro_type: str, buf: memoryview, pos: int):
    if avro_type == "boolean":
        return buf[pos] != 0, pos + 1
    if avro_type in ("int", "long"):
        return _zigzag_decode(buf, pos)
    if avro_type == "date":
        import datetime

        n, pos = _zigzag_decode(buf, pos)
        return _epoch() + datetime.timedelta(days=n), pos
    if avro_type == "timestamp-micros":
        # tz-AWARE UTC: a naive datetime would be reinterpreted by
        # the consumer's system/session timezone (the data-source
        # serializer stamps naive values with the worker's LOCAL tz,
        # shifting instants on any non-UTC box — measured in the r18
        # probe); aware values are unambiguous everywhere
        import datetime

        n, pos = _zigzag_decode(buf, pos)
        return datetime.datetime(
            1970, 1, 1, tzinfo=datetime.timezone.utc
        ) + datetime.timedelta(microseconds=n), pos
    if avro_type == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if avro_type == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if avro_type == "string":
        n, pos = _zigzag_decode(buf, pos)
        return bytes(buf[pos : pos + n]).decode("utf-8"), pos + n
    if avro_type == "bytes":
        n, pos = _zigzag_decode(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    raise ValueError(f"unsupported avro type {avro_type!r}")


# ---------------------------------------------------------------
# schema mapping
# ---------------------------------------------------------------


def _avro_schema_for(
    schema: "T.StructType", name: str = "spark_row"
) -> dict:
    """Spark StructType -> flat Avro record schema dict; every
    field writes as ``["null", T]`` (Spark fields are nullable by
    default and the union costs one varint byte per value). Nested
    and non-atomic Spark types raise loudly."""
    fields = []
    for f in schema.fields:
        prim = _SPARK_TO_AVRO.get(type(f.dataType))
        if prim is None:
            raise ValueError(
                f"write_avro supports flat atomic columns only; "
                f"column {f.name!r} is {f.dataType.simpleString()} "
                "— project to atomics (or keep nested data in "
                "parquet, the in-pipeline format)"
            )
        written = _LOGICAL_WRITTEN.get(prim, prim)
        fields.append({"name": f.name, "type": ["null", written]})
    return {"type": "record", "name": name, "fields": fields}


def _field_types(avro_schema: dict) -> "list[tuple[str, str, int | None]]":
    """[(name, primitive, null_branch_index)] from a flat Avro record
    schema (ours or third-party: plain primitives, ``["null", T]`` /
    ``[T, "null"]`` unions). ``null_branch_index`` is None for
    non-union fields, else the POSITION of "null" in the union — the
    spec allows either order, and a decoder that assumes branch 0 is
    null reads every value of a ``[T, "null"]`` file as null and then
    desyncs the stream. Anything else raises loudly."""
    if avro_schema.get("type") != "record":
        raise ValueError(
            f"expected a record schema, got {avro_schema.get('type')!r}"
        )
    out = []
    for f in avro_schema["fields"]:
        t = f["type"]
        nullable = None
        if isinstance(t, list):
            branches = [b for b in t if b != "null"]
            if len(branches) != 1 or len(branches) == len(t):
                raise ValueError(
                    f"field {f['name']!r}: only ['null', T] unions "
                    f"are supported (got {t!r})"
                )
            nullable = t.index("null")
            t = branches[0]
        if isinstance(t, dict):
            lt = t.get("logicalType")
            base = t.get("type")
            if (lt, base) == ("date", "int"):
                t = "date"
            elif (lt, base) == ("timestamp-micros", "long"):
                t = "timestamp-micros"
            else:
                raise ValueError(
                    f"field {f['name']!r}: nested/logical type "
                    f"{t!r} not supported — flat atomic columns "
                    "plus date/timestamp-micros only"
                )
        if t not in _AVRO_TO_SPARK:
            raise ValueError(
                f"field {f['name']!r}: unsupported avro type {t!r}"
            )
        out.append((f["name"], t, nullable))
    return out


def _spark_schema_for(avro_schema: dict) -> "T.StructType":
    return T.StructType(
        [
            T.StructField(n, _AVRO_TO_SPARK[t], True)
            for n, t, _ in _field_types(avro_schema)
        ]
    )


# ---------------------------------------------------------------
# container file
# ---------------------------------------------------------------


def _write_header(
    out: "io.BufferedIOBase", schema_json: str, codec: str, sync: bytes
) -> None:
    out.write(_MAGIC)
    meta = {
        "avro.schema": schema_json.encode("utf-8"),
        "avro.codec": codec.encode("ascii"),
    }
    out.write(_zigzag_encode(len(meta)))
    for k, v in sorted(meta.items()):
        kb = k.encode("ascii")
        out.write(_zigzag_encode(len(kb)) + kb)
        out.write(_zigzag_encode(len(v)) + v)
    out.write(_zigzag_encode(0))  # end of metadata blocks
    out.write(sync)


def _write_block(
    out: "io.BufferedIOBase",
    n_rows: int,
    data: bytes,
    codec: str,
    sync: bytes,
) -> None:
    if codec == "deflate":
        # spec: raw RFC 1951 deflate (no zlib header/checksum)
        c = zlib.compressobj(9, zlib.DEFLATED, -15)
        data = c.compress(data) + c.flush()
    out.write(_zigzag_encode(n_rows))
    out.write(_zigzag_encode(len(data)))
    out.write(data)
    out.write(sync)


def _read_header(buf: memoryview) -> "tuple[dict, str, bytes, int]":
    """(avro_schema, codec, sync, pos-after-header)."""
    if bytes(buf[:4]) != _MAGIC:
        raise ValueError(
            "not an Avro object container file (bad magic)"
        )
    pos = 4
    meta: "dict[str, bytes]" = {}
    while True:
        n, pos = _zigzag_decode(buf, pos)
        if n == 0:
            break
        if n < 0:  # spec: negative count precedes a byte size
            n = -n
            _, pos = _zigzag_decode(buf, pos)
        for _ in range(n):
            kl, pos = _zigzag_decode(buf, pos)
            k = bytes(buf[pos : pos + kl]).decode("ascii")
            pos += kl
            vl, pos = _zigzag_decode(buf, pos)
            meta[k] = bytes(buf[pos : pos + vl])
            pos += vl
    sync = bytes(buf[pos : pos + 16])
    pos += 16
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("ascii")
    if codec not in ("null", "deflate"):
        raise ValueError(
            f"unsupported avro codec {codec!r} (null/deflate)"
        )
    return schema, codec, sync, pos


def _iter_file_rows(raw: bytes, expected: "list[tuple[str, str]] | None" = None):
    """Yield tuples from one container file, in order. ``expected``
    is the driver-resolved ``[(name, primitive)]`` list: a file whose
    header declares a different field list (reordered, renamed, or
    retyped) raises loudly instead of silently landing values in the
    wrong columns — every executor decodes against ONE agreed
    schema, as the reader class docstring promises."""
    buf = memoryview(raw)
    schema, codec, sync, pos = _read_header(buf)
    fts = _field_types(schema)
    if expected is not None:
        got = [(n, t) for n, t, _ in fts]
        if got != expected:
            raise ValueError(
                "avro file schema does not match the driver-resolved "
                f"schema: file declares {got!r}, expected "
                f"{expected!r} — read mismatched file sets separately"
            )
    n_bytes = len(raw)
    while pos < n_bytes:
        count, pos = _zigzag_decode(buf, pos)
        size, pos = _zigzag_decode(buf, pos)
        data = buf[pos : pos + size]
        pos += size
        if bytes(buf[pos : pos + 16]) != sync:
            raise ValueError(
                "avro block sync marker mismatch — corrupt or "
                "truncated file"
            )
        pos += 16
        if codec == "deflate":
            data = memoryview(zlib.decompress(bytes(data), -15))
        dpos = 0
        for _ in range(count):
            row = []
            for name, t, null_idx in fts:
                if null_idx is not None:
                    idx, dpos = _zigzag_decode(data, dpos)
                    if idx == null_idx:
                        row.append(None)
                        continue
                    if idx != 1 - null_idx:
                        raise ValueError(
                            f"avro field {name!r}: union branch "
                            f"{idx} out of range — corrupt block"
                        )
                v, dpos = _dec_value(t, data, dpos)
                row.append(v)
            yield tuple(row)


# ---------------------------------------------------------------
# sink
# ---------------------------------------------------------------


def write_avro(
    df,
    path: str,
    codec: str = "null",
    mode: str = "overwrite",
) -> "tuple[int, int]":
    """Write ``df`` as a directory of Avro object container files,
    ONE file per partition (``part-{pid:05d}.avro``), blocks
    streamed one Arrow batch at a time — constant task memory at
    any partition size. Returns ``(n_files, n_rows)``; empty
    partitions write nothing. ``codec``: ``'null'`` or
    ``'deflate'`` (raw RFC 1951, the spec's required pair). The
    sync marker is md5(schema, partition) — deterministic output
    bytes for identical input partitions. ``path`` may be a URI
    (s3://…, file://…) — routed via pyarrow.fs like the WARC and
    tokenizer-model savers. ``mode='overwrite'`` clears an existing
    directory first; ``'error'`` raises if it exists."""
    import hashlib

    from pyspark.sql import functions as F

    if codec not in ("null", "deflate"):
        raise ValueError(
            f"unsupported avro codec {codec!r} (null/deflate)"
        )
    avro_schema = _avro_schema_for(df.schema)
    schema_json = json.dumps(avro_schema)
    fts = _field_types(avro_schema)
    # mapInPandas delivers TimestampType as tz-NAIVE wall time in the
    # session timezone; timestamp-micros is epoch-UTC micros on disk,
    # so the writer must localize before encoding or non-UTC sessions
    # write spec-incorrect files (offset by the tz offset — a
    # roundtrip through this module cancels, a third-party consumer
    # reads shifted instants)
    session_tz = df.sparkSession.conf.get(
        "spark.sql.session.timeZone"
    )
    ts_cols = [n for n, t, _ in fts if t == "timestamp-micros"]

    filesystem, local = _fs_for(path)
    if filesystem is None:
        if os.path.exists(local):
            if mode == "error":
                raise FileExistsError(path)
            import shutil

            shutil.rmtree(local)
        os.makedirs(local, exist_ok=True)
    else:
        from pyarrow import fs as pafs

        info = filesystem.get_file_info(local)
        if info.type != pafs.FileType.NotFound:
            if mode == "error":
                raise FileExistsError(path)
            filesystem.delete_dir_contents(local)
        filesystem.create_dir(local, recursive=True)

    uri_root = path if _has_scheme(path) else None

    def _write_partition(it):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        sync = hashlib.md5(
            (schema_json + f"|{pid}").encode("utf-8")
        ).digest()
        fname = f"part-{pid:05d}.avro"
        out = None
        n = 0
        for pdf in it:
            if pdf.empty:
                continue
            for tc in ts_cols:
                s = pdf[tc]
                if getattr(s.dt, "tz", None) is None:
                    # session wall time -> aware; .value is then UTC
                    # nanos in _enc_value. Ambiguous/nonexistent DST
                    # wall times raise (loud beats a silent ±1h).
                    pdf = pdf.assign(**{tc: s.dt.tz_localize(session_tz)})
            if out is None:
                if uri_root is not None:
                    fs2, loc2 = _fs_for(uri_root)
                    out = fs2.open_output_stream(
                        loc2.rstrip("/") + "/" + fname
                    )
                else:
                    out = open(os.path.join(local, fname), "wb")
                _write_header(out, schema_json, codec, sync)
            block = bytearray()
            cols = [pdf[name] for name, _, _ in fts]
            for vals in zip(*cols):
                for (name, t, _), v in zip(fts, vals):
                    if (
                        v is None
                        or v is pd.NA
                        or v is pd.NaT
                        or (isinstance(v, float) and v != v)
                    ):
                        block += b"\x00"  # union branch 0 = null
                    else:
                        block += b"\x02"  # union branch 1 (zigzag 1)
                        block += _enc_value(t, v)
            _write_block(out, len(pdf), bytes(block), codec, sync)
            n += len(pdf)
        if out is not None:
            out.close()
            yield pd.DataFrame({"file": [fname], "n_rows": [n]})

    # normalize NaN-able float columns ahead of the NaN-as-null
    # check: pandas floats carry NaN for missing ints too, so the
    # writer treats NaN as null uniformly (documented)
    res = df.mapInPandas(
        _write_partition, schema="file string, n_rows long"
    ).collect()
    return len(res), int(sum(r.n_rows for r in res))


# ---------------------------------------------------------------
# source
# ---------------------------------------------------------------


class _AvroFilePartition(InputPartition):
    def __init__(self, path: str, fs_root: "str | None" = None):
        self.path = path
        self.fs_root = fs_root


def _list_avro_files(path: str) -> "list[tuple[str, str | None]]":
    """[(fs-local path, fs_root-or-None)] for a path/URI/directory."""
    if _has_scheme(path):
        from pyarrow import fs as pafs

        filesystem, local = _fs_for(path)
        info = filesystem.get_file_info(local)
        if info.type == pafs.FileType.Directory:
            sel = pafs.FileSelector(local, recursive=True)
            return sorted(
                (f.path, path)
                for f in filesystem.get_file_info(sel)
                if f.is_file and f.base_name.endswith(".avro")
            )
        if info.type == pafs.FileType.File:
            return [(local, path)]
        raise FileNotFoundError(f"no avro files under {path}")
    if os.path.isdir(path):
        files = sorted(
            _glob.glob(os.path.join(path, "**", "*.avro"), recursive=True)
        )
    else:
        files = sorted(_glob.glob(path)) or (
            [path] if os.path.exists(path) else []
        )
    if not files:
        raise FileNotFoundError(f"no avro files under {path}")
    return [(f, None) for f in files]


def _read_file_bytes(path: str, fs_root: "str | None") -> bytes:
    if fs_root is not None:
        filesystem, _ = _fs_for(fs_root)
        with filesystem.open_input_stream(path) as f:
            return f.read()
    with open(path, "rb") as f:
        return f.read()


class _AvroReader(DataSourceReader):
    def __init__(
        self,
        options: dict,
        expected: "list[tuple[str, str]] | None" = None,
    ):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("avro source requires a path")
        # driver-resolved [(name, primitive)] — shipped to executors
        # so every file is validated against ONE agreed schema
        self._expected = expected

    def partitions(self):
        return [
            _AvroFilePartition(f, root)
            for f, root in _list_avro_files(self._path)
        ]

    def read(self, partition: _AvroFilePartition):
        raw = _read_file_bytes(
            partition.path, getattr(partition, "fs_root", None)
        )
        yield from _iter_file_rows(raw, self._expected)


class AvroDataSource(DataSource):
    """``spark.read.format('avrofile')`` over container files written
    by :func:`write_avro` or any spec-conforming writer with a flat
    record schema. One input partition per file (row-oriented
    container files are block-compressed against one sync stream —
    file granularity is the natural split, same argument as WARC).
    The schema resolves DRIVER-SIDE from the first file's header,
    so every executor decodes against one agreed schema; files with
    a different field list fail loudly at decode, not silently."""

    # 'avro' itself is a RESERVED name: Spark core pre-registers
    # the (absent) spark-avro module's shortname and rejects a
    # Python source reusing it, hence 'avrofile'
    @classmethod
    def name(cls) -> str:
        return "avrofile"

    def schema(self):
        f, root = _list_avro_files(self.options.get("path"))[0]
        if root is not None:
            filesystem, _ = _fs_for(root)
            with filesystem.open_input_stream(f) as fh:
                head = fh.read(1 << 20)
        else:
            with open(f, "rb") as fh:
                head = fh.read(1 << 20)
        schema, _, _, _ = _read_header(memoryview(head))
        return _spark_schema_for(schema)

    def reader(self, schema):
        # the Spark<->Avro atomic mapping is a bijection, so the
        # driver-resolved StructType determines the expected
        # (name, primitive) list executors validate each file against
        expected = [
            (f.name, _SPARK_TO_AVRO[type(f.dataType)])
            for f in schema.fields
            if type(f.dataType) in _SPARK_TO_AVRO
        ]
        if len(expected) != len(schema.fields):
            expected = None  # user-supplied non-atomic schema
        return _AvroReader(self.options, expected)


def register_avro_source(spark) -> None:
    """Idempotent registration of the ``avrofile`` format."""
    spark.dataSource.register(AvroDataSource)


def read_avro(spark, path: str):
    """``spark.read.format('avrofile').load(path)`` with
    registration — the ingest-hop reader twin of
    :func:`write_avro`."""
    register_avro_source(spark)
    return spark.read.format("avrofile").load(path)
