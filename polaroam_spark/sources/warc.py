"""WARC (Web ARChive, ISO 28500) source — the Common Crawl container
every web-scale LLM corpus starts from — as a PySpark 4 Python Data
Source (``spark.read.format("warc")``).

Scale shape: one input partition per WARC file. This is the FINAL
contract, not a to-do (r20 optimization round decision): the Common
Crawl layout is ~1 GB files x ~64k files per crawl, so file-granular
parallelism saturates any cluster that could ingest it; and finer
byte-range splitting is incompatible with this source's record
identity — ``(source_file, record_index)`` with record_index the
in-file ordinal of ALL records (pinned by tests/test_sources.py) —
because a reader starting mid-file cannot know how many records
precede its range without scanning from byte 0 (member-per-record
.gz resync could find record BOUNDARIES, but never ordinals, and
single-stream .warc.gz cannot be entered mid-stream at all). Each
partition streams its file record by record: headers are parsed
from the \\r\\n\\r\\n-terminated block, the payload is read by
exact Content-Length, and nothing beyond the current record is
buffered — constant memory per task regardless of file size. Gzip
files (including the multi-member member-per-record Common Crawl
convention) decompress through the same streaming path.

A Python data source is the SLOW PATH relative to the built-in scans
(rows cross the Python boundary via Arrow batches) — right for the
one ingest hop that turns .warc into parquet, after which everything
reads columnar. ``filter pushdown``: the reader declares none;
project/filter AFTER the parquet hop, not here.

Reference parity: the reference engine reads parquet/CSV only
(reference read_localize_write.py); WARC ingest is part of the
beyond-reference LLM-pipeline surface.
"""

from __future__ import annotations

import glob as _glob
import gzip
import io
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_SCHEMA = StructType(
    [
        StructField("record_id", StringType()),  # WARC-Record-ID
        StructField("warc_type", StringType()),  # response/request/..
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_type", StringType()),
        StructField("content_length", LongType()),
        StructField("payload", BinaryType()),
        StructField("source_file", StringType()),
        StructField("record_index", LongType()),  # ordinal in file
    ]
)


class _WarcFilePartition(InputPartition):
    def __init__(self, path: str, fs_root: "str | None" = None):
        # fs_root: when the file came from a URI directory listing,
        # the ORIGINAL root URI — carried so executors re-resolve the
        # same filesystem (scheme + authority) and open `path` as an
        # fs-LOCAL path. Rebuilding a URI from a listed local path
        # would drop the authority (hdfs://namenode:8020/... lists as
        # /data/f.warc.gz — re-prefixing just the scheme makes 'data'
        # the host; r13 self-review).
        self.path = path
        self.fs_root = fs_root


def _has_scheme(path: str) -> bool:
    """True for URI-style paths (``s3://…``, ``file:///…``, ``hdfs://…``)
    that must route through a filesystem abstraction instead of the
    POSIX calls. Windows drive letters don't occur on cluster paths."""
    return "://" in path


def _fs_for(path: str):
    """(pyarrow FileSystem, fs-local path) for a URI — the one
    abstraction in the baked-in stack that speaks local, S3, GCS and
    HDFS uniformly. Plain paths return (None, path) and stay on the
    direct POSIX fast path."""
    if not _has_scheme(path):
        return None, path
    from pyarrow import fs as pafs

    return pafs.FileSystem.from_uri(path)


def _list_uri_warc_files(path: str) -> "list[str]":
    """Enumerate .warc/.warc.gz files under a URI via pyarrow.fs
    (recursive FileSelector — object stores list by prefix, no glob
    needed). Returns FS-LOCAL paths; pair them with the root URI in
    the partition so ``read()`` resolves the identical filesystem."""
    from pyarrow import fs as pafs

    filesystem, local = _fs_for(path)
    info = filesystem.get_file_info(local)
    if info.type == pafs.FileType.Directory:
        sel = pafs.FileSelector(local, recursive=True)
        return sorted(
            f.path
            for f in filesystem.get_file_info(sel)
            if f.is_file and ".warc" in f.base_name
        )
    if info.type == pafs.FileType.File:
        return [local]
    raise FileNotFoundError(f"no WARC files under {path}")


def _open_warc_stream(
    path: str, fs_root: "str | None" = None
) -> "io.BufferedIOBase":
    """Open one WARC file for streaming reads, decompressing by
    extension. URI paths (or fs-local paths under ``fs_root``) open
    through pyarrow.fs input streams (seekless sequential reads —
    exactly the access pattern object stores serve well); gzip
    decompression wraps the remote stream
    (``gzip.GzipFile(fileobj=…)``), so remote .warc.gz files flow
    through the same O(record)-memory parse as local ones."""
    if fs_root is not None or _has_scheme(path):
        filesystem, local = _fs_for(fs_root or path)
        if fs_root is not None:
            local = path  # already fs-local, from the listing
        # compression=None: keep decompression on OUR gzip path (it
        # handles the Common Crawl member-per-record convention);
        # pyarrow's default 'detect' would double-decompress .gz
        raw = filesystem.open_input_stream(local, compression=None)
        if path.endswith(".gz"):
            return io.BufferedReader(gzip.GzipFile(fileobj=raw))
        return io.BufferedReader(raw)
    opener = gzip.open if path.endswith(".gz") else open
    return io.BufferedReader(opener(path, "rb"))


def _iter_warc_records(stream: "io.BufferedIOBase"):
    """Yield (headers dict lowercase-keyed, payload bytes) per record.
    Streams: reads exactly one record ahead, O(record) memory."""
    while True:
        # skip inter-record blank lines
        line = stream.readline()
        if not line:
            return
        if line in (b"\r\n", b"\n"):
            continue
        if not line.startswith(b"WARC/"):
            raise ValueError(
                f"malformed WARC: expected version line, got {line[:40]!r}"
            )
        headers: dict = {}
        while True:
            h = stream.readline()
            if h in (b"\r\n", b"\n", b""):
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.strip().lower().decode("ascii")] = (
                    v.strip().decode("utf-8", "replace")
                )
        n = int(headers.get("content-length", "0"))
        payload = stream.read(n)
        if len(payload) != n:
            raise ValueError(
                "truncated WARC record: expected "
                f"{n} payload bytes, got {len(payload)}"
            )
        yield headers, payload


class _WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        self._path = options.get("path")
        # 'files' option: explicit newline/comma-separated file list —
        # bypasses listing entirely. At crawl scale this is the right
        # input: Common Crawl publishes warc.paths manifests (~64k
        # entries), and listing an object-store prefix with 64k keys
        # costs paginated API round-trips a manifest already paid for.
        files = options.get("files")
        self._files = (
            [
                f.strip()
                for f in files.replace(",", "\n").splitlines()
                if f.strip()
            ]
            if files
            else None
        )
        if not self._path and not self._files:
            raise ValueError(
                "warc source requires a path or a files list"
            )
        # 'types' option: comma-separated WARC-Type allowlist (e.g.
        # "response"). Common Crawl interleaves request/metadata
        # records with responses — filtering INSIDE the reader skips
        # them before rows ever cross the Arrow boundary (the
        # expensive hop of a Python source); payload bytes of
        # skipped records are still consumed (sequential format)
        # but never materialize as rows.
        types = options.get("types")
        self._types = (
            {t.strip().lower() for t in types.split(",") if t.strip()}
            if types
            else None
        )

    def partitions(self):
        if self._files is not None:
            # explicit manifest: each entry resolves itself (plain
            # path or full URI)
            parts = [_WarcFilePartition(f) for f in self._files]
        elif _has_scheme(self._path):
            parts = [
                _WarcFilePartition(f, fs_root=self._path)
                for f in _list_uri_warc_files(self._path)
            ]
        else:
            path = self._path
            if os.path.isdir(path):
                files = sorted(
                    _glob.glob(
                        os.path.join(path, "**", "*.warc*"),
                        recursive=True,
                    )
                )
            else:
                files = sorted(_glob.glob(path)) or [path]
            parts = [_WarcFilePartition(f) for f in files]
        if not parts:
            raise FileNotFoundError(
                f"no WARC files under {self._path}"
            )
        return parts

    def read(self, partition: _WarcFilePartition):
        path = partition.path
        with _open_warc_stream(
            path, getattr(partition, "fs_root", None)
        ) as stream:
            for i, (hd, payload) in enumerate(
                _iter_warc_records(stream)
            ):
                if self._types is not None and (
                    (hd.get("warc-type") or "").lower()
                    not in self._types
                ):
                    continue
                yield (
                    hd.get("warc-record-id"),
                    hd.get("warc-type"),
                    hd.get("warc-target-uri"),
                    hd.get("warc-date"),
                    hd.get("content-type"),
                    int(hd.get("content-length", "0")),
                    payload,
                    path,
                    i,
                )


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self):
        return WARC_SCHEMA

    def reader(self, schema):
        return _WarcReader(self.options)


def register_warc_source(spark) -> None:
    """Idempotent registration of the ``warc`` format."""
    spark.dataSource.register(WarcDataSource)


def read_warc(
    spark,
    path: "str | None" = None,
    types: "str | None" = None,
    files: "list[str] | None" = None,
):
    """``spark.read.format("warc").load(path)`` with registration.
    ``types``: comma-separated WARC-Type allowlist (e.g.
    ``"response"``) applied inside the reader, before the Arrow
    boundary — record_index still counts ALL records in the file, so
    (source_file, record_index) stays a stable record identity under
    any filter. ``path`` may be a plain path (POSIX glob listing) or
    a URI (``file://``, ``s3://``, ``hdfs://`` — listed and opened
    through pyarrow.fs). ``files``: explicit file list (e.g. a
    Common Crawl warc.paths manifest) — skips listing entirely, the
    right input at ~64k-files-per-crawl scale."""
    register_warc_source(spark)
    reader = spark.read.format("warc")
    if types:
        reader = reader.option("types", types)
    if files:
        reader = reader.option("files", "\n".join(files))
        return reader.load()
    return reader.load(path)


def write_warc_file(
    rows, path: str, *, compress: "bool | None" = None
) -> int:
    """Write an iterable of (record_id, warc_type, target_uri,
    warc_date, content_type, payload bytes) as ONE plain or gzip WARC
    file; returns the record count. A single-file test/fixture writer
    (ingest is one-way at scale — corpora ship as WARC, pipelines
    write parquet), deliberately not a DataSourceWriter."""
    if compress is None:
        compress = path.endswith(".gz")
    opener = gzip.open if compress else open
    n = 0
    with opener(path, "wb") as f:
        for rid, wtype, uri, date, ctype, payload in rows:
            hdr = (
                b"WARC/1.0\r\n"
                + f"WARC-Record-ID: {rid}\r\n".encode()
                + f"WARC-Type: {wtype}\r\n".encode()
                + (
                    f"WARC-Target-URI: {uri}\r\n".encode()
                    if uri
                    else b""
                )
                + f"WARC-Date: {date}\r\n".encode()
                + f"Content-Type: {ctype}\r\n".encode()
                + f"Content-Length: {len(payload)}\r\n".encode()
                + b"\r\n"
            )
            f.write(hdr + payload + b"\r\n\r\n")
            n += 1
    return n


def http_response_parts(payload):
    """Split a WARC *response* record's payload (an HTTP/1.x message)
    into ``struct<status:int, headers:string, body:string>`` — the
    WET-extraction step (WARC → text) as pure JVM expressions, no
    UDF: decode UTF-8 (lossy), cut at the first blank line, parse
    the status from the first line. Records without an HTTP preamble
    (e.g. ``warcinfo``) yield status NULL and the whole payload as
    body, so the expression is total over mixed record types.

    The decode is ``payload.cast("string")`` — Spark's binary→string
    cast is NON-VALIDATING (invalid UTF-8 bytes become U+FFFD), which
    is the property "total over mixed record types" actually needs:
    real Common Crawl response payloads routinely carry latin-1 pages
    and binary assets, and ``F.decode(p, "UTF-8")`` raises
    MALFORMED_CHARACTER_CODING on the first such record in Spark 4,
    aborting the whole WET job (r12 ADVICE, verified by probe)."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    p = payload if isinstance(payload, Column) else F.col(payload)
    txt = p.cast("string")
    has_http = txt.startswith("HTTP/")
    head = F.substring_index(txt, "\r\n\r\n", 1)
    # body = everything after the FIRST blank line (locate+substring
    # keeps bodies that themselves contain blank lines intact, which
    # substring_index(txt, sep, -1) would not)
    body = F.when(
        F.locate("\r\n\r\n", txt) > 0,
        F.substring(
            txt, F.locate("\r\n\r\n", txt) + 4, F.length(txt)
        ),
    ).otherwise(F.lit(""))
    status = F.regexp_extract(
        F.substring_index(head, "\r\n", 1), r"^HTTP/\S+\s+(\d{3})", 1
    ).cast("int")
    return F.struct(
        F.when(has_http, status).alias("status"),
        F.when(has_http, head).alias("headers"),
        F.when(has_http, body).otherwise(txt).alias("body"),
    )
