"""Structured Streaming tests — file source + availableNow trigger +
memory sink (bounded micro-batch run, no long-lived stream)."""

import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from polaroam_spark.streaming import (
    streaming_event_counts,
    streaming_stop_detection,
)

T0 = 1700006400


@pytest.fixture()
def tmpdir():
    import os

    os.makedirs("/root/repo/.scratch", exist_ok=True)
    d = tempfile.mkdtemp(dir="/root/repo/.scratch")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_stream(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    return q


def test_streaming_event_counts(spark, tmpdir):
    src = f"{tmpdir}/events"
    batch = spark.createDataFrame(
        [(i, "click" if i % 2 else "view") for i in range(20)],
        "i long, event_type string",
    ).withColumn("ts", F.timestamp_seconds(F.lit(T0) + F.col("i") * 60))
    batch.write.parquet(src)

    stream = spark.readStream.schema(batch.schema).parquet(src)
    counts = streaming_event_counts(
        stream, window_duration="10 minutes", watermark_delay="5 minutes"
    )
    _run_stream(counts, "evt_counts")
    out = spark.sql("select * from evt_counts").collect()
    # append mode emits only watermark-closed windows; the final
    # window stays open, so totals cover the closed prefix
    assert len(out) > 0
    assert all(r.n > 0 for r in out)
    assert {r.event_type for r in out} <= {"click", "view"}


@pytest.mark.slow
def test_streaming_stop_detection_closes_stops(spark, tmpdir):
    src = f"{tmpdir}/pings"
    rows = []
    # stay 1: 5 pings at (10,10); move; stay 2 open-ended
    for i in range(5):
        rows.append(("A", 10.0, 10.0, T0 + i * 120))
    rows.append(("A", 10.5, 10.5, T0 + 1000))
    for i in range(5):
        rows.append(("A", 11.0, 11.0, T0 + 2000 + i * 120))
    batch = spark.createDataFrame(
        rows, "uid string, latitude double, longitude double, timestamp long"
    ).withColumn("event_ts", F.timestamp_seconds("timestamp"))
    batch.write.parquet(src)

    stream = spark.readStream.schema(batch.schema).parquet(src)
    stops = streaming_stop_detection(
        stream, r1=50, min_size=2, min_staying_time=300, max_time_between=3600
    )
    _run_stream(stops, "stops_stream")
    out = spark.sql("select * from stops_stream order by start_timestamp").collect()
    # stay 1 closed by the move; stay 2 still open in state (one batch,
    # no timeout fired) -> exactly one emitted stop
    assert len(out) == 1
    r = out[0]
    assert r.uid == "A"
    assert r.n_pings == 5
    assert r.latitude == 10.0 and r.longitude == 10.0
    assert r.start_timestamp == T0 and r.end_timestamp == T0 + 480


def test_streaming_dedup(spark, tmpdir):
    from polaroam_spark.streaming import streaming_dedup

    src = f"{tmpdir}/dups"
    batch = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (2, "b"), (3, "c")],
        "event_id long, payload string",
    ).withColumn("ts", F.timestamp_seconds(F.lit(T0)))
    batch.write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    deduped = streaming_dedup(stream, key_cols=("event_id",))
    _run_stream(deduped, "dedup_stream")
    out = spark.sql("select event_id from dedup_stream").collect()
    assert sorted(r.event_id for r in out) == [1, 2, 3]


def test_streaming_incremental_dedup(spark, tmpdir):
    from polaroam_spark.operators.dedup import build_minhash_index
    from polaroam_spark.streaming import streaming_dedup_incremental

    base = ("the quick brown fox jumps over the lazy dog while the cat "
            "watches from the warm windowsill in the late afternoon sun")
    corpus = spark.createDataFrame(
        [(0, base)], "doc_id long, text string"
    )
    index = build_minhash_index(corpus, num_hashes=16)

    batch = spark.createDataFrame(
        [
            (10, base.replace("afternoon", "evening")),  # dup of corpus
            (11, "novel commentary on vectorized runtimes and columnar "
                 "layouts for analytical query engines at scale"),
            (12, "novel commentary on vectorized runtimes and columnar "
                 "layouts for analytical query engines at night"),  # dup of 11
        ],
        "doc_id long, text string",
    )
    src = f"{tmpdir}/inc_src"
    out = f"{tmpdir}/inc_out"
    ck = f"{tmpdir}/inc_ck"
    batch.write.parquet(src)

    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = streaming_dedup_incremental(
        stream, index, checkpoint_dir=ck, output_path=out,
        num_hashes=16, bands=8, jaccard_threshold=0.5,
    )
    assert q.awaitTermination(120)
    survivors = sorted(
        r.doc_id for r in spark.read.parquet(out).collect()
    )
    assert survivors == [11]


def test_streaming_heavy_hitters(spark, tmpdir):
    from polaroam_spark.streaming import streaming_heavy_hitters

    # two micro-batches (two files): hot item 'x' across both
    rows1 = [("x",)] * 30 + [(f"c{i}",) for i in range(40)]
    rows2 = [("x",)] * 20 + [("y",)] * 25 + [(f"d{i}",) for i in range(40)]
    src = f"{tmpdir}/hh_src"
    spark.createDataFrame(rows1, "item string").coalesce(1).write.parquet(src)
    spark.createDataFrame(rows2, "item string").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema("item string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = f"{tmpdir}/hh_out"
    q = streaming_heavy_hitters(
        stream, checkpoint_dir=f"{tmpdir}/hh_ck", output_path=out,
        capacity=8,
    )
    assert q.awaitTermination(120)

    snap = {r.item: r.est_count for r in spark.read.parquet(out).collect()}
    n = len(rows1) + len(rows2)
    bound = n / 9  # capacity 8
    exact = {}
    for r in rows1 + rows2:
        exact[r[0]] = exact.get(r[0], 0) + 1
    for item, cnt in exact.items():
        est = snap.get(item, 0)
        assert est <= cnt, (item, est, cnt)
        assert cnt - est <= bound, (item, est, cnt)
        if cnt > bound:
            assert item in snap, (item, cnt, bound)
    # the cross-batch hot item survives with a near-exact estimate
    assert snap["x"] >= 50 - bound


def test_stream_stream_interval_join_batch_semantics(spark):
    """Batch replay of the interval join (withWatermark is a no-op on
    batch frames): right rows match iff within [l_ts, l_ts + delay]."""
    from pyspark.sql import functions as F

    from polaroam_spark.streaming import stream_stream_interval_join

    left = spark.createDataFrame(
        [(1, 100, 1000), (2, 200, 5000)], "uid long, lid long, sec long"
    ).withColumn("ts", F.timestamp_seconds("sec")).drop("sec")
    right = spark.createDataFrame(
        [
            (1, 900, 999),    # before the signup: no match
            (1, 901, 1000),   # boundary: inclusive
            (1, 902, 4600),   # exactly +3600: inclusive
            (1, 903, 4601),   # past the window
            (3, 904, 1000),   # key with no left row
        ],
        "uid long, rid long, sec long",
    ).withColumn("ts", F.timestamp_seconds("sec")).drop("sec")
    out = stream_stream_interval_join(
        left, right, on="uid", max_delay="1 hour"
    )
    pairs = sorted((r.l_lid, r.r_rid) for r in out.collect())
    assert pairs == [(100, 901), (100, 902)]
    # both ts columns survive, disambiguated
    assert {"uid", "l_lid", "l_ts", "r_rid", "r_ts"} == set(out.columns)


def test_stream_stream_interval_join_streaming(spark, tmpdir):
    """End-to-end streaming run over file sources + availableNow."""
    from pyspark.sql import functions as F

    from polaroam_spark.streaming import stream_stream_interval_join

    left = spark.createDataFrame(
        [(1, 10, 1000), (2, 20, 2000)], "uid long, lid long, sec long"
    ).withColumn("ts", F.timestamp_seconds("sec")).drop("sec")
    right = spark.createDataFrame(
        [(1, 11, 1500), (2, 21, 9000)], "uid long, rid long, sec long"
    ).withColumn("ts", F.timestamp_seconds("sec")).drop("sec")
    lp, rp = f"{tmpdir}/ssj_l", f"{tmpdir}/ssj_r"
    left.coalesce(1).write.parquet(lp)
    right.coalesce(1).write.parquet(rp)
    ls = spark.readStream.schema(left.schema).parquet(lp)
    rs = spark.readStream.schema(right.schema).parquet(rp)
    out = stream_stream_interval_join(
        ls, rs, on="uid", max_delay="1 hour", watermark_delay="30 days"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ssj_test_sink")
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir}/ssj_ck")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    rows = spark.table("ssj_test_sink").collect()
    assert sorted((r.l_lid, r.r_rid) for r in rows) == [(10, 11)]


def test_streaming_session_counts_emits_closed_sessions(spark, tmpdir):
    from pyspark.sql import functions as F

    from polaroam_spark.streaming import streaming_session_counts

    # uid 1: two events 10 min apart (one session), then 2h of
    # nothing; uid 2: one event near the end -> its session end is
    # within the watermark delay of max ts, stays open
    rows = [(1, 1000), (1, 1600), (2, 90000)]
    df = spark.createDataFrame(rows, "uid long, sec long").withColumn(
        "ts", F.timestamp_seconds("sec")
    ).drop("sec")
    src = f"{tmpdir}/sess_src"
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    sess = streaming_session_counts(
        stream,
        gap_duration="30 minutes",
        watermark_delay="10 minutes",
        ts_col="ts",
        group_col="uid",
    )
    q = (
        sess.writeStream.format("memory")
        .queryName("sess_test_sink")
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir}/sess_ck")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    rows = spark.table("sess_test_sink").collect()
    # watermark = 90000 - 600; uid 1's session ends 1600+1800=3400 <
    # watermark -> emitted with both events merged; uid 2's ends
    # 90000+1800 > watermark -> held in state
    assert [(r.uid, r.n) for r in rows] == [(1, 2)]


@pytest.mark.slow
def test_stream_stream_left_outer_join(spark, tmpdir):
    """Left-outer emits NULL-padded unmatched rows once the watermark
    passes their window: two micro-batches (maxFilesPerTrigger=1),
    batch 2's far-future event advances the watermark past batch 1's
    windows and flushes its unmatched left rows."""
    from pyspark.sql import functions as F

    from polaroam_spark.streaming import stream_stream_interval_join

    lp, rp = f"{tmpdir}/lo_l", f"{tmpdir}/lo_r"
    mk = lambda rows, schema: spark.createDataFrame(  # noqa: E731
        rows, schema
    ).withColumn("ts", F.timestamp_seconds("sec")).drop("sec")
    # batch 1: uid 1 matches, uid 2 does not
    mk([(1, 10, 1000), (2, 20, 1000)], "uid long, lid long, sec long") \
        .coalesce(1).write.parquet(lp)
    mk([(1, 11, 1500)], "uid long, rid long, sec long") \
        .coalesce(1).write.parquet(rp)
    # batch 2: far-future rows push the watermark way past batch 1
    mk([(9, 90, 10_000_000)], "uid long, lid long, sec long") \
        .coalesce(1).write.mode("append").parquet(lp)
    mk([(9, 91, 10_000_000)], "uid long, rid long, sec long") \
        .coalesce(1).write.mode("append").parquet(rp)

    ls = (spark.readStream.schema("uid long, lid long, ts timestamp")
          .option("maxFilesPerTrigger", 1).parquet(lp))
    rs = (spark.readStream.schema("uid long, rid long, ts timestamp")
          .option("maxFilesPerTrigger", 1).parquet(rp))
    out = stream_stream_interval_join(
        ls, rs, on="uid", max_delay="1 hour",
        watermark_delay="10 minutes", how="left_outer",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("lo_join_sink")
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir}/lo_ck")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    rows = {(r.uid, r.l_lid): r.r_rid
            for r in spark.table("lo_join_sink").collect()}
    assert rows[(1, 10)] == 11        # matched pair
    assert (2, 20) in rows and rows[(2, 20)] is None  # flushed unmatched
    # batch 2's own rows: match emitted; nothing prematurely nulled
    assert rows.get((9, 90)) == 91

    import pytest

    with pytest.raises(ValueError):
        stream_stream_interval_join(ls, rs, on="uid", how="full")


@pytest.mark.slow
def test_streaming_ewma_state_across_batches(spark, tmpdir):
    """Two micro-batches (maxFilesPerTrigger=1): the recursion must
    continue from batch-1 state, and a late row at/behind the key's
    last processed epoch is dropped, not mis-ordered."""
    from polaroam_spark.streaming import streaming_ewma

    src = f"{tmpdir}/ewma_src"
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "uid string, timestamp long, value double"
    ).withColumn("event_ts", F.timestamp_seconds("timestamp"))
    mk([("a", T0, 10.0), ("a", T0 + 60, 20.0)]) \
        .coalesce(1).write.parquet(src)
    # batch 2: one new row, one late row behind last_ts (dropped),
    # one duplicate epoch of the new row (collapsed to min)
    mk([
        ("a", T0 + 120, 0.0),
        ("a", T0 + 120, 99.0),
        ("a", T0 + 30, 777.0),
    ]).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(
        "uid string, timestamp long, value double, event_ts timestamp"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    out = streaming_ewma(
        stream, alpha=0.5, key_col="uid",
        watermark_delay="30 days",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_sink")
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir}/ewma_ck")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    rows = {r.ts: r for r in spark.table("ewma_sink").collect()}
    assert set(rows) == {T0, T0 + 60, T0 + 120}
    assert rows[T0].ewma == 10.0
    assert rows[T0 + 60].ewma == 0.5 * 20.0 + 0.5 * 10.0
    # batch 2 continued from y=15.0; duplicate epoch collapsed to 0.0
    assert rows[T0 + 120].value == 0.0
    assert rows[T0 + 120].ewma == 0.5 * 0.0 + 0.5 * 15.0
    assert all(r.key == "a" for r in rows.values())


@pytest.mark.slow
def test_streaming_ewma_nan_and_null_rows_dropped(spark, tmpdir):
    """The poison-pill guards: a NaN value must not fold into state,
    and a NULL epoch must not kill the micro-batch (the int64 cast
    would raise on every retry) — both rows drop, the query survives,
    and the surviving rows' recursion is unaffected."""
    from polaroam_spark.streaming import streaming_ewma

    src = f"{tmpdir}/ewma_nan_src"
    df = spark.createDataFrame(
        [
            ("a", T0, 10.0),
            ("a", T0 + 60, float("nan")),   # NaN value: dropped
            ("a", None, 123.0),             # NULL epoch: dropped
            ("a", T0 + 120, 30.0),
        ],
        "uid string, timestamp long, value double",
    ).withColumn("event_ts", F.timestamp_seconds(F.coalesce("timestamp", F.lit(T0))))
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "uid string, timestamp long, value double, event_ts timestamp"
    ).parquet(src)
    out = streaming_ewma(
        stream, alpha=0.5, key_col="uid", watermark_delay="30 days"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_nan_sink")
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir}/ewma_nan_ck")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)  # query survived the poison rows
    rows = {r.ts: r for r in spark.table("ewma_nan_sink").collect()}
    assert set(rows) == {T0, T0 + 120}
    assert rows[T0].ewma == 10.0
    # recursion continued from 10.0, NOT through the NaN
    assert rows[T0 + 120].ewma == 0.5 * 30.0 + 0.5 * 10.0


@pytest.mark.slow
def test_streaming_gumbel_topk_equals_batch(spark, tmpdir):
    """The running snapshot after all micro-batches must equal the
    BATCH gumbel_topk_sample over the union — batch-boundary
    independence is the whole contract (scores are pure content
    hashes). Also: restart reloads the snapshot exactly."""
    from polaroam_spark.operators.sampling import gumbel_topk_sample
    from polaroam_spark.streaming import streaming_gumbel_topk

    rows = [(i, float(i % 23) / 3.0) for i in range(300)]
    src = f"{tmpdir}/gk_src"
    df = spark.createDataFrame(rows, "doc_id long, lw double")
    # three micro-batches (three files)
    for lo, hi in ((0, 100), (100, 200), (200, 300)):
        df.filter(
            (df.doc_id >= lo) & (df.doc_id < hi)
        ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, lw double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = f"{tmpdir}/gk_out"
    q = streaming_gumbel_topk(
        stream,
        checkpoint_dir=f"{tmpdir}/gk_ck",
        output_path=out,
        log_weight_col="lw",
        key="doc_id",
        k=40,
        seed=13,
    )
    assert q.awaitTermination(120)
    snap = spark.read.parquet(out)
    assert snap.select(F.max("_batch_id")).first()[0] == 2  # 3 batches
    got = sorted(r.doc_id for r in snap.collect())
    want = sorted(
        r.doc_id
        for r in gumbel_topk_sample(
            df, "lw", key="doc_id", k=40, seed=13
        ).collect()
    )
    assert got == want and len(got) == 40

    # restart with MORE data: state reloads from the snapshot
    df2 = spark.createDataFrame(
        [(i, 50.0) for i in range(1000, 1010)], "doc_id long, lw double"
    )  # heavy rows: must enter the top-k
    df2.coalesce(1).write.mode("append").parquet(src)
    stream2 = (
        spark.readStream.schema("doc_id long, lw double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q2 = streaming_gumbel_topk(
        stream2,
        checkpoint_dir=f"{tmpdir}/gk_ck",  # same checkpoint: resume
        output_path=out,
        log_weight_col="lw",
        key="doc_id",
        k=40,
        seed=13,
    )
    assert q2.awaitTermination(120)
    got2 = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    full = df.unionByName(df2)
    want2 = sorted(
        r.doc_id
        for r in gumbel_topk_sample(
            full, "lw", key="doc_id", k=40, seed=13
        ).collect()
    )
    assert got2 == want2
    assert set(range(1000, 1010)) <= set(got2)


@pytest.mark.slow
def test_streaming_gumbel_topk_recovers_from_lost_consumer_view(
    spark, tmpdir
):
    """r12 code-review regression: the consumer view is rewritten
    with a non-atomic parquet overwrite, so a crash mid-write can
    destroy it — restart must rebuild state from the immutable
    journal entry instead of silently restarting from zero; a state
    that EXISTS but is unreadable everywhere must raise."""
    import shutil

    from polaroam_spark.streaming import streaming_gumbel_topk

    src = f"{tmpdir}/gkr_src"
    spark.createDataFrame(
        [(i, float(i % 7)) for i in range(100)], "doc_id long, lw double"
    ).coalesce(1).write.parquet(src)
    out = f"{tmpdir}/gkr_out"
    q = streaming_gumbel_topk(
        spark.readStream.schema("doc_id long, lw double").parquet(src),
        checkpoint_dir=f"{tmpdir}/gkr_ck",
        output_path=out,
        log_weight_col="lw",
        key="doc_id",
        k=15,
        seed=3,
    )
    assert q.awaitTermination(120)
    want = sorted(r.doc_id for r in spark.read.parquet(out).collect())

    # simulate the crash: consumer view destroyed, journal intact
    shutil.rmtree(out)
    spark.createDataFrame(
        [(1000, 99.0)], "doc_id long, lw double"
    ).coalesce(1).write.mode("append").parquet(src)
    q2 = streaming_gumbel_topk(
        spark.readStream.schema("doc_id long, lw double").parquet(src),
        checkpoint_dir=f"{tmpdir}/gkr_ck",
        output_path=out,
        log_weight_col="lw",
        key="doc_id",
        k=15,
        seed=3,
    )
    assert q2.awaitTermination(120)
    got = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    # recovered state + the new heavy row == batch answer over all
    from polaroam_spark.operators.sampling import gumbel_topk_sample

    full = spark.read.parquet(src)
    want2 = sorted(
        r.doc_id
        for r in gumbel_topk_sample(
            full, "lw", key="doc_id", k=15, seed=3
        ).collect()
    )
    assert got == want2 and 1000 in got
    # the recovered prefix survives: everything except the one row
    # the heavy newcomer evicted
    assert len(set(want) - set(got)) == 1

    # unreadable-everywhere state must raise, not restart from zero
    shutil.rmtree(out)
    jd = f"{out}_journal"
    import os

    for e in os.listdir(jd):
        sub = os.path.join(jd, e)
        for f in os.listdir(sub):
            open(os.path.join(sub, f), "wb").write(b"garbage")
    import pytest

    with pytest.raises(Exception, match="refusing"):
        streaming_gumbel_topk(
            spark.readStream.schema(
                "doc_id long, lw double"
            ).parquet(src),
            checkpoint_dir=f"{tmpdir}/gkr_ck2",
            output_path=out,
            log_weight_col="lw",
            key="doc_id",
            k=15,
            seed=3,
        )


@pytest.mark.slow
def test_streaming_gumbel_topk_file_uri_paths_and_recovery(
    spark, tmpdir
):
    """r12 verdict weak-mark: journal listing/pruning must work on
    non-POSIX path schemes. Run the whole query with file:// URIs
    for output/journal (the os.listdir version saw zero entries on
    any scheme-prefixed path), then destroy the consumer view and
    verify recovery still finds the journal through the Hadoop FS."""
    import shutil

    from polaroam_spark.streaming import streaming_gumbel_topk

    src = f"{tmpdir}/gku_src"
    spark.createDataFrame(
        [(i, float(i % 11)) for i in range(200)],
        "doc_id long, lw double",
    ).coalesce(1).write.parquet(src)
    out = f"file://{tmpdir}/gku_out"
    q = streaming_gumbel_topk(
        spark.readStream.schema("doc_id long, lw double").parquet(src),
        checkpoint_dir=f"file://{tmpdir}/gku_ck",
        output_path=out,
        log_weight_col="lw",
        key="doc_id",
        k=20,
        seed=7,
    )
    assert q.awaitTermination(120)
    want = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert len(want) == 20

    # crash: consumer view lost; journal (file:// URI) must recover
    shutil.rmtree(f"{tmpdir}/gku_out")
    spark.createDataFrame(
        [(5000, 99.0)], "doc_id long, lw double"
    ).coalesce(1).write.mode("append").parquet(src)
    q2 = streaming_gumbel_topk(
        spark.readStream.schema("doc_id long, lw double").parquet(src),
        checkpoint_dir=f"file://{tmpdir}/gku_ck",
        output_path=out,
        log_weight_col="lw",
        key="doc_id",
        k=20,
        seed=7,
    )
    assert q2.awaitTermination(120)
    got = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert 5000 in got and len(got) == 20
    # everything except the displaced tail row carried over
    assert len(set(got) & set(want)) == 19


@pytest.mark.slow
def test_streaming_gumbel_topk_redelivered_key_max_merges(
    spark, tmpdir
):
    """r12 verdict #3: a key re-delivered with a DIFFERENT weight
    (contract violation) must MAX-merge — the higher-scored row wins
    regardless of delivery order, so the snapshot stays independent
    of batch boundaries (setdefault kept whichever arrived first)."""
    from polaroam_spark.streaming import streaming_gumbel_topk

    src = f"{tmpdir}/gkm_src"
    # batch 0: key 7 with a LOW weight; batch 1: key 7 HIGH weight
    spark.createDataFrame(
        [(i, 0.0) for i in range(10)], "doc_id long, lw double"
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(7, 50.0)], "doc_id long, lw double"
    ).coalesce(1).write.mode("append").parquet(src)
    q = streaming_gumbel_topk(
        spark.readStream.schema("doc_id long, lw double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        checkpoint_dir=f"{tmpdir}/gkm_ck",
        output_path=f"{tmpdir}/gkm_out",
        log_weight_col="lw",
        key="doc_id",
        k=5,
        seed=1,
    )
    assert q.awaitTermination(120)
    snap = {
        r.doc_id: r.lw
        for r in spark.read.parquet(f"{tmpdir}/gkm_out").collect()
    }
    assert snap[7] == 50.0  # the later, higher-weight row won
