"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (scan -> plan -> execute) with a noop
sink so every output column is computed but nothing is written.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(d: str) -> float:
    try:
        return float(d.rstrip("/").rsplit("sf", 1)[1])
    except Exception:
        return -1.0


def clean_pass_indices(
    pass_loads: "list[list[float]]", threshold: float
) -> "list[int]":
    """Indices of timed suite passes whose 1-min load stayed at or
    under ``threshold`` at BOTH endpoints (stamped immediately before
    and after the pass). r14 lesson: one all-or-nothing flag let a
    transient mid-suite spike invalidate the whole artifact even
    though two of the three passes ran clean — gate per pass and keep
    the clean ones. An unavailable load reading (stamped -1) never
    disqualifies a pass; it just can't be checked."""
    return [
        i
        for i, (lb, la) in enumerate(pass_loads)
        if lb <= threshold and la <= threshold
    ]


def own_cpu_ticks() -> int:
    """utime+stime clock ticks of THIS process and every live
    descendant (the Spark JVM and its Python workers), via one /proc
    scan. The load gate needs BACKGROUND load, but /proc/loadavg
    counts our own executor threads too — a 3-pass suite on an idle
    32-CPU box drives the raw 1-min load to 5-7 all by itself, which
    flagged every r15 artifact invalid until the self-load was
    subtracted (the r14 single-endpoint gate only ever sampled after
    the final pass, where the EWMA had partly decayed — per-pass
    stamps land mid-burn). Returns -1 when /proc is unavailable."""
    try:
        me = os.getpid()
        procs: "dict[int, tuple[int, int]]" = {}
        for d in os.listdir("/proc"):
            if not d.isdigit():
                continue
            try:
                with open(f"/proc/{d}/stat", "rb") as f:
                    raw = f.read().decode("ascii", "replace")
            except OSError:
                continue  # raced exit
            rp = raw.rsplit(")", 1)[1].split()
            procs[int(d)] = (int(rp[1]), int(rp[11]) + int(rp[12]))
        kids: "dict[int, list[int]]" = {}
        for pid, (ppid, _t) in procs.items():
            kids.setdefault(ppid, []).append(pid)
        total, stack = 0, [me]
        while stack:
            p = stack.pop()
            if p in procs:
                total += procs[p][1]
                stack.extend(kids.get(p, []))
        return total
    except OSError:
        return -1


def own_runnable_tasks() -> int:
    """Count of THIS process tree's tasks currently in R
    (runnable) or D (uninterruptible IO) state — the exact thing
    /proc/loadavg counts. CPU-tick accounting (own_cpu_ticks)
    systematically UNDERCOUNTS the tree's loadavg footprint: an
    idle-box suite run drives the raw 1-min load to ~9 while ticks
    average only ~4.5 cores (D-state parquet/shuffle IO and
    runnable-but-unscheduled churn burn no ticks), so the
    subtraction flagged every pass of a genuinely idle box.
    Sampling our own R+D task count at a fixed cadence and folding
    it with loadavg's own decay (fold_own_ewma) makes the estimate
    apples-to-apples with the raw sample. Excludes the sampling
    thread itself (R while it scans). Returns -1 when /proc is
    unavailable."""
    try:
        me = os.getpid()
        ppids: "dict[int, int]" = {}
        for d in os.listdir("/proc"):
            if not d.isdigit():
                continue
            try:
                with open(f"/proc/{d}/stat", "rb") as f:
                    raw = f.read().decode("ascii", "replace")
            except OSError:
                continue
            ppids[int(d)] = int(raw.rsplit(")", 1)[1].split()[1])
        kids: "dict[int, list[int]]" = {}
        for pid, pp in ppids.items():
            kids.setdefault(pp, []).append(pid)
        n, stack = 0, [me]
        while stack:
            p = stack.pop()
            if p not in ppids:
                continue
            stack.extend(kids.get(p, []))
            try:
                tids = os.listdir(f"/proc/{p}/task")
            except OSError:
                continue
            for t in tids:
                try:
                    with open(
                        f"/proc/{p}/task/{t}/stat", "rb"
                    ) as f:
                        raw = f.read().decode("ascii", "replace")
                except OSError:
                    continue
                if raw.rsplit(")", 1)[1].split()[0] in ("R", "D"):
                    n += 1
        return max(0, n - 1)
    except OSError:
        return -1


def fold_own_ewma(
    prev: float, cores: float, window_sec: float
) -> float:
    """Our process tree's contribution to the kernel's 1-min load
    EWMA, folded forward one stamp window: ``prev·e^(−w/60) +
    cores·(1 − e^(−w/60))`` — exactly the decay loadavg applies.
    This is the ADVICE r15 fix made continuous: subtracting the raw
    window-average cores right after a heavy pass OVERSHOOTS (a
    ~35 s pass at 20 own-cores only moved the EWMA by ~44% of 20, so
    the unclamped gate let ~11 cores of genuine background grade as
    clean), while a one-shot fraction clamp UNDERSHOOTS on every
    pass after the first (the previous passes' own burn is still in
    the EWMA and would read as background). The fold models both:
    contributions rise by the absorbed fraction and linger with the
    same decay the raw sample has. A degenerate window keeps the
    previous estimate."""
    import math

    if window_sec <= 0:
        return prev
    a = math.exp(-float(window_sec) / 60.0)
    return prev * a + max(cores, 0.0) * (1.0 - a)


def estimate_background(raw_load: float, own_cores: float) -> float:
    """Background 1-min load estimate: the raw sample minus OUR
    process tree's (EWMA-folded — see :func:`fold_own_ewma`)
    contribution to it (an unavailable raw reading, stamped -1,
    passes through unchanged). Approximate by construction — tick
    accounting misses runnable-but-unscheduled and D-state threads —
    but the raw number alone systematically flags the bench's own
    work, which is strictly worse (every artifact invalid on an
    idle box)."""
    if raw_load < 0:
        return raw_load
    return max(0.0, round(raw_load - max(own_cores, 0.0), 1))


def pressure_some10() -> float:
    """The kernel's /proc/pressure/cpu "some avg10" percentage — the
    fraction of the last 10 s in which at least one runnable task
    stalled waiting for a CPU. Unlike the 1-minute loadavg this
    reacts in seconds and sees external stall windows the load gate
    misses (r19: two driver runs landed in minute-scale stalls with
    per-query spreads up to 6.6 s while pass_bg_loads read 0.0).
    Only meaningful as a BACKGROUND gate before the Spark session
    exists — the suite's own 32 executor threads create pressure
    once it runs — so the pre-run wait loop uses it and the per-pass
    stamps record it for diagnosis only. Returns -1 when psi is
    unavailable."""
    try:
        with open("/proc/pressure/cpu") as f:
            line = f.readline()
        return float(line.split("avg10=")[1].split()[0])
    except (OSError, IndexError, ValueError):
        return -1.0


def noisy_queries(
    samples: "dict[str, list[float]]",
    floor: float = 0.5,
    frac: float = 0.5,
) -> "list[str]":
    """Queries whose kept samples spread wider than
    ``max(floor, frac * median)`` — the r19 verdict's stall
    signature (an external stall inflates ONE pass's sample; the
    load gate cannot see it because the stall is outside this
    process tree and often outside loadavg's 1-min horizon). These
    get extra repair-pass samples so the median is taken over
    enough quiet observations to reject the stalled one. Queries
    with fewer than 2 samples can't be checked."""
    bad = []
    for name, s in samples.items():
        if len(s) < 2:
            continue
        med = sorted(s)[len(s) // 2]
        if max(s) - min(s) > max(floor, frac * med):
            bad.append(name)
    return bad


def gate_passes(
    pass_loads: "list[list[float]]", threshold: float
) -> "tuple[list[int], bool]":
    """(indices of passes to aggregate, invalid_load flag). The
    artifact is VALID when at least min(2, n_passes) passes are
    clean; medians then aggregate the clean passes only. With zero
    clean passes every sample is kept (better a flagged number than
    none) and the artifact is flagged invalid."""
    clean = clean_pass_indices(pass_loads, threshold)
    invalid = len(clean) < min(2, len(pass_loads))
    kept = clean if clean else list(range(len(pass_loads)))
    return kept, invalid


def main() -> None:
    from polaroam_spark import get_spark

    # BASELINE.md protocol: numbers are only comparable at load1 < ~4.
    # Record the machine load BEFORE the run and stamp the artifact so
    # a high-load measurement (round 5's load1-6.6 BENCH file) can't
    # masquerade as a clean one.
    load_threshold = float(
        os.environ.get("SPARK_GRAFT_LOAD_THRESHOLD", "4.0")
    )

    def _load1() -> float:
        try:
            return round(os.getloadavg()[0], 1)
        except OSError:
            return -1.0

    # r12 verdict #4: two consecutive round artifacts carried
    # invalid_load because the driver launched the bench while the
    # box was still busy. Instead of stamping a flagged artifact,
    # WAIT for the load to drain (bounded backoff — the 1-minute avg
    # needs real time to fall), then measure; only if the budget runs
    # out do we proceed and flag.
    load_wait = 0.0
    wait_budget = float(
        os.environ.get("SPARK_GRAFT_LOAD_WAIT_SEC", "300")
    )
    # r19 verdict item: both driver runs landed in external stall
    # windows the load gate missed. Before Spark exists, the box's
    # CPU pressure is pure background — wait for it to drain too.
    pressure_threshold = float(
        os.environ.get("SPARK_GRAFT_PRESSURE_THRESHOLD", "5.0")
    )

    def _busy() -> bool:
        if _load1() > load_threshold:
            return True
        p = pressure_some10()
        return 0 <= pressure_threshold < p

    while _busy() and load_wait < wait_budget:
        time.sleep(20)
        load_wait += 20
    load1_start = _load1()
    pressure_start = pressure_some10()

    spark = get_spark(app_name="polaroam-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # own-burn sampler: every 2 s fold our process tree's R+D task
    # count into an EWMA with loadavg's own decay — runs from the
    # moment the session is up, so warm-pass burn is attributed to
    # US, not to the background (see own_runnable_tasks for why tick
    # accounting was not enough)
    import threading

    _own_lock = threading.Lock()
    _own_state = {"ewma": 0.0, "last": time.time()}
    _stop_sampler = threading.Event()

    def _sample_own() -> None:
        while not _stop_sampler.wait(2.0):
            r = own_runnable_tasks()
            now = time.time()
            with _own_lock:
                dt = now - _own_state["last"]
                _own_state["last"] = now
                if r >= 0:
                    _own_state["ewma"] = fold_own_ewma(
                        _own_state["ewma"], float(r), dt
                    )

    threading.Thread(target=_sample_own, daemon=True).start()

    import __spark_entry__ as em
    from pyspark.sql import functions as F

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    def q_stop_detection():
        # M1+M2: full sessionization -> per-event medians
        run(em._medians_df(spark, SF_DIR))

    def q_dbscan_clustering():
        # M4: per-user DBSCAN of medians + medoid stats joined back
        from polaroam_spark.operators.clustering import (
            attach_medoids,
            cluster_stops_dbscan,
        )

        med = em._medians_df(spark, SF_DIR)
        run(attach_medoids(cluster_stops_dbscan(med, r2=25.0)))

    def q_homework_labeling():
        # M5-M7 over grid-labeled stops
        run(em._work_df(spark, SF_DIR))

    def q_interval_compaction():
        fn = em.queries()["w8_compute_intervals"]
        run(fn(spark, SF_DIR))

    def q_tpch_agg():
        li = em._t(spark, SF_DIR, "lineitem")
        run(
            li.groupBy("l_returnflag", "l_linestatus").agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).alias("sum_revenue"),
                F.avg("l_discount").alias("avg_disc"),
                F.count("*").alias("n"),
            )
        )

    def q_tpch_join():
        o = em._t(spark, SF_DIR, "orders")
        c = em._t(spark, SF_DIR, "customer")
        li = em._t(spark, SF_DIR, "lineitem")
        run(
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).alias("revenue")
            )
        )

    def q_dedup_minhash():
        from polaroam_spark.operators.dedup import minhash_lsh_pairs

        run(
            minhash_lsh_pairs(
                em._t(spark, SF_DIR, "documents"), jaccard_threshold=0.8
            )
        )

    def q_ann_topk():
        from polaroam_spark.operators.similarity import ann_lsh_topk

        emb = em._t(spark, SF_DIR, "embeddings")
        q = emb.filter(F.col("vec_id") < 50).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        # production configuration: arrow bucketer on the data side
        # (bucket parity with native pinned by
        # tests/test_similarity.py::test_arrow_bucketer_matches_native;
        # the oracle-gated n2/n2b paths stay fully native)
        run(
            ann_lsh_topk(
                emb, q, k=10, num_planes=8, num_probes=3,
                bucketer="arrow",
            )
        )

    def q_text_quality():
        from polaroam_spark.operators.textstats import quality_features

        run(
            quality_features(em._t(spark, SF_DIR, "documents")).select(
                "doc_id", "n_tokens", "quality_score"
            )
        )

    # ---- LLM-surface rows (r13, verdict task 6): fixture/model prep
    # is UNTIMED (corpus->WARC files and BPE training are one-time
    # setup; the rows measure the recurring 100 TB-shaped work:
    # ingest+WET split, score+select, fit+project, encode). ----
    scratch = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".scratch"
    )
    os.makedirs(scratch, exist_ok=True)
    warc_dir = os.path.join(scratch, "bench_warc")

    def _prep_warc():
        import shutil

        from polaroam_spark.sources.warc import write_warc_file

        shutil.rmtree(warc_dir, ignore_errors=True)
        os.makedirs(warc_dir)
        rows = (
            em._t(spark, SF_DIR, "documents")
            .select("doc_id", "text")
            .collect()
        )
        for b in range(8):
            write_warc_file(
                (
                    (
                        f"<urn:bench:{r.doc_id}>",
                        "response",
                        f"https://bench.local/doc/{r.doc_id}",
                        "2026-08-15T00:00:00Z",
                        "application/http",
                        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain"
                        b"\r\n\r\n" + r.text.encode("utf-8"),
                    )
                    for r in rows
                    if r.doc_id % 8 == b
                ),
                os.path.join(warc_dir, f"part-{b}.warc.gz"),
            )

    _prep_warc()
    img_dir = os.path.join(scratch, "bench_images")

    def _prep_images():
        # synthetic PNG corpus with planted brightness twins (the mm5
        # gate's generator at bench scale), written ONCE — the timed
        # row measures the recurring work (decode + dHash + chunk-
        # bucket hamming join), not fixture generation
        import shutil

        from pyspark.sql.functions import pandas_udf

        shutil.rmtree(img_dir, ignore_errors=True)

        def _mk(lift):
            def _batch(col):
                return col.map(lambda d: em.synth_png(int(d), lift))

            return pandas_udf(_batch, "binary")

        ids = (
            em._t(spark, SF_DIR, "documents")
            .filter(F.col("doc_id").isNotNull())
            .select("doc_id")
        )
        base = ids.select(
            F.col("doc_id").alias("media_id"),
            _mk(0)(F.col("doc_id")).alias("content"),
        )
        twins = ids.select(
            (F.col("doc_id") + 10_000_000).alias("media_id"),
            _mk(4)(F.col("doc_id")).alias("content"),
        )
        # spread over the worker count: the dHash UDF parallelizes by
        # input file, and an unsplit 2-file write would serialize the
        # decode through 2 tasks (measured 2.8 s vs 0.3 s at sf0.1)
        base.unionByName(twins).repartition(32).write.parquet(img_dir)

    _prep_images()

    def q_quality_score():
        # trained-classifier scoring, the map-side filter a cluster
        # streams the whole corpus through (fixed weights — scoring
        # is the recurring cost; training is a setup job); xxhash
        # bucketing = the scale path, zero shuffle, zero join
        from polaroam_spark.operators.quality import (
            score_quality_classifier,
        )

        B = 4096
        model = {
            "weights": [(i % 97) / 97.0 - 0.5 for i in range(B)],
            "bias": 0.25,
            "num_buckets": B,
            "seed": 17,
        }
        # the sf0.1 documents parquet is ONE split, so this measures
        # the scorer SERIAL (~1.2 s for ~0.5M gram instances — the
        # higher-order transform/aggregate exprs are interpreted, not
        # codegen'd); a repartition doesn't help at this size (AQE
        # coalesces the 5 MB shuffle back to one partition and the
        # extra stage costs more than it saves). At real scale the
        # scan arrives in thousands of splits and the row is pure
        # map-parallel.
        docs = em._t(spark, SF_DIR, "documents")
        run(
            score_quality_classifier(docs, model).select(
                "doc_id", "quality_prob", "quality_label"
            )
        )

    def q_image_neardup():
        # perceptual near-dup over binary media: PNG decode + integer
        # dHash + the shared chunk-bucket hamming machinery (the same
        # candidate/verify path text fingerprints ride)
        from polaroam_spark.operators.multimodal import (
            image_neardup_pairs,
        )

        run(
            image_neardup_pairs(
                spark.read.parquet(img_dir), max_hamming=3
            )
        )

    from polaroam_spark.operators.tokenize import train_bpe
    from polaroam_spark.operators.unigram import train_unigram
    from polaroam_spark.operators.wordpiece import train_wordpiece

    bpe_model = train_bpe(
        em._t(spark, SF_DIR, "documents"), "text", vocab_size=512
    )
    unigram_model = train_unigram(
        em._t(spark, SF_DIR, "documents"), "text", vocab_size=512
    )
    # wordpiece's floor is corpus-dependent (1 + alphabet forms);
    # budget a comparable 512-ish piece inventory above it
    wordpiece_model = train_wordpiece(
        em._t(spark, SF_DIR, "documents"), "text", vocab_size=2048
    )

    def q_warc_wet():
        # WARC ingest + WET split: Python data source (per-file
        # partitions) -> HTTP parse -> body text, all noop-sunk
        from polaroam_spark.sources.warc import (
            http_response_parts,
            read_warc,
        )

        w = read_warc(spark, warc_dir, types="response")
        run(
            w.select(
                "record_id",
                "target_uri",
                http_response_parts("payload").alias("p"),
            ).select("record_id", "target_uri", "p.status", "p.body")
        )

    def q_dsir_gumbel():
        # DSIR importance weights (broadcast B-bucket count tables)
        # -> Gumbel top-k selection, the corpus-selection hot path
        from polaroam_spark.operators.sampling import (
            gumbel_topk_sample,
        )
        from polaroam_spark.operators.textstats import (
            dsir_importance_weights,
        )

        docs = em._t(spark, SF_DIR, "documents")
        target = docs.filter(F.col("doc_id") % 10 == 0)
        scored = dsir_importance_weights(docs, target)
        run(
            gumbel_topk_sample(
                scored, "dsir_logweight", key="doc_id", k=500, seed=17
            )
        )

    def q_pca_whiten():
        # one-pass moment fit + broadcast-matmul projection
        from polaroam_spark.operators.vectors import pca_whiten

        emb = em._t(spark, SF_DIR, "embeddings").select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
        out, _model = pca_whiten(emb, "embedding")
        run(out.select("vec_id", "whitened"))

    def q_bpe_tokenize():
        # exact token ids + counts over the corpus with the
        # pre-trained model (encode is the recurring cost; training
        # is setup, measured once above)
        from polaroam_spark.operators.tokenize import bpe_encode

        docs = em._t(spark, SF_DIR, "documents")
        # ONE encode; the count is array_size of the ids it produced
        # (a second bpe_token_count pass would re-merge every doc and
        # double the row's reported cost — r13 self-review)
        run(
            bpe_encode(docs, bpe_model, "text")
            .withColumn(
                "n_tokens",
                F.array_size("token_ids").cast("long"),
            )
            .select("doc_id", "token_ids", "n_tokens")
        )

    def q_unigram_tokenize():
        # the second tokenizer family over the same corpus: Viterbi
        # segmentation with the pre-trained unigram-LM model
        # (encode is the recurring cost; training is setup above)
        from polaroam_spark.operators.unigram import unigram_encode

        docs = em._t(spark, SF_DIR, "documents")
        run(
            unigram_encode(docs, unigram_model, "text")
            .withColumn(
                "n_tokens",
                F.array_size("token_ids").cast("long"),
            )
            .select("doc_id", "token_ids", "n_tokens")
        )

    def q_wordpiece_tokenize():
        # the third tokenizer family over the same corpus: greedy
        # longest-match-first with the pre-trained WordPiece model
        # (encode is the recurring cost; training is setup above)
        from polaroam_spark.operators.wordpiece import (
            wordpiece_encode,
        )

        docs = em._t(spark, SF_DIR, "documents")
        run(
            wordpiece_encode(docs, wordpiece_model, "text")
            .withColumn(
                "n_tokens",
                F.array_size("token_ids").cast("long"),
            )
            .select("doc_id", "token_ids", "n_tokens")
        )

    def q_sft_prep():
        # chat corpus -> loss-masked padded windows: per-message
        # segment encode (identity model — the byte path every
        # trained model shares) + pure-JVM window arithmetic
        from polaroam_spark.operators.sft import (
            chunk_sft_sequences,
            encode_chat_sft,
        )
        from polaroam_spark.operators.tokenize import _BYTE_TO_UNI

        ident = {
            "vocab": {u: b for b, u in _BYTE_TO_UNI.items()},
            "merges": [],
        }
        docs = em._t(spark, SF_DIR, "documents")
        # the documents parquet is ONE split at sf0.1, so without a
        # repartition the Arrow encode runs serial and this row was
        # the suite's noisiest (r15: spread 1.64 vs 3.0 typical —
        # scheduling noise on a single task, not work). At real scale
        # the input arrives in many splits and the row is
        # embarrassingly map-parallel (55.6M window-tokens/s probe);
        # the repartition makes the bench measure THAT shape.
        convs = (
            docs.filter(F.col("text").isNotNull())
            .repartition(spark.sparkContext.defaultParallelism)
            .select(
                "doc_id",
                F.array(
                    F.struct(
                        F.lit("user").alias("role"),
                        F.col("text").alias("content"),
                    ),
                    F.struct(
                        F.lit("assistant").alias("role"),
                        F.col("text").alias("content"),
                    ),
                ).alias("messages"),
            )
        )
        run(
            chunk_sft_sequences(
                encode_chat_sft(convs, ident),
                seq_len=512,
                drop_no_loss=False,
            )
        )

    def q_langid_score():
        # K-class language-ID scoring (r17 verdict task: the argmax-
        # over-K array expressions have different plan-build and
        # per-row cost than the binary quality scorer): fixed
        # deterministic weights — scoring is the recurring corpus
        # pass, training is a setup job; same serial-split caveat as
        # quality_score, pure map work at real scale
        from polaroam_spark.operators.langid import score_langid

        B, K = 1024, 5
        model = {
            "classes": ["en", "de", "es", "fr", "zh"],
            "weights": [
                [((i * (k + 3)) % 89) / 89.0 - 0.5 for i in range(B)]
                for k in range(K)
            ],
            "biases": [0.1 * k for k in range(K)],
            "num_buckets": B,
            "seed": 17,
            "feature": "word",
        }
        # the sf0.1 documents parquet is ONE split; the K-class
        # literal aggregates cost ~1 ms/doc interpreted, so serial
        # execution (5.3 s measured) would swamp the row with a
        # shape real scale never has — repartition so the row
        # measures the map-parallel cost (the r15 sft_prep fix;
        # unlike quality_score's 1.2 s, 5+ s amortizes the extra
        # 5 MB round-robin shuffle many times over)
        docs = em._t(spark, SF_DIR, "documents").repartition(
            spark.sparkContext.defaultParallelism
        )
        run(
            score_langid(docs, model).select(
                "doc_id", "language_pred", "language_prob"
            )
        )

    def q_text_signals():
        # r18 quality signals: token-distribution entropy + zlib
        # compression ratio — two Arrow-batched map-only UDFs over
        # the documents table (the repetition signals the JVM
        # feature pass can't express); measures Python-worker/Arrow
        # throughput on the text surface
        from polaroam_spark.operators.textstats import (
            compression_ratio,
            token_entropy,
        )

        docs = em._t(spark, SF_DIR, "documents").repartition(
            spark.sparkContext.defaultParallelism
        )
        run(
            compression_ratio(token_entropy(docs)).select(
                "doc_id", "token_entropy", "compression_ratio"
            )
        )

    def q_memorization_scan():
        # r19: verbatim-memorization scan — probes are 12-token
        # spans lifted from the doc_id%10 slice (guaranteed hits)
        # scanned against the FULL corpus gram stream: measures the
        # inverted n-gram index shape (probe grams broadcast, corpus
        # grams join map-side, only matches shuffle)
        from polaroam_spark.functions.text import tokens
        from polaroam_spark.operators.dedup import memorization_scan

        docs = (
            em._t(spark, SF_DIR, "documents")
            .filter(
                F.col("doc_id").isNotNull()
                & F.col("text").isNotNull()
            )
            .select("doc_id", "text")
        )
        tk = docs.filter(F.col("doc_id") % 10 == 0).select(
            "doc_id", tokens("text").alias("_toks")
        )
        probes = tk.filter(F.size("_toks") >= 16).select(
            "doc_id",
            F.concat_ws(" ", F.slice("_toks", 4, 12)).alias("text"),
        )
        run(
            memorization_scan(docs, probes, n=8).select(
                "doc_id",
                "n_memorized_grams",
                "n_corpus_docs",
                "memorized",
            )
        )

    def q_kn_5gram():
        # Kneser-Ney 5-gram reference-LM scoring — the order CCNet
        # actually deploys (r16: replaces the trigram row, which was
        # the order=3 case of the same generic recursion): model
        # counted on the doc_id%10==0 slice, every document scored —
        # one corpus-scaled 5-gram count table plus the per-level
        # continuation tables joined back onto the map-side stream
        from polaroam_spark.operators.textstats import (
            kn_ngram_logprob_vs_reference,
        )

        docs = em._t(spark, SF_DIR, "documents")
        ref = docs.filter(F.col("doc_id") % 10 == 0)
        run(
            kn_ngram_logprob_vs_reference(docs, ref, order=5).select(
                "doc_id", "mean_kn_logprob"
            )
        )

    queries = {
        "stop_detection": q_stop_detection,
        "dbscan_clustering": q_dbscan_clustering,
        "homework_labeling": q_homework_labeling,
        "interval_compaction": q_interval_compaction,
        "tpch_agg": q_tpch_agg,
        "tpch_join": q_tpch_join,
        "dedup_minhash": q_dedup_minhash,
        "ann_topk": q_ann_topk,
        "text_quality": q_text_quality,
        "warc_wet": q_warc_wet,
        "dsir_gumbel": q_dsir_gumbel,
        "pca_whiten": q_pca_whiten,
        "bpe_tokenize": q_bpe_tokenize,
        "image_neardup": q_image_neardup,
        "quality_score": q_quality_score,
        "langid_score": q_langid_score,
        "unigram_tokenize": q_unigram_tokenize,
        "wordpiece_tokenize": q_wordpiece_tokenize,
        "text_signals": q_text_signals,
        "memorization_scan": q_memorization_scan,
        "kn_5gram": q_kn_5gram,
        "sft_prep": q_sft_prep,
    }
    core9 = [
        "stop_detection", "dbscan_clustering", "homework_labeling",
        "interval_compaction", "tpch_agg", "tpch_join",
        "dedup_minhash", "ann_topk", "text_quality",
    ]

    # one warm-up pass on a cheap query to absorb JVM/codegen startup
    t0 = time.time()
    em._t(spark, SF_DIR, "region").count()
    warmup = time.time() - t0

    # median-of-N SUITE PASSES: BASELINE.md documents a 23-51 s suite
    # spread under external load; a single sample is too noisy to
    # compare rounds against. The whole suite repeats as a unit so the
    # intra-pass staging reuse (stop medians are disk-materialized
    # once and consumed by three queries — the reference driver's own
    # pattern) is preserved, while the memo + Spark caches are cleared
    # BETWEEN passes so every pass pays the full cold cost.
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    samples: dict[str, list[float]] = {n: [] for n in queries}
    # One UNTIMED full-suite pass first (r12 verdict task: pin the
    # dedup_minhash variance). Measured bimodality was pure cold
    # start — first-pass dedup 8.6 s vs steady 2.3-2.8 s, first-pass
    # warc 7.2 s vs steady 0.7-0.85 s (JVM JIT + codegen compile +
    # Python/Arrow worker-pool spin-up). Those are START-UP costs
    # that amortize to zero at real scale; the regression signal the
    # rounds compare is the steady state, so the cold pass runs
    # before the clock.
    warm_runs = max(
        0, int(os.environ.get("SPARK_GRAFT_BENCH_WARM_RUNS", "1"))
    )
    for _ in range(warm_runs):
        em._MATERIALIZED_MEDIANS.clear()
        spark.catalog.clearCache()
        try:
            from polaroam_spark import unpersist_caches

            unpersist_caches()
        except Exception:
            pass
        for fn in queries.values():
            fn()
    # r14 verdict task 4: stamp the load BEFORE and AFTER each timed
    # pass; a pass is clean when both endpoints are at or under the
    # threshold, medians aggregate the clean passes, and the artifact
    # is valid when >= min(2, runs) passes are clean — a transient
    # external spike costs one pass, not the round's artifact. The
    # gate runs on BACKGROUND estimates (raw 1-min load minus the
    # cores our own process tree burned over the stamp window — see
    # own_cpu_ticks: the suite's own executors push the raw load to
    # 5-7 on an idle box and would flag every artifact).
    pass_loads: "list[list[float]]" = []
    pass_bg_loads: "list[list[float]]" = []
    pass_own_cores: "list[float]" = []
    pass_pressure: "list[list[float]]" = []
    samples_by_pass: "list[dict[str, float]]" = []
    def _stamp() -> "tuple[float, float]":
        raw = _load1()
        with _own_lock:
            own = _own_state["ewma"]
        return raw, estimate_background(raw, own)

    def _clear_run_state() -> None:
        em._MATERIALIZED_MEDIANS.clear()
        spark.catalog.clearCache()
        try:
            from polaroam_spark import unpersist_caches

            unpersist_caches()  # dsir/dedup registered caches
        except Exception:
            pass

    def _run_pass(
        names: "list[str]",
    ) -> "tuple[dict[str, float], list[float], list[float], list[float]]":
        """One cold suite pass over ``names`` (cleared memo + Spark
        cache + operator caches first), stamped with raw/background
        load and CPU pressure at both endpoints."""
        _clear_run_state()
        raw_b, bg_b = _stamp()
        pr_b = pressure_some10()
        out: "dict[str, float]" = {}
        for name in names:
            t0 = time.time()
            queries[name]()
            out[name] = time.time() - t0
        raw_a, bg_a = _stamp()
        pr_a = pressure_some10()
        return out, [raw_b, raw_a], [bg_b, bg_a], [pr_b, pr_a]

    for _ in range(runs):
        pass_samples, raws, bgs, prs = _run_pass(list(queries))
        pass_loads.append(raws)
        pass_bg_loads.append(bgs)
        pass_pressure.append(prs)
        pass_own_cores.append(
            round(
                max(raws[1], 0.0) - bgs[1]
                if raws[1] >= 0
                else 0.0,
                1,
            )
        )
        samples_by_pass.append(pass_samples)
    kept, invalid_load = gate_passes(pass_bg_loads, load_threshold)
    for i in kept:
        for name, sec in samples_by_pass[i].items():
            samples[name].append(sec)
    # spread over the MAIN kept passes, before any repair sampling —
    # kept verbatim so rounds stay comparable with pre-r20 artifacts
    spread_main = {
        name: round(max(s) - min(s), 3) if s else -1.0
        for name, s in samples.items()
    }

    # Repair passes (r19 verdict "what's wrong" #1): external stall
    # windows — invisible to the load gate because they sit outside
    # this process tree — inflate ONE pass's sample for the queries
    # that happened to be running, which shows up as a per-query
    # spread far above its median (r19 driver artifact: ann_topk
    # spread 6.6 s vs median 2.0). Queries whose spread exceeds
    # max(0.5 s, 50% of median) get re-sampled in up to
    # $SPARK_GRAFT_BENCH_REPAIR_PASSES extra cold passes so the
    # median aggregates enough quiet observations to reject the
    # stalled one. Repair passes face the same background-load gate;
    # a dirty repair pass is discarded and recorded. Methodology is
    # unchanged — same noop sink, same cold-state clearing, median
    # over clean samples — repair only ADDS samples.
    repair_budget = max(
        0,
        int(os.environ.get("SPARK_GRAFT_BENCH_REPAIR_PASSES", "2")),
    )
    repair_records: "list[dict]" = []
    repaired: "set[str]" = set()
    for _ in range(repair_budget):
        bad = noisy_queries(samples)
        if not bad:
            break
        names = [n for n in queries if n in bad]
        out, raws, bgs, prs = _run_pass(names)
        ok = bool(clean_pass_indices([bgs], load_threshold))
        repair_records.append(
            {
                "queries": names,
                "samples": {n: round(v, 3) for n, v in out.items()},
                "loads": raws,
                "bg_loads": bgs,
                "pressure": prs,
                "kept": ok,
            }
        )
        if ok:
            for n, sec in out.items():
                samples[n].append(sec)
            repaired.update(names)
    still_noisy = noisy_queries(samples)
    timings = {
        name: round(sorted(s)[len(s) // 2], 3)
        for name, s in samples.items()
    }
    # spread = max-min across kept samples: distinguishes a real
    # regression from external-load noise when comparing rounds
    spread = {
        name: round(max(s) - min(s), 3) for name, s in samples.items()
    }

    total = round(sum(timings.values()), 3)
    load1 = pass_loads[-1][1] if pass_loads else _load1()
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                # the r2-r12 comparison basis: the original 9-query
                # headline subtotal (the full value now also carries
                # the 4 LLM-surface rows added in r13 — see
                # BASELINE.md "Measured (round 13)")
                "core9_subtotal_sec": round(
                    sum(timings[n] for n in core9), 3
                ),
                "load_wait_sec": round(load_wait, 1),
                "sf": _sf_from_dir(SF_DIR),
                "warmup_sec": round(warmup, 3),
                "runs_per_query": runs,
                # cold (0) vs steady-state (>=1) runs measure different
                # things; stamp it so rounds compare like with like
                "warm_runs": warm_runs,
                "load1": load1,
                "load1_start": load1_start,
                # per-pass [before, after] 1-min loads (raw + the
                # background estimate the gate ACTUALLY checks, raw
                # minus own-process-tree cores) + which passes the
                # medians aggregated (clean ones, or all if none)
                "pass_loads": pass_loads,
                "pass_bg_loads": pass_bg_loads,
                "pass_own_cores": pass_own_cores,
                "passes_kept": kept,
                # r20 stall-window hardening (additions-only): CPU
                # pressure stamps, the pre-repair spread, every raw
                # sample the medians aggregated, and the repair-pass
                # records (including discarded ones)
                "pressure_start": pressure_start,
                "pass_pressure": pass_pressure,
                "spread_main_passes": spread_main,
                "samples": {
                    n: [round(v, 3) for v in s]
                    for n, s in samples.items()
                },
                "repair_passes": repair_records,
                "repaired_queries": sorted(repaired),
                "discarded_repair_passes": sum(
                    1 for r in repair_records if not r["kept"]
                ),
                "still_noisy": sorted(still_noisy),
                "clean_pass_count": len(
                    clean_pass_indices(pass_bg_loads, load_threshold)
                ),
                "invalid_load": invalid_load,
                "load_threshold": load_threshold,
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
            }
        )
    )


if __name__ == "__main__":
    main()
