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


def main() -> None:
    from polaroam_spark import get_spark

    # BASELINE.md protocol: numbers are only comparable at load1 < ~4.
    # Record the machine load BEFORE the run and stamp the artifact so
    # a high-load measurement (round 5's load1-6.6 BENCH file) can't
    # masquerade as a clean one.
    try:
        load1_start = round(os.getloadavg()[0], 1)
    except OSError:
        load1_start = -1.0
    load_threshold = float(
        os.environ.get("SPARK_GRAFT_LOAD_THRESHOLD", "4.0")
    )
    invalid_load = load1_start > load_threshold

    spark = get_spark(app_name="polaroam-bench")
    spark.sparkContext.setLogLevel("ERROR")

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
    }

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
    for _ in range(runs):
        em._MATERIALIZED_MEDIANS.clear()
        spark.catalog.clearCache()
        for name, fn in queries.items():
            t0 = time.time()
            fn()
            samples[name].append(time.time() - t0)
    timings = {
        name: round(sorted(s)[len(s) // 2], 3)
        for name, s in samples.items()
    }
    # spread = max-min across passes: distinguishes a real regression
    # from external-load noise when comparing rounds
    spread = {
        name: round(max(s) - min(s), 3) for name, s in samples.items()
    }

    total = round(sum(timings.values()), 3)
    try:
        load1 = round(os.getloadavg()[0], 1)
    except OSError:
        load1 = -1.0
    # Contention can RISE mid-run (round 9's driver artifact started at
    # load1 3.5 and ended at 4.4, carrying 3-4 s of noise while flagged
    # valid) — so the artifact is invalid when EITHER endpoint exceeds
    # the threshold, not just the start.
    invalid_load = invalid_load or load1 > load_threshold
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "sf": _sf_from_dir(SF_DIR),
                "warmup_sec": round(warmup, 3),
                "runs_per_query": runs,
                "load1": load1,
                "load1_start": load1_start,
                "invalid_load": invalid_load,
                "load_threshold": load_threshold,
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
            }
        )
    )


if __name__ == "__main__":
    main()
