"""r19 optimization round: the single-pass window restructures must
be row- and schema-identical to the aggregate+join shapes they
replaced. Each test re-implements the OLD shape inline (the exact
pre-r19 code) and asserts frame equality on fixtures that include
the edge cases the restructures had to preserve: NULL keys (the old
equi-joins never matched them), NULL dates (countDistinct skips
them), and capped id lists under boilerplate-style fan-out."""

import pandas as pd
import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window


def _assert_same(old, new, key):
    assert old.schema.simpleString() == new.schema.simpleString(), (
        old.schema.simpleString() + "\n!=\n" + new.schema.simpleString()
    )
    po = old.orderBy(*key).toPandas()
    pn = new.orderBy(*key).toPandas()
    pd.testing.assert_frame_equal(po, pn, check_exact=True)


# ---------------------------------------------------------------- medoids


@pytest.fixture(scope="module")
def labeled_members(spark):
    rows = [
        # uid A: cluster 0 (3 members), cluster 1 (2), noise (2)
        ("A", 1, 0, 10.0, 20.0, 100, 200),
        ("A", 2, 0, 10.1, 20.1, 300, 400),
        ("A", 3, 0, 10.2, 20.0, 500, 600),
        ("A", 4, 1, 30.0, 40.0, 700, 800),
        ("A", 5, 1, 30.2, 40.2, 900, 1000),
        ("A", 6, -1, 50.0, 60.0, 1100, 1200),
        ("A", 7, -1, 51.0, 61.0, 1300, 1400),
        # uid B: single cluster
        ("B", 8, 0, 70.0, 80.0, 1500, 1600),
        # NULL keys: the old join left their stats NULL
        (None, 9, 0, 1.0, 2.0, 1700, 1800),
        ("C", 10, None, 3.0, 4.0, 1900, 2000),
    ]
    return spark.createDataFrame(
        rows,
        "uid string, stop_events long, stop_locations long, "
        "latitude double, longitude double, "
        "start_timestamp long, end_timestamp long",
    )


def test_attach_medoids_matches_join_shape(labeled_members):
    from polaroam_spark.operators.clustering import (
        attach_medoids,
        cluster_medoids,
    )

    old = labeled_members.join(
        F.broadcast(cluster_medoids(labeled_members)),
        on=["uid", "stop_locations"],
        how="left",
    )
    new = attach_medoids(labeled_members)
    _assert_same(
        old, new, ["uid", "stop_locations", "stop_events"]
    )


# ------------------------------------------------------------- date_counts


@pytest.fixture(scope="module")
def homework_members(spark):
    rows = [
        # (uid, stop_locations, date) — dates repeat across clusters
        ("A", 0, "2026-01-01"),
        ("A", 0, "2026-01-01"),
        ("A", 0, "2026-01-02"),
        ("A", 1, "2026-01-02"),
        ("A", 1, "2026-01-03"),
        # NULL dates: countDistinct skipped them
        ("A", 2, None),
        ("B", 0, None),
        ("B", 0, "2026-02-01"),
        # all-NULL-date cluster (cluster_dates 0) beside a real one —
        # an all-NULL-date UID would divide by zero in BOTH shapes
        # under ANSI mode, so the uid keeps one real date
        ("C", 5, None),
        ("C", 6, "2026-03-01"),
    ]
    return spark.createDataFrame(
        rows, "uid string, stop_locations long, date_s string"
    ).withColumn("date", F.to_date("date_s")).drop("date_s")


def test_date_counts_matches_two_agg_shape(homework_members):
    from polaroam_spark.operators.homework import date_counts

    df = homework_members.withColumn(
        "time_span", F.lit(30).cast("long")
    )
    uid_counts = df.groupBy("uid").agg(
        F.countDistinct("date").alias("total_dates"),
        F.first("time_span").alias("time_span"),
    )
    cluster_counts = df.groupBy("uid", "stop_locations").agg(
        F.countDistinct("date").alias("cluster_dates")
    )
    old = cluster_counts.join(uid_counts, on="uid").withColumns(
        {
            "date_percentage": F.col("cluster_dates")
            / F.col("total_dates"),
            "all_percentage": F.col("cluster_dates")
            / F.col("time_span"),
        }
    )
    new = date_counts(homework_members, 30)
    _assert_same(old, new, ["uid", "stop_locations"])


def test_date_counts_null_uid_dropped(spark):
    from polaroam_spark.operators.homework import date_counts

    df = spark.createDataFrame(
        [(None, 0, "2026-01-01"), ("A", 0, "2026-01-01")],
        "uid string, stop_locations long, date_s string",
    ).withColumn("date", F.to_date("date_s")).drop("date_s")
    out = date_counts(df, 30)
    # the old inner stats join dropped NULL-uid clusters
    assert out.filter(F.col("uid").isNull()).count() == 0
    assert out.count() == 1


def test_detect_labels_match_filter_clusters_chain(spark):
    """detect_home's direct stats labels == the old
    filter_clusters -> label_locations chain."""
    from polaroam_spark.operators.homework import (
        _passing_labels,
        filter_clusters,
        label_locations,
    )

    rows = []
    for d in range(1, 6):
        rows.append(("A", 0, f"2026-01-0{d}"))  # 5 dates: passes
    rows.append(("A", 1, "2026-01-01"))  # 1 date: fails 0.5
    rows.append(("B", 0, "2026-01-01"))
    rows.append(("B", 0, "2026-01-02"))
    rows.append(("B", 0, "2026-01-03"))  # 3/3 dates: passes
    df = spark.createDataFrame(
        rows, "uid string, stop_locations long, date_s string"
    ).withColumn("date", F.to_date("date_s")).drop("date_s")

    old = label_locations(
        filter_clusters(df, 5, 0.5, 0.1), "home_label"
    )
    new = _passing_labels(df, 5, 0.5, 0.1, "home_label")
    _assert_same(old, new, ["uid", "stop_locations"])


# ---------------------------------------------------------- memorization


def test_memorization_scan_matches_two_agg_shape(spark):
    from polaroam_spark.operators.dedup import memorization_scan

    # corpus with a shared boilerplate span so one probe matches
    # MANY docs (exercises the cap), plus clean docs
    boiler = "all rights reserved contact the licensing office now"
    corpus_rows = [
        (i, f"doc {i} body text {boiler} tail {i}") for i in range(30)
    ] + [(100 + i, f"clean document number {i} with unique words only here") for i in range(5)]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    probes = spark.createDataFrame(
        [
            (0, boiler),                        # matches all 30
            (1, "clean document number 3 with unique words only here"),
            (2, "totally absent phrase that matches nothing at all"),
            (3, "short"),                       # too_short
        ],
        "doc_id long, text string",
    )
    out = memorization_scan(corpus, probes, n=5, max_match_docs=7)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[0]["n_corpus_docs"] == 30
    assert rows[0]["matched_doc_ids"] == list(range(7))  # capped, asc
    assert rows[0]["memorized"]
    # the clean docs share their number-free tail grams, so the
    # probe matches every clean doc; all 5 of its distinct 5-grams
    # occur verbatim in doc 103
    assert rows[1]["n_corpus_docs"] == 5
    assert rows[1]["matched_doc_ids"] == [100, 101, 102, 103, 104]
    assert rows[1]["n_memorized_grams"] == 5
    assert rows[2]["n_memorized_grams"] == 0
    assert rows[2]["matched_doc_ids"] == []
    assert rows[3]["too_short"] and not rows[3]["memorized"]

    # distinct-gram count: the 8-token boilerplate has 8-5+1 = 4
    # distinct 5-grams, every one present in each of the 30 docs
    assert rows[0]["n_memorized_grams"] == 4


def test_memorization_scan_single_corpus_pass(spark):
    """The restructure's point: ONE aggregation subtree over the
    matched triples — the corpus gram scan must appear once in the
    plan, not once per output aggregate."""
    from polaroam_spark.operators.dedup import memorization_scan

    corpus = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta {i}") for i in range(10)],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta 3")],
        "doc_id long, text string",
    )
    plan = (
        memorization_scan(corpus, probes, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the old two-agg shape carried two corpus-side gram explodes
    assert plan.count("Generate explode") <= 2, plan  # probe + corpus
