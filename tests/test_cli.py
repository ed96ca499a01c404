"""CLI staged-pipeline coverage: python -m polaroam_spark
{stops,cluster,label} chained through parquet stage dirs (the
reference's disk-staged batch-driver workflow, __main__.py)."""

import pyspark.sql.functions as F


def test_cli_stops_cluster_label(spark, tmpdir):
    from polaroam_spark.__main__ import main

    base = 1700006400
    rows = []
    for day in range(8):
        jit = day * 1e-5
        d0 = base + day * 86400
        for i in range(6):  # night stay (home)
            rows.append(("u1", 19.40 + jit, -99.10, d0 + i * 3600))
        for i in range(6):  # working-hours stay (work)
            rows.append(
                ("u1", 19.50 + jit, -99.20, d0 + 10 * 3600 + i * 3600)
            )
    pings = spark.createDataFrame(
        rows,
        "uid string, latitude double, longitude double, timestamp long",
    )
    src = str(tmpdir.join("pings"))
    pings.write.parquet(src)

    stops_out = str(tmpdir.join("stops"))
    assert main([
        "stops", "--input", src, "--output", stops_out, "--r1", "50",
    ]) == 0
    medians = spark.read.parquet(f"{stops_out}/stop_medians")
    assert medians.count() >= 16  # ~2 stops/day x 8 days

    cluster_out = str(tmpdir.join("clustered"))
    assert main([
        "cluster", "--input", f"{stops_out}/stop_medians",
        "--output", cluster_out, "--r2", "2000",
    ]) == 0
    clustered = spark.read.parquet(cluster_out)
    n_clusters = (
        clustered.filter(F.col("stop_locations") != -1)
        .select("stop_locations").distinct().count()
    )
    assert n_clusters == 2  # home + work

    label_out = str(tmpdir.join("labeled"))
    assert main([
        "label", "--input", cluster_out, "--output", label_out,
        "--total-days", "8",
    ]) == 0
    wide = spark.read.parquet(f"{label_out}/home_work_wide").collect()
    assert len(wide) == 1
    assert abs(wide[0].h_lat - 19.40) < 0.01
    assert abs(wide[0].w_lat - 19.50) < 0.01
