def test_package_imports():
    import polaroam_spark
    import polaroam_spark.operators as ops

    for name in ops.__all__:
        assert hasattr(ops, name), name
    assert polaroam_spark.StopDetect is not None
    assert polaroam_spark.HWEstimate is not None


def test_entry_module_contract():
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as em

    qs = em.queries()
    sqls = em.oracle_sql()
    assert len(qs) >= 80
    assert set(sqls) <= set(qs)
    # every oracle-less query is a documented UDF/LSH path
    rows_only = set(qs) - set(sqls)
    assert all(
        k.startswith(
            ("a15", "c3", "c5", "k4", "m3", "m4", "d2", "d3", "d5", "n2", "n3", "mm")
        )
        for k in rows_only
    ), rows_only


def test_unpersist_caches_releases_operator_persists(spark):
    """r11 ADVICE regression: operators whose persisted intermediates
    must outlive the call (dedup c_toks, DSIR count tables) register
    them with the session cache registry; one public call releases
    everything after the caller's terminal action. Early release is
    safe (recompute, not wrongness) — checked by re-collecting."""
    import polaroam_spark
    from polaroam_spark.operators.textstats import (
        dsir_importance_weights,
    )

    from polaroam_spark import cache as cache_registry

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc {i}") for i in range(50)],
        "doc_id long, text string",
    )
    tgt = docs.filter("doc_id < 5")
    polaroam_spark.unpersist_caches()  # start from an empty registry
    out = dsir_importance_weights(docs, tgt, num_buckets=64)
    rows = out.count()
    assert rows == 50
    tracked = list(cache_registry._TRACKED)
    assert len(tracked) >= 2  # raw + tgt count tables registered
    assert all(
        df.storageLevel.useMemory or df.storageLevel.useDisk
        for df in tracked
    )
    released = polaroam_spark.unpersist_caches(blocking=True)
    assert released >= 2
    assert not cache_registry._TRACKED
    assert all(
        not (df.storageLevel.useMemory or df.storageLevel.useDisk)
        for df in tracked
    )
    assert out.count() == 50  # early release recomputes, never wrong
