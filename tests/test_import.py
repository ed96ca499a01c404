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
