"""Mini oracle harness: a representative subset of the driver's
correctness gate (full set lives in __spark_entry__ and is exercised
by the round driver; this keeps a fast regression signal in pytest).
"""

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"

SUBSET = [
    "w4_detect_stops",
    "m2_stop_medians",
    "c4_cluster_medoids",
    "m6_detect_home",
    "w8_compute_intervals",
    "d1_dedup_exact",
    # round-3 upgrades: formerly rows-only paths now hash-checked
    "c3_dbscan_per_user",
    "c5_convex_hull",
    "d3_simhash_pairs",
    "k4_duplicate_components",
    "n1_cosine_topk",
    "t1_token_count",
    "f14_iso_weekday",
    "j5_cross_broadcast_scalar",
    "skw1_salted_agg",
    "t9_detect_language",
    "v1_vector_normalize",
    "v2_quantize_roundtrip",
    # round-5 additions
    "t13_gopher_flags",
    "smp5_cap_per_key",
    "a16_rollup",
    "r7_set_ops",
    "j9_anti_join",
    "j10_nullsafe_join",
    "q1_tpch_pricing",
    "q3_tpch_shipping",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    import __spark_entry__ as em

    fn = em.queries()[name]
    sql = em.oracle_sql()[name]
    sdf = fn(spark, SF_DIR).toPandas()
    odf = duck.execute(sql).fetchdf()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    pd.testing.assert_frame_equal(
        _norm(sdf), _norm(odf), check_dtype=False, check_exact=False,
        rtol=0, atol=1e-9,
    )
