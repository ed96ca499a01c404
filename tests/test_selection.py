"""exact_global_topk: the distributed exact top-k that replaced the
single-task global Window in gumbel_topk_sample (r11 ADVICE)."""

import random
import warnings

import pytest

from polaroam_spark.operators.selection import exact_global_topk


def _frame(spark, rows):
    return spark.createDataFrame(rows, "k long, s double, payload string")


def _truth(rows, k):
    return {
        r[0]
        for r in sorted(rows, key=lambda r: (-r[1], r[0]))[:k]
    }


def test_exact_global_topk_all_paths_match_naive(spark):
    """Every path — TakeOrderedAndProject (k <= driver_cap), band
    refinement (tiny caps force multiple verified-threshold rounds),
    and the single-partition band exit — must return exactly the
    top-k set by (score DESC, key ASC), including duplicate scores
    resolved by the key tiebreak."""
    rnd = random.Random(5)
    rows = [
        (i, rnd.choice([0.0, 1.0, 2.5]) + rnd.random(), f"p{i}")
        for i in range(500)
    ]
    # inject exact duplicate scores to exercise the tiebreak
    rows += [(1000 + i, 1.75, "dup") for i in range(10)]
    df = _frame(spark, rows)
    for k in (0, 1, 7, 100, 499, 510, 600):
        expect = _truth(rows, k)
        got = {
            r.k for r in exact_global_topk(df, k, "s", "k").collect()
        }
        assert got == expect, ("driver path", k)
        got_band = {
            r.k
            for r in exact_global_topk(
                df,
                k,
                "s",
                "k",
                driver_cap=5,
                single_part_cap=20,
                sample_target=64,
            ).collect()
        }
        assert got_band == expect, ("band path", k)


def test_exact_global_topk_constant_scores_degrade_with_warning(spark):
    """No threshold separates a constant-score frame: the band path
    must fall back to a single-partition rank (exact result) and say
    so with a UserWarning instead of looping or returning wrong
    rows."""
    rows = [(i, 1.0, "x") for i in range(300)]
    df = _frame(spark, rows)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = {
            r.k
            for r in exact_global_topk(
                df,
                40,
                "s",
                "k",
                driver_cap=5,
                single_part_cap=20,
                sample_target=64,
            ).collect()
        }
    assert got == set(range(40))  # key-ascending tiebreak
    assert any("single-partition" in str(x.message) for x in w)


def test_exact_global_topk_determinism_across_runs(spark):
    """The band path's thresholds are pure functions of the data and
    seed — two runs must select identical sets."""
    rnd = random.Random(11)
    rows = [(i, rnd.gauss(0, 3), "x") for i in range(800)]
    df = _frame(spark, rows)
    kw = dict(driver_cap=10, single_part_cap=30, sample_target=100)
    a = {r.k for r in exact_global_topk(df, 200, "s", "k", **kw).collect()}
    b = {r.k for r in exact_global_topk(df, 200, "s", "k", **kw).collect()}
    assert a == b == _truth(rows, 200)


def test_gumbel_topk_band_path_matches_default(spark):
    """gumbel_topk_sample must select the same survivor set whether
    the top-k resolves through TakeOrderedAndProject or through band
    refinement (caps lowered to force it)."""
    from polaroam_spark.operators.sampling import gumbel_topk_sample

    df = spark.createDataFrame(
        [(i, float(i % 17) / 4.0) for i in range(400)],
        "doc_id long, lw double",
    )
    base = {
        r.doc_id
        for r in gumbel_topk_sample(
            df, "lw", key="doc_id", fraction=0.3
        ).collect()
    }
    forced = {
        r.doc_id
        for r in gumbel_topk_sample(
            df,
            "lw",
            key="doc_id",
            fraction=0.3,
            driver_cap=8,
            single_part_cap=25,
        ).collect()
    }
    assert base == forced
    assert len(base) == 120  # ceil(0.3 * 400)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
@pytest.mark.slow
def test_exact_global_topk_property(spark, seed):
    """Property harness over random frames, duplicate-heavy score
    distributions, and random k/caps: the selected key set must
    always equal the collect-sort ground truth. Caps are drawn small
    so the verified-threshold refinement, the single-partition band
    exit, and the degenerate fallback all get exercised. (The spark
    fixture is session-scoped, which Hypothesis permits.)"""
    import random
    import warnings as _w

    rnd = random.Random(seed)
    n = rnd.randint(1, 400)
    dup_pool = [rnd.uniform(-5, 5) for _ in range(rnd.randint(1, 8))]
    rows = [
        (
            i,
            rnd.choice(dup_pool)
            if rnd.random() < 0.4
            else rnd.uniform(-5, 5),
            "x",
        )
        for i in range(n)
    ]
    df = _frame(spark, rows)
    k = rnd.randint(0, n + 3)
    expect = _truth(rows, k)
    with _w.catch_warnings():
        _w.simplefilter("ignore")  # degenerate fallback warns; fine
        got = {
            r.k
            for r in exact_global_topk(
                df,
                k,
                "s",
                "k",
                driver_cap=rnd.choice([0, 1, 3, 10]),
                single_part_cap=rnd.choice([1, 5, 25]),
                sample_target=rnd.choice([4, 16, 64]),
            ).collect()
        }
    assert got == expect, (seed, n, k, len(got), len(expect))


# ---- weighted interleave order ---------------------------------------


def test_interleave_order_proportional_prefixes(spark):
    import pyspark.sql.functions as F

    from polaroam_spark.operators.sampling import interleave_order

    rows = [(f"w{i}", "web") for i in range(70)] + [
        (f"c{i}", "code") for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id string, grp string")
    out = interleave_order(
        df, "grp", {"web": 0.7, "code": 0.3}, key="doc_id"
    ).collect()
    assert len(out) == 100
    # every prefix stays near the weight split (stride scheduling
    # guarantee: deviation bounded by ~1 per group)
    seen_web = 0
    for i, r in enumerate(out, start=1):
        seen_web += r.grp == "web"
        assert abs(seen_web - 0.7 * i) <= 2.0, (i, seen_web)
    # deterministic under repartitioning
    again = interleave_order(
        df.repartition(7), "grp", {"web": 0.7, "code": 0.3},
        key="doc_id",
    ).collect()
    assert [r.doc_id for r in again] == [r.doc_id for r in out]


def test_interleave_order_validation(spark):
    import pytest as _pt

    from polaroam_spark.operators.sampling import interleave_order

    df = spark.createDataFrame(
        [("a", "x"), ("b", "y")], "doc_id string, grp string"
    )
    with _pt.raises(ValueError, match="non-positive"):
        interleave_order(df, "grp", {"x": 0.0, "y": 1.0})
    with _pt.raises(ValueError, match="starve"):
        interleave_order(df, "grp", {"x": 1.0})


def test_interleave_order_sharded_matches_sorted(spark):
    from polaroam_spark.operators.sampling import interleave_order

    rows = [(f"d{i}", "a" if i % 3 else "b") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id string, grp string")
    flat = [
        r.doc_id
        for r in interleave_order(
            df, "grp", {"a": 2.0, "b": 1.0}
        ).collect()
    ]
    sharded = interleave_order(
        df, "grp", {"a": 2.0, "b": 1.0}, num_shards=4
    )
    # shards are range-partitioned on the key: concatenating
    # in-shard order by ascending shard reproduces the total order
    import pyspark.sql.functions as F

    got = [
        r.doc_id
        for r in sharded.withColumn(
            "_p", F.spark_partition_id()
        ).orderBy("_p", "interleave_key").collect()
    ]
    assert got == flat
