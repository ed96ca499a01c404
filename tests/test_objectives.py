"""Denoising-objective prep: T5 span corruption + prefix-LM split —
reconstruction losslessness, density/span-count contracts,
determinism, edge clamps."""
import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def toks(spark):
    import random

    rnd = random.Random(9)
    rows = [
        (i, [rnd.randint(0, 999) for _ in range(rnd.randint(0, 60))])
        for i in range(80)
    ] + [(900, None)]
    return spark.createDataFrame(rows, "doc_id long, token_ids array<int>")


def test_span_corruption_reconstructs_exactly(toks):
    from polaroam_spark.operators.objectives import (
        reconstruct_span_corruption,
        span_corruption,
    )

    out = span_corruption(toks, sentinel_start=100_000, seed=5)
    for r in out.collect():
        if r.token_ids is None or len(r.token_ids) < 2:
            assert r.inputs is None and r.targets is None
            continue
        back = reconstruct_span_corruption(
            list(r.inputs), list(r.targets), 100_000
        )
        assert back == list(r.token_ids), r.doc_id
        # density contract: noise tokens == round(n * r) clamped
        n = len(r.token_ids)
        n_noise = sum(
            1 for t in r.targets if t < 100_000 - 60
        ) + sum(1 for t in r.targets if 0 <= t <= 999)
        real_noise = [t for t in r.targets if t <= 999]
        assert len(real_noise) == min(max(round(n * 0.15), 1), n - 1)
        # inputs carry one sentinel per span, descending
        sents = [t for t in r.inputs if t > 99_000]
        assert sents == sorted(sents, reverse=True)
        assert sents[0] == 100_000


def test_span_corruption_deterministic_and_seeded(toks):
    from polaroam_spark.operators.objectives import span_corruption

    a = {
        r.doc_id: (r.inputs, r.targets)
        for r in span_corruption(toks, seed=5).collect()
    }
    b = {
        r.doc_id: (r.inputs, r.targets)
        for r in span_corruption(toks, seed=5).collect()
    }
    c = {
        r.doc_id: (r.inputs, r.targets)
        for r in span_corruption(toks, seed=6).collect()
    }
    assert a == b
    assert a != c


def test_span_corruption_extreme_density_clamps(spark):
    from polaroam_spark.operators.objectives import (
        reconstruct_span_corruption,
        span_corruption,
    )

    df = spark.createDataFrame(
        [(1, list(range(10))), (2, [7, 8]), (3, [5])],
        "doc_id long, token_ids array<int>",
    )
    out = span_corruption(
        df, noise_density=0.9, mean_span_length=1.0,
        sentinel_start=100_000,
    )
    got = {r.doc_id: r for r in out.collect()}
    assert got[3].inputs is None  # < 2 tokens: nothing to corrupt
    for did in (1, 2):
        r = got[did]
        assert reconstruct_span_corruption(
            list(r.inputs), list(r.targets), 100_000
        ) == list(r.token_ids)
    with pytest.raises(ValueError, match="noise_density"):
        span_corruption(df, noise_density=1.0)
    with pytest.raises(ValueError, match="mean_span_length"):
        span_corruption(df, mean_span_length=0.5)


def test_prefix_lm_split(toks):
    from polaroam_spark.operators.objectives import prefix_lm_split

    out = prefix_lm_split(toks, min_prefix=2, seed=11)
    for r in out.collect():
        if r.token_ids is None or len(r.token_ids) < 3:
            assert r.inputs is None and r.targets is None
            continue
        assert list(r.inputs) + list(r.targets) == list(r.token_ids)
        assert len(r.inputs) >= 2 and len(r.targets) >= 1
    again = {
        r.doc_id: (r.inputs, r.targets)
        for r in prefix_lm_split(toks, min_prefix=2, seed=11).collect()
    }
    first = {
        r.doc_id: (r.inputs, r.targets)
        for r in out.collect()
    }
    assert again == first
    with pytest.raises(ValueError, match="min_prefix"):
        prefix_lm_split(toks, min_prefix=0)


def test_span_corruption_property_reconstruction():
    """Hypothesis sweep of the pure kernel: any ids/density/span-mean
    /seed combination reconstructs exactly and respects the noise
    budget — no Spark needed, the UDF calls this same function."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from polaroam_spark.operators.objectives import (
        _corrupt_one,
        reconstruct_span_corruption,
    )

    @settings(max_examples=150, deadline=None)
    @given(
        ids=st.lists(
            st.integers(min_value=0, max_value=9_999),
            min_size=2,
            max_size=120,
        ),
        r=st.floats(min_value=0.05, max_value=0.95),
        mu=st.floats(min_value=1.0, max_value=10.0),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def check(ids, r, mu, seed):
        inputs, targets = _corrupt_one(
            ids, "k", seed, r, mu, 100_000
        )
        assert reconstruct_span_corruption(
            inputs, targets, 100_000
        ) == ids
        n = len(ids)
        n_noise = sum(1 for t in targets if t < 99_000)
        assert n_noise == min(max(round(n * r), 1), n - 1)
        # sentinels in inputs descend contiguously from the start id
        sents = [t for t in inputs if t >= 99_000]
        assert sents == list(
            range(100_000, 100_000 - len(sents), -1)
        )

    check()


def test_span_corruption_sentinel_band_collision_raises(spark):
    """A document whose ids reach into the sentinel band must raise
    LOUDLY at corruption time (a real token there would be misparsed
    as a sentinel on reconstruction); ids strictly below the band —
    and ids ABOVE sentinel_start, which no sentinel can equal —
    corrupt fine."""
    import pytest as _pytest

    from polaroam_spark.operators.objectives import (
        _corrupt_one,
        span_corruption,
    )

    # driver-side kernel: id == sentinel_start - 1 collides for any
    # num_spans >= 1
    with _pytest.raises(ValueError, match="sentinel band"):
        _corrupt_one(
            [1, 2, 99_999, 4, 5, 6], "k", 13, 0.15, 3.0, 100_000
        )
    # just below the band for this doc's span count is fine
    inputs, targets = _corrupt_one(
        [1, 2, 3, 4, 5, 6], "k", 13, 0.15, 3.0, 100_000
    )
    assert inputs is not None
    # above sentinel_start is unambiguous, not an error
    inputs, _ = _corrupt_one(
        [1, 2, 100_777, 4, 5, 6], "k", 13, 0.15, 3.0, 100_000
    )
    assert 100_777 in inputs
    # the Spark path surfaces the same error
    df = spark.createDataFrame(
        [(1, [1, 2, 99_999, 4, 5, 6])],
        "doc_id long, token_ids array<int>",
    )
    with _pytest.raises(Exception, match="sentinel band"):
        span_corruption(df, sentinel_start=100_000).collect()


def test_fim_transform_layouts_and_losslessness(spark):
    """FIM: PSM/SPM sentinel layouts exactly as published; dropping
    sentinels reconstructs the original ids; transformed length is
    n + 3; rate=0 passes everything through as 'none'; draws replay
    (pure function of seed + doc id); sentinel collisions and bad
    rates are loud."""
    import pytest

    from pyspark.sql import functions as F

    from polaroam_spark.operators.objectives import (
        fim_transform,
        reconstruct_fim,
    )

    rows = [
        (i, list(range(1, 1 + 5 + (i % 7) * 3))) for i in range(40)
    ] + [(100, []), (101, None), (102, [9])]
    df = spark.createDataFrame(
        rows, "doc_id long, token_ids array<int>"
    )
    out = fim_transform(df, fim_rate=1.0, seed=7).collect()
    modes = set()
    for r in out:
        if r.token_ids is None or len(r.token_ids) == 0:
            assert r.fim_ids is None and r.fim_mode is None
            continue
        modes.add(r.fim_mode)
        assert r.fim_mode in ("psm", "spm")
        assert len(r.fim_ids) == len(r.token_ids) + 3
        back = reconstruct_fim(list(r.fim_ids), r.fim_mode)
        assert back == list(r.token_ids), (r.doc_id, back)
        if r.fim_mode == "psm":
            assert r.fim_ids[0] == 100_000
            assert 100_001 in r.fim_ids and 100_002 in r.fim_ids
            assert r.fim_ids.index(100_001) < r.fim_ids.index(100_002)
        else:
            assert list(r.fim_ids[:2]) == [100_000, 100_001]
    assert modes == {"psm", "spm"}  # both layouts drawn at 40 docs

    # rate 0: everything untouched
    none = fim_transform(df, fim_rate=0.0, seed=7).collect()
    for r in none:
        if r.token_ids is not None and len(r.token_ids) > 0:
            assert r.fim_mode == "none"
            assert list(r.fim_ids) == list(r.token_ids)

    # replay: identical draws on a different partition layout
    a = {r.doc_id: (list(r.fim_ids) if r.fim_ids is not None
                    else None, r.fim_mode)
         for r in fim_transform(df, fim_rate=0.7, seed=3).collect()}
    b = {r.doc_id: (list(r.fim_ids) if r.fim_ids is not None
                    else None, r.fim_mode)
         for r in fim_transform(
             df.repartition(7), fim_rate=0.7, seed=3).collect()}
    assert a == b
    kept_modes = {m for _, m in a.values() if m}
    assert "none" in kept_modes  # 0.7 rate leaves AR data

    # loud failures
    coll = spark.createDataFrame(
        [(1, [1, 100_001, 2])], "doc_id long, token_ids array<int>"
    )
    with pytest.raises(Exception, match="collide"):
        fim_transform(coll, fim_rate=1.0).collect()
    with pytest.raises(ValueError, match="fim_rate"):
        fim_transform(df, fim_rate=1.5)
    with pytest.raises(ValueError, match="distinct"):
        fim_transform(df, pre_id=5, suf_id=5, mid_id=6)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=9999),
             min_size=1, max_size=80),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_fim_property_lossless_and_sized(ids, seed):
    """Property: for ANY id sequence and seed, the driver-side FIM
    split reconstructs exactly and adds exactly 3 sentinels."""
    from polaroam_spark.operators.objectives import (
        _rng_for,
        reconstruct_fim,
    )

    # replicate the worker's _one() draw path deterministically
    rng = _rng_for(seed, "doc")
    rng.random()  # the keep draw (fim_rate consumed first)
    n = len(ids)
    a, b = rng.randint(0, n), rng.randint(0, n)
    if a > b:
        a, b = b, a
    prefix, middle, suffix = ids[:a], ids[a:b], ids[b:]
    if rng.random() < 0.5:
        fim = [100_000, 100_001] + suffix + [100_002] + prefix + middle
        mode = "spm"
    else:
        fim = [100_000] + prefix + [100_001] + suffix + [100_002] + middle
        mode = "psm"
    assert len(fim) == n + 3
    assert reconstruct_fim(fim, mode) == ids


def _ul2_draw(doc_id, rates, seed=41):
    """Python replay of the mixture's assignment draw."""
    from polaroam_spark.operators.objectives import _rng_for

    u = _rng_for(seed, f"{doc_id}:denoiser").random()
    acc = 0.0
    order = sorted(k for k, v in rates.items() if v > 0)
    for k in order:
        acc += rates[k]
        if u < acc:
            return k
    return order[-1]


def test_ul2_mixture_dispatch_equals_standalone(toks):
    """Per assigned class, the mixture's output is id-identical to
    the standalone operator at the same seed (shared per-document
    kernels + seed streams); the assignment draw replays in python;
    every class appears at the default rates on an 80-doc corpus."""
    from polaroam_spark.operators.objectives import (
        prefix_lm_split,
        span_corruption,
        ul2_mixture,
    )

    rates = {"r": 0.5, "s": 0.25, "x": 0.25}
    out = {r.doc_id: r for r in ul2_mixture(toks, seed=41).collect()}
    want_r = {
        r.doc_id: r
        for r in span_corruption(toks, seed=41).collect()
    }
    want_x = {
        r.doc_id: r
        for r in span_corruption(
            toks, noise_density=0.5, seed=41
        ).collect()
    }
    want_s = {
        r.doc_id: r for r in prefix_lm_split(toks, seed=41).collect()
    }
    seen = set()
    for doc_id, r in out.items():
        cls = _ul2_draw(doc_id, rates)
        assert r.denoiser == cls, (doc_id, r.denoiser, cls)
        seen.add(cls)
        twin = {"r": want_r, "x": want_x, "s": want_s}[cls][doc_id]
        assert r.inputs == twin.inputs, (doc_id, cls)
        assert r.targets == twin.targets, (doc_id, cls)
    assert seen == {"r", "s", "x"}
    # NULL ids keep the assignment, NULL outputs
    assert out[900].inputs is None and out[900].targets is None
    assert out[900].denoiser in ("r", "s", "x")


def test_ul2_mixture_fim_class_and_losslessness(toks):
    """A mixture including the 'fim' class: fim-assigned docs carry
    the fim_transform stream in inputs (targets NULL) with the
    sub-layout recorded; every non-NULL row reconstructs the
    original ids exactly under its class's inverse."""
    from polaroam_spark.operators.objectives import (
        fim_transform,
        reconstruct_fim,
        reconstruct_span_corruption,
        ul2_mixture,
    )

    rates = {"r": 0.25, "s": 0.25, "x": 0.25, "fim": 0.25}
    out = ul2_mixture(toks, rates=rates, seed=7).collect()
    src = {r.doc_id: r.token_ids for r in toks.collect()}
    fim_twin = {
        r.doc_id: r
        for r in fim_transform(toks, fim_rate=1.0, seed=7).collect()
    }
    seen = set()
    for r in out:
        cls = _ul2_draw(r.doc_id, rates, seed=7)
        base = cls if cls != "fim" else "fim"
        seen.add(base)
        ids = src[r.doc_id]
        if cls == "fim":
            assert r.denoiser.startswith("fim"), r.denoiser
            assert r.targets is None
            if ids is None or len(ids) == 0:
                assert r.inputs is None
                continue
            tw = fim_twin[r.doc_id]
            assert list(r.inputs) == list(tw.fim_ids)
            sub = r.denoiser.split(":", 1)[1]
            assert sub == tw.fim_mode
            assert reconstruct_fim(r.inputs, sub) == list(ids)
        else:
            assert r.denoiser == cls
            if r.inputs is None:
                continue
            if cls == "s":
                assert list(r.inputs) + list(r.targets) == list(ids)
            else:
                assert (
                    reconstruct_span_corruption(
                        r.inputs, r.targets, 32_099
                    )
                    == list(ids)
                )
    assert seen == {"r", "s", "x", "fim"}


def test_ul2_mixture_validation_is_loud(toks):
    from polaroam_spark.operators.objectives import ul2_mixture

    with pytest.raises(ValueError, match="sum to 1"):
        ul2_mixture(toks, rates={"r": 0.5, "s": 0.2})
    with pytest.raises(ValueError, match="unknown denoiser"):
        ul2_mixture(toks, rates={"r": 0.5, "z": 0.5})
    with pytest.raises(ValueError, match="unknown per-denoiser"):
        ul2_mixture(toks, params={"r": {"bogus": 1}})
    with pytest.raises(ValueError, match="distinct"):
        ul2_mixture(toks, fim_sentinels=(1, 1, 2))
