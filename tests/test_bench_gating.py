"""Per-pass bench load gating (r14 verdict task 4): a transient
external load spike must cost one pass, not the round's artifact.
Pure-function tests — importing bench must not start Spark."""

import bench


def test_all_passes_clean():
    loads = [[1.0, 2.0], [0.5, 3.9], [2.2, 1.1]]
    kept, invalid = bench.gate_passes(loads, 4.0)
    assert kept == [0, 1, 2]
    assert invalid is False


def test_transient_spike_costs_one_pass():
    # the r14 failure: a spike mid-suite; under the old all-or-
    # nothing flag this invalidated the artifact
    loads = [[1.0, 2.0], [9.0, 8.5], [2.1, 3.0]]
    kept, invalid = bench.gate_passes(loads, 4.0)
    assert kept == [0, 2]
    assert invalid is False


def test_spike_endpoint_straddles_pass():
    # dirty when EITHER endpoint exceeds the threshold
    loads = [[1.0, 6.0], [6.0, 1.0], [1.0, 1.0]]
    kept, invalid = bench.gate_passes(loads, 4.0)
    assert kept == [2]
    assert invalid is True  # only 1 clean < min(2, 3)


def test_sustained_load_keeps_all_but_flags():
    # zero clean passes: keep every sample (a flagged number beats
    # none) and flag the artifact
    loads = [[9.0, 9.0], [8.0, 7.0], [6.0, 9.0]]
    kept, invalid = bench.gate_passes(loads, 4.0)
    assert kept == [0, 1, 2]
    assert invalid is True


def test_single_pass_run():
    kept, invalid = bench.gate_passes([[1.0, 1.0]], 4.0)
    assert kept == [0] and invalid is False
    kept, invalid = bench.gate_passes([[9.0, 1.0]], 4.0)
    assert kept == [0] and invalid is True


def test_unknown_load_never_disqualifies():
    # getloadavg unavailable stamps -1; the pass can't be checked
    # but must not be dropped
    loads = [[-1.0, -1.0], [1.0, 1.0]]
    kept, invalid = bench.gate_passes(loads, 4.0)
    assert kept == [0, 1]
    assert invalid is False


def test_noisy_queries_flags_stall_signature():
    # the r19 driver artifact: ann_topk median 2.0 with a 6.6 s
    # spread is the external-stall signature; a tight row is not
    samples = {
        "ann_topk": [1.8, 2.0, 8.4],
        "tpch_agg": [0.40, 0.43, 0.45],
    }
    assert bench.noisy_queries(samples) == ["ann_topk"]


def test_noisy_queries_absolute_floor():
    # sub-0.5 s spreads never flag, however small the median —
    # scheduling jitter on fast rows is not a stall
    assert bench.noisy_queries({"fast": [0.1, 0.2, 0.55]}) == []
    # above the floor AND above 50% of median: flagged
    assert bench.noisy_queries({"q": [0.4, 0.5, 1.0]}) == ["q"]


def test_noisy_queries_relative_threshold():
    # a slow row tolerates proportionally more spread: 2 s of
    # spread on a 10 s median is within 50%
    assert bench.noisy_queries({"kn": [9.0, 10.0, 11.0]}) == []
    assert bench.noisy_queries({"kn": [6.0, 10.0, 12.0]}) == ["kn"]


def test_noisy_queries_needs_two_samples():
    assert bench.noisy_queries({"q": [5.0]}) == []
    assert bench.noisy_queries({"q": []}) == []


def test_pressure_some10_parses_or_sentinel():
    p = bench.pressure_some10()
    # on this box psi exists; elsewhere the sentinel is fine
    assert p == -1.0 or 0.0 <= p <= 100.0


def test_own_cpu_ticks_counts_self():
    # burning CPU in this process must advance the counter. The
    # counter sums the LIVE process tree, so a descendant (a Spark
    # python worker) reaped between the two samples can transiently
    # mask the burn when the suite shares the box — retry a few
    # times rather than flake on that race.
    for _ in range(5):
        a = bench.own_cpu_ticks()
        x = 0
        for i in range(4_000_000):
            x += i * i
        b = bench.own_cpu_ticks()
        assert a >= 0 and b >= 0
        if b > a:
            return
    raise AssertionError(f"own ticks never advanced: {a} -> {b}")


def test_estimate_background_subtracts_self_load():
    # an idle box where the bench itself burns 6 cores: raw 6.3
    # must gate as ~0 background, not as an invalid artifact
    assert bench.estimate_background(6.3, 6.0) == 0.3
    assert bench.estimate_background(5.0, 6.0) == 0.0
    # real background shows through
    assert bench.estimate_background(9.0, 2.0) == 7.0
    # unavailable reading passes through unchanged
    assert bench.estimate_background(-1.0, 3.0) == -1.0
    # negative own-core estimate never inflates the reading
    assert bench.estimate_background(2.0, -1.0) == 2.0


def test_fold_own_ewma_models_loadavg():
    """Own-burn contribution folds with loadavg's own decay: a
    single 35 s pass at 20 cores from idle contributes ~44% of 20
    (the unclamped subtraction would have hidden ~11 cores of real
    background right after the pass), consecutive passes ACCUMULATE
    toward the full burn (a one-shot fraction clamp would keep
    under-subtracting and flag an idle box), long windows converge,
    and degenerate windows keep the previous estimate."""
    import math

    frac = 1.0 - math.exp(-35.0 / 60.0)
    one = bench.fold_own_ewma(0.0, 20.0, 35.0)
    assert abs(one - 20.0 * frac) < 1e-9
    # raw 16 right after the pass = 8.8 self + 7.2 background:
    # the folded estimate lets the background show through
    assert bench.estimate_background(16.0, one) > 7.0
    # ...whereas subtracting the window-average would hide it
    assert bench.estimate_background(16.0, 20.0) == 0.0
    # second identical pass: contribution rises toward 20
    two = bench.fold_own_ewma(one, 20.0, 35.0)
    assert one < two < 20.0
    # long window converges to the sustained burn
    assert abs(bench.fold_own_ewma(3.0, 6.0, 600.0) - 6.0) < 1e-3
    # degenerate window: keep the previous estimate
    assert bench.fold_own_ewma(4.2, 20.0, 0.0) == 4.2
    # negative cores never push the estimate below zero-burn
    assert bench.fold_own_ewma(0.0, -5.0, 35.0) == 0.0
