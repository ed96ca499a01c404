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


def test_own_cpu_ticks_counts_self():
    # burning CPU in this process must advance the counter
    a = bench.own_cpu_ticks()
    x = 0
    for i in range(4_000_000):
        x += i * i
    b = bench.own_cpu_ticks()
    assert a >= 0 and b > a


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
