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
