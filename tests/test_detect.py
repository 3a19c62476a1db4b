"""Parallel gate/hysteresis/peak extraction vs. the sequential FSM oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from ofdm_sync_tpu.ops.detect import (
    extract_gate_events,
    gate_open_mask,
    largest_true_run,
    earliest_long_run_end,
    mask_segments,
)
from ofdm_sync_tpu.conformance.golden import golden_gate_events


def _compare(above, track, h, tie, emit_unclosed, valid_from=0, max_events=128):
    got = extract_gate_events(
        jnp.asarray(above),
        jnp.asarray(track, jnp.float32),
        hysteresis=h,
        max_events=max_events,
        valid_from=valid_from,
        tie=tie,
        emit_unclosed=emit_unclosed,
    )
    want = golden_gate_events(above, track, h, tie, emit_unclosed, valid_from)
    count = int(got.count)
    assert not bool(got.overflow)
    assert count == len(want), f"event count {count} != {len(want)}"
    valid_idx = np.flatnonzero(np.asarray(got.valid))
    for slot, (start, end, peak_i, peak_v, closed) in zip(valid_idx, want):
        assert int(got.gate_start[slot]) == start
        assert int(got.peak_idx[slot]) == peak_i
        np.testing.assert_allclose(float(got.peak_value[slot]), peak_v, rtol=1e-6)
        assert bool(got.closed[slot]) == closed
        if closed:
            assert int(got.gate_close[slot]) == end


@pytest.mark.parametrize("h", [0, 1, 2, 5, 37])
@pytest.mark.parametrize("tie", ["first", "last"])
@pytest.mark.parametrize("emit_unclosed", [True, False])
def test_random_cases(rng, h, tie, emit_unclosed):
    for trial in range(8):
        n = 400
        track = rng.standard_normal(n).astype(np.float32) ** 2
        # correlated threshold crossings: smooth a random walk
        raw = np.cumsum(rng.standard_normal(n))
        above = raw > np.median(raw)
        _compare(above, track, h, tie, emit_unclosed)


def test_valid_from_prefix(rng):
    n = 300
    track = np.abs(rng.standard_normal(n)).astype(np.float32)
    above = rng.random(n) > 0.6
    _compare(above, track, 3, "first", True, valid_from=57)


def test_no_events():
    above = np.zeros(100, bool)
    track = np.ones(100, np.float32)
    got = extract_gate_events(
        jnp.asarray(above), jnp.asarray(track), hysteresis=2, max_events=4
    )
    assert int(got.count) == 0
    assert not np.any(np.asarray(got.valid))


def test_single_unclosed_gate():
    above = np.zeros(50, bool)
    above[30:] = True
    track = np.arange(50, dtype=np.float32)
    _compare(above, track, 4, "first", True)
    _compare(above, track, 4, "first", False)


def test_gate_merging_below_hysteresis():
    # two above-runs separated by a gap smaller than h must merge into one gate
    above = np.zeros(60, bool)
    above[10:15] = True
    above[18:22] = True  # gap of 3 belows
    track = np.random.default_rng(1).random(60).astype(np.float32)
    _compare(above, track, 5, "first", True)   # gap < h: one event
    _compare(above, track, 2, "first", True)   # gap > h: two events


def test_gate_open_mask_matches_events(rng):
    n = 200
    above = rng.random(n) > 0.7
    mask = np.asarray(gate_open_mask(jnp.asarray(above), hysteresis=3))
    events = golden_gate_events(above, np.ones(n), 3, "first", True)
    # every above sample must be inside the mask
    assert np.all(mask[above])
    # each closed event's [start, close] range is fully inside the mask
    for start, end, *_ , closed in events:
        if closed:
            assert np.all(mask[start : end + 1])


def test_largest_true_run():
    m = np.array([0, 1, 1, 0, 1, 1, 1, 0, 1], bool)
    got = np.asarray(largest_true_run(jnp.asarray(m)))
    want = np.array([0, 0, 0, 0, 1, 1, 1, 0, 0], bool)
    np.testing.assert_array_equal(got, want)


def test_largest_true_run_tie_earliest():
    m = np.array([1, 1, 0, 1, 1], bool)
    got = np.asarray(largest_true_run(jnp.asarray(m)))
    np.testing.assert_array_equal(got, [1, 1, 0, 0, 0])


def test_earliest_long_run_end():
    m = np.array([0, 1, 1, 0, 1, 1, 1, 1, 0], bool)
    assert int(earliest_long_run_end(jnp.asarray(m), 3)) == 7
    assert int(earliest_long_run_end(jnp.asarray(m), 2)) == 2
    assert int(earliest_long_run_end(jnp.asarray(m), 5)) == -1


def test_mask_segments():
    m = np.array([1, 1, 0, 0, 1, 0, 1, 1, 1], bool)
    assert mask_segments(m) == [(0, 2), (4, 5), (6, 9)]
    assert mask_segments(np.zeros(3, bool)) == []
    assert mask_segments(np.ones(3, bool)) == [(0, 3)]
