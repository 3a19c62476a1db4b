"""Device-side aligned frame re-emission (ops.extract) — the R4 output
contract (reference ref/minn_preamble_detector.sv:103-180, 445-530: the
circular sample buffer + 4-deep detection timer queue re-emitting the
delayed stream with an aligned frame_start pulse)."""

import numpy as np
import jax.numpy as jnp

from ofdm_sync_tpu.ops.detect import GateEvents
from ofdm_sync_tpu.ops.extract import extract_frames, extract_frames_batched


def _table(peaks, count, E=8):
    peaks = list(peaks) + [0] * (E - len(peaks))
    valid = [i < count for i in range(E)]
    z = np.zeros(E, np.int32)
    return GateEvents(
        valid=jnp.asarray(valid),
        closed=jnp.asarray(valid),
        gate_start=jnp.asarray(z),
        gate_close=jnp.asarray(z),
        peak_idx=jnp.asarray(np.asarray(peaks, np.int32)),
        peak_value=jnp.asarray(np.zeros(E, np.float32)),
        count=jnp.asarray(np.int32(count)),
        overflow=jnp.asarray(False),
    )


def test_extract_frames_basic(rng):
    C, L, F = 4, 4096, 256
    iq = rng.standard_normal((C, L)).astype(np.float32)
    tab = _table([1000, 2500], 2)
    frames, starts, valid = extract_frames(
        jnp.asarray(iq), tab, frame_len=F, timing_offset=-64, max_frames=4
    )
    frames, starts, valid = map(np.asarray, (frames, starts, valid))
    assert frames.shape == (4, C, F)
    assert list(valid) == [True, True, False, False]
    assert list(starts[:2]) == [936, 2436]
    for k, s in enumerate(starts[:2]):
        np.testing.assert_array_equal(frames[k], iq[:, s : s + F])
    # invalid slots are zeroed (the RTL emits nothing without a detection)
    assert not frames[2:].any()


def test_extract_frames_clipping(rng):
    """Windows clip into the stream bounds (the RTL's OUTPUT_MARGIN slack,
    minn_preamble_detector.sv:103-113): a peak near either edge still
    yields an in-range frame."""
    C, L, F = 2, 1024, 512
    iq = rng.standard_normal((C, L)).astype(np.float32)
    tab = _table([3, 1020], 2)
    frames, starts, valid = extract_frames(
        jnp.asarray(iq), tab, frame_len=F, timing_offset=-100, max_frames=2
    )
    starts = np.asarray(starts)
    assert starts[0] == 0            # 3 - 100 clips to 0
    assert starts[1] == L - F        # 920 clips to 512
    np.testing.assert_array_equal(np.asarray(frames)[1], iq[:, L - F :])


def test_extract_frames_batched(rng):
    C, L, F = 4, 2048, 128
    iq = rng.standard_normal((3, C, L)).astype(np.float32)
    tabs = [_table([500], 1), _table([900, 1500], 2), _table([], 0)]
    import jax

    table = jax.tree.map(lambda *a: jnp.stack(a), *tabs)
    frames, starts, valid = extract_frames_batched(
        jnp.asarray(iq), table, frame_len=F, max_frames=2
    )
    valid = np.asarray(valid)
    assert valid.tolist() == [[True, False], [True, True], [False, False]]
    np.testing.assert_array_equal(
        np.asarray(frames)[1, 1], iq[1, :, 1500 : 1500 + F]
    )
    assert not np.asarray(frames)[2].any()


def test_minn_rtl_two_frame_extraction(rng):
    """Two-frame stimulus (reference minn_rtl.py:884-888: TX = [guard |
    frame | guard(frame_len) | frame]): ONE detection pass + device-side
    extraction with the RTL's TIMING_OFFSET=-CP recovers both frames
    (reference ref/minn_preamble_detector.sv:16-19, 445-530)."""
    from ofdm_sync_tpu.kernels.streaming import minn_rtl_detect_planar

    Q = 64
    cp = 32
    A = rng.standard_normal(Q) + 1j * rng.standard_normal(Q)
    pre = np.concatenate([-A, A, A, -A, -A])
    pre /= np.sqrt(np.mean(np.abs(pre) ** 2))
    flen = 5 * Q + 4 * Q  # preamble + "payload"
    payload = 0.5 * (
        rng.standard_normal(4 * Q) + 1j * rng.standard_normal(4 * Q)
    )
    frame = np.concatenate([pre, payload])
    guard = np.zeros(flen, complex)
    # Trailing guard must cover the second frame's emission window, which
    # opens 6Q-cp into the frame and extends frame_len beyond that (i.e.
    # 6Q - cp = 352 samples past frame end) -- the RTL's OUTPUT_MARGIN.
    tx = np.concatenate(
        [np.zeros(600, complex), frame, guard, frame, np.zeros(600, complex)]
    )
    tx_starts = [600, 600 + 2 * flen]
    rx = np.stack([tx, 0.8 * tx]) + 0.02 * (
        rng.standard_normal((2, tx.size))
        + 1j * rng.standard_normal((2, tx.size))
    )
    iq = np.stack([rx.real, rx.imag], axis=1).astype(np.float32)  # (2,2,L)

    _, table = minn_rtl_detect_planar(
        jnp.asarray(iq), quarter_len=Q, smooth_shift=3,
        threshold_value=8192, threshold_frac_bits=15, hysteresis=2,
        max_events=4,
    )
    assert int(table.count) >= 2

    frames, starts, valid = extract_frames(
        jnp.asarray(iq.reshape(4, -1)), table,
        frame_len=flen, timing_offset=-cp, max_frames=4,
    )
    starts, valid = np.asarray(starts), np.asarray(valid)
    assert valid.sum() >= 2
    # Minn-RTL peak lands 1Q after the preamble end = the pilot N-start
    # (reference minn_rtl.py:60-106); the -CP offset opens the window CP
    # samples before that.  The RTL re-emits EVERY detection (spurious
    # payload crossings included), so assert both true frames are AMONG the
    # emitted windows, each aligned within the RTL conformance precedent.
    expect_off = 6 * Q - cp
    for tstart in tx_starts:
        k = int(np.argmin(np.abs(starts - (tstart + expect_off))))
        assert valid[k]
        assert abs(int(starts[k]) - (tstart + expect_off)) <= 16
        s = int(starts[k])
        np.testing.assert_array_equal(
            np.asarray(frames)[k], iq.reshape(4, -1)[:, s : s + flen]
        )
