"""Time-major fused kernel == lane-major fused kernel (event tables).

The TM kernel mirrors `pallas_minn`'s arithmetic with rows in place of
lanes, so its GateEvents must match the lane-major kernel's exactly
(same reduction trees => bit-identical f32).  On CPU both run in Pallas
interpret mode.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from ofdm_sync_tpu.kernels.pallas_minn import minn_rtl_detect_fused_pallas
from ofdm_sync_tpu.kernels.pallas_minn_tm import (
    minn_rtl_detect_fused_tm,
    to_time_tiled,
    from_time_tiled,
)

Q = 64
KW = dict(
    quarter_len=Q, smooth_shift=3, threshold_value=3276,
    threshold_frac_bits=15,
)
R = 512


def _assert_tables_equal(ref, out):
    for f in ("valid", "closed", "gate_start", "gate_close", "peak_idx",
              "count", "overflow"):
        np.testing.assert_array_equal(
            np.asarray(getattr(out, f)), np.asarray(getattr(ref, f)), err_msg=f
        )
    rv, ov = np.asarray(ref.peak_value), np.asarray(out.peak_value)
    np.testing.assert_allclose(ov, rv, atol=1e-4 * max(1.0, np.abs(rv).max()))


def _stimulus(rng, batch, L, events_at=()):
    x = (0.25 * rng.standard_normal((4, batch, L))).astype(np.float32)
    A = rng.standard_normal(Q) + 1j * rng.standard_normal(Q)
    pre = np.concatenate([-A, A, A, -A, -A])
    pre /= np.sqrt(np.mean(np.abs(pre) ** 2))
    for b, pos in events_at:
        x[0, b, pos : pos + 5 * Q] += 3 * pre.real.astype(np.float32)
        x[1, b, pos : pos + 5 * Q] += 3 * pre.imag.astype(np.float32)
        x[2, b, pos : pos + 5 * Q] += 3 * pre.real.astype(np.float32)
        x[3, b, pos : pos + 5 * Q] += 3 * pre.imag.astype(np.float32)
    return x


def _run_both(x, L, batch, h=2, E=8, tie="last", emit=False):
    cl = jnp.asarray(x)  # (C, batch, L) channel-leading
    ref = minn_rtl_detect_fused_pallas(
        cl, **KW, hysteresis=h, max_events=E, tie=tie, emit_unclosed=emit,
        block=1024, channel_leading=True,
    )
    xt, G, NT = to_time_tiled(cl, R)
    out = minn_rtl_detect_fused_tm(
        xt, **KW, hysteresis=h, max_events=E, tie=tie, emit_unclosed=emit,
        rows=R, stream_len=L, batch=batch,
    )
    return ref, out


def test_roundtrip_layout(rng):
    x = rng.standard_normal((4, 7, 1100)).astype(np.float32)
    xt, G, NT = to_time_tiled(jnp.asarray(x), R)
    assert xt.shape == (G * NT, 4 * R, 128)
    back = np.asarray(from_time_tiled(xt, G, NT, 4, R))
    np.testing.assert_array_equal(back[:, :7, :1100], x)


@pytest.mark.parametrize(
    "tie,emit,h",
    [("last", False, 2),
     pytest.param("first", True, 5, marks=pytest.mark.slow)],
)
def test_tm_matches_lane_major_events(rng, tie, emit, h):
    """Events spanning block boundaries, multiple gates, noise floor."""
    batch, L = 6, 4 * R - 100
    events = [(0, 300), (1, R - 3 * Q), (2, 2 * R - Q), (3, 700),
              (3, 2 * R + 200), (5, 3 * R - 300)]
    x = _stimulus(rng, batch, L, events)
    ref, out = _run_both(x, L, batch, h=h, tie=tie, emit=emit)
    _assert_tables_equal(ref, out)
    assert int(np.asarray(ref.count).sum()) >= len(events) - 2


def test_tm_zero_signal_unclosed(rng):
    """Zero stream -> threshold trivially met -> one unclosed gate."""
    batch, L = 3, 2 * R
    x = np.zeros((4, batch, L), np.float32)
    ref, out = _run_both(x, L, batch, h=1, E=3, tie="last", emit=True)
    _assert_tables_equal(ref, out)
    assert int(np.asarray(out.count)[0]) == 1


def test_tm_batch_padding_masked(rng):
    """batch not a multiple of 128: padded lanes emit nothing and the
    true streams' tables are unaffected."""
    batch, L = 5, 2 * R
    x = _stimulus(rng, batch, L, [(0, 300), (4, 600)])
    ref, out = _run_both(x, L, batch)
    _assert_tables_equal(ref, out)


def test_tm_stream_length_padding(rng):
    """L not a multiple of rows: tail padding is not peak-tracked and a
    gate running into the pad closes per L_true semantics."""
    batch = 2
    L = 2 * R + 37
    x = _stimulus(rng, batch, L, [(0, L - 6 * Q), (1, 500)])
    ref, out = _run_both(x, L, batch)
    _assert_tables_equal(ref, out)


def test_tm_non_power_of_two_q(rng):
    """Non-power-of-two quarter_len takes the binary-decomposition window
    path and still matches the lane-major kernel exactly (r2 review fix)."""
    Qn, batch, L = 48, 3, 3 * R
    x = (0.25 * rng.standard_normal((4, batch, L))).astype(np.float32)
    A = rng.standard_normal(Qn) + 1j * rng.standard_normal(Qn)
    pre = np.concatenate([-A, A, A, -A, -A])
    pre /= np.sqrt(np.mean(np.abs(pre) ** 2))
    for b, pos in ((0, 400), (1, R - Qn), (2, 2 * R - 300)):
        for c, comp in ((0, pre.real), (1, pre.imag), (2, pre.real),
                        (3, pre.imag)):
            x[c, b, pos : pos + 5 * Qn] += 3 * comp.astype(np.float32)
    cl = jnp.asarray(x)
    kw = dict(quarter_len=Qn, smooth_shift=3, threshold_value=3276,
              threshold_frac_bits=15, hysteresis=2)
    ref = minn_rtl_detect_fused_pallas(cl, **kw, block=1024,
                                       channel_leading=True)
    xt, G, NT = to_time_tiled(cl, R)
    out = minn_rtl_detect_fused_tm(xt, **kw, rows=R, stream_len=L,
                                   batch=batch)
    assert int(np.asarray(ref.count).sum()) >= 2
    _assert_tables_equal(ref, out)
