"""Fused Pallas Minn-RTL kernel vs the XLA streaming path.

On CPU the kernel runs in Pallas interpret mode (the wrapper auto-selects);
the same code path compiles with Mosaic on real TPU hardware.  Reference
datapath: ref/minn_antenna_path.sv:33-194 + ref/minn_preamble_detector.sv:
247-325 (via the already-conformance-tested `streaming.minn_rtl_metric_planar`).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ofdm_sync_tpu.kernels.streaming import (
    minn_rtl_detect_planar,
    minn_rtl_metric_planar,
    to_planar,
)
from ofdm_sync_tpu.kernels.pallas_minn import (
    minn_rtl_detect_fused_pallas,
    minn_rtl_detect_planar_pallas,
    minn_rtl_metric_planar_pallas,
)
from ofdm_sync_tpu.ops.detect import extract_gate_events

KW = dict(smooth_shift=3, threshold_value=3276, threshold_frac_bits=15)


def _compare_states(ref, out, atol_scale=2e-5):
    for name in ("corr_positive", "smooth_metric", "energy_total"):
        r = np.asarray(getattr(ref, name))
        o = np.asarray(getattr(out, name))
        scale = max(1.0, float(np.abs(r).max()))
        np.testing.assert_allclose(o, r, atol=atol_scale * scale, err_msg=name)
    np.testing.assert_array_equal(
        np.asarray(out.above_threshold), np.asarray(ref.above_threshold)
    )
    # vmap broadcasts the static valid_from into a (batch,) array
    assert out.valid_from == int(np.ravel(np.asarray(ref.valid_from))[0])


@pytest.mark.parametrize(
    "batch,Q,L,block,batch_tile",
    [
        (3, 16, 1000, 512, 2),     # batch + length padding, tiny Q
        pytest.param(1, 512, 9000, 4096, 8,   # flagship Q, one stream
                     marks=pytest.mark.slow),
        (2, 24, 700, 256, 8),      # non-power-of-two Q
        pytest.param(9, 32, 2048, 1024, 8,    # batch not divisible by tile
                     marks=pytest.mark.slow),
    ],
)
def test_pallas_metric_matches_xla(rng, batch, Q, L, block, batch_tile):
    iq = rng.standard_normal((batch, 2, 2, L)).astype(np.float32)
    ref = jax.vmap(lambda s: minn_rtl_metric_planar(s, quarter_len=Q, **KW))(
        jnp.asarray(iq)
    )
    out = minn_rtl_metric_planar_pallas(
        jnp.asarray(iq), quarter_len=Q, **KW, block=block, batch_tile=batch_tile
    )
    _compare_states(ref, out)


def test_pallas_metric_unbatched(rng):
    iq = rng.standard_normal((2, 2, 1500)).astype(np.float32)
    ref = minn_rtl_metric_planar(jnp.asarray(iq), quarter_len=64, **KW)
    out = minn_rtl_metric_planar_pallas(
        jnp.asarray(iq), quarter_len=64, **KW, block=512
    )
    assert out.corr_positive.shape == (1500,)
    _compare_states(ref, out)


def test_pallas_detect_events_match(rng):
    """End-to-end detection parity on a real preamble stimulus."""
    from ofdm_sync_tpu.ops.waveforms import build_minn_rtl_preamble
    from ofdm_sync_tpu.params import SystemParams

    sys_p = SystemParams(n_fft=256, num_active=144, cp_len=64)
    Q = 64
    pre = build_minn_rtl_preamble(
        "qpsk_freq", rng=np.random.default_rng(0), Q=Q, sys=sys_p
    )
    sig = np.concatenate(
        [np.zeros(700, np.complex128), pre, np.zeros(900, np.complex128)]
    )
    rx = np.stack([sig, 0.8 * sig])
    rx = rx + 0.05 * (
        rng.standard_normal(rx.shape) + 1j * rng.standard_normal(rx.shape)
    )
    iq = to_planar(jnp.asarray(rx))[None]

    kw = dict(quarter_len=Q, **KW, hysteresis=2)
    ref_state, ref_tab = minn_rtl_detect_planar(iq[0], **kw)
    out_state, out_tab = minn_rtl_detect_planar_pallas(
        iq, **kw, block=512, batch_tile=8
    )
    assert int(out_tab.count[0]) == int(ref_tab.count)
    np.testing.assert_array_equal(
        np.asarray(out_tab.peak_idx[0]), np.asarray(ref_tab.peak_idx)
    )
    assert int(ref_tab.count) >= 1  # the preamble is actually detected


def _two_stage_events(iq, Q, h, E, tie, emit, block, bt):
    st = minn_rtl_metric_planar_pallas(
        iq, quarter_len=Q, **KW, block=block, batch_tile=bt
    )
    return jax.vmap(
        lambda a, c: extract_gate_events(
            a, c, hysteresis=h, max_events=E, valid_from=st.valid_from,
            tie=tie, emit_unclosed=emit,
        )
    )(st.above_threshold, st.corr_positive)


def _assert_tables_equal(ref, out):
    for f in ("valid", "closed", "gate_start", "gate_close", "peak_idx",
              "count", "overflow"):
        np.testing.assert_array_equal(
            np.asarray(getattr(out, f)), np.asarray(getattr(ref, f)), err_msg=f
        )
    rv, ov = np.asarray(ref.peak_value), np.asarray(out.peak_value)
    np.testing.assert_allclose(ov, rv, atol=1e-4 * max(1.0, np.abs(rv).max()))


@pytest.mark.parametrize(
    "h,E,tie,emit",
    [pytest.param(2, 8, "last", False, marks=pytest.mark.slow),
     (5, 4, "first", True)],
)
def test_fused_detect_matches_two_stage(rng, h, E, tie, emit):
    """Fused in-kernel gate FSM == metric kernel + extract_gate_events."""
    batch, Q, L = 3, 16, 3000
    iq = (0.3 * rng.standard_normal((batch, 2, 2, L))).astype(np.float32)
    A = rng.standard_normal(Q) + 1j * rng.standard_normal(Q)
    pre = np.concatenate([-A, A, A, -A, -A])
    pre /= np.sqrt(np.mean(np.abs(pre) ** 2))
    for b in range(batch):
        p = 400 + 600 * b
        iq[b, :, 0, p:p + 5 * Q] += 4 * pre.real.astype(np.float32)
        iq[b, :, 1, p:p + 5 * Q] += 4 * pre.imag.astype(np.float32)
    iq = jnp.asarray(iq)
    ref = _two_stage_events(iq, Q, h, E, tie, emit, 512, 8)
    out = minn_rtl_detect_fused_pallas(
        iq, quarter_len=Q, **KW, hysteresis=h, max_events=E, tie=tie,
        emit_unclosed=emit, block=512, batch_tile=8,
    )
    _assert_tables_equal(ref, out)
    assert int(np.asarray(out.count).min()) >= 1


def test_fused_detect_zero_signal_unclosed_gate():
    """Zero stream -> threshold trivially met -> one unclosed gate; padded
    samples past the true stream end must not be peak-tracked."""
    iq = jnp.zeros((2, 2, 2, 2000), jnp.float32)
    ref = _two_stage_events(iq, 16, 1, 3, "last", True, 512, 8)
    out = minn_rtl_detect_fused_pallas(
        iq, quarter_len=16, **KW, hysteresis=1, max_events=3, tie="last",
        emit_unclosed=True, block=512, batch_tile=8,
    )
    _assert_tables_equal(ref, out)
    assert int(out.count[0]) == 1 and not bool(out.closed[0, 0])


def test_fused_detect_gate_spanning_blocks(rng):
    """A gate straddling a kernel block boundary merges correctly."""
    Q, L, block = 16, 2048, 512
    iq = (0.05 * rng.standard_normal((1, 2, 2, L))).astype(np.float32)
    A = rng.standard_normal(Q) + 1j * rng.standard_normal(Q)
    pre = np.concatenate([-A, A, A, -A, -A])
    pre /= np.sqrt(np.mean(np.abs(pre) ** 2))
    p = block - 2 * Q  # peak region crosses the first block boundary
    iq[0, :, 0, p:p + 5 * Q] += 4 * pre.real.astype(np.float32)
    iq[0, :, 1, p:p + 5 * Q] += 4 * pre.imag.astype(np.float32)
    iq = jnp.asarray(iq)
    ref = _two_stage_events(iq, Q, 2, 8, "last", False, block, 8)
    out = minn_rtl_detect_fused_pallas(
        iq, quarter_len=Q, **KW, hysteresis=2, max_events=8, tie="last",
        emit_unclosed=False, block=block, batch_tile=8,
    )
    _assert_tables_equal(ref, out)
    assert int(out.count[0]) >= 1


def test_channel_leading_layout_matches_natural(rng):
    """`channel_leading=True` input ((2*BR, batch, L), rows
    [b0_i, b0_q, b1_i, b1_q]) produces identical outputs to the natural
    (batch, BR, 2, L) layout -- it is the same kernel minus the per-call
    HBM transpose."""
    batch, Q, L = 3, 16, 1500
    iq = rng.standard_normal((batch, 2, 2, L)).astype(np.float32)
    cl = jnp.asarray(iq.reshape(batch, 4, L).transpose(1, 0, 2))
    a = minn_rtl_metric_planar_pallas(
        jnp.asarray(iq), quarter_len=Q, **KW, block=512
    )
    b = minn_rtl_metric_planar_pallas(
        cl, quarter_len=Q, **KW, block=512, channel_leading=True
    )
    for name in ("corr_positive", "smooth_metric", "energy_total",
                 "above_threshold"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            err_msg=name,
        )
    ta = minn_rtl_detect_fused_pallas(
        jnp.asarray(iq), quarter_len=Q, **KW, hysteresis=2, block=512
    )
    tb = minn_rtl_detect_fused_pallas(
        cl, quarter_len=Q, **KW, hysteresis=2, block=512,
        channel_leading=True,
    )
    _assert_tables_equal(ta, tb)


def test_corr_energy_kernel_matches_metric(rng):
    """The corr/energy-only kernel (the sharded path's building block)
    equals the metric kernel's corr_positive/energy_total, in both layouts
    and unbatched."""
    from ofdm_sync_tpu.kernels.pallas_minn import (
        minn_rtl_corr_energy_planar_pallas,
    )

    batch, Q, L = 3, 16, 1500
    iq = rng.standard_normal((batch, 2, 2, L)).astype(np.float32)
    st = minn_rtl_metric_planar_pallas(
        jnp.asarray(iq), quarter_len=Q, **KW, block=512
    )
    c, e = minn_rtl_corr_energy_planar_pallas(
        jnp.asarray(iq), quarter_len=Q, block=512
    )
    np.testing.assert_array_equal(np.asarray(c), np.asarray(st.corr_positive))
    np.testing.assert_array_equal(np.asarray(e), np.asarray(st.energy_total))
    cl = jnp.asarray(iq.reshape(batch, 4, L).transpose(1, 0, 2))
    c2, e2 = minn_rtl_corr_energy_planar_pallas(
        cl, quarter_len=Q, block=512, channel_leading=True
    )
    np.testing.assert_array_equal(np.asarray(c2), np.asarray(c))
    np.testing.assert_array_equal(np.asarray(e2), np.asarray(e))
    c1, e1 = minn_rtl_corr_energy_planar_pallas(
        jnp.asarray(iq[0]), quarter_len=Q, block=512
    )
    assert c1.shape == (L,)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c)[0])
