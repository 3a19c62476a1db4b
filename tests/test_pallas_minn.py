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
    minn_rtl_detect_planar_pallas,
    minn_rtl_metric_planar_pallas,
)

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
        (1, 512, 9000, 4096, 8),   # flagship Q, one stream
        (2, 24, 700, 256, 8),      # non-power-of-two Q
        (9, 32, 2048, 1024, 8),    # batch not divisible by tile
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
