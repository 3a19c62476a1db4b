"""MXU matmul-DFT matched filter (kernels.pallas_mf) vs the XLA FFT form.

Reference behavior: the ZC matched filter of zc.py:106-130 and
zc_v2.py:244-271 -- full linear convolution with the conjugate-reversed
template.  The kernel re-expresses the overlap-save block FFTs as
radix-(128x128) Cooley-Tukey MXU matmuls (no reference counterpart); these
tests pin its output to `ops.channel.fft_convolve_full` in interpret mode,
covering block-seam geometry (lengths off the 14336-sample block step),
tap-length edges (1, 62, 2048, MAX_TAPS), precision modes, complex-tap
entry points, and the wired detector/sharded call sites.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ofdm_sync_tpu.kernels.pallas_mf import (
    MAX_TAPS, S_ROWS, LANES, matched_filter_mxu,
)
from ofdm_sync_tpu.ops.channel import fft_convolve_full


def _golden(x_planar: np.ndarray, taps: np.ndarray) -> np.ndarray:
    """Planar (C, batch, L) -> planar 'full' convolution via the XLA FFT."""
    if taps.ndim == 2:  # planar (2, T) float taps
        taps = taps[0] + 1j * taps[1]
    C, batch, L = x_planar.shape
    xc = (x_planar[0::2] + 1j * x_planar[1::2]).reshape(C // 2 * batch, L)
    g = np.asarray(
        fft_convolve_full(jnp.asarray(xc), jnp.asarray(taps)[None, :])
    ).reshape(C // 2, batch, -1)
    out = np.empty((C, batch, g.shape[-1]), np.float32)
    out[0::2] = g.real
    out[1::2] = g.imag
    return out


def _check(x, taps, *, precision="bf16x3", rtol=1e-4, **kw):
    # bf16x3 accuracy in CPU interpret mode depends on the XLA opt level
    # (measured 2e-5 of peak at default opts, 4e-5 under the quick gate's
    # --xla_backend_optimization_level=0); 1e-4 covers both.  The REAL
    # accuracy claim (~1e-5 of peak on the chip) is pinned by
    # conformance.onchip.check_mf_mxu against host float64.
    y = np.asarray(
        matched_filter_mxu(
            jnp.asarray(x), taps, precision=precision, interpret=True, **kw
        )
    )
    g = _golden(x, np.asarray(taps))
    n = kw.get("out_len") or g.shape[-1]
    scale = np.abs(g).max()
    np.testing.assert_allclose(y[..., :n], g[..., :n], atol=rtol * scale,
                               rtol=0)
    return y


def test_mf_mxu_matches_fft_conv_production_shape(rng):
    # the production PSS template length (reference zc_v2.py:480, T=2048)
    T = 2048
    taps = (rng.standard_normal(T) + 1j * rng.standard_normal(T)).astype(
        np.complex64
    )
    x = rng.standard_normal((4, 2, 30000)).astype(np.float32)
    _check(x, taps)


def test_mf_mxu_precision_modes(rng):
    T = 512
    taps = (rng.standard_normal(T) + 1j * rng.standard_normal(T)).astype(
        np.complex64
    )
    x = rng.standard_normal((2, 1, 20000)).astype(np.float32)
    _check(x, taps, precision="highest", rtol=2e-6)
    _check(x, taps, precision="bf16x3", rtol=1e-4)
    _check(x, taps, precision="default", rtol=5e-3)


@pytest.mark.parametrize("T", [1, 62, 129, 2048, MAX_TAPS])
def test_mf_mxu_tap_lengths(rng, T):
    # 62 = the PSS ZC length (reference zc.py:30); MAX_TAPS = kernel limit
    taps = (rng.standard_normal(T) + 1j * rng.standard_normal(T)).astype(
        np.complex64
    )
    x = rng.standard_normal((2, 1, 17000)).astype(np.float32)
    _check(x, taps)


@pytest.mark.parametrize(
    "L",
    [
        S_ROWS * LANES - 1,      # one sample under a block step
        S_ROWS * LANES,          # exactly one block step
        S_ROWS * LANES + 1,      # seam straddle into a second block
        2 * S_ROWS * LANES + 37, # ragged tail in block 3
        5000,                    # much shorter than a block
    ],
)
def test_mf_mxu_block_seams(rng, L):
    T = 200
    taps = (rng.standard_normal(T) + 1j * rng.standard_normal(T)).astype(
        np.complex64
    )
    x = rng.standard_normal((2, 1, L)).astype(np.float32)
    _check(x, taps, nb=1)


def test_mf_mxu_nb_variants_and_out_len(rng):
    T = 300
    taps = (rng.standard_normal(T) + 1j * rng.standard_normal(T)).astype(
        np.complex64
    )
    x = rng.standard_normal((2, 2, 20000)).astype(np.float32)
    y1 = _check(x, taps, nb=1)
    y2 = _check(x, taps, nb=2)
    y4 = _check(x, taps, nb=4)
    np.testing.assert_allclose(y1, y2, atol=1e-4, rtol=0)
    np.testing.assert_allclose(y1, y4, atol=1e-4, rtol=0)
    _check(x, taps, out_len=20000)


def test_mf_mxu_traced_complex_taps(rng):
    # complex taps arriving as a traced jax array (the in-jit call sites:
    # models.detectors.detect_fused_iq, parallel.shard.sharded_zc_detect)
    T = 256
    taps_np = (rng.standard_normal(T) + 1j * rng.standard_normal(T)).astype(
        np.complex64
    )
    x = rng.standard_normal((2, 1, 16000)).astype(np.float32)

    @jax.jit
    def run(v, t):
        return matched_filter_mxu(v, jnp.conj(t[::-1]), interpret=True)

    y = np.asarray(run(jnp.asarray(x), jnp.asarray(taps_np)))
    g = _golden(x, np.conj(taps_np[::-1]))
    scale = np.abs(g).max()
    np.testing.assert_allclose(y, g, atol=1e-4 * scale, rtol=0)


def test_mf_mxu_planar_float_taps(rng):
    T = 128
    taps_c = (rng.standard_normal(T) + 1j * rng.standard_normal(T)).astype(
        np.complex64
    )
    planar = np.stack(
        [taps_c.real.astype(np.float32), taps_c.imag.astype(np.float32)]
    )
    x = rng.standard_normal((2, 1, 15000)).astype(np.float32)
    y_c = _check(x, taps_c)
    y_p = _check(x, planar)
    np.testing.assert_allclose(y_c, y_p, atol=1e-6, rtol=0)


def test_mf_mxu_rejects_long_taps(rng):
    taps = np.ones(MAX_TAPS + 1, np.complex64)
    x = rng.standard_normal((2, 1, 8000)).astype(np.float32)
    with pytest.raises(ValueError, match="taps"):
        matched_filter_mxu(jnp.asarray(x), taps, interpret=True)
    with pytest.raises(ValueError, match="plane pairs"):
        matched_filter_mxu(
            jnp.asarray(x[:1]), np.ones(64, np.complex64), interpret=True
        )


def test_metrics_matched_filter_mxu_routing(rng):
    """ops.metrics.matched_filter(mxu=True) == the monolithic FFT form."""
    from ofdm_sync_tpu.ops import metrics as M

    ref = (rng.standard_normal(500) + 1j * rng.standard_normal(500)).astype(
        np.complex64
    )
    x = (
        rng.standard_normal((2, 20000)) + 1j * rng.standard_normal((2, 20000))
    ).astype(np.complex64)
    a = np.asarray(M.matched_filter(jnp.asarray(x), jnp.asarray(ref)))
    b = np.asarray(
        M.matched_filter(jnp.asarray(x), jnp.asarray(ref), mxu=True)
    )
    scale = np.abs(a).max()
    np.testing.assert_allclose(b, a, atol=1e-4 * scale, rtol=0)


def test_detect_fused_iq_mxu_same_events(rng):
    """The wired detector path: detect_fused_iq with mf_mode='mxu' emits the
    same event table as the XLA mf + same kernel (reference
    zc_v2.py:244-336, 486-498 semantics unchanged)."""
    from dataclasses import replace

    from ofdm_sync_tpu.models.detectors import ZCStreamingDetector
    from ofdm_sync_tpu.params import SystemParams, ZCParams

    det = ZCStreamingDetector(
        sys=SystemParams(n_fft=256, num_active=144, cp_len=64),
        zc=ZCParams(),
        mf_mode="xla",
    )
    ref = det.reference_waveform()
    L = 9000
    sig = np.zeros(L, complex)
    sig[3000 : 3000 + ref.size] = ref
    rx = np.stack([sig, 0.7 * sig]) + 0.05 * (
        rng.standard_normal((2, L)) + 1j * rng.standard_normal((2, L))
    )
    r_xla = det.detect_fused_iq(rx)
    r_mxu = replace(det, mf_mode="mxu").detect_fused_iq(rx)
    assert len(r_xla.events) == len(r_mxu.events) >= 1
    for a, b in zip(r_xla.events, r_mxu.events):
        assert a.peak_index == b.peak_index
        assert a.gate_start == b.gate_start
        assert a.detected_start == b.detected_start
        np.testing.assert_allclose(a.peak_value, b.peak_value, rtol=1e-4)
