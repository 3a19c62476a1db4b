import numpy as np
import jax
import jax.numpy as jnp

from ofdm_sync_tpu.kernels.streaming import (
    aa_metric_planar,
    from_planar,
    minn_rtl_detect_planar,
    minn_rtl_metric_planar,
    to_planar,
)
from ofdm_sync_tpu.ops import metrics as M


def _x(rng, branches=2, L=2048):
    return (
        rng.standard_normal((branches, L)) + 1j * rng.standard_normal((branches, L))
    ).astype(np.complex64)


def test_planar_roundtrip(rng):
    x = _x(rng)
    p = to_planar(jnp.asarray(x))
    assert p.shape == (2, 2, 2048) and p.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(from_planar(p)), x, atol=1e-6)


def test_minn_rtl_planar_matches_complex(rng):
    x = _x(rng)
    ref = M.minn_rtl_metric(
        jnp.asarray(x), smooth_shift=3, threshold_value=3276,
        threshold_frac_bits=15, quarter_len=64,
    )
    fast = minn_rtl_metric_planar(
        to_planar(jnp.asarray(x)), quarter_len=64, smooth_shift=3,
        threshold_value=3276, threshold_frac_bits=15,
    )
    np.testing.assert_allclose(
        np.asarray(fast.corr_positive), np.asarray(ref.corr_positive),
        rtol=1e-5, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(fast.energy_total), np.asarray(ref.energy_total),
        rtol=1e-5, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(fast.smooth_metric), np.asarray(ref.smooth_metric),
        rtol=1e-4, atol=1e-3,
    )
    assert (
        np.mean(np.asarray(fast.above_threshold) != np.asarray(ref.above_threshold))
        < 0.002
    )


def test_minn_rtl_detect_planar_events(rng):
    from ofdm_sync_tpu.ops.waveforms import build_minn_rtl_preamble
    from ofdm_sync_tpu.params import SystemParams

    sys = SystemParams(n_fft=256, num_active=180, cp_len=64, tx_pre_pad=300)
    pre = build_minn_rtl_preamble("qpsk_freq", rng, Q=64, sys=sys)
    tx = np.zeros(2048, complex)
    tx[300 : 300 + pre.size] = pre
    tx[620:1400] = 0.4 * (rng.standard_normal(780) + 1j * rng.standard_normal(780))
    x = (np.stack([tx, tx]) + 0.05 * (
        rng.standard_normal((2, 2048)) + 1j * rng.standard_normal((2, 2048))
    )).astype(np.complex64)
    state, table = minn_rtl_detect_planar(
        to_planar(jnp.asarray(x)), quarter_len=64, smooth_shift=3,
        threshold_value=3276, threshold_frac_bits=15, hysteresis=2,
    )
    assert int(table.count) >= 1
    # peak should land near preamble end + Q (pilot-N-start convention)
    peak = int(table.peak_idx[0])
    assert abs(peak - (300 + 5 * 64 + 64)) <= 16


def test_minn_rtl_planar_vmap(rng):
    """The fast path vmaps over a stream batch (the bench configuration)."""
    B = 4
    x = np.stack([_x(rng, L=1024) for _ in range(B)])
    iq = to_planar(jnp.asarray(x))  # (B, 2ant, 2, L)
    fn = jax.vmap(
        lambda s: minn_rtl_metric_planar(
            s, quarter_len=64, smooth_shift=3, threshold_value=3276,
            threshold_frac_bits=15,
        ).smooth_metric
    )
    out = fn(iq)
    assert out.shape == (B, 1024)
    single = minn_rtl_metric_planar(
        iq[1], quarter_len=64, smooth_shift=3, threshold_value=3276,
        threshold_frac_bits=15,
    ).smooth_metric
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(single), rtol=1e-6)


def test_aa_planar_matches_complex(rng):
    x = _x(rng, L=1024)
    ref = M.aa_metric(jnp.asarray(x), 64)
    fast = aa_metric_planar(to_planar(jnp.asarray(x)), 64)
    np.testing.assert_allclose(np.asarray(fast.P_re), np.asarray(ref.P).real, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(fast.P_im), np.asarray(ref.P).imag, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(fast.R), np.asarray(ref.R), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(fast.M), np.asarray(ref.M), rtol=1e-4, atol=1e-5)
