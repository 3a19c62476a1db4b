"""Fused [A][A] Pallas kernel vs the XLA AADetector path.

Reference behavior: sync_aa.py:421-571 (metric, gate at M>=0.15, peak on
|P|^2, CFO from angle(P_peak), frame start = peak - 2L + 1).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ofdm_sync_tpu.kernels.pallas_aa import aa_detect_fused_pallas
from ofdm_sync_tpu.kernels.streaming import to_planar
from ofdm_sync_tpu.models.detectors import AADetector
from ofdm_sync_tpu.ops.channel import apply_cfo
from ofdm_sync_tpu.ops.waveforms import build_aa_preamble
from ofdm_sync_tpu.params import AADetectorParams, SYS_AA_10M


def _stimulus(rng, total_len=256, L_sig=8192, pos=2000, cfo_hz=500.0,
              snr_amp=0.05):
    pre, _, _ = build_aa_preamble(total_len, SYS_AA_10M)
    sig = np.zeros(L_sig, complex)
    sig[pos : pos + total_len] = pre
    rx = np.stack([sig, 0.8 * sig])
    rx = np.asarray(apply_cfo(jnp.asarray(rx), cfo_hz, SYS_AA_10M.sample_rate_hz))
    rx = rx + snr_amp * (
        rng.standard_normal(rx.shape) + 1j * rng.standard_normal(rx.shape)
    )
    return rx


def test_aa_fused_matches_xla_detector(rng):
    total = 256
    L = total // 2
    rx = _stimulus(rng, total_len=total)
    det = AADetector(params=AADetectorParams(preamble_len=total))
    state, table, P_pk, M_pk = det._detect_jit(jnp.asarray(rx))

    iq = to_planar(jnp.asarray(rx))
    ftab, fP, fM = aa_detect_fused_pallas(
        iq, half_len=L, threshold=det.params.threshold,
        hysteresis=det.params.hysteresis, block=1024,
    )
    assert int(ftab.count) == int(table.count)
    k = int(table.count)
    np.testing.assert_array_equal(
        np.asarray(ftab.peak_idx)[:k], np.asarray(table.peak_idx)[:k]
    )
    np.testing.assert_array_equal(
        np.asarray(ftab.gate_start)[:k], np.asarray(table.gate_start)[:k]
    )
    # P and M captured at the peak drive CFO and quality reporting
    # (fP is planar (2, E): the axon backend cannot transfer complex arrays)
    fP_c = np.asarray(fP)[0] + 1j * np.asarray(fP)[1]
    np.testing.assert_allclose(
        fP_c[:k], np.asarray(P_pk)[:k], rtol=2e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(fM)[:k], np.asarray(M_pk)[:k], rtol=2e-4, atol=1e-5
    )


def test_aa_fused_cfo_and_timing(rng):
    """End-to-end physical quantities: CFO within the design-doc accuracy and
    frame start = peak - 2L + 1 at the true position (reference
    docs/aa_preamble_sync_design.md section 8-9)."""
    total = 1024
    L = total // 2
    pos = 3000
    cfo = 500.0
    rx = _stimulus(rng, total_len=total, pos=pos, cfo_hz=cfo, snr_amp=0.02)
    iq = to_planar(jnp.asarray(rx))
    table, P_pk, _ = aa_detect_fused_pallas(iq, half_len=L, block=2048)
    assert int(table.count) >= 1
    peak = int(np.asarray(table.peak_idx)[0])
    frame_start = peak - 2 * L + 1
    assert abs(frame_start - pos) <= 2
    fs = SYS_AA_10M.sample_rate_hz
    Pp = np.asarray(P_pk)
    cfo_est = float(np.arctan2(Pp[1, 0], Pp[0, 0])) * fs / (2 * np.pi * L)
    assert abs(cfo_est - cfo) < 5.0  # Hz


def test_aa_detector_fused_path_matches_detect(rng):
    """AADetector.detect_fused (Pallas) == AADetector.detect (XLA)."""
    rx = _stimulus(rng, total_len=256)
    det = AADetector(params=AADetectorParams(preamble_len=256))
    _, ref = det.detect(jnp.asarray(rx))
    out = det.detect_fused(jnp.asarray(rx))
    assert len(out.events) == len(ref.events) >= 1
    for a, b in zip(out.events, ref.events):
        assert a.peak_index == b.peak_index
        assert a.detected_start == b.detected_start
        assert abs(a.cfo_hz - b.cfo_hz) < 0.5
        assert abs(a.metric_at_peak - b.metric_at_peak) < 1e-4


def test_aa_fused_batched(rng):
    rxs = [
        _stimulus(np.random.default_rng(s), total_len=256, pos=1500 + 400 * s)
        for s in range(3)
    ]
    iq = to_planar(jnp.asarray(np.stack(rxs)))
    table, P_pk, M_pk = aa_detect_fused_pallas(iq, half_len=128, block=1024)
    assert table.peak_idx.shape == (3, 8)
    for s in range(3):
        assert int(table.count[s]) >= 1
        peak = int(np.asarray(table.peak_idx)[s, 0])
        assert abs((peak - 255) - (1500 + 400 * s)) <= 2


def test_aa_channel_leading_layout_matches_natural(rng):
    """Framework-native branch-major channel-leading input ((2*BR, batch,
    L), rows [b0_i, b0_q, b1_i, b1_q] -- same convention as the Minn
    kernels) is bit-identical to the natural (batch, BR, 2, L) path."""
    batch, L_half, L = 2, 64, 2000
    iq = rng.standard_normal((batch, 2, 2, L)).astype(np.float32)
    cl = jnp.asarray(iq.reshape(batch, 4, L).transpose(1, 0, 2))
    ta = aa_detect_fused_pallas(jnp.asarray(iq), half_len=L_half, block=512)
    tb = aa_detect_fused_pallas(
        cl, half_len=L_half, block=512, channel_leading=True
    )
    for a, b in zip(jax.tree.leaves(ta), jax.tree.leaves(tb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sc_metric_fused_matches_xla(rng):
    """The fused S&C metric (AA-kernel re-indexing) equals
    ops.metrics.sc_metric, including the plateau-end pick."""
    from ofdm_sync_tpu.kernels.pallas_aa import sc_metric_planar_pallas
    from ofdm_sync_tpu.ops.metrics import find_plateau_end, sc_metric
    from ofdm_sync_tpu.kernels.streaming import to_planar

    n_fft, L = 256, 3000
    x = (rng.standard_normal((2, L)) + 1j * rng.standard_normal((2, L)))
    x[:, 800:800 + n_fft // 2] = x[:, 800 + n_fft // 2:800 + n_fft]  # [A][A]
    M_ref, P_ref, R_ref = sc_metric(jnp.asarray(x), n_fft)
    iq = np.asarray(to_planar(jnp.asarray(x)))[None].astype(np.float32)
    M, P, R = sc_metric_planar_pallas(
        jnp.asarray(iq), n_fft=n_fft, block=512
    )
    scale = float(np.abs(np.asarray(R_ref)).max())
    np.testing.assert_allclose(
        np.asarray(R)[0], np.asarray(R_ref), atol=2e-5 * scale
    )
    np.testing.assert_allclose(
        np.asarray(P)[0, 0], np.asarray(P_ref).real, atol=2e-5 * scale
    )
    np.testing.assert_allclose(
        np.asarray(P)[0, 1], np.asarray(P_ref).imag, atol=2e-5 * scale
    )
    np.testing.assert_allclose(
        np.asarray(M)[0], np.asarray(M_ref), atol=1e-4
    )
    d_ref = int(find_plateau_end(M_ref, cp_len=64))
    d_fused = int(find_plateau_end(jnp.asarray(M)[0], cp_len=64))
    assert d_ref == d_fused


def test_minn_metric_fused_matches_xla(rng):
    """The fused standard-Minn metric (AA-kernel re-indexing) equals
    ops.metrics.minn_metric, including the peak pick."""
    from ofdm_sync_tpu.kernels.pallas_aa import minn_metric_planar_pallas
    from ofdm_sync_tpu.ops.metrics import find_minn_peak_standard, minn_metric
    from ofdm_sync_tpu.kernels.streaming import to_planar

    n_fft, L = 256, 3000
    Q = n_fft // 4
    x = (rng.standard_normal((2, L)) + 1j * rng.standard_normal((2, L)))
    A = x[:, 900:900 + Q]
    x[:, 900:900 + n_fft] = np.concatenate([A, A, -A, -A], axis=-1)
    M_ref, P_ref, R_ref = minn_metric(jnp.asarray(x), n_fft)
    iq = np.asarray(to_planar(jnp.asarray(x)))[None].astype(np.float32)
    M, P, R = minn_metric_planar_pallas(
        jnp.asarray(iq), n_fft=n_fft, block=512
    )
    scale = float(np.abs(np.asarray(R_ref)).max())
    np.testing.assert_allclose(
        np.asarray(R)[0], np.asarray(R_ref), atol=2e-5 * scale
    )
    np.testing.assert_allclose(
        np.asarray(P)[0, 0], np.asarray(P_ref).real, atol=2e-5 * scale
    )
    np.testing.assert_allclose(
        np.asarray(P)[0, 1], np.asarray(P_ref).imag, atol=2e-5 * scale
    )
    np.testing.assert_allclose(np.asarray(M)[0], np.asarray(M_ref), atol=1e-4)
    pk_ref = find_minn_peak_standard(M_ref)
    pk_fused = find_minn_peak_standard(jnp.asarray(M)[0])
    assert int(pk_ref[0]) == int(pk_fused[0])
