"""Fused ZC CFAR Pallas kernel vs the XLA ZCStreamingDetector path.

Reference behavior: zc_v2.py:288-336 (CFAR threshold), 360-450 (gate FSM),
567-576 (strongest-event selection)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ofdm_sync_tpu.kernels.pallas_zc import zc_cfar_detect_pallas
from ofdm_sync_tpu.models.detectors import ZCStreamingDetector
from ofdm_sync_tpu.ops.detect import extract_gate_events
from ofdm_sync_tpu.params import SystemParams, ZCParams


def _small_detector():
    return ZCStreamingDetector(
        sys=SystemParams(n_fft=256, num_active=144, cp_len=64),
        zc=ZCParams(),
    )


def _stimulus(det, rng, L=6000, pos=1800):
    ref = det.reference_waveform()
    sig = np.zeros(L, complex)
    sig[pos : pos + ref.size] = ref
    rx = np.stack([sig, 0.7 * sig])
    return rx + 0.05 * (
        rng.standard_normal(rx.shape) + 1j * rng.standard_normal(rx.shape)
    )


def test_zc_cfar_kernel_matches_xla(rng):
    det = _small_detector()
    rx = _stimulus(det, rng)
    corr, corr_mag, local_sum, above, valid, ref_tab, _ = det._detect_jit(
        jnp.asarray(rx)
    )
    out = zc_cfar_detect_pallas(
        corr_mag,
        corr_window=det.params.corr_window,
        threshold_value=det.params.threshold_value,
        threshold_frac_bits=det.params.threshold_frac_bits,
        min_corr_mag=det.params.min_corr_mag,
        hysteresis=det.params.hysteresis,
        max_events=det.max_events,
        block=1024,
    )
    assert int(out.count) == int(ref_tab.count) >= 1
    for f in ("valid", "closed", "gate_start", "gate_close", "peak_idx",
              "overflow"):
        np.testing.assert_array_equal(
            np.asarray(getattr(out, f)), np.asarray(getattr(ref_tab, f)),
            err_msg=f,
        )
    np.testing.assert_allclose(
        np.asarray(out.peak_value), np.asarray(ref_tab.peak_value),
        rtol=1e-4, atol=1e-6,
    )


def test_zc_detector_fused_path_matches_detect(rng):
    det = _small_detector()
    rx = _stimulus(det, rng)
    ref = det.detect(jnp.asarray(rx))
    out = det.detect_fused(jnp.asarray(rx))
    assert len(out.events) == len(ref.events) >= 1
    for a, b in zip(out.events, ref.events):
        assert a.peak_index == b.peak_index
        assert a.detected_start == b.detected_start
    s_out, s_ref = det.strongest(out), det.strongest(ref)
    assert s_out.peak_index == s_ref.peak_index


@pytest.mark.slow
def test_zc_cfar_kernel_batched_multi_preamble(rng):
    det = _small_detector()
    ref = det.reference_waveform()
    mags = []
    refs = []
    for b in range(3):
        L = 9000
        sig = np.zeros(L, complex)
        # both preambles past the W=2048 CFAR warm-up (valid from n >= W)
        for pos in (2600 + 300 * b, 6200 + 300 * b):
            sig[pos : pos + ref.size] = ref
        rx = np.stack([sig, 0.7 * sig]) + 0.05 * (
            rng.standard_normal((2, L)) + 1j * rng.standard_normal((2, L))
        )
        _, corr_mag, _, above, _, tab, _ = det._detect_jit(jnp.asarray(rx))
        mags.append(np.asarray(corr_mag))
        refs.append(tab)
    out = zc_cfar_detect_pallas(
        jnp.asarray(np.stack(mags)),
        corr_window=det.params.corr_window,
        threshold_value=det.params.threshold_value,
        threshold_frac_bits=det.params.threshold_frac_bits,
        min_corr_mag=det.params.min_corr_mag,
        hysteresis=det.params.hysteresis,
        max_events=det.max_events,
        block=2048,
    )
    for b, tab in enumerate(refs):
        assert int(out.count[b]) == int(tab.count) >= 2
        k = int(tab.count)
        np.testing.assert_array_equal(
            np.asarray(out.peak_idx[b])[:k], np.asarray(tab.peak_idx)[:k]
        )
        # strongest-event selection (reference zc_v2.py:567-576) agrees
        pv = np.asarray(out.peak_value[b])[:k]
        rv = np.asarray(tab.peak_value)[:k]
        assert np.argmax(pv) == np.argmax(rv)


def test_zc_iq_fused_kernel_matches_xla(rng):
    """From-IQ fused kernel (sliding energy + normalization + branch sum +
    magnitude + CFAR + FSM in one pass) == the XLA ZCStreamingDetector
    path, at event-table granularity."""
    from ofdm_sync_tpu.kernels.pallas_zc import zc_iq_cfar_detect_pallas
    from ofdm_sync_tpu.ops import metrics as M

    det = _small_detector()
    rx = _stimulus(det, rng)  # (2, L) complex
    _, _, _, _, _, ref_tab, _ = det._detect_jit(jnp.asarray(rx))

    ref = jnp.asarray(det.reference_waveform(), jnp.complex64)
    mf = M.matched_filter(jnp.asarray(rx, jnp.complex64), ref)  # (2, Lc)
    mf_planar = jnp.stack(
        [mf[0].real, mf[0].imag, mf[1].real, mf[1].imag], axis=0
    )[:, None, :]
    iq_planar = jnp.stack(
        [rx[0].real, rx[0].imag, rx[1].real, rx[1].imag], axis=0
    ).astype(jnp.float32)[:, None, :]
    out = zc_iq_cfar_detect_pallas(
        mf_planar,
        iq_planar,
        ref_len=int(ref.shape[-1]),
        ref_norm=float(jnp.sqrt(jnp.sum(jnp.abs(ref) ** 2))),
        corr_window=det.params.corr_window,
        threshold_value=det.params.threshold_value,
        threshold_frac_bits=det.params.threshold_frac_bits,
        min_corr_mag=det.params.min_corr_mag,
        hysteresis=det.params.hysteresis,
        max_events=det.max_events,
        block=1024,
    )
    assert int(out.count[0]) == int(ref_tab.count) >= 1
    for f in ("valid", "closed", "gate_start", "gate_close", "peak_idx",
              "overflow"):
        np.testing.assert_array_equal(
            np.asarray(getattr(out, f))[0], np.asarray(getattr(ref_tab, f)),
            err_msg=f,
        )
    np.testing.assert_allclose(
        np.asarray(out.peak_value)[0], np.asarray(ref_tab.peak_value),
        rtol=1e-4, atol=1e-6,
    )


def test_zc_detector_fused_iq_path_matches_detect(rng):
    det = _small_detector()
    rx = _stimulus(det, rng)
    ref = det.detect(jnp.asarray(rx))
    out = det.detect_fused_iq(jnp.asarray(rx))
    assert len(out.events) == len(ref.events) >= 1
    for a, b in zip(out.events, ref.events):
        assert a.peak_index == b.peak_index
        assert a.detected_start == b.detected_start


def _planar_mf_iq(det, rx):
    from ofdm_sync_tpu.ops import metrics as M

    ref = jnp.asarray(det.reference_waveform(), jnp.complex64)
    mf = M.matched_filter(jnp.asarray(rx, jnp.complex64), ref)
    BR = mf.shape[0]
    mf_planar = jnp.stack(
        [p for b in range(BR) for p in (mf[b].real, mf[b].imag)], axis=0
    )
    iq_planar = jnp.stack(
        [p for b in range(BR) for p in (np.real(rx[b]), np.imag(rx[b]))],
        axis=0,
    ).astype(jnp.float32)
    ref_norm = float(jnp.sqrt(jnp.sum(jnp.abs(ref) ** 2)))
    return mf_planar, iq_planar, int(ref.shape[-1]), ref_norm


def test_zc_iq_tm_kernel_matches_xla(rng):
    """TIME-MAJOR from-IQ fused kernel == the XLA ZCStreamingDetector path
    at event-table granularity (same contract as the lane-major kernel)."""
    from ofdm_sync_tpu.kernels.pallas_zc_tm import zc_iq_cfar_detect_tm_planar

    det = _small_detector()
    rx = _stimulus(det, rng)  # (2, L) complex
    _, _, _, _, _, ref_tab, _ = det._detect_jit(jnp.asarray(rx))

    mf_planar, iq_planar, ref_len, ref_norm = _planar_mf_iq(det, rx)
    out = zc_iq_cfar_detect_tm_planar(
        mf_planar[:, None, :],
        iq_planar[:, None, :],
        ref_len=ref_len,
        ref_norm=ref_norm,
        corr_window=det.params.corr_window,
        threshold_value=det.params.threshold_value,
        threshold_frac_bits=det.params.threshold_frac_bits,
        min_corr_mag=det.params.min_corr_mag,
        hysteresis=det.params.hysteresis,
        max_events=det.max_events,
        rows=1024,
    )
    assert int(out.count[0]) == int(ref_tab.count) >= 1
    for f in ("valid", "closed", "gate_start", "gate_close", "peak_idx",
              "overflow"):
        np.testing.assert_array_equal(
            np.asarray(getattr(out, f))[0], np.asarray(getattr(ref_tab, f)),
            err_msg=f,
        )
    np.testing.assert_allclose(
        np.asarray(out.peak_value)[0], np.asarray(ref_tab.peak_value),
        rtol=1e-4, atol=1e-6,
    )


@pytest.mark.slow
def test_zc_iq_tm_kernel_batched_matches_lane_major(rng):
    """TM from-IQ kernel == the lane-major from-IQ kernel on a batch with
    multiple preambles per stream (events in different time blocks)."""
    from ofdm_sync_tpu.kernels.pallas_zc import zc_iq_cfar_detect_pallas
    from ofdm_sync_tpu.kernels.pallas_zc_tm import zc_iq_cfar_detect_tm_planar

    det = _small_detector()
    ref = det.reference_waveform()
    L = 9000
    rxs = []
    for b in range(3):
        sig = np.zeros(L, complex)
        for pos in (2600 + 300 * b, 6200 + 300 * b):
            sig[pos : pos + ref.size] = ref
        rx = np.stack([sig, 0.7 * sig]) + 0.05 * (
            rng.standard_normal((2, L)) + 1j * rng.standard_normal((2, L))
        )
        rxs.append(rx)
    rxs = np.stack(rxs)  # (3, 2, L)
    mfs, iqs = [], []
    for b in range(3):
        mf_p, iq_p, ref_len, ref_norm = _planar_mf_iq(det, rxs[b])
        mfs.append(mf_p)
        iqs.append(iq_p)
    mf = jnp.stack(mfs, axis=1)  # (C, 3, Lc)
    iq = jnp.stack(iqs, axis=1)  # (C, 3, L)
    kw = dict(
        ref_len=ref_len, ref_norm=ref_norm,
        corr_window=det.params.corr_window,
        threshold_value=det.params.threshold_value,
        threshold_frac_bits=det.params.threshold_frac_bits,
        min_corr_mag=det.params.min_corr_mag,
        hysteresis=det.params.hysteresis,
        max_events=det.max_events,
    )
    ref_tab = zc_iq_cfar_detect_pallas(mf, iq, **kw, block=2048)
    out = zc_iq_cfar_detect_tm_planar(mf, iq, **kw, rows=1024)
    for b in range(3):
        assert int(out.count[b]) == int(ref_tab.count[b]) >= 2
    for f in ("valid", "closed", "gate_start", "gate_close", "peak_idx",
              "count", "overflow"):
        np.testing.assert_array_equal(
            np.asarray(getattr(out, f)), np.asarray(getattr(ref_tab, f)),
            err_msg=f,
        )
    np.testing.assert_allclose(
        np.asarray(out.peak_value), np.asarray(ref_tab.peak_value),
        rtol=1e-4, atol=1e-6,
    )



def test_zc_iq_tm_int16_iq_matches_f32(rng):
    """int16 IQ tiled buffer (half the IQ DMA bytes) is bit-identical to
    the pre-converted f32 buffer (ADC codes are integer-valued floats)."""
    from ofdm_sync_tpu.kernels.pallas_zc_tm import (
        to_time_tiled, zc_iq_cfar_detect_tm,
    )

    det = _small_detector()
    rx = _stimulus(det, rng)  # (2, L) complex
    mf_planar, iq_planar, ref_len, ref_norm = _planar_mf_iq(det, rx)
    # quantize the IQ to int12-in-int16 codes; rebuild mf from the
    # quantized stream so both dtypes describe the same signal
    scale = 1024.0 / float(np.abs(iq_planar).max())
    iq16 = np.clip(
        np.round(np.asarray(iq_planar) * scale), -2048, 2047
    ).astype(np.int16)
    iq32 = iq16.astype(np.float32)
    rx_q = (iq32[0::2] + 1j * iq32[1::2]).astype(np.complex64)
    mf_planar, _, ref_len, ref_norm = _planar_mf_iq(det, rx_q)

    rows = 1024
    C, L = iq32.shape[0], iq32.shape[1]
    Lc = mf_planar.shape[-1]
    kw = dict(
        ref_len=ref_len, ref_norm=ref_norm,
        corr_window=det.params.corr_window,
        threshold_value=det.params.threshold_value,
        threshold_frac_bits=det.params.threshold_frac_bits,
        min_corr_mag=det.params.min_corr_mag,
        hysteresis=det.params.hysteresis,
        max_events=det.max_events,
        stream_len=Lc, batch=1, rows=rows,
    )
    mft, G, NT = to_time_tiled(
        jnp.asarray(mf_planar, jnp.float32)[:, None, :], rows
    )

    def tile_iq(arr):
        pad = jnp.zeros((C, 1, Lc), arr.dtype)
        pad = pad.at[..., :L].set(jnp.asarray(arr)[:, None, :])
        t, _, _ = to_time_tiled(pad, rows)
        return t

    out16 = zc_iq_cfar_detect_tm(mft, tile_iq(iq16), **kw)
    out32 = zc_iq_cfar_detect_tm(mft, tile_iq(iq32), **kw)
    assert int(np.asarray(out16.count)[0]) >= 1
    for f in ("valid", "closed", "gate_start", "gate_close", "peak_idx",
              "peak_value", "count", "overflow"):
        np.testing.assert_array_equal(
            np.asarray(getattr(out16, f)), np.asarray(getattr(out32, f)),
            err_msg=f,
        )
