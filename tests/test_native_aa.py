"""C++ fixed-point [A][A] detector vs the reference golden vectors.

The golden detector traces (data/golden_vectors.npz, from reference
docs/detector_test_vector.csv and docs/detector_cfo_test_vector.csv) are the
design doc's own published per-sample values; the int12 preamble columns
define the quantized stimulus.  The native integer pipeline must reproduce
P/R within quantization error and detect the documented peak."""

import numpy as np
import pytest

from ofdm_sync_tpu.conformance.golden import golden_gate_events
from ofdm_sync_tpu.conformance.vectors import (
    VECTOR_CFO_HZ,
    VECTOR_FS_HZ,
    VECTOR_L,
    VECTOR_PRE_PAD,
    golden_stimulus,
    load_golden_vectors,
)
from ofdm_sync_tpu.native import aa_detect_native

SCALE = 1024.0  # int12 vector = round(float * 1024)


def _int12_stimulus(cfo_hz: float = 0.0) -> np.ndarray:
    stim = golden_stimulus(cfo_hz=cfo_hz)
    q = np.round(stim.real * SCALE) + 1j * np.round(stim.imag * SCALE)
    return np.stack([q.real, q.imag]).astype(np.int16)[None]  # (1, 2, n)


def test_native_aa_traces_match_golden_vectors():
    g = load_golden_vectors()
    det = aa_detect_native(_int12_stimulus(), half_len=VECTOR_L,
                           return_traces=True)
    s = g.clean_samples
    P = (det.P_re[s] + 1j * det.P_im[s]) / SCALE**2
    R = det.R[s] / SCALE**2
    # int12 quantization error bounds the trace deviation
    np.testing.assert_allclose(P.real, g.clean_P.real, atol=0.05)
    np.testing.assert_allclose(P.imag, g.clean_P.imag, atol=0.05)
    np.testing.assert_allclose(R, g.clean_R, atol=0.05)
    big = g.clean_P_mag_sq > 1.0
    np.testing.assert_allclose(
        (np.abs(P) ** 2)[big], g.clean_P_mag_sq[big], rtol=5e-3
    )


def test_native_aa_detects_documented_peak():
    det = aa_detect_native(_int12_stimulus(), half_len=VECTOR_L)
    assert det.count >= 1
    # strongest event: documented M=1.0 plateau peaks at preamble end 1523
    best = int(np.argmax(det.peak_value[: det.count]))
    peak = int(det.peak_idx[best])
    assert abs(peak - 1523) <= 2
    frame_start = peak - 2 * VECTOR_L + 1
    assert abs(frame_start - VECTOR_PRE_PAD) <= 2


def test_native_aa_cfo_from_peak_matches_documented_angle():
    det = aa_detect_native(_int12_stimulus(cfo_hz=VECTOR_CFO_HZ),
                           half_len=VECTOR_L)
    assert det.count >= 1
    best = int(np.argmax(det.peak_value[: det.count]))
    angle = float(np.angle(det.p_at_peak[best]))
    expected = 2 * np.pi * VECTOR_CFO_HZ * VECTOR_L / VECTOR_FS_HZ  # 0.10472
    assert abs(angle - expected) < 2e-3
    cfo_est = angle * VECTOR_FS_HZ / (2 * np.pi * VECTOR_L)
    assert abs(cfo_est - VECTOR_CFO_HZ) < 10.0


def test_native_aa_fsm_matches_sequential_oracle():
    det = aa_detect_native(_int12_stimulus(), half_len=VECTOR_L,
                           return_traces=True, max_events=8)
    track = det.P_re.astype(float) ** 2 + det.P_im.astype(float) ** 2
    events = golden_gate_events(
        det.above.astype(bool), track, hysteresis=128, tie="first",
        emit_unclosed=True,
    )
    assert len(events) == det.count
    for k, (start, close, peak_i, peak_v, closed) in enumerate(events):
        assert det.gate_start[k] == start
        assert det.peak_idx[k] == peak_i
        assert det.peak_value[k] == pytest.approx(peak_v, rel=1e-12)
        assert bool(det.closed[k]) == closed
