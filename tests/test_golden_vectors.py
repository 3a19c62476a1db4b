"""Conformance against the reference's documented golden test vectors
(docs/preamble_test_vector.csv, docs/detector_test_vector.csv,
docs/detector_cfo_test_vector.csv)."""

import numpy as np
import jax.numpy as jnp

from ofdm_sync_tpu.conformance.vectors import (
    VECTOR_CFO_HZ,
    VECTOR_FS_HZ,
    VECTOR_L,
    golden_stimulus,
    load_golden_vectors,
)
from ofdm_sync_tpu.ops.metrics import aa_metric
from ofdm_sync_tpu.ops.waveforms import build_aa_preamble
from ofdm_sync_tpu.params import SYS_AA_10M


def test_preamble_vector_matches_builder():
    """Our [A][A] preamble builder reproduces the published float samples."""
    g = load_golden_vectors()
    pre, _, _ = build_aa_preamble(1024, SYS_AA_10M)
    np.testing.assert_allclose(pre, g.preamble_float, atol=1e-9)


def test_preamble_int12_quantization():
    """int12 columns are round(float * 1024) of the float columns."""
    g = load_golden_vectors()
    q = np.round(g.preamble_float.real * 1024) + 1j * np.round(
        g.preamble_float.imag * 1024
    )
    np.testing.assert_array_equal(q, g.preamble_int12)


def test_clean_detector_trace():
    """Per-sample (M, P, R) parity with the clean golden trace, f32 kernel
    vs float64 published values (tolerance precedent: +-16 samples on events,
    we hold every sample to ~1e-4 relative)."""
    g = load_golden_vectors()
    stim = golden_stimulus(cfo_hz=0.0)
    st = aa_metric(jnp.asarray(stim, jnp.complex64), VECTOR_L)
    P = np.asarray(st.P)[g.clean_samples]
    M = np.asarray(st.M)[g.clean_samples]
    R = np.asarray(st.R)[g.clean_samples]
    np.testing.assert_allclose(P.real, g.clean_P.real, atol=0.02)
    np.testing.assert_allclose(P.imag, g.clean_P.imag, atol=0.02)
    np.testing.assert_allclose(R, g.clean_R, atol=0.02)
    np.testing.assert_allclose(M, g.clean_M, atol=1e-5)
    np.testing.assert_allclose(
        np.abs(P) ** 2, g.clean_P_mag_sq, rtol=1e-4, atol=0.05
    )
    # documented peak: M = 1.000 at sample 1523 (preamble end)
    i = np.where(g.clean_samples == 1523)[0][0]
    assert abs(M[i] - 1.0) < 1e-5


def test_cfo_detector_trace():
    """CFO=500 Hz trace: angle(P) settles at 2 pi 500 L / fs = 0.10472 rad."""
    g = load_golden_vectors()
    stim = golden_stimulus(cfo_hz=VECTOR_CFO_HZ)
    st = aa_metric(jnp.asarray(stim, jnp.complex64), VECTOR_L)
    P = np.asarray(st.P)[g.cfo_samples]
    M = np.asarray(st.M)[g.cfo_samples]
    np.testing.assert_allclose(P.real, g.cfo_P.real, atol=0.05)
    np.testing.assert_allclose(P.imag, g.cfo_P.imag, atol=0.05)
    np.testing.assert_allclose(M, g.cfo_M, atol=1e-5)
    angle = np.angle(P)
    # compare angles only where |P| is meaningful
    sig = np.abs(P) > 1.0
    np.testing.assert_allclose(angle[sig], g.cfo_angle[sig], atol=1e-4)
    expected = 2 * np.pi * VECTOR_CFO_HZ * VECTOR_L / VECTOR_FS_HZ
    i = np.where(g.cfo_samples == 1523)[0][0]
    np.testing.assert_allclose(angle[i], expected, atol=1e-4)
    np.testing.assert_allclose(g.cfo_angle[i], 0.10471976, atol=1e-6)
