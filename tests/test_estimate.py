import numpy as np
import jax.numpy as jnp

from ofdm_sync_tpu.ops import estimate as E
from ofdm_sync_tpu.ops.channel import apply_cfo
from ofdm_sync_tpu.ops.waveforms import (
    build_random_qpsk_symbol,
    ofdm_fft_used,
    assemble_frame,
)
from ofdm_sync_tpu.params import SystemParams

SYS = SystemParams(n_fft=256, num_active=180, cp_len=64, tx_pre_pad=100)
FS = SYS.sample_rate_hz


def _frame(rng, cfo_hz=1000.0, snr_db=40.0):
    pilot, pilot_used = build_random_qpsk_symbol(rng, SYS)
    data, data_used = build_random_qpsk_symbol(rng, SYS)
    tx = assemble_frame(pilot, data, pre_pad=SYS.tx_pre_pad, post_pad=50)
    noise = np.sqrt(10 ** (-snr_db / 10) / 2) * (
        rng.standard_normal(tx.shape) + 1j * rng.standard_normal(tx.shape)
    )
    rx = np.asarray(apply_cfo(jnp.asarray(tx + noise, jnp.complex64), cfo_hz, FS))
    return rx, pilot_used, data_used


def test_cfo_from_cp_single(rng):
    rx, *_ = _frame(rng, cfo_hz=1000.0)
    est = float(E.estimate_cfo_from_cp(jnp.asarray(rx), SYS.tx_pre_pad, SYS.n_fft, SYS.cp_len, FS))
    assert abs(est - 1000.0) < 50.0


def test_cfo_variants_agree(rng):
    rx, *_ = _frame(rng, cfo_hz=800.0)
    start = SYS.tx_pre_pad
    robust = float(E.estimate_cfo_from_cp_robust(jnp.asarray(rx), start, SYS.n_fft, SYS.cp_len, FS))
    peak = float(E.estimate_cfo_from_cp_peak(jnp.asarray(rx), start, SYS.n_fft, SYS.cp_len, FS))
    cfo, idx = E.estimate_cfo_from_cp_peak_with_index(
        jnp.asarray(rx), start, SYS.n_fft, SYS.cp_len, FS
    )
    assert abs(robust - 800.0) < 60.0
    assert abs(peak - 800.0) < 60.0
    assert float(cfo) == peak
    # peak CP offset should be near the true CP start
    assert abs(int(idx) - start) <= SYS.cp_len // 2


def test_find_cp_start(rng):
    rx, *_ = _frame(rng, cfo_hz=0.0)
    found = E.find_cp_start_via_corr(jnp.asarray(rx), SYS.tx_pre_pad + 20, SYS.n_fft, SYS.cp_len, 64)
    assert abs(found - SYS.tx_pre_pad) <= 4


def test_ls_equalize_evm_roundtrip(rng):
    rx, pilot_used, data_used = _frame(rng, cfo_hz=0.0, snr_db=45.0)
    pilot_start = SYS.tx_pre_pad + SYS.cp_len
    pilot_td = rx[pilot_start : pilot_start + SYS.n_fft]
    y_pilot = ofdm_fft_used(pilot_td, SYS)
    h = E.ls_channel_estimate(y_pilot, jnp.asarray(pilot_used))
    data_start = pilot_start + SYS.n_fft + SYS.cp_len
    y_data = ofdm_fft_used(rx[data_start : data_start + SYS.n_fft], SYS)
    xhat = E.equalize(y_data, h)
    aligned, gain = E.align_complex_gain(xhat, jnp.asarray(data_used))
    evm, evm_db = E.evm_rms_db(aligned, jnp.asarray(data_used))
    assert float(evm) < 0.05
    assert abs(abs(complex(gain)) - 1.0) < 0.05


def test_remove_common_phase(rng):
    ref = (rng.standard_normal(64) + 1j * rng.standard_normal(64)).astype(np.complex64)
    rot = ref * np.exp(1j * 0.7)
    fixed, cpe = E.remove_common_phase(jnp.asarray(rot), jnp.asarray(ref))
    np.testing.assert_allclose(float(cpe), 0.7, atol=1e-3)
    np.testing.assert_allclose(np.asarray(fixed), ref, atol=1e-3)


def test_timing_offset_from_phase_slope(rng):
    # shift the pilot window by a known delta -> linear phase across bins
    rx, pilot_used, _ = _frame(rng, cfo_hz=0.0, snr_db=50.0)
    delta = 3
    pilot_start = SYS.tx_pre_pad + SYS.cp_len - delta  # early window, inside CP
    y = ofdm_fft_used(rx[pilot_start : pilot_start + SYS.n_fft], SYS)
    h = E.ls_channel_estimate(y, jnp.asarray(pilot_used))
    slope, sto = E.estimate_timing_offset_from_phase_slope(h, SYS.n_fft, SYS.num_active)
    # early window: y[n] = x[n-delta] -> H gains exp(-j 2 pi k delta / N)
    # -> slope = -2 pi delta / N -> sto = +delta
    assert abs(float(sto) - delta) < 0.5


def test_reconstruct_cir_from_ls():
    # H(k) of a pure delay tau -> reconstructed CIR peaks at tap tau
    from ofdm_sync_tpu.ops.waveforms import centered_subcarrier_indices

    tau = 7
    k = centered_subcarrier_indices(SYS.num_active)
    h_used = np.exp(-2j * np.pi * k * tau / SYS.n_fft)
    cir = E.reconstruct_cir_from_ls(jnp.asarray(h_used), SYS.n_fft, SYS.num_active)
    assert cir.shape == (SYS.n_fft,)
    assert int(np.argmax(np.abs(np.asarray(cir)))) == tau
