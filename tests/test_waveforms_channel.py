import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ofdm_sync_tpu.ops import waveforms as Wf
from ofdm_sync_tpu.ops import channel as Ch
from ofdm_sync_tpu.params import SystemParams, SYS_AA_10M

SYS = SystemParams(n_fft=256, num_active=180, cp_len=64, tx_pre_pad=0)


def test_centered_indices():
    idx = Wf.centered_subcarrier_indices(6)
    np.testing.assert_array_equal(idx, [-3, -2, -1, 1, 2, 3])
    assert 0 not in Wf.centered_subcarrier_indices(1200)


def test_symbol_unit_power(rng):
    sym, vals = Wf.build_random_qpsk_symbol(rng, SYS, include_cp=False)
    assert sym.shape == (SYS.n_fft,)
    np.testing.assert_allclose(np.mean(np.abs(sym) ** 2), 1.0, rtol=1e-10)
    # CP is a copy of the tail
    sym_cp, _ = Wf.build_random_qpsk_symbol(rng, SYS, include_cp=True)
    np.testing.assert_array_equal(sym_cp[: SYS.cp_len], sym_cp[-SYS.cp_len :])


def test_fft_roundtrip(rng):
    sym, vals = Wf.build_random_qpsk_symbol(rng, SYS, include_cp=False)
    got = np.asarray(Wf.ofdm_fft_used(jnp.asarray(sym, jnp.complex64), SYS))
    # time-domain normalization scales all bins by a common real factor
    scale = np.vdot(got, vals).real / np.vdot(got, got).real
    np.testing.assert_allclose(got * scale, vals, atol=2e-3)


def test_sc_preamble_halves_identical(rng):
    pre = Wf.build_sc_preamble(rng, SYS, include_cp=False)
    half = SYS.n_fft // 2
    np.testing.assert_allclose(pre[:half], pre[half:], atol=1e-12)


def test_minn_preamble_structure(rng):
    pre = Wf.build_minn_preamble(rng, SYS, include_cp=False)
    Q = SYS.n_fft // 4
    np.testing.assert_allclose(pre[:Q], pre[Q : 2 * Q], atol=1e-12)      # A A
    np.testing.assert_allclose(pre[2 * Q : 3 * Q], pre[3 * Q :], atol=1e-12)  # -A -A
    np.testing.assert_allclose(pre[:Q], -pre[2 * Q : 3 * Q], atol=1e-12)
    np.testing.assert_allclose(np.mean(np.abs(pre) ** 2), 1.0, rtol=1e-10)


def test_minn_rtl_preamble_structure(rng):
    for seq in Wf.BASE_SEQ_TYPES:
        pre = Wf.build_minn_rtl_preamble(seq, rng, Q=64, sys=SYS)
        assert pre.shape == (5 * 64,)
        A = pre[64:128]
        np.testing.assert_allclose(pre[:64], -A, atol=1e-12)        # S0 = -A
        np.testing.assert_allclose(pre[128:192], A, atol=1e-12)     # S2 = +A
        np.testing.assert_allclose(pre[192:256], -A, atol=1e-12)    # S3 = -A
        np.testing.assert_allclose(pre[256:], -A, atol=1e-12)       # S4 = -A
        np.testing.assert_allclose(np.mean(np.abs(pre) ** 2), 1.0, rtol=1e-9)


def test_park_preamble_symmetry(rng):
    pre = Wf.build_park_preamble(rng, SYS, include_cp=False)
    # Park property: x[d+k] ~= conj-symmetric pairs around center N/2 give a
    # sharp self-correlation at the center.  Weak check: conj symmetry of the
    # ideal structure survives band-masking approximately.
    assert pre.shape == (SYS.n_fft,)
    cp = Wf.build_park_preamble(rng, SYS, include_cp=True)
    assert cp.shape == (SYS.n_fft + SYS.cp_len // 2,)


def test_aa_preamble_repeats():
    pre, seq, papr = Wf.build_aa_preamble(1024, SYS_AA_10M)
    np.testing.assert_allclose(pre[:512], pre[512:], atol=1e-9)
    np.testing.assert_allclose(np.mean(np.abs(pre) ** 2), 1.0, rtol=1e-9)
    # PAPR documented as 3.69 dB (reference docs/aa_preamble_sync_design.md:74)
    assert abs(papr - 3.69) < 0.05
    for total in (512, 256):
        p, _, _ = Wf.build_aa_preamble(total, SYS_AA_10M)
        half = total // 2
        np.testing.assert_allclose(p[:half], p[half:], atol=1e-9)


def test_hermitian_preamble_structure():
    pre, vals = Wf.build_hermitian_minn_preamble(SYS, include_cp=False)
    Q = SYS.n_fft // 4
    np.testing.assert_allclose(pre[:Q], pre[Q : 2 * Q], atol=1e-9)
    np.testing.assert_allclose(pre[2 * Q :], -np.concatenate([pre[:Q], pre[:Q]]), atol=1e-9)
    # Hermitian-symmetric spectrum -> (nearly) real time signal
    assert np.max(np.abs(pre.imag)) < 1e-9


def test_zadoff_chu_constant_amplitude():
    for zc in (Wf.generate_zadoff_chu(25, 62), Wf.generate_zadoff_chu(7, 64, even_form=True)):
        np.testing.assert_allclose(np.abs(zc), 1.0, rtol=1e-12)


def test_batched_qpsk_frames():
    td, vals = Wf.batched_qpsk_frames(jax.random.key(0), 4, SYS)
    assert td.shape == (4, SYS.n_fft + SYS.cp_len)
    p = np.mean(np.abs(np.asarray(td[:, SYS.cp_len :])) ** 2, axis=-1)
    np.testing.assert_allclose(p, 1.0, rtol=1e-5)


# ---------------------------------------------------------------------------
# channel
# ---------------------------------------------------------------------------

def test_fft_convolve_matches_numpy(rng):
    x = (rng.standard_normal(300) + 1j * rng.standard_normal(300)).astype(np.complex64)
    h = (rng.standard_normal(40) + 1j * rng.standard_normal(40)).astype(np.complex64)
    got = np.asarray(Ch.fft_convolve_full(jnp.asarray(x)[None], jnp.asarray(h)[None]))[0]
    want = np.convolve(x, h)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fft_convolve_ols_matches_monolithic(rng):
    """Overlap-save convolution (the TPU production matched-filter form,
    tools/perf_probe13.py) == the monolithic-FFT form up to f32 rounding,
    including windows straddling block seams and the ragged last block."""
    T = 96
    for L in (900, 1024 - T + 1, 2000):  # ragged / exact-multiple / long
        x = (rng.standard_normal((2, L))
             + 1j * rng.standard_normal((2, L))).astype(np.complex64)
        h = (rng.standard_normal(T)
             + 1j * rng.standard_normal(T)).astype(np.complex64)
        want = np.asarray(
            Ch.fft_convolve_full(jnp.asarray(x), jnp.asarray(h)[None])
        )
        got = np.asarray(
            Ch.fft_convolve_full_ols(jnp.asarray(x), jnp.asarray(h),
                                     block=1024)
        )
        assert got.shape == want.shape == (2, L + T - 1)
        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, rtol=0, atol=3e-5 * scale)


def test_matched_filter_block_param(rng):
    """metrics.matched_filter(block=...) routes through overlap-save and
    matches the default monolithic path."""
    from ofdm_sync_tpu.ops import metrics as M

    x = (rng.standard_normal((2, 1500))
         + 1j * rng.standard_normal((2, 1500))).astype(np.complex64)
    ref = (rng.standard_normal(128)
           + 1j * rng.standard_normal(128)).astype(np.complex64)
    a = np.asarray(M.matched_filter(jnp.asarray(x), jnp.asarray(ref)))
    b = np.asarray(
        M.matched_filter(jnp.asarray(x), jnp.asarray(ref), block=512)
    )
    np.testing.assert_allclose(b, a, rtol=0, atol=3e-5 * np.abs(a).max())


def test_load_measured_cir():
    cir = Ch.load_measured_cir("cir1")
    assert cir.shape == (2, 1100)
    cir2 = Ch.load_measured_cir("cir2")
    assert cir2.shape == (2, 1100)
    with pytest.raises(ValueError):
        Ch.load_measured_cir("nope")
    # the measured channels are nontrivial and the peak offset is stable
    off = Ch.compute_channel_peak_offset(cir)
    assert 0 <= off < 1100


def test_apply_channel_shapes(rng):
    sig = (rng.standard_normal(500) + 1j * rng.standard_normal(500))
    out = Ch.apply_channel(sig, 10.0, rng, None)
    assert out.shape == (1, 500)
    cir = Ch.load_measured_cir("cir1")
    out = Ch.apply_channel(sig, 10.0, rng, cir)
    assert out.shape == (2, 500 + 1100 - 1)


def test_awgn_snr(rng):
    sig = np.ones((2, 20000), complex)
    noise = Ch.awgn_noise_host(sig, 10.0, rng)
    snr = 1.0 / np.mean(np.abs(noise) ** 2)
    assert abs(10 * np.log10(snr) - 10.0) < 0.3
    # zero-power branch gets zero noise
    sig[1] = 0
    noise = Ch.awgn_noise_host(sig, 10.0, rng)
    assert np.all(noise[1] == 0)


def test_awgn_device_snr():
    sig = jnp.ones((2, 20000), jnp.complex64)
    noise = np.asarray(Ch.awgn_noise_device(jax.random.key(1), sig, 10.0))
    snr = 1.0 / np.mean(np.abs(noise) ** 2)
    assert abs(10 * np.log10(snr) - 10.0) < 0.3


def test_apply_cfo_tone():
    x = jnp.ones((2, 100), jnp.complex64)
    y = np.asarray(Ch.apply_cfo(x, 1000.0, 1e6))
    want = np.exp(1j * 2 * np.pi * 1000.0 * np.arange(100) / 1e6)
    np.testing.assert_allclose(y[0], want, atol=1e-5)


def test_quantize_adc_roundtrip():
    x = jnp.asarray([0.5 + 0.25j, -2.0 + 1.0j, 0.0])
    q = np.asarray(Ch.quantize_adc(x, full_scale=1.0, bits=12))
    # clipping at +/- full scale
    assert q[1].real == -1.0
    # small values quantized to nearest 1/2048 step
    np.testing.assert_allclose(q[0].real, 0.5, atol=1 / 2048)


def test_quantize_int_matches_testbench_semantics(rng):
    x = rng.standard_normal(100) + 1j * rng.standard_normal(100)
    re, im, scale = Ch.quantize_int(x, 12)
    assert re.max() <= 2047 and re.min() >= -2048
    np.testing.assert_allclose(re / scale, x.real, atol=1.0 / scale)


def test_clipping_stats():
    x = np.asarray([0.5 + 0.5j, 2.0 + 0.0j, -3.0 - 3.0j])
    stats = Ch.compute_clipping_stats(x, 1.0)
    np.testing.assert_allclose(stats["total_clip_pct"], 200.0 / 3)


def test_multi_antenna_channel(rng):
    tx = rng.standard_normal(400) + 1j * rng.standard_normal(400)
    rx, cir, off = Ch.apply_channel_multi_antenna(tx, 10.0, rng, None, 2)
    assert rx.shape == (2, 400) and cir is None and off == 0
    rx, cir, off = Ch.apply_channel_multi_antenna(tx, 10.0, rng, "cir1", 2)
    assert rx.shape == (2, 400 + 1100 - 1)
    assert cir.shape == (2, 1100)
