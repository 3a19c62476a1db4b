"""Sharded TIME-MAJOR from-IQ ZC detection == unsharded TM kernel.

`sharded_zc_iq_detect_tm` runs the time-major from-IQ ZC kernel per seq
shard with the halo pushed through the kernel's own datapath (bit-identical
seams) and stitches per-shard tables with the table merge; the result must
equal the unsharded TM kernel (itself asserted equal to the lane-major
kernel and the XLA path in test_pallas_zc).  Runs on the virtual 8-device
CPU mesh (conftest); events are planted ON seq-shard seams.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ofdm_sync_tpu.kernels.pallas_zc_tm import (
    to_time_tiled,
    zc_iq_cfar_detect_tm,
    zc_tm_halo_rows,
)
from ofdm_sync_tpu.parallel.shard import (
    make_stream_mesh,
    sharded_zc_iq_detect_tm,
)

RF = 128          # matched-filter template length
W = 128           # CFAR window
H_YST = 16
R = 512           # rows per time block
N_SEQ = 4
NT = 8            # total time blocks -> Lc = 4096, 2 blocks per seq shard
LC = NT * R       # correlation length (exactly tiles: L = LC - RF + 1)
L = LC - RF + 1
BLOCK = LC // N_SEQ
KW = dict(
    corr_window=W,
    threshold_value=int(3.0 * (1 << 15) / W),
    threshold_frac_bits=15,
    min_corr_mag=0.25,
    hysteresis=H_YST,
    max_events=8,
)

# the ZC template (root 25, RF-length time support), integer-quantized so
# the matched filter is exact and deterministic
_n = np.arange(RF)
_T = np.exp(-1j * np.pi * 25 * _n * (_n + 1) / RF)
T_I = np.round(12.0 * _T.real).astype(np.float32)
T_Q = np.round(12.0 * _T.imag).astype(np.float32)
REF_NORM = float(np.sqrt(np.sum(T_I.astype(np.float64) ** 2
                                + T_Q.astype(np.float64) ** 2)))


def _mf_of(iq):
    """Exact planar matched filter (full correlation) via FFT, rounded back
    to the exact integers (integer-valued iq x integer template)."""
    nfft = 1 << int(np.ceil(np.log2(LC)))
    x = (iq[0::2] + 1j * iq[1::2]).astype(np.complex128)
    K = np.fft.fft(np.conj((T_I + 1j * T_Q)[::-1]), nfft)
    conv = np.fft.ifft(np.fft.fft(x, nfft, axis=-1) * K, axis=-1)[..., :LC]
    mf = np.zeros((4,) + iq.shape[1:2] + (LC,), np.float32)
    mf[0::2] = np.round(conv.real).astype(np.float32)
    mf[1::2] = np.round(conv.imag).astype(np.float32)
    return mf


def _stimulus(rng, batch, events_at=()):
    iq = np.round(4.0 * rng.standard_normal((4, batch, L))).astype(np.float32)
    for b, pos in events_at:
        pos = max(0, min(L - RF - 1, pos))
        for c, plane in ((0, T_I), (1, T_Q), (2, T_I), (3, T_Q)):
            iq[c, b, pos : pos + RF] += 2.0 * plane
    return _mf_of(iq), iq


def _tables_equal(ref, out, batch):
    for f in ("valid", "closed", "gate_start", "gate_close", "peak_idx",
              "count", "overflow"):
        np.testing.assert_array_equal(
            np.asarray(getattr(out, f))[:batch],
            np.asarray(getattr(ref, f))[:batch],
            err_msg=f,
        )
    rv = np.asarray(ref.peak_value)[:batch]
    ov = np.asarray(out.peak_value)[:batch]
    np.testing.assert_allclose(ov, rv, atol=1e-4 * max(1.0, np.abs(rv).max()))


def _tile_pair(mf, iq, batch):
    iqp = np.zeros((4, batch, LC), np.float32)
    iqp[..., :L] = iq
    mft, G, NTx = to_time_tiled(jnp.asarray(mf), R)
    iqt, _, _ = to_time_tiled(jnp.asarray(iqp), R)
    assert NTx == NT
    return mft, iqt, G


def _run_pair(mf, iq, mesh, batch, **kw):
    kwargs = dict(KW)
    kwargs.update(kw)
    mft, iqt, G = _tile_pair(mf, iq, batch)
    ref = zc_iq_cfar_detect_tm(
        mft, iqt, ref_len=RF, ref_norm=REF_NORM, stream_len=LC,
        batch=batch, rows=R, **kwargs,
    )
    out = sharded_zc_iq_detect_tm(
        mft.reshape(G, NT, 4 * R, 128), iqt.reshape(G, NT, 4 * R, 128),
        mesh, ref_len=RF, ref_norm=REF_NORM, stream_len=LC,
        rows=R, batch=batch, interpret=True, **kwargs,
    )
    return ref, out


def test_halo_rows_fits():
    assert zc_tm_halo_rows(RF, W, H_YST) <= R <= BLOCK


@pytest.mark.parametrize("boundary", [False, True])
def test_sharded_zc_tm_equals_unsharded(rng, boundary):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_stream_mesh(n_data=1, n_seq=N_SEQ,
                            devices=jax.devices()[:N_SEQ])
    if boundary:
        # template peaks (pos + RF - 1 on the correlation axis) straddle
        # seq-shard seams
        events = [(0, BLOCK - RF // 2), (1, 2 * BLOCK - RF),
                  (2, 3 * BLOCK - 2 * RF), (3, BLOCK - 1)]
    else:
        events = [(0, 400), (1, 900), (2, 1800), (3, 2600), (3, 3400)]
    batch = 4
    mf, iq = _stimulus(rng, batch, events)
    ref, out = _run_pair(mf, iq, mesh, batch)
    for b in range(batch):
        assert int(np.asarray(ref.count)[b]) >= 1, b
    _tables_equal(ref, out, batch)


@pytest.mark.slow
def test_sharded_zc_tm_int16_iq_matches_f32(rng):
    """int16 iq buffers (half the iq halo bytes on the wire) are
    bit-identical to pre-converted f32."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_stream_mesh(n_data=1, n_seq=N_SEQ,
                            devices=jax.devices()[:N_SEQ])
    batch = 3
    mf, iq = _stimulus(rng, batch, [(0, BLOCK - RF // 2), (2, 2000)])
    mft, iqt, G = _tile_pair(mf, iq, batch)
    iqt16 = iqt.astype(jnp.int16)  # integer-valued by construction
    kw = dict(ref_len=RF, ref_norm=REF_NORM, stream_len=LC, rows=R,
              batch=batch, interpret=True, **KW)
    out16 = sharded_zc_iq_detect_tm(
        mft.reshape(G, NT, 4 * R, 128), iqt16.reshape(G, NT, 4 * R, 128),
        mesh, **kw,
    )
    out32 = sharded_zc_iq_detect_tm(
        mft.reshape(G, NT, 4 * R, 128), iqt.reshape(G, NT, 4 * R, 128),
        mesh, **kw,
    )
    for f in ("valid", "closed", "gate_start", "gate_close", "peak_idx",
              "peak_value", "count", "overflow"):
        np.testing.assert_array_equal(
            np.asarray(getattr(out16, f)), np.asarray(getattr(out32, f)),
            err_msg=f,
        )


@pytest.mark.slow
def test_sharded_zc_tm_seam_fuzz():
    """50-seed seam fuzz (VERDICT r3 item 4): random noise levels and
    random template placements -- half forced onto a random seq-shard
    seam -- sharded == unsharded for every stream.  All 100 streams ride
    ONE sharded dispatch (one lane group)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_stream_mesh(n_data=1, n_seq=N_SEQ,
                            devices=jax.devices()[:N_SEQ])
    n_seeds = 50
    batch = 2 * n_seeds
    iq = np.zeros((4, batch, L), np.float32)
    for seed in range(n_seeds):
        r = np.random.default_rng(3000 + seed)
        for s in range(2):
            b = 2 * seed + s
            amp = int(r.integers(2, 6))
            iq[:, b] = np.round(
                amp * r.standard_normal((4, L))
            ).astype(np.float32)
            for _ in range(int(r.integers(1, 4))):
                if r.random() < 0.5:
                    k = int(r.integers(1, N_SEQ))
                    pos = k * BLOCK - int(r.integers(1, 2 * RF))
                else:
                    pos = int(r.integers(0, L - RF))
                pos = max(0, min(L - RF - 1, pos))
                for c, plane in ((0, T_I), (1, T_Q), (2, T_I), (3, T_Q)):
                    iq[c, b, pos : pos + RF] += 2.0 * plane
    mf = _mf_of(iq)
    # capacity 32: once a table OVERFLOWS, unsharded (first E global gates)
    # and sharded (first E per shard, then merge) legitimately truncate
    # differently -- the overflow flag marks it; the fuzz asserts the
    # non-overflow regime, so give the dense noise-event streams headroom
    ref, out = _run_pair(mf, iq, mesh, batch, max_events=32)
    assert not bool(np.asarray(ref.overflow).any()), "fuzz overflowed; raise E"
    for b in range(batch):
        tag = f"seed {b // 2} stream {b % 2}"
        np.testing.assert_array_equal(
            np.asarray(out.count)[b], np.asarray(ref.count)[b], err_msg=tag
        )
        k = int(np.asarray(ref.count)[b])
        for f in ("gate_start", "gate_close", "peak_idx", "valid", "closed"):
            np.testing.assert_array_equal(
                np.asarray(getattr(out, f))[b][:k],
                np.asarray(getattr(ref, f))[b][:k],
                err_msg=f"{f} {tag}",
            )


@pytest.mark.slow
def test_sharded_zc_tm_data_parallel(rng):
    """mesh (2, 4): 2 groups of 128 streams over 'data', seams on 'seq'."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_stream_mesh(n_data=2, n_seq=4)
    batch = 130  # pads to G=2 groups; group-1 streams 128,129 are real
    mf, iq = _stimulus(rng, batch, [(0, BLOCK - RF // 2),
                                    (129, 2 * BLOCK - RF), (128, 900)])
    ref, out = _run_pair(mf, iq, mesh, batch)
    assert int(np.asarray(ref.count)[129]) >= 1
    _tables_equal(ref, out, batch)
