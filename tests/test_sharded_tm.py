"""Sharded TIME-MAJOR detection == unsharded TM kernel (event tables).

`sharded_minn_rtl_detect_fused_tm` runs the flagship time-major kernel per
seq shard with halo-primed scratch and stitches the per-shard tables; the
merged result must equal the unsharded TM kernel (itself asserted equal to
the lane-major kernel in test_pallas_minn_tm).  Runs on the virtual
8-device CPU mesh (conftest); gates are planted ON seq-shard seams.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ofdm_sync_tpu.kernels.pallas_minn_tm import (
    minn_rtl_detect_fused_tm,
    to_time_tiled,
)
from ofdm_sync_tpu.parallel.shard import (
    make_stream_mesh,
    sharded_minn_rtl_detect_fused_tm,
)

Q = 32
KW = dict(
    quarter_len=Q, smooth_shift=3, threshold_value=3276,
    threshold_frac_bits=15, hysteresis=2,
)
R = 512          # rows per time block
N_SEQ = 4
NT = 8           # total time blocks -> L = 4096, 2 blocks per seq shard
L = NT * R
BLOCK = L // N_SEQ  # local samples per seq shard


def _stimulus(rng, batch, events_at=()):
    x = (0.25 * rng.standard_normal((4, batch, L))).astype(np.float32)
    A = rng.standard_normal(Q) + 1j * rng.standard_normal(Q)
    pre = np.concatenate([-A, A, A, -A, -A])
    pre /= np.sqrt(np.mean(np.abs(pre) ** 2))
    for b, pos in events_at:
        for c, comp in ((0, pre.real), (1, pre.imag), (2, pre.real),
                        (3, pre.imag)):
            x[c, b, pos : pos + 5 * Q] += 3 * comp.astype(np.float32)
    return x


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


def _run_pair(x, mesh, batch, **kw):
    kwargs = dict(KW)
    kwargs.update(kw)
    shard_only = {
        k: kwargs.pop(k) for k in ("overlap_halo",) if k in kwargs
    }
    cl = jnp.asarray(x)
    xt, G, NTx = to_time_tiled(cl, R)
    assert NTx == NT
    ref = minn_rtl_detect_fused_tm(
        xt, **kwargs, rows=R, stream_len=L, batch=batch,
    )
    out = sharded_minn_rtl_detect_fused_tm(
        xt.reshape(G, NT, 4 * R, 128), mesh, **kwargs, **shard_only,
        stream_len=L, rows=R, batch=batch, interpret=True,
    )
    return ref, out


@pytest.mark.slow
@pytest.mark.parametrize("boundary", [False, True])
def test_sharded_tm_equals_unsharded(rng, boundary):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_stream_mesh(n_data=1, n_seq=N_SEQ,
                            devices=jax.devices()[:N_SEQ])
    if boundary:
        # peak regions straddle seq-shard seams (shards are BLOCK samples)
        events = [(0, BLOCK - 3 * Q), (1, 2 * BLOCK - 2 * Q),
                  (2, 3 * BLOCK - 4 * Q), (3, BLOCK - Q)]
    else:
        events = [(0, 300), (1, 700), (2, 1500), (3, 2600), (3, 3600)]
    batch = 4
    x = _stimulus(rng, batch, events)
    ref, out = _run_pair(x, mesh, batch)
    for b in range(batch):
        assert int(ref.count[b]) >= 1, b
    _tables_equal(ref, out, batch)


@pytest.mark.slow
def test_sharded_tm_data_parallel(rng):
    """mesh (2, 4): 2 groups of 128 streams over 'data', seams on 'seq'."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_stream_mesh(n_data=2, n_seq=4)
    batch = 130  # pads to G=2 groups; group 1 streams 128,129 are real
    events = [(0, BLOCK - 3 * Q), (129, 2 * BLOCK - 2 * Q), (128, 900)]
    x = _stimulus(rng, batch, events)
    ref, out = _run_pair(x, mesh, batch)
    assert int(ref.count[129]) >= 1
    _tables_equal(ref, out, batch)


@pytest.mark.slow
def test_sharded_tm_int16_matches_f32(rng):
    """int16 tiled buffers (half the halo bytes on the wire) are
    bit-identical to pre-converted f32."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_stream_mesh(n_data=1, n_seq=N_SEQ,
                            devices=jax.devices()[:N_SEQ])
    batch = 3
    x = _stimulus(rng, batch, [(0, BLOCK - 3 * Q), (2, 2000)])
    xi = np.round(np.clip(x, -1, 1) * 2047).astype(np.int16)
    cl16 = jnp.asarray(xi)
    cl32 = cl16.astype(jnp.float32)
    kw = dict(KW, stream_len=L, rows=R, batch=batch, interpret=True)
    xt16, G, _ = to_time_tiled(cl16, R)
    xt32, _, _ = to_time_tiled(cl32, R)
    out16 = sharded_minn_rtl_detect_fused_tm(
        xt16.reshape(G, NT, 4 * R, 128), mesh, **kw
    )
    out32 = sharded_minn_rtl_detect_fused_tm(
        xt32.reshape(G, NT, 4 * R, 128), mesh, **kw
    )
    for f in ("valid", "closed", "gate_start", "gate_close", "peak_idx",
              "peak_value", "count", "overflow"):
        np.testing.assert_array_equal(
            np.asarray(getattr(out16, f)), np.asarray(getattr(out32, f)),
            err_msg=f,
        )


@pytest.mark.slow
def test_sharded_tm_seam_fuzz(rng):
    """Seeded fuzz of the TM seam merge (VERDICT r2 item 1): 50 seeds x 2
    streams with random noise levels and random preamble placements --
    half forced to straddle a random seq-shard seam -- sharded TM ==
    unsharded TM for every stream.  All 100 streams ride ONE sharded
    dispatch (one lane group), so the fuzz costs a single kernel pass."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_stream_mesh(n_data=1, n_seq=N_SEQ,
                            devices=jax.devices()[:N_SEQ])
    n_seeds = 50
    batch = 2 * n_seeds
    x = np.zeros((4, batch, L), np.float32)
    for seed in range(n_seeds):
        r = np.random.default_rng(2000 + seed)
        for s in range(2):
            b = 2 * seed + s
            noise = float(r.uniform(0.05, 0.3))
            x[:, b] = noise * r.standard_normal((4, L)).astype(np.float32)
            A = r.standard_normal(Q) + 1j * r.standard_normal(Q)
            pre = np.concatenate([-A, A, A, -A, -A])
            pre /= np.sqrt(np.mean(np.abs(pre) ** 2))
            for _ in range(int(r.integers(1, 4))):
                if r.random() < 0.5:
                    k = int(r.integers(1, N_SEQ))
                    pos = k * BLOCK - int(r.integers(1, 5 * Q))
                else:
                    pos = int(r.integers(0, L - 5 * Q))
                pos = max(0, min(L - 5 * Q - 1, pos))
                for c, comp in ((0, pre.real), (1, pre.imag),
                                (2, pre.real), (3, pre.imag)):
                    x[c, b, pos : pos + 5 * Q] += 3 * comp.astype(np.float32)
    ref, out = _run_pair(x, mesh, batch)
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
def test_sharded_tm_halo_overlap_split(rng):
    """The halo-overlap split (interior blocks primed locally, block 0 by
    the remote halo, tables stitched without a collective) is exact: events
    planted ON each shard's INTERNAL block0|interior seam (shard_start + R)
    produce tables equal to both the non-overlap sharded path and the
    unsharded kernel."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_stream_mesh(n_data=1, n_seq=N_SEQ,
                            devices=jax.devices()[:N_SEQ])
    batch = 4
    # peak regions straddle the local split seam of shards 0..3
    events = [(0, R - 3 * Q), (1, BLOCK + R - 2 * Q),
              (2, 2 * BLOCK + R - 4 * Q), (3, 3 * BLOCK + R - Q)]
    x = _stimulus(rng, batch, events)
    ref, out_ov = _run_pair(x, mesh, batch)  # overlap default: NT_loc 2
    _, out_seq = _run_pair(x, mesh, batch, overlap_halo=False)
    for b in range(batch):
        assert int(ref.count[b]) >= 1, b
    _tables_equal(ref, out_ov, batch)
    _tables_equal(ref, out_seq, batch)


@pytest.mark.slow
def test_sharded_tm_emit_unclosed(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_stream_mesh(n_data=1, n_seq=N_SEQ,
                            devices=jax.devices()[:N_SEQ])
    batch = 2
    x = np.zeros((4, batch, L), np.float32)  # zero stream: one unclosed gate
    xt, G, _ = to_time_tiled(jnp.asarray(x), R)
    kw = dict(KW, stream_len=L, rows=R, batch=batch, interpret=True)
    t_closed = sharded_minn_rtl_detect_fused_tm(
        xt.reshape(G, NT, 4 * R, 128), mesh, **kw, emit_unclosed=False
    )
    t_open = sharded_minn_rtl_detect_fused_tm(
        xt.reshape(G, NT, 4 * R, 128), mesh, **kw, emit_unclosed=True
    )
    assert int(t_closed.count[0]) == 0
    assert int(t_open.count[0]) == 1 and not bool(t_open.closed[0, 0])
