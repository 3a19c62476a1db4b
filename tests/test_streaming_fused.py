"""Fused-kernel streaming (one Pallas dispatch per chunk) == one-shot.

`minn_rtl_fused_stream_step` runs the full fused detect kernel per chunk
with KERNEL-EMITTED carried state (smoothing register + gate FSM carry +
IQ tail), so chunk boundaries are bit-exact continuations of the kernel's
own arithmetic.  Chunk tables stitched with the gap<=h rule must equal the
one-shot fused kernel's table, including gates straddling chunk seams.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ofdm_sync_tpu.kernels.pallas_minn import (
    minn_rtl_detect_fused_pallas,
    minn_rtl_metric_planar_pallas,
)
from ofdm_sync_tpu.kernels.streaming import to_planar
from ofdm_sync_tpu.kernels.streaming_chunked import (
    MinnRTLStreamParams,
    minn_rtl_fused_stream_init,
    minn_rtl_fused_stream_step,
    stitch_chunk_tables,
)
from ofdm_sync_tpu.ops.waveforms import build_minn_rtl_preamble

Q = 32
PARAMS = MinnRTLStreamParams(
    quarter_len=Q, smooth_shift=3, threshold_value=3276,
    threshold_frac_bits=15, hysteresis=2, max_events=8, tie="last",
)
KW = dict(
    quarter_len=Q, smooth_shift=3, threshold_value=3276,
    threshold_frac_bits=15, hysteresis=2, max_events=8, tie="last",
)
CHUNK = 1024
L = 4 * CHUNK


def _stream(rng, batch, positions):
    """(C, batch, L) channel-leading planar with preambles at `positions`
    (list per stream)."""
    x = np.zeros((batch, 2, 2, L), np.float32)
    for b in range(batch):
        sig = np.zeros(L, complex)
        for p in positions[b]:
            pre = build_minn_rtl_preamble(
                "qpsk_freq", rng=np.random.default_rng(b + 1), Q=Q
            )
            sig[p : p + 5 * Q] = pre
        rx = np.stack([sig, 0.8 * sig])
        rx = rx + 0.05 * (
            rng.standard_normal(rx.shape) + 1j * rng.standard_normal(rx.shape)
        )
        x[b] = np.asarray(to_planar(jnp.asarray(rx)))
    # (batch, 2, 2, L) -> channel-leading (C, batch, L)
    return jnp.asarray(x.reshape(batch, 4, L).transpose(1, 0, 2))


def _run_chunked(x):
    C, batch, n = x.shape
    state = minn_rtl_fused_stream_init(PARAMS, batch)
    tables = []
    for o in range(0, n, CHUNK):
        state, tb = minn_rtl_fused_stream_step(
            state, x[..., o : o + CHUNK], params=PARAMS
        )
        tables.append(tb)
    return state, tables


@pytest.mark.parametrize("seam", [False, True])
def test_fused_stream_equals_oneshot(rng, seam):
    batch = 3
    if seam:
        # preambles straddling chunk seams (peak region crosses boundary)
        positions = [[CHUNK - 3 * Q], [2 * CHUNK - 2 * Q, 3 * CHUNK - 4 * Q],
                     [CHUNK - Q]]
    else:
        positions = [[300], [900, 2600], [3500]]
    x = _stream(rng, batch, positions)

    ref = minn_rtl_detect_fused_pallas(
        x, **KW, block=CHUNK, channel_leading=True, emit_unclosed=True,
    )
    state, tables = _run_chunked(x)
    for b in range(batch):
        got = stitch_chunk_tables(
            [jax.tree.map(lambda a: a[b], t) for t in tables],
            hysteresis=PARAMS.hysteresis, stream_end=L, emit_unclosed=True,
        )
        k = int(np.asarray(ref.count)[b])
        assert len(got) == k, (b, got)
        for e in range(k):
            assert got[e]["start"] == int(np.asarray(ref.gate_start)[b, e])
            assert got[e]["close"] == int(np.asarray(ref.gate_close)[b, e])
            assert got[e]["pidx"] == int(np.asarray(ref.peak_idx)[b, e])
            assert got[e]["closed"] == bool(np.asarray(ref.closed)[b, e])
            np.testing.assert_array_equal(
                got[e]["pval"], np.asarray(ref.peak_value)[b, e]
            )


def test_fused_stream_carry_bit_exact(rng):
    """The kernel-emitted smoothing register equals the one-shot kernel's
    final smooth value BIT-EXACTLY (same arithmetic, state via HBM)."""
    batch = 2
    x = _stream(rng, batch, [[500], [2000]])
    state, _ = _run_chunked(x)
    ref = minn_rtl_metric_planar_pallas(
        x, quarter_len=Q, smooth_shift=3, threshold_value=3276,
        threshold_frac_bits=15, block=CHUNK, channel_leading=True,
    )
    np.testing.assert_array_equal(
        np.asarray(state.carry), np.asarray(ref.smooth_metric)[:, -1]
    )


def test_fused_stream_gate_carry_quiet_tail(rng):
    """A stream ending in silence: the carried gate stays stale (no
    continuation into the next chunk), and a fresh preamble in a later
    chunk becomes a separate event."""
    batch = 1
    x = _stream(rng, batch, [[200, 3 * CHUNK + 200]])
    state, tables = _run_chunked(x)
    got = stitch_chunk_tables(
        [jax.tree.map(lambda a: a[0], t) for t in tables],
        hysteresis=PARAMS.hysteresis, stream_end=L,
    )
    ref = minn_rtl_detect_fused_pallas(
        x, **KW, block=CHUNK, channel_leading=True,
    )
    assert len(got) == int(np.asarray(ref.count)[0])
    assert len(got) >= 2


# ---------------------------------------------------------------------------
# [A][A] fused streaming
# ---------------------------------------------------------------------------

AA_TOTAL = 256
AA_L = AA_TOTAL // 2
AA_CHUNK = 1024
AA_LEN = 4 * AA_CHUNK


def _aa_stream(rng, batch, positions, cfo_hz=500.0):
    from ofdm_sync_tpu.ops.channel import apply_cfo
    from ofdm_sync_tpu.ops.waveforms import build_aa_preamble
    from ofdm_sync_tpu.params import SYS_AA_10M

    pre, _, _ = build_aa_preamble(AA_TOTAL, SYS_AA_10M)
    x = np.zeros((batch, 2, 2, AA_LEN), np.float32)
    for b in range(batch):
        sig = np.zeros(AA_LEN, complex)
        for p in positions[b]:
            sig[p : p + AA_TOTAL] = pre
        rx = np.stack([sig, 0.8 * sig])
        rx = np.asarray(
            apply_cfo(jnp.asarray(rx), cfo_hz, SYS_AA_10M.sample_rate_hz)
        )
        rx = rx + 0.03 * (
            rng.standard_normal(rx.shape) + 1j * rng.standard_normal(rx.shape)
        )
        x[b] = np.asarray(to_planar(jnp.asarray(rx)))
    return jnp.asarray(x.reshape(batch, 4, AA_LEN).transpose(1, 0, 2))


@pytest.mark.parametrize("seam", [False, True])
def test_aa_fused_stream_equals_oneshot(rng, seam):
    from ofdm_sync_tpu.kernels.pallas_aa import aa_detect_fused_pallas
    from ofdm_sync_tpu.kernels.streaming_chunked import (
        aa_fused_stream_init, aa_fused_stream_step,
    )

    batch = 2
    if seam:
        positions = [[AA_CHUNK - AA_TOTAL // 2], [2 * AA_CHUNK - AA_L]]
    else:
        positions = [[700], [2200]]
    x = _aa_stream(rng, batch, positions)

    ref_tab, ref_P, ref_M = aa_detect_fused_pallas(
        x, half_len=AA_L, block=AA_CHUNK, channel_leading=True,
        emit_unclosed=True,
    )
    state = aa_fused_stream_init(AA_L, batch)
    tables, extras = [], []
    for o in range(0, AA_LEN, AA_CHUNK):
        state, (tb, P_pk, M_pk) = aa_fused_stream_step(
            state, x[..., o : o + AA_CHUNK], half_len=AA_L,
        )
        tables.append(tb)
        extras.append((P_pk, M_pk))
    for b in range(batch):
        got = stitch_chunk_tables(
            [jax.tree.map(lambda a: a[b], t) for t in tables],
            hysteresis=128, stream_end=AA_LEN, emit_unclosed=True,
            tie_last=False,
            extras_list=[
                {
                    "p_re": np.asarray(P)[b, 0],
                    "p_im": np.asarray(P)[b, 1],
                    "m": np.asarray(M)[b],
                }
                for P, M in extras
            ],
        )
        k = int(np.asarray(ref_tab.count)[b])
        assert len(got) == k >= 1, (b, got)
        for e in range(k):
            assert got[e]["start"] == int(np.asarray(ref_tab.gate_start)[b, e])
            assert got[e]["pidx"] == int(np.asarray(ref_tab.peak_idx)[b, e])
            np.testing.assert_array_equal(
                got[e]["pval"], np.asarray(ref_tab.peak_value)[b, e]
            )
            # the CFO capture followed the winning peak through the stitch
            np.testing.assert_array_equal(
                got[e]["extras"]["p_re"], np.asarray(ref_P)[b, 0, e]
            )
            np.testing.assert_array_equal(
                got[e]["extras"]["p_im"], np.asarray(ref_P)[b, 1, e]
            )
            np.testing.assert_array_equal(
                got[e]["extras"]["m"], np.asarray(ref_M)[b, e]
            )


def test_fused_stream_rebase_epoch(rng):
    """After a rebase on a quiet stretch, detection continues with fresh
    indices: an event at global position P in epoch 1 reports at
    P - rebase_point + (3Q - 1)."""
    from ofdm_sync_tpu.kernels.streaming_chunked import (
        minn_rtl_fused_stream_rebase,
    )

    batch = 1
    pos2 = CHUNK + 700
    x1 = _stream(rng, batch, [[500]])
    x2 = _stream(rng, batch, [[pos2]])
    state, t1 = _run_chunked(x1)
    assert int(np.asarray(t1[0].count)[0]) >= 1
    state = minn_rtl_fused_stream_rebase(state, params=PARAMS)
    tables = []
    for o in range(0, L, CHUNK):
        state, tb = minn_rtl_fused_stream_step(
            state, x2[..., o : o + CHUNK], params=PARAMS
        )
        tables.append(tb)
    got = stitch_chunk_tables(
        [jax.tree.map(lambda a: a[0], t) for t in tables],
        hysteresis=PARAMS.hysteresis,
        stream_end=L + 3 * Q - 1,
        emit_unclosed=True,
    )
    assert len(got) >= 1
    # epoch-relative index: positions shift by the warm-up offset
    ref = minn_rtl_detect_fused_pallas(
        x2, **KW, block=CHUNK, channel_leading=True, emit_unclosed=True,
    )
    shift = 3 * Q - 1
    assert got[0]["pidx"] == int(np.asarray(ref.peak_idx)[0, 0]) + shift


# ---------------------------------------------------------------------------
# ZC CFAR fused streaming (matched-filter magnitudes in)
# ---------------------------------------------------------------------------

def test_zc_cfar_fused_stream_equals_oneshot(rng):
    from ofdm_sync_tpu.kernels.pallas_zc import zc_cfar_detect_pallas
    from ofdm_sync_tpu.kernels.streaming_chunked import (
        zc_cfar_fused_stream_init, zc_cfar_fused_stream_step,
    )

    W = 512
    CH = 1024
    N = 4 * CH
    batch = 2
    # noise-floor magnitudes with peak bursts, one straddling a chunk seam
    mags = 0.02 * np.abs(rng.standard_normal((batch, N))).astype(np.float32)
    for b, centers in enumerate([[CH - 4, 2500], [2 * CH - 2]]):
        for c in centers:
            mags[b, c - 3 : c + 4] += np.float32(
                [0.4, 0.8, 1.5, 2.0, 1.5, 0.8, 0.4]
            )
    x = jnp.asarray(mags)
    kw = dict(corr_window=W, hysteresis=64, max_events=8)

    ref = zc_cfar_detect_pallas(x, **kw, block=CH, emit_unclosed=True)
    state = zc_cfar_fused_stream_init(W, batch)
    tables = []
    for o in range(0, N, CH):
        state, tb = zc_cfar_fused_stream_step(
            state, x[..., o : o + CH], **kw,
        )
        tables.append(tb)
    for b in range(batch):
        got = stitch_chunk_tables(
            [jax.tree.map(lambda a: a[b], t) for t in tables],
            hysteresis=64, stream_end=N, emit_unclosed=True, tie_last=False,
        )
        k = int(np.asarray(ref.count)[b])
        assert len(got) == k >= 1, (b, got)
        for e in range(k):
            assert got[e]["start"] == int(np.asarray(ref.gate_start)[b, e])
            assert got[e]["pidx"] == int(np.asarray(ref.peak_idx)[b, e])
            np.testing.assert_array_equal(
                got[e]["pval"], np.asarray(ref.peak_value)[b, e]
            )


def test_fused_stream_data_parallel(rng):
    """Multi-chip streaming: the fused stream step runs per-shard under
    shard_map with streams on 'data' (zero collectives -- each chip
    carries its own streams' state), equal to the unsharded step."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from ofdm_sync_tpu.parallel.shard import make_stream_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_stream_mesh(n_data=8, n_seq=1)
    batch = 8
    x = _stream(rng, batch, [[300 + 137 * b] for b in range(batch)])

    state0 = minn_rtl_fused_stream_init(PARAMS, batch)

    def step(s, c):
        return minn_rtl_fused_stream_step(s, c, params=PARAMS)

    st_spec = type(state0)(
        hist=P(None, "data", None), carry=P("data"), gate=P("data", None),
        base=P(),
    )
    # structure-only: one step (same graph the loop below compiles anyway)
    tb_spec = jax.tree.map(
        lambda _: P("data"),
        minn_rtl_fused_stream_step(
            state0, x[..., :CHUNK], params=PARAMS
        )[1],
    )
    sharded_step = shard_map(
        step, mesh=mesh,
        in_specs=(st_spec, P(None, "data", None)),
        out_specs=(st_spec, tb_spec),
        check_vma=False,
    )
    s_ref, s_sh = state0, state0
    for o in range(0, L, CHUNK):
        chunk = x[..., o : o + CHUNK]
        s_ref, t_ref = minn_rtl_fused_stream_step(
            s_ref, chunk, params=PARAMS
        )
        s_sh, t_sh = sharded_step(s_sh, chunk)
        for f in ("count", "gate_start", "gate_close", "peak_idx"):
            np.testing.assert_array_equal(
                np.asarray(getattr(t_sh, f)), np.asarray(getattr(t_ref, f)),
                err_msg=f,
            )
    np.testing.assert_array_equal(
        np.asarray(s_sh.carry), np.asarray(s_ref.carry)
    )
    np.testing.assert_array_equal(np.asarray(s_sh.gate), np.asarray(s_ref.gate))
