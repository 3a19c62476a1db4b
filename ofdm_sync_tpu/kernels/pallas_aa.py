"""Fused Pallas TPU kernel for the [A][A] streaming detector.

The second flagship: the detector specified by the reference's FPGA design
doc (docs/aa_preamble_sync_design.md) and modelled in reference
sync_aa.py:421-571.  One kernel pass computes, per VMEM-resident time block:

  lag-L complex correlation P (planar re/im) -> L-window running sums ->
  antenna combine -> normalized metric M = |P|^2 / R^2 -> threshold gate ->
  gate/hysteresis/peak FSM on |P|^2, capturing (P_re, P_im, M) at the peak

so the CFO estimate `angle(P_peak) * fs / (2 pi L)` and the frame start
`peak - 2L + 1` (reference sync_aa.py:533-540) come straight out of the
event table with zero full-length HBM traffic.

Shares the windowed-sum ladders and the in-VMEM event machinery with the
Minn-RTL kernel (kernels/pallas_common.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ofdm_sync_tpu.kernels import pallas_common as common

_LANE = common.LANE


def _aa_metric_rows(x, hist_ref, *, L: int, H: int):
    """Shared [A][A] metric datapath: planar lag-L correlation + L-window
    sums, branch-combined.  Returns (P_re, P_im, R), each (NB, B); updates
    the IQ history scratch.  (Reference sync_aa.py:463-481.)

    Rows are the framework-native BRANCH-MAJOR channel-leading order
    [b0_i, b0_q, b1_i, b1_q] (same as the Minn-RTL kernel).  The planar
    complex lag product needs no tiled-dim slicing:
      Re(x conj(x_d)) summed over planes = sum_rows ext * ext_d
      Im(x conj(x_d)) = q*i_d - i*q_d   = sum_rows sign * ext * swap(ext_d)
    where swap exchanges each branch's I and Q rows (a cheap leading-dim
    concat) and sign is -1 on I (even) rows, +1 on Q (odd) rows.
    """
    ext = jnp.concatenate([hist_ref[...], x], axis=-1)  # (2*BR, NB, H+B)
    hist_ref[...] = ext[..., -H:]
    C = ext.shape[0]

    # P = sum_window x[n] conj(x[n-L]); zero-filled history reproduces the
    # RTL delay-line priming.  The L-delay is an unmasked wrap-roll and the
    # ladders are guarded: total garbage < L + (L - 1) < 2L <= H, inside the
    # discarded ext head.
    ext_d = common.roll(ext, L)
    swapped_d = jnp.concatenate(
        [ext_d[(r ^ 1):(r ^ 1) + 1] for r in range(C)], axis=0
    )
    lead = jax.lax.broadcasted_iota(jnp.int32, ext.shape, 0)
    sign = jnp.where(lead % 2 == 0, jnp.float32(-1.0), jnp.float32(1.0))
    pre = jnp.sum(ext * ext_d, axis=0)  # (NB, H+B) antenna-combined
    pim = jnp.sum(sign * ext * swapped_d, axis=0)
    pw = jnp.sum(ext * ext, axis=0)

    # all three window sums share the same width: stack and run ONE ladder
    # (a third of the op issues; per-row arithmetic is bit-identical)
    z = jnp.stack([pre, pim, pw], axis=0)  # (3, NB, H+B)
    W = common.window_sum_guarded(z, L, guard=H)[..., H:]  # (3, NB, B)
    return W[0], W[1], W[2]


def _aa_metric_kernel(x_ref, pre_ref, pim_ref, r_ref, hist_ref, *, L, H):
    it = pl.program_id(1)

    @pl.when(it == 0)
    def _():
        hist_ref[...] = jnp.zeros_like(hist_ref)

    P_re, P_im, R = _aa_metric_rows(x_ref[...], hist_ref, L=L, H=H)
    pre_ref[...] = P_re
    pim_ref[...] = P_im
    r_ref[...] = R


@functools.partial(
    jax.jit,
    static_argnames=(
        "half_len", "block", "batch_tile", "channel_leading", "interpret"
    ),
)
def aa_metric_planar_pallas(
    iq: jax.Array,
    *,
    half_len: int,
    block: int = 4096,
    batch_tile: int = 8,
    channel_leading: bool = False,
    interpret: bool | None = None,
):
    """Fused [A][A] metric only: one VMEM-resident pass computing the full
    per-sample (P_re, P_im, R) arrays (each (batch, L)).

    The building block of the sharded multi-chip AA path
    (`parallel.shard.sharded_aa_detect_fused`), which needs per-sample
    values for the cross-shard gate/peak/CFO merge.  Input layouts as in
    `aa_detect_fused_pallas`."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    L = half_len
    if channel_leading:
        assert iq.ndim == 3, "channel_leading expects (C, batch, L)"
        C, batch, L_sig = iq.shape
        x, squeeze = iq.astype(jnp.float32), False
    else:
        x, batch, L_sig, squeeze = common.to_channel_leading(iq)
        C = x.shape[0]

    B = min(block, common.round_up(L_sig, _LANE))
    Lp = common.round_up(L_sig, B)
    NB = common.round_up(min(batch_tile, batch), 8)
    Np = common.round_up(batch, NB)
    H = common.round_up(max(2 * L, _LANE), _LANE)
    x = common.pad_channel_leading(x, Np, Lp)

    kernel = functools.partial(_aa_metric_kernel, L=L, H=H)
    out_spec = pl.BlockSpec((NB, B), lambda ib, it: (ib, it))
    outs = pl.pallas_call(
        kernel,
        grid=(Np // NB, Lp // B),
        in_specs=[pl.BlockSpec((C, NB, B), lambda ib, it: (0, ib, it))],
        out_specs=[out_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((Np, Lp), jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((C, NB, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x)
    res = tuple(o[:batch, :L_sig] for o in outs)
    if squeeze:
        res = tuple(o[0] for o in res)
    return res


def sc_metric_planar_pallas(
    iq: jax.Array,
    *,
    n_fft: int,
    block: int = 4096,
    batch_tile: int = 8,
    channel_leading: bool = False,
    interpret: bool | None = None,
):
    """Fused Schmidl-Cox metric (reference sc.py:42-78) on planar IQ.

    The S&C metric is the [A][A] lag-L=N/2 correlation re-indexed to window
    starts: ``P_sc(d) = conj(P_aa(d + N - 1))`` and
    ``R_sc(d) = R_aa(d + N - 1)`` (the reference's recursive update unrolls
    to the same two windowed sums) -- so this is a thin re-indexing wrapper
    over the fused AA metric kernel.  Returns (M, P_planar (..., 2, out),
    R), each of length L - N + 1 per stream, matching
    `ops.metrics.sc_metric` up to float association.
    """
    half = n_fft // 2
    P_re, P_im, R = aa_metric_planar_pallas(
        iq,
        half_len=half,
        block=block,
        batch_tile=batch_tile,
        channel_leading=channel_leading,
        interpret=interpret,
    )
    L_sig = P_re.shape[-1]
    out_len = max(L_sig - n_fft + 1, 0)
    sl = slice(n_fft - 1, n_fft - 1 + out_len)
    P_re, P_im, R = P_re[..., sl], -P_im[..., sl], R[..., sl]
    M = (P_re * P_re + P_im * P_im) / jnp.maximum(R, 1e-12) ** 2
    return M, jnp.stack([P_re, P_im], axis=-2), R


def minn_metric_planar_pallas(
    iq: jax.Array,
    *,
    n_fft: int,
    block: int = 4096,
    batch_tile: int = 8,
    channel_leading: bool = False,
    interpret: bool | None = None,
):
    """Fused standard-Minn metric (reference minn.py:59-112) on planar IQ.

    The identical-quarter correlations are the lag-Q=N/4 [A][A] windows at
    two taps: ``P(d) = conj(P_aa(d+2Q-1) + P_aa(d+4Q-1))`` and
    ``R(d) = R_aa(d+2Q-1) + R_aa(d+3Q-1) + R_aa(d+4Q-1)`` -- another thin
    re-indexing of the fused AA metric kernel.  Returns
    (M, P_planar (..., 2, out), R), each of length L - N + 1 per stream,
    matching `ops.metrics.minn_metric` up to float association.
    """
    Q = n_fft // 4
    P_re, P_im, R_aa = aa_metric_planar_pallas(
        iq,
        half_len=Q,
        block=block,
        batch_tile=batch_tile,
        channel_leading=channel_leading,
        interpret=interpret,
    )
    L_sig = P_re.shape[-1]
    out_len = max(L_sig - n_fft + 1, 0)

    def tap(a, off):
        return a[..., off - 1 : off - 1 + out_len]

    Pr = tap(P_re, 2 * Q) + tap(P_re, 4 * Q)
    Pi = -(tap(P_im, 2 * Q) + tap(P_im, 4 * Q))
    R = tap(R_aa, 2 * Q) + tap(R_aa, 3 * Q) + tap(R_aa, 4 * Q)
    aligned = jnp.clip(Pr, 0.0, None)
    M = aligned**2 / jnp.maximum(R, 1e-12) ** 2
    return M, jnp.stack([Pr, Pi], axis=-2), R


def _aa_kernel(
    *refs,
    L: int,
    H: int,
    B: int,
    NB: int,
    threshold: float,
    hysteresis: int,
    max_events: int,
    L_true: int,
    batch: int,
    tie_last: bool,
    emit_unclosed: bool,
    L_global: int | None = None,
    with_base: bool = False,
    with_init: bool = False,
    emit_state: bool = False,
):
    """Fused [A][A] metric + gate/peak FSM with CFO capture at the peak.

    Shard mode mirrors pallas_minn._detect_kernel: `with_base` prepends an
    SMEM scalar ref holding the shard's global base index (event indices
    and validity become global); `with_init` adds (hist_init, gate_init)
    input refs that prime the streaming scratch at grid step 0 -- the AA
    metric has no smoothing IIR, so priming needs no carry term.
    """
    i = 0
    if with_base:
        base = refs[i][0]
        i += 1
    else:
        base = None
    x_ref = refs[i]
    i += 1
    if with_init:
        hist_init_ref, gate_init_ref = refs[i : i + 2]
        i += 2
    if emit_state:
        (valid_ref, closed_ref, start_ref, close_ref, pidx_ref, pval_ref,
         meta_ref, pre_ref, pim_ref, mpk_ref, gate_out_ref, hist_ref,
         gate_ref, tstart_ref, tlast_ref, tpidx_ref, tpval_ref, spre_ref,
         spim_ref, sm_ref) = refs[i:]
    else:
        (valid_ref, closed_ref, start_ref, close_ref, pidx_ref, pval_ref,
         meta_ref, pre_ref, pim_ref, mpk_ref, hist_ref, gate_ref,
         tstart_ref, tlast_ref, tpidx_ref, tpval_ref, spre_ref, spim_ref,
         sm_ref) = refs[i:]
    it = pl.program_id(1)
    ib = pl.program_id(0)
    Lg = L_true if L_global is None else L_global

    @pl.when(it == 0)
    def _():
        common.event_scratch_init(
            gate_ref, tstart_ref, tlast_ref, tpidx_ref, tpval_ref,
            (spre_ref, spim_ref, sm_ref), tie_last=tie_last,
        )
        if with_init:
            hist_ref[...] = hist_init_ref[...]
            gl = jax.lax.broadcasted_iota(jnp.int32, gate_ref.shape, 1)
            gate_ref[...] = jnp.where(
                gl == 0,
                jnp.broadcast_to(
                    gate_init_ref[...][..., 0:1], gate_ref.shape
                ),
                jnp.where(
                    gl == 1,
                    jnp.broadcast_to(
                        gate_init_ref[...][..., 1:2], gate_ref.shape
                    ),
                    gate_ref[...],
                ),
            )
        else:
            hist_ref[...] = jnp.zeros_like(hist_ref)

    # Layout (C=2*BR, NB, time): channel rows LEADING so the tiled dims are
    # (NB=8, lanes) with zero sublane padding, and the row axis is the cheap
    # untiled leading dim.  Row order and lag-product math: _aa_metric_rows.
    P_re, P_im, R = _aa_metric_rows(x_ref[...], hist_ref, L=L, H=H)

    gi_local = it * B + jax.lax.broadcasted_iota(jnp.int32, P_re.shape, 1)
    gi = gi_local if base is None else gi_local + base
    valid = gi >= L  # global validity: interior shards' halo'd metric is live
    p_sq = P_re * P_re + P_im * P_im
    noise_floor = jnp.float32(1e-6 * L)
    eps = jnp.float32(1e-12)
    M = jnp.where(
        valid & (R > noise_floor),
        jnp.minimum(p_sq / jnp.maximum(R, eps) ** 2, 1.0),
        0.0,
    )
    above = valid & (M >= jnp.float32(threshold))
    row = ib * NB + jax.lax.broadcasted_iota(jnp.int32, above.shape, 0)
    above = above & (gi_local < L_true) & (row < batch)
    if base is not None:
        above = above & (gi < Lg)

    block_start = it * B if base is None else base + it * B
    # peak tracking stops at the LOCAL stream end in shard mode (padding
    # samples carry partial-window garbage |P|^2)
    track_end = Lg if base is None else jnp.minimum(jnp.int32(Lg),
                                                    base + L_true)
    # peak is tracked on |P|^2, NOT on M (reference sync_aa.py:522-529)
    common.event_update(
        above, p_sq, gi, it,
        B=B, hysteresis=hysteresis, max_events=max_events,
        tie_last=tie_last, L_true=track_end,
        gate_ref=gate_ref, tstart_ref=tstart_ref, tlast_ref=tlast_ref,
        tpidx_ref=tpidx_ref, tpval_ref=tpval_ref,
        extras=(P_re, P_im, M), extra_refs=(spre_ref, spim_ref, sm_ref),
        block_start=block_start,
    )

    @pl.when(it == pl.num_programs(1) - 1)
    def _():
        if emit_state:
            # gate FSM carry out (lane 0 = last-above global index,
            # lane 1 = cluster count) -- the AA metric has no IIR, so the
            # only other carried state is the IQ tail (the chunk itself)
            gate_out_ref[...] = gate_ref[...]
        common.event_finalize(
            valid_ref, closed_ref, start_ref, close_ref, pidx_ref, pval_ref,
            meta_ref, gate_ref, tstart_ref, tlast_ref, tpidx_ref, tpval_ref,
            (pre_ref, pim_ref, mpk_ref), (spre_ref, spim_ref, sm_ref),
            hysteresis=hysteresis, max_events=max_events, L_true=Lg,
            emit_unclosed=emit_unclosed,
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "half_len",
        "threshold",
        "hysteresis",
        "max_events",
        "tie",
        "emit_unclosed",
        "block",
        "batch_tile",
        "channel_leading",
        "interpret",
        "stream_len_global",
        "emit_state",
    ),
)
def aa_detect_fused_pallas(
    iq: jax.Array,
    *,
    half_len: int,
    threshold: float = 0.15,
    hysteresis: int = 128,
    max_events: int = 8,
    tie: str = "first",
    emit_unclosed: bool = True,
    block: int = 4096,
    batch_tile: int = 8,
    channel_leading: bool = False,
    interpret: bool | None = None,
    base_index: jax.Array | None = None,
    stream_len_global: int | None = None,
    shard_init: tuple | None = None,
    emit_state: bool = False,
):
    """Fully-fused [A][A] detection on planar float32 IQ.

    Streaming mode (`emit_state=True`, requires L % block == 0): a fourth
    return value gate_out (batch, 2) i32 [last-above global index, cluster
    count] -- together with the chunk's own trailing 2L samples this
    primes the NEXT chunk via `shard_init` (one kernel dispatch per chunk,
    kernel-exact continuity; see
    `kernels.streaming_chunked.aa_fused_stream_step`).

    Shard mode (used by `parallel.shard.sharded_aa_detect_fused`):
    `base_index` (dynamic int32 scalar) declares the global position of the
    block's first sample, `stream_len_global` the global length, and
    `shard_init` -- (hist_init (C, batch, <=H) IQ history rows, gate_init
    (batch, 2) [last-above global index, open-gate flag]) -- primes the
    streaming scratch so a seq shard continues exactly where its left
    neighbor ended.  The AA metric has no smoothing IIR, so no carry is
    needed.

    iq: (batch, branches, 2, L) or unbatched (branches, 2, L); with
    `channel_leading=True`, the framework-native branch-major
    (2*branches, batch, L) layout -- rows [b0_i, b0_q, b1_i, b1_q], shared
    with the Minn-RTL kernels -- which skips a full HBM transpose per call.
    Returns (GateEvents, P_at_peak, M_at_peak) with leading batch axes --
    everything a receiver needs for timing (peak - 2L + 1) and CFO
    (angle(P) fs / (2 pi L)).  P_at_peak is PLANAR float32 (..., 2, E)
    ([0]=re, [1]=im): the experimental axon TPU backend cannot transfer
    complex arrays to the host; combine with `from_planar` on the host side.
    """
    from ofdm_sync_tpu.ops.detect import GateEvents

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if max_events > _LANE:
        raise ValueError(f"max_events must be <= {_LANE}")

    L = half_len
    if channel_leading:
        assert iq.ndim == 3, "channel_leading expects (C, batch, L)"
        C, batch, L_sig = iq.shape
        x, squeeze = iq.astype(jnp.float32), False
    else:
        x, batch, L_sig, squeeze = common.to_channel_leading(iq)
        C = x.shape[0]

    B = min(block, common.round_up(L_sig, _LANE))
    Lp = common.round_up(L_sig, B)
    NB = common.round_up(min(batch_tile, batch), 8)
    Np = common.round_up(batch, NB)
    H = common.round_up(max(2 * L, _LANE), _LANE)
    x = common.pad_channel_leading(x, Np, Lp)

    with_base = base_index is not None
    with_init = shard_init is not None
    kernel = functools.partial(
        _aa_kernel,
        L=L,
        H=H,
        B=B,
        NB=NB,
        threshold=threshold,
        hysteresis=hysteresis,
        max_events=max_events,
        L_true=L_sig,
        batch=batch,
        tie_last=(tie == "last"),
        emit_unclosed=emit_unclosed,
        L_global=stream_len_global,
        with_base=with_base,
        with_init=with_init,
        emit_state=emit_state,
    )
    if emit_state and Lp != L_sig:
        raise ValueError(
            f"emit_state requires stream_len % block == 0; got L={L_sig}, "
            f"block={B}"
        )
    i32 = jnp.int32
    f32 = jnp.float32
    out_shape = [
        jax.ShapeDtypeStruct((Np, _LANE), jnp.uint8),  # valid
        jax.ShapeDtypeStruct((Np, _LANE), jnp.uint8),  # closed
        jax.ShapeDtypeStruct((Np, _LANE), i32),        # gate_start
        jax.ShapeDtypeStruct((Np, _LANE), i32),        # gate_close
        jax.ShapeDtypeStruct((Np, _LANE), i32),        # peak_idx
        jax.ShapeDtypeStruct((Np, _LANE), f32),        # peak_value (|P|^2)
        jax.ShapeDtypeStruct((Np, _LANE), i32),        # meta
        jax.ShapeDtypeStruct((Np, _LANE), f32),        # P_re at peak
        jax.ShapeDtypeStruct((Np, _LANE), f32),        # P_im at peak
        jax.ShapeDtypeStruct((Np, _LANE), f32),        # M at peak
    ]
    if emit_state:
        out_shape += [jax.ShapeDtypeStruct((Np, _LANE), i32)]  # gate_out
    ev_spec = pl.BlockSpec((NB, _LANE), lambda ib, it: (ib, 0))
    in_specs = [pl.BlockSpec((C, NB, B), lambda ib, it: (0, ib, it))]
    operands = [x]
    if with_init:
        hist_init, gate_init = shard_init
        # hist rows are RIGHT-aligned: hist[..., H-1] immediately precedes
        # the block (the kernel's ext = [hist, x])
        hlen = min(hist_init.shape[-1], H)
        hpad = jnp.zeros((C, Np, H), jnp.float32)
        hpad = hpad.at[:, :batch, H - hlen :].set(
            hist_init.astype(jnp.float32)[..., -hlen:]
        )
        gpad = jnp.full((Np, _LANE), -1, jnp.int32)
        gpad = gpad.at[:, 1].set(0)
        gpad = gpad.at[:batch, :2].set(gate_init.astype(jnp.int32))
        in_specs += [
            pl.BlockSpec((C, NB, H), lambda ib, it: (0, ib, 0)),
            pl.BlockSpec((NB, _LANE), lambda ib, it: (ib, 0)),
        ]
        operands += [hpad, gpad]
    if with_base:
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.insert(0, jnp.asarray(base_index, jnp.int32).reshape(1))
    outs = pl.pallas_call(
        kernel,
        grid=(Np // NB, Lp // B),
        in_specs=in_specs,
        out_specs=[ev_spec] * len(out_shape),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((C, NB, H), f32),            # IQ history
            pltpu.VMEM((NB, _LANE), i32),           # gate FSM carry
            pltpu.VMEM((NB, _LANE), i32),           # per-slot gate start
            pltpu.VMEM((NB, _LANE), i32),           # per-slot last above
            pltpu.VMEM((NB, _LANE), i32),           # per-slot peak idx
            pltpu.VMEM((NB, _LANE), f32),           # per-slot |P|^2 peak
            pltpu.VMEM((NB, _LANE), f32),           # per-slot P_re at peak
            pltpu.VMEM((NB, _LANE), f32),           # per-slot P_im at peak
            pltpu.VMEM((NB, _LANE), f32),           # per-slot M at peak
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    (valid, closed, gate_start, gate_close, peak_idx, peak_val, meta,
     p_re, p_im, m_pk) = [o[:batch] for o in outs[:10]]
    E = max_events
    table = GateEvents(
        valid=valid[:, :E].astype(bool),
        closed=closed[:, :E].astype(bool),
        gate_start=gate_start[:, :E],
        gate_close=gate_close[:, :E],
        peak_idx=peak_idx[:, :E],
        peak_value=peak_val[:, :E],
        count=meta[:, 0],
        overflow=meta[:, 1].astype(bool),
    )
    P_at_peak = jnp.stack([p_re[:, :E], p_im[:, :E]], axis=-2)  # (.., 2, E)
    M_at_peak = m_pk[:, :E]
    if squeeze:
        table = jax.tree.map(lambda a: a[0], table)
        P_at_peak = P_at_peak[0]
        M_at_peak = M_at_peak[0]
    if emit_state:
        gate_out = outs[10][:batch, :2]
        if squeeze:
            gate_out = gate_out[0]
        return table, P_at_peak, M_at_peak, gate_out
    return table, P_at_peak, M_at_peak
