"""Fused Pallas TPU kernel for the ZC streaming CFAR detector stage.

The reference's FPGA-friendly Zadoff-Chu detector (reference
zc_v2.py:119-158, 288-336) thresholds the matched-filter magnitude against a
local running average -- a CFAR test -- with an absolute floor and a long
hysteresis:

  above[n] = corr[n] * 2^frac >= running_sum_W(corr)[n] * thresh
             and corr[n] >= MIN_CORR_MAG,   valid from n >= W

followed by the standard gate/peak FSM (strongest event selected downstream,
reference zc_v2.py:567-576).  This kernel fuses the W-window running sum,
the two-sided threshold, and the in-VMEM event machinery into one pass over
the correlation-magnitude stream: one HBM read, an event table out.

The matched filter itself stays an XLA FFT convolution
(`ops.metrics.matched_filter`): at reference length 2048 the FFT form is
MXU/fusion-friendly and cheap relative to the CFAR scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ofdm_sync_tpu.kernels import pallas_common as common

_LANE = common.LANE


def _zc_kernel(
    *refs,
    W: int,
    H: int,
    B: int,
    NB: int,
    threshold_value: int,
    threshold_frac_bits: int,
    min_corr_mag: float,
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
    """CFAR threshold + gate/peak FSM.  Shard mode mirrors
    pallas_minn._detect_kernel: `with_base` prepends an SMEM scalar ref
    (global base index), `with_init` adds (hist_init, gate_init) refs that
    prime the magnitude history and gate FSM at grid step 0."""
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
         meta_ref, gate_out_ref, hist_ref, gate_ref, tstart_ref, tlast_ref,
         tpidx_ref, tpval_ref) = refs[i:]
    else:
        (valid_ref, closed_ref, start_ref, close_ref, pidx_ref, pval_ref,
         meta_ref, hist_ref, gate_ref, tstart_ref, tlast_ref, tpidx_ref,
         tpval_ref) = refs[i:]
    it = pl.program_id(1)
    ib = pl.program_id(0)
    Lg = L_true if L_global is None else L_global

    @pl.when(it == 0)
    def _():
        common.event_scratch_init(
            gate_ref, tstart_ref, tlast_ref, tpidx_ref, tpval_ref,
            tie_last=tie_last,
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

    x = x_ref[...]  # (NB, B) corr magnitude
    ext = jnp.concatenate([hist_ref[...], x], axis=-1)  # (NB, H+B)
    hist_ref[...] = ext[..., -H:]

    # guarded (wrap-roll) ladder: garbage < W - 1 <= H, sliced off here
    local_sum = common.window_sum_guarded(ext, W, guard=H)[..., H:]  # (NB, B)
    gi_local = it * B + jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    gi = gi_local if base is None else gi_local + base
    valid = gi >= W  # global warm-up: primed interior shards are live
    above = (
        valid
        & (x * jnp.float32(1 << threshold_frac_bits)
           >= local_sum * jnp.float32(threshold_value))
        & (x >= jnp.float32(min_corr_mag))
    )
    row = ib * NB + jax.lax.broadcasted_iota(jnp.int32, above.shape, 0)
    above = above & (gi_local < L_true) & (row < batch)
    if base is not None:
        above = above & (gi < Lg)

    block_start = it * B if base is None else base + it * B
    # peak tracking stops at the LOCAL stream end in shard mode (padding
    # samples are zeros; bounded for uniformity with the other kernels)
    track_end = Lg if base is None else jnp.minimum(jnp.int32(Lg),
                                                    base + L_true)
    common.event_update(
        above, x, gi, it,
        B=B, hysteresis=hysteresis, max_events=max_events,
        tie_last=tie_last, L_true=track_end,
        gate_ref=gate_ref, tstart_ref=tstart_ref, tlast_ref=tlast_ref,
        tpidx_ref=tpidx_ref, tpval_ref=tpval_ref,
        block_start=block_start,
    )

    @pl.when(it == pl.num_programs(1) - 1)
    def _():
        if emit_state:
            # gate FSM carry out (lane 0 = last-above global index,
            # lane 1 = cluster count); the magnitude history is the
            # chunk's own trailing W samples (caller-held input)
            gate_out_ref[...] = gate_ref[...]
        common.event_finalize(
            valid_ref, closed_ref, start_ref, close_ref, pidx_ref, pval_ref,
            meta_ref, gate_ref, tstart_ref, tlast_ref, tpidx_ref, tpval_ref,
            hysteresis=hysteresis, max_events=max_events, L_true=Lg,
            emit_unclosed=emit_unclosed,
        )


def _zc_iq_kernel(
    mf_ref,      # (C, NB, B) planar matched-filter output rows
    iq_ref,      # (C, NB, B) planar IQ rows (zero-padded past L_iq)
    valid_ref, closed_ref, start_ref, close_ref, pidx_ref, pval_ref,
    meta_ref,
    mhist_ref,   # (NB, H) corr-magnitude history (CFAR window)
    phist_ref,   # (BR, NB, HE) per-branch power history (energy window)
    gate_ref, tstart_ref, tlast_ref, tpidx_ref, tpval_ref,
    *,
    BR: int,
    W: int,
    R: int,
    H: int,
    HE: int,
    B: int,
    NB: int,
    ref_norm: float,
    threshold_value: int,
    threshold_frac_bits: int,
    min_corr_mag: float,
    hysteresis: int,
    max_events: int,
    L_true: int,
    L_iq: int,
    batch: int,
    tie_last: bool,
    emit_unclosed: bool,
):
    """From-IQ ZC detection in one pass: per-branch sliding energy +
    normalization + branch sum + magnitude + CFAR + event FSM, all in VMEM
    (reference zc_v2.py:244-336, 486-498).  The matched filter itself stays
    an XLA FFT convolution; everything downstream of it used to be five
    full-length HBM arrays (energy, denominator, normalized corr, branch
    sum, magnitude) -- this kernel materializes none of them.
    """
    it = pl.program_id(1)
    ib = pl.program_id(0)

    @pl.when(it == 0)
    def _():
        mhist_ref[...] = jnp.zeros_like(mhist_ref)
        phist_ref[...] = jnp.zeros_like(phist_ref)
        common.event_scratch_init(
            gate_ref, tstart_ref, tlast_ref, tpidx_ref, tpval_ref,
            tie_last=tie_last,
        )

    gi = it * B + jax.lax.broadcasted_iota(jnp.int32, (NB, B), 1)
    xiq = iq_ref[...]  # (2*BR, NB, B)
    # per-branch instantaneous power; samples past the true IQ length are
    # zero by the 'full'-conv energy alignment (sliding_energy_full)
    live = (gi < L_iq).astype(jnp.float32)
    p = jnp.stack(
        [
            (xiq[2 * b] * xiq[2 * b] + xiq[2 * b + 1] * xiq[2 * b + 1])
            for b in range(BR)
        ],
        axis=0,
    ) * live  # (BR, NB, B)
    pext = jnp.concatenate([phist_ref[...], p], axis=-1)  # (BR, NB, HE+B)
    phist_ref[...] = pext[..., -HE:]
    energy = common.window_sum_guarded(pext, R, guard=HE)[..., HE:]

    mf = mf_ref[...]
    denom = ref_norm * jnp.sqrt(jnp.maximum(energy, jnp.float32(1e-12)))
    inv = jnp.float32(1.0) / denom  # (BR, NB, B)
    re = sum(mf[2 * b] * inv[b] for b in range(BR))
    im = sum(mf[2 * b + 1] * inv[b] for b in range(BR))
    mag = jnp.sqrt(re * re + im * im)  # (NB, B)

    mext = jnp.concatenate([mhist_ref[...], mag], axis=-1)
    mhist_ref[...] = mext[..., -H:]
    local_sum = common.window_sum_guarded(mext, W, guard=H)[..., H:]
    valid = gi >= W
    above = (
        valid
        & (mag * jnp.float32(1 << threshold_frac_bits)
           >= local_sum * jnp.float32(threshold_value))
        & (mag >= jnp.float32(min_corr_mag))
    )
    row = ib * NB + jax.lax.broadcasted_iota(jnp.int32, above.shape, 0)
    above = above & (gi < L_true) & (row < batch)

    common.event_update(
        above, mag, gi, it,
        B=B, hysteresis=hysteresis, max_events=max_events,
        tie_last=tie_last, L_true=L_true,
        gate_ref=gate_ref, tstart_ref=tstart_ref, tlast_ref=tlast_ref,
        tpidx_ref=tpidx_ref, tpval_ref=tpval_ref,
    )

    @pl.when(it == pl.num_programs(1) - 1)
    def _():
        common.event_finalize(
            valid_ref, closed_ref, start_ref, close_ref, pidx_ref, pval_ref,
            meta_ref, gate_ref, tstart_ref, tlast_ref, tpidx_ref, tpval_ref,
            hysteresis=hysteresis, max_events=max_events, L_true=L_true,
            emit_unclosed=emit_unclosed,
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "corr_window",
        "ref_len",
        "ref_norm",
        "threshold_value",
        "threshold_frac_bits",
        "min_corr_mag",
        "hysteresis",
        "max_events",
        "tie",
        "emit_unclosed",
        "block",
        "batch_tile",
        "interpret",
    ),
)
def zc_iq_cfar_detect_pallas(
    mf: jax.Array,
    iq: jax.Array,
    *,
    ref_len: int,
    ref_norm: float,
    corr_window: int = 2048,
    threshold_value: int | None = None,
    threshold_frac_bits: int = 15,
    min_corr_mag: float = 0.3,
    hysteresis: int = 256,
    max_events: int = 16,
    tie: str = "first",
    emit_unclosed: bool = True,
    block: int = 4096,
    batch_tile: int = 8,
    interpret: bool | None = None,
):
    """From-IQ fused ZC detection (D7): matched-filter output in, GateEvents
    out, no full-length intermediates.

    mf: (2*BR, batch, Lc) planar 'full'-convolution matched-filter output
    rows [b0_re, b0_im, b1_re, b1_im] (Lc = L + ref_len - 1, from
    `ops.metrics.matched_filter`, kept planar for the axon backend);
    iq: (2*BR, batch, L) planar received IQ in the same row order.
    `ref_norm` = ||ref||_2.  Event indices cover the full correlation
    length Lc, matching `models.detectors.ZCStreamingDetector`'s XLA path
    (reference zc_v2.py:244-336, 486-498).
    """
    from ofdm_sync_tpu.ops.detect import GateEvents

    if threshold_value is None:
        threshold_value = int(
            4.0 * (1 << threshold_frac_bits) / corr_window
        )
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if max_events > _LANE:
        raise ValueError(f"max_events must be <= {_LANE}")

    C, batch, Lc = mf.shape
    BR = C // 2
    L_iq = iq.shape[-1]
    W = corr_window
    R = ref_len
    B = min(block, common.round_up(Lc, _LANE))
    Lp = common.round_up(Lc, B)
    NB = common.round_up(min(batch_tile, batch), 8)
    Np = common.round_up(batch, NB)
    H = common.round_up(max(W, _LANE), _LANE)
    HE = common.round_up(max(R, _LANE), _LANE)

    mfp = common.pad_channel_leading(mf.astype(jnp.float32), Np, Lp)
    iqp = common.pad_channel_leading(iq.astype(jnp.float32), Np, Lp)

    kernel = functools.partial(
        _zc_iq_kernel,
        BR=BR, W=W, R=R, H=H, HE=HE, B=B, NB=NB,
        ref_norm=float(ref_norm),
        threshold_value=threshold_value,
        threshold_frac_bits=threshold_frac_bits,
        min_corr_mag=min_corr_mag,
        hysteresis=hysteresis,
        max_events=max_events,
        L_true=Lc,
        L_iq=L_iq,
        batch=batch,
        tie_last=(tie == "last"),
        emit_unclosed=emit_unclosed,
    )
    i32 = jnp.int32
    out_shape = [
        jax.ShapeDtypeStruct((Np, _LANE), jnp.uint8),
        jax.ShapeDtypeStruct((Np, _LANE), jnp.uint8),
        jax.ShapeDtypeStruct((Np, _LANE), i32),
        jax.ShapeDtypeStruct((Np, _LANE), i32),
        jax.ShapeDtypeStruct((Np, _LANE), i32),
        jax.ShapeDtypeStruct((Np, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((Np, _LANE), i32),
    ]
    ev_spec = pl.BlockSpec((NB, _LANE), lambda ib, it: (ib, 0))
    outs = pl.pallas_call(
        kernel,
        grid=(Np // NB, Lp // B),
        in_specs=[
            pl.BlockSpec((C, NB, B), lambda ib, it: (0, ib, it)),
            pl.BlockSpec((C, NB, B), lambda ib, it: (0, ib, it)),
        ],
        out_specs=[ev_spec] * 7,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((NB, H), jnp.float32),
            pltpu.VMEM((BR, NB, HE), jnp.float32),
            pltpu.VMEM((NB, _LANE), i32),
            pltpu.VMEM((NB, _LANE), i32),
            pltpu.VMEM((NB, _LANE), i32),
            pltpu.VMEM((NB, _LANE), i32),
            pltpu.VMEM((NB, _LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(mfp, iqp)
    valid, closed, gate_start, gate_close, peak_idx, peak_val, meta = [
        o[:batch] for o in outs
    ]
    E = max_events
    return GateEvents(
        valid=valid[:, :E].astype(bool),
        closed=closed[:, :E].astype(bool),
        gate_start=gate_start[:, :E],
        gate_close=gate_close[:, :E],
        peak_idx=peak_idx[:, :E],
        peak_value=peak_val[:, :E],
        count=meta[:, 0],
        overflow=meta[:, 1].astype(bool),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "corr_window",
        "threshold_value",
        "threshold_frac_bits",
        "min_corr_mag",
        "hysteresis",
        "max_events",
        "tie",
        "emit_unclosed",
        "block",
        "batch_tile",
        "interpret",
        "stream_len_global",
        "emit_state",
    ),
)
def zc_cfar_detect_pallas(
    corr_mag: jax.Array,
    *,
    corr_window: int = 2048,
    threshold_value: int | None = None,
    threshold_frac_bits: int = 15,
    min_corr_mag: float = 0.3,
    hysteresis: int = 256,
    max_events: int = 16,
    tie: str = "first",
    emit_unclosed: bool = True,
    block: int = 4096,
    batch_tile: int = 8,
    interpret: bool | None = None,
    base_index: jax.Array | None = None,
    stream_len_global: int | None = None,
    shard_init: tuple | None = None,
    emit_state: bool = False,
):
    """CFAR threshold + gate/peak events over matched-filter magnitudes.

    Streaming mode (`emit_state=True`, requires L % block == 0): a second
    return value gate_out (batch, 2) i32 [last-above global index,
    cluster count] -- with the chunk's own trailing W magnitudes this
    primes the NEXT chunk via `shard_init` (see
    `kernels.streaming_chunked.zc_cfar_fused_stream_step`).

    corr_mag: (batch, L) or (L,) float32.  Returns GateEvents with a leading
    batch axis (or scalar-shaped when unbatched).  Defaults mirror
    `params.ZCStreamingParams` (reference zc_v2.py:119-158);
    `threshold_value=None` derives the reference's 4x-local-mean threshold
    from `corr_window` (the fixed-point value scales with 1/W because the
    compare is against the local SUM, not the mean).

    Shard mode (used by `parallel.shard.sharded_zc_cfar_detect`):
    `base_index` / `stream_len_global` / `shard_init` = (hist_init
    (batch, <=H) trailing magnitudes, gate_init (batch, 2)) -- same
    priming contract as the Minn/AA fused kernels.
    """
    from ofdm_sync_tpu.ops.detect import GateEvents

    if threshold_value is None:
        threshold_value = int(
            4.0 * (1 << threshold_frac_bits) / corr_window
        )
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if max_events > _LANE:
        raise ValueError(f"max_events must be <= {_LANE}")

    squeeze = corr_mag.ndim == 1
    if squeeze:
        corr_mag = corr_mag[None]
    batch, L_sig = corr_mag.shape
    x = corr_mag.astype(jnp.float32)

    W = corr_window
    B = min(block, common.round_up(L_sig, _LANE))
    Lp = common.round_up(L_sig, B)
    NB = common.round_up(min(batch_tile, batch), 8)
    Np = common.round_up(batch, NB)
    H = common.round_up(max(W, _LANE), _LANE)
    if Lp != L_sig or Np != batch:
        xp = jnp.zeros((Np, Lp), jnp.float32)
        x = xp.at[:batch, :L_sig].set(x)

    with_base = base_index is not None
    with_init = shard_init is not None
    kernel = functools.partial(
        _zc_kernel,
        W=W,
        H=H,
        B=B,
        NB=NB,
        threshold_value=threshold_value,
        threshold_frac_bits=threshold_frac_bits,
        min_corr_mag=min_corr_mag,
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
    out_shape = [
        jax.ShapeDtypeStruct((Np, _LANE), jnp.uint8),
        jax.ShapeDtypeStruct((Np, _LANE), jnp.uint8),
        jax.ShapeDtypeStruct((Np, _LANE), i32),
        jax.ShapeDtypeStruct((Np, _LANE), i32),
        jax.ShapeDtypeStruct((Np, _LANE), i32),
        jax.ShapeDtypeStruct((Np, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((Np, _LANE), i32),
    ]
    if emit_state:
        out_shape += [jax.ShapeDtypeStruct((Np, _LANE), i32)]
    ev_spec = pl.BlockSpec((NB, _LANE), lambda ib, it: (ib, 0))
    in_specs = [pl.BlockSpec((NB, B), lambda ib, it: (ib, it))]
    operands = [x]
    if with_init:
        hist_init, gate_init = shard_init
        hlen = min(hist_init.shape[-1], H)
        hpad = jnp.zeros((Np, H), jnp.float32)
        hpad = hpad.at[:batch, H - hlen :].set(
            hist_init.astype(jnp.float32)[..., -hlen:]
        )
        gpad = jnp.full((Np, _LANE), -1, jnp.int32)
        gpad = gpad.at[:, 1].set(0)
        gpad = gpad.at[:batch, :2].set(gate_init.astype(jnp.int32))
        in_specs += [
            pl.BlockSpec((NB, H), lambda ib, it: (ib, 0)),
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
            pltpu.VMEM((NB, H), jnp.float32),
            pltpu.VMEM((NB, _LANE), i32),
            pltpu.VMEM((NB, _LANE), i32),
            pltpu.VMEM((NB, _LANE), i32),
            pltpu.VMEM((NB, _LANE), i32),
            pltpu.VMEM((NB, _LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    valid, closed, gate_start, gate_close, peak_idx, peak_val, meta = [
        o[:batch] for o in outs[:7]
    ]
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
    if squeeze:
        table = jax.tree.map(lambda a: a[0], table)
    if emit_state:
        gate_out = outs[7][:batch, :2]
        if squeeze:
            gate_out = gate_out[0]
        return table, gate_out
    return table
