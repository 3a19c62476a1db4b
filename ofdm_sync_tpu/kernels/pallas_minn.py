"""Fused Pallas TPU kernel for the flagship Minn-RTL streaming metric.

One kernel pass computes, per 4096-sample time block held in VMEM:

  quarter product -> Q-window running sums -> Q/2Q delayed taps ->
  branch combine -> positive clip -> exponential smoothing IIR ->
  fixed-point threshold compare

i.e. the full datapath of the reference RTL detector
(reference ref/minn_antenna_path.sv:33-194 + ref/minn_preamble_detector.sv:
247-325, mirrored in software at reference minn_rtl.py:583-733), reading the
planar IQ stream from HBM exactly once and writing only the four metric
outputs.  The XLA path (`kernels.streaming.minn_rtl_metric_planar`)
materializes every intermediate (lag products, cumsums, scan temporaries) in
HBM; this kernel keeps them all on-chip, which matters because the metric is
HBM-bandwidth-bound.

TPU-native design notes:
  * Mosaic has no `cumsum` primitive; windowed running sums are built from a
    log-depth roll-shift doubling ladder (`w <- w + shiftz(w, 2^k)`) along the
    lane axis -- O(log Q) VPU passes, no serial loop, arbitrary window via the
    binary decomposition of Q.
  * The cross-block state of the streaming pipeline -- the last 3Q IQ samples
    (delay lines + running-sum windows + 2Q tap, reference
    ref/minn_delay_line.sv:49-78) and the smoothing accumulator (reference
    ref/minn_preamble_detector.sv:277-300) -- is carried in VMEM scratch
    across sequential grid steps, the Pallas analog of the RTL's BRAM state.
  * The smoothing IIR `s += (x - s) >> shift` is solved per block with a
    log-depth affine (Hillis-Steele) scan and stitched across blocks with the
    carried scalar, identical in exact arithmetic to the sequential loop.
  * Zero-initialized history at grid step 0 reproduces the RTL's
    zero-priming/fill semantics, so the warm-up behaviour (first valid metric
    at 3Q-1) matches the reference bit-for-bit in the float sense.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ofdm_sync_tpu.kernels import pallas_common as common
from ofdm_sync_tpu.kernels.streaming import MinnRTLFastState

_LANE = common.LANE
_round_up = common.round_up
_shiftz = common.shiftz


def _init_decay(dec_ref, alpha: float) -> None:
    """Fill dec_ref (NB, B) with ``dec[n] = (1-alpha)^(n+1)`` once (grid
    step 0); reused by every block's constant-coefficient smoothing scan."""
    d = jnp.full(dec_ref.shape, jnp.float32(1.0 - alpha))
    step = 1
    n = dec_ref.shape[-1]
    while step < n:
        d = d * _shiftz(d, step, fill=1.0)
        step *= 2
    dec_ref[...] = d


def _corr_energy_rows(x, hist_ref, *, Q: int, H: int):
    """Shared Minn-RTL correlation/energy datapath.  Returns
    (corr_positive, energy_total), each (NB, B); updates the IQ history
    scratch (reference ref/minn_antenna_path.sv:33-194).

    `x` may arrive as int16 ADC codes (the production RX format, reference
    int12 ADC front end): it is converted to f32 in-VMEM, so the HBM read
    moves half the bytes.  int16 values are exact in f32 -- bit-identical
    results to a pre-converted f32 input.

    Branch/plane combine FIRST (the RTL sums correlation and power across
    antennas, reference ref/minn_preamble_detector.sv:247-260; the I/Q plane
    sum is the real part of x * conj(x_delayed)) -- the window sums are
    linear, so combining early quarters the VPU work.
    The Q-delay is an unmasked wrap-roll: its garbage lanes (< Q) only ever
    reach window outputs < 3Q - 1 <= H, all inside the discarded ext head.
    corr + its Q-delayed tap is just a 2Q window sum of the quarter product;
    energy's three taps are a 3Q window sum of the power (window sums are
    linear) -- one guarded (wrap-roll) ladder each: total garbage
    < Q + (2Q - 1) resp. 3Q - 1, both <= H.
    """
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
    ext = jnp.concatenate([hist_ref[...], x], axis=-1)  # (C, NB, H+B)
    hist_ref[...] = ext[..., -H:]
    u = jnp.sum(ext * common.roll(ext, Q), axis=0)  # (NB, H+B) quarter prod
    p = jnp.sum(ext * ext, axis=0)  # (NB, H+B) instantaneous power
    if Q >= 1 and (Q & (Q - 1)) == 0:
        # power-of-two Q (the flagship): the 2Q and 3Q = 2Q + Q window
        # ladders share EVERY doubling -- run them jointly on a stacked
        # array (half the op issues; per-row arithmetic bit-identical):
        #   corr   = 2Q-span of u
        #   energy = Q-span of p + (2Q-span of p shifted by Q)
        z = jnp.stack([u, p], axis=0)  # (2, NB, H+B)
        d = 1
        while d < Q:
            z = z + common.roll(z, d)
            d *= 2
        p_q = z[1]                      # Q-span running sum of p
        z = z + common.roll(z, Q)       # both rows to 2Q span
        corr_total = z[0]
        energy_total = p_q + common.roll(z[1], Q)
    else:
        corr_total = common.window_sum_guarded(u, 2 * Q, guard=H)
        energy_total = common.window_sum_guarded(p, 3 * Q, guard=H)
    return jnp.maximum(corr_total[..., H:], 0.0), energy_total[..., H:]


def _corr_energy_kernel(x_ref, corr_ref, energy_ref, hist_ref, *, Q, H):
    @pl.when(pl.program_id(1) == 0)
    def _():
        hist_ref[...] = jnp.zeros_like(hist_ref)

    corr_pos, energy_out = _corr_energy_rows(x_ref[...], hist_ref, Q=Q, H=H)
    corr_ref[...] = corr_pos
    energy_ref[...] = energy_out


@functools.partial(
    jax.jit,
    static_argnames=(
        "quarter_len", "block", "batch_tile", "channel_leading", "interpret"
    ),
)
def minn_rtl_corr_energy_planar_pallas(
    iq: jax.Array,
    *,
    quarter_len: int,
    block: int = 4096,
    batch_tile: int = 8,
    channel_leading: bool = False,
    interpret: bool | None = None,
):
    """Fused Minn-RTL correlation/energy only: one VMEM-resident pass
    computing the full per-sample (corr_positive, energy_total) arrays.

    The building block of the sharded multi-chip path
    (`parallel.shard.sharded_minn_rtl_detect_fused`), which stitches the
    smoothing IIR and gating across shards itself and would otherwise
    discard the metric kernel's in-kernel scan.  Input layouts as in
    `minn_rtl_metric_planar_pallas`; returns (batch, L) arrays (or (L,)
    when unbatched)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if channel_leading:
        assert iq.ndim == 3, "channel_leading expects (C, batch, L)"
        C, batch, L = iq.shape
        # int16 ADC input is kept as-is (converted in-VMEM by the kernel)
        x = iq if iq.dtype == jnp.int16 else iq.astype(jnp.float32)
        squeeze = False
    else:
        x, batch, L, squeeze = _to_channel_leading(iq)
        C = x.shape[0]
    Q = quarter_len
    B = min(block, _round_up(L, _LANE))
    Lp = _round_up(L, B)
    NB = _round_up(min(batch_tile, batch), 8)
    Np = _round_up(batch, NB)
    H = _round_up(max(3 * Q, _LANE), _LANE)
    x = _pad_channel_leading(x, Np, Lp)

    kernel = functools.partial(_corr_energy_kernel, Q=Q, H=H)
    out_spec = pl.BlockSpec((NB, B), lambda ib, it: (ib, it))
    corr, energy = pl.pallas_call(
        kernel,
        grid=(Np // NB, Lp // B),
        in_specs=[pl.BlockSpec((C, NB, B), lambda ib, it: (0, ib, it))],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((Np, Lp), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((C, NB, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x)
    corr, energy = corr[:batch, :L], energy[:batch, :L]
    if squeeze:
        corr, energy = corr[0], energy[0]
    return corr, energy


def _metric_block(
    x,
    hist_ref,
    carry_ref,
    dec_ref,
    it,
    *,
    Q: int,
    H: int,
    B: int,
    alpha: float,
    valid_from: int,
    threshold_value: int,
    threshold_frac_bits: int,
    base=None,
):
    """Shared per-block metric datapath.  Returns (corr_pos, smooth,
    energy_out, above, gi), each (NB, B); updates hist/carry scratch.

    x and hist are laid out (C, NB, ...) -- channel rows LEADING -- so the
    tiled dims are (NB=8, lanes) with zero sublane padding; a (NB, C=4, ...)
    layout tiles (4, lanes) and wastes half the VPU on the ext-level passes.

    `base` (optional dynamic scalar) offsets the sample index to a GLOBAL
    stream position -- the sharded path runs this kernel per seq-shard on a
    halo-extended block, and both the warm-up freeze (`valid_from` compares
    globally, so shard 0's zero halo freezes exactly like the unsharded
    warm-up while interior shards' halos contribute to the smoothing scan)
    and the emitted event indices are then global.
    """
    corr_pos, energy_out = _corr_energy_rows(x, hist_ref, Q=Q, H=H)

    gi = it * B + jax.lax.broadcasted_iota(jnp.int32, corr_pos.shape, 1)
    if base is not None:
        gi = gi + base
    valid = gi >= valid_from

    # Smoothing IIR s[n] = (1-alpha) s[n-1] + alpha c[n].  The coefficient is
    # CONSTANT: the warm-up "freeze" (a=1 while invalid) only ever preserves
    # the initial zero state, and masking b to zero there preserves it too.
    # So the scan needs only the b updates with scalar powers of (1-alpha)
    # (half the work of the general affine scan), plus the precomputed decay
    # vector for the carried register.
    Bv = jnp.where(valid, jnp.float32(alpha) * corr_pos, jnp.float32(0.0))
    Bv = common.const_decay_scan(Bv, 1.0 - alpha)
    carry_in = carry_ref[..., :1]  # (NB, 1)
    smooth = dec_ref[...] * carry_in + Bv
    carry_ref[...] = jnp.broadcast_to(smooth[..., -1:], carry_ref.shape)

    scaled = smooth * jnp.float32(1 << threshold_frac_bits)
    above = valid & (scaled >= energy_out * jnp.float32(threshold_value))
    return corr_pos, smooth, energy_out, above, gi


def _minn_kernel(
    x_ref,
    corr_ref,
    smooth_ref,
    energy_ref,
    above_ref,
    hist_ref,
    carry_ref,
    dec_ref,
    *,
    Q: int,
    H: int,
    B: int,
    alpha: float,
    valid_from: int,
    threshold_value: int,
    threshold_frac_bits: int,
):
    it = pl.program_id(1)

    @pl.when(it == 0)
    def _():
        hist_ref[...] = jnp.zeros_like(hist_ref)
        carry_ref[...] = jnp.zeros_like(carry_ref)
        _init_decay(dec_ref, alpha)

    corr_pos, smooth, energy_out, above, _ = _metric_block(
        x_ref[...],
        hist_ref,
        carry_ref,
        dec_ref,
        it,
        Q=Q,
        H=H,
        B=B,
        alpha=alpha,
        valid_from=valid_from,
        threshold_value=threshold_value,
        threshold_frac_bits=threshold_frac_bits,
    )
    corr_ref[...] = corr_pos
    smooth_ref[...] = smooth
    energy_ref[...] = energy_out
    above_ref[...] = above.astype(jnp.uint8)


_to_channel_leading = common.to_channel_leading
_pad_channel_leading = common.pad_channel_leading


@functools.partial(
    jax.jit,
    static_argnames=(
        "quarter_len",
        "smooth_shift",
        "threshold_value",
        "threshold_frac_bits",
        "block",
        "batch_tile",
        "channel_leading",
        "interpret",
    ),
)
def minn_rtl_metric_planar_pallas(
    iq: jax.Array,
    *,
    quarter_len: int,
    smooth_shift: int,
    threshold_value: int,
    threshold_frac_bits: int,
    block: int = 4096,
    batch_tile: int = 8,
    channel_leading: bool = False,
    interpret: bool | None = None,
) -> MinnRTLFastState:
    """Fused-kernel equivalent of `streaming.minn_rtl_metric_planar`.

    iq: (batch, branches, 2, L) or (branches, 2, L) planar float32; with
    `channel_leading=True`, the kernel-native (2*branches, batch, L) layout
    (rows [b0_i, b0_q, b1_i, b1_q]), which skips a full HBM transpose.
    Returns MinnRTLFastState with per-stream (batch, L) arrays (or (L,) when
    unbatched); `above_threshold` is bool.  Matches the XLA path up to float
    reassociation of the window sums (tests assert tight tolerances).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    if channel_leading:
        assert iq.ndim == 3, "channel_leading expects (C, batch, L)"
        _, batch, L = iq.shape
        # int16 ADC input is kept as-is (converted in-VMEM by the kernel)
        x = iq if iq.dtype == jnp.int16 else iq.astype(jnp.float32)
        squeeze = False
    else:
        x, batch, L, squeeze = _to_channel_leading(iq)
    Q = quarter_len
    valid_from = max(0, 3 * Q - 1)
    alpha = 1.0 / (1 << smooth_shift) if smooth_shift > 0 else 1.0
    C = x.shape[0]

    B = min(block, _round_up(L, _LANE))
    Lp = _round_up(L, B)
    # Mosaic requires the sublane dim of 2-D output blocks to be a multiple
    # of 8 (or the full array dim); round the batch tile up and zero-pad.
    NB = _round_up(min(batch_tile, batch), 8)
    Np = _round_up(batch, NB)
    H = _round_up(max(3 * Q, _LANE), _LANE)

    x = _pad_channel_leading(x, Np, Lp)
    n_time = Lp // B
    n_batch = Np // NB

    kernel = functools.partial(
        _minn_kernel,
        Q=Q,
        H=H,
        B=B,
        alpha=alpha,
        valid_from=valid_from,
        threshold_value=threshold_value,
        threshold_frac_bits=threshold_frac_bits,
    )
    out_shape = [
        jax.ShapeDtypeStruct((Np, Lp), jnp.float32),
        jax.ShapeDtypeStruct((Np, Lp), jnp.float32),
        jax.ShapeDtypeStruct((Np, Lp), jnp.float32),
        jax.ShapeDtypeStruct((Np, Lp), jnp.uint8),
    ]
    out_spec = pl.BlockSpec((NB, B), lambda ib, it: (ib, it))
    corr, smooth, energy, above = pl.pallas_call(
        kernel,
        grid=(n_batch, n_time),
        in_specs=[pl.BlockSpec((C, NB, B), lambda ib, it: (0, ib, it))],
        out_specs=[out_spec, out_spec, out_spec, out_spec],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((C, NB, H), jnp.float32),
            pltpu.VMEM((NB, _LANE), jnp.float32),
            pltpu.VMEM((NB, B), jnp.float32),  # decay vector
        ],
        interpret=interpret,
    )(x)

    corr = corr[:batch, :L]
    smooth = smooth[:batch, :L]
    energy = energy[:batch, :L]
    above = above[:batch, :L].astype(bool)
    if squeeze:
        corr, smooth, energy, above = (
            corr[0],
            smooth[0],
            energy[0],
            above[0],
        )
    return MinnRTLFastState(
        corr_positive=corr,
        smooth_metric=smooth,
        energy_total=energy,
        above_threshold=above,
        valid_from=valid_from,
    )


def _detect_kernel(
    *refs,
    Q: int,
    H: int,
    B: int,
    NB: int,
    alpha: float,
    valid_from: int,
    threshold_value: int,
    threshold_frac_bits: int,
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
    """Fused metric + gate/hysteresis/peak FSM (reference
    ref/minn_preamble_detector.sv:337-384, minn_rtl.py:750-825).

    The FSM's closed form (see ops/detect.py): gates are clusters of
    above-runs with gaps <= h; the cross-block state is only (index of last
    above sample, number of clusters so far) plus the per-slot event table --
    all carried in VMEM scratch.  Blocks with no above samples and no open
    gate skip the whole event machinery (`pl.when`), so the common case costs
    exactly the metric datapath.

    Shard mode (`with_base=True`): the first ref is an SMEM scalar holding
    the shard's global base index, and `L_global` replaces `L_true` for
    close/clip semantics (indices in the emitted table are then global
    stream positions).

    Scratch-priming mode (`with_init=True`): three extra input refs follow
    the stream -- hist_init (C, NB, H) IQ history rows, carry_init
    (NB, LANE) smoothing carry (lane 0), gate_init (NB, LANE) i32 gate FSM
    carry (lane 0 = last-above global index, lane 1 = open-gate flag) --
    and initialize the kernel's streaming state at grid step 0 instead of
    zeros.  This is how the sharded path primes each seq shard from its
    halo WITHOUT concatenating halo+stream in HBM.
    """
    i = 0
    if with_base:
        base_ref = refs[i]
        base = base_ref[0]
        i += 1
    else:
        base = None
    x_ref = refs[i]
    i += 1
    if with_init:
        hist_init_ref, carry_init_ref, gate_init_ref = refs[i : i + 3]
        i += 3
    if emit_state:
        (valid_ref, closed_ref, start_ref, close_ref, pidx_ref, pval_ref,
         meta_ref, carry_out_ref, gate_out_ref, hist_ref, carry_ref,
         dec_ref, gate_ref, tstart_ref, tlast_ref, tpidx_ref,
         tpval_ref) = refs[i:]
    else:
        (valid_ref, closed_ref, start_ref, close_ref, pidx_ref, pval_ref,
         meta_ref, hist_ref, carry_ref, dec_ref, gate_ref, tstart_ref,
         tlast_ref, tpidx_ref, tpval_ref) = refs[i:]
    it = pl.program_id(1)
    ib = pl.program_id(0)
    Lg = L_true if L_global is None else L_global

    @pl.when(it == 0)
    def _():
        _init_decay(dec_ref, alpha)
        common.event_scratch_init(
            gate_ref, tstart_ref, tlast_ref, tpidx_ref, tpval_ref,
            tie_last=tie_last,
        )
        if with_init:
            hist_ref[...] = hist_init_ref[...]
            carry_ref[...] = jnp.broadcast_to(
                carry_init_ref[...][..., 0:1], carry_ref.shape
            )
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
            carry_ref[...] = jnp.zeros_like(carry_ref)

    corr_pos, _smooth, _energy, above, gi = _metric_block(
        x_ref[...],
        hist_ref,
        carry_ref,
        dec_ref,
        it,
        Q=Q,
        H=H,
        B=B,
        alpha=alpha,
        valid_from=valid_from,
        threshold_value=threshold_value,
        threshold_frac_bits=threshold_frac_bits,
        base=base,
    )
    # mask stream-length padding and batch padding rows (local indices),
    # the halo head in shard mode, and the global stream tail
    gi_local = it * B + jax.lax.broadcasted_iota(jnp.int32, above.shape, 1)
    row = ib * NB + jax.lax.broadcasted_iota(jnp.int32, above.shape, 0)
    above = above & (gi_local < L_true) & (row < batch)
    if base is not None:
        above = above & (gi < Lg)

    block_start = it * B if base is None else base + it * B
    # peak tracking must stop at this shard's LOCAL stream end (padding
    # samples carry partial-window garbage); close/validity semantics keep
    # the global length in event_finalize
    track_end = Lg if base is None else jnp.minimum(jnp.int32(Lg),
                                                    base + L_true)
    common.event_update(
        above, corr_pos, gi, it,
        B=B, hysteresis=hysteresis, max_events=max_events,
        tie_last=tie_last, L_true=track_end,
        gate_ref=gate_ref, tstart_ref=tstart_ref, tlast_ref=tlast_ref,
        tpidx_ref=tpidx_ref, tpval_ref=tpval_ref,
        block_start=block_start,
    )

    # The event-table outputs map every time step to the same block, so only
    # the final step's write reaches HBM -- skip the finalize math elsewhere.
    @pl.when(it == pl.num_programs(1) - 1)
    def _():
        if emit_state:
            # carried streaming state OUT (kernel-exact, no XLA re-derive):
            # smoothing IIR value at the final true sample + the gate FSM
            # carry (lane 0 = last-above global index, lane 1 = cluster
            # count).  event_finalize mutates nothing these read, but write
            # first anyway to keep the contract order-independent.
            carry_out_ref[...] = carry_ref[...]
            gate_out_ref[...] = gate_ref[...]
        common.event_finalize(
            valid_ref, closed_ref, start_ref, close_ref, pidx_ref, pval_ref,
            meta_ref, gate_ref, tstart_ref, tlast_ref, tpidx_ref, tpval_ref,
            hysteresis=hysteresis, max_events=max_events, L_true=Lg,
            emit_unclosed=emit_unclosed,
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "quarter_len",
        "smooth_shift",
        "threshold_value",
        "threshold_frac_bits",
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
def minn_rtl_detect_fused_pallas(
    iq: jax.Array,
    *,
    quarter_len: int,
    smooth_shift: int,
    threshold_value: int,
    threshold_frac_bits: int,
    hysteresis: int,
    max_events: int = 8,
    tie: str = "last",
    emit_unclosed: bool = False,
    block: int = 4096,
    batch_tile: int = 8,
    channel_leading: bool = False,
    interpret: bool | None = None,
    base_index: jax.Array | None = None,
    stream_len_global: int | None = None,
    shard_init: tuple | None = None,
    emit_state: bool = False,
):
    """Fully-fused Minn-RTL detection: IQ in, GateEvents out, nothing else
    touches HBM.  Semantically identical to `minn_rtl_metric_planar_pallas`
    followed by `ops.detect.extract_gate_events` (tests assert equality).

    iq: (batch, branches, 2, L) planar float32 (or unbatched
    (branches, 2, L)); with `channel_leading=True`, the kernel-native
    (2*branches, batch, L) layout (see `minn_rtl_metric_planar_pallas`).

    Shard mode (used by `parallel.shard.sharded_minn_rtl_detect_fused`):
    `base_index` -- a dynamic int32 scalar -- declares the global stream
    position of the block's first sample and `stream_len_global` supplies
    the global length for close/validity semantics.  Emitted indices are then global.  `shard_init` --
    (hist_init (C, batch, H), carry_init (batch,), gate_init (batch, 2)
    [last-above global index, open-gate flag]) -- primes the kernel's
    streaming scratch at grid step 0, so a seq shard starts exactly where
    its left neighbor ended without concatenating halo+stream in HBM (see
    `parallel.shard.sharded_minn_rtl_detect_fused`).

    Streaming mode (`emit_state=True`, requires L % block == 0): two extra
    outputs are returned -- carry_out (batch_padded, LANE) f32, the
    smoothing IIR value at the final sample (lane-broadcast), and gate_out
    (batch_padded, LANE) i32, the gate FSM carry (lane 0 = last-above
    global index, lane 1 = cluster count).  Together with the chunk's own
    trailing 3Q samples these prime the NEXT chunk via `shard_init`, so a
    live receiver runs ONE kernel dispatch per chunk with kernel-exact
    state continuity (no XLA re-derivation; see
    `kernels.streaming_chunked.minn_rtl_fused_stream_step`).  Returns
    ``(GateEvents, (carry_out, gate_out))`` in this mode.
    """
    from ofdm_sync_tpu.ops.detect import GateEvents

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if max_events > _LANE:
        raise ValueError(f"max_events must be <= {_LANE}")

    if channel_leading:
        assert iq.ndim == 3, "channel_leading expects (C, batch, L)"
        _, batch, L = iq.shape
        # int16 ADC input is kept as-is (converted in-VMEM by the kernel)
        x = iq if iq.dtype == jnp.int16 else iq.astype(jnp.float32)
        squeeze = False
    else:
        x, batch, L, squeeze = _to_channel_leading(iq)
    Q = quarter_len
    valid_from = max(0, 3 * Q - 1)
    alpha = 1.0 / (1 << smooth_shift) if smooth_shift > 0 else 1.0

    C = x.shape[0]
    B = min(block, _round_up(L, _LANE))
    Lp = _round_up(L, B)
    NB = _round_up(min(batch_tile, batch), 8)
    Np = _round_up(batch, NB)
    H = _round_up(max(3 * Q, _LANE), _LANE)
    x = _pad_channel_leading(x, Np, Lp)

    with_base = base_index is not None
    with_init = shard_init is not None
    kernel = functools.partial(
        _detect_kernel,
        Q=Q,
        H=H,
        B=B,
        NB=NB,
        alpha=alpha,
        valid_from=valid_from,
        threshold_value=threshold_value,
        threshold_frac_bits=threshold_frac_bits,
        hysteresis=hysteresis,
        max_events=max_events,
        L_true=L,
        batch=batch,
        tie_last=(tie == "last"),
        emit_unclosed=emit_unclosed,
        L_global=stream_len_global,
        with_base=with_base,
        with_init=with_init,
        emit_state=emit_state,
    )
    if emit_state and Lp != L:
        raise ValueError(
            f"emit_state requires stream_len % block == 0 (the carried "
            f"smoothing state must end on a true sample); got L={L}, "
            f"block={B}"
        )
    i32 = jnp.int32
    out_shape = [
        jax.ShapeDtypeStruct((Np, _LANE), jnp.uint8),   # valid
        jax.ShapeDtypeStruct((Np, _LANE), jnp.uint8),   # closed
        jax.ShapeDtypeStruct((Np, _LANE), i32),         # gate_start
        jax.ShapeDtypeStruct((Np, _LANE), i32),         # gate_close
        jax.ShapeDtypeStruct((Np, _LANE), i32),         # peak_idx
        jax.ShapeDtypeStruct((Np, _LANE), jnp.float32), # peak_value
        jax.ShapeDtypeStruct((Np, _LANE), i32),         # meta: count, overflow
    ]
    if emit_state:
        out_shape += [
            jax.ShapeDtypeStruct((Np, _LANE), jnp.float32),  # carry_out
            jax.ShapeDtypeStruct((Np, _LANE), i32),          # gate_out
        ]
    ev_spec = pl.BlockSpec((NB, _LANE), lambda ib, it: (ib, 0))
    in_specs = [pl.BlockSpec((C, NB, B), lambda ib, it: (0, ib, it))]
    operands = [x]
    if with_init:
        hist_init, carry_init, gate_init = shard_init
        # hist rows are RIGHT-aligned: hist[..., H-1] is the sample
        # immediately preceding the block (the kernel's ext = [hist, x])
        hlen = min(hist_init.shape[-1], H)
        hpad = jnp.zeros((C, Np, H), jnp.float32)
        hpad = hpad.at[:, :batch, H - hlen :].set(
            hist_init.astype(jnp.float32)[..., -hlen:]
        )
        cpad = jnp.zeros((Np, _LANE), jnp.float32)
        cpad = cpad.at[:batch, 0].set(carry_init.astype(jnp.float32))
        gpad = jnp.full((Np, _LANE), -1, i32)
        gpad = gpad.at[:, 1].set(0)
        gpad = gpad.at[:batch, :2].set(gate_init.astype(i32))
        in_specs += [
            pl.BlockSpec((C, NB, H), lambda ib, it: (0, ib, 0)),
            pl.BlockSpec((NB, _LANE), lambda ib, it: (ib, 0)),
            pl.BlockSpec((NB, _LANE), lambda ib, it: (ib, 0)),
        ]
        operands += [hpad, cpad, gpad]
    if with_base:
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.insert(
            0, jnp.asarray(base_index, jnp.int32).reshape(1)
        )
    outs = pl.pallas_call(
        kernel,
        grid=(Np // NB, Lp // B),
        in_specs=in_specs,
        out_specs=[ev_spec] * len(out_shape),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((C, NB, H), jnp.float32),     # IQ history
            pltpu.VMEM((NB, _LANE), jnp.float32),    # smoothing carry
            pltpu.VMEM((NB, B), jnp.float32),        # decay vector
            pltpu.VMEM((NB, _LANE), i32),            # gate FSM carry
            pltpu.VMEM((NB, _LANE), i32),            # per-slot gate start
            pltpu.VMEM((NB, _LANE), i32),            # per-slot last above
            pltpu.VMEM((NB, _LANE), i32),            # per-slot peak idx
            pltpu.VMEM((NB, _LANE), jnp.float32),    # per-slot peak value
        ],
        # the event machinery's worst-case temporaries push the static VMEM
        # stack past Mosaic's conservative 16M default; the hardware has more
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
        carry_out = outs[7][:batch, 0]          # (batch,) smooth at end
        gate_out = outs[8][:batch, :2]          # (batch, 2) [la, count]
        if squeeze:
            carry_out, gate_out = carry_out[0], gate_out[0]
        return table, (carry_out, gate_out)
    return table


def minn_rtl_detect_planar_pallas(
    iq: jax.Array,
    *,
    quarter_len: int,
    smooth_shift: int,
    threshold_value: int,
    threshold_frac_bits: int,
    hysteresis: int,
    max_events: int = 8,
    block: int = 4096,
    batch_tile: int = 8,
    interpret: bool | None = None,
):
    """Batched fused metric (Pallas) + gate/peak event extraction.

    iq: (batch, branches, 2, L) planar float32.  Returns
    (MinnRTLFastState, GateEvents) with leading batch axes -- the batched
    fused-kernel counterpart of `streaming.minn_rtl_detect_planar`.
    """
    from ofdm_sync_tpu.ops.detect import extract_gate_events

    state = minn_rtl_metric_planar_pallas(
        iq,
        quarter_len=quarter_len,
        smooth_shift=smooth_shift,
        threshold_value=threshold_value,
        threshold_frac_bits=threshold_frac_bits,
        block=block,
        batch_tile=batch_tile,
        interpret=interpret,
    )
    extract = lambda a, c: extract_gate_events(  # noqa: E731
        a,
        c,
        hysteresis=hysteresis,
        max_events=max_events,
        valid_from=state.valid_from,
        tie="last",
        emit_unclosed=False,
    )
    if iq.ndim == 4:
        table = jax.vmap(extract)(state.above_threshold, state.corr_positive)
    else:
        table = extract(state.above_threshold, state.corr_positive)
    return state, table
