"""Time-major fused Pallas kernel for the flagship Minn-RTL detector.

The lane-major kernel (`pallas_minn`) is VPU-issue-bound: its windowed-sum
and smoothing ladders need seven sub-lane shifts each, and a sub-lane lane
roll costs ~3x a vector add on this hardware (measured, tools/perf_probe6).
This kernel transposes the problem: **time runs down the sublane (row) axis,
128 parallel streams occupy the lanes**.  Every time shift then becomes a
sublane concatenation -- free for multiples of 8 rows and cheap even for
1/2/4 -- which removes the dominant ALU cost and puts the kernel at the HBM
input floor (measured ~18.5 G samples/s vs ~12.1 G lane-major on the same
workload, tools/perf_probe7).

Input layout -- the TPU-native **tiled stream buffer**:

    x[(g * NT + t), c * R + r, s]  =  stream (g*128 + s), channel plane c,
                                      sample (t * R + r)

i.e. shape (G * NT, C * R, 128): G groups of 128 streams, NT time blocks of
R samples, C = 2 * branches planar channel rows [b0_i, b0_q, b1_i, b1_q]
stacked row-major inside each block.  A production ingest DMA writes this
directly (sample t of all 128 streams is one row); `to_time_tiled` /
`from_time_tiled` convert from the channel-leading layout (one HBM
transpose, for callers that hold (C, batch, L)).

Per grid step the kernel consumes R rows x 128 streams, runs the full RTL
datapath (quarter products -> joint corr/energy window ladders ->
constant-decay smoothing -> fixed-point threshold -> gate/hysteresis/peak
FSM) entirely in VMEM, and emits only the per-stream event tables.  The
arithmetic mirrors `pallas_minn` step for step (same reduction trees, same
guard proofs with rows in place of lanes), so results are bit-identical to
the lane-major kernel.

Reference parity: ref/minn_antenna_path.sv:33-194,
ref/minn_preamble_detector.sv:247-384, minn_rtl.py:583-825.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ofdm_sync_tpu.kernels import pallas_tm_common as tm

LANES = tm.LANES
_round_up = tm.round_up
_rshift = tm.rshift
_rshift_zero = tm.rshift_zero
_row_iota = tm.row_iota

# re-exported layout converters (public API of the tiled stream buffer)
to_time_tiled = tm.to_time_tiled
from_time_tiled = tm.from_time_tiled


def _tm_kernel(
    *refs,
    # ref order: [base (SMEM, shard mode)] x_ref [hist_init, carry_init,
    # gate_init (shard-init mode)] then outputs + scratch:
    #   x_ref      (1, C*R, LANES) input block
    #   valid/closed/start/close/pidx/pval/meta: event-table outputs
    #   hist_ref   (C*HR, LANES) carried IQ history rows
    #   carry_ref  (8, LANES) f32: row 0 = smoothing carry
    #   dvec_ref   (R, 1) f32: decay^(t+1) for the carry term
    #   gate_ref   (8, LANES) i32: row 0 = last_above, row 1 = cluster count
    #   tstart/tlast/tpidx/tpval (SLOTR, LANES) slots
    C: int,
    R: int,
    HR: int,
    Q: int,
    alpha: float,
    valid_from: int,
    threshold_value: int,
    threshold_frac_bits: int,
    hysteresis: int,
    max_events: int,
    L_true: int,
    batch_last: int,
    tie_last: bool,
    emit_unclosed: bool,
    L_global: int | None = None,
    with_base: bool = False,
    with_init: bool = False,
):
    i = 0
    if with_base:
        base = refs[i][0]
        i += 1
    else:
        base = None
    x_ref = refs[i]
    i += 1
    if with_init:
        hist_init_ref, carry_init_ref, gate_init_ref = refs[i : i + 3]
        i += 3
    (valid_ref, closed_ref, start_ref, close_ref, pidx_ref, pval_ref,
     meta_ref, hist_ref, carry_ref, dvec_ref, gate_ref, tstart_ref,
     tlast_ref, tpidx_ref, tpval_ref) = refs[i:]
    it = pl.program_id(1)
    decay = 1.0 - alpha
    Lg = L_true if L_global is None else L_global

    @pl.when(it == 0)
    def _():
        # decay^(t+1) by repeated squaring (matches the lane kernel's
        # _init_decay product exactly)
        d = jnp.full((R, 1), jnp.float32(decay))
        step = 1
        while step < R:
            d = d * jnp.concatenate(
                [jnp.ones((step, 1), jnp.float32), d[: R - step]], axis=0
            )
            step *= 2
        dvec_ref[...] = d
        tm.event_scratch_init(
            gate_ref, tstart_ref, tlast_ref, tpidx_ref, tpval_ref,
            tie_last=tie_last,
        )
        if with_init:
            # shard-init mode: prime the streaming scratch from the
            # neighbor shard's halo (same contract as pallas_minn's
            # shard_init -- see minn_rtl_detect_fused_tm docstring)
            hist_ref[...] = hist_init_ref[0]
            carry_ref[...] = carry_init_ref[0]
            gate_ref[...] = gate_init_ref[0]
        else:
            hist_ref[...] = jnp.zeros_like(hist_ref)
            carry_ref[...] = jnp.zeros_like(carry_ref)

    x = x_ref[0]  # (C*R, LANES)
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)

    # --- metric datapath (rows = time) ---------------------------------
    # Per-channel ext with HR history rows; u/p combined across channels.
    # Mirrors pallas_minn._corr_energy_rows: the lag-Q shift's wrap garbage
    # stays in rows < Q + HR-head, discarded with the [HR:] slice; window
    # ladders' cumulative wrap < 3Q - 1 <= HR likewise.
    u = None
    p = None
    new_hist = []
    for c in range(C):
        xc = x[c * R : (c + 1) * R]
        ext = jnp.concatenate([hist_ref[c * HR : (c + 1) * HR], xc], axis=0)
        new_hist.append(ext[-HR:])
        uc = ext * _rshift(ext, Q)
        pc = ext * ext
        u = uc if u is None else u + uc
        p = pc if p is None else p + pc
    hist_ref[...] = jnp.concatenate(new_hist, axis=0)

    if Q >= 1 and (Q & (Q - 1)) == 0:
        # power-of-two Q: the 2Q and 3Q window ladders share every doubling
        # (same joint form as pallas_minn._corr_energy_rows)
        z = jnp.stack([u, p], axis=0)  # (2, HR+R, LANES)
        d = 1
        while d < Q:
            z = z + _rshift(z, d)
            d *= 2
        p_q = z[1]
        z = z + _rshift(z, Q)
        corr_pos = jnp.maximum(z[0][HR:], 0.0)
        energy_out = (p_q + _rshift(z[1], Q))[HR:]
    else:
        # general Q: binary-decomposition window sums (wrap garbage
        # < window - 1 <= HR, discarded with the [HR:] slice)
        corr_pos = jnp.maximum(tm.window_sum_rows(u, 2 * Q)[HR:], 0.0)
        energy_out = tm.window_sum_rows(p, 3 * Q)[HR:]

    gi_local = it * R + _row_iota(R)  # (R, 1) local sample index
    gi_col = gi_local if base is None else gi_local + base  # global index
    validc = gi_col >= valid_from   # column mask, broadcasts over lanes

    # --- constant-decay smoothing scan down rows -----------------------
    # Same truncation bound as pallas_common.const_decay_scan (skip steps
    # with decay**step <= 2^-45; sub-ulp).  Guard: cumulative wrap < 2*128.
    Bv = jnp.where(validc, jnp.float32(alpha) * corr_pos, 0.0)
    GR = 256
    cutoff = 2.0**-45
    Bv = jnp.concatenate([jnp.zeros((GR, LANES), jnp.float32), Bv], axis=0)
    step = 1
    # wrap-concat phase: cumulative corruption over steps 1..GR/2 is
    # < GR rows, strictly inside the zero guard
    while step < GR and np.float32(decay**step) > cutoff:
        Bv = _rshift(Bv, step) * jnp.float32(decay**step) + Bv
        step *= 2
    if step < R and np.float32(decay**step) > cutoff:
        # re-zero the (corrupted) guard, continue with zero-fill shifts
        grow = _row_iota(R + GR)
        Bv = jnp.where(grow >= GR, Bv, 0.0)
        while step < R and np.float32(decay**step) > cutoff:
            Bv = _rshift_zero(Bv, step, 0.0) * jnp.float32(decay**step) + Bv
            step *= 2
    Bv = Bv[GR:]
    smooth = dvec_ref[...] * carry_ref[0:1, :] + Bv
    carry_ref[0:1, :] = smooth[R - 1 : R]

    scaled = smooth * jnp.float32(1 << threshold_frac_bits)
    above = validc & (scaled >= energy_out * jnp.float32(threshold_value))
    above = above & (gi_local < L_true)
    if base is not None:
        above = above & (gi_col < Lg)
    if batch_last < LANES:
        # zero-padded streams in the last group trivially sit above
        # threshold (0 >= 0); mask them so they neither emit events nor
        # keep the event machinery resident on every block
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        above = above & (
            (pl.program_id(0) < pl.num_programs(0) - 1)
            | (lane < batch_last)
        )

    # peak tracking must stop at this shard's LOCAL stream end (padding
    # rows carry partial-window garbage); close/validity semantics keep the
    # global length in event_finalize (mirrors pallas_minn._detect_kernel)
    block_start = it * R if base is None else base + it * R
    track_end = Lg if base is None else jnp.minimum(
        jnp.int32(Lg), base + L_true
    )
    tm.event_update(
        above, corr_pos, gi_col, block_start,
        R=R, hysteresis=hysteresis, max_events=max_events,
        tie_last=tie_last, L_true=track_end,
        gate_ref=gate_ref, tstart_ref=tstart_ref, tlast_ref=tlast_ref,
        tpidx_ref=tpidx_ref, tpval_ref=tpval_ref,
    )

    @pl.when(it == pl.num_programs(1) - 1)
    def _():
        tm.event_finalize(
            valid_ref, closed_ref, start_ref, close_ref, pidx_ref, pval_ref,
            meta_ref, gate_ref, tstart_ref, tlast_ref, tpidx_ref, tpval_ref,
            hysteresis=hysteresis, max_events=max_events, L_true=Lg,
            emit_unclosed=emit_unclosed,
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "quarter_len", "smooth_shift", "threshold_value",
        "threshold_frac_bits", "hysteresis", "max_events", "tie",
        "emit_unclosed", "rows", "stream_len", "batch", "interpret",
        "stream_len_global", "in_block_stride", "in_block_offset",
    ),
)
def minn_rtl_detect_fused_tm(
    x_tiled: jax.Array,
    *,
    quarter_len: int,
    smooth_shift: int,
    threshold_value: int,
    threshold_frac_bits: int,
    hysteresis: int,
    stream_len: int,
    batch: int,
    max_events: int = 8,
    tie: str = "last",
    emit_unclosed: bool = False,
    rows: int = 8192,
    interpret: bool | None = None,
    base_index: jax.Array | None = None,
    stream_len_global: int | None = None,
    shard_init: tuple | None = None,
    in_block_stride: int | None = None,
    in_block_offset: int = 0,
):
    """Fully-fused time-major Minn-RTL detection on a tiled stream buffer.

    x_tiled: (G*NT, C*rows, 128) float32 or int16 (see module docstring;
    build with `to_time_tiled` or ingest directly).  `stream_len` is the
    true per-stream length L (padding rows are masked), `batch` the true
    stream count.  Returns `GateEvents` with (batch, max_events) tables --
    the same semantics as `pallas_minn.minn_rtl_detect_fused_pallas`.

    Shard mode: identical contract to the lane-major kernel's
    (`pallas_minn.minn_rtl_detect_fused_pallas`), so the sharded wrapper
    primes both the same way.  `base_index` (dynamic int32 scalar) is the
    global stream position of this shard's first sample;
    `stream_len_global` the global length for close/validity semantics;
    `shard_init` = (hist_init (C, batch, Wh) right-aligned IQ history,
    carry_init (batch,) smoothing carry, gate_init (batch, 2)
    [last-above global index, open-gate flag]) primes the streaming
    scratch at grid step 0.  Emitted indices are then global.
    """
    from ofdm_sync_tpu.ops.detect import GateEvents

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    R = rows
    nblk, CR, lanes = x_tiled.shape
    assert lanes == LANES, f"tiled buffer must have {LANES} lanes"
    C = CR // R
    assert C * R == CR, (C, R, CR)
    NT = _round_up(stream_len, R) // R
    # in_block_stride/in_block_offset: process NT consecutive blocks starting
    # at per-group block `in_block_offset` of a buffer laid out with
    # `in_block_stride` blocks per group -- the index_map does the skipping,
    # so callers (the sharded overlap split) never pay a slice COPY of the
    # stream buffer to run the kernel on a block subrange
    stride = NT if in_block_stride is None else in_block_stride
    G = nblk // stride
    assert G * stride == nblk, (G, stride, nblk)
    assert 0 <= in_block_offset and in_block_offset + NT <= stride, (
        in_block_offset, NT, stride)
    Q = quarter_len
    valid_from = max(0, 3 * Q - 1)
    alpha = 1.0 / (1 << smooth_shift) if smooth_shift > 0 else 1.0
    HR = _round_up(max(3 * Q, 8), 8)
    assert R >= 2 * HR, "rows must comfortably exceed the 3Q history"
    SLOTR = _round_up(max_events, 8)
    if max_events > LANES:
        raise ValueError(f"max_events must be <= {LANES}")
    with_base = base_index is not None
    with_init = shard_init is not None

    kernel = functools.partial(
        _tm_kernel,
        C=C, R=R, HR=HR, Q=Q, alpha=alpha, valid_from=valid_from,
        threshold_value=threshold_value,
        threshold_frac_bits=threshold_frac_bits,
        hysteresis=hysteresis, max_events=max_events, L_true=stream_len,
        batch_last=batch - (G - 1) * LANES,
        tie_last=(tie == "last"), emit_unclosed=emit_unclosed,
        L_global=stream_len_global,
        with_base=with_base, with_init=with_init,
    )
    i32 = jnp.int32
    ev = lambda dt: jax.ShapeDtypeStruct((G, SLOTR, LANES), dt)  # noqa: E731
    out_shape = [
        ev(jnp.uint8), ev(jnp.uint8), ev(i32), ev(i32), ev(i32),
        ev(jnp.float32), ev(i32),
    ]
    ev_spec = pl.BlockSpec((1, SLOTR, LANES), lambda g, t: (g, 0, 0))
    in_specs = [
        pl.BlockSpec(
            (1, CR, LANES),
            lambda g, t, S=stride, O=in_block_offset: (g * S + O + t, 0, 0),
        )
    ]
    operands = [x_tiled]
    if with_init:
        # convert the lane-kernel-shaped init arrays to per-group tiled
        # rows; padded lanes get neutral state (la=-1, no open gate) so
        # they never wake the event machinery
        hist_init, carry_init, gate_init = shard_init
        GB = G * LANES
        hf = hist_init.astype(jnp.float32)
        hl = min(hf.shape[-1], HR)
        hp = jnp.zeros((C, GB, HR), jnp.float32)
        hp = hp.at[:, :batch, HR - hl :].set(hf[..., -hl:])
        hp = hp.reshape(C, G, LANES, HR).transpose(1, 0, 3, 2)
        hp = hp.reshape(G, C * HR, LANES)
        cflat = jnp.zeros((GB,), jnp.float32).at[:batch].set(
            carry_init.astype(jnp.float32)
        )
        cpad = jnp.zeros((G, 8, LANES), jnp.float32).at[:, 0].set(
            cflat.reshape(G, LANES)
        )
        gla = jnp.full((GB,), -1, i32).at[:batch].set(
            gate_init[:, 0].astype(i32)
        )
        gfl = jnp.zeros((GB,), i32).at[:batch].set(
            gate_init[:, 1].astype(i32)
        )
        gpad = jnp.full((G, 8, LANES), -1, i32)
        gpad = gpad.at[:, 0].set(gla.reshape(G, LANES))
        gpad = gpad.at[:, 1].set(gfl.reshape(G, LANES))
        gspec = lambda rows_: pl.BlockSpec(  # noqa: E731
            (1, rows_, LANES), lambda g, t: (g, 0, 0)
        )
        in_specs += [gspec(C * HR), gspec(8), gspec(8)]
        operands += [hp, cpad, gpad]
    if with_base:
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.insert(0, jnp.asarray(base_index, i32).reshape(1))
    outs = pl.pallas_call(
        kernel,
        grid=(G, NT),
        in_specs=in_specs,
        out_specs=[ev_spec] * 7,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((C * HR, LANES), jnp.float32),
            pltpu.VMEM((8, LANES), jnp.float32),
            pltpu.VMEM((R, 1), jnp.float32),
            pltpu.VMEM((8, LANES), i32),
            pltpu.VMEM((SLOTR, LANES), i32),
            pltpu.VMEM((SLOTR, LANES), i32),
            pltpu.VMEM((SLOTR, LANES), i32),
            pltpu.VMEM((SLOTR, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    valid, closed, start, close, pidx, pval, meta = tm.unpack_event_outputs(
        outs, G, SLOTR, batch
    )
    E = max_events
    return GateEvents(
        valid=valid[:, :E].astype(bool),
        closed=closed[:, :E].astype(bool),
        gate_start=start[:, :E],
        gate_close=close[:, :E],
        peak_idx=pidx[:, :E],
        peak_value=pval[:, :E],
        count=meta[:, 0],
        overflow=meta[:, 1].astype(bool),
    )
