"""Time-major fused Pallas kernel for the flagship Minn-RTL detector.

The lane-major kernel (`pallas_minn`) is VPU-issue-bound: its windowed-sum
and smoothing ladders need seven sub-lane shifts each, and a sub-lane lane
roll costs ~3x a vector add on this hardware (measured, tools/perf_probe6).
This kernel transposes the problem: **time runs down the sublane (row) axis,
128 parallel streams occupy the lanes**.  Every time shift then becomes a
sublane concatenation -- free for multiples of 8 rows and cheap even for
1/2/4 -- which removes the dominant ALU cost and puts the kernel at the HBM
input floor (measured ~18 G samples/s vs ~12.1 G lane-major on the same
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

Per grid step the kernel consumes R rows x 128 streams (R*128 samples --
0.5-2 M samples per step), runs the full RTL datapath (quarter products ->
joint corr/energy window ladders -> constant-decay smoothing -> fixed-point
threshold -> gate/hysteresis/peak FSM) entirely in VMEM, and emits only the
per-stream event tables.  The arithmetic mirrors `pallas_minn` step for
step (same reduction trees, same guard proofs with rows in place of lanes),
so results are bit-identical to the lane-major kernel.

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

from ofdm_sync_tpu.kernels import pallas_common as common

LANES = 128
_round_up = common.round_up
I32_MAX = common.I32_MAX
NEG_INF = common.NEG_INF


def _rshift(y: jax.Array, d: int) -> jax.Array:
    """Row shift down time: ``out[t] = y[t - d]`` with WRAP rows at the top.

    A sublane concatenation -- free for d % 8 == 0, cheap otherwise
    (measured tools/perf_probe6b).  Wrap garbage lands in the first d rows;
    callers keep it inside a discarded head (history rows / zero guard),
    mirroring `pallas_common.roll`'s lane-guard discipline.
    """
    if d == 0:
        return y
    ax = y.ndim - 2
    n = y.shape[ax]
    if ax == 0:
        return jnp.concatenate([y[n - d :], y[: n - d]], axis=0)
    return jnp.concatenate([y[:, n - d :], y[:, : n - d]], axis=1)


def _row_iota(rows: int) -> jax.Array:
    return jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)


def _ladder_max_rows(x: jax.Array, fill) -> jax.Array:
    """Inclusive running max down rows (guarded wrap-concat doubling).

    Cumulative wrap corruption over steps 1..R/2 is < R rows, so an R-row
    identity guard keeps every real row exact.  Concat shifts are free and
    this ladder only runs inside the event predication, so the 2x data is
    immaterial."""
    R = x.shape[0]
    y = jnp.concatenate([jnp.full((R,) + x.shape[1:], fill, x.dtype), x], axis=0)
    d = 1
    while d < R:
        y = jnp.maximum(y, _rshift(y, d))
        d *= 2
    return y[R:]


def _ladder_sum_rows(x: jax.Array) -> jax.Array:
    """Inclusive running sum down rows (guarded wrap-concat doubling)."""
    R = x.shape[0]
    y = jnp.concatenate([jnp.zeros((R,) + x.shape[1:], x.dtype), x], axis=0)
    d = 1
    while d < R:
        y = y + _rshift(y, d)
        d *= 2
    return y[R:]


# ---------------------------------------------------------------------------
# layout converters
# ---------------------------------------------------------------------------

def to_time_tiled(x: jax.Array, R: int) -> tuple[jax.Array, int, int]:
    """Channel-leading (C, batch, L) -> tiled stream buffer
    ((G*NT, C*R, LANES), G, NT).  Pads batch to a multiple of 128 and L to a
    multiple of R with zeros.  One HBM transpose -- production receivers
    write the tiled layout directly and skip this.
    """
    C, batch, L = x.shape
    G = _round_up(batch, LANES) // LANES
    NT = _round_up(L, R) // R
    xp = jnp.zeros((C, G * LANES, NT * R), x.dtype)
    xp = xp.at[:, :batch, :L].set(x)
    # (C, G, 128, NT, R) -> (G, NT, C, R, 128)
    xt = xp.reshape(C, G, LANES, NT, R).transpose(1, 3, 0, 4, 2)
    return xt.reshape(G * NT, C * R, LANES), G, NT


def from_time_tiled(xt: jax.Array, G: int, NT: int, C: int, R: int) -> jax.Array:
    """Inverse of `to_time_tiled` (without the un-padding)."""
    x = xt.reshape(G, NT, C, R, LANES).transpose(2, 0, 4, 1, 3)
    return x.reshape(C, G * LANES, NT * R)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _tm_kernel(
    x_ref,       # (1, C*R, LANES) input block
    valid_ref, closed_ref, start_ref, close_ref, pidx_ref, pval_ref, meta_ref,
    hist_ref,    # (C*HR, LANES) carried IQ history rows
    carry_ref,   # (8, LANES) f32: row 0 = smoothing carry
    dvec_ref,    # (R, 1) f32: decay^(t+1) for the carry term
    gate_ref,    # (8, LANES) i32: row 0 = last_above, row 1 = cluster count
    tstart_ref, tlast_ref, tpidx_ref, tpval_ref,  # (SLOTR, LANES) slots
    *,
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
):
    it = pl.program_id(1)
    h = max(int(hysteresis), 1)
    decay = 1.0 - alpha

    @pl.when(it == 0)
    def _():
        hist_ref[...] = jnp.zeros_like(hist_ref)
        carry_ref[...] = jnp.zeros_like(carry_ref)
        row = _row_iota(R).astype(jnp.float32)
        # decay^(t+1); exp/log is exact enough only for... compute by
        # repeated squaring on the row index bits to match the lane
        # kernel's _init_decay product exactly
        d = jnp.full((R, 1), jnp.float32(decay))
        step = 1
        while step < R:
            d = d * jnp.concatenate(
                [jnp.ones((step, 1), jnp.float32), d[: R - step]], axis=0
            )
            step *= 2
        del row
        dvec_ref[...] = d
        gate_ref[...] = jnp.where(
            _row_iota(8) == 1, 0, jnp.full((8, LANES), -1, jnp.int32)
        )
        tstart_ref[...] = jnp.full_like(tstart_ref, I32_MAX)
        tlast_ref[...] = jnp.full_like(tlast_ref, -1)
        tpidx_ref[...] = jnp.full_like(
            tpidx_ref, -1 if tie_last else I32_MAX
        )
        tpval_ref[...] = jnp.full_like(tpval_ref, NEG_INF)

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

    z = jnp.stack([u, p], axis=0)  # (2, HR+R, LANES)
    d = 1
    while d < Q:
        z = z + _rshift(z, d)
        d *= 2
    p_q = z[1]
    z = z + _rshift(z, Q)
    corr_pos = jnp.maximum(z[0][HR:], 0.0)
    energy_out = (p_q + _rshift(z[1], Q))[HR:]

    gi_col = it * R + _row_iota(R)  # (R, 1) global sample index
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
    above = above & (gi_col < L_true)
    if batch_last < LANES:
        # zero-padded streams in the last group trivially sit above
        # threshold (0 >= 0); mask them so they neither emit events nor
        # keep the event machinery resident on every block
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        above = above & (
            (pl.program_id(0) < pl.num_programs(0) - 1)
            | (lane < batch_last)
        )

    # --- gate/hysteresis/peak FSM (closed form, rows = time) -----------
    carry_la = gate_ref[0:1, :]
    any_above = jnp.max(above.astype(jnp.int32)) > 0
    open_gate = (carry_la >= 0) & (it * R - carry_la <= h)
    any_open = jnp.max(open_gate.astype(jnp.int32)) > 0

    @pl.when(any_above | any_open)
    def _():
        gi = jnp.broadcast_to(gi_col, (R, LANES))
        above_idx = jnp.where(above, gi, jnp.int32(-1))
        la_local = _ladder_max_rows(above_idx, fill=-1)
        last_above = jnp.maximum(la_local, carry_la)
        prev_above = jnp.maximum(_rshift_zero(la_local, 1, fill=-1), carry_la)
        new_cluster = above & ((prev_above < 0) | (gi - prev_above > h))
        cs = _ladder_sum_rows(new_cluster.astype(jnp.int32))
        carry_count = gate_ref[1:2, :]
        cluster_id = carry_count + cs
        below_run = gi - last_above
        in_gate = (
            (last_above >= 0) & (below_run <= h) & (cluster_id >= 1)
            & (gi_col < L_true)
        )

        slot_row = _row_iota(tstart_ref.shape[0])
        neg_inf = jnp.float32(NEG_INF)
        cid_rel = jnp.where(in_gate, cluster_id, jnp.int32(0))
        cmax_blk = jnp.max(cid_rel)
        cmin_blk = jnp.min(jnp.where(in_gate, cluster_id, jnp.int32(I32_MAX)))
        track = corr_pos
        for cslot in range(1, max_events + 1):

            @pl.when(
                (jnp.int32(cslot) >= cmin_blk) & (jnp.int32(cslot) <= cmax_blk)
            )
            def _(cslot=cslot):
                m = in_gate & (cluster_id == cslot)
                bstart = jnp.min(
                    jnp.where(m, gi, jnp.int32(I32_MAX)), axis=0, keepdims=True
                )
                bpv = jnp.max(jnp.where(m, track, neg_inf), axis=0, keepdims=True)
                is_peak = m & (track == bpv)
                if tie_last:
                    bidx = jnp.max(
                        jnp.where(is_peak, gi, jnp.int32(-1)), axis=0,
                        keepdims=True,
                    )
                else:
                    bidx = jnp.min(
                        jnp.where(is_peak, gi, jnp.int32(I32_MAX)), axis=0,
                        keepdims=True,
                    )
                blast = jnp.max(
                    jnp.where(above & (cluster_id == cslot), gi, jnp.int32(-1)),
                    axis=0, keepdims=True,
                )
                sel = slot_row == (cslot - 1)
                tstart_ref[...] = jnp.where(
                    sel, jnp.minimum(tstart_ref[...], bstart), tstart_ref[...]
                )
                tlast_ref[...] = jnp.where(
                    sel, jnp.maximum(tlast_ref[...], blast), tlast_ref[...]
                )
                cur_pv = tpval_ref[...]
                if tie_last:
                    take = (bpv > cur_pv) | ((bpv == cur_pv) & (bpv > neg_inf))
                else:
                    take = bpv > cur_pv
                tpval_ref[...] = jnp.where(sel, jnp.maximum(cur_pv, bpv), cur_pv)
                tpidx_ref[...] = jnp.where(
                    sel & take, jnp.broadcast_to(bidx, tpidx_ref.shape),
                    tpidx_ref[...],
                )

        la_fin = last_above[R - 1 : R]
        cnt_fin = cluster_id[R - 1 : R]
        grow = _row_iota(8)
        gate_ref[...] = jnp.where(
            grow == 0,
            jnp.broadcast_to(la_fin, gate_ref.shape),
            jnp.where(
                grow == 1, jnp.broadcast_to(cnt_fin, gate_ref.shape),
                gate_ref[...],
            ),
        )

    # --- finalize (last step only; same-block outputs, final write wins)
    @pl.when(it == pl.num_programs(1) - 1)
    def _():
        slot_row = _row_iota(tstart_ref.shape[0])
        cnt = gate_ref[1:2, :]
        exists = slot_row < jnp.minimum(cnt, max_events)
        close_raw = tlast_ref[...] + h
        closed = (close_raw <= L_true - 1) & exists
        validm = exists if emit_unclosed else (exists & closed)
        z0 = jnp.int32(0)
        valid_ref[...] = validm.astype(jnp.uint8)[None]
        closed_ref[...] = closed.astype(jnp.uint8)[None]
        start_ref[...] = jnp.where(exists, tstart_ref[...], z0)[None]
        close_ref[...] = jnp.where(
            exists, jnp.clip(close_raw, 0, L_true - 1), z0
        )[None]
        pidx_ref[...] = jnp.where(exists, tpidx_ref[...], z0)[None]
        pval_ref[...] = jnp.where(
            exists, tpval_ref[...], jnp.float32(0.0)
        )[None]
        count = jnp.sum(validm.astype(jnp.int32), axis=0, keepdims=True)
        overflow = (cnt > max_events).astype(jnp.int32)
        mrow = _row_iota(meta_ref.shape[1])
        meta_ref[...] = jnp.where(
            mrow == 0,
            jnp.broadcast_to(count, meta_ref.shape[1:]),
            jnp.broadcast_to(overflow, meta_ref.shape[1:]),
        )[None]


def _rshift_zero(y: jax.Array, d: int, fill) -> jax.Array:
    """Row shift down with a constant fill (no wrap)."""
    if d == 0:
        return y
    head = jnp.full((d,) + y.shape[1:], fill, y.dtype)
    return jnp.concatenate([head, y[: y.shape[0] - d]], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "quarter_len", "smooth_shift", "threshold_value",
        "threshold_frac_bits", "hysteresis", "max_events", "tie",
        "emit_unclosed", "rows", "stream_len", "batch", "interpret",
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
):
    """Fully-fused time-major Minn-RTL detection on a tiled stream buffer.

    x_tiled: (G*NT, C*rows, 128) float32 or int16 (see module docstring;
    build with `to_time_tiled` or ingest directly).  `stream_len` is the
    true per-stream length L (padding rows are masked), `batch` the true
    stream count.  Returns `GateEvents` with (batch, max_events) tables --
    the same semantics as `pallas_minn.minn_rtl_detect_fused_pallas`.
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
    G = nblk // NT
    assert G * NT == nblk, (G, NT, nblk)
    Q = quarter_len
    valid_from = max(0, 3 * Q - 1)
    alpha = 1.0 / (1 << smooth_shift) if smooth_shift > 0 else 1.0
    HR = _round_up(max(3 * Q, 8), 8)
    assert R >= 2 * HR, "rows must comfortably exceed the 3Q history"
    SLOTR = _round_up(max_events, 8)
    if max_events > LANES:
        raise ValueError(f"max_events must be <= {LANES}")

    kernel = functools.partial(
        _tm_kernel,
        C=C, R=R, HR=HR, Q=Q, alpha=alpha, valid_from=valid_from,
        threshold_value=threshold_value,
        threshold_frac_bits=threshold_frac_bits,
        hysteresis=hysteresis, max_events=max_events, L_true=stream_len,
        batch_last=batch - (G - 1) * LANES,
        tie_last=(tie == "last"), emit_unclosed=emit_unclosed,
    )
    i32 = jnp.int32
    ev = lambda dt: jax.ShapeDtypeStruct((G, SLOTR, LANES), dt)  # noqa: E731
    out_shape = [
        ev(jnp.uint8), ev(jnp.uint8), ev(i32), ev(i32), ev(i32),
        ev(jnp.float32), ev(i32),
    ]
    ev_spec = pl.BlockSpec((1, SLOTR, LANES), lambda g, t: (g, 0, 0))
    outs = pl.pallas_call(
        kernel,
        grid=(G, NT),
        in_specs=[
            pl.BlockSpec((1, CR, LANES), lambda g, t, NT=NT: (g * NT + t, 0, 0))
        ],
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
    )(x_tiled)
    # (G, SLOTR, 128) -> (G*128 streams, SLOTR) -> slice true batch/events
    unpack = lambda a: a.transpose(0, 2, 1).reshape(  # noqa: E731
        G * LANES, SLOTR
    )[:batch]
    valid, closed, start, close, pidx, pval, meta = map(unpack, outs)
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
