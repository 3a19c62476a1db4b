"""Shared machinery for TIME-MAJOR Pallas detector kernels.

Layout: time runs down the sublane (row) axis, 128 parallel streams occupy
the lanes, and C planar channel planes are stacked row-major inside each
block -- the tiled stream buffer (see `pallas_minn_tm`).  Every time shift
is then a sublane concatenation: free for multiples of 8 rows, cheap for
1/2/4 (measured tools/perf_probe6b.py; a sub-lane LANE roll costs ~3x a
vector add, which made the lane-major kernels VPU-issue-bound).

Provides the row-direction shift/ladder primitives, the tiled-buffer
layout converters, and the transposed in-VMEM gate/hysteresis/peak event
machinery (slots on rows, streams on lanes) with optional capture-at-peak
side channels -- the TM analog of `pallas_common`'s event machinery.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ofdm_sync_tpu.kernels import pallas_common as common

LANES = 128
round_up = common.round_up
I32_MAX = common.I32_MAX
NEG_INF = common.NEG_INF


def rshift(y: jax.Array, d: int) -> jax.Array:
    """Row shift down time: ``out[t] = y[t - d]`` with WRAP rows at the top.

    A sublane concatenation.  Wrap garbage lands in the first d rows;
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


def rshift_zero(y: jax.Array, d: int, fill) -> jax.Array:
    """Row shift down with a constant fill (no wrap)."""
    if d == 0:
        return y
    head = jnp.full((d,) + y.shape[1:], fill, y.dtype)
    return jnp.concatenate([head, y[: y.shape[0] - d]], axis=0)


def row_iota(rows: int) -> jax.Array:
    return jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)


def window_sum_rows(z: jax.Array, window: int) -> jax.Array:
    """Causal running sum over `window` rows via the doubling ladder
    (wrap-concat shifts; garbage rows < window-1 must lie in a discarded
    head).  Works on (R, LANES) or stacked (K, R, LANES)."""
    assert window >= 1
    out = None
    s = z
    offset = 0
    maxbit = window.bit_length()
    for k in range(maxbit):
        if (window >> k) & 1:
            contrib = rshift(s, offset) if offset else s
            out = contrib if out is None else out + contrib
            offset += 1 << k
        if k + 1 < maxbit:
            s = s + rshift(s, 1 << k)
    return out


_GUARD_ROWS = 256


def _ladder_rows(x: jax.Array, combine, fill) -> jax.Array:
    """Inclusive row scan of an associative `combine` with identity `fill`.

    Mirrors `pallas_common._ladder_guarded` with rows in place of lanes: a
    256-row identity guard absorbs the wrap corruption of the sub-guard
    doubling steps (cumulative < 255 rows), then the guard is re-filled
    once and the remaining steps use identity-fill concat shifts (free for
    the multiples of 8 they all are).  Exact on every real row."""
    R = x.shape[0]
    G = _GUARD_ROWS
    y = jnp.concatenate(
        [jnp.full((G,) + x.shape[1:], fill, x.dtype), x], axis=0
    )
    d = 1
    while d < G and d < R:
        y = combine(y, rshift(y, d))
        d *= 2
    if d < R:
        grow = jax.lax.broadcasted_iota(jnp.int32, (R + G, 1), 0)
        y = jnp.where(grow >= G, y, jnp.full_like(y, fill))
        while d < R:
            y = combine(y, rshift_zero(y, d, fill))
            d *= 2
    return y[G:]


def ladder_max_rows(x: jax.Array, fill) -> jax.Array:
    """Inclusive running max down rows (guarded doubling, see _ladder_rows)."""
    return _ladder_rows(x, jnp.maximum, fill)


def ladder_sum_rows(x: jax.Array) -> jax.Array:
    """Inclusive running sum down rows (guarded doubling, see _ladder_rows)."""
    return _ladder_rows(x, lambda a, b: a + b, 0)


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
    G = round_up(batch, LANES) // LANES
    NT = round_up(L, R) // R
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
# transposed in-VMEM event machinery (slots on rows, streams on lanes)
# ---------------------------------------------------------------------------

def event_scratch_init(gate_ref, tstart_ref, tlast_ref, tpidx_ref, tpval_ref,
                       extra_refs=(), *, tie_last: bool) -> None:
    """Reset the event scratch at grid step 0.  gate_ref (8, LANES) i32:
    row 0 = last-above index (-1), row 1 = cluster count."""
    gate_ref[...] = jnp.where(
        row_iota(gate_ref.shape[0]) == 1,
        0,
        jnp.full_like(gate_ref, -1),
    )
    tstart_ref[...] = jnp.full_like(tstart_ref, I32_MAX)
    tlast_ref[...] = jnp.full_like(tlast_ref, -1)
    tpidx_ref[...] = jnp.full_like(tpidx_ref, -1 if tie_last else I32_MAX)
    tpval_ref[...] = jnp.full_like(tpval_ref, NEG_INF)
    for r in extra_refs:
        r[...] = jnp.zeros_like(r)


def event_update(
    above: jax.Array,     # (R, LANES) bool
    track: jax.Array,     # (R, LANES)
    gi_col: jax.Array,    # (R, 1) global sample index per row
    block_start,          # scalar: global index of row 0
    *,
    R: int,
    hysteresis: int,
    max_events: int,
    tie_last: bool,
    L_true: int,
    gate_ref, tstart_ref, tlast_ref, tpidx_ref, tpval_ref,
    extras=(),            # sequence of (R, LANES) arrays captured at peak
    extra_refs=(),        # matching (SLOTR, LANES) scratch refs
) -> None:
    """Merge this block's gates into the event table (rows = time).
    Predicated on any-above-or-open-gate; call once per grid step."""
    h = max(int(hysteresis), 1)
    carry_la = gate_ref[0:1, :]
    any_above = jnp.max(above.astype(jnp.int32)) > 0
    open_gate = (carry_la >= 0) & (block_start - carry_la <= h)
    any_open = jnp.max(open_gate.astype(jnp.int32)) > 0

    @pl.when(any_above | any_open)
    def _():
        gi = jnp.broadcast_to(gi_col, (R, LANES))
        above_idx = jnp.where(above, gi, jnp.int32(-1))
        la_local = ladder_max_rows(above_idx, fill=-1)
        last_above = jnp.maximum(la_local, carry_la)
        prev_above = jnp.maximum(rshift_zero(la_local, 1, -1), carry_la)
        new_cluster = above & ((prev_above < 0) | (gi - prev_above > h))
        cs = ladder_sum_rows(new_cluster.astype(jnp.int32))
        carry_count = gate_ref[1:2, :]
        cluster_id = carry_count + cs
        below_run = gi - last_above
        in_gate = (
            (last_above >= 0) & (below_run <= h) & (cluster_id >= 1)
            & (gi_col < L_true)
        )

        slot_row = row_iota(tstart_ref.shape[0])
        neg_inf = jnp.float32(NEG_INF)
        cid_rel = jnp.where(in_gate, cluster_id, jnp.int32(0))
        cmax_blk = jnp.max(cid_rel)
        cmin_blk = jnp.min(jnp.where(in_gate, cluster_id, jnp.int32(I32_MAX)))
        for cslot in range(1, max_events + 1):

            @pl.when(
                (jnp.int32(cslot) >= cmin_blk) & (jnp.int32(cslot) <= cmax_blk)
            )
            def _(cslot=cslot):
                m = in_gate & (cluster_id == cslot)
                bstart = jnp.min(
                    jnp.where(m, gi, jnp.int32(I32_MAX)), axis=0, keepdims=True
                )
                bpv = jnp.max(
                    jnp.where(m, track, neg_inf), axis=0, keepdims=True
                )
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
                    jnp.where(above & (cluster_id == cslot), gi,
                              jnp.int32(-1)),
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
                tpval_ref[...] = jnp.where(
                    sel, jnp.maximum(cur_pv, bpv), cur_pv
                )
                tpidx_ref[...] = jnp.where(
                    sel & take, jnp.broadcast_to(bidx, tpidx_ref.shape),
                    tpidx_ref[...],
                )
                at_peak = gi == bidx
                for arr, ref in zip(extras, extra_refs):
                    val = jnp.sum(
                        jnp.where(at_peak & m, arr, jnp.zeros_like(arr)),
                        axis=0, keepdims=True,
                    )
                    ref[...] = jnp.where(
                        sel & take, jnp.broadcast_to(val, ref.shape), ref[...]
                    )

        la_fin = last_above[R - 1 : R]
        cnt_fin = cluster_id[R - 1 : R]
        grow = row_iota(gate_ref.shape[0])
        gate_ref[...] = jnp.where(
            grow == 0,
            jnp.broadcast_to(la_fin, gate_ref.shape),
            jnp.where(
                grow == 1, jnp.broadcast_to(cnt_fin, gate_ref.shape),
                gate_ref[...],
            ),
        )


def event_finalize(
    valid_ref, closed_ref, start_ref, close_ref, pidx_ref, pval_ref, meta_ref,
    gate_ref, tstart_ref, tlast_ref, tpidx_ref, tpval_ref,
    extra_out_refs=(), extra_refs=(),
    *,
    hysteresis: int,
    max_events: int,
    L_true: int,
    emit_unclosed: bool,
) -> None:
    """Write the (1, SLOTR, LANES) event-table outputs from scratch.
    Call on the LAST grid step only (same-block outputs)."""
    h = max(int(hysteresis), 1)
    slot_row = row_iota(tstart_ref.shape[0])
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
    pval_ref[...] = jnp.where(exists, tpval_ref[...], jnp.float32(0.0))[None]
    for out_ref, ref in zip(extra_out_refs, extra_refs):
        out_ref[...] = jnp.where(exists, ref[...], jnp.zeros_like(ref))[None]
    count = jnp.sum(validm.astype(jnp.int32), axis=0, keepdims=True)
    overflow = (cnt > max_events).astype(jnp.int32)
    mrow = row_iota(meta_ref.shape[1])
    meta_ref[...] = jnp.where(
        mrow == 0,
        jnp.broadcast_to(count, meta_ref.shape[1:]),
        jnp.broadcast_to(overflow, meta_ref.shape[1:]),
    )[None]


def unpack_event_outputs(outs, G: int, SLOTR: int, batch: int):
    """(G, SLOTR, LANES) outputs -> per-stream (batch, SLOTR) tables."""
    unpack = lambda a: a.transpose(0, 2, 1).reshape(  # noqa: E731
        G * LANES, SLOTR
    )[:batch]
    return [unpack(o) for o in outs]
