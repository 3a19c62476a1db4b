"""Shared Pallas TPU kernel machinery for the streaming detectors.

Building blocks used by the fused detector kernels (pallas_minn, pallas_aa):

  * lane-axis shifts, log-depth windowed sums, running max/sum ladders, and
    the Hillis-Steele affine scan (the Mosaic-friendly forms of the
    reference's delay-line / running-sum / IIR primitives, reference
    ref/minn_delay_line.sv, ref/minn_running_sum.sv);
  * the in-VMEM gate/hysteresis/peak event machinery shared by all detector
    FSM variants (reference minn_rtl.py:750-825, zc_v2.py:360-450,
    sync_aa.py:495-568): per-block closed-form clustering merged into a
    VMEM-resident event table, with optional "capture these values at the
    peak" side channels (e.g. P at peak for CFO, reference sync_aa.py:533).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

LANE = 128
I32_MAX = jnp.iinfo(jnp.int32).max
NEG_INF = float("-inf")


def round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def shiftz(x: jax.Array, d: int, fill: float = 0.0) -> jax.Array:
    """``y[..., n] = x[..., n - d]`` with `fill` for ``n < d`` (last axis).

    Lane-aligned d lowers to a concat of a fill block with a static slice
    (cheapest, keeps the Mosaic VMEM stack small); unaligned d lowers to a
    lane roll + iota mask (sub-lane concats crash the Mosaic lowering).
    """
    if d == 0:
        return x
    if d % LANE == 0:
        prefix = jnp.full(x.shape[:-1] + (d,), fill, dtype=x.dtype)
        return jnp.concatenate([prefix, x[..., : x.shape[-1] - d]], axis=-1)
    rolled = pltpu.roll(x, d, axis=x.ndim - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(lane >= d, rolled, jnp.full_like(x, fill))


def window_sum(x: jax.Array, window: int) -> jax.Array:
    """Causal running sum over `window` samples, zero-primed history
    (reference ref/minn_running_sum.sv:50-99 semantics).  Log-depth doubling
    ladder combined along the binary digits of `window`."""
    assert window >= 1
    out = None
    s = x
    offset = 0
    maxbit = window.bit_length()
    for k in range(maxbit):
        if (window >> k) & 1:
            contrib = shiftz(s, offset)
            out = contrib if out is None else out + contrib
            offset += 1 << k
        if k + 1 < maxbit:
            s = s + shiftz(s, 1 << k)
    return out


def to_channel_leading(iq: jax.Array, *, expect_planes: int = 2):
    """Normalize detector input to the kernels' native channel-leading
    (C, batch, L) planar float32 layout with BRANCH-MAJOR rows
    [b0_i, b0_q, b1_i, b1_q] -- THE framework-native stream layout, shared
    by every fused kernel.

    Accepts (batch, branches, 2, L) / (branches, 2, L) natural layouts (a
    full HBM transpose per call -- ~30% of kernel wall at 2 GB payloads), or
    an already channel-leading (C, batch, L) array tagged by the caller via
    `channel_leading=True`, which is free.  Returns (x, batch, L, squeeze).
    """
    squeeze = iq.ndim == 3
    if squeeze:
        iq = iq[None]
    batch, branches, planes, L = iq.shape
    assert planes == expect_planes, "expected planar (..., 2, L) IQ"
    x = iq.astype(jnp.float32).reshape(batch, branches * planes, L)
    return x.transpose(1, 0, 2), batch, L, squeeze


def pad_channel_leading(x: jax.Array, Np: int, Lp: int) -> jax.Array:
    """Zero-pad a channel-leading (C, batch, L) array to (C, Np, Lp)."""
    C, batch, L = x.shape
    if Np != batch or Lp != L:
        xp = jnp.zeros((C, Np, Lp), x.dtype)
        x = xp.at[:, :batch, :L].set(x)
    return x


def roll(x: jax.Array, d: int) -> jax.Array:
    """Wrap-around lane shift: ``y[..., n] = x[..., (n - d) % N]``.

    One VPU pass -- no fill mask, unlike `shiftz`.  Lanes ``n < d`` receive
    the wrapped row tail; only safe when the caller never reads those lanes
    (the H-long overlap-save head every ext-buffer kernel slices off)."""
    if d == 0:
        return x
    return pltpu.roll(x, d, axis=x.ndim - 1)


def window_sum_guarded(x: jax.Array, window: int, *, guard: int) -> jax.Array:
    """`window_sum` built from unmasked wrap-rolls.

    Output lanes ``>= window - 1`` (plus however many leading input lanes
    were already garbage) are exact; lanes below that hold wrapped garbage.
    `guard` is the count of leading lanes the caller discards (the ext
    history head H) and must cover the garbage region.  Cuts the sub-lane
    shift cost from roll+iota+select to a single roll per step, which is
    material: the fused detectors are VPU-pass-bound, not HBM-bound."""
    assert window >= 1
    assert guard >= window - 1, (guard, window)
    out = None
    s = x
    offset = 0
    maxbit = window.bit_length()
    for k in range(maxbit):
        if (window >> k) & 1:
            contrib = roll(s, offset)
            out = contrib if out is None else out + contrib
            offset += 1 << k
        if k + 1 < maxbit:
            s = s + roll(s, 1 << k)
    return out


def const_decay_scan(v: jax.Array, decay: float) -> jax.Array:
    """Inclusive first-order IIR scan ``y[n] = sum_{j<=n} decay^(n-j) v[j]``
    along lanes, for a CONSTANT coefficient (the threshold-smoothing IIR
    with the warm-up freeze folded into a masked `v`).

    Log-depth doubling with two cost cuts over the naive masked ladder:
      * sub-lane steps (d < LANE) run as unmasked wrap-rolls over a LANE-wide
        zero guard prefix.  The wrap garbage stays strictly behind the lanes
        any real output reads (cumulative sub-lane corruption < LANE - 1),
        and the guard is re-zeroed in one select before the lane-aligned
        steps, whose zero-fill `shiftz` is exact from then on.
      * steps whose ``decay**step`` has decayed below 2^-45 are skipped.
        The collective omitted tail is Sum_{k>=step} decay^k = decay^step /
        (1-decay) <= 2^-45/(1-decay) relative to the scan's geometric scale
        -- for every smooth_shift <= 12 that is < 2^-32, i.e. more than
        2^9 times below one f32 ulp of the result: the truncated scan
        rounds to the same f32 value as the untruncated one (measured: the
        fused detector's event tables are unchanged; for the reference's
        smooth_shift=3 / decay 7/8 this caps the ladder at step 128 instead
        of 512, saving two full roll+FMA passes per block)."""
    n = v.shape[-1]
    guard = LANE
    cutoff = 2.0**-45
    y = jnp.concatenate(
        [jnp.zeros(v.shape[:-1] + (guard,), v.dtype), v], axis=-1
    )
    step = 1
    while step < guard and step < n and np.float32(decay**step) > cutoff:
        y = roll(y, step) * jnp.asarray(decay**step, v.dtype) + y
        step *= 2
    if step < n and np.float32(decay**step) > cutoff:
        lane = jax.lax.broadcasted_iota(jnp.int32, y.shape, y.ndim - 1)
        y = jnp.where(lane >= guard, y, jnp.zeros_like(y))
        while step < n and np.float32(decay**step) > cutoff:
            y = shiftz(y, step, fill=0.0) * jnp.asarray(
                decay**step, v.dtype
            ) + y
            step *= 2
    return y[..., guard:]


def affine_scan(a: jax.Array, b: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Inclusive scan of affine maps ``s -> a*s + b`` along the last axis;
    returns (A, B) with ``s[n] = A[n] * s_in + B[n]``."""
    A, B = a, b
    d = 1
    n = a.shape[-1]
    while d < n:
        A_prev = shiftz(A, d, fill=1.0)
        B_prev = shiftz(B, d, fill=0.0)
        B = B_prev * A + B
        A = A_prev * A
        d *= 2
    return A, B


def _ladder_guarded(x: jax.Array, combine, fill) -> jax.Array:
    """Inclusive lane scan of an associative `combine` with identity `fill`,
    log-depth doubling.  Sub-lane steps run as unmasked wrap-rolls over a
    LANE-wide identity-filled guard prefix (one roll instead of
    roll+iota+select); the guard's wrap corruption (< LANE - 1 lanes) stays
    strictly behind every real read, and is reset in one select before the
    lane-aligned zero/identity-fill steps.  Exact on all real lanes."""
    n = x.shape[-1]
    guard = LANE
    y = jnp.concatenate(
        [jnp.full(x.shape[:-1] + (guard,), fill, x.dtype), x], axis=-1
    )
    d = 1
    while d < guard and d < n:
        y = combine(y, roll(y, d))
        d *= 2
    if d < n:
        lane = jax.lax.broadcasted_iota(jnp.int32, y.shape, y.ndim - 1)
        y = jnp.where(lane >= guard, y, jnp.full_like(y, fill))
        while d < n:
            y = combine(y, shiftz(y, d, fill=fill))
            d *= 2
    return y[..., guard:]


def ladder_max(x: jax.Array, fill) -> jax.Array:
    """Inclusive running max along lanes (log-depth doubling)."""
    return _ladder_guarded(x, jnp.maximum, fill)


def ladder_sum(x: jax.Array) -> jax.Array:
    """Inclusive running sum along lanes (log-depth doubling)."""
    return _ladder_guarded(x, lambda a, b: a + b, 0)


# ---------------------------------------------------------------------------
# In-VMEM gate/hysteresis/peak event machinery
# ---------------------------------------------------------------------------
# Scratch layout (all (NB, LANE)):
#   gate_ref  i32: lane 0 = index of last above sample (-1), lane 1 = #gates
#   tstart    i32: per-slot gate start
#   tlast     i32: per-slot last above index
#   tpidx     i32: per-slot peak index
#   tpval     f32: per-slot peak value
#   extras    f32: per-slot captured values at the peak (one ref per channel)


def event_scratch_init(gate_ref, tstart_ref, tlast_ref, tpidx_ref, tpval_ref,
                       extra_refs=(), *, tie_last: bool) -> None:
    """Reset the event scratch at grid step 0."""
    gate_ref[...] = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, gate_ref.shape, 1) == 1,
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
    above: jax.Array,
    track: jax.Array,
    gi: jax.Array,
    it,
    *,
    B: int,
    hysteresis: int,
    max_events: int,
    tie_last: bool,
    L_true: int,
    gate_ref,
    tstart_ref,
    tlast_ref,
    tpidx_ref,
    tpval_ref,
    extras=(),       # sequence of (NB, B) arrays captured at the peak
    extra_refs=(),   # matching sequence of (NB, LANE) scratch refs
    block_start=None,  # first gi of this block (defaults it*B; sharded
    #                    callers pass a global base + it*B)
) -> None:
    """Merge this block's gates into the event table.  The whole body is
    predicated on "any above sample or an open carried gate", so quiet blocks
    cost one reduction.  Call once per grid step AFTER computing above/track.
    """
    import jax.experimental.pallas as pl

    h = max(int(hysteresis), 1)
    if block_start is None:
        block_start = it * B
    carry_la = gate_ref[..., 0:1]
    any_above = jnp.max(above.astype(jnp.int32)) > 0
    open_gate = (carry_la >= 0) & (block_start - carry_la <= h)
    any_open = jnp.max(open_gate.astype(jnp.int32)) > 0

    @pl.when(any_above | any_open)
    def _():
        above_idx = jnp.where(above, gi, jnp.int32(-1))
        la_local = ladder_max(above_idx, fill=-1)
        last_above = jnp.maximum(la_local, carry_la)
        prev_above = jnp.maximum(shiftz(la_local, 1, fill=-1), carry_la)
        new_cluster = above & ((prev_above < 0) | (gi - prev_above > h))
        cs = ladder_sum(new_cluster.astype(jnp.int32))
        carry_count = gate_ref[..., 1:2]
        cluster_id = carry_count + cs
        below_run = gi - last_above
        # gi < L_true: samples in the stream-length padding do not exist in
        # the unpadded semantics and must not be peak-tracked
        in_gate = (
            (last_above >= 0) & (below_run <= h) & (cluster_id >= 1)
            & (gi < L_true)
        )

        lane = jax.lax.broadcasted_iota(jnp.int32, tstart_ref.shape, 1)
        neg_inf = jnp.float32(NEG_INF)
        # Skip slot iterations whose cluster id does not occur in this block
        # (the reductions below would all be identity updates).  A typical
        # gate-active block holds one cluster, so this predication removes
        # ~(max_events - 1)/max_events of the event machinery's VPU work.
        cid_rel = jnp.where(in_gate, cluster_id, jnp.int32(0))
        cmax_blk = jnp.max(cid_rel)
        cmin_blk = jnp.min(
            jnp.where(in_gate, cluster_id, jnp.int32(I32_MAX))
        )
        for c in range(1, max_events + 1):

            @pl.when((jnp.int32(c) >= cmin_blk) & (jnp.int32(c) <= cmax_blk))
            def _(c=c):
                m = in_gate & (cluster_id == c)
                bstart = jnp.min(
                    jnp.where(m, gi, jnp.int32(I32_MAX)), axis=-1,
                    keepdims=True,
                )
                bpv = jnp.max(
                    jnp.where(m, track, neg_inf), axis=-1, keepdims=True
                )
                is_peak = m & (track == bpv)
                if tie_last:
                    bidx = jnp.max(
                        jnp.where(is_peak, gi, jnp.int32(-1)), axis=-1,
                        keepdims=True,
                    )
                else:
                    bidx = jnp.min(
                        jnp.where(is_peak, gi, jnp.int32(I32_MAX)),
                        axis=-1,
                        keepdims=True,
                    )
                blast = jnp.max(
                    jnp.where(above & (cluster_id == c), gi, jnp.int32(-1)),
                    axis=-1,
                    keepdims=True,
                )
                sel = lane == (c - 1)
                tstart_ref[...] = jnp.where(
                    sel, jnp.minimum(tstart_ref[...], bstart), tstart_ref[...]
                )
                tlast_ref[...] = jnp.where(
                    sel, jnp.maximum(tlast_ref[...], blast), tlast_ref[...]
                )
                # cross-block peak merge: later blocks win ties for
                # tie='last' (they come later in stream order); earlier
                # keep for 'first'
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
                # capture side-channel values at the peak sample (unique gi)
                at_peak = gi == bidx
                for arr, ref in zip(extras, extra_refs):
                    val = jnp.sum(
                        jnp.where(at_peak & m, arr, jnp.zeros_like(arr)),
                        axis=-1,
                        keepdims=True,
                    )
                    ref[...] = jnp.where(
                        sel & take, jnp.broadcast_to(val, ref.shape), ref[...]
                    )

        la_fin = last_above[..., -1:]
        cnt_fin = cluster_id[..., -1:]
        gl = jax.lax.broadcasted_iota(jnp.int32, gate_ref.shape, 1)
        gate_ref[...] = jnp.where(
            gl == 0,
            jnp.broadcast_to(la_fin, gate_ref.shape),
            jnp.where(
                gl == 1, jnp.broadcast_to(cnt_fin, gate_ref.shape),
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
    """Write the event-table outputs from scratch (cheap; every grid step --
    the final write wins)."""
    h = max(int(hysteresis), 1)
    slot = jax.lax.broadcasted_iota(jnp.int32, tstart_ref.shape, 1)
    cnt = gate_ref[..., 1:2]
    exists = slot < jnp.minimum(cnt, max_events)
    close_raw = tlast_ref[...] + h
    closed = (close_raw <= L_true - 1) & exists
    valid = exists if emit_unclosed else (exists & closed)
    z = jnp.int32(0)
    valid_ref[...] = valid.astype(jnp.uint8)
    closed_ref[...] = closed.astype(jnp.uint8)
    start_ref[...] = jnp.where(exists, tstart_ref[...], z)
    close_ref[...] = jnp.where(exists, jnp.clip(close_raw, 0, L_true - 1), z)
    pidx_ref[...] = jnp.where(exists, tpidx_ref[...], z)
    pval_ref[...] = jnp.where(exists, tpval_ref[...], jnp.float32(0.0))
    for out_ref, ref in zip(extra_out_refs, extra_refs):
        out_ref[...] = jnp.where(exists, ref[...], jnp.zeros_like(ref))
    count = jnp.sum(valid.astype(jnp.int32), axis=-1, keepdims=True)
    overflow = (cnt > max_events).astype(jnp.int32)
    ml = jax.lax.broadcasted_iota(jnp.int32, meta_ref.shape, 1)
    meta_ref[...] = jnp.where(
        ml == 0,
        jnp.broadcast_to(count, meta_ref.shape),
        jnp.broadcast_to(overflow, meta_ref.shape),
    )
