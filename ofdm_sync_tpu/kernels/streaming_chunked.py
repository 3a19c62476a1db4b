"""Chunked streaming detection with explicit carried state.

The RTL detector is a streaming device: it consumes an endless IQ stream and
carries all its state in delay lines, running sums, the smoothing register,
and the gate FSM (reference ref/minn_preamble_detector.sv).  The fused TPU
kernels carry that state across grid steps *within* one call; this module
exposes the same carries *between* calls, so a receiver can process an
unbounded stream chunk-by-chunk (or checkpoint/resume mid-stream -- the state
is a plain pytree, serializable with orbax):

    state = minn_rtl_stream_init(params, branches=2)
    for chunk in stream:                       # (branches, 2, chunk_len)
        state = minn_rtl_stream_step(state, chunk)
    events = minn_rtl_stream_finalize(state)   # GateEvents, == one-shot

Exactness: feeding the concatenation of all chunks to
`minn_rtl_detect_planar` yields the same event table bit-for-bit (tests
assert this for random chunk splits) up to float reassociation inside a
chunk.  The cross-chunk carry is the same closed form the Pallas kernel uses
(kernels/pallas_common.py): (last-above index, #gates) plus per-slot
(start, last_above, peak_idx, peak_value).

Index horizon: global sample indices are int32 (TPU-native width, the same
class of finite counter the RTL carries in its pointers), so one epoch spans
2^31 samples (~70 s at 30.72 Msps).  A live receiver calls
`minn_rtl_stream_rebase` after consuming events -- well before the horizon
-- to start a fresh epoch while keeping the IQ/smoothing carries; event
indices are then relative to the rebase point.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ofdm_sync_tpu.ops.detect import GateEvents
from ofdm_sync_tpu.ops.windows import shift_right

_I32_MAX = jnp.iinfo(jnp.int32).max
_NEG_INF = float("-inf")

# Hard bound of one index epoch: global sample indices are int32 and the
# open-ended fused steps pin the far horizon to 2^31 - 2, so state.base +
# chunk_len must stay strictly below this or indices silently wrap (~70 s
# of stream at 30.72 Msps).  Call a *_rebase helper on a quiet stretch
# before the headroom runs out; `epoch_headroom` is the host-side check.
EPOCH_HORIZON = 2**31 - 2
_EPOCH_WARN_MARGIN = 1 << 28  # ~268M samples (~8.7 s at 30.72 Msps)


def epoch_headroom(state, *, warn_margin: int = _EPOCH_WARN_MARGIN) -> int:
    """Samples left in the current int32 index epoch (host-side guard).

    Works on any stream state with a `.base` field.  Warns when headroom
    drops under `warn_margin` and raises once the epoch is exhausted --
    a continuously running receiver calls this between chunks (it is a
    host-side check; `state.base` must be concrete, not a tracer) and
    invokes the matching `*_rebase` helper on a quiet stretch well before
    the horizon.
    """
    import warnings

    import numpy as np

    base = int(np.asarray(state.base))
    headroom = EPOCH_HORIZON - base
    if headroom <= 0:
        raise OverflowError(
            f"int32 index epoch exhausted (base={base} >= {EPOCH_HORIZON}); "
            "indices from further chunks would wrap -- rebase the stream "
            "state (minn_rtl_stream_rebase / *_fused_stream_rebase) on a "
            "quiet stretch before this point"
        )
    if headroom < warn_margin:
        warnings.warn(
            f"index epoch nearly exhausted ({headroom} samples of headroom "
            f"left before {EPOCH_HORIZON}); rebase the stream state on the "
            "next quiet stretch",
            RuntimeWarning,
            stacklevel=2,
        )
    return headroom


class MinnRTLStreamParams(NamedTuple):
    quarter_len: int
    smooth_shift: int
    threshold_value: int
    threshold_frac_bits: int
    hysteresis: int
    max_events: int = 8
    tie: str = "last"


class MinnRTLStreamState(NamedTuple):
    """Everything the detector carries between chunks (a JAX pytree)."""

    hist: jax.Array          # (branches, 2, 3Q) planar IQ tail
    smooth: jax.Array        # f32 scalar -- smoothing register
    base: jax.Array          # i32 scalar -- global index of the next sample
    last_above: jax.Array    # i32 scalar -- global index of last above (-1)
    gate_count: jax.Array    # i32 scalar -- gates opened so far
    ev_start: jax.Array      # i32 (E,)
    ev_last: jax.Array       # i32 (E,) last above per gate
    ev_pidx: jax.Array       # i32 (E,)
    ev_pval: jax.Array       # f32 (E,)


def minn_rtl_stream_init(
    params: MinnRTLStreamParams, branches: int
) -> MinnRTLStreamState:
    Q = params.quarter_len
    E = params.max_events
    tie_last = params.tie == "last"
    return MinnRTLStreamState(
        hist=jnp.zeros((branches, 2, 3 * Q), jnp.float32),
        smooth=jnp.zeros((), jnp.float32),
        base=jnp.zeros((), jnp.int32),
        last_above=jnp.full((), -1, jnp.int32),
        gate_count=jnp.zeros((), jnp.int32),
        ev_start=jnp.full((E,), _I32_MAX, jnp.int32),
        ev_last=jnp.full((E,), -1, jnp.int32),
        ev_pidx=jnp.full((E,), -1 if tie_last else _I32_MAX, jnp.int32),
        ev_pval=jnp.full((E,), _NEG_INF, jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("params",))
def minn_rtl_stream_step(
    state: MinnRTLStreamState,
    chunk: jax.Array,
    *,
    params: MinnRTLStreamParams,
) -> MinnRTLStreamState:
    """Consume one planar chunk (branches, 2, n); return the updated state.

    n may vary between calls (each distinct n compiles once).
    """
    Q = params.quarter_len
    H = 3 * Q
    h = max(int(params.hysteresis), 1)
    E = params.max_events
    tie_last = params.tie == "last"
    alpha = (
        1.0 / (1 << params.smooth_shift) if params.smooth_shift > 0 else 1.0
    )
    valid_from = max(0, 3 * Q - 1)
    n = chunk.shape[-1]

    ext = jnp.concatenate([state.hist, chunk.astype(jnp.float32)], axis=-1)
    new_hist = ext[..., -H:]

    # metric datapath (same algebra as kernels.pallas_minn._metric_block);
    # the delay-line primitive is the shared zero-primed shift
    tap = shift_right

    i = ext[..., 0, :]
    q = ext[..., 1, :]
    u = jnp.sum(i * tap(i, Q) + q * tap(q, Q), axis=0)
    p = jnp.sum(i * i + q * q, axis=0)

    def win(x):
        cs = jnp.cumsum(x, axis=-1)
        return cs - tap(cs, Q)

    corr = win(u)
    energy = win(p)
    corr_total = (corr + tap(corr, Q))[H:]
    energy_total = (energy + tap(energy, Q) + tap(energy, 2 * Q))[H:]
    corr_pos = jnp.maximum(corr_total, 0.0)

    # NOTE: window sums here restart from the ext start; positions needing
    # deeper history than 3Q do not exist (max lag is 3Q-1), so emitted
    # values are exact for every chunk after the first, and the first chunk
    # reproduces the RTL zero-priming.
    gi = state.base + jnp.arange(n, dtype=jnp.int32)
    metric_valid = gi >= valid_from

    a = jnp.where(metric_valid, 1.0 - alpha, 1.0).astype(jnp.float32)
    b = jnp.where(metric_valid, alpha * corr_pos, 0.0)

    # associative-scan form (log-depth) with the carried register
    def combine(l, r):
        return (l[0] * r[0], l[1] * r[0] + r[1])

    A, Bv = jax.lax.associative_scan(combine, (a, b))
    smooth = A * state.smooth + Bv
    new_smooth = smooth[-1]

    scaled = smooth * (1 << params.threshold_frac_bits)
    above = metric_valid & (scaled >= energy_total * float(params.threshold_value))

    # --- event carry merge (host-level twin of pallas_common.event_update)
    track = corr_pos
    above_idx = jnp.where(above, gi, jnp.int32(-1))
    la_local = jax.lax.cummax(above_idx, axis=0)
    last_above = jnp.maximum(la_local, state.last_above)
    prev_above = jnp.maximum(
        jnp.concatenate([jnp.full((1,), -1, jnp.int32), la_local[:-1]]),
        state.last_above,
    )
    new_cluster = above & ((prev_above < 0) | (gi - prev_above > h))
    cluster_id = state.gate_count + jnp.cumsum(new_cluster.astype(jnp.int32))
    in_gate = (last_above >= 0) & (gi - last_above <= h) & (cluster_id >= 1)

    ev_start, ev_last = state.ev_start, state.ev_last
    ev_pidx, ev_pval = state.ev_pidx, state.ev_pval
    slots = jnp.arange(E, dtype=jnp.int32)
    neg_inf = jnp.float32(_NEG_INF)
    for c in range(1, E + 1):
        m = in_gate & (cluster_id == c)
        bstart = jnp.min(jnp.where(m, gi, jnp.int32(_I32_MAX)))
        # argmax-based selection (NOT `track == max(track)`: XLA may
        # duplicate `track`'s computation across fusions with different
        # FMA contraction, and the bitwise equality then never holds --
        # see ops/detect.py extract_gate_events)
        masked = jnp.where(m, track, neg_inf)
        nloc = masked.shape[-1]
        if tie_last:
            ji = jnp.int32(nloc - 1) - jnp.argmax(
                masked[::-1]
            ).astype(jnp.int32)
        else:
            ji = jnp.argmax(masked).astype(jnp.int32)
        bpv = masked[ji]
        any_m = jnp.any(m)
        if tie_last:
            bidx = jnp.where(any_m, gi[ji], jnp.int32(-1))
        else:
            bidx = jnp.where(any_m, gi[ji], jnp.int32(_I32_MAX))
        blast = jnp.max(jnp.where(above & (cluster_id == c), gi, jnp.int32(-1)))
        sel = slots == (c - 1)
        ev_start = jnp.where(sel, jnp.minimum(ev_start, bstart), ev_start)
        ev_last = jnp.where(sel, jnp.maximum(ev_last, blast), ev_last)
        cur = ev_pval
        if tie_last:
            take = (bpv > cur) | ((bpv == cur) & (bpv > neg_inf))
        else:
            take = bpv > cur
        ev_pval = jnp.where(sel, jnp.maximum(cur, bpv), cur)
        ev_pidx = jnp.where(sel & take, bidx, ev_pidx)

    return MinnRTLStreamState(
        hist=new_hist,
        smooth=new_smooth,
        base=state.base + n,
        last_above=last_above[-1],
        gate_count=cluster_id[-1],
        ev_start=ev_start,
        ev_last=ev_last,
        ev_pidx=ev_pidx,
        ev_pval=ev_pval,
    )


def minn_rtl_stream_rebase(
    state: MinnRTLStreamState, *, params: MinnRTLStreamParams
) -> MinnRTLStreamState:
    """Start a fresh index epoch: clear the event table and zero the global
    sample counter, keeping the IQ tail, smoothing register, and warm-up
    (the physical stream state).

    Call after consuming `minn_rtl_stream_finalize`'s events, well before
    the 2^31-sample int32 horizon (~70 s at 30.72 Msps).  The counter
    restarts at 3Q-1 (the stream is already warmed up, so every
    post-rebase sample stays metric-valid); an event index ``gi`` maps to
    ``rebase_point + gi - (3Q - 1)`` globally.  A gate still open at the
    rebase point is dropped -- rebase on a quiet stretch (no above samples
    within the hysteresis window), as a real receiver's periodic re-arm
    does.
    """
    E = params.max_events
    tie_last = params.tie == "last"
    # base restarts past the warm-up: the stream has been running, so the
    # metric stays valid from the first post-rebase sample
    valid_from = max(0, 3 * params.quarter_len - 1)
    return MinnRTLStreamState(
        hist=state.hist,
        smooth=state.smooth,
        base=jnp.asarray(valid_from, jnp.int32),
        last_above=jnp.full((), -1, jnp.int32),
        gate_count=jnp.zeros((), jnp.int32),
        ev_start=jnp.full((E,), _I32_MAX, jnp.int32),
        ev_last=jnp.full((E,), -1, jnp.int32),
        ev_pidx=jnp.full((E,), -1 if tie_last else _I32_MAX, jnp.int32),
        ev_pval=jnp.full((E,), _NEG_INF, jnp.float32),
    )


def minn_rtl_stream_finalize(
    state: MinnRTLStreamState, *, params: MinnRTLStreamParams,
    emit_unclosed: bool = False,
) -> GateEvents:
    """Event table for the stream consumed so far (state is NOT consumed --
    you can finalize mid-stream and keep feeding chunks)."""
    h = max(int(params.hysteresis), 1)
    E = params.max_events
    n = state.base  # stream length so far
    slots = jnp.arange(E, dtype=jnp.int32)
    exists = slots < jnp.minimum(state.gate_count, E)
    close_raw = state.ev_last + h
    closed = (close_raw <= n - 1) & exists
    valid = exists if emit_unclosed else (exists & closed)
    z = jnp.int32(0)
    return GateEvents(
        valid=valid,
        closed=closed,
        gate_start=jnp.where(exists, state.ev_start, z),
        gate_close=jnp.where(exists, jnp.clip(close_raw, 0, n - 1), z),
        peak_idx=jnp.where(exists, state.ev_pidx, z),
        peak_value=jnp.where(exists, state.ev_pval, jnp.float32(0.0)),
        count=jnp.sum(valid.astype(jnp.int32)),
        overflow=state.gate_count > E,
    )


# ---------------------------------------------------------------------------
# Fused-kernel streaming: ONE Pallas dispatch per chunk, kernel-exact carry
# ---------------------------------------------------------------------------

class MinnRTLFusedStreamState(NamedTuple):
    """Carried state of the fused-kernel streaming receiver (a pytree).

    Unlike `MinnRTLStreamState` (the XLA path, which re-derives its carries
    with array ops), this state is EMITTED BY THE KERNEL itself
    (`pallas_minn.minn_rtl_detect_fused_pallas(emit_state=True)`), so chunk
    boundaries are bit-exact continuations of the kernel's own arithmetic --
    the float-association caveat of XLA-primed state does not apply.  Each
    step costs ONE kernel dispatch (the latency path BASELINE.md names).
    """

    hist: jax.Array    # (C, batch, H) channel-leading planar IQ tail
    carry: jax.Array   # (batch,) f32 -- smoothing register at chunk end
    gate: jax.Array    # (batch, 2) i32 -- [last-above global index, flag]
    base: jax.Array    # () i32 -- global index of the next sample


def minn_rtl_fused_stream_init(
    params: MinnRTLStreamParams, batch: int, branches: int = 2
) -> MinnRTLFusedStreamState:
    Q = params.quarter_len
    H = max(((3 * Q + 127) // 128) * 128, 128)
    C = 2 * branches
    return MinnRTLFusedStreamState(
        hist=jnp.zeros((C, batch, H), jnp.float32),
        carry=jnp.zeros((batch,), jnp.float32),
        gate=jnp.concatenate(
            [jnp.full((batch, 1), -1, jnp.int32),
             jnp.zeros((batch, 1), jnp.int32)], axis=1,
        ),
        base=jnp.zeros((), jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("params",))
def minn_rtl_fused_stream_step(
    state: MinnRTLFusedStreamState,
    chunk: jax.Array,
    *,
    params: MinnRTLStreamParams,
):
    """Process one chunk through the FUSED detect kernel (one dispatch).

    chunk: (C, batch, chunk_len) channel-leading planar float32,
    chunk_len a multiple of 128.  Returns ``(new_state, GateEvents)`` --
    the chunk's OWN event table with GLOBAL indices (fresh per chunk;
    capacity-bounded like the RTL's timer queue).  A gate still open at
    the chunk edge always surfaces as a trailing event (against the
    open-ended horizon every gate finalizes "closed"; real closed-ness is
    decided by ``stitch_chunk_tables(stream_end=...)``) and the next chunk
    continues it via the primed gate carry; stitch per-chunk tables with
    `stitch_chunk_tables` (gap <= h rule, the same seam semantics as the
    sharded table merge).

    Index epoch: global indices are int32 against the `EPOCH_HORIZON`
    (2^31 - 2) far horizon -- a continuously running receiver checks
    `epoch_headroom(state)` between chunks and calls
    `minn_rtl_fused_stream_rebase` on a quiet stretch before it runs out
    (~70 s of stream at 30.72 Msps per epoch).

    Reference parity: the RTL consumes the same stream sample-by-sample
    with identical state (ref/minn_preamble_detector.sv:247-384); this is
    its chunk-granular TPU form.
    """
    from ofdm_sync_tpu.kernels.pallas_minn import minn_rtl_detect_fused_pallas

    C, batch, Lc = chunk.shape
    H = state.hist.shape[-1]
    h = max(int(params.hysteresis), 1)
    chunk = chunk.astype(jnp.float32)

    # gate continuation: last-above survives iff the gap at the chunk seam
    # is within hysteresis (same rule as _gate_init_from_tail)
    la = state.gate[:, 0]
    flag = ((la >= 0) & (state.base - la <= h)).astype(jnp.int32)
    gate_init = jnp.stack([jnp.where(flag > 0, la, -1), flag], axis=1)

    table, (carry_out, gate_out) = minn_rtl_detect_fused_pallas(
        chunk,
        quarter_len=params.quarter_len,
        smooth_shift=params.smooth_shift,
        threshold_value=params.threshold_value,
        threshold_frac_bits=params.threshold_frac_bits,
        hysteresis=params.hysteresis,
        max_events=params.max_events,
        tie=params.tie,
        emit_unclosed=True,
        block=Lc,
        channel_leading=True,
        base_index=state.base,
        # open-ended stream: a far horizon keeps closes UNCLIPPED
        # (close = last_above + h exactly), so the seam stitch rule
        # `next.start <= prev.close` is the exact FSM gap test; the final
        # event of a finite stream is clipped by `stitch_chunk_tables`'s
        # `stream_end`
        stream_len_global=EPOCH_HORIZON,
        shard_init=(state.hist, state.carry, gate_init),
        emit_state=True,
    )
    if Lc >= H:
        new_hist = chunk[..., -H:]
    else:
        new_hist = jnp.concatenate([state.hist, chunk], axis=-1)[..., -H:]
    new_state = MinnRTLFusedStreamState(
        hist=new_hist,
        carry=carry_out,
        gate=gate_out,
        base=state.base + Lc,
    )
    return new_state, table


def stitch_chunk_tables(
    tables, *, hysteresis: int, stream_end: int | None = None,
    emit_unclosed: bool = False, tie_last: bool = True,
    extras_list=None,
):
    """Host-side stitch of sequential per-chunk GateEvents into one event
    list (NumPy dicts).  A chunk's first gate continues the previous
    chunk's trailing gate iff ``start <= prev.close`` -- with the fused
    stream step's UNCLIPPED closes (close = last_above + h) this is the
    exact FSM gap test, the same closed-form cluster rule as the sharded
    table merge (`parallel.shard._merge_shard_event_tables`).

    `stream_end`: total stream length; clips the final close to the
    one-shot kernel's semantics (close = min(last_above + h, L - 1),
    closed iff last_above + h <= L - 1).

    `extras_list`: optional per-table dict of name -> (E,) arrays of
    capture-at-peak side channels (e.g. the AA kernel's P_re/P_im/M); the
    winning piece's captures follow its peak through merges.

    SINGLE-STREAM tables only: the fused stream steps return BATCHED
    GateEvents ((batch, E) fields); slice one stream first, e.g.
    ``[jax.tree.map(lambda a: a[b], t) for t in tables]``.  `tie_last`
    must match the kernel's tie mode (pass ``tie_last=False`` for the
    AA / ZC CFAR defaults of ``tie='first'``).

    Warns (RuntimeWarning) when any chunk's table overflowed its
    max_events capacity -- events the kernel dropped cannot be recovered
    by the stitch -- or when any event index approaches the int32
    `EPOCH_HORIZON` (the caller should have rebased earlier)."""
    import warnings

    import numpy as np

    events = []  # list of dicts, in stream order
    overflowed = []
    for t_i, tb in enumerate(tables):
        if bool(np.asarray(tb.overflow)):
            overflowed.append(t_i)
        count = np.asarray(tb.count)
        if count.ndim != 0:
            raise ValueError(
                "stitch_chunk_tables expects single-stream tables "
                f"(scalar count); got count shape {count.shape} -- slice "
                "one stream first: jax.tree.map(lambda a: a[b], table)"
            )
        n = int(count)
        starts = np.asarray(tb.gate_start)
        closes = np.asarray(tb.gate_close)
        pidxs = np.asarray(tb.peak_idx)
        pvals = np.asarray(tb.peak_value)
        extras_np = (
            {name: np.asarray(arr) for name, arr in extras_list[t_i].items()}
            if extras_list is not None else None
        )
        for k in range(n):
            ev = {
                "start": int(starts[k]),
                "close": int(closes[k]),
                "pidx": int(pidxs[k]),
                "pval": float(pvals[k]),
            }
            if extras_np is not None:
                ev["extras"] = {
                    name: arr[k] for name, arr in extras_np.items()
                }
            if events and ev["start"] <= events[-1]["close"]:
                prev = events[-1]
                better = ev["pval"] > prev["pval"] or (
                    ev["pval"] == prev["pval"]
                    and (ev["pidx"] > prev["pidx"] if tie_last
                         else ev["pidx"] < prev["pidx"])
                )
                if better:
                    prev["pidx"], prev["pval"] = ev["pidx"], ev["pval"]
                    if "extras" in ev:
                        prev["extras"] = ev["extras"]
                prev["close"] = max(prev["close"], ev["close"])
            else:
                events.append(ev)
    if overflowed:
        warnings.warn(
            f"{len(overflowed)} chunk table(s) (indices {overflowed[:8]}...) "
            "overflowed max_events capacity; events dropped by the kernel "
            "are missing from the stitched list -- raise max_events or "
            "shorten chunks",
            RuntimeWarning,
            stacklevel=2,
        )
    if events and events[-1]["close"] >= EPOCH_HORIZON - _EPOCH_WARN_MARGIN:
        warnings.warn(
            "event indices approach the int32 EPOCH_HORIZON; rebase the "
            "stream state (see epoch_headroom)",
            RuntimeWarning,
            stacklevel=2,
        )
    for ev in events:
        ev["closed"] = (
            True if stream_end is None else ev["close"] <= stream_end - 1
        )
        if stream_end is not None:
            ev["close"] = min(ev["close"], stream_end - 1)
    if not emit_unclosed:
        events = [e for e in events if e["closed"]]
    return events


class AAFusedStreamState(NamedTuple):
    """Carried state of the fused [A][A] streaming receiver: the 2L-sample
    IQ tail plus the kernel-emitted gate FSM carry (the AA metric has no
    smoothing IIR -- reference sync_aa.py:421-571 /
    docs/aa_preamble_sync_design.md §7)."""

    hist: jax.Array    # (C, batch, H) channel-leading planar IQ tail
    gate: jax.Array    # (batch, 2) i32 -- [last-above global index, flag]
    base: jax.Array    # () i32 -- global index of the next sample


def aa_fused_stream_init(
    half_len: int, batch: int, branches: int = 2
) -> AAFusedStreamState:
    H = max(((2 * half_len + 127) // 128) * 128, 128)
    C = 2 * branches
    return AAFusedStreamState(
        hist=jnp.zeros((C, batch, H), jnp.float32),
        gate=jnp.concatenate(
            [jnp.full((batch, 1), -1, jnp.int32),
             jnp.zeros((batch, 1), jnp.int32)], axis=1,
        ),
        base=jnp.zeros((), jnp.int32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("half_len", "threshold", "hysteresis", "max_events",
                     "tie"),
)
def aa_fused_stream_step(
    state: AAFusedStreamState,
    chunk: jax.Array,
    *,
    half_len: int,
    threshold: float = 0.15,
    hysteresis: int = 128,
    max_events: int = 8,
    tie: str = "first",
):
    """One fused-kernel dispatch over one [A][A] chunk.

    chunk: (C, batch, chunk_len) channel-leading planar float32.  Returns
    ``(new_state, (GateEvents, P_at_peak, M_at_peak))`` with GLOBAL event
    indices and the in-kernel CFO capture at each peak (planar (batch, 2,
    E)).  Stitch per-chunk tables with `stitch_chunk_tables` per stream,
    passing ``tie_last=(tie == 'last')`` -- the AA default is
    ``tie='first'``, so pass ``tie_last=False`` -- and the per-chunk
    extras so the winning piece's CFO capture survives the merge.
    Trailing open gates always surface (closed-ness against the stream end
    is decided by ``stitch_chunk_tables(stream_end=...)``); the int32
    index epoch is bounded by `EPOCH_HORIZON` -- check `epoch_headroom`
    and call `aa_fused_stream_rebase` on a quiet stretch before it runs
    out.  Reference parity: sync_aa.py:421-571 consumed chunk-by-chunk.
    """
    from ofdm_sync_tpu.kernels.pallas_aa import aa_detect_fused_pallas

    C, batch, Lc = chunk.shape
    H = state.hist.shape[-1]
    h = max(int(hysteresis), 1)
    chunk = chunk.astype(jnp.float32)

    la = state.gate[:, 0]
    flag = ((la >= 0) & (state.base - la <= h)).astype(jnp.int32)
    gate_init = jnp.stack([jnp.where(flag > 0, la, -1), flag], axis=1)

    table, P_pk, M_pk, gate_out = aa_detect_fused_pallas(
        chunk,
        half_len=half_len,
        threshold=threshold,
        hysteresis=hysteresis,
        max_events=max_events,
        tie=tie,
        emit_unclosed=True,
        block=Lc,
        channel_leading=True,
        base_index=state.base,
        stream_len_global=EPOCH_HORIZON,  # open-ended; see fused Minn step
        shard_init=(state.hist, gate_init),
        emit_state=True,
    )
    if Lc >= H:
        new_hist = chunk[..., -H:]
    else:
        new_hist = jnp.concatenate([state.hist, chunk], axis=-1)[..., -H:]
    new_state = AAFusedStreamState(
        hist=new_hist, gate=gate_out, base=state.base + Lc
    )
    return new_state, (table, P_pk, M_pk)


def minn_rtl_fused_stream_rebase(
    state: MinnRTLFusedStreamState, *, params: MinnRTLStreamParams
) -> MinnRTLFusedStreamState:
    """Fresh index epoch for the fused stream (same contract as
    `minn_rtl_stream_rebase`): zero the global counter -- restarting past
    the 3Q-1 warm-up, since the carried IQ tail keeps the metric valid --
    and drop any stale gate carry.  Rebase on a quiet stretch; an event
    index ``gi`` from later chunks maps to
    ``rebase_point + gi - (3Q - 1)`` globally."""
    valid_from = max(0, 3 * params.quarter_len - 1)
    batch = state.gate.shape[0]
    return MinnRTLFusedStreamState(
        hist=state.hist,
        carry=state.carry,
        gate=jnp.concatenate(
            [jnp.full((batch, 1), -1, jnp.int32),
             jnp.zeros((batch, 1), jnp.int32)], axis=1,
        ),
        base=jnp.asarray(valid_from, jnp.int32),
    )


def aa_fused_stream_rebase(
    state: AAFusedStreamState, *, half_len: int
) -> AAFusedStreamState:
    """Fresh index epoch for the fused [A][A] stream (counter restarts past
    the 2L-1 warm-up; stale gate carry dropped -- rebase on a quiet
    stretch)."""
    batch = state.gate.shape[0]
    return AAFusedStreamState(
        hist=state.hist,
        gate=jnp.concatenate(
            [jnp.full((batch, 1), -1, jnp.int32),
             jnp.zeros((batch, 1), jnp.int32)], axis=1,
        ),
        base=jnp.asarray(2 * half_len - 1, jnp.int32),
    )


class ZCCFARFusedStreamState(NamedTuple):
    """Carried state of the fused ZC CFAR streaming receiver over
    matched-filter magnitudes (reference zc_v2.py:288-336): the W-sample
    magnitude tail plus the kernel-emitted gate FSM carry."""

    hist: jax.Array    # (batch, H) trailing corr magnitudes
    gate: jax.Array    # (batch, 2) i32 -- [last-above global index, flag]
    base: jax.Array    # () i32 -- global index of the next sample


def zc_cfar_fused_stream_init(
    corr_window: int, batch: int
) -> ZCCFARFusedStreamState:
    H = max(((corr_window + 127) // 128) * 128, 128)
    return ZCCFARFusedStreamState(
        hist=jnp.zeros((batch, H), jnp.float32),
        gate=jnp.concatenate(
            [jnp.full((batch, 1), -1, jnp.int32),
             jnp.zeros((batch, 1), jnp.int32)], axis=1,
        ),
        base=jnp.zeros((), jnp.int32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("corr_window", "threshold_value",
                     "threshold_frac_bits", "min_corr_mag", "hysteresis",
                     "max_events", "tie"),
)
def zc_cfar_fused_stream_step(
    state: ZCCFARFusedStreamState,
    chunk: jax.Array,
    *,
    corr_window: int = 2048,
    threshold_value: int | None = None,
    threshold_frac_bits: int = 15,
    min_corr_mag: float = 0.3,
    hysteresis: int = 256,
    max_events: int = 16,
    tie: str = "first",
):
    """One fused-kernel dispatch over one chunk of matched-filter
    magnitudes ((batch, chunk_len) float32).  Returns ``(new_state,
    GateEvents)`` with GLOBAL indices; stitch per-chunk tables with
    `stitch_chunk_tables(tie_last=False)` (reference zc_v2 selects the
    strongest event from the stitched list, zc_v2.py:567-576).  Trailing
    open gates always surface (closed-ness is decided by
    ``stitch_chunk_tables(stream_end=...)``); the int32 index epoch is
    bounded by `EPOCH_HORIZON` -- check `epoch_headroom` between chunks."""
    from ofdm_sync_tpu.kernels.pallas_zc import zc_cfar_detect_pallas

    batch, Lc = chunk.shape
    H = state.hist.shape[-1]
    h = max(int(hysteresis), 1)
    chunk = chunk.astype(jnp.float32)

    la = state.gate[:, 0]
    flag = ((la >= 0) & (state.base - la <= h)).astype(jnp.int32)
    gate_init = jnp.stack([jnp.where(flag > 0, la, -1), flag], axis=1)

    table, gate_out = zc_cfar_detect_pallas(
        chunk,
        corr_window=corr_window,
        threshold_value=threshold_value,
        threshold_frac_bits=threshold_frac_bits,
        min_corr_mag=min_corr_mag,
        hysteresis=hysteresis,
        max_events=max_events,
        tie=tie,
        emit_unclosed=True,
        block=Lc,
        base_index=state.base,
        stream_len_global=EPOCH_HORIZON,  # open-ended; see fused Minn step
        shard_init=(state.hist, gate_init),
        emit_state=True,
    )
    if Lc >= H:
        new_hist = chunk[..., -H:]
    else:
        new_hist = jnp.concatenate([state.hist, chunk], axis=-1)[..., -H:]
    new_state = ZCCFARFusedStreamState(
        hist=new_hist, gate=gate_out, base=state.base + Lc
    )
    return new_state, table
