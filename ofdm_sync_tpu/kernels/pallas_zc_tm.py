"""Time-major fused Pallas kernel for the from-IQ ZC CFAR detector (D7).

The lane-major from-IQ kernel (`pallas_zc.zc_iq_cfar_detect_pallas`) is
bound by its two 2048-sample lane-ladders (the ref-window sliding energy
and the CFAR running sum): each doubling step is a sub-lane LANE roll that
costs ~3x a vector add, and measured throughput sits at 1.55 G samples/s --
10x below the fused-kernel family's pace (docs/design.md §8 named the
time-major layout the next lever).  This kernel transposes the problem the
same way `pallas_minn_tm` does: **time runs down the sublane (row) axis,
128 parallel streams occupy the lanes**, so every window shift becomes a
sublane concatenation (free at multiples of 8 rows) and the ladders stop
dominating VPU issue.

Input layout -- the same tiled stream buffer as `pallas_minn_tm`:

    x[(g * NT + t), c * R + r, s]  =  stream (g*128 + s), channel plane c,
                                      sample (t * R + r)

with TWO buffers of identical shape (G * NT, C * R, 128): the planar
matched-filter output rows [b0_re, b0_im, b1_re, b1_im] (full-convolution
length Lc = L + ref_len - 1) and the planar received IQ rows
[b0_i, b0_q, b1_i, b1_q] zero-padded to the same Lc.  Build both with
`to_time_tiled`, or ingest directly.  Padding rows MUST be zero (they are
inside the causal reach of in-range window sums only through indices
>= L_true, which are masked).

Per grid step the kernel consumes R rows x 128 streams of each buffer and
runs the whole zc_v2 datapath in VMEM: per-branch sliding energy over
ref_len, `ref_norm * sqrt` normalization, branch sum, magnitude, the
W-window CFAR threshold with absolute floor, and the gate/hysteresis/peak
event FSM -- none of the five full-length intermediates of the XLA form
touch HBM.  Arithmetic mirrors `pallas_zc._zc_iq_kernel` op for op, so
event tables match the lane-major kernel and the XLA detector path.

Shard mode (multi-chip seq sharding, `parallel.shard.sharded_zc_iq_detect_tm`):
`base_index` offsets emitted indices to global stream positions, and
`shard_init` carries the neighbor shard's trailing (ref_len-1 + W + h)
rows of BOTH buffers.  Unlike the Minn kernels (whose smoothing carry is
XLA-primed), the ZC halo is pushed through the full datapath INSIDE the
kernel at grid step 0 -- the same Mosaic ladders compute the halo's
energies/magnitudes/gate state, so sharded event tables are bit-identical
to the unsharded kernel's, with no float-association caveat at the seam.

Reference parity: zc_v2.py:119-158, 244-336, 486-498 (semantics unchanged).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ofdm_sync_tpu.kernels import pallas_tm_common as tm

LANES = tm.LANES
_round_up = tm.round_up
_row_iota = tm.row_iota

to_time_tiled = tm.to_time_tiled
from_time_tiled = tm.from_time_tiled


def zc_tm_halo_rows(ref_len: int, corr_window: int, hysteresis: int) -> int:
    """Shard-halo depth (rows of BOTH buffers) for exact seam priming:
    the oldest CFAR decision needed for gate priming sits h rows back, its
    local sum reaches W further, and the oldest magnitude in that sum needs
    ref_len-1 rows of energy history."""
    h = max(int(hysteresis), 1)
    # +8: the primed mhist keeps round_up(W, 8) rows, so the oldest kept
    # magnitude must still clear the ref_len-1 energy warm-up even when
    # h < the rounding slack
    return _round_up(ref_len - 1 + corr_window + h, 8) + 8


def _zc_iq_tm_kernel(
    *refs,
    # ref order: [base (SMEM, shard mode)] mf_ref iq_ref [mf_halo, iq_halo
    # (shard-init mode)] then the 7 event-table outputs and scratch:
    #   phist_ref  (BR*HE, LANES) per-branch power history (energy window)
    #   mhist_ref  (H, LANES) corr-magnitude history (CFAR window)
    #   gate/tstart/tlast/tpidx/tpval event scratch
    BR: int,
    C: int,
    R: int,
    RF: int,
    W: int,
    HE: int,
    H: int,
    WhR: int,
    ref_norm: float,
    threshold_value: int,
    threshold_frac_bits: int,
    min_corr_mag: float,
    hysteresis: int,
    max_events: int,
    L_true: int,
    batch_last: int,
    tie_last: bool,
    emit_unclosed: bool,
    L_global: int | None = None,
    with_base: bool = False,
    with_init: bool = False,
    fused_buf: bool = False,
):
    i = 0
    if with_base:
        base = refs[i][0]
        i += 1
    else:
        base = None
    if fused_buf:
        # ONE interleaved buffer: [mf planes; iq planes] stacked row-major
        # inside each block -- a single DMA stream (the two-stream form
        # measures ~202 GB/s vs ~296 single-stream; tools/perf_probe10/12)
        x_ref = refs[i]
        i += 1
    else:
        mf_ref = refs[i]
        iq_ref = refs[i + 1]
        i += 2
    if with_init:
        mfh_ref, iqh_ref = refs[i : i + 2]
        i += 2
    (valid_ref, closed_ref, start_ref, close_ref, pidx_ref, pval_ref,
     meta_ref, phist_ref, mhist_ref, gate_ref, tstart_ref, tlast_ref,
     tpidx_ref, tpval_ref) = refs[i:]
    it = pl.program_id(1)
    h = max(int(hysteresis), 1)
    Lg = L_true if L_global is None else L_global

    @pl.when(it == 0)
    def _():
        tm.event_scratch_init(
            gate_ref, tstart_ref, tlast_ref, tpidx_ref, tpval_ref,
            tie_last=tie_last,
        )
        if not with_init:
            phist_ref[...] = jnp.zeros_like(phist_ref)
            mhist_ref[...] = jnp.zeros_like(mhist_ref)
        else:
            # shard-init: run the neighbor's trailing WhR rows through the
            # SAME datapath the main body uses (identical Mosaic ladders ->
            # bit-identical history; see module docstring).  window_sum
            # wrap garbage stays in rows < RF-1 (energy) and < RF-1 + W-1
            # (CFAR sum); every consumed row is deeper than that.
            mfh = mfh_ref[0]  # (C*WhR, LANES)
            iqh = iqh_ref[0]
            if iqh.dtype != jnp.float32:
                iqh = iqh.astype(jnp.float32)
            re_h = None
            im_h = None
            pls = []
            for b in range(BR):
                ih = iqh[(2 * b) * WhR : (2 * b + 1) * WhR]
                qh = iqh[(2 * b + 1) * WhR : (2 * b + 2) * WhR]
                ph = ih * ih + qh * qh
                pls.append(ph[-HE:])
                eh = tm.window_sum_rows(ph, RF)
                inv = jnp.float32(1.0) / (
                    jnp.float32(ref_norm)
                    * jnp.sqrt(jnp.maximum(eh, jnp.float32(1e-12)))
                )
                rb = mfh[(2 * b) * WhR : (2 * b + 1) * WhR] * inv
                ib = mfh[(2 * b + 1) * WhR : (2 * b + 2) * WhR] * inv
                re_h = rb if re_h is None else re_h + rb
                im_h = ib if im_h is None else im_h + ib
            phist_ref[...] = jnp.concatenate(pls, axis=0)
            magh = jnp.sqrt(re_h * re_h + im_h * im_h)
            mhist_ref[...] = magh[-H:]

            # gate priming from the halo's final h rows (exact CFAR
            # decisions: their W-window local sums are fully supported)
            localh = tm.window_sum_rows(magh, W)
            rh = _row_iota(WhR)
            gih = (base if base is not None else 0) - WhR + rh
            aboveh = (
                (rh >= WhR - h)
                & (gih >= W)
                & (magh * jnp.float32(1 << threshold_frac_bits)
                   >= localh * jnp.float32(threshold_value))
                & (magh >= jnp.float32(min_corr_mag))
            )
            la = jnp.max(
                jnp.where(aboveh, jnp.broadcast_to(gih, (WhR, LANES)),
                          jnp.int32(-1)),
                axis=0, keepdims=True,
            )  # (1, LANES); within h of the seam by construction
            flag = (la >= 0).astype(jnp.int32)
            grow = _row_iota(gate_ref.shape[0])
            gate_ref[...] = jnp.where(
                grow == 0,
                jnp.broadcast_to(la, gate_ref.shape),
                jnp.where(
                    grow == 1, jnp.broadcast_to(flag, gate_ref.shape),
                    gate_ref[...],
                ),
            )

    if fused_buf:
        x = x_ref[0]  # (2*C*R, LANES)
        mf = x[: C * R]
        iq = x[C * R :]
    else:
        mf = mf_ref[0]  # (C*R, LANES)
        iq = iq_ref[0]
    if iq.dtype != jnp.float32:
        # int16 ADC ingest: half the IQ DMA bytes, converted in VMEM --
        # integer-valued floats, so results are bit-identical to a
        # pre-converted f32 buffer (same contract as pallas_minn_tm)
        iq = iq.astype(jnp.float32)

    # --- per-branch sliding energy over ref_len rows -------------------
    # (reference zc_v2.py:257-271 / ops.metrics.sliding_energy_full: the
    # R-window sum of |x|^2 aligned to the 'full'-convolution index axis;
    # zero padding past L_iq keeps out-of-range taps at zero)
    exts = []
    new_ph = []
    for b in range(BR):
        i_ = iq[(2 * b) * R : (2 * b + 1) * R]
        q_ = iq[(2 * b + 1) * R : (2 * b + 2) * R]
        p = i_ * i_ + q_ * q_
        ext = jnp.concatenate(
            [phist_ref[b * HE : (b + 1) * HE], p], axis=0
        )  # (HE+R, LANES)
        new_ph.append(ext[-HE:])
        exts.append(ext)
    phist_ref[...] = jnp.concatenate(new_ph, axis=0)
    pz = jnp.stack(exts, axis=0)  # (BR, HE+R, LANES)
    # ladder wrap garbage stays in rows < RF - 1 <= HE, sliced off here
    energy = tm.window_sum_rows(pz, RF)[:, HE:, :]  # (BR, R, LANES)

    # --- normalization + branch sum + magnitude ------------------------
    # same op sequence as pallas_zc._zc_iq_kernel (bit-compatible)
    denom = jnp.float32(ref_norm) * jnp.sqrt(
        jnp.maximum(energy, jnp.float32(1e-12))
    )
    inv = jnp.float32(1.0) / denom  # (BR, R, LANES)
    re = sum(mf[(2 * b) * R : (2 * b + 1) * R] * inv[b] for b in range(BR))
    im = sum(
        mf[(2 * b + 1) * R : (2 * b + 2) * R] * inv[b] for b in range(BR)
    )
    mag = jnp.sqrt(re * re + im * im)  # (R, LANES)

    # --- CFAR: mag vs local W-window running sum -----------------------
    mext = jnp.concatenate([mhist_ref[...], mag], axis=0)  # (H+R, LANES)
    mhist_ref[...] = mext[-H:]
    local_sum = tm.window_sum_rows(mext, W)[H:]  # (R, LANES)

    gi_local = it * R + _row_iota(R)  # (R, 1) local sample index
    gi_col = gi_local if base is None else gi_local + base  # global index
    valid = gi_col >= W
    above = (
        valid
        & (mag * jnp.float32(1 << threshold_frac_bits)
           >= local_sum * jnp.float32(threshold_value))
        & (mag >= jnp.float32(min_corr_mag))
        & (gi_local < L_true)
    )
    if base is not None:
        above = above & (gi_col < Lg)
    if batch_last < LANES:
        # zero-padded streams in the last group: mag == 0 passes the CFAR
        # compare (0 >= 0) whenever min_corr_mag == 0; mask them so they
        # never wake the event machinery
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        above = above & (
            (pl.program_id(0) < pl.num_programs(0) - 1)
            | (lane < batch_last)
        )

    # peak tracking stops at this shard's LOCAL stream end (padding rows
    # carry partial-window garbage); close/validity semantics keep the
    # global length in event_finalize (mirrors pallas_minn_tm._tm_kernel)
    block_start = it * R if base is None else base + it * R
    track_end = Lg if base is None else jnp.minimum(
        jnp.int32(Lg), base + L_true
    )
    tm.event_update(
        above, mag, gi_col, block_start,
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
        "ref_len", "ref_norm", "corr_window", "threshold_value",
        "threshold_frac_bits", "min_corr_mag", "hysteresis", "max_events",
        "tie", "emit_unclosed", "rows", "stream_len", "batch", "interpret",
        "stream_len_global",
    ),
)
def zc_iq_cfar_detect_tm(
    mf_tiled: jax.Array,
    iq_tiled: jax.Array | None,
    *,
    ref_len: int,
    ref_norm: float,
    stream_len: int,
    batch: int,
    corr_window: int = 2048,
    threshold_value: int | None = None,
    threshold_frac_bits: int = 15,
    min_corr_mag: float = 0.3,
    hysteresis: int = 256,
    max_events: int = 16,
    tie: str = "first",
    emit_unclosed: bool = True,
    rows: int = 4096,
    interpret: bool | None = None,
    base_index: jax.Array | None = None,
    stream_len_global: int | None = None,
    shard_init: tuple | None = None,
    branches: int = 2,
):
    """Fully-fused time-major from-IQ ZC detection on tiled stream buffers.

    mf_tiled / iq_tiled: (G*NT, C*rows, 128) tiled stream buffers
    (see module docstring; both padded to the same correlation length
    `stream_len` = L + ref_len - 1, padding rows zero).  mf_tiled is
    float32; iq_tiled may be float32 **or int16** (the ADC ingest dtype:
    half the IQ DMA bytes, converted in VMEM, bit-identical results).
    Returns `GateEvents` with (batch, max_events) tables -- the same
    semantics and defaults as `pallas_zc.zc_iq_cfar_detect_pallas`.

    FUSED-BUFFER mode: pass ``iq_tiled=None`` and a single
    (G*NT, 2*C*rows, 128) buffer in `mf_tiled` with the iq planes stacked
    AFTER the mf planes inside each block ([mf rows; iq rows]).  Same
    bytes, ONE DMA stream -- the production ingest writes iq planes and
    the matched-filter pass writes its outputs into the mf planes of the
    same (donated) buffer, so no extra copy exists end-to-end; measured
    ~1.4x the two-buffer form (tools/perf_probe12, docs/design.md §8).
    `branches` disambiguates C in this mode; no shard mode yet (the
    two-buffer form carries the sharding contract).

    Shard mode: `base_index` (dynamic int32 scalar) is the global
    correlation-output position of this shard's first sample;
    `stream_len_global` the global length for close/validity semantics;
    `shard_init` = (mf_halo, iq_halo), each (C, batch, Wh) with
    Wh = `zc_tm_halo_rows(ref_len, corr_window, hysteresis)` --
    right-aligned trailing rows of the LEFT neighbor's buffers (zeros for
    shard 0).  The kernel pushes the halo through its own datapath at grid
    step 0, so sharded tables are bit-identical to unsharded (no
    XLA-priming float caveat).  Emitted indices are then global.
    """
    from ofdm_sync_tpu.ops.detect import GateEvents

    if threshold_value is None:
        threshold_value = int(
            4.0 * (1 << threshold_frac_bits) / corr_window
        )
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if max_events > LANES:
        raise ValueError(f"max_events must be <= {LANES}")
    fused_buf = iq_tiled is None
    if not fused_buf and mf_tiled.shape != iq_tiled.shape:
        raise ValueError(
            f"mf/iq tiled buffers must share a shape; got {mf_tiled.shape} "
            f"vs {iq_tiled.shape}"
        )

    R = rows
    nblk, CR, lanes = mf_tiled.shape
    assert lanes == LANES, f"tiled buffer must have {LANES} lanes"
    if fused_buf:
        if shard_init is not None:
            raise NotImplementedError(
                "fused-buffer mode has no shard contract; use the "
                "two-buffer form for seq sharding"
            )
        C = 2 * branches
        if CR != 2 * C * R:
            raise ValueError(
                f"fused buffer must have 2*{C}*{R} plane rows; got {CR}"
            )
    else:
        C = CR // R
        assert C * R == CR, (C, R, CR)
    BR = C // 2
    NT = _round_up(stream_len, R) // R
    G = nblk // NT
    assert G * NT == nblk, (G, NT, nblk)
    W = corr_window
    RF = ref_len
    HE = _round_up(max(RF, 8), 8)
    H = _round_up(max(W, 8), 8)
    WhR = zc_tm_halo_rows(RF, W, hysteresis)
    SLOTR = _round_up(max_events, 8)
    with_base = base_index is not None
    with_init = shard_init is not None

    kernel = functools.partial(
        _zc_iq_tm_kernel,
        BR=BR, C=C, R=R, RF=RF, W=W, HE=HE, H=H, WhR=WhR,
        ref_norm=float(ref_norm),
        threshold_value=threshold_value,
        threshold_frac_bits=threshold_frac_bits,
        min_corr_mag=min_corr_mag,
        hysteresis=hysteresis,
        max_events=max_events,
        L_true=stream_len,
        batch_last=batch - (G - 1) * LANES,
        tie_last=(tie == "last"),
        emit_unclosed=emit_unclosed,
        L_global=stream_len_global,
        with_base=with_base, with_init=with_init, fused_buf=fused_buf,
    )
    i32 = jnp.int32
    ev = lambda dt: jax.ShapeDtypeStruct((G, SLOTR, LANES), dt)  # noqa: E731
    out_shape = [
        ev(jnp.uint8), ev(jnp.uint8), ev(i32), ev(i32), ev(i32),
        ev(jnp.float32), ev(i32),
    ]
    ev_spec = pl.BlockSpec((1, SLOTR, LANES), lambda g, t: (g, 0, 0))
    blk_spec = pl.BlockSpec(
        (1, CR, LANES), lambda g, t, NT=NT: (g * NT + t, 0, 0)
    )
    if fused_buf:
        in_specs = [blk_spec]
        operands = [mf_tiled]
    else:
        in_specs = [blk_spec, blk_spec]
        operands = [mf_tiled, iq_tiled]
    if with_init:
        # (C, batch, Wh) halo pair -> per-group tiled rows (G, C*WhR, LANES)
        mf_halo, iq_halo = shard_init
        GB = G * LANES
        hspec = pl.BlockSpec((1, C * WhR, LANES), lambda g, t: (g, 0, 0))

        def tile_halo(hl):
            hl = jnp.asarray(hl)
            wl = min(hl.shape[-1], WhR)
            hp = jnp.zeros((C, GB, WhR), hl.dtype)
            hp = hp.at[:, :batch, WhR - wl :].set(hl[..., -wl:])
            hp = hp.reshape(C, G, LANES, WhR).transpose(1, 0, 3, 2)
            return hp.reshape(G, C * WhR, LANES)

        in_specs += [hspec, hspec]
        operands += [tile_halo(mf_halo), tile_halo(iq_halo)]
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
            pltpu.VMEM((BR * HE, LANES), jnp.float32),
            pltpu.VMEM((H, LANES), jnp.float32),
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


def zc_iq_cfar_detect_tm_planar(
    mf: jax.Array,
    iq: jax.Array,
    *,
    ref_len: int,
    ref_norm: float,
    rows: int = 4096,
    **kw,
):
    """Convenience wrapper over channel-leading planar arrays.

    mf: (2*BR, batch, Lc) planar matched-filter output; iq: (2*BR, batch,
    L) planar IQ (padded to Lc here).  Pays the one-HBM-transpose tiling
    (`to_time_tiled`); production receivers that ingest the tiled layout
    directly call `zc_iq_cfar_detect_tm` and skip it.
    """
    C, batch, Lc = mf.shape
    L_iq = iq.shape[-1]
    iqp = jnp.zeros((C, batch, Lc), jnp.float32)
    iqp = iqp.at[..., :L_iq].set(iq.astype(jnp.float32))
    mft, G, NT = to_time_tiled(mf.astype(jnp.float32), rows)
    iqt, _, _ = to_time_tiled(iqp, rows)
    return zc_iq_cfar_detect_tm(
        mft, iqt, ref_len=ref_len, ref_norm=ref_norm,
        stream_len=Lc, batch=batch, rows=rows, **kw,
    )
