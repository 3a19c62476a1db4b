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

from ofdm_sync_tpu.kernels.streaming import MinnRTLFastState

_LANE = 128


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _shiftz(x: jax.Array, d: int, fill: float = 0.0) -> jax.Array:
    """``y[..., n] = x[..., n - d]`` with `fill` for ``n < d`` (last axis).

    Two lowerings chosen by alignment:
      * d a lane multiple: concat of a (…, d) fill block with a static slice
        -- one buffer, no mask, and keeps Mosaic's scoped-VMEM stack small
        (the big 3-D ext shifts in the flagship Q=512 config are all lane
        aligned).
      * small/unaligned d: lane roll + iota mask (sub-lane concats crash the
        Mosaic lowering; these only occur on the 2-D doubling-ladder arrays,
        where the iota temporaries are cheap).
    """
    if d == 0:
        return x
    if d % _LANE == 0:
        prefix = jnp.full(x.shape[:-1] + (d,), fill, dtype=x.dtype)
        return jnp.concatenate([prefix, x[..., : x.shape[-1] - d]], axis=-1)
    rolled = pltpu.roll(x, d, axis=x.ndim - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(lane >= d, rolled, jnp.full_like(x, fill))


def _window_sum(x: jax.Array, window: int) -> jax.Array:
    """Causal running sum over `window` samples, zero-primed history.

    Equal to `ops.windows.running_sum_stream` (reference
    ref/minn_running_sum.sv:50-99 semantics): log-depth doubling ladder
    combined along the binary digits of `window`.
    """
    assert window >= 1
    out = None
    s = x  # ladder term: running sum over 2^k samples
    offset = 0
    maxbit = window.bit_length()
    for k in range(maxbit):
        if (window >> k) & 1:
            contrib = _shiftz(s, offset)
            out = contrib if out is None else out + contrib
            offset += 1 << k
        if k + 1 < maxbit:
            s = s + _shiftz(s, 1 << k)
    return out


def _affine_scan(a: jax.Array, b: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Inclusive scan of affine maps ``s -> a*s + b`` along the last axis.

    Returns (A, B) with ``s[n] = A[n] * s_in + B[n]`` where s_in is the state
    entering the block.  Hillis-Steele: log2(n) vector steps.
    """
    A, B = a, b
    d = 1
    n = a.shape[-1]
    while d < n:
        A_prev = _shiftz(A, d, fill=1.0)
        B_prev = _shiftz(B, d, fill=0.0)
        B = B_prev * A + B
        A = A_prev * A
        d *= 2
    return A, B


def _minn_kernel(
    x_ref,
    corr_ref,
    smooth_ref,
    energy_ref,
    above_ref,
    hist_ref,
    carry_ref,
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

    x = x_ref[...]  # (NB, C, B) planar float32 rows: [b0_i, b0_q, b1_i, ...]
    ext = jnp.concatenate([hist_ref[...], x], axis=-1)  # (NB, C, H+B)
    hist_ref[...] = ext[..., -H:]

    # Branch/plane combine FIRST (the RTL sums correlation and power across
    # antennas, reference ref/minn_preamble_detector.sv:247-260; the I/Q plane
    # sum is the real part of x * conj(x_delayed)) -- the window sums are
    # linear, so combining early quarters the VPU work.
    u = jnp.sum(ext * _shiftz(ext, Q), axis=1)  # (NB, H+B) quarter product
    p = jnp.sum(ext * ext, axis=1)  # (NB, H+B) instantaneous power

    corr = _window_sum(u, Q)
    energy = _window_sum(p, Q)
    corr_total = corr + _shiftz(corr, Q)
    energy_total = energy + _shiftz(energy, Q) + _shiftz(energy, 2 * Q)

    corr_pos = jnp.maximum(corr_total[..., H:], 0.0)  # (NB, B)
    energy_out = energy_total[..., H:]

    gi = it * B + jax.lax.broadcasted_iota(jnp.int32, corr_pos.shape, 1)
    valid = gi >= valid_from

    # smoothing IIR s[n] = (1-alpha) s[n-1] + alpha c[n], frozen where invalid
    a = jnp.where(valid, jnp.float32(1.0 - alpha), jnp.float32(1.0))
    b = jnp.where(valid, jnp.float32(alpha) * corr_pos, jnp.float32(0.0))
    A, Bv = _affine_scan(a, b)
    carry_in = carry_ref[..., :1]  # (NB, 1)
    smooth = A * carry_in + Bv
    carry_ref[...] = jnp.broadcast_to(smooth[..., -1:], carry_ref.shape)

    scaled = smooth * jnp.float32(1 << threshold_frac_bits)
    above = valid & (scaled >= energy_out * jnp.float32(threshold_value))

    corr_ref[...] = corr_pos
    smooth_ref[...] = smooth
    energy_ref[...] = energy_out
    above_ref[...] = above.astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=(
        "quarter_len",
        "smooth_shift",
        "threshold_value",
        "threshold_frac_bits",
        "block",
        "batch_tile",
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
    interpret: bool | None = None,
) -> MinnRTLFastState:
    """Fused-kernel equivalent of `streaming.minn_rtl_metric_planar`.

    iq: (batch, branches, 2, L) or (branches, 2, L) planar float32.
    Returns MinnRTLFastState with per-stream (batch, L) arrays (or (L,) when
    unbatched); `above_threshold` is bool.  Matches the XLA path up to float
    reassociation of the window sums (tests assert tight tolerances).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    squeeze = iq.ndim == 3
    if squeeze:
        iq = iq[None]
    batch, branches, planes, L = iq.shape
    assert planes == 2, "expected planar (..., 2, L) IQ"
    Q = quarter_len
    valid_from = max(0, 3 * Q - 1)
    alpha = 1.0 / (1 << smooth_shift) if smooth_shift > 0 else 1.0

    C = branches * planes
    x = iq.astype(jnp.float32).reshape(batch, C, L)

    B = min(block, _round_up(L, _LANE))
    Lp = _round_up(L, B)
    # Mosaic requires the sublane dim of 2-D output blocks to be a multiple
    # of 8 (or the full array dim); round the batch tile up and zero-pad.
    NB = _round_up(min(batch_tile, batch), 8)
    Np = _round_up(batch, NB)
    H = _round_up(max(3 * Q, _LANE), _LANE)

    if Lp != L or Np != batch:
        xp = jnp.zeros((Np, C, Lp), jnp.float32)
        x = xp.at[:batch, :, :L].set(x)
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
        in_specs=[pl.BlockSpec((NB, C, B), lambda ib, it: (ib, 0, it))],
        out_specs=[out_spec, out_spec, out_spec, out_spec],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((NB, C, H), jnp.float32),
            pltpu.VMEM((NB, _LANE), jnp.float32),
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
