#!/usr/bin/env python
"""Decompose the fused Minn-RTL kernel's per-block cost on the real chip.

Times a ladder of stripped kernel variants (input DMA only -> +history
concat -> +lag products -> +window ladders -> full metric) plus candidate
restructurings (no-ext boundary-corrected window sums), all at the bench
workload shape, to locate the throughput floor and the next lever.

Usage: python tools/perf_probe.py [--block 16384] [--variants p0,p1,...]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ofdm_sync_tpu.kernels import pallas_common as common
from ofdm_sync_tpu.kernels.pallas_minn import (
    _init_decay,
    minn_rtl_detect_fused_pallas,
)

_LANE = common.LANE
_shiftz = common.shiftz
_window_sum = common.window_sum

Q = 512
SMOOTH_SHIFT = 3
FRAC_BITS = 15
THRESH = int(0.10 * (1 << 15))
HYST = 2
BRANCHES = 2
C = 2 * BRANCHES


def _make_kernel(stage: str, *, Qv: int, H: int, B: int, alpha: float):
    """Stripped variants of the _metric_block datapath."""

    def kernel(x_ref, out_ref, hist_ref, carry_ref, dec_ref):
        it = pl.program_id(1)

        @pl.when(it == 0)
        def _():
            hist_ref[...] = jnp.zeros_like(hist_ref)
            carry_ref[...] = jnp.zeros_like(carry_ref)
            _init_decay(dec_ref, alpha)

        x = x_ref[...]
        if stage == "dma":
            out_ref[...] = jnp.sum(x, axis=(0, 2), keepdims=False)[
                :, None
            ] + jnp.zeros_like(out_ref)
            return
        ext = jnp.concatenate([hist_ref[...], x], axis=-1)
        hist_ref[...] = ext[..., -H:]
        if stage == "concat":
            out_ref[...] = jnp.sum(ext, axis=(0, 2))[:, None] + jnp.zeros_like(
                out_ref
            )
            return
        u = jnp.sum(ext * _shiftz(ext, Qv), axis=0)
        p = jnp.sum(ext * ext, axis=0)
        if stage == "lag":
            out_ref[...] = jnp.sum(u + p, axis=-1)[:, None] + jnp.zeros_like(
                out_ref
            )
            return
        corr_total = _window_sum(u, 2 * Qv)
        energy_total = _window_sum(p, 3 * Qv)
        corr_pos = jnp.maximum(corr_total[..., H:], 0.0)
        energy_out = energy_total[..., H:]
        if stage == "ladders":
            out_ref[...] = jnp.sum(corr_pos + energy_out, axis=-1)[
                :, None
            ] + jnp.zeros_like(out_ref)
            return
        # full metric: smoothing scan + threshold
        gi = it * B + jax.lax.broadcasted_iota(jnp.int32, corr_pos.shape, 1)
        valid = gi >= (3 * Qv - 1)
        Bv = jnp.where(valid, jnp.float32(alpha) * corr_pos, jnp.float32(0.0))
        step = 1
        decay = 1.0 - alpha
        while step < B:
            Bv = _shiftz(Bv, step, fill=0.0) * jnp.float32(decay**step) + Bv
            step *= 2
        carry_in = carry_ref[..., :1]
        smooth = dec_ref[...] * carry_in + Bv
        carry_ref[...] = jnp.broadcast_to(smooth[..., -1:], carry_ref.shape)
        scaled = smooth * jnp.float32(1 << FRAC_BITS)
        above = valid & (scaled >= energy_out * jnp.float32(THRESH))
        out_ref[...] = jnp.sum(
            corr_pos + jnp.where(above, 1.0, 0.0), axis=-1
        )[:, None] + jnp.zeros_like(out_ref)

    return kernel


def _roll(x, d):
    """Wrap-around lane shift (no fill mask): y[..., n] = x[..., (n - d) % L].
    Lanes n < d receive wrapped tail garbage -- only safe when those lanes
    are discarded downstream (the ext overlap-save region)."""
    return pltpu.roll(x, d, axis=x.ndim - 1)


def _window_sum_wrap(x, window: int):
    """window_sum with wrap-shifts: output lanes >= window-1 are exact,
    lanes < window-1 contain garbage (must lie inside the discarded H head)."""
    out = None
    s = x
    offset = 0
    maxbit = window.bit_length()
    for k in range(maxbit):
        if (window >> k) & 1:
            contrib = _roll(s, offset) if offset else s
            out = contrib if out is None else out + contrib
            offset += 1 << k
        if k + 1 < maxbit:
            s = s + _roll(s, 1 << k)
    return out


def _smooth_scan_fast(corr_pos, valid, carry_ref, dec_ref, *, B, alpha):
    """Constant-coefficient IIR scan with a 128-lane zero guard so the
    sub-lane doubling steps can use unmasked wrap-rolls."""
    G = _LANE
    decay = 1.0 - alpha
    Bv = jnp.where(valid, jnp.float32(alpha) * corr_pos, jnp.float32(0.0))
    Bv = jnp.concatenate(
        [jnp.zeros(Bv.shape[:-1] + (G,), jnp.float32), Bv], axis=-1
    )
    step = 1
    while step < G and np.float32(decay**step) != 0.0:
        Bv = _roll(Bv, step) * jnp.float32(decay**step) + Bv
        step *= 2
    # zero the (partially wrap-corrupted) guard before the aligned steps
    lane = jax.lax.broadcasted_iota(jnp.int32, Bv.shape, Bv.ndim - 1)
    Bv = jnp.where(lane >= G, Bv, 0.0)
    # once decay**step underflows to 0.0f the remaining doubling steps are
    # exact no-ops (Bv += shifted * 0.0) -- skip them
    while step < B and np.float32(decay**step) != 0.0:
        Bv = _shiftz(Bv, step, fill=0.0) * jnp.float32(decay**step) + Bv
        step *= 2
    Bv = Bv[..., G:]
    carry_in = carry_ref[..., :1]
    smooth = dec_ref[...] * carry_in + Bv
    carry_ref[...] = jnp.broadcast_to(smooth[..., -1:], carry_ref.shape)
    return smooth


def _make_fast_kernel(*, Qv: int, H: int, B: int, alpha: float):
    """Full metric datapath with unmasked wrap-roll ladders."""

    def kernel(x_ref, out_ref, hist_ref, carry_ref, dec_ref):
        it = pl.program_id(1)

        @pl.when(it == 0)
        def _():
            hist_ref[...] = jnp.zeros_like(hist_ref)
            carry_ref[...] = jnp.zeros_like(carry_ref)
            _init_decay(dec_ref, alpha)

        x = x_ref[...]
        ext = jnp.concatenate([hist_ref[...], x], axis=-1)
        hist_ref[...] = ext[..., -H:]
        # wrap-roll Q-shift: garbage lanes < Q never reach valid outputs
        # (window outputs >= H only read u lanes >= H - 2Q + 1 > Q)
        u = jnp.sum(ext * _roll(ext, Qv), axis=0)
        p = jnp.sum(ext * ext, axis=0)
        # wrap-roll ladders: garbage lanes < W-1 <= H are sliced off below
        corr_total = _window_sum_wrap(u, 2 * Qv)
        energy_total = _window_sum_wrap(p, 3 * Qv)
        corr_pos = jnp.maximum(corr_total[..., H:], 0.0)
        energy_out = energy_total[..., H:]
        gi = it * B + jax.lax.broadcasted_iota(jnp.int32, corr_pos.shape, 1)
        valid = gi >= (3 * Qv - 1)
        smooth = _smooth_scan_fast(
            corr_pos, valid, carry_ref, dec_ref, B=B, alpha=alpha
        )
        scaled = smooth * jnp.float32(1 << FRAC_BITS)
        above = valid & (scaled >= energy_out * jnp.float32(THRESH))
        out_ref[...] = jnp.sum(
            corr_pos + jnp.where(above, 1.0, 0.0), axis=-1
        )[:, None] + jnp.zeros_like(out_ref)

    return kernel


def _noext_kernel(*, Qv: int, B: int, alpha: float, stage: str = "full"):
    """Boundary-corrected variant: no (C, NB, H+B) ext buffer.

    Carries: xtail (C, NB, Q) IQ tail, su_tail (NB, 2Q) / sp_tail (NB, 3Q)
    cross-boundary window corrections, smoothing carry + decay vector.
    Window sums via in-block inclusive cumsum + prefix-difference.
    """
    W2, W3 = 2 * Qv, 3 * Qv

    def kernel(
        x_ref, out_ref, xtail_ref, su_ref, sp_ref, carry_ref, dec_ref
    ):
        it = pl.program_id(1)

        @pl.when(it == 0)
        def _():
            xtail_ref[...] = jnp.zeros_like(xtail_ref)
            su_ref[...] = jnp.zeros_like(su_ref)
            sp_ref[...] = jnp.zeros_like(sp_ref)
            carry_ref[...] = jnp.zeros_like(carry_ref)
            _init_decay(dec_ref, alpha)

        x = x_ref[...]  # (C, NB, B)
        # x[m-Q] with carry-in from the previous block's tail
        xq = jnp.concatenate([xtail_ref[...], x[..., : B - Qv]], axis=-1)
        xtail_ref[...] = x[..., B - Qv:]
        u = jnp.sum(x * xq, axis=0)  # (NB, B)
        p = jnp.sum(x * x, axis=0)
        Tu = common.ladder_sum(u)  # in-block inclusive cumsum
        Tp = common.ladder_sum(p)
        # windowed sums via prefix difference + carried cross-boundary part
        su_prev = su_ref[...]
        sp_prev = sp_ref[...]
        corr_total = (
            Tu
            - _shiftz(Tu, W2)
            + jnp.concatenate(
                [su_prev, jnp.zeros((su_prev.shape[0], B - W2), jnp.float32)],
                axis=-1,
            )
        )
        energy_out = (
            Tp
            - _shiftz(Tp, W3)
            + jnp.concatenate(
                [sp_prev, jnp.zeros((sp_prev.shape[0], B - W3), jnp.float32)],
                axis=-1,
            )
        )
        # next block's corrections: su_tail[m] = sum(u[B-W2+m+1 : B]),
        # i.e. the strictly-after-prefix suffix Tu[-1] - Tu[B-W2+m]
        suf_u = Tu[..., -1:] - Tu
        suf_p = Tp[..., -1:] - Tp
        su_ref[...] = suf_u[..., B - W2:]
        sp_ref[...] = suf_p[..., B - W3:]

        corr_pos = jnp.maximum(corr_total, 0.0)
        if stage == "ladders":
            out_ref[...] = jnp.sum(corr_pos + energy_out, axis=-1)[
                :, None
            ] + jnp.zeros_like(out_ref)
            return
        gi = it * B + jax.lax.broadcasted_iota(jnp.int32, corr_pos.shape, 1)
        valid = gi >= (3 * Qv - 1)
        Bv = jnp.where(valid, jnp.float32(alpha) * corr_pos, jnp.float32(0.0))
        step = 1
        decay = 1.0 - alpha
        while step < B:
            Bv = _shiftz(Bv, step, fill=0.0) * jnp.float32(decay**step) + Bv
            step *= 2
        carry_in = carry_ref[..., :1]
        smooth = dec_ref[...] * carry_in + Bv
        carry_ref[...] = jnp.broadcast_to(smooth[..., -1:], carry_ref.shape)
        scaled = smooth * jnp.float32(1 << FRAC_BITS)
        above = valid & (scaled >= energy_out * jnp.float32(THRESH))
        out_ref[...] = jnp.sum(
            corr_pos + jnp.where(above, 1.0, 0.0), axis=-1
        )[:, None] + jnp.zeros_like(out_ref)

    return kernel


def _run_stripped(x, stage: str, block: int, batch_tile: int = 8):
    batch, branches, planes, L = x.shape
    xr = x.reshape(batch, C, L)
    B = block
    NB = batch_tile
    H = common.round_up(3 * Q, _LANE)
    alpha = 1.0 / (1 << SMOOTH_SHIFT)
    xr = xr.transpose(1, 0, 2)
    if stage == "fastfull":
        kernel = _make_fast_kernel(Qv=Q, H=H, B=B, alpha=alpha)
    else:
        kernel = _make_kernel(stage, Qv=Q, H=H, B=B, alpha=alpha)
    out = pl.pallas_call(
        kernel,
        grid=(batch // NB, L // B),
        in_specs=[pl.BlockSpec((C, NB, B), lambda ib, it: (0, ib, it))],
        out_specs=pl.BlockSpec((NB, _LANE), lambda ib, it: (ib, 0)),
        out_shape=jax.ShapeDtypeStruct((batch, _LANE), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C, NB, H), jnp.float32),
            pltpu.VMEM((NB, _LANE), jnp.float32),
            pltpu.VMEM((NB, B), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(xr)
    return out


def _run_noext(x, stage: str, block: int, batch_tile: int = 8):
    batch, branches, planes, L = x.shape
    xr = x.reshape(batch, C, L).transpose(1, 0, 2)
    B = block
    NB = batch_tile
    alpha = 1.0 / (1 << SMOOTH_SHIFT)
    kernel = _noext_kernel(Qv=Q, B=B, alpha=alpha, stage=stage)
    out = pl.pallas_call(
        kernel,
        grid=(batch // NB, L // B),
        in_specs=[pl.BlockSpec((C, NB, B), lambda ib, it: (0, ib, it))],
        out_specs=pl.BlockSpec((NB, _LANE), lambda ib, it: (ib, 0)),
        out_shape=jax.ShapeDtypeStruct((batch, _LANE), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C, NB, Q), jnp.float32),
            pltpu.VMEM((NB, 2 * Q), jnp.float32),
            pltpu.VMEM((NB, 3 * Q), jnp.float32),
            pltpu.VMEM((NB, _LANE), jnp.float32),
            pltpu.VMEM((NB, B), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(xr)
    return out


def _time(fn, x, iters=10, warmup=2, repeats=3):
    jfn = jax.jit(fn)
    for _ in range(warmup):
        out = jfn(x)
        _sync(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jfn(x)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    n = x.shape[0] * x.shape[-1] * iters
    return n / best


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    # index on-device first: fetching a large array through the tunnel is slow
    return float(np.asarray(leaf[(0,) * leaf.ndim]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--block", type=int, default=16384)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--stream", type=int, default=1 << 18)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch-tile", type=int, default=8)
    ap.add_argument(
        "--variants",
        default="baseline,dma,concat,lag,ladders,full,noext_ladders,noext",
    )
    args = ap.parse_args()

    x = jax.jit(
        lambda k: jax.random.normal(
            k, (args.batch, BRANCHES, 2, args.stream), jnp.float32
        )
    )(jax.random.key(0))
    x.block_until_ready()

    kw = dict(
        quarter_len=Q,
        smooth_shift=SMOOTH_SHIFT,
        threshold_value=THRESH,
        threshold_frac_bits=FRAC_BITS,
        hysteresis=HYST,
    )
    if "fastfull" in args.variants:
        a = np.asarray(
            jax.jit(functools.partial(_run_stripped, stage="full",
                                      block=args.block))(x)[:, :1]
        )
        b = np.asarray(
            jax.jit(functools.partial(_run_stripped, stage="fastfull",
                                      block=args.block))(x)[:, :1]
        )
        err = float(np.max(np.abs(a - b) / (np.abs(a) + 1e-6)))
        print(f"fastfull vs full relerr: {err:.3e}")

    for v in args.variants.split(","):
        if v == "copy":
            fn = lambda s: s + 1.0  # noqa: E731  raw HBM r/w reference
        elif v == "baseline":
            fn = lambda s: minn_rtl_detect_fused_pallas(  # noqa: E731
                s, **kw, block=args.block, batch_tile=args.batch_tile
            ).count
        elif v.startswith("noext"):
            stage = "ladders" if v.endswith("ladders") else "full"
            fn = functools.partial(
                _run_noext, stage=stage, block=args.block,
                batch_tile=args.batch_tile,
            )
        else:
            fn = functools.partial(
                _run_stripped, stage=v, block=args.block,
                batch_tile=args.batch_tile,
            )
        try:
            sps = _time(fn, x, iters=args.iters)
            print(
                f"{v:16s} block={args.block:6d} nb={args.batch_tile:3d}"
                f"  {sps / 1e9:7.2f} G samples/s"
            )
        except Exception as e:
            print(f"{v:16s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
