#!/usr/bin/env python
"""Overlap-hypothesis probes: pure-DMA (f32/i16) vs pure-ALU step cost.

If ALU-only step time <= f32 DMA time, a manually double-buffered kernel
(explicit async copies) can run at the DMA floor -- and with i16 input at
~2x the f32 floor.  These probes bound both sides.

  dma_f32 : BlockSpec-read f32 block, reduce         (floor: HBM @ 4 B)
  dma_i16 : BlockSpec-read i16 block, convert+reduce (floor: HBM @ 2 B?)
  alu     : full metric+scan datapath on a VMEM-resident block; input
            stays in HBM untouched (memory_space=ANY), one copy at step 0
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
from ofdm_sync_tpu.kernels.pallas_minn import _init_decay

_LANE = common.LANE
Q = 512
ALPHA = 1.0 / 8
FRAC_BITS = 15
THRESH = int(0.10 * (1 << 15))
C = 4


def _dma_kernel(x_ref, out_ref):
    x = x_ref[...]
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
    out_ref[...] = jnp.sum(x, axis=(0, 2))[:, None] + jnp.zeros_like(out_ref)


def _alu_kernel(x_hbm, out_ref, xbuf_ref, hist_ref, carry_ref, dec_ref,
                sem, *, H, B):
    it = pl.program_id(1)

    @pl.when((it == 0) & (pl.program_id(0) == 0))
    def _():
        cp = pltpu.make_async_copy(
            x_hbm.at[:, 0:xbuf_ref.shape[1], 0:B], xbuf_ref, sem
        )
        cp.start()
        cp.wait()

    @pl.when(it == 0)
    def _():
        hist_ref[...] = jnp.zeros_like(hist_ref)
        carry_ref[...] = jnp.zeros_like(carry_ref)
        _init_decay(dec_ref, ALPHA)

    x = xbuf_ref[...]
    ext = jnp.concatenate([hist_ref[...], x], axis=-1)
    hist_ref[...] = ext[..., -H:]
    u = jnp.sum(ext * common.roll(ext, Q), axis=0)
    p = jnp.sum(ext * ext, axis=0)
    z = jnp.stack([u, p], axis=0)
    d = 1
    while d < Q:
        z = z + common.roll(z, d)
        d *= 2
    p_q = z[1]
    z = z + common.roll(z, Q)
    corr_total = z[0]
    energy_total = p_q + common.roll(z[1], Q)
    corr_pos = jnp.maximum(corr_total[..., H:], 0.0)
    energy_out = energy_total[..., H:]
    gi = it * B + jax.lax.broadcasted_iota(jnp.int32, corr_pos.shape, 1)
    valid = gi >= (3 * Q - 1)
    Bv = jnp.where(valid, jnp.float32(ALPHA) * corr_pos, 0.0)
    Bv = common.const_decay_scan(Bv, 1.0 - ALPHA)
    carry_in = carry_ref[..., :1]
    smooth = dec_ref[...] * carry_in + Bv
    carry_ref[...] = jnp.broadcast_to(smooth[..., -1:], carry_ref.shape)
    scaled = smooth * jnp.float32(1 << FRAC_BITS)
    above = valid & (scaled >= energy_out * jnp.float32(THRESH))
    out_ref[...] = jnp.sum(
        corr_pos + jnp.where(above, 1.0, 0.0), axis=-1
    )[:, None] + jnp.zeros_like(out_ref)


def _run_dma(x, block, nb):
    _, batch, L = x.shape
    return pl.pallas_call(
        _dma_kernel,
        grid=(batch // nb, L // block),
        in_specs=[pl.BlockSpec((C, nb, block), lambda ib, it: (0, ib, it))],
        out_specs=pl.BlockSpec((nb, _LANE), lambda ib, it: (ib, 0)),
        out_shape=jax.ShapeDtypeStruct((batch, _LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x)


def _run_alu(x, block, nb):
    _, batch, L = x.shape
    H = common.round_up(3 * Q, _LANE)
    kernel = functools.partial(_alu_kernel, H=H, B=block)
    return pl.pallas_call(
        kernel,
        grid=(batch // nb, L // block),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((nb, _LANE), lambda ib, it: (ib, 0)),
        out_shape=jax.ShapeDtypeStruct((batch, _LANE), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C, nb, block), jnp.float32),
            pltpu.VMEM((C, nb, H), jnp.float32),
            pltpu.VMEM((nb, _LANE), jnp.float32),
            pltpu.VMEM((nb, block), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--stream", type=int, default=1 << 18)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--block", type=int, default=16384)
    ap.add_argument("--nb", type=int, default=8)
    args = ap.parse_args()

    batch, L = args.batch, args.stream
    xf = jax.jit(lambda k: jax.random.normal(k, (C, batch, L), jnp.float32))(
        jax.random.key(0)
    )
    xf.block_until_ready()
    xi = jax.jit(
        lambda v: jnp.clip(jnp.round(v * 512.0), -2048, 2047).astype(jnp.int16)
    )(xf)
    xi.block_until_ready()

    fns = {
        "dma_f32": (jax.jit(functools.partial(_run_dma, block=args.block, nb=args.nb)), xf),
        "dma_i16": (jax.jit(functools.partial(_run_dma, block=args.block, nb=args.nb)), xi),
        "dma_i16_nb16": (jax.jit(functools.partial(_run_dma, block=args.block, nb=16)), xi),
        "alu": (jax.jit(functools.partial(_run_alu, block=args.block, nb=args.nb)), xf),
    }
    for s in list(fns):
        fn, x = fns[s]
        try:
            t0 = time.perf_counter()
            out = fn(x)
            float(np.asarray(out[(0,) * out.ndim]))
            print(f"{s:14s} compiled in {time.perf_counter()-t0:.1f}s")
        except Exception as e:
            print(f"{s:14s} FAILED: {type(e).__name__}: {str(e)[:300]}")
            del fns[s]

    best = {s: float("inf") for s in fns}
    for r in range(args.rounds):
        for s, (fn, x) in fns.items():
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(x)
            float(np.asarray(out[(0,) * out.ndim]))
            best[s] = min(best[s], time.perf_counter() - t0)
        print(f"round {r}: " + "  ".join(
            f"{s}={batch * L * args.iters / best[s] / 1e9:.2f}G" for s in fns
        ), flush=True)


if __name__ == "__main__":
    main()
