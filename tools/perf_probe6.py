#!/usr/bin/env python
"""Micro-costs of the kernel's primitive ops: add vs roll (sub-lane vs
lane-aligned) vs concat-shift, on bench-shaped VMEM arrays.  Decides whether
swapping the ladders' lane-aligned rolls for concat-shifts is worth it."""

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

_LANE = 128
C, NB = 4, 8
REPS = 24  # ops per block per variant


def _kernel(x_ref, out_ref, *, mode):
    x = x_ref[...]  # (C, NB, B)
    y = jnp.sum(x, axis=0)  # (NB, B) work array
    for i in range(REPS):
        if mode == "add":
            y = y + y
        elif mode == "mul_add":
            y = y * jnp.float32(1.0000001) + y
        elif mode == "roll_sub":
            y = y + pltpu.roll(y, 1 + (i % 7), axis=y.ndim - 1)
        elif mode == "roll_al":
            y = y + pltpu.roll(y, 128 * (1 + i % 4), axis=y.ndim - 1)
        elif mode == "concat_al":
            y = y + common.shiftz(y, 128 * (1 + i % 4))
        elif mode == "nop":
            pass
    out_ref[...] = jnp.sum(y, axis=-1, keepdims=True)[
        :, :1
    ] + jnp.zeros_like(out_ref)


def _run(x, mode, block):
    _, batch, L = x.shape
    return pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        grid=(batch // NB, L // block),
        in_specs=[pl.BlockSpec((C, NB, block), lambda ib, it: (0, ib, it))],
        out_specs=pl.BlockSpec((NB, _LANE), lambda ib, it: (ib, 0)),
        out_shape=jax.ShapeDtypeStruct((batch, _LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--stream", type=int, default=1 << 18)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--block", type=int, default=16384)
    args = ap.parse_args()

    batch, L = args.batch, args.stream
    x = jax.jit(lambda k: jax.random.normal(k, (C, batch, L), jnp.float32))(
        jax.random.key(0)
    )
    x.block_until_ready()

    modes = ["nop", "add", "mul_add", "roll_sub", "roll_al", "concat_al"]
    fns = {}
    for m in modes:
        fns[m] = jax.jit(functools.partial(_run, mode=m, block=args.block))
        try:
            out = fns[m](x)
            float(np.asarray(out[0, 0]))
        except Exception as e:
            print(f"{m} FAILED: {type(e).__name__}: {str(e)[:200]}")
            del fns[m]

    best = {m: float("inf") for m in fns}
    for r in range(args.rounds):
        for m, fn in fns.items():
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(x)
            float(np.asarray(out[0, 0]))
            best[m] = min(best[m], time.perf_counter() - t0)
    blocks = batch * L / (NB * args.block)
    base = best.get("nop", 0.0)
    for m in fns:
        per_op_ns = (best[m] - base) / args.iters / blocks / REPS * 1e9
        print(f"{m:10s} total={best[m]:.3f}s  per-op={per_op_ns:7.1f} ns/block-op")


if __name__ == "__main__":
    main()
