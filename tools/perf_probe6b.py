#!/usr/bin/env python
"""Micro-cost of SUBLANE rolls/shifts on a time-major (rows, 128) block,
vs lane rolls on the standard layout.  If sublane shifts are cheap, a
time-major kernel layout eliminates the dominant sub-lane-roll cost."""

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

REPS = 24
R = 2048  # rows per block (time-major: rows = time)


def _kernel(x_ref, out_ref, *, mode):
    y = x_ref[...]  # (R, 128)
    for i in range(REPS):
        if mode == "add":
            y = y + y
        elif mode == "subroll_1":
            y = y + pltpu.roll(y, 1 + (i % 7), axis=0)
        elif mode == "subroll_8":
            y = y + pltpu.roll(y, 8 * (1 + i % 4), axis=0)
        elif mode == "subconcat_8":
            d = 8 * (1 + i % 4)
            y = y + jnp.concatenate([y[-d:], y[: R - d]], axis=0)
        elif mode == "subroll_64":
            y = y + pltpu.roll(y, 64 * (1 + i % 4), axis=0)
        elif mode == "nop":
            pass
    out_ref[...] = jnp.sum(y, axis=0, keepdims=True) + jnp.zeros_like(out_ref)


def _run(x, mode):
    rows, _ = x.shape
    return pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        grid=(rows // R,),
        in_specs=[pl.BlockSpec((R, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 19)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    x = jax.jit(lambda k: jax.random.normal(k, (args.rows, 128), jnp.float32))(
        jax.random.key(0)
    )
    x.block_until_ready()

    modes = ["nop", "add", "subroll_1", "subroll_8", "subconcat_8", "subroll_64"]
    fns = {}
    for m in modes:
        fns[m] = jax.jit(functools.partial(_run, mode=m))
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
    blocks = args.rows / R
    base = best.get("nop", 0.0)
    # normalize per (R,128)=262k-elem op, and per 131k elems for comparison
    for m in fns:
        per_op_ns = (best[m] - base) / args.iters / blocks / REPS * 1e9
        print(f"{m:12s} per-op={per_op_ns:7.1f} ns (262k elems; halve to compare"
              f" with probe6's 131k)")


if __name__ == "__main__":
    main()
