#!/usr/bin/env python
"""Perf skeleton of the TIME-MAJOR Minn-RTL datapath.

Layout: rows = time, 128 lanes = streams; C channel planes stacked row-major
inside each block ((C*R, 128) per grid step).  All time shifts are sublane
concats (free for multiples of 8; cheap for 1/2/4).  PERF ONLY: block
boundaries use wrap garbage instead of carried history (costs identical).

Compare against the lane-major fused kernel (~12.1G).
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

Q = 512
ALPHA = 1.0 / 8
DECAY = 1.0 - ALPHA
FRAC_BITS = 15
THRESH = int(0.10 * (1 << 15))
C = 4
HR = 1536  # 3Q history rows


def _shift(y, d):
    """Wrap shift down the rows: out[t] = y[t - d] (garbage in first d rows)."""
    if d == 0:
        return y
    return jnp.concatenate([y[-d:], y[: y.shape[0] - d]], axis=0)


def _kernel(x_ref, out_ref, dvec_ref, carry_ref, *, R):
    it = pl.program_id(1)

    @pl.when((it == 0) & (pl.program_id(0) == 0))
    def _():
        row = jax.lax.broadcasted_iota(jnp.int32, (HR + R, 1), 0).astype(
            jnp.float32
        )
        dvec_ref[...] = jnp.exp(jnp.log(DECAY) * (row + 1.0))

    @pl.when(it == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    x = x_ref[0]  # (C*R, 128)
    # per-channel planes: static row slices (free)
    ext = [x[c * R : (c + 1) * R] for c in range(C)]
    # u/p with lag-Q shifts (free aligned concats; wrap garbage: perf only)
    u = None
    p = None
    for c in range(C):
        xc = ext[c]
        xq = _shift(xc, Q)
        uc = xc * xq
        pc = xc * xc
        u = uc if u is None else u + uc
        p = pc if p is None else p + pc
    z = jnp.stack([u, p], axis=0)  # (2, R, 128)
    d = 1
    while d < Q:
        zl = jnp.concatenate([z[:, -d:], z[:, : R - d]], axis=1)
        z = z + zl
        d *= 2
    p_q = z[1]
    zq = jnp.concatenate([z[:, -Q:], z[:, : R - Q]], axis=1)
    z = z + zq
    corr_total = z[0]
    energy = p_q + jnp.concatenate(
        [z[1][-Q:], z[1][: R - Q]], axis=0
    )
    corr_pos = jnp.maximum(corr_total, 0.0)
    # decay scan down rows (steps to 128; cross-block carry via dvec)
    Bv = jnp.float32(ALPHA) * corr_pos
    step = 1
    while step <= 128:
        c2 = jnp.float32(DECAY ** step)
        Bv = _shift(Bv, step) * c2 + Bv
        step *= 2
    smooth = Bv + dvec_ref[: R] * carry_ref[...]
    carry_ref[...] = smooth[-1:]
    scaled = smooth * jnp.float32(1 << FRAC_BITS)
    above = scaled >= energy * jnp.float32(THRESH)
    acc = jnp.sum(corr_pos + jnp.where(above, 1.0, 0.0), axis=0, keepdims=True)
    out_ref[...] = acc[:1].repeat(8, 0) + jnp.zeros_like(out_ref)


def _run(x, R):
    G, NTC, _ = x.shape  # (G*NT, C*R, 128) flattened outside
    return pl.pallas_call(
        functools.partial(_kernel, R=R),
        grid=(1, G),
        in_specs=[pl.BlockSpec((1, NTC, 128), lambda g, it: (it, 0, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda g, it: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((HR + R, 1), jnp.float32),
            pltpu.VMEM((1, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=512 * (1 << 18))
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--rlist", default="4096,8192,16384")
    args = ap.parse_args()

    fns = {}
    for R in [int(v) for v in args.rlist.split(",")]:
        nblocks = args.samples // (R * 128)
        x = jax.jit(
            lambda k, n=nblocks, R=R: jax.random.normal(
                k, (n, C * R, 128), jnp.float32
            )
        )(jax.random.key(0))
        x.block_until_ready()
        fns[f"R{R}"] = (jax.jit(functools.partial(_run, R=R)), x, nblocks * R * 128)

    for s in list(fns):
        fn, x, _ = fns[s]
        try:
            t0 = time.perf_counter()
            out = fn(x)
            float(np.asarray(out[0, 0]))
            print(f"{s:8s} compiled in {time.perf_counter()-t0:.1f}s")
        except Exception as e:
            print(f"{s:8s} FAILED: {type(e).__name__}: {str(e)[:300]}")
            del fns[s]

    best = {s: float("inf") for s in fns}
    for r in range(args.rounds):
        for s, (fn, x, n) in fns.items():
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(x)
            float(np.asarray(out[0, 0]))
            best[s] = min(best[s], time.perf_counter() - t0)
        print(f"round {r}: " + "  ".join(
            f"{s}={fns[s][2] * args.iters / best[s] / 1e9:.2f}G" for s in fns
        ), flush=True)


if __name__ == "__main__":
    main()
