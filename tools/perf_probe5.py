#!/usr/bin/env python
"""Probe: Minn-RTL datapath in per-stream 2-D (rows, S) layout with MXU
prefix/scan matmuls.  PERF-ONLY (block-boundary history is ignored) -- this
measures whether the MXU offload + 2-D layout beats the 1-D ladder kernel
(~12.1G) before committing to the full rewrite.

Layout: channel-leading (C, Np, Lp) f32, viewed free as (C, Np*Lp/S, S);
block = (C, R, S) = one stream's B = R*S samples.  Window sums = per-row
tril matmul prefix + row-total combines; decay scan = per-row decay matmul
(cross-row carry is sub-ulp at S=256).
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

Q = 512
ALPHA = 1.0 / 8
DECAY = 1.0 - ALPHA
FRAC_BITS = 15
THRESH = int(0.10 * (1 << 15))
C = 4
S = 256
QR = Q // S  # lag in rows


def _subroll(x, d):
    """Sublane roll (axis=-2)."""
    return pltpu.roll(x, d, axis=x.ndim - 2)


def _kernel(x_ref, out_ref, tri_ref, dmat_ref, dvec_ref, *, R, mode):
    it = pl.program_id(1)

    @pl.when((it == 0) & (pl.program_id(0) == 0))
    def _():
        # constant matrices (once; persistent scratch)
        i = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)  # j (contract dim)
        j = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)  # i (output)
        tri_ref[...] = (j >= i).astype(jnp.float32)
        expnt = (j - i).astype(jnp.float32)
        dmat_ref[...] = jnp.where(
            (j >= i) & (expnt < 130.0), jnp.exp(jnp.log(DECAY) * expnt), 0.0
        ) * jnp.float32(ALPHA)
        lane = jax.lax.broadcasted_iota(jnp.int32, dvec_ref.shape, 1)
        dvec_ref[...] = jnp.exp(jnp.log(DECAY) * (lane + 1).astype(jnp.float32))

    x = x_ref[...]  # (C, R, S)
    # lag-Q product via sublane roll (wrap garbage in first QR rows: PERF ONLY)
    xd = _subroll(x, QR)
    u = jnp.sum(x * xd, axis=0)  # (R, S)
    p = jnp.sum(x * x, axis=0)
    if mode == "vpu":
        # 1-D-equivalent joint ladder cost in this layout (for comparison):
        z = jnp.stack([u, p], axis=0)
        d = 1
        while d < S:
            z = z + common.roll(z, d)
            d *= 2
        out_ref[...] = jnp.sum(z[0] + z[1], axis=-1, keepdims=True)[
            :8, :
        ] + jnp.zeros_like(out_ref)
        return

    z = jnp.concatenate([u, p], axis=0)  # (2R, S)
    P = jax.lax.dot_general(
        z, tri_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (2R, S) within-row inclusive prefix
    T = P[:, S - 1 : S]  # (2R, 1) row totals
    # cross-row window combines (2Q = 4 rows, 3Q = 6 rows)
    Pu, Pp = P[:R], P[R:]
    Tu, Tp = T[:R], T[R:]

    def tails(Tr, k):
        # sum of row totals of the k previous rows (sublane rolls, cheap)
        s = None
        for d in range(1, k):
            t = _subroll(Tr, d)
            s = t if s is None else s + t
        return s if s is not None else jnp.zeros_like(Tr)

    w2 = Pu + tails(Tu, 4) + (_subroll(Tu, 4) - _subroll(Pu, 4))
    p1q = Pp + tails(Tp, 2) + (_subroll(Tp, 2) - _subroll(Pp, 2))
    p2q_r = Pp + tails(Tp, 4) + (_subroll(Tp, 4) - _subroll(Pp, 4))
    energy = p1q + _subroll(p2q_r, 2)
    corr_pos = jnp.maximum(w2, 0.0)
    # decay scan: per-row matmul + previous-row end carry (sub-ulp beyond)
    y_loc = jax.lax.dot_general(
        corr_pos, dmat_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y_end_prev = _subroll(y_loc[:, S - 1 : S], 1)
    smooth = y_loc + y_end_prev * dvec_ref[...]
    scaled = smooth * jnp.float32(1 << FRAC_BITS)
    above = scaled >= energy * jnp.float32(THRESH)
    out_ref[...] = jnp.sum(
        corr_pos + jnp.where(above, 1.0, 0.0), axis=-1, keepdims=True
    )[:8, :] + jnp.zeros_like(out_ref)


def _run(x, block, mode):
    Cc, batch, L = x.shape
    R = block // S
    xr = x.reshape(Cc, batch * (L // S), S)
    kernel = functools.partial(_kernel, R=R, mode=mode)
    return pl.pallas_call(
        kernel,
        grid=(batch, L // block),
        in_specs=[
            pl.BlockSpec(
                (Cc, R, S), lambda ib, it, L=L, R=R: (0, ib * (L // S) // R + it, 0)
            )
        ],
        out_specs=pl.BlockSpec((8, S), lambda ib, it: (ib, 0)),
        out_shape=jax.ShapeDtypeStruct((batch * 8, S), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((S, S), jnp.float32),
            pltpu.VMEM((S, S), jnp.float32),
            pltpu.VMEM((1, S), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(xr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--stream", type=int, default=1 << 18)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--blocks", default="16384,65536,131072")
    args = ap.parse_args()

    batch, L = args.batch, args.stream
    x = jax.jit(lambda k: jax.random.normal(k, (C, batch, L), jnp.float32))(
        jax.random.key(0)
    )
    x.block_until_ready()

    fns = {}
    for b in [int(v) for v in args.blocks.split(",")]:
        fns[f"mxu_b{b//1024}k"] = jax.jit(functools.partial(_run, block=b, mode="mxu"))
    fns["vpu_b64k"] = jax.jit(functools.partial(_run, block=65536, mode="vpu"))

    for s in list(fns):
        try:
            t0 = time.perf_counter()
            out = fns[s](x)
            float(np.asarray(out[0, 0]))
            print(f"{s:12s} compiled in {time.perf_counter()-t0:.1f}s")
        except Exception as e:
            print(f"{s:12s} FAILED: {type(e).__name__}: {str(e)[:400]}")
            del fns[s]

    best = {s: float("inf") for s in fns}
    for r in range(args.rounds):
        for s, fn in fns.items():
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(x)
            float(np.asarray(out[0, 0]))
            best[s] = min(best[s], time.perf_counter() - t0)
        print(f"round {r}: " + "  ".join(
            f"{s}={batch * L * args.iters / best[s] / 1e9:.2f}G" for s in fns
        ), flush=True)


if __name__ == "__main__":
    main()
