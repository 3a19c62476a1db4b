#!/usr/bin/env python
"""Perf probe 10: why does the two-input TM pipeline DMA at ~60 GB/s?

probe9 showed the TM from-IQ ZC kernel sits at its own input floor
(stage 0 = pure DMA + trivial reduce = 1.88 G samples/s = 60 GB/s for
32 B/sample over two buffers) while the single-buffer Minn TM kernel
reads ~296 GB/s.  Interleaved variants, one process:

  A  two buffers, R=4096 (probe9 baseline)
  B  ONE buffer (mf only),  R=4096  -> is the second stream the problem?
  C  two buffers, R=8192            -> is it per-step overhead?
  D  ONE buffer,  R=8192            -> the Minn-kernel shape (known ~296 GB/s)
  E  ONE FUSED buffer (2C rows per block), R=4096 -> same bytes as A, one stream

Run: python tools/perf_probe10.py
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

BR = 2
C = 2 * BR
BATCH = 512
L = 1 << 18
LC = L + 2048 - 1
ITERS = 2


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    import jax.experimental.pallas.tpu as pltpu
    from ofdm_sync_tpu.kernels import pallas_tm_common as tm

    LANES = tm.LANES
    G = BATCH // LANES

    def reduce_kernel_2(a_ref, b_ref, out_ref):
        it = pl.program_id(1)

        @pl.when(it == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        out_ref[...] += (
            jnp.sum(a_ref[0][:8] + b_ref[0][:8], axis=0, keepdims=True)
            .reshape(1, 1, LANES)
        )

    def reduce_kernel_1(a_ref, out_ref):
        it = pl.program_id(1)

        @pl.when(it == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        out_ref[...] += (
            jnp.sum(a_ref[0][:8], axis=0, keepdims=True).reshape(1, 1, LANES)
        )

    def build(n_inputs, R, rows_per_block):
        NT = -(-LC // R)
        blk = pl.BlockSpec(
            (1, rows_per_block, LANES),
            lambda g, t, NT=NT: (g * NT + t, 0, 0),
        )
        out = pl.BlockSpec((1, 1, LANES), lambda g, t: (g, 0, 0))
        kern = reduce_kernel_2 if n_inputs == 2 else reduce_kernel_1
        f = pl.pallas_call(
            kern,
            grid=(G, NT),
            in_specs=[blk] * n_inputs,
            out_specs=out,
            out_shape=jax.ShapeDtypeStruct((G, 1, LANES), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
        )
        return jax.jit(f), NT

    def data(R, rows_per_block, key):
        NT = -(-LC // R)
        return jax.jit(
            lambda k: jax.random.normal(
                k, (G * NT, rows_per_block, LANES), jnp.float32
            )
        )(jax.random.key(key))

    variants = {}
    # A: two buffers, C*R rows, R=4096
    fA, _ = build(2, 4096, C * 4096)
    a1, a2 = data(4096, C * 4096, 0), data(4096, C * 4096, 1)
    variants["A two-buf R=4096"] = (fA, (a1, a2), 2 * C * 4)
    # B: one buffer, R=4096
    fB, _ = build(1, 4096, C * 4096)
    variants["B one-buf R=4096"] = (fB, (a1,), C * 4)
    # C: two buffers, R=8192
    fC, _ = build(2, 8192, C * 8192)
    c1, c2 = data(8192, C * 8192, 2), data(8192, C * 8192, 3)
    variants["C two-buf R=8192"] = (fC, (c1, c2), 2 * C * 4)
    # D: one buffer, R=8192 (the Minn bench shape)
    fD, _ = build(1, 8192, C * 8192)
    variants["D one-buf R=8192"] = (fD, (c1,), C * 4)
    # E: one FUSED buffer (2C rows per block), R=4096 -- same bytes as A
    fE, _ = build(1, 4096, 2 * C * 4096)
    e1 = data(4096, 2 * C * 4096, 4)
    variants["E fused-buf R=4096"] = (fE, (e1,), 2 * C * 4)

    jax.block_until_ready([a1, a2, c1, c2, e1])

    def window(fn, args):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        float(np.asarray(out).sum())
        return time.perf_counter() - t0

    for name, (fn, args, _) in variants.items():
        float(np.asarray(fn(*args)).sum())  # warm/compile

    best = {k: float("inf") for k in variants}
    for _ in range(3):
        for name, (fn, args, _) in variants.items():
            best[name] = min(best[name], window(fn, args))

    n_samples = BATCH * L * ITERS
    for name, (fn, args, bps) in variants.items():
        sps = n_samples / best[name]
        print(f"{name}: {sps/1e9:6.2f} G samples/s  "
              f"({sps*bps/1e9:6.1f} GB/s effective)")


if __name__ == "__main__":
    main()
