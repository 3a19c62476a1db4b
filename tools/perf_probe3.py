#!/usr/bin/env python
"""Component ablation of the fused Minn-RTL detect kernel at today's forms.

Times stripped variants of the CURRENT kernel (channel-leading input, joint
stacked ladders, guarded scan, predicated events) to locate the ALU budget:

  dma      : read input, reduce, write (floor)
  up       : + ext concat + u/p lag products
  ladder   : + joint corr/energy window ladder
  scan     : + constant-decay smoothing scan + threshold
  full     : the real fused detect kernel (event machinery included)
  mxu      : window sums via per-segment triangular MXU matmul + prefix diff
             (candidate replacement for the ladder)

Usage: python tools/perf_probe3.py
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
Q = 512
ALPHA = 1.0 / 8
FRAC_BITS = 15
THRESH = int(0.10 * (1 << 15))
BRANCHES = 2
C = 2 * BRANCHES
KW = dict(
    quarter_len=Q, smooth_shift=3, threshold_value=THRESH,
    threshold_frac_bits=FRAC_BITS, hysteresis=2,
)


def _stage_kernel(stage: str, *, H: int, B: int):
    def kernel(x_ref, out_ref, hist_ref, carry_ref, dec_ref):
        it = pl.program_id(1)

        @pl.when(it == 0)
        def _():
            hist_ref[...] = jnp.zeros_like(hist_ref)
            carry_ref[...] = jnp.zeros_like(carry_ref)
            _init_decay(dec_ref, ALPHA)

        x = x_ref[...]
        if stage == "dma":
            out_ref[...] = jnp.sum(x, axis=(0, 2))[:, None] + jnp.zeros_like(out_ref)
            return
        ext = jnp.concatenate([hist_ref[...], x], axis=-1)
        hist_ref[...] = ext[..., -H:]
        u = jnp.sum(ext * common.roll(ext, Q), axis=0)
        p = jnp.sum(ext * ext, axis=0)
        if stage == "up":
            out_ref[...] = jnp.sum(u + p, axis=-1)[:, None] + jnp.zeros_like(out_ref)
            return
        if stage == "mxu":
            # prefix sums of the 2-row stack via per-segment triangular
            # matmul (MXU), then window sums as lane-aligned prefix diffs
            S = 512
            n = ext.shape[-1]
            z = jnp.stack([u, p], axis=0)  # (2, NB, n)
            NBv = z.shape[1]
            zs = z.reshape(2 * NBv, n // S, S)
            tri = jnp.tril(jnp.ones((S, S), jnp.float32))  # [j<=i]
            pseg = jax.lax.dot_general(
                zs, tri, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (2NB, n/S, S) within-segment inclusive prefix
            totals = pseg[..., -1]  # (2NB, n/S)
            ctot = common.ladder_sum(totals)  # running segment totals
            carry = ctot - totals  # exclusive carry per segment
            P = (pseg + carry[..., None]).reshape(2, NBv, n)
            corr_total = P[0] - common.roll(P[0], 2 * Q)
            p2q = P[1] - common.roll(P[1], 2 * Q)
            p1q = P[1] - common.roll(P[1], Q)
            energy_total = p1q + common.roll(p2q, Q)
            corr_pos = jnp.maximum(corr_total[..., H:], 0.0)
            energy_out = energy_total[..., H:]
            out_ref[...] = jnp.sum(corr_pos + energy_out, axis=-1)[
                :, None
            ] + jnp.zeros_like(out_ref)
            return
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
        if stage == "ladder":
            out_ref[...] = jnp.sum(corr_pos + energy_out, axis=-1)[
                :, None
            ] + jnp.zeros_like(out_ref)
            return
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

    return kernel


def _run_stage(x, stage: str, block: int, nb: int):
    _, batch, L = x.shape
    H = common.round_up(3 * Q, _LANE)
    kernel = _stage_kernel(stage, H=H, B=block)
    return pl.pallas_call(
        kernel,
        grid=(batch // nb, L // block),
        in_specs=[pl.BlockSpec((C, nb, block), lambda ib, it: (0, ib, it))],
        out_specs=pl.BlockSpec((nb, _LANE), lambda ib, it: (ib, 0)),
        out_shape=jax.ShapeDtypeStruct((batch, _LANE), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C, nb, H), jnp.float32),
            pltpu.VMEM((nb, _LANE), jnp.float32),
            pltpu.VMEM((nb, block), jnp.float32),
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
    ap.add_argument("--stages", default="dma,up,mxu,ladder,scan,full")
    args = ap.parse_args()

    batch, L = args.batch, args.stream
    x = jax.jit(lambda k: jax.random.normal(k, (C, batch, L), jnp.float32))(
        jax.random.key(0)
    )
    x.block_until_ready()

    fns = {}
    for s in args.stages.split(","):
        if s == "full":
            fn = jax.jit(
                lambda v: minn_rtl_detect_fused_pallas(
                    v, **KW, block=args.block, batch_tile=args.nb,
                    channel_leading=True,
                ).count
            )
        else:
            fn = jax.jit(functools.partial(
                _run_stage, stage=s, block=args.block, nb=args.nb
            ))
        fns[s] = fn

    for s, fn in list(fns.items()):
        try:
            t0 = time.perf_counter()
            out = fn(x)
            float(np.asarray(out[(0,) * out.ndim]))
            print(f"{s:8s} compiled in {time.perf_counter()-t0:.1f}s")
        except Exception as e:
            print(f"{s:8s} FAILED: {type(e).__name__}: {str(e)[:300]}")
            del fns[s]

    # mxu numeric check vs ladder
    if "mxu" in fns and "ladder" in fns:
        a = np.asarray(fns["mxu"](x))[:, 0]
        b = np.asarray(fns["ladder"](x))[:, 0]
        err = float(np.max(np.abs(a - b) / (np.abs(b) + 1e-3)))
        print(f"mxu vs ladder block-sum relerr: {err:.2e}")

    best = {s: float("inf") for s in fns}
    for r in range(args.rounds):
        for s, fn in fns.items():
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
