#!/usr/bin/env python
"""Round-2 interleaved A/B probes for the fused Minn-RTL detect kernel.

All variants run the REAL `minn_rtl_detect_fused_pallas` on channel-leading
input (the bench configuration) and are timed round-robin in one process,
which is the only trustworthy comparison through the drifting axon tunnel.

Levers probed (VERDICT r1 next-step #1):
  * int16 ADC input (halves HBM read bytes; in-VMEM convert)
  * block size (per-grid-step overhead amortization)
  * batch tile NB

Usage: python tools/perf_probe2.py [--rounds 3] [--iters 6]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ofdm_sync_tpu.kernels.pallas_minn import minn_rtl_detect_fused_pallas

Q = 512
KW = dict(
    quarter_len=Q,
    smooth_shift=3,
    threshold_value=int(0.10 * (1 << 15)),
    threshold_frac_bits=15,
    hysteresis=2,
)
BRANCHES = 2
C = 2 * BRANCHES


def _sync(table):
    return int(np.asarray(table.count[0]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--stream", type=int, default=1 << 18)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--variants", default=(
        "f32_b16k_nb8,i16_b16k_nb8,i16_b16k_nb16,f32_b32k_nb8,i16_b32k_nb8,"
        "f32_b16k_nb16,i16_b32k_nb16"
    ))
    args = ap.parse_args()

    batch, L = args.batch, args.stream
    xf = jax.jit(
        lambda k: jax.random.normal(k, (C, batch, L), jnp.float32)
    )(jax.random.key(0))
    xf.block_until_ready()
    # int16 stimulus: 12-bit-ish codes from the same distribution
    xi = jax.jit(
        lambda v: jnp.clip(jnp.round(v * 512.0), -2048, 2047).astype(jnp.int16)
    )(xf)
    xi.block_until_ready()

    fns = {}
    for v in args.variants.split(","):
        dt, b, nb = v.split("_")
        x = xi if dt == "i16" else xf
        block = {"b16k": 16384, "b32k": 32768, "b64k": 65536}[b]
        nbv = int(nb[2:])
        fn = jax.jit(
            lambda s, block=block, nbv=nbv: minn_rtl_detect_fused_pallas(
                s, **KW, block=block, batch_tile=nbv, channel_leading=True
            )
        )
        fns[v] = (fn, x)

    # compile + correctness cross-check (f32 vs i16 on identical values)
    ref_tab = None
    for v, (fn, x) in fns.items():
        try:
            t0 = time.perf_counter()
            tab = fn(x)
            _sync(tab)
            print(f"{v:16s} compiled+ran in {time.perf_counter()-t0:.1f}s")
            if v.startswith("i16") and ref_tab is None:
                # compare against f32 run on the SAME int values
                tab2 = jax.jit(
                    lambda s: minn_rtl_detect_fused_pallas(
                        s, **KW, block=16384, batch_tile=8,
                        channel_leading=True,
                    )
                )(xi.astype(jnp.float32))
                same = all(
                    np.array_equal(np.asarray(a), np.asarray(b))
                    for a, b in zip(
                        (tab.count, tab.peak_idx, tab.gate_start),
                        (tab2.count, tab2.peak_idx, tab2.gate_start),
                    )
                )
                print(f"  i16 == f32(same values): {same}")
                ref_tab = tab
        except Exception as e:
            print(f"{v:16s} FAILED: {type(e).__name__}: {str(e)[:300]}")
            fns[v] = None

    best = {v: float("inf") for v in fns}
    for r in range(args.rounds):
        for v, entry in fns.items():
            if entry is None:
                continue
            fn, x = entry
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(x)
            _sync(out)
            dt = time.perf_counter() - t0
            best[v] = min(best[v], dt)
        print(f"round {r}: " + "  ".join(
            f"{v}={batch * L * args.iters / best[v] / 1e9:.2f}G"
            for v in fns if fns[v] is not None
        ), flush=True)


if __name__ == "__main__":
    main()
