#!/usr/bin/env python
"""Perf probe 11: TM from-IQ ZC kernel block height (rows 4096 vs 8192).

probe8 (fixed padding, 2 GB workload): TM = 4.68 G samples/s at rows=4096,
74 % of the 6.3 G two-buffer DMA floor (probe10).  Fewer/taller grid steps
may close part of the gap.  Interleaved, one process.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

BR = 2
C = 2 * BR
BATCH = 512
L = 1 << 18
RF = 2048
LC = L + RF - 1
REF_NORM = float(np.sqrt(RF))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from ofdm_sync_tpu.kernels.pallas_zc_tm import (
        LANES, zc_iq_cfar_detect_tm,
    )

    G = BATCH // LANES
    n_samples = BATCH * L

    def gen(key, rows, live_rows):
        NT = -(-LC // rows)
        row = jnp.arange(rows)
        live = (row < live_rows)[None, None, :, None]
        mask = jnp.tile(live, (1, 1, C, 1)).reshape(1, 1, C * rows, 1)

        def f(k):
            x = jax.random.normal(k, (G, NT, C * rows, LANES), jnp.float32)
            last = x[:, -1:] * mask.astype(jnp.float32)
            return jnp.concatenate(
                [x[:, : NT - 1], last], axis=1
            ).reshape(G * NT, C * rows, LANES)

        return jax.jit(f)(jax.random.key(key))

    cases = {}
    for rows in (4096, 8192):
        NT = -(-LC // rows)
        mft = gen(2, rows, LC - (NT - 1) * rows)
        iqt = gen(3, rows, max(L - (NT - 1) * rows, 0))
        jax.block_until_ready((mft, iqt))
        fn = jax.jit(
            lambda m, q, rows=rows: zc_iq_cfar_detect_tm(
                m, q, ref_len=RF, ref_norm=REF_NORM,
                stream_len=LC, batch=BATCH, rows=rows,
            ).count
        )
        cases[rows] = (fn, mft, iqt)

    def window(fn, m, q, iters=2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(m, q)
        int(np.asarray(out).sum())
        return n_samples * iters / (time.perf_counter() - t0)

    for rows, (fn, m, q) in cases.items():
        int(np.asarray(fn(m, q)).sum())  # warm
    best = {r: 0.0 for r in cases}
    for _ in range(3):
        for rows, (fn, m, q) in cases.items():
            best[rows] = max(best[rows], window(fn, m, q))
    for rows in cases:
        print(f"rows={rows}: {best[rows]/1e9:.2f} G samples/s")


if __name__ == "__main__":
    main()
