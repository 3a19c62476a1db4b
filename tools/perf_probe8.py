#!/usr/bin/env python
"""Perf probe 8: from-IQ ZC CFAR kernel, lane-major vs time-major.

WORKLOAD NOTE (round 3): the original batch-128 x 131k workload produced
~8 ms dispatches -- the axon tunnel's fixed per-dispatch latency class --
so the round-2 numbers (1.55 G lane-major) measured the TUNNEL, not the
kernel (tools/perf_probe10.py isolates this: every variant of a trivial
DMA-only kernel ran ~2.1 G samples/s at that size regardless of bytes
moved, and 3x faster at 2 GB dispatches; the two-buffer DMA floor at the
2 GB class is ~6.3 G samples/s / 202 GB/s).  This probe uses the
bench-class 2 GB workload, phases ordered so lane-major buffers are freed
before the TM buffers allocate (HBM budget).

Run: python tools/perf_probe8.py
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
RF = 2048          # ref_len (the ZC matched filter length, N_FFT)
W = 2048           # CFAR window
LC = L + RF - 1
REF_NORM = float(np.sqrt(RF))
ROWS = 4096

KW = dict(
    ref_len=RF, ref_norm=REF_NORM, corr_window=W,
    hysteresis=256, max_events=16,
)


def _bench(fn, x, n_samples, iters=2, warmup=1, sync=None):
    sync = sync or (lambda out: int(np.asarray(out.count).sum()))
    for _ in range(warmup):
        sync(fn(*x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*x)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return n_samples * iters / best


def main() -> None:
    import jax
    import jax.numpy as jnp
    from ofdm_sync_tpu.kernels.pallas_zc import zc_iq_cfar_detect_pallas
    from ofdm_sync_tpu.kernels.pallas_zc_tm import (
        LANES, zc_iq_cfar_detect_tm,
    )

    platform = jax.devices()[0].platform
    n_samples = BATCH * L

    # ---------------- lane-major phase ----------------
    mf = jax.jit(
        lambda k: jax.random.normal(k, (C, BATCH, LC), jnp.float32)
    )(jax.random.key(0))
    iq = jax.jit(
        lambda k: jax.random.normal(k, (C, BATCH, L), jnp.float32)
    )(jax.random.key(1))
    jax.block_until_ready((mf, iq))

    lane_fn = jax.jit(
        lambda m, q: zc_iq_cfar_detect_pallas(m, q, **KW, block=4096)
    )
    sps_lane = _bench(lane_fn, (mf, iq), n_samples)
    ev_lane = int(np.asarray(lane_fn(mf, iq).count).sum())
    # event-sparse: scale mf below the min_corr_mag floor IN the jit (no
    # extra HBM copy held)
    lane_fn_q = jax.jit(
        lambda m, q: zc_iq_cfar_detect_pallas(
            m * jnp.float32(1e-3), q, **KW, block=4096
        )
    )
    sps_lane_q = _bench(lane_fn_q, (mf, iq), n_samples)
    ev_lane_q = int(np.asarray(lane_fn_q(mf, iq).count).sum())
    print(f"lane-major from-IQ: {sps_lane/1e9:.2f} G samples/s "
          f"({ev_lane} ev); event-sparse {sps_lane_q/1e9:.2f} G "
          f"({ev_lane_q} ev)")
    del mf, iq

    # ---------------- time-major phase ----------------
    # buffers generated directly in the tiled layout (the production ingest
    # contract; bench.py does the same for Minn), padding rows zeroed
    G = BATCH // LANES
    NT = -(-LC // ROWS)
    row = jnp.arange(ROWS)

    def gen(key, live_rows):
        # zero the rows past `live_rows` in the LAST time block of EACH
        # group (kernel contract: padding rows must be zero)
        live = (row < live_rows)[None, None, :, None]
        mask = jnp.tile(live, (1, 1, C, 1)).reshape(1, 1, C * ROWS, 1)

        def f(k):
            x = jax.random.normal(
                k, (G, NT, C * ROWS, LANES), jnp.float32
            )
            last = x[:, -1:] * mask.astype(jnp.float32)
            x = jnp.concatenate([x[:, : NT - 1], last], axis=1)
            return x.reshape(G * NT, C * ROWS, LANES)

        return jax.jit(f)(jax.random.key(key))

    mft = gen(2, LC - (NT - 1) * ROWS)
    iqt = gen(3, L - (NT - 1) * ROWS)
    jax.block_until_ready((mft, iqt))

    tm_fn = jax.jit(
        lambda m, q: zc_iq_cfar_detect_tm(
            m, q, **KW, stream_len=LC, batch=BATCH, rows=ROWS,
        )
    )
    sps_tm = _bench(tm_fn, (mft, iqt), n_samples)
    ev_tm = int(np.asarray(tm_fn(mft, iqt).count).sum())
    tm_fn_q = jax.jit(
        lambda m, q: zc_iq_cfar_detect_tm(
            m * jnp.float32(1e-3), q, **KW,
            stream_len=LC, batch=BATCH, rows=ROWS,
        )
    )
    sps_tm_q = _bench(tm_fn_q, (mft, iqt), n_samples)
    ev_tm_q = int(np.asarray(tm_fn_q(mft, iqt).count).sum())
    print(f"time-major from-IQ: {sps_tm/1e9:.2f} G samples/s "
          f"({sps_tm/sps_lane:.2f}x lane-major, {ev_tm} ev); "
          f"event-sparse {sps_tm_q/1e9:.2f} G "
          f"({sps_tm_q/sps_lane_q:.2f}x, {ev_tm_q} ev) "
          f"[platform={platform}]")


if __name__ == "__main__":
    main()
