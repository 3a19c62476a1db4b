#!/usr/bin/env python
"""Perf probe 9: ablation of the TM from-IQ ZC kernel (where does time go?).

probe8 showed the TM form at ~1.9 G samples/s with 3 events and ~1.6 G with
0 events -- the event machinery is NOT the cost.  Effective HBM rate is only
~60 GB/s vs the ~296 GB/s floor, so the kernel is ALU-bound ~4.5x.  This
probe runs stage-truncated variants of the same kernel body (same grid, same
BlockSpecs, same inputs) interleaved in one process:

  stage 0: DMA + trivial reduce (the input floor for TWO buffers)
  stage 1: + per-branch energy window ladder (RF=2048 rows)
  stage 2: + sqrt/div normalization + branch sum + magnitude
  stage 3: + CFAR window ladder (W=2048) + threshold compare
  stage 4: full kernel (event machinery)

Run: python tools/perf_probe9.py
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
BATCH = 128
L = 1 << 17
RF = 2048
W = 2048
LC = L + RF - 1
REF_NORM = float(np.sqrt(RF))
ROWS = 4096
ITERS = 4


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from ofdm_sync_tpu.kernels import pallas_tm_common as tm

    LANES = tm.LANES
    _row_iota = tm.row_iota

    R = ROWS
    NT = -(-LC // ROWS)
    G = BATCH // LANES
    HE = max(RF, 8)
    H = max(W, 8)

    def kernel(mf_ref, iq_ref, out_ref, phist_ref, mhist_ref, *, stage):
        it = pl.program_id(1)

        @pl.when(it == 0)
        def _():
            phist_ref[...] = jnp.zeros_like(phist_ref)
            mhist_ref[...] = jnp.zeros_like(mhist_ref)
            out_ref[...] = jnp.zeros_like(out_ref)

        mf = mf_ref[0]
        iq = iq_ref[0]
        if stage == 0:
            out_ref[...] += (
                jnp.sum(mf[:8] + iq[:8], axis=0, keepdims=True)
                .reshape(1, 1, LANES)
            )
            return

        exts = []
        new_ph = []
        for b in range(BR):
            i_ = iq[(2 * b) * R : (2 * b + 1) * R]
            q_ = iq[(2 * b + 1) * R : (2 * b + 2) * R]
            p = i_ * i_ + q_ * q_
            ext = jnp.concatenate(
                [phist_ref[b * HE : (b + 1) * HE], p], axis=0
            )
            new_ph.append(ext[-HE:])
            exts.append(ext)
        phist_ref[...] = jnp.concatenate(new_ph, axis=0)
        pz = jnp.stack(exts, axis=0)
        energy = tm.window_sum_rows(pz, RF)[:, HE:, :]
        if stage == 1:
            out_ref[...] += (
                jnp.sum(energy[:, :8], axis=(0, 1), keepdims=False)
                .reshape(1, 1, LANES)
            )
            return

        denom = jnp.float32(REF_NORM) * jnp.sqrt(
            jnp.maximum(energy, jnp.float32(1e-12))
        )
        inv = jnp.float32(1.0) / denom
        re = sum(
            mf[(2 * b) * R : (2 * b + 1) * R] * inv[b] for b in range(BR)
        )
        im = sum(
            mf[(2 * b + 1) * R : (2 * b + 2) * R] * inv[b]
            for b in range(BR)
        )
        mag = jnp.sqrt(re * re + im * im)
        if stage == 2:
            out_ref[...] += (
                jnp.sum(mag[:8], axis=0, keepdims=True).reshape(1, 1, LANES)
            )
            return

        mext = jnp.concatenate([mhist_ref[...], mag], axis=0)
        mhist_ref[...] = mext[-H:]
        local_sum = tm.window_sum_rows(mext, W)[H:]
        gi_col = it * R + _row_iota(R)
        above = (
            (gi_col >= W)
            & (mag * jnp.float32(1 << 15)
               >= local_sum * jnp.float32(int(4.0 * (1 << 15) / W)))
            & (mag >= jnp.float32(0.3))
            & (gi_col < LC)
        )
        out_ref[...] += (
            jnp.sum(above[:8].astype(jnp.float32), axis=0, keepdims=True)
            .reshape(1, 1, LANES)
        )

    def build(stage):
        blk = pl.BlockSpec(
            (1, C * R, LANES), lambda g, t, NT=NT: (g * NT + t, 0, 0)
        )
        out = pl.BlockSpec((1, 1, LANES), lambda g, t: (g, 0, 0))
        import jax.experimental.pallas.tpu as pltpu

        f = pl.pallas_call(
            functools.partial(kernel, stage=stage),
            grid=(G, NT),
            in_specs=[blk, blk],
            out_specs=out,
            out_shape=jax.ShapeDtypeStruct((G, 1, LANES), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((BR * HE, LANES), jnp.float32),
                pltpu.VMEM((H, LANES), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
        )
        return jax.jit(f)

    mft = jax.jit(
        lambda k: jax.random.normal(k, (G * NT, C * R, LANES), jnp.float32)
    )(jax.random.key(0))
    iqt = jax.jit(
        lambda k: jax.random.normal(k, (G * NT, C * R, LANES), jnp.float32)
    )(jax.random.key(1))
    jax.block_until_ready((mft, iqt))

    from ofdm_sync_tpu.kernels.pallas_zc_tm import zc_iq_cfar_detect_tm

    full = jax.jit(
        lambda m, q: zc_iq_cfar_detect_tm(
            m, q, ref_len=RF, ref_norm=REF_NORM, corr_window=W,
            stream_len=LC, batch=BATCH, rows=ROWS,
        ).count
    )

    fns = {s: build(s) for s in range(4)}
    n_samples = BATCH * L

    def window(fn, sync):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(mft, iqt)
        sync(out)
        return n_samples * ITERS / (time.perf_counter() - t0)

    sync_s = lambda o: float(np.asarray(o).sum())  # noqa: E731
    sync_f = lambda o: int(np.asarray(o).sum())  # noqa: E731

    # warm all
    for s, fn in fns.items():
        sync_s(fn(mft, iqt))
    sync_f(full(mft, iqt))

    best = {s: 0.0 for s in fns}
    best["full"] = 0.0
    for _ in range(3):
        for s, fn in fns.items():
            best[s] = max(best[s], window(fn, sync_s))
        best["full"] = max(best["full"], window(full, sync_f))

    names = {
        0: "DMA floor (2 buffers)",
        1: "+ energy ladder",
        2: "+ sqrt/div norm + mag",
        3: "+ CFAR ladder + compare",
        "full": "full kernel (events)",
    }
    for s in [0, 1, 2, 3, "full"]:
        print(f"stage {s}: {best[s]/1e9:6.2f} G samples/s  {names[s]}")


if __name__ == "__main__":
    main()
