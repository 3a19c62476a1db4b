#!/usr/bin/env python
"""Perf probe 12: from-IQ ZC TM kernel input-stream variants (VERDICT r3
item 2).

The round-3 verdict proposed fusing the matched filter into the kernel as
an MXU Toeplitz matmul, premised on a 62-tap reference template.  The
reference template is actually the FULL 2048-sample time-domain PSS symbol
(zc_v2.py:480,531: matched_filter_correlation against build_pss_symbol()),
so the in-kernel form needs ~2048 cMAC/sample/branch = 33 kFLOP/sample --
~410 TFLOP/s f32 at the 12.6 G target, ~8x the chip's f32 MXU budget, and
worse as a framed matmul (2 useful output columns of 128).  The achievable
levers are the kernel's INPUT STREAMS instead (probe10: one-stream DMA
~296 GB/s vs two-stream ~202 GB/s):

  A  two buffers f32 mf + f32 iq, rows=8192  (current production baseline)
  B  two buffers f32 mf + int16 iq (24 B/sample; ADC ingest dtype)
  B16 as B at rows=16384 (fits VMEM only in the 24 B form)
  C  ONE fused buffer f32 [mf planes; iq planes] (32 B, single stream;
     the matched-filter pass writes into the donated ingest buffer)
  C16i fused buffer with int16 iq planes bitcast-packed is NOT possible
     (one array, one dtype) -- documented, not measured.

Also measures the XLA matched-filter pass itself (fft_convolve_full at the
same payload) to frame the END-TO-END from-IQ story.

Run on the real chip: python tools/perf_probe12.py
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
ITERS = 3


def main() -> None:
    import jax
    import jax.numpy as jnp
    from ofdm_sync_tpu.kernels import pallas_tm_common as tm
    from ofdm_sync_tpu.kernels.pallas_zc_tm import zc_iq_cfar_detect_tm

    LANES = tm.LANES
    G = BATCH // LANES
    n_samples = BATCH * L

    def gen_tiled(key, rows, live_len, planes=C, dtype=jnp.float32):
        NT = -(-LC // rows)
        gidx = (
            jnp.arange(NT)[:, None] * rows + jnp.arange(rows)[None, :]
        )
        live = (gidx < live_len)[None, :, None, :, None]
        mask = jnp.broadcast_to(
            live, (1, NT, planes, rows, 1)
        ).reshape(1, NT, planes * rows, 1)

        def f(k):
            v = jax.random.normal(
                k, (G, NT, planes * rows, LANES), jnp.float32
            )
            v = v * mask.astype(jnp.float32)
            if dtype != jnp.float32:
                v = jnp.round(64.0 * v).astype(dtype)
            return v.reshape(G * NT, planes * rows, LANES)

        return jax.jit(f)(jax.random.key(key))

    kw = dict(
        ref_len=RF, ref_norm=REF_NORM, stream_len=LC, batch=BATCH,
    )

    # XLA matched-filter pass FIRST (before the big case buffers claim
    # HBM): complex64 FFT overlap conv per branch at a reduced batch --
    # per-sample FFT cost is batch-independent at this size
    from ofdm_sync_tpu.ops.channel import fft_convolve_full

    MF_BATCH = 64
    # host-side complex constant (an axon DEVICE complex array cannot be
    # pulled back for jit constant embedding)
    tmpl = np.exp(
        -1j * np.pi * 25 * np.arange(RF) * (np.arange(RF) + 1) / RF
    ).astype(np.complex64)
    xr = jax.jit(
        lambda k: jax.random.normal(k, (MF_BATCH, L), jnp.float32)
    )(jax.random.key(9))
    xr.block_until_ready()
    kern = np.conj(tmpl[::-1])
    scale = jnp.asarray([1.0, 0.7], jnp.float32)[:, None, None]

    def _mf(x):
        c = x[None] * scale + 1j * (x[None] * (0.3 * scale))
        return jnp.sum(jnp.abs(fft_convolve_full(c, kern)))

    mf_fn = jax.jit(_mf)
    t0 = time.perf_counter()
    float(np.asarray(mf_fn(xr)))
    print(f"{'mf_xla_fft':18s} compiled+ran in {time.perf_counter() - t0:.1f}s",
          flush=True)
    mf_best = 0.0
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = mf_fn(xr)
        float(np.asarray(out))
        mf_best = max(
            mf_best, MF_BATCH * L * ITERS / (time.perf_counter() - t0)
        )
    del xr
    print(f"{'mf_xla_fft':18s} {mf_best / 1e9:6.2f} G samples/s "
          f"(batch {MF_BATCH})", flush=True)

    # TWO PHASES to stay inside HBM (each case set peaks <10 GB; holding
    # every buffer at once tipped the chip over):
    #   phase 1 (headline): A two-buffer f32+f32 vs C one fused buffer,
    #     interleaved (same bytes, 2 DMA streams vs 1)
    #   phase 2: B two-buffer f32+int16 at rows 8192 and 16384
    phases = []
    rows = 8192
    NT = -(-LC // rows)
    mft = gen_tiled(2, rows, LC)
    iqt32 = gen_tiled(3, rows, L)
    jax.block_until_ready((mft, iqt32))
    fused = jnp.concatenate(
        [mft.reshape(G * NT, C, rows, LANES),
         iqt32.reshape(G * NT, C, rows, LANES)], axis=1
    ).reshape(G * NT, 2 * C * rows, LANES)
    fused.block_until_ready()
    phases.append({
        "A_f32f32_r8192": (
            jax.jit(lambda m, q: zc_iq_cfar_detect_tm(
                m, q, **kw, rows=8192).count),
            (mft, iqt32),
        ),
        "C_fusedf32_r8192": (
            jax.jit(lambda x: zc_iq_cfar_detect_tm(
                x, None, **kw, rows=8192).count),
            (fused,),
        ),
    })

    def phase2():
        mft = gen_tiled(2, 8192, LC)
        iqt16 = gen_tiled(4, 8192, L, dtype=jnp.int16)
        jax.block_until_ready((mft, iqt16))
        # rows=16384 does NOT compile even in the 24 B form: Mosaic needs
        # 166 MB VMEM (67 MB register-allocator spill slots) vs the 128 MB
        # budget -- measured 2026-08-18; rows=8192 is the ceiling.
        return {
            "B_f32i16_r8192": (
                jax.jit(lambda m, q: zc_iq_cfar_detect_tm(
                    m, q, **kw, rows=8192).count),
                (mft, iqt16),
            ),
        }

    def window(fn, args, iters=ITERS):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(np.asarray(out).sum())
        return n_samples * iters / (time.perf_counter() - t0)

    def run_phase(cases):
        for name, (fn, args) in cases.items():
            t0 = time.perf_counter()
            out = fn(*args)
            float(np.asarray(out).sum())
            print(f"{name:18s} compiled+ran in "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
        best = {name: 0.0 for name in cases}
        for _ in range(4):
            for name, (fn, args) in cases.items():
                best[name] = max(best[name], window(fn, args))
        for name, v in best.items():
            print(f"{name:18s} {v / 1e9:6.2f} G samples/s", flush=True)

    run_phase(phases[0])
    phases[0].clear()
    del mft, iqt32, fused
    run_phase(phase2())


if __name__ == "__main__":
    main()
