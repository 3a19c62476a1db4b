#!/usr/bin/env python
"""Perf probe 13: the XLA matched-filter pass is the from-IQ bottleneck.

probe12 measured the ZC from-IQ TM kernel at 6.5-6.8 G samples/s but the
producing matched-filter pass (`fft_convolve_full`: ONE next_fast_len(L+T-1)
= 512k-point FFT per stream, ops/channel.py:89-102) at only 0.29 G -- the
end-to-end from-IQ rate is mf-bound, 20x below the kernel.  Candidate fix:
overlap-save convolution with batched SMALL FFTs (block B, step B-T+1),
which maps far better onto the TPU's FFT path than one huge 1-D transform.

Measures, at the probe12 payload (T=2048 taps, L=262144, complex64 inside
jit, f32 planar I/O for the axon tunnel):
  big_fft      -- current fft_convolve_full
  ols_B8192    -- overlap-save, 8192-point blocks
  ols_B16384   -- overlap-save, 16384-point blocks
  ols_B32768   -- overlap-save, 32768-point blocks
plus a value check of overlap-save against the big-FFT form.

Run on the real chip: python tools/perf_probe13.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

T = 2048
L = 1 << 18
BATCH = 64
ITERS = 3


def main() -> None:
    import jax
    import jax.numpy as jnp
    from ofdm_sync_tpu.ops.channel import fft_convolve_full

    tmpl = np.exp(
        -1j * np.pi * 25 * np.arange(T) * (np.arange(T) + 1) / T
    ).astype(np.complex64)
    kern = np.conj(tmpl[::-1])

    xr = jax.jit(
        lambda k: jax.random.normal(k, (2, BATCH, L), jnp.float32)
    )(jax.random.key(9))
    xr.block_until_ready()

    def big(x):
        c = x[0] + 1j * x[1]
        y = fft_convolve_full(c, jnp.asarray(kern))
        return jnp.sum(jnp.abs(y))

    def make_ols(B):
        step = B - T + 1

        def ols(x):
            c = x[0] + 1j * x[1]  # (BATCH, L)
            n_out = L + T - 1
            nblk = -(-n_out // step)
            # overlap-save: block k convolves input [k*step - (T-1),
            # k*step + step) and keeps the last `step` outputs
            pad = jnp.pad(c, ((0, 0), (T - 1, nblk * step - L)))
            idx = (
                jnp.arange(nblk)[:, None] * step
                + jnp.arange(B)[None, :]
            )
            blocks = pad[:, idx]  # (BATCH, nblk, B)
            H = jnp.fft.fft(jnp.asarray(kern), n=B)
            Y = jnp.fft.ifft(jnp.fft.fft(blocks, axis=-1) * H, axis=-1)
            y = Y[..., T - 1 :].reshape(BATCH, nblk * step)[:, :n_out]
            return jnp.sum(jnp.abs(y))

        return ols

    cases = {"big_fft": jax.jit(big)}
    for B in (8192, 16384, 32768):
        cases[f"ols_B{B}"] = jax.jit(make_ols(B))

    # value check (one small window on host against np.convolve)
    xs = np.asarray(xr[:, :1, : 4 * T])
    cs = xs[0, 0] + 1j * xs[1, 0]
    ref = np.abs(np.convolve(cs, kern, mode="full")).sum()
    for B in (8192,):
        step = B - T + 1
        padded = np.pad(cs, (T - 1, 0))
        n_out = cs.size + T - 1
        acc = []
        for k in range(-(-n_out // step)):
            seg = padded[k * step : k * step + B]
            seg = np.pad(seg, (0, B - seg.size))
            y = np.fft.ifft(np.fft.fft(seg) * np.fft.fft(kern, n=B))
            acc.append(y[T - 1 :])
        got = np.abs(np.concatenate(acc)[:n_out]).sum()
        assert abs(got - ref) / ref < 1e-4, (got, ref)
    print("overlap-save == direct convolution: OK (host check)")

    n_samples = BATCH * L

    def window(fn, iters=ITERS):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(xr)
        float(np.asarray(out))
        return n_samples * iters / (time.perf_counter() - t0)

    for name, fn in cases.items():
        t0 = time.perf_counter()
        float(np.asarray(fn(xr)))
        print(f"{name:12s} compiled+ran in {time.perf_counter() - t0:.1f}s",
              flush=True)
    best = {name: 0.0 for name in cases}
    for _ in range(4):
        for name, fn in cases.items():
            best[name] = max(best[name], window(fn))
    for name, v in best.items():
        print(f"{name:12s} {v / 1e9:6.2f} G samples/s", flush=True)


if __name__ == "__main__":
    main()
