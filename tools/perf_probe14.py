"""Probe 14: matched filter as MXU matmul-DFT overlap-save (planar).

Round-3 closure (design.md §8) measured the from-IQ ZC path as
matched-filter-bound: XLA's native FFT runs 0.29-0.49 G samples/s
monolithic and 0.67 G with batched 16k-point overlap-save blocks
(tools/perf_probe13.py), an order of magnitude below the 6.5-6.8 G TM
kernel it feeds.  XLA's TPU FFT lowering does not use the MXU.  This
probe measures replacing the FFT inside overlap-save with an explicit
Cooley-Tukey N1 x N2 matmul-DFT, which IS an MXU workload:

  forward  x[n1,n2] --DFT_N1--> A[k1,n2] --tw--> --DFT_N2--> S[k1,k2]
  pointwise S *= Hkk          (taps spectrum in (k1,k2) layout)
  inverse  S --IDFT_N2--> C[k1,n2] --conj tw--> --IDFT_N1--> y[n1,n2]

All arithmetic is PLANAR f32 (axon rejects complex-dtype gathers, and
planar keeps the layout under our control): a complex matmul is ONE real
einsum with the re/im pair stacked on a contraction-adjacent axis and the
constant matrix expanded to its 2x2 real block [[Mr, Mi], [-Mi, Mr]].

Variants: the 4-stage form above, and a collapsed form folding
(DFT_N2, pointwise, IDFT_N2) into ONE per-k1 batched matmul
M[k1] = F2 @ diag(Hkk[k1,:]) @ IF2 (saves a matmul stage + 2 HBM trips).

FLOP model (F=16384=128x128): 2(N1+N2)=512 complex MAC/pt 4-stage,
2*N1+N2=384 collapsed; x~1.14 framing overhead (step=F-T+1).

Run on the real chip:  python tools/perf_probe14.py
"""
from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

BATCH = 512
L = 1 << 18
T = 2048          # full PSS symbol template (reference zc_v2.py:480,531)
ITERS = 3


def dft_mat(n: int, sign: float) -> np.ndarray:
    k = np.arange(n)
    return np.exp(sign * 2j * np.pi * np.outer(k, k) / n)


def cstack_right(M: np.ndarray) -> np.ndarray:
    """(v, c) complex -> (2, v, 2, c) real block so that for planar A
    (t=re/im on axis 0): out[s] = sum_t A[t] @ M2[t,:,s,:].

    out_re = Ar@Mr - Ai@Mi ; out_im = Ar@Mi + Ai@Mr
    """
    Mr, Mi = M.real.astype(np.float32), M.imag.astype(np.float32)
    out = np.empty((2, M.shape[0], 2, M.shape[1]), np.float32)
    out[0, :, 0], out[0, :, 1] = Mr, Mi
    out[1, :, 0], out[1, :, 1] = -Mi, Mr
    return out


def cstack_left(M: np.ndarray) -> np.ndarray:
    """(k, a) complex -> (2, k, 2, a) real block for left-multiplication:
    out[s,k] = sum_{t,a} M2[s,k,t,a] A[t,a] with the einsum arranged so the
    contraction runs over (t, a)."""
    Mr, Mi = M.real.astype(np.float32), M.imag.astype(np.float32)
    out = np.empty((2, M.shape[0], 2, M.shape[1]), np.float32)
    out[0, :, 0], out[0, :, 1] = Mr, -Mi
    out[1, :, 0], out[1, :, 1] = Mi, Mr
    return out


def make_mxu_ols(F: int, N1: int, N2: int, kern: np.ndarray,
                 precision, collapsed: bool, batch: int, length: int):
    """Return ols(xr) with xr (2, batch, length) f32 planes ->
    (2, batch, length+T-1) full-conv planes, matmul-DFT inside."""
    assert N1 * N2 == F
    step = F - T + 1
    F1L = jnp.asarray(cstack_left(dft_mat(N1, -1.0)))        # [s,k1,t,n1]
    n2g, k1g = np.meshgrid(np.arange(N2), np.arange(N1))
    twc = np.exp(-2j * np.pi * (n2g * k1g) / F)              # [k1, n2]
    twr = jnp.asarray(twc.real.astype(np.float32))
    twi = jnp.asarray(twc.imag.astype(np.float32))
    IF1L = jnp.asarray(cstack_left(dft_mat(N1, +1.0) / F))   # [s,n1,t,k1]
    H = np.fft.fft(kern.astype(np.complex128), n=F)
    Hkk = H.reshape(N2, N1).T.copy()                         # [k1, k2]
    if collapsed:
        M = np.einsum("nk,ak,km->anm", dft_mat(N2, -1.0), Hkk,
                      dft_mat(N2, +1.0))                     # [k1, n2, n2']
        Mr = jnp.asarray(M.real.astype(np.float32))
        Mi = jnp.asarray(M.imag.astype(np.float32))
        # per-k1 right block: (k1, 2, n2, 2, n2')
        M2 = np.empty((N1, 2, N2, 2, N2), np.float32)
        M2[:, 0, :, 0] = M.real
        M2[:, 0, :, 1] = M.imag
        M2[:, 1, :, 0] = -M.imag
        M2[:, 1, :, 1] = M.real
        M2j = jnp.asarray(M2)
    else:
        F2R = jnp.asarray(cstack_right(dft_mat(N2, -1.0)))   # [t,n2,s,k2]
        Hr = jnp.asarray(Hkk.real.astype(np.float32))
        Hi = jnp.asarray(Hkk.imag.astype(np.float32))
        IF2R = jnp.asarray(cstack_right(dft_mat(N2, +1.0)))  # [t,k2,s,n2]

    def cmul(ar, ai, br, bi):
        return ar * br - ai * bi, ar * bi + ai * br

    def ols(xr):
        n_out = length + T - 1
        nblk = -(-n_out // step)
        pad = jnp.pad(xr, ((0, 0), (0, 0), (T - 1, nblk * step - length)))
        idx = jnp.arange(nblk)[:, None] * step + jnp.arange(F)[None, :]
        blocks = pad[:, :, idx].reshape(2, batch, nblk, N1, N2)
        # stage 1: A[s,k1,n2] = sum_{t,n1} F1L[s,k1,t,n1] x[t,n1,n2]
        A = jnp.einsum("skta,tbnav->sbnkv", F1L, blocks,
                       precision=precision)
        Ar, Ai = cmul(A[0], A[1], twr, twi)
        A = jnp.stack([Ar, Ai])
        if collapsed:
            C = jnp.einsum("tbnkv,ktvsm->sbnkm", A, M2j,
                           precision=precision)
        else:
            S = jnp.einsum("tbnkv,tvsc->sbnkc", A, F2R,
                           precision=precision)
            Sr, Si = cmul(S[0], S[1], Hr, Hi)
            S = jnp.stack([Sr, Si])
            C = jnp.einsum("tbnkc,tcsv->sbnkv", S, IF2R,
                           precision=precision)
        Cr, Ci = cmul(C[0], C[1], twr, -twi)
        C = jnp.stack([Cr, Ci])
        y2 = jnp.einsum("satk,tbnkv->sbnav", IF1L, C,
                        precision=precision)
        Y = y2.reshape(2, batch, nblk, F)
        return Y[..., T - 1:].reshape(2, batch, nblk * step)[..., :n_out]

    return ols


def make_fft_ols(B: int, kern: np.ndarray, batch: int, length: int):
    step = B - T + 1
    # numpy constant on purpose: axon cannot fetch complex64 device arrays
    # back to host, which jit constant-embedding requires
    Hc = np.fft.fft(kern.astype(np.complex128), n=B).astype(np.complex64)

    def ols(xr):
        c = xr[0] + 1j * xr[1]
        n_out = length + T - 1
        nblk = -(-n_out // step)
        pad = jnp.pad(c, ((0, 0), (T - 1, nblk * step - length)))
        idx = jnp.arange(nblk)[:, None] * step + jnp.arange(B)[None, :]
        blocks = pad[:, idx]
        Y = jnp.fft.ifft(jnp.fft.fft(blocks, axis=-1) * Hc, axis=-1)
        y = Y[..., T - 1:].reshape(batch, nblk * step)[:, :n_out]
        return jnp.stack([jnp.real(y), jnp.imag(y)])

    return ols


CASES = {
    # name: (F, N1, N2, precision, collapsed)
    "mxu16k_hst": (16384, 128, 128, lax.Precision.HIGHEST, False),
    "mxu16k_hi": (16384, 128, 128, lax.Precision.HIGH, False),
    "mxu16k_hiC": (16384, 128, 128, lax.Precision.HIGH, True),
    "mxu16k_dfl": (16384, 128, 128, lax.Precision.DEFAULT, False),
    "mxu8k_hi": (8192, 64, 128, lax.Precision.HIGH, False),
    "mxu8k_hiC": (8192, 64, 128, lax.Precision.HIGH, True),
}


def main():
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((2, BATCH, L)).astype(np.float32))
    kern = (rng.standard_normal(T) + 1j * rng.standard_normal(T)).astype(
        np.complex64
    )

    # --- value check: small stream vs float64 direct convolution ---------
    Ls = 4 * T
    cs = (rng.standard_normal(Ls) + 1j * rng.standard_normal(Ls)).astype(
        np.complex64
    )
    ref = np.convolve(cs.astype(np.complex128), kern.astype(np.complex128))
    scale = np.abs(ref).max()
    xs = jnp.asarray(np.stack([cs.real, cs.imag])[:, None, :])
    for name, (F, N1, N2, prec, coll) in CASES.items():
        fn = jax.jit(make_mxu_ols(F, N1, N2, kern, prec, coll, 1, Ls))
        g = np.asarray(fn(xs))
        got = g[0, 0] + 1j * g[1, 0]
        err = np.abs(got - ref).max() / scale
        print(f"value {name:12s} max |err|/peak = {err:.3e}", flush=True)
    fn = jax.jit(make_fft_ols(16384, kern, 1, Ls))
    g = np.asarray(fn(xs))
    got = g[0, 0] + 1j * g[1, 0]
    print(f"value {'fft_B16384':12s} max |err|/peak = "
          f"{np.abs(got - ref).max() / scale:.3e}", flush=True)

    # --- throughput at the 2 GB dispatch class ----------------------------
    bench = {}
    fftfn = make_fft_ols(16384, kern, BATCH, L)
    bench["fft_B16384"] = jax.jit(lambda v: jnp.sum(jnp.abs(fftfn(v))))
    for name, (F, N1, N2, prec, coll) in CASES.items():
        inner = make_mxu_ols(F, N1, N2, kern, prec, coll, BATCH, L)
        bench[name] = jax.jit(
            lambda v, inner=inner: jnp.sum(jnp.abs(inner(v))))

    n_samples = BATCH * L
    for name in list(bench):
        t0 = time.perf_counter()
        try:
            float(np.asarray(bench[name](xr)))
        except Exception as e:  # noqa: BLE001
            print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            del bench[name]
            continue
        print(f"{name:12s} compiled+ran in {time.perf_counter() - t0:.1f}s",
              flush=True)

    def window(fn, iters=ITERS):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(xr)
        float(np.asarray(out))
        return n_samples * iters / (time.perf_counter() - t0)

    best = {name: 0.0 for name in bench}
    for _ in range(4):
        for name in bench:
            best[name] = max(best[name], window(bench[name]))
    for name, v in best.items():
        print(f"{name:12s} {v / 1e9:6.2f} G samples/s", flush=True)


if __name__ == "__main__":
    main()
