"""MXU matmul-DFT overlap-save matched filter (Pallas TPU kernel).

The from-IQ ZC path is matched-filter-bound: XLA's TPU FFT lowering does
not use the MXU and measures 0.29-0.49 G samples/s monolithic / 0.67 G
as batched overlap-save blocks (tools/perf_probe13.py), an order of
magnitude below the 6.5-6.8 G TM CFAR kernel it feeds.  Re-expressing the
block FFTs as XLA einsums (tools/perf_probe14.py) only reaches 1.8-2.3 G:
every matmul stage round-trips HBM.  This kernel runs the WHOLE
overlap-save pipeline in VMEM -- one HBM read of the block, four MXU
matmuls + twiddles, one HBM write of the valid outputs.

Layout (per stream, per plane): time is ROW-MAJOR over (rows, 128 lanes),
so a 16384-sample overlap-save block is exactly a (128, 128) tile with
sample index n = 128*n1 + n2 (n1 = row, n2 = lane).  The radix-(128x128)
Cooley-Tukey factorization of the 16384-point DFT then maps natively:

    n = N2*n1 + n2,  k = N1*k2 + k1,  N1 = N2 = 128

    S[k1,k2] = sum_{n2} W_F^{n2 k1} W_{N2}^{n2 k2}
                 [ sum_{n1} x[n1,n2] W_{N1}^{n1 k1} ]

  stage 1  A = F1 @ x        left matmul over rows      (DFT over n1)
  twiddle  A *= W_F^{k1 n2}  elementwise (128,128)
  stage 2  S = A @ F2        right matmul over lanes    (DFT over n2)
  pointwise S *= Hkk         taps spectrum, (k1,k2) layout
  stage 3  C = S @ IF2       right matmul               (IDFT over k2)
  twiddle  C *= conj(W_F^{k1 n2})
  stage 4  y = IF1 @ C       left matmul (1/F folded in)

Complex arithmetic is planar-stacked: a complex matmul is ONE real dot
with the re/im pair stacked on the contraction axis and the constant
matrix expanded to its 2x2 real block -- (256,256)@(256,128) MXU shapes.

Overlap-save geometry: step = 112 rows = 14336 samples per block, the
leading 16 rows (2048 samples) come from a VMEM history scratch (grid
iterates time innermost), and the first 16 output rows of each IDFT are
discarded (circular wrap).  Valid for tap counts T <= 2049; the
production PSS template is T = 2048 (reference zc_v2.py:244-254,480).

Accuracy: the matmul-DFT at f32 (Mosaic's native f32 matmul) matches the
XLA FFT overlap-save to ~1e-7 of peak; `precision` exposes the faster
multi-pass bf16 modes measured in tools/perf_probe14.py (HIGH ~4e-5,
DEFAULT ~4e-3 of peak).

Measured on v5e (T=2048, L=2^18, 64 complex stream pairs, best-of-3,
same interleaved window as the XLA form): ~2.0x the XLA overlap-save
FFT (`ops.channel.fft_convolve_full_ols`) -- 1006M vs 514M
samples/s in the round-5 window; absolute rates swing ~2x with the
documented tunnel phases (design.md section 7).  nb sweep {1,2,4,8}:
flat within ~8%; DEFAULT bf16 adds ~15% over bf16x3 (see BENCH_r05
`zc_mf_mxu` for the driver-recorded figure).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
N1 = 128
N2 = 128
F_BLOCK = N1 * N2            # 16384-point DFT blocks
D_ROWS = 16                  # discarded head rows = 2048 samples
S_ROWS = N1 - D_ROWS         # 112 valid rows = 14336 samples/block
MAX_TAPS = D_ROWS * LANES + 1


def _dft_mat(n: int, sign: float) -> np.ndarray:
    k = np.arange(n)
    return np.exp(sign * 2j * np.pi * np.outer(k, k) / n)


def _cblock_left(M: np.ndarray) -> np.ndarray:
    """[[Mr, -Mi], [Mi, Mr]]: out2 = B @ [Xr; Xi] is the complex M @ X."""
    Mr, Mi = M.real.astype(np.float32), M.imag.astype(np.float32)
    return np.block([[Mr, -Mi], [Mi, Mr]])


def _cblock_right(M: np.ndarray) -> np.ndarray:
    """[[Mr, Mi], [-Mi, Mr]]: out2 = [Xr, Xi] @ B is the complex X @ M."""
    Mr, Mi = M.real.astype(np.float32), M.imag.astype(np.float32)
    return np.block([[Mr, Mi], [-Mi, Mr]])


@functools.lru_cache(maxsize=None)
def _dft_constants() -> tuple[np.ndarray, np.ndarray]:
    """(DFTS (4*256, 256), TW (128, 256)) static f32 tables."""
    F1 = _dft_mat(N1, -1.0)                       # [k1, n1]
    F2 = _dft_mat(N2, -1.0)                       # [n2, k2]
    IF2 = _dft_mat(N2, +1.0)                      # [k2, n2']
    IF1 = _dft_mat(N1, +1.0) / F_BLOCK            # [n1, k1], 1/F folded
    dfts = np.concatenate(
        [
            _cblock_left(F1),
            _cblock_right(F2),
            _cblock_right(IF2),
            _cblock_left(IF1),
        ],
        axis=0,
    )                                             # (1024, 256)
    n2g, k1g = np.meshgrid(np.arange(N2), np.arange(N1))
    twc = np.exp(-2j * np.pi * (k1g * n2g) / F_BLOCK)
    tw = np.concatenate(
        [twc.real.astype(np.float32), twc.imag.astype(np.float32)], axis=1
    )                                             # (128, 256)
    return dfts, tw


def _make_dot(precision):
    if precision == "bf16x3":
        # manual 3-pass bf16 (Mosaic has no Precision.HIGH): split both
        # operands into hi + lo bfloat16 halves, drop the lo*lo term.
        # ~f32-quality for this dynamic range at half the HIGHEST cost.
        def dot3(a, b):
            ah = a.astype(jnp.bfloat16)
            al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
            bh = b.astype(jnp.bfloat16)
            bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
            d = functools.partial(
                jax.lax.dot, preferred_element_type=jnp.float32
            )
            return d(ah, bh) + (d(ah, bl) + d(al, bh))

        return dot3
    return functools.partial(
        jax.lax.dot, precision=precision,
        preferred_element_type=jnp.float32,
    )


def _mf_kernel(
    x_ref,        # (1, C, NB*S_ROWS, LANES) input (planar re/im pairs)
    dfts_ref,     # (1024, 256) DFT stage matrices (complex 2x2 blocks)
    twl_ref,      # (256, G*128) [twr; twi], lane-tiled per dot group
    twr_ref,      # (G*128, 256) [twr | twi], row-tiled per dot group
    hkr_ref,      # (G*128, 256) [Hr | Hi] taps spectrum, row-tiled
    out_ref,      # (1, C, NB*S_ROWS, LANES) valid conv outputs
    hist_ref,     # (C * D_ROWS, LANES) trailing input rows carried in VMEM
    *,
    C: int,
    NB: int,
    precision,
):
    # NOTE the (1, C, rows, LANES) block shape: a unit LEADING dim is load-
    # bearing on this backend -- the transposed (C, 1, rows, LANES) block
    # (or per-plane (1, rows, LANES) blocks tiling the row dim) sends the
    # first dispatch through a pathological >80 s server-side compile,
    # while this layout dispatches in ~2 s (measured, trivial copy kernel).
    #
    # NB overlap-save sub-blocks are processed per grid step; all NB * C/2
    # complex pairs are stacked into dot GROUPS (group g = j * C/2 + p) so
    # every DFT stage is ONE MXU dot with N = G*128 lanes (left stages) or
    # M = G*128 rows (right stages) instead of G narrow dots.
    P = C // 2
    G = NB * P
    S = S_ROWS
    D = D_ROWS
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        # history = zeros == the implicit left zero-padding of 'full' conv
        hist_ref[...] = jnp.zeros_like(hist_ref)

    dot = _make_dot(precision)
    F1L = dfts_ref[0:256]
    F2R = dfts_ref[256:512]
    IF2R = dfts_ref[512:768]
    IF1L = dfts_ref[768:1024]

    # per-plane extended rows: D history rows + NB*S new rows; sub-block j
    # spans ext rows [j*S, j*S + 128) -- the intra-step overlap chains
    # through ext directly, only the cross-step tail goes through scratch
    ext = [
        jnp.concatenate(
            [hist_ref[c * D : (c + 1) * D], x_ref[0, c]], axis=0
        )
        for c in range(C)
    ]
    hist_ref[...] = jnp.concatenate([e[-D:] for e in ext], axis=0)

    # stage 1 (DFT over n1, left): X2 (256, G*128), groups on lanes
    X2 = jnp.concatenate(
        [
            jnp.concatenate(
                [
                    ext[2 * p][j * S : j * S + N1],
                    ext[2 * p + 1][j * S : j * S + N1],
                ],
                axis=0,
            )
            for j in range(NB)
            for p in range(P)
        ],
        axis=1,
    )
    A = dot(F1L, X2)                                 # (256, G*128)
    twr_l, twi_l = twl_ref[:N1], twl_ref[N1:]
    ar, ai = A[:N1], A[N1:]
    art = ar * twr_l - ai * twi_l
    ait = ar * twi_l + ai * twr_l

    # stage 2 (DFT over n2, right): groups move to rows, (G*128, 256)
    B_in = jnp.concatenate(
        [
            jnp.concatenate(
                [
                    art[:, g * LANES : (g + 1) * LANES],
                    ait[:, g * LANES : (g + 1) * LANES],
                ],
                axis=1,
            )
            for g in range(G)
        ],
        axis=0,
    )
    Sm = dot(B_in, F2R)                              # (G*128, 256)
    hrR, hiR = hkr_ref[:, :LANES], hkr_ref[:, LANES:]
    sr, si = Sm[:, :LANES], Sm[:, LANES:]
    srt = sr * hrR - si * hiR
    sit = sr * hiR + si * hrR

    # stage 3 (IDFT over k2, right)
    Cm = dot(jnp.concatenate([srt, sit], axis=1), IF2R)   # (G*128, 256)
    twrR, twiR = twr_ref[:, :LANES], twr_ref[:, LANES:]
    cr, ci = Cm[:, :LANES], Cm[:, LANES:]
    crt = cr * twrR + ci * twiR
    cit = ci * twrR - cr * twiR

    # stage 4 (IDFT over k1, left): groups back to lanes, (256, G*128)
    top = jnp.concatenate(
        [crt[g * N1 : (g + 1) * N1] for g in range(G)], axis=1
    )
    bot = jnp.concatenate(
        [cit[g * N1 : (g + 1) * N1] for g in range(G)], axis=1
    )
    Y = dot(IF1L, jnp.concatenate([top, bot], axis=0))    # (256, G*128)
    for j in range(NB):
        for p in range(P):
            g = j * P + p
            out_ref[0, 2 * p, j * S : (j + 1) * S] = (
                Y[D:N1, g * LANES : (g + 1) * LANES]
            )
            out_ref[0, 2 * p + 1, j * S : (j + 1) * S] = (
                Y[N1 + D :, g * LANES : (g + 1) * LANES]
            )


def matched_filter_mxu(
    x: jax.Array,
    taps,
    *,
    out_len: int | None = None,
    precision: str = "bf16x3",
    nb: int = 2,
    interpret: bool | None = None,
) -> jax.Array:
    """Full linear convolution of planar complex streams with `taps` on the
    MXU (overlap-save with in-VMEM matmul-DFTs; see module docstring).

    x: (C, batch, L) float32 planes with C even -- (re, im) plane PAIRS,
    e.g. the 4-plane [b0_re, b0_im, b1_re, b1_im] layout of the from-IQ
    pipeline.  taps: 1-D complex (numpy) or planar (2, T) float32, length
    <= 2049 (the 2048-tap PSS template of reference zc_v2.py:244-254
    fits; longer taps need `ops.channel.fft_convolve_full_ols`).  Complex
    numpy taps are split on the host: axon cannot transfer complex64
    arrays host<->device.

    Returns (C, batch, Lc) float32 planes of the 'full' convolution,
    Lc = L + T - 1 (or `out_len` if given -- must be <= the padded block
    coverage).  `precision` is the in-kernel matmul precision:
    'highest' (f32, ~2e-7 of peak vs float64), 'bf16x3' (manual 3-pass,
    ~1e-5), 'default' (bf16, ~3e-3).  `nb` = overlap-save sub-blocks per
    grid step (dot width / fixed-overhead amortization).
    """
    if not isinstance(taps, jax.Array):
        taps = np.asarray(taps)
    if isinstance(taps, np.ndarray) and np.iscomplexobj(taps):
        taps = np.stack(
            [taps.real.astype(np.float32), taps.imag.astype(np.float32)]
        )
    elif isinstance(taps, jax.Array) and jnp.iscomplexobj(taps):
        # traced complex taps (e.g. conj(ref[::-1]) inside a jitted caller):
        # split on device -- only host<->device complex transfers are the
        # axon limitation, on-device complex algebra is fine
        taps = jnp.stack(
            [jnp.real(taps).astype(jnp.float32),
             jnp.imag(taps).astype(jnp.float32)]
        )
    taps = jnp.asarray(taps, jnp.float32)
    if taps.ndim == 1:
        taps = jnp.stack([taps, jnp.zeros_like(taps)])
    return _matched_filter_mxu(
        x, taps, out_len=out_len, precision=precision, nb=nb,
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("out_len", "precision", "nb", "interpret"),
)
def _matched_filter_mxu(
    x: jax.Array,
    taps: jax.Array,
    *,
    out_len: int | None,
    precision: str,
    nb: int,
    interpret: bool | None,
) -> jax.Array:
    C, batch, L = x.shape
    if C % 2:
        raise ValueError("x must carry (re, im) plane pairs (C even)")
    T = taps.shape[-1]
    if T > MAX_TAPS:
        raise ValueError(
            f"matched_filter_mxu supports <= {MAX_TAPS} taps (got {T}); "
            "use ops.channel.fft_convolve_full_ols"
        )
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    Lc = L + T - 1 if out_len is None else out_len
    NB = nb
    step = S_ROWS * LANES
    nstep = -(-Lc // (NB * step))
    NR = nstep * NB * S_ROWS
    P = C // 2
    G = NB * P

    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, 0),
                                         (0, NR * LANES - L)))
    # batch-leading for the (1, C, rows, LANES) block (see _mf_kernel NOTE)
    xt = xp.reshape(C, batch, NR, LANES).transpose(1, 0, 2, 3)

    dfts_np, tw_np = _dft_constants()
    twr_np, twi_np = tw_np[:, :LANES], tw_np[:, LANES:]
    twl_np = np.concatenate(
        [np.tile(twr_np, (1, G)), np.tile(twi_np, (1, G))], axis=0
    )                                             # (256, G*128)
    twrow_np = np.tile(tw_np, (G, 1))             # (G*128, 256)
    # taps spectrum in the (k1, k2) output layout: H[k], k = N1*k2 + k1
    tc = taps[0] + 1j * taps[1]
    Hf = jnp.fft.fft(tc, n=F_BLOCK)
    hkk = jnp.concatenate(
        [
            jnp.real(Hf).astype(jnp.float32).reshape(N2, N1).T,
            jnp.imag(Hf).astype(jnp.float32).reshape(N2, N1).T,
        ],
        axis=1,
    )                                             # (128, 256)
    hkr = jnp.tile(hkk, (G, 1))                   # (G*128, 256)

    kernel = functools.partial(
        _mf_kernel, C=C, NB=NB, precision=precision
    )
    blk = pl.BlockSpec(
        (1, C, NB * S_ROWS, LANES), lambda b, t: (b, 0, t, 0)
    )
    cspec = lambda shape: pl.BlockSpec(shape, lambda b, t: (0, 0))  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(batch, nstep),
        in_specs=[blk, cspec((1024, 256)), cspec((256, G * LANES)),
                  cspec((G * LANES, 256)), cspec((G * LANES, 256))],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((batch, C, NR, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((C * D_ROWS, LANES), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(xt, jnp.asarray(dfts_np), jnp.asarray(twl_np), jnp.asarray(twrow_np),
      hkr)
    return out.transpose(1, 0, 2, 3).reshape(C, batch, NR * LANES)[..., :Lc]
