"""On-device value-level parity checks (run on the REAL TPU).

Every event-table equality test under tests/ runs the Pallas interpreter on
CPU (``interpret = platform != "tpu"``), which validates the kernel algebra
but not the Mosaic LOWERING.  These checks close that hole (round-3 VERDICT
item 1): a small seeded workload runs through the Mosaic-COMPILED kernels on
the actual device — the time-major flagship kernel, the lane-major fused
kernel, and the pure-XLA datapath — and the three event tables are asserted
equal (exact integer fields; peak values to f32 tolerance).  A Mosaic
divergence in wrap-roll semantics, dtype/rounding, or layout now fails the
bench artifact instead of shipping silently in the headline number.

Discipline: the RTL-vs-golden triangle of the reference testbench
(ref/test_minn_preamble_detector.py:446-451), extended to the deployment
target.  `bench.py` runs `run_all()` and records the verdict in its JSON
line; `__graft_entry__.entry()` runs a tiny variant at entry time on TPU.

Stimulus is integer-valued float32 (small-integer ADC-style values, the
production ingest class): all window sums stay exactly representable in
f32, so corr/energy are association-independent and any table mismatch
isolates a real lowering divergence rather than reduction-order noise.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "check_minn_rtl", "check_zc_iq", "check_aa", "check_mf_mxu",
    "check_sharded_tm", "run_all",
]

# flagship Minn-RTL configuration (BASELINE.md primary metric)
_Q = 512
_KW = dict(
    quarter_len=_Q,
    smooth_shift=3,
    threshold_value=int(0.10 * (1 << 15)),
    threshold_frac_bits=15,
    hysteresis=2,
)
_MAXE = 8


def _table_diff(ref, out, *, name_ref: str, name_out: str,
                pv_rtol: float = 1e-4) -> list[str]:
    """Field-by-field event-table comparison; returns mismatch strings."""
    errs: list[str] = []
    for f in ("valid", "closed", "gate_start", "gate_close", "peak_idx",
              "count", "overflow"):
        a = np.asarray(getattr(ref, f))
        b = np.asarray(getattr(out, f))
        if a.shape != b.shape or not np.array_equal(a, b):
            bad = int(np.sum(a != b)) if a.shape == b.shape else -1
            errs.append(
                f"{name_out} vs {name_ref}: field {f} differs "
                f"({bad} mismatching entries)"
            )
    rv = np.asarray(ref.peak_value, np.float64)
    ov = np.asarray(out.peak_value, np.float64)
    scale = max(1.0, float(np.abs(rv).max(initial=0.0)))
    if not np.allclose(ov, rv, atol=pv_rtol * scale, rtol=pv_rtol):
        errs.append(
            f"{name_out} vs {name_ref}: peak_value max|diff|="
            f"{float(np.abs(ov - rv).max()):.3e} (scale {scale:.3e})"
        )
    return errs


def _minn_stimulus(batch: int, L: int, seed: int = 0):
    """Channel-leading (4, batch, L) integer-valued f32 with injected
    5Q preambles (the [-A,+A,+A,-A,-A] structure of minn_rtl.py:335-429)
    in a handful of streams, quantized to small integers so every window
    sum is exact in f32."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    A = rng.standard_normal(_Q) + 1j * rng.standard_normal(_Q)
    pre = np.concatenate([-A, A, A, -A, -A])
    pre /= np.sqrt(np.mean(np.abs(pre) ** 2))
    pre_i = np.round(24.0 * pre.real).astype(np.float32)
    pre_q = np.round(24.0 * pre.imag).astype(np.float32)

    def build(key):
        # small-integer noise: round(8 * N(0,1)) in [-31, 31] a.s.
        x = jnp.round(
            8.0 * jax.random.normal(key, (4, batch, L), jnp.float32)
        )
        for k, (b, pos) in enumerate(
            [(0, 3 * _Q), (1, L // 3), (2, L // 2), (3, L - 7 * _Q)]
        ):
            for c, plane in ((0, pre_i), (1, pre_q), (2, pre_i), (3, pre_q)):
                x = x.at[c, b, pos : pos + 5 * _Q].add(
                    3.0 * jnp.asarray(plane)
                )
        return x

    return jax.jit(build)(jax.random.key(seed))


def check_minn_rtl(batch: int = 128, L: int = 24576, rows: int = 8192,
                   seed: int = 0, include_lane: bool = True) -> dict:
    """Triangle check on the flagship detector: time-major Mosaic kernel ==
    lane-major Mosaic kernel == XLA datapath, on the current device.

    `include_lane=False` drops the lane-major arm (the entry-time smoke
    keeps its compile budget to two programs)."""
    import jax
    import jax.numpy as jnp

    from ofdm_sync_tpu.kernels.pallas_minn import minn_rtl_detect_fused_pallas
    from ofdm_sync_tpu.kernels.pallas_minn_tm import (
        minn_rtl_detect_fused_tm,
        to_time_tiled,
    )
    from ofdm_sync_tpu.kernels.streaming import minn_rtl_detect_planar

    cl = _minn_stimulus(batch, L, seed)  # (4, batch, L)
    kw = dict(_KW, max_events=_MAXE, tie="last", emit_unclosed=False)

    tm_tab = jax.jit(
        lambda v: minn_rtl_detect_fused_tm(
            v, **kw, rows=rows, stream_len=L, batch=batch
        )
    )(to_time_tiled(cl, rows)[0])

    def xla_one(stream):  # (4, L) -> (2, 2, L) planar branches
        _, tab = minn_rtl_detect_planar(
            stream.reshape(2, 2, -1), **_KW, max_events=_MAXE
        )
        return tab

    xla_tab = jax.jit(jax.vmap(xla_one, in_axes=1))(cl)

    errs = _table_diff(xla_tab, tm_tab, name_ref="xla", name_out="tm")
    if include_lane:
        lane_tab = jax.jit(
            lambda v: minn_rtl_detect_fused_pallas(
                v, **kw, block=8192, channel_leading=True
            )
        )(cl)
        errs += _table_diff(xla_tab, lane_tab, name_ref="xla",
                            name_out="lane")
        errs += _table_diff(lane_tab, tm_tab, name_ref="lane",
                            name_out="tm")
    total = int(np.asarray(tm_tab.count).sum())
    return {
        "name": "minn_rtl",
        "ok": not errs,
        "errors": errs,
        "events_total": total,
        "batch": batch,
        "L": L,
        "platform": jax.devices()[0].platform,
    }


def _zc_stimulus(batch: int, L: int, ref_len: int, seed: int = 1):
    """Planar mf + iq pair for the from-IQ ZC path: integer-valued noise IQ
    with embedded scaled templates, matched-filtered host-side (the mf pass
    is XLA FFT in production; here an exact NumPy correlation so all three
    detector arms consume identical f32 inputs)."""
    rng = np.random.default_rng(seed)
    t = np.exp(-1j * np.pi * 25 * np.arange(ref_len)
               * (np.arange(ref_len) + 1) / ref_len)
    t_i = np.round(16.0 * t.real).astype(np.float32)
    t_q = np.round(16.0 * t.imag).astype(np.float32)

    iq = np.round(6.0 * rng.standard_normal((4, batch, L))).astype(np.float32)
    for b, pos in [(0, 2048), (1, L // 2), (2, L - 2 * ref_len)]:
        for c, plane in ((0, t_i), (1, t_q), (2, t_i), (3, t_q)):
            iq[c, b, pos : pos + ref_len] += 2.0 * plane

    # full correlation with the conj-reversed template, per branch, via one
    # batched FFT convolution (the three detector arms need IDENTICAL f32
    # inputs, not a particular mf algebra; production mf is XLA FFT too)
    Lc = L + ref_len - 1
    nfft = 1 << int(np.ceil(np.log2(Lc)))
    x = (iq[0::2] + 1j * iq[1::2]).astype(np.complex128)  # (2, batch, L)
    tmpl = (t_i + 1j * t_q).astype(np.complex128)
    K = np.fft.fft(np.conj(tmpl[::-1]), nfft)
    conv = np.fft.ifft(np.fft.fft(x, nfft, axis=-1) * K, axis=-1)[..., :Lc]
    mf = np.zeros((4, batch, Lc), np.float32)
    mf[0::2] = np.round(conv.real).astype(np.float32)
    mf[1::2] = np.round(conv.imag).astype(np.float32)
    ref_norm = float(np.sqrt(np.sum(t_i.astype(np.float64) ** 2
                                    + t_q.astype(np.float64) ** 2)))
    return mf, iq, ref_norm


def _zc_xla_table(mf, iq, *, ref_len: int, ref_norm: float, kw: dict):
    """Pure-XLA from-IQ ZC arm on planar real arrays (the same algebra as
    models.ZCStreamingDetector.detect, kept planar so it runs on backends
    without complex-dtype ops; reference zc_v2.py:244-336, 486-498)."""
    import jax
    import jax.numpy as jnp

    from ofdm_sync_tpu.ops.detect import extract_gate_events
    from ofdm_sync_tpu.ops.windows import running_sum_stream

    W = kw["corr_window"]

    @jax.jit
    def run(mf, iq):
        C, batch, Lc = mf.shape
        L = iq.shape[-1]
        BR = C // 2
        # per-branch sliding energy on the full-convolution index axis:
        # energy[n] = sum_{k=n-RF+1..n} |x[k]|^2 with x zero outside [0, L)
        pads = jnp.zeros((BR, batch, Lc - L), jnp.float32)
        re_t, im_t = [], []
        for b in range(BR):
            p = iq[2 * b] ** 2 + iq[2 * b + 1] ** 2
            p = jnp.concatenate([p, pads[b]], axis=-1)
            energy = running_sum_stream(p, ref_len)
            inv = 1.0 / (jnp.float32(ref_norm)
                         * jnp.sqrt(jnp.maximum(energy, jnp.float32(1e-12))))
            re_t.append(mf[2 * b] * inv)
            im_t.append(mf[2 * b + 1] * inv)
        re = sum(re_t)
        im = sum(im_t)
        mag = jnp.sqrt(re * re + im * im)
        local = running_sum_stream(mag, W)
        gi = jnp.arange(Lc, dtype=jnp.int32)
        above = (
            (gi >= W)
            & (mag * jnp.float32(1 << kw["threshold_frac_bits"])
               >= local * jnp.float32(kw["threshold_value"]))
            & (mag >= jnp.float32(kw["min_corr_mag"]))
        )
        return jax.vmap(
            lambda a, t: extract_gate_events(
                a, t, hysteresis=kw["hysteresis"],
                max_events=kw["max_events"], tie="first",
                emit_unclosed=True,
            )
        )(above, mag)

    return run(mf, iq)


def check_zc_iq(batch: int = 128, L: int = 16384, ref_len: int = 2048,
                rows: int = 8192, seed: int = 1) -> dict:
    """Triangle check on the from-IQ ZC CFAR detector: TM Mosaic kernel ==
    lane-major Mosaic kernel == planar XLA datapath."""
    import jax
    import jax.numpy as jnp

    from ofdm_sync_tpu.kernels.pallas_zc import zc_iq_cfar_detect_pallas
    from ofdm_sync_tpu.kernels.pallas_zc_tm import zc_iq_cfar_detect_tm_planar

    mf_np, iq_np, ref_norm = _zc_stimulus(batch, L, ref_len, seed)
    mf = jnp.asarray(mf_np)
    iq = jnp.asarray(iq_np)
    kw = dict(
        corr_window=2048,
        threshold_value=int(4.0 * (1 << 15) / 2048),
        threshold_frac_bits=15,
        min_corr_mag=0.3,
        hysteresis=256,
        max_events=8,
    )

    lane_tab = zc_iq_cfar_detect_pallas(
        mf, iq, ref_len=ref_len, ref_norm=ref_norm, **kw, block=4096
    )
    tm_tab = zc_iq_cfar_detect_tm_planar(
        mf, iq, ref_len=ref_len, ref_norm=ref_norm, **kw, rows=rows
    )
    xla_tab = _zc_xla_table(mf, iq, ref_len=ref_len, ref_norm=ref_norm,
                            kw=kw)

    errs = _table_diff(xla_tab, lane_tab, name_ref="xla", name_out="lane")
    errs += _table_diff(lane_tab, tm_tab, name_ref="lane", name_out="tm")
    total = int(np.asarray(tm_tab.count).sum())
    return {
        "name": "zc_iq",
        "ok": not errs,
        "errors": errs,
        "events_total": total,
        "batch": batch,
        "L": L,
        "platform": jax.devices()[0].platform,
    }


def check_aa(batch: int = 64, L: int = 16384, half_len: int = 512,
             seed: int = 2) -> dict:
    """AA fused kernel (Mosaic-compiled) == XLA datapath: event table plus
    the in-kernel CFO side channels ((P_re, P_im) and M captured at the
    peak -- reference sync_aa.py:504-555; these drive
    cfo = angle(P) fs / (2 pi L) and the quality report)."""
    import jax
    import jax.numpy as jnp

    from ofdm_sync_tpu.kernels.pallas_aa import aa_detect_fused_pallas
    from ofdm_sync_tpu.ops import metrics as M
    from ofdm_sync_tpu.ops.detect import extract_gate_events
    from ofdm_sync_tpu.ops.waveforms import build_aa_preamble
    from ofdm_sync_tpu.params import SYS_AA_10M

    total = 2 * half_len
    pre, _, _ = build_aa_preamble(total, SYS_AA_10M)
    pre_i = np.round(24.0 * pre.real).astype(np.float32)
    pre_q = np.round(24.0 * pre.imag).astype(np.float32)

    rng = np.random.default_rng(seed)
    del rng  # stimulus is generated on device (tunnel moves ~18 MB/s)

    def build(key):
        x = jnp.round(
            2.0 * jax.random.normal(key, (4, batch, L), jnp.float32)
        )
        for b, pos in [(0, 2048), (1, L // 2), (2, L - 4 * total)]:
            for c, plane in ((0, pre_i), (1, pre_q), (2, pre_i), (3, pre_q)):
                x = x.at[c, b, pos : pos + total].add(3.0 * jnp.asarray(plane))
        return x

    iq = jax.jit(build)(jax.random.key(seed))  # (4, batch, L) planar

    maxe = _MAXE
    hyst = 128
    thr = 0.15

    ftab, fP, fM = jax.jit(
        lambda v: aa_detect_fused_pallas(
            v, half_len=half_len, threshold=thr, hysteresis=hyst,
            max_events=maxe, block=4096, channel_leading=True,
        )
    )(iq)

    @jax.jit
    def xla_run(v):
        def one(stream):  # (4, L) planar -> complex branches on device
            rx = jnp.stack(
                [stream[0] + 1j * stream[1], stream[2] + 1j * stream[3]]
            )
            state = M.aa_metric(rx, half_len)
            above = state.valid & (state.M >= thr)
            track = jnp.abs(state.P) ** 2
            table = extract_gate_events(
                above, track, hysteresis=hyst, max_events=maxe,
                tie="first", emit_unclosed=True,
            )
            P_pk = state.P[table.peak_idx]
            return table, jnp.stack(
                [jnp.real(P_pk), jnp.imag(P_pk)]
            ), state.M[table.peak_idx]

        return jax.vmap(one, in_axes=1)(v)

    xtab, xP, xM = xla_run(iq)

    errs = _table_diff(xtab, ftab, name_ref="xla", name_out="aa_fused")
    for name, a, b, tol in (
        ("P_at_peak", np.asarray(xP, np.float64), np.asarray(fP, np.float64),
         2e-4),
        ("M_at_peak", np.asarray(xM, np.float64), np.asarray(fM, np.float64),
         2e-4),
    ):
        mask = np.asarray(xtab.valid, bool)
        if name == "P_at_peak":
            mask = np.broadcast_to(mask[:, None, :], a.shape)
        av, bv = a[mask], b[mask]
        scale = max(1.0, float(np.abs(av).max(initial=0.0)))
        if not np.allclose(bv, av, atol=tol * scale, rtol=tol):
            errs.append(
                f"aa_fused vs xla: {name} max|diff|="
                f"{float(np.abs(bv - av).max(initial=0.0)):.3e} "
                f"(scale {scale:.3e})"
            )
    total_ev = int(np.asarray(ftab.count).sum())
    return {
        "name": "aa",
        "ok": not errs,
        "errors": errs,
        "events_total": total_ev,
        "batch": batch,
        "L": L,
        "platform": jax.devices()[0].platform,
    }


def check_mf_mxu(batch: int = 8, L: int = 65536, T: int = 2048,
                 seed: int = 3) -> dict:
    """MXU matmul-DFT matched filter (kernels.pallas_mf, Mosaic-compiled)
    vs host float64 convolution and the on-chip XLA overlap-save FFT, at
    each path's documented tolerance (bf16x3 ~1e-5 of peak; XLA f32 FFT
    ~1e-6).  Integer-valued stimulus; reference semantics zc_v2.py:244-254."""
    import jax
    import jax.numpy as jnp

    from ofdm_sync_tpu.kernels.pallas_mf import matched_filter_mxu
    from ofdm_sync_tpu.ops.channel import fft_convolve_full_ols

    rng = np.random.default_rng(seed)
    t = np.exp(-1j * np.pi * 25 * np.arange(T) * (np.arange(T) + 1) / T)
    taps = (np.round(16.0 * t.real) + 1j * np.round(16.0 * t.imag)).astype(
        np.complex128
    )
    x = np.round(6.0 * rng.standard_normal((4, batch, L))).astype(np.float32)

    # host float64 golden (one batched FFT convolution)
    Lc = L + T - 1
    nfft = 1 << int(np.ceil(np.log2(Lc)))
    xc = (x[0::2] + 1j * x[1::2]).astype(np.complex128)
    K = np.fft.fft(taps, nfft)
    g = np.fft.ifft(np.fft.fft(xc, nfft, axis=-1) * K, axis=-1)[..., :Lc]
    scale = float(np.abs(g).max())

    xd = jnp.asarray(x)
    y = np.asarray(
        jax.jit(
            lambda v: matched_filter_mxu(v, taps.astype(np.complex64))
        )(xd)
    )
    yc = (y[0::2] + 1j * y[1::2]).astype(np.complex128)

    tp = jnp.asarray(
        np.stack([taps.real, taps.imag]).astype(np.float32)
    )  # planar taps: complex arrays cannot cross the axon host boundary

    @jax.jit
    def xla_ols(v, t):
        c = fft_convolve_full_ols(v[0::2] + 1j * v[1::2], t[0] + 1j * t[1])
        return jnp.stack([jnp.real(c), jnp.imag(c)])

    z = np.asarray(xla_ols(xd, tp))  # (2, 2, batch, Lc)
    zc = (z[0] + 1j * z[1]).astype(np.complex128)

    errs: list[str] = []
    mxu_err = float(np.abs(yc - g).max()) / scale
    xla_err = float(np.abs(zc - g).max()) / scale
    if mxu_err > 5e-5:
        errs.append(f"mf_mxu vs host f64: rel err {mxu_err:.3e} > 5e-5")
    if xla_err > 5e-6:
        errs.append(f"xla_ols vs host f64: rel err {xla_err:.3e} > 5e-6")
    return {
        "name": "mf_mxu",
        "ok": not errs,
        "errors": errs,
        "mxu_rel_err": mxu_err,
        "xla_rel_err": xla_err,
        "batch": batch,
        "L": L,
        "platform": jax.devices()[0].platform,
    }


def check_sharded_tm(batch: int = 128, L: int = 16384, rows: int = 8192,
                     seed: int = 4) -> dict:
    """Mesh(1,1) Mosaic-compiled SHARDED flagship path
    (`parallel.shard.sharded_minn_rtl_detect_fused_tm`, the shipping
    overlap-halo schedule) == the unsharded TM kernel, on the real device.
    The CPU-mesh dryrun validates multi-shard semantics; this closes the
    'no sharded path is ever compiled on the chip' hole (round-4 VERDICT
    item 5)."""
    import jax

    from ofdm_sync_tpu.kernels.pallas_minn_tm import (
        LANES, minn_rtl_detect_fused_tm, to_time_tiled,
    )
    from ofdm_sync_tpu.parallel.shard import (
        make_stream_mesh, sharded_minn_rtl_detect_fused_tm,
    )

    cl = _minn_stimulus(batch, L, seed)
    kw = dict(_KW, max_events=_MAXE, tie="last", emit_unclosed=False)
    tiled = to_time_tiled(cl, rows)[0]
    tm_tab = jax.jit(
        lambda v: minn_rtl_detect_fused_tm(
            v, **kw, rows=rows, stream_len=L, batch=batch
        )
    )(tiled)

    G = batch // LANES
    NT = tiled.shape[0] // G
    mesh = make_stream_mesh(1, 1, devices=jax.devices()[:1])
    sh_tab = sharded_minn_rtl_detect_fused_tm(
        tiled.reshape(G, NT, *tiled.shape[1:]), mesh, **kw,
        rows=rows, stream_len=L, batch=batch,
    )
    errs = _table_diff(tm_tab, sh_tab, name_ref="tm", name_out="sharded_tm")
    return {
        "name": "sharded_tm",
        "ok": not errs,
        "errors": errs,
        "events_total": int(np.asarray(sh_tab.count).sum()),
        "batch": batch,
        "L": L,
        "platform": jax.devices()[0].platform,
    }


def run_all(small: bool = False) -> dict:
    """Run every on-chip triangle; returns {checked, ok, details}.

    `small=True` shrinks shapes for the entry-time smoke variant."""
    results = []
    if small:
        results.append(
            check_minn_rtl(batch=128, L=8192, rows=8192, include_lane=False)
        )
    else:
        results.append(check_minn_rtl())
        results.append(check_zc_iq())
        results.append(check_aa())
        results.append(check_mf_mxu())
        results.append(check_sharded_tm())
    ok = all(r["ok"] for r in results)
    return {"checked": True, "ok": ok, "details": results}


if __name__ == "__main__":
    import json

    print(json.dumps(run_all(), indent=1))
