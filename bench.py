#!/usr/bin/env python
"""Headline benchmark: fused-Pallas Minn-RTL detector throughput on one chip.

Prints ONE JSON line:
  {"metric": "iq_samples_per_sec_per_chip", "value": N, "unit": "samples/s",
   "vs_baseline": N}

Workload: the flagship Minn-RTL streaming detector (Q=512, 2 RX branches,
fixed-point threshold + gate/peak event extraction) over a batch of long IQ
streams in planar float32, jit-compiled, steady-state timed.  The headline
path is the TIME-MAJOR fused kernel (`kernels.pallas_minn_tm`), which runs
at the chip's HBM input floor; the lane-major fused kernel and the XLA path
are fallbacks.

Baseline: the reference implementation's `minn_rtl_streaming_metric`
(reference minn_rtl.py:667-733, per-sample Python) measured on this machine
at 131,681 IQ samples/s for the same 2-branch workload (see BASELINE.md and
the measurement note below).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# Reference minn_rtl.py python-loop throughput, measured 2026-08-16 on this
# image (2 branches, Q=512, 8192-sample stream): 131,681 IQ samples/s.
BASELINE_SAMPLES_PER_SEC = 131_681.0

Q = 512
SMOOTH_SHIFT = 3
FRAC_BITS = 15
THRESH = int(0.10 * (1 << 15))
HYST = 2
BRANCHES = 2
ROWS = 8192  # time-major kernel rows per grid step

KW = dict(
    quarter_len=Q,
    smooth_shift=SMOOTH_SHIFT,
    threshold_value=THRESH,
    threshold_frac_bits=FRAC_BITS,
    hysteresis=HYST,
)


def _sync_count(table) -> int:
    # block_until_ready can return early through the axon tunnel; a scalar
    # fetch is a guaranteed synchronization point
    return int(np.asarray(table.count[0]))


def _run_tm(batch: int, stream_len: int, iters: int, warmup: int = 2):
    """Headline: time-major fused kernel at the HBM input floor."""
    import jax
    import jax.numpy as jnp
    from ofdm_sync_tpu.kernels.pallas_minn_tm import (
        LANES, minn_rtl_detect_fused_tm,
    )

    G = batch // LANES
    NT = stream_len // ROWS
    assert G * LANES == batch and NT * ROWS == stream_len
    # generate stimulus ON DEVICE in the kernels' tiled stream-buffer layout
    # ((G*NT, C*R, 128); a production ingest DMA writes this directly): the
    # axon tunnel moves host data at ~18 MB/s, and a layout transpose inside
    # the timed region would benchmark XLA's transpose, not the detector.
    x = jax.jit(
        lambda k: jax.random.normal(
            k, (G * NT, 2 * BRANCHES * ROWS, LANES), jnp.float32
        )
    )(jax.random.key(0))
    x.block_until_ready()

    fn = jax.jit(
        lambda v: minn_rtl_detect_fused_tm(
            v, **KW, rows=ROWS, stream_len=stream_len, batch=batch
        )
    )
    for _ in range(warmup):
        _sync_count(fn(x))
    dt = float("inf")
    # best-of-3: throughput through the shared axon tunnel drifts +-10%
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x)
        _sync_count(out)
        dt = min(dt, time.perf_counter() - t0)
    return batch * stream_len * iters / dt, dt


def _run_lane_major(batch: int, stream_len: int, iters: int,
                    warmup: int = 2, use_pallas: bool = True):
    """Fallback ladder: lane-major fused kernel, then the XLA path."""
    import jax
    import jax.numpy as jnp
    from ofdm_sync_tpu.kernels.streaming import minn_rtl_detect_planar
    from ofdm_sync_tpu.kernels.pallas_minn import minn_rtl_detect_fused_pallas

    x = jax.jit(
        lambda k: jax.random.normal(
            k, (BRANCHES * 2, batch, stream_len), jnp.float32
        )
    )(jax.random.key(0))
    x.block_until_ready()

    def one(stream):
        state, table = minn_rtl_detect_planar(
            stream.reshape(BRANCHES, 2, -1), **KW
        )
        return table.peak_idx, table.count, jnp.sum(state.smooth_metric)

    if use_pallas:
        fn = jax.jit(
            lambda v: minn_rtl_detect_fused_pallas(
                v, **KW, block=16384, channel_leading=True
            ).count
        )
        sync = lambda out: int(np.asarray(out[0]))  # noqa: E731
    else:
        fn = jax.jit(jax.vmap(one, in_axes=1))
        sync = lambda out: int(np.asarray(out[1]).sum())  # noqa: E731

    for _ in range(warmup):
        sync(fn(x))
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x)
        sync(out)
        dt = min(dt, time.perf_counter() - t0)
    return batch * stream_len * iters / dt, dt


def _block_latency_p50(n_chunks: int = 120, chunk: int = 4096):
    """True 4096-pt-block detection latency: p50 of per-chunk wall time of
    the carried-state streaming step, fetch-synced per chunk -- the latency
    a live receiver sees per block, not an amortized long-stream number
    (BASELINE.md primary metric).  Two paths:

      * XLA step (`minn_rtl_stream_step`): dozens of small array ops.
      * FUSED step (`minn_rtl_fused_stream_step`): ONE Pallas dispatch per
        chunk with kernel-emitted carried state.

    For each, also an ON-CHIP per-chunk figure from the same steps chained
    in a lax.scan inside one dispatch (amortizing the tunnel's
    dispatch+fetch RTT, which dominates the per-chunk p50 here)."""
    import jax
    import jax.numpy as jnp
    from ofdm_sync_tpu.kernels.streaming_chunked import (
        MinnRTLStreamParams, minn_rtl_fused_stream_init,
        minn_rtl_fused_stream_step, minn_rtl_stream_init,
        minn_rtl_stream_step,
    )

    params = MinnRTLStreamParams(
        quarter_len=Q, smooth_shift=SMOOTH_SHIFT, threshold_value=THRESH,
        threshold_frac_bits=FRAC_BITS, hysteresis=HYST,
    )
    xs = jax.jit(
        lambda k: jax.random.normal(k, (BRANCHES, 2, chunk), jnp.float32)
    )(jax.random.key(3))
    xs.block_until_ready()

    def measure(state, step, x, sync):
        state = step(state, x)  # compile
        sync(state)
        lats = []
        for _ in range(n_chunks):
            t0 = time.perf_counter()
            state = step(state, x)
            sync(state)  # fetch-sync each chunk
            lats.append(time.perf_counter() - t0)
        p50_ms = sorted(lats)[len(lats) // 2] * 1e3

        # ON-CHIP per-chunk cost = the MARGINAL wall time per extra scan
        # iteration between two scan lengths.  (Dividing one scan's wall by
        # K -- the round-2 method -- just reports tunnel-RTT/K: a no-op
        # kernel 'measures' ~480us at K=64 that way.)
        def scan_wall(K):
            xk = jnp.broadcast_to(x, (K,) + x.shape)
            scan_fn = jax.jit(
                lambda s, cs: jax.lax.scan(
                    lambda st, c: (step(st, c), None), s, cs
                )[0]
            )
            st = scan_fn(state, xk)
            sync(st)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                st = scan_fn(state, xk)
                sync(st)
                best = min(best, time.perf_counter() - t0)
            return best

        # wide K spread: at ~3-7us/chunk the marginal signal must clear the
        # tunnel's ~1ms RTT jitter (256 extra iters ~ 0.9ms was INSIDE the
        # noise -- r03's 3.5us and r04's 8.0us were draws from that
        # estimator; 1024 extra iters ~ 4-7ms is ~5x the jitter)
        K1, K2 = 128, 1152
        onchip_us = max(
            (scan_wall(K2) - scan_wall(K1)) / (K2 - K1) * 1e6, 0.0
        )
        return p50_ms, onchip_us

    # XLA path
    step_x = jax.jit(lambda s, c: minn_rtl_stream_step(s, c, params=params))
    p50_ms, onchip_us = measure(
        minn_rtl_stream_init(params, BRANCHES), step_x, xs,
        lambda s: float(np.asarray(s.smooth)),
    )

    if jax.devices()[0].platform != "tpu":
        # the fused step would run the Pallas interpreter 100+ times here
        return p50_ms, onchip_us

    # FUSED path: channel-leading (C, 1, chunk), ONE kernel dispatch/step
    xf = xs.reshape(2 * BRANCHES, 1, chunk)
    step_f = jax.jit(
        lambda s, c: minn_rtl_fused_stream_step(s, c, params=params)[0]
    )
    p50f_ms, onchipf_us = measure(
        minn_rtl_fused_stream_init(params, batch=1), step_f, xf,
        lambda s: float(np.asarray(s.carry).sum()),
    )
    return p50_ms, onchip_us, p50f_ms, onchipf_us


def _watchdog_env() -> dict:
    """Child env with a persistent XLA compilation cache shared across the
    bench's watchdog subprocesses (a tunnel compile paid once is not paid
    again by the next subprocess or the next bench run)."""
    import os

    cache = str(__import__("pathlib").Path(__file__).parent
                / ".jax_compile_cache")
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", cache)
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    return env


def _watchdog_subprocess(expr: str, marker: str, timeout_s: int,
                         attempts: int = 2):
    """Run `expr` (prints `marker a b`) under a timeout, retrying once: the
    axon tunnel's remote Mosaic compile can stall for minutes (observed
    20-400 s), a blocked XLA compile cannot be interrupted in-process, and
    a second attempt hits the warm remote + persistent cache."""
    import subprocess

    import jax

    # sitecustomize force-registers the axon TPU backend in every python
    # process; pin the child to the parent's platform explicitly (a CPU
    # bench run must not spawn children that compile through the tunnel)
    platform = jax.devices()[0].platform
    pin = (
        ""
        if platform == "tpu"  # sitecustomize already selects the tunnel TPU
        else "import jax; jax.config.update('jax_platforms', %r);" % platform
    )
    code = (
        "import sys; sys.path.insert(0, {root!r});{pin}"
        "import bench; {expr}"
    ).format(root=str(__import__("pathlib").Path(__file__).parent),
             pin=pin, expr=expr)
    last = None
    for attempt in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, text=True,
                timeout=timeout_s, env=_watchdog_env(),
            )
        except subprocess.TimeoutExpired as e:
            last = e
            continue
        for line in proc.stdout.splitlines():
            if line.startswith(marker):
                parts = line.split()
                vals = tuple(float(p) for p in parts[1:])
                return vals if len(vals) > 2 else (vals[0], vals[1])
        last = RuntimeError(
            f"{marker} subprocess rc={proc.returncode}: {proc.stderr[-500:]}"
        )
    raise last


def _tm_subprocess(batch: int, stream_len: int, iters: int,
                   timeout_s: int = 560):
    """Run the TM headline in a watchdog subprocess (see
    `_watchdog_subprocess`; falls back to the lane-major kernel on
    timeout).  The budget comfortably covers worst-case compile plus the
    timed iterations (~60 s), so slow-compile days still report the
    flagship."""
    return _watchdog_subprocess(
        "sps, dt = bench._run_tm({b}, {s}, {i}); "
        "print('TM_RESULT', sps, dt)".format(b=batch, s=stream_len, i=iters),
        "TM_RESULT", timeout_s,
    )


def _onchip_check_one(name: str):
    """Value-level parity of one Mosaic-COMPILED kernel family on this
    device (`conformance.onchip.check_<name>`; round-3 VERDICT item 1 --
    the interpret-mode test suite cannot see a Mosaic lowering
    divergence).  Names: minn_rtl, zc_iq, aa, mf_mxu, sharded_tm."""
    from ofdm_sync_tpu.conformance import onchip

    return getattr(onchip, f"check_{name}")()


#: every production kernel family + the mesh(1,1)-compiled sharded flagship
CHECK_NAMES = ("minn_rtl", "zc_iq", "aa", "mf_mxu", "sharded_tm")


def _check_subprocess(timeout_s: int = 560):
    """Run the on-chip parity checks, EACH under its own compile watchdog
    (the sharded-flagship cold Mosaic compile alone measured ~500 s through
    the tunnel; one slow check must not starve the rest, and the retry hits
    the warm remote + persistent cache).  Returns (checked, ok, per_check):
    checked only when every check ran (the JSON line reports checked=false
    otherwise, never a silent pass)."""
    per: dict[str, str] = {}
    for name in CHECK_NAMES:
        try:
            c, ok = _watchdog_subprocess(
                "r = bench._onchip_check_one(%r); " % name
                + "import sys; print('CHECK_DETAIL', r, file=sys.stderr); "
                "print('CHECK_RESULT', 1.0, 1.0 if r['ok'] else 0.0)",
                "CHECK_RESULT", timeout_s,
            )
            per[name] = "ok" if (c and ok) else "fail"
        except Exception as e:
            print(f"bench: on-chip check {name} did not run "
                  f"({type(e).__name__}: {e})", file=sys.stderr)
            per[name] = "unrun"
    checked = all(v != "unrun" for v in per.values())
    ok = checked and all(v == "ok" for v in per.values())
    return checked, ok, per


def _latency_subprocess(timeout_s: int = 560):
    """Measure block latency in a watchdog subprocess (the tunnel's remote
    compile can stall for minutes; the headline JSON line must never wait
    on the latency detail).  Same 560 s class as the TM watchdog -- the
    stream-step + scan compiles have blown a 300 s budget in driver runs."""
    return _watchdog_subprocess(
        "vals = bench._block_latency_p50(); "
        "print('LAT_RESULT', *vals)",
        "LAT_RESULT", timeout_s,
    )


def main() -> None:
    import jax

    platform = jax.devices()[0].platform
    if platform in ("cpu",):
        batch, stream_len, iters = 128, ROWS, 1
    else:
        # 2 GB per dispatch: the axon tunnel adds ~1.6-3 ms fixed latency per
        # jitted call; 2 GB amortizes it below 5% (measured 2026-08-16)
        batch, stream_len, iters = 512, 1 << 18, 6

    path = "tm"
    try:
        if platform == "cpu":
            sps, dt = _run_tm(batch, stream_len, iters)
        else:
            sps, dt = _tm_subprocess(batch, stream_len, iters)
    except Exception as e:  # pragma: no cover - defensive hardware fallback
        print(f"bench: time-major path failed ({type(e).__name__}: {e}); "
              "falling back to the lane-major fused kernel", file=sys.stderr)
        path = "lane-major"
        try:
            sps, dt = _run_lane_major(batch, stream_len, iters)
        except Exception as e2:
            print(f"bench: fused-pallas path failed ({type(e2).__name__}: "
                  f"{e2}); falling back to the XLA path", file=sys.stderr)
            path = "xla"
            try:
                sps, dt = _run_lane_major(
                    batch, stream_len, iters, use_pallas=False
                )
            except Exception as e3:
                print(f"bench: accelerator path failed ({type(e3).__name__}: "
                      f"{e3}); retrying reduced workload", file=sys.stderr)
                sps, dt = _run_lane_major(2, 1 << 15, 2, use_pallas=False)

    # on-chip value-level parity of the Mosaic-compiled kernels (recorded in
    # the JSON artifact; checked=false means the check could not run, never
    # a silent pass)
    checked = check_ok = False
    per_check: dict[str, str] = {}
    if platform == "tpu":
        try:
            c, ok, per_check = _check_subprocess()
            checked, check_ok = bool(c), bool(ok)
        except Exception as e:  # pragma: no cover
            print(f"bench: on-chip check failed to run "
                  f"({type(e).__name__}: {e})", file=sys.stderr)
        if checked and not check_ok:
            print("bench: ON-CHIP PARITY CHECK FAILED -- run "
                  "`python -m ofdm_sync_tpu.conformance.onchip` for the "
                  "field-level diff", file=sys.stderr)
        if per_check:
            print(f"bench check detail: {per_check}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "iq_samples_per_sec_per_chip",
                "value": round(sps),
                "unit": "samples/s",
                "vs_baseline": round(sps / BASELINE_SAMPLES_PER_SEC, 2),
                "checked": checked,
                "check_ok": check_ok,
                "checks": per_check,
            }
        )
    )
    try:
        vals = _latency_subprocess()
        lat_ms, onchip_us = vals[0], vals[1]
        lat_note = (f"4096-pt block latency p50={lat_ms:.2f}ms through the "
                    f"tunnel (fetch-synced per chunk; dispatch+fetch RTT "
                    f"dominated), {onchip_us:.1f}us/chunk on-chip "
                    f"(scan-chained carried-state steps)")
        if len(vals) >= 4:
            lat_note += (f"; FUSED single-dispatch step: p50={vals[2]:.2f}ms"
                         f" through the tunnel, {vals[3]:.1f}us/chunk "
                         f"on-chip")
    except Exception as e:  # pragma: no cover
        lat_note = f"block latency skipped ({type(e).__name__}: {e})"
    print(
        f"bench detail: platform={platform} path={path} batch={batch} "
        f"stream_len={stream_len} iters={iters} wall={dt:.3f}s {lat_note}",
        file=sys.stderr,
    )
    if platform == "tpu":
        _secondary_kernels(batch, stream_len)


def _secondary_kernels(batch: int, stream_len: int) -> None:
    """Non-headline kernel throughputs (stderr only; the driver's JSON line
    stays the single Minn-RTL metric above)."""
    import jax
    import jax.numpy as jnp
    from ofdm_sync_tpu.kernels.pallas_aa import aa_detect_fused_pallas
    from ofdm_sync_tpu.kernels.pallas_zc import zc_cfar_detect_pallas

    try:
        x = jax.jit(
            lambda k: jax.random.normal(
                k, (BRANCHES * 2, batch, stream_len), jnp.float32
            )
        )(jax.random.key(1))
        x.block_until_ready()
        fn = jax.jit(
            lambda v: aa_detect_fused_pallas(
                v, half_len=512, block=16384, channel_leading=True
            )[0]
        )
        out = fn(x)
        int(np.asarray(out.count).sum())
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(x)
        int(np.asarray(out.count).sum())
        aa_sps = batch * stream_len * 5 / (time.perf_counter() - t0)

        xm = jax.jit(
            lambda k: jnp.abs(
                jax.random.normal(k, (batch, stream_len), jnp.float32)
            )
        )(jax.random.key(2))
        xm.block_until_ready()
        fz = jax.jit(lambda v: zc_cfar_detect_pallas(v, block=16384))
        out = fz(xm)
        int(np.asarray(out.count).sum())
        t0 = time.perf_counter()
        for _ in range(5):
            out = fz(xm)
        int(np.asarray(out.count).sum())
        zc_sps = batch * stream_len * 5 / (time.perf_counter() - t0)
        del x, xm, out

        # TM from-IQ ZC kernel (two tiled stream buffers; its floor is the
        # two-buffer DMA rate -- see tools/perf_probe{8,9,10}.py)
        from ofdm_sync_tpu.kernels.pallas_zc_tm import (
            LANES as _LANES, zc_iq_cfar_detect_tm,
        )

        RF = 2048
        zrows = 8192  # fastest measured block height (tools/perf_probe11)
        Lc = stream_len + RF - 1
        G, NT = batch // _LANES, -(-Lc // zrows)

        def gen_tiled(key, live_len):
            # ALL rows past the true length must be zero (kernel contract)
            # in EVERY group's tail blocks -- mask by global sample index,
            # which handles live_len not a multiple of zrows
            gidx = (
                jnp.arange(NT)[:, None] * zrows + jnp.arange(zrows)[None, :]
            )  # (NT, zrows) global sample index per block row
            live = (gidx < live_len)[None, :, None, :, None]
            mask = jnp.broadcast_to(
                live, (1, NT, 2 * BRANCHES, zrows, 1)
            ).reshape(1, NT, 2 * BRANCHES * zrows, 1)

            def f(k):
                v = jax.random.normal(
                    k, (G, NT, 2 * BRANCHES * zrows, _LANES), jnp.float32
                )
                return (v * mask.astype(jnp.float32)).reshape(
                    G * NT, 2 * BRANCHES * zrows, _LANES
                )

            return jax.jit(f)(jax.random.key(key))

        mft = gen_tiled(3, Lc)
        iqt = gen_tiled(4, stream_len)
        jax.block_until_ready((mft, iqt))
        fq = jax.jit(
            lambda m, q: zc_iq_cfar_detect_tm(
                m, q, ref_len=RF, ref_norm=float(np.sqrt(RF)),
                stream_len=Lc, batch=batch, rows=zrows,
            ).count
        )
        int(np.asarray(fq(mft, iqt)).sum())
        t0 = time.perf_counter()
        for _ in range(4):
            outq = fq(mft, iqt)
        int(np.asarray(outq).sum())
        zc_iq_sps = batch * stream_len * 4 / (time.perf_counter() - t0)
        del mft, iqt

        # END-TO-END from-IQ: overlap-save XLA matched filter (1.37x the
        # monolithic FFT -- tools/perf_probe13.py) producing |corr| planes.
        # The mf FFT pass, NOT the kernel, bounds this path (probe12/13:
        # mf ~0.5-0.7 G vs kernel 6.5-6.8 G); reported separately so the
        # headline kernel number and the e2e story stay distinct.
        from ofdm_sync_tpu.ops.channel import fft_convolve_full_ols

        mf_batch = 64
        tmpl = np.exp(
            -1j * np.pi * 25 * np.arange(RF) * (np.arange(RF) + 1) / RF
        ).astype(np.complex64)
        kern = np.conj(tmpl[::-1])
        xe = jax.jit(
            lambda k: jax.random.normal(
                k, (2, BRANCHES, mf_batch, stream_len), jnp.float32
            )
        )(jax.random.key(5))
        xe.block_until_ready()
        fe = jax.jit(
            lambda v: jnp.sum(jnp.abs(
                fft_convolve_full_ols(v[0] + 1j * v[1], jnp.asarray(kern))
            ))
        )
        float(np.asarray(fe(xe)))
        t0 = time.perf_counter()
        for _ in range(3):
            oute = fe(xe)
        float(np.asarray(oute))
        zc_mf_sps = mf_batch * stream_len * 3 / (time.perf_counter() - t0)

        # MXU matmul-DFT matched filter (kernels.pallas_mf) on the same
        # workload -- the round-5 fix for the mf-bound from-IQ path
        from ofdm_sync_tpu.kernels.pallas_mf import matched_filter_mxu

        fm = jax.jit(
            lambda v: jnp.sum(jnp.abs(matched_filter_mxu(
                v.transpose(1, 0, 2, 3).reshape(
                    2 * BRANCHES, mf_batch, stream_len
                ),
                kern,
            )))
        )
        float(np.asarray(fm(xe)))
        t0 = time.perf_counter()
        for _ in range(3):
            outm = fm(xe)
        float(np.asarray(outm))
        zc_mxu_sps = mf_batch * stream_len * 3 / (time.perf_counter() - t0)

        # END-TO-END from-IQ, the wired detect_fused_iq composition: MXU
        # matched filter feeding the single-pass IQ CFAR kernel (planar in,
        # event table out; no complex intermediate touches HBM)
        from ofdm_sync_tpu.kernels.pallas_zc import zc_iq_cfar_detect_pallas

        def e2e(v):
            xp = v.transpose(1, 0, 2, 3).reshape(
                2 * BRANCHES, mf_batch, stream_len
            )
            mfp = matched_filter_mxu(xp, kern)
            return zc_iq_cfar_detect_pallas(
                mfp, xp, ref_len=RF, ref_norm=float(np.sqrt(RF)),
            ).count

        fee = jax.jit(e2e)
        int(np.asarray(fee(xe)).sum())
        t0 = time.perf_counter()
        for _ in range(3):
            oute2 = fee(xe)
        int(np.asarray(oute2).sum())
        zc_e2e_sps = mf_batch * stream_len * 3 / (time.perf_counter() - t0)
        del xe

        # zc_freq sliding-DFT metric (round-4 VERDICT item 7: surface the
        # remaining family numbers in the artifact, not prose).  62 template
        # bins; each offset is a full 2048-pt spectrum probe, so the honest
        # unit is offsets/s.  Template/bins stay HOST numpy: a complex64
        # DEVICE array captured as a jit constant needs a device->host fetch
        # at lowering, which the axon tunnel rejects (UNIMPLEMENTED,
        # measured 2026-08-20).
        from ofdm_sync_tpu.ops.metrics import zc_freq_metric_sliding
        from ofdm_sync_tpu.ops.waveforms import (
            centered_subcarrier_indices, generate_zadoff_chu,
        )

        n_off = 1 << 15
        zf_L = 2048 + 512 + n_off - 1
        xf = jax.jit(
            lambda k: (lambda v: v[0] + 1j * v[1])(
                jax.random.normal(k, (2, BRANCHES, zf_L), jnp.float32)
            )
        )(jax.random.key(7))
        xf.block_until_ready()
        tmplb = np.asarray(generate_zadoff_chu(25, 62), np.complex64)
        bins = centered_subcarrier_indices(62)
        fzf = jax.jit(
            lambda v: zc_freq_metric_sliding(
                v, tmplb, bins, n_fft=2048, cp_len=512
            )
        )
        float(np.asarray(fzf(xf)).max())
        t0 = time.perf_counter()
        for _ in range(3):
            outf = fzf(xf)
        float(np.asarray(outf).max())
        zf_ops = n_off * 3 / (time.perf_counter() - t0)
        print(
            f"bench secondary: aa_fused={aa_sps / 1e6:.0f}M samples/s "
            f"zc_cfar={zc_sps / 1e6:.0f}M samples/s "
            f"zc_iq_tm={zc_iq_sps / 1e6:.0f}M samples/s "
            f"zc_mf_ols={zc_mf_sps / 1e6:.0f}M samples/s "
            f"zc_mf_mxu={zc_mxu_sps / 1e6:.0f}M samples/s "
            f"zc_e2e_iq_mxu={zc_e2e_sps / 1e6:.0f}M samples/s "
            f"zc_freq_sliding={zf_ops / 1e6:.1f}M offsets/s",
            file=sys.stderr,
        )
        print(
            "bench family map: D3 minn_rtl=headline; D9 aa=aa_fused; "
            "D7 zc_v2=zc_cfar+zc_iq_tm; D5 zc_mf=zc_mf_{ols,mxu}+zc_e2e; "
            "D6 zc_freq=zc_freq_sliding; D4 park EXEMPT: compile-dominated "
            "(multi-size FFT ladder, 403 s one-time tunnel compile measured "
            "2026-08-20; ~22M samples/s/stream once warm -- design.md s8); "
            "D1 sc / D2 minn / D8 combined share the sliding-sum metric "
            "layer the headline kernel bounds (no separate kernel)",
            file=sys.stderr,
        )
    except Exception as e:  # pragma: no cover
        print(f"bench secondary skipped ({type(e).__name__}: {e})",
              file=sys.stderr)


if __name__ == "__main__":
    main()
