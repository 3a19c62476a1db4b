"""Detector model families: configured, jit-compiled detector objects.

One class per reference detector family (reference SURVEY section 2.2):

  SCDetector            D1  reference sc.py
  MinnDetector          D2  reference minn.py
  MinnRTLDetector       D3  reference minn_rtl.py + ref/*.sv
  ParkDetector          D4  reference park.py
  ZCTimeDetector        D5  reference zc.py
  ZCFreqDetector        D6  reference zc_freq.py
  ZCStreamingDetector   D7  reference zc_v2.py
  CombinedSCMinnDetector D8 reference combined_sc_min.py
  AADetector            D9  reference sync_aa.py

Each exposes `metric(rx)` (jittable, device-resident) and `detect(rx)`
(metric + event extraction; returns host-side DetectionResult).  All accept
rx shaped (L,) or (branches, L).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ofdm_sync_tpu.params import (
    AADetectorParams,
    MinnDetectorParams,
    MinnRTLParams,
    SCDetectorParams,
    SystemParams,
    SYS_30M72,
    SYS_AA_10M,
    ZCParams,
    ZCStreamingParams,
)
from ofdm_sync_tpu.models.base import DetectionEvent, DetectionResult, events_from_table
from ofdm_sync_tpu.ops import metrics as M
from ofdm_sync_tpu.ops.detect import extract_gate_events, gate_open_mask
from ofdm_sync_tpu.ops.waveforms import (
    build_pss_symbol,
    centered_subcarrier_indices,
    generate_zadoff_chu,
)

_C64 = jnp.complex64


def _dev_complex(a) -> jax.Array:
    """Host complex -> device complex64.  The axon backend cannot transfer
    complex dtypes host<->device (UNIMPLEMENTED); ship the planes as
    float32 and recombine on device, where complex algebra is fully
    supported."""
    a = np.asarray(a)
    if np.iscomplexobj(a):
        re = jnp.asarray(np.ascontiguousarray(a.real, np.float32))
        im = jnp.asarray(np.ascontiguousarray(a.imag, np.float32))
        return (re + 1j * im).astype(_C64)
    return jnp.asarray(a, _C64)


def _dev(rx) -> jax.Array:
    x = rx if isinstance(rx, jax.Array) else _dev_complex(rx)
    x = x.astype(_C64)
    return x[None, :] if x.ndim == 1 else x


def _planar(rx) -> jax.Array:
    """Complex (L,) / (B, L), host or device -> planar float32 (2B, L) with
    rows [b0_re, b0_im, b1_re, b1_im, ...].  Host input is split BEFORE the
    transfer (the axon backend cannot move complex buffers across the
    device boundary)."""
    if isinstance(rx, jax.Array):
        x = rx[None] if rx.ndim == 1 else rx
        return jax.jit(
            lambda v: jnp.stack(
                [jnp.real(v).astype(jnp.float32),
                 jnp.imag(v).astype(jnp.float32)], axis=1
            ).reshape(2 * v.shape[0], v.shape[-1])
        )(x)
    a = np.asarray(rx)
    if a.ndim == 1:
        a = a[None]
    out = np.empty((2 * a.shape[0], a.shape[-1]), np.float32)
    out[0::2] = a.real
    out[1::2] = a.imag
    return jnp.asarray(out)


# ---------------------------------------------------------------------------
# D1: Schmidl & Cox
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class SCDetector:
    sys: SystemParams = SYS_30M72
    params: SCDetectorParams = SCDetectorParams()

    def metric(self, rx):
        return M.sc_metric(_dev(rx), self.sys.n_fft)

    @partial(jax.jit, static_argnums=0)
    def _detect_jit(self, rx):
        Mm, P, R = M.sc_metric(rx, self.sys.n_fft)
        plateau_end = M.find_plateau_end(
            Mm,
            self.sys.cp_len,
            lookahead=self.sys.cp_len // 4,
            smooth_win=self.params.smooth_win,
            plateau_frac=self.params.plateau_frac,
            run_threshold=self.params.run_threshold,
        )
        coarse = jnp.maximum(plateau_end - self.params.sc_delta, 0)
        return Mm, P, R, plateau_end, coarse

    def detect(self, rx):
        Mm, P, R, plateau_end, coarse = self._detect_jit(_dev(rx))
        return {
            "M": Mm,
            "P": P,
            "R": R,
            "plateau_end": int(plateau_end),
            "coarse_start": int(coarse),
        }


# ---------------------------------------------------------------------------
# D2: standard Minn
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class MinnDetector:
    sys: SystemParams = SYS_30M72
    params: MinnDetectorParams = MinnDetectorParams()
    #: override symbol length for block-length sweeps (reference minn.py:656-751)
    symbol_len: int | None = None

    @property
    def n(self) -> int:
        return self.symbol_len or self.sys.n_fft

    def metric(self, rx):
        return M.minn_metric(_dev(rx), self.n)

    @partial(jax.jit, static_argnums=0)
    def _detect_jit(self, rx):
        Mm, P, R = M.minn_metric(rx, self.n)
        peak, gate, Ms = M.find_minn_peak_standard(
            Mm, self.params.smooth_win, self.params.gate_threshold
        )
        return Mm, P, R, peak, gate, Ms

    def detect(self, rx):
        Mm, P, R, peak, gate, Ms = self._detect_jit(_dev(rx))
        return {
            "M": Mm,
            "P": P,
            "R": R,
            "peak": int(peak),
            "gate_mask": np.asarray(gate),
            "M_smooth": Ms,
        }


# ---------------------------------------------------------------------------
# D3: Minn-RTL adjacent-quarter (the flagship / benchmark detector)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class MinnRTLDetector:
    sys: SystemParams = SYS_30M72
    params: MinnRTLParams = MinnRTLParams()
    max_events: int = 8

    def metric(self, rx) -> M.MinnRTLMetricState:
        return self._metric_jit(_dev(rx))

    @partial(jax.jit, static_argnums=0)
    def _metric_jit(self, rx):
        return M.minn_rtl_metric(
            rx,
            smooth_shift=self.params.smooth_shift,
            threshold_value=self.params.threshold_value,
            threshold_frac_bits=self.params.threshold_frac_bits,
            quarter_len=self.params.quarter_len,
        )

    @partial(jax.jit, static_argnums=0)
    def _detect_jit(self, rx):
        state = M.minn_rtl_metric(
            rx,
            smooth_shift=self.params.smooth_shift,
            threshold_value=self.params.threshold_value,
            threshold_frac_bits=self.params.threshold_frac_bits,
            quarter_len=self.params.quarter_len,
        )
        # the gate FSM peak-tracks corr_positive with a `>=` update
        # (reference minn_rtl.py:771-813)
        table = extract_gate_events(
            state.above_threshold,
            state.corr_positive,
            hysteresis=self.params.hysteresis,
            max_events=self.max_events,
            valid_from=M.minn_rtl_valid_from(self.params.quarter_len),
            tie="last",
            emit_unclosed=False,
        )
        gmask = gate_open_mask(
            state.above_threshold,
            self.params.hysteresis,
            M.minn_rtl_valid_from(self.params.quarter_len),
        )
        return state, table, gmask

    def detect(self, rx) -> tuple[M.MinnRTLMetricState, DetectionResult]:
        x = _dev(rx)
        state, table, gmask = self._detect_jit(x)
        n = x.shape[-1]
        events = [
            DetectionEvent(
                detected_start=e["peak_index"] + self.params.timing_offset, **e
            )
            for e in events_from_table(table, n, gate_end_mode="close_excl")
        ]
        return state, DetectionResult(events=events, gate_mask=np.asarray(gmask))

    @partial(
        jax.jit,
        static_argnums=0,
        static_argnames=("frame_len", "max_frames", "rows", "stream_len",
                         "interpret"),
    )
    def _fused_frames_jit(
        self, planar, *, frame_len, max_frames, rows, stream_len, interpret
    ):
        from ofdm_sync_tpu.kernels.pallas_minn_tm import (
            minn_rtl_detect_fused_tm, to_time_tiled,
        )
        from ofdm_sync_tpu.ops.extract import extract_frames

        p = self.params
        xt, _, _ = to_time_tiled(planar, rows)
        table = minn_rtl_detect_fused_tm(
            xt,
            quarter_len=p.quarter_len,
            smooth_shift=p.smooth_shift,
            threshold_value=p.threshold_value,
            threshold_frac_bits=p.threshold_frac_bits,
            hysteresis=p.hysteresis,
            stream_len=stream_len,
            batch=1,
            max_events=self.max_events,
            rows=rows,
            interpret=interpret,
        )
        table0 = jax.tree.map(lambda a: a[0], table)
        # window opens at the frame's S0 start: the RTL peak sits at
        # s0 + 6Q (preamble 5Q + pilot CP Q; reference minn_rtl.py:93-103,
        # 943-953), so frame_start = peak + timing_offset - 6Q
        frames, starts, valid = extract_frames(
            planar[:, 0], table0,
            frame_len=frame_len,
            timing_offset=p.timing_offset - 6 * p.quarter_len,
            max_frames=max_frames,
        )
        return table0, frames, starts, valid

    def detect_fused_frames(
        self, rx, *, frame_len: int, max_frames: int = 4, rows: int = 4096,
        interpret: bool | None = None,
    ):
        """FLAGSHIP receive chain front half: the time-major fused kernel
        (`pallas_minn_tm`, the bench.py headline kernel) detects, then the
        R4 output contract re-emits each aligned frame window ON DEVICE
        (circular buffer + timer queue of ref/minn_preamble_detector.sv:
        445-530, re-expressed as `ops.extract`'s capacity-bounded batched
        dynamic-slice).

        rx: (branches, L) complex or (L,).  Windows open at the frame's S0
        start (peak + timing_offset - 6Q, the geometry of reference
        minn_rtl.py:943-953) and span ``frame_len`` samples.  Returns
        ``(result, frames, starts, valid)`` with frames planar
        ``(max_frames, 2*branches, frame_len)`` float32 (axon-fetchable).
        """
        # planarize in NumPy (a complex array must never touch the axon
        # device: it cannot be transferred back)
        x = np.asarray(rx)
        if x.ndim == 1:
            x = x[None, :]
        L = x.shape[-1]
        planar = jnp.asarray(
            np.stack([c for a in range(x.shape[0])
                      for c in (x[a].real, x[a].imag)]).astype(np.float32)
        )[:, None, :]  # (C=2*branches, batch=1, L)
        if interpret is None:
            interpret = jax.devices()[0].platform != "tpu"
        table0, frames, starts, valid = self._fused_frames_jit(
            planar, frame_len=frame_len, max_frames=max_frames, rows=rows,
            stream_len=L, interpret=interpret,
        )
        events = [
            DetectionEvent(
                detected_start=e["peak_index"] + self.params.timing_offset, **e
            )
            for e in events_from_table(table0, L, gate_end_mode="close_excl")
        ]
        result = DetectionResult(events=events, gate_mask=None)
        return (
            result, np.asarray(frames), np.asarray(starts), np.asarray(valid)
        )


# ---------------------------------------------------------------------------
# D4: Park
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ParkDetector:
    sys: SystemParams = SYS_30M72

    @property
    def cp_len(self) -> int:
        return self.sys.cp_len // 2  # reference park.py:29

    def metric(self, rx):
        return M.park_metric(_dev(rx), self.sys.n_fft)

    @partial(jax.jit, static_argnums=0)
    def _detect_jit(self, rx):
        ds, Mm, P, E = M.park_metric(rx, self.sys.n_fft)
        peak_rel = jnp.argmax(Mm)
        return ds, Mm, P, E, peak_rel

    def detect(self, rx):
        ds, Mm, P, E, peak_rel = self._detect_jit(_dev(rx))
        det_center = int(ds[int(peak_rel)])
        det_symbol_start = max(det_center - self.sys.n_fft // 2, 0)
        return {
            "ds": ds,
            "M": Mm,
            "P": P,
            "E": E,
            "det_center": det_center,
            "det_symbol_start": det_symbol_start,
            "det_cp_start": max(det_symbol_start - self.cp_len, 0),
        }


# ---------------------------------------------------------------------------
# D5: ZC time-domain matched filter
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ZCTimeDetector:
    sys: SystemParams = SYS_30M72
    params: ZCParams = ZCParams()

    def reference_waveform(self) -> np.ndarray:
        return build_pss_symbol(
            self.sys, self.params.pss_length, self.params.pss_root, include_cp=False
        )

    @partial(jax.jit, static_argnums=0)
    def _detect_jit(self, rx):
        ref = _dev_complex(self.reference_waveform())
        corr, mag = M.zc_normalized_correlation(rx, ref)
        return corr, mag, jnp.argmax(mag)

    def detect(self, rx):
        corr, mag, peak = self._detect_jit(_dev(rx))
        peak = int(peak)
        ref_len = self.sys.n_fft
        return {
            "corr": corr,
            "corr_mag": mag,
            "peak_index": peak,
            "detected_start": max(peak - ref_len + 1, 0),
        }


# ---------------------------------------------------------------------------
# D6: ZC frequency-domain
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ZCFreqDetector:
    sys: SystemParams = SYS_30M72
    params: ZCParams = ZCParams()
    chunk: int = 512
    #: 'fft' = the reference's chunked per-offset-FFT form (exact parity);
    #: 'sliding' = the TPU-native sliding-DFT form (each template bin is a
    #: windowed sum of a modulated stream -- ~100x the FFT form's
    #: throughput on the TPU, equal metric to f32 accumulation; see
    #: ops.metrics.zc_freq_metric_sliding)
    form: str = "fft"

    def template(self):
        return (
            centered_subcarrier_indices(self.params.pss_length),
            generate_zadoff_chu(self.params.pss_root, self.params.pss_length),
        )

    @partial(jax.jit, static_argnums=0)
    def _metric_jit(self, rx):
        bins, tmpl = self.template()
        if self.form == "sliding":
            return M.zc_freq_metric_sliding(
                rx, _dev_complex(tmpl), bins, self.sys.n_fft,
                self.sys.cp_len,
            )
        return M.zc_freq_metric(
            rx, _dev_complex(tmpl), bins, self.sys.n_fft, self.sys.cp_len,
            chunk=self.chunk,
        )

    def detect(self, rx):
        metric = self._metric_jit(_dev(rx))
        peak = int(jnp.argmax(metric))
        return {"metric": metric, "detected_cp_start": peak}


# ---------------------------------------------------------------------------
# D7: ZC streaming CFAR (FPGA-friendly)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ZCStreamingDetector:
    sys: SystemParams = SYS_30M72
    zc: ZCParams = ZCParams()
    params: ZCStreamingParams = ZCStreamingParams()
    max_events: int = 16
    normalize: bool = True
    #: matched-filter backend for `detect_fused_iq`: 'xla' = FFT convolution
    #: (bit-parity baseline), 'mxu' = the Pallas matmul-DFT overlap-save
    #: kernel (`kernels.pallas_mf`, ~2x the FFT rate on v5e, ~1e-5 of
    #: peak), 'auto' = mxu on TPU when the template fits, else xla
    mf_mode: str = "auto"

    def reference_waveform(self) -> np.ndarray:
        return build_pss_symbol(
            self.sys, self.zc.pss_length, self.zc.pss_root, include_cp=False
        )

    @partial(jax.jit, static_argnums=0)
    def _correlate(self, rx):
        """Matched filter + (optional) per-branch normalization -- the one
        definition shared by the XLA and fused paths."""
        ref = _dev_complex(self.reference_waveform())
        if self.normalize:
            corr = M.zc_normalized_correlation_per_branch(rx, ref)
        else:
            corr = jnp.sum(M.matched_filter(rx, ref), axis=0)
        return corr, jnp.abs(corr)

    @partial(jax.jit, static_argnums=0)
    def _detect_jit(self, rx):
        corr, corr_mag = self._correlate(rx)
        # CFAR: corr * 2^frac >= running_sum_W(corr) * thresh, plus floor
        # (reference zc_v2.py:288-336)
        from ofdm_sync_tpu.ops.windows import running_sum_stream

        local_sum = running_sum_stream(corr_mag, self.params.corr_window)
        n = corr_mag.shape[-1]
        valid = jnp.arange(n) >= self.params.corr_window
        scale = float(1 << self.params.threshold_frac_bits)
        above = (
            valid
            & (corr_mag * scale >= local_sum * float(self.params.threshold_value))
            & (corr_mag >= self.params.min_corr_mag)
        )
        table = extract_gate_events(
            above,
            corr_mag,
            hysteresis=self.params.hysteresis,
            max_events=self.max_events,
            tie="first",
            emit_unclosed=True,
        )
        gmask = gate_open_mask(above, self.params.hysteresis)
        return corr, corr_mag, local_sum, above, valid, table, gmask

    def detect(self, rx) -> DetectionResult:
        x = _dev(rx)
        corr, corr_mag, local_sum, above, valid, table, gmask = self._detect_jit(x)
        n = x.shape[-1] + self.sys.n_fft - 1
        ref_len = self.sys.n_fft
        events = [
            DetectionEvent(
                detected_start=max(0, e["peak_index"] - ref_len + 1), **e
            )
            for e in events_from_table(table, n, gate_end_mode="close")
        ]
        res = DetectionResult(events=events, gate_mask=np.asarray(gmask))
        res.state = {  # type: ignore[attr-defined]
            "corr": corr,
            "corr_mag": corr_mag,
            "local_sum": local_sum,
            "above": above,
            "valid": valid,
        }
        return res

    def detect_fused(self, rx) -> DetectionResult:
        """TPU fast path: XLA FFT matched filter + the fused Pallas CFAR/event
        kernel (kernels.pallas_zc).  Same events as `detect` (tests assert)."""
        from ofdm_sync_tpu.kernels.pallas_zc import zc_cfar_detect_pallas

        x = _dev(rx)
        _corr, corr_mag = self._correlate(x)
        table = zc_cfar_detect_pallas(
            corr_mag,
            corr_window=self.params.corr_window,
            threshold_value=self.params.threshold_value,
            threshold_frac_bits=self.params.threshold_frac_bits,
            min_corr_mag=self.params.min_corr_mag,
            hysteresis=self.params.hysteresis,
            max_events=self.max_events,
        )
        n = int(corr_mag.shape[-1])
        ref_len = self.sys.n_fft
        events = [
            DetectionEvent(
                detected_start=max(0, e["peak_index"] - ref_len + 1), **e
            )
            for e in events_from_table(table, n, gate_end_mode="close")
        ]
        return DetectionResult(events=events)

    def detect_fused_iq(self, rx) -> DetectionResult:
        """From-IQ fused path: matched filter (MXU matmul-DFT kernel or XLA
        FFT, `mf_mode`), then ONE Pallas pass for per-branch sliding energy
        + normalization + branch sum + magnitude + CFAR + event FSM
        (`kernels.pallas_zc.zc_iq_cfar_detect_pallas`) -- none of the five
        full-length intermediates of the XLA form touch HBM.  Planar
        end-to-end: complex buffers never cross the jit/device boundary
        (the axon TPU backend supports complex only INSIDE a compiled
        computation).  Requires ``normalize=True`` (the per-branch zc_v2
        flavour, reference zc_v2.py:486-498).  Same events as `detect`
        (tests assert)."""
        from ofdm_sync_tpu.kernels.pallas_mf import MAX_TAPS, matched_filter_mxu
        from ofdm_sync_tpu.kernels.pallas_zc import zc_iq_cfar_detect_pallas
        from ofdm_sync_tpu.ops.channel import fft_convolve_full

        if not self.normalize:
            return self.detect_fused(rx)
        ref_np = np.asarray(self.reference_waveform(), np.complex64)
        R = int(ref_np.shape[-1])
        # host-side norm: device->host scalar fetches derived from complex
        # ops are UNIMPLEMENTED on the axon backend
        ref_norm = float(np.sqrt(np.sum(np.abs(ref_np) ** 2)))
        # conjugate-reversed taps, planar float32 (reference zc_v2.py:249)
        kern_planar = jnp.asarray(np.stack(
            [ref_np.real[::-1], -ref_np.imag[::-1]]
        ).astype(np.float32))
        iq_planar = _planar(rx)[:, None, :]  # (2B, 1, L)
        mode = self.mf_mode
        if mode == "auto":
            on_tpu = jax.devices()[0].platform == "tpu"
            mode = "mxu" if (on_tpu and R <= MAX_TAPS) else "xla"

        def compute(iqp, kp):
            if mode == "mxu":
                # planar in, planar out: no complex intermediate in HBM
                mfp = matched_filter_mxu(iqp, kp)
            else:
                xc = iqp[0::2, 0] + 1j * iqp[1::2, 0]  # (B, L) complex
                mf = fft_convolve_full(xc, (kp[0] + 1j * kp[1])[None])
                mfp = jnp.stack(
                    [jnp.real(mf), jnp.imag(mf)], axis=1
                ).reshape(2 * mf.shape[0], 1, mf.shape[-1])
            return zc_iq_cfar_detect_pallas(
                mfp,
                iqp,
                ref_len=R,
                ref_norm=ref_norm,
                corr_window=self.params.corr_window,
                threshold_value=self.params.threshold_value,
                threshold_frac_bits=self.params.threshold_frac_bits,
                min_corr_mag=self.params.min_corr_mag,
                hysteresis=self.params.hysteresis,
                max_events=self.max_events,
            )

        table = jax.jit(compute)(iq_planar, kern_planar)
        table = jax.tree.map(lambda a: a[0], table)
        n = int(iq_planar.shape[-1]) + R - 1
        ref_len = self.sys.n_fft
        events = [
            DetectionEvent(
                detected_start=max(0, e["peak_index"] - ref_len + 1), **e
            )
            for e in events_from_table(table, n, gate_end_mode="close")
        ]
        return DetectionResult(events=events)

    @staticmethod
    def strongest(result: DetectionResult) -> DetectionEvent | None:
        """Reference selects the strongest event, not the first
        (reference zc_v2.py:567-576)."""
        return result.best_by(lambda e: e.peak_value)


# ---------------------------------------------------------------------------
# D8: combined S&C gate + Minn peak
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class CombinedSCMinnDetector:
    sys: SystemParams = SYS_30M72
    smooth_win: int = 16
    sc_gate_threshold: float = 0.6

    @partial(jax.jit, static_argnums=0)
    def _detect_jit(self, rx):
        Mm, P, R = M.minn_metric(rx, self.sys.n_fft)
        M_sc, P_sc, R_sc = M.sc_generic_metric(rx, self.sys.n_fft)
        max_sc = jnp.max(M_sc)
        sc_norm = jnp.where(max_sc > 0, M_sc / max_sc, M_sc)
        gate = sc_norm >= self.sc_gate_threshold
        # seed the gate with the strongest S&C sample if empty
        # (reference combined_sc_min.py:347-351)
        fallback = jnp.zeros_like(gate).at[jnp.argmax(M_sc)].set(True)
        gate = jnp.where(jnp.any(gate), gate, fallback)
        # Minn peak restricted to the S&C gate, trailing-average smoothed,
        # streaming past-only peak: first gate segment's argmax
        # (reference combined_sc_min.py:183-259)
        from ofdm_sync_tpu.ops.windows import trailing_average

        Ms = trailing_average(jnp.maximum(Mm, 0.0), self.smooth_win)
        # emulate the streaming detector: peak within the FIRST gate segment
        idx = jnp.arange(gate.shape[-1], dtype=jnp.int32)
        first_start = jnp.argmax(gate).astype(jnp.int32)
        after = idx >= first_start
        off = jnp.argmax(after & ~gate)  # first False after gate start
        first_end = jnp.where(jnp.any(after & ~gate), off, gate.shape[-1])
        in_first = gate & (idx >= first_start) & (idx < first_end)
        peak = jnp.argmax(jnp.where(in_first, Ms, -jnp.inf)).astype(jnp.int32)
        return Mm, M_sc, sc_norm, gate, Ms, peak

    def detect(self, rx):
        Mm, M_sc, sc_norm, gate, Ms, peak = self._detect_jit(_dev(rx))
        return {
            "M_minn": Mm,
            "M_sc": M_sc,
            "sc_norm": sc_norm,
            "sc_gate_mask": np.asarray(gate),
            "M_smooth": Ms,
            "peak": int(peak),
        }


# ---------------------------------------------------------------------------
# D9: [A][A] grid-tested detector
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class AADetector:
    sys: SystemParams = SYS_AA_10M
    params: AADetectorParams = AADetectorParams()
    max_events: int = 8

    @property
    def L(self) -> int:
        return self.params.half_len

    def metric(self, rx) -> M.AAMetricState:
        return self._metric_jit(_dev(rx))

    @partial(jax.jit, static_argnums=0)
    def _metric_jit(self, rx):
        return M.aa_metric(rx, self.L)

    @partial(jax.jit, static_argnums=0)
    def _detect_jit(self, rx):
        state = M.aa_metric(rx, self.L)
        above = state.valid & (state.M >= self.params.threshold)
        track = jnp.abs(state.P) ** 2  # peak on |P|^2, not M
        table = extract_gate_events(
            above,
            track,
            hysteresis=self.params.hysteresis,
            max_events=self.max_events,
            tie="first",
            emit_unclosed=True,
        )
        P_at_peak = state.P[table.peak_idx]
        M_at_peak = state.M[table.peak_idx]
        return state, table, P_at_peak, M_at_peak

    def _assemble_events(self, table, n, p_re, p_im, m_pk) -> DetectionResult:
        """Event list from a gate table + per-slot planar P and M at the
        peak: cfo = angle(P) fs / (2 pi L), frame_start = peak - 2L + 1
        (reference sync_aa.py:533-540).  The one definition shared by the
        XLA and fused paths."""
        L = self.L
        fs = self.sys.sample_rate_hz
        events = []
        for slot, e in zip(
            np.flatnonzero(np.asarray(table.valid)),
            events_from_table(table, n, gate_end_mode="close"),
        ):
            cfo = float(np.arctan2(p_im[slot], p_re[slot])) * fs / (
                2 * np.pi * L
            )
            events.append(
                DetectionEvent(
                    detected_start=e["peak_index"] - 2 * L + 1,
                    cfo_hz=cfo,
                    metric_at_peak=float(m_pk[slot]),
                    **e,
                )
            )
        return DetectionResult(events=events)

    def detect(self, rx) -> tuple[M.AAMetricState, DetectionResult]:
        x = _dev(rx)
        state, table, P_at_peak, M_at_peak = self._detect_jit(x)
        P_at_peak = np.asarray(P_at_peak)
        return state, self._assemble_events(
            table, x.shape[-1], P_at_peak.real, P_at_peak.imag,
            np.asarray(M_at_peak),
        )

    def _planarize_and_detect_fused(self, rx):
        """Shared front half of the fused paths: planar-ize (the axon TPU
        backend cannot take or return complex buffers, and the kernel wants
        planar f32 anyway) and run the fused kernel.  Returns
        (iq_planar, n, table, P_pk, M_pk)."""
        from ofdm_sync_tpu.kernels.pallas_aa import aa_detect_fused_pallas
        from ofdm_sync_tpu.kernels.streaming import to_planar

        if isinstance(rx, np.ndarray):
            x = rx[None] if rx.ndim == 1 else rx
            iq = jnp.asarray(
                np.stack([x.real, x.imag], axis=-2), jnp.float32
            )
            n = x.shape[-1]
        else:
            x = _dev(rx)
            if x.ndim == 1:
                x = x[None]
            iq = to_planar(x)
            n = x.shape[-1]
        table, P_pk, M_pk = aa_detect_fused_pallas(
            iq,
            half_len=self.L,
            threshold=self.params.threshold,
            hysteresis=self.params.hysteresis,
            max_events=self.max_events,
        )
        return iq, n, table, P_pk, M_pk

    def detect_fused(self, rx) -> DetectionResult:
        """TPU fast path: the fully-fused Pallas kernel (kernels.pallas_aa).

        Semantically identical to `detect` (tests assert table equality) but
        reads the IQ stream from HBM exactly once and emits only the event
        table -- use for long streams / large batches on hardware.
        """
        _, n, table, P_pk, M_pk = self._planarize_and_detect_fused(rx)
        P_pk = np.asarray(P_pk)  # planar (2, E)
        return self._assemble_events(
            table, n, P_pk[0], P_pk[1], np.asarray(M_pk)
        )

    def detect_fused_frames(
        self, rx, *, frame_len: int, max_frames: int = 4
    ):
        """R4 output contract: detect AND re-emit the aligned frame windows
        on device (reference ref/minn_preamble_detector.sv:445-530 — the
        circular-buffer + timer-queue re-emission; here a capacity-bounded
        batched dynamic-slice over the HBM stream, `ops.extract`).

        Frame windows open at ``peak - 2L + 1`` (the AA frame start,
        reference sync_aa.py:540 / docs/aa_preamble_sync_design.md §9) and
        span ``frame_len`` samples.  Returns ``(result, frames, starts,
        valid)`` with frames planar ``(max_frames, 2*BR, frame_len)``
        float32 — fetchable through the axon tunnel (no complex buffers).
        """
        from ofdm_sync_tpu.ops.extract import extract_frames

        iq, n, table, P_pk, M_pk = self._planarize_and_detect_fused(rx)
        frames, starts, valid = extract_frames(
            iq.reshape(-1, n), table,
            frame_len=frame_len,
            timing_offset=-(2 * self.L - 1),
            max_frames=max_frames,
        )
        P_pk = np.asarray(P_pk)
        result = self._assemble_events(
            table, n, P_pk[0], P_pk[1], np.asarray(M_pk)
        )
        return result, np.asarray(frames), np.asarray(starts), np.asarray(
            valid
        )

    @staticmethod
    def best(result: DetectionResult) -> DetectionEvent | None:
        """Strongest event by metric (reference sync_aa.py:742-743)."""
        return result.best_by(lambda e: e.metric_at_peak)
