"""Shared simulation-harness plumbing.

Every reference experiment driver repeats the same skeleton:
build frame -> channel -> CFO -> detect -> CFO-est -> LS-EQ -> EVM -> report
(reference sc.py:159-347 and its near-verbatim clones; SURVEY section 3.1).
This module factors that skeleton once; per-detector pipelines supply only
the preamble, the detection step, and detector-specific report lines.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from ofdm_sync_tpu.params import SystemParams, SYS_30M72
from ofdm_sync_tpu.ops.channel import (
    apply_cfo,
    apply_channel,
    compute_channel_peak_offset,
    load_measured_cir,
)
from ofdm_sync_tpu.ops.estimate import (
    align_complex_gain,
    equalize,
    estimate_cfo_from_cp,
    ls_channel_estimate,
    evm_rms_db,
    reconstruct_cir_from_ls,
)
from ofdm_sync_tpu.ops.waveforms import assemble_frame, build_random_qpsk_symbol, ofdm_fft_used
from ofdm_sync_tpu.utils import report

PLOTS_ROOT = Path("plots")


@dataclass
class SimSetup:
    """Stimulus + channel for one run (mirrors reference frame assembly)."""

    sys: SystemParams
    tx: np.ndarray
    rx: np.ndarray
    pilot_symbol: np.ndarray
    pilot_used: np.ndarray
    data_symbol: np.ndarray
    data_used: np.ndarray
    cir: np.ndarray | None
    channel_name: str | None
    channel_peak_offset: int
    cfo_hz: float
    extras: dict = field(default_factory=dict)

    @property
    def channel_desc(self) -> str:
        return f"Measured CIR '{self.channel_name}'" if self.channel_name else "Flat AWGN"

    @property
    def true_cp_start(self) -> int:
        return self.sys.tx_pre_pad + self.channel_peak_offset


def select_cir(channel_name: str | None, mode: str) -> np.ndarray | None:
    """Branch selection conventions of the reference scripts:
      'ch1'  -> only RX channel 1 (reference sc.py:191-192)
      'two'  -> first two RX channels (reference minn.py:344-351)
      'all'  -> full bank (reference park.py:147, zc_freq.py:125-126)
    """
    if channel_name is None:
        return None
    bank = load_measured_cir(channel_name)
    if mode == "ch1":
        return bank[1:2]
    if mode == "two":
        return bank[:2].copy() if bank.shape[0] > 2 else bank.copy()
    if mode == "all":
        return bank.copy()
    raise ValueError(f"unknown CIR selection mode '{mode}'")


def build_setup(
    preamble: np.ndarray,
    rng: np.random.Generator,
    *,
    sys: SystemParams = SYS_30M72,
    channel_name: str | None,
    cir_mode: str,
    snr_db: float,
    cfo_hz: float,
    two_frames: bool = False,
) -> SimSetup:
    """Assemble [pad | preamble | pilot | data] (optionally doubled with an
    inter-frame guard, reference minn_rtl.py:884-889), apply channel + CFO.

    RNG call order matches the reference scripts exactly so seeded runs are
    bit-identical.
    """
    pilot_symbol, pilot_used = build_random_qpsk_symbol(rng, sys, include_cp=True)
    data_symbol, data_used = build_random_qpsk_symbol(rng, sys, include_cp=True)
    frame = np.concatenate((preamble, pilot_symbol, data_symbol))
    if two_frames:
        inter_guard = np.zeros(frame.size, dtype=complex)
        tx = np.concatenate(
            (np.zeros(sys.tx_pre_pad, dtype=complex), frame, inter_guard, frame)
        )
    else:
        tx = assemble_frame(frame, pre_pad=sys.tx_pre_pad)

    cir = select_cir(channel_name, cir_mode)
    rx = apply_channel(tx, snr_db, rng, cir)
    rx = np.asarray(apply_cfo(jnp.asarray(rx, jnp.complex64), cfo_hz, sys.sample_rate_hz))
    return SimSetup(
        sys=sys,
        tx=tx,
        rx=rx,
        pilot_symbol=pilot_symbol,
        pilot_used=pilot_used,
        data_symbol=data_symbol,
        data_used=data_used,
        cir=cir,
        channel_name=channel_name,
        channel_peak_offset=compute_channel_peak_offset(cir),
        cfo_hz=cfo_hz,
        extras={"frame_len": frame.size},
    )


@dataclass
class PostDetection:
    cfo_est_hz: float
    h_est: np.ndarray
    slope_rad_per_bin: float
    timing_offset_samples: float
    gain: complex
    evm_rms: float
    evm_db: float
    xhat_aligned: np.ndarray


def post_detection_chain(
    setup: SimSetup,
    preamble_n_start_est: int,
    plots_dir: Path | None,
    detector_label: str,
) -> PostDetection:
    """CFO-est -> compensate -> LS from pilot -> STO diag -> equalize -> EVM
    (reference sc.py:274-310 and clones)."""
    sys = setup.sys
    rx = jnp.asarray(setup.rx, jnp.complex64)
    pilot_cp_start = preamble_n_start_est + sys.n_fft
    cfo_est = float(
        estimate_cfo_from_cp(rx, pilot_cp_start, sys.n_fft, sys.cp_len, sys.sample_rate_hz)
    )
    rx_corr = apply_cfo(rx, -cfo_est, sys.sample_rate_hz)
    rx_eff = jnp.mean(rx_corr, axis=0) if rx_corr.ndim == 2 else rx_corr

    pilot_td = rx_eff[pilot_cp_start + sys.cp_len : pilot_cp_start + sys.cp_len + sys.n_fft]
    y_pilot = ofdm_fft_used(pilot_td, sys)
    h_est = ls_channel_estimate(y_pilot, jnp.asarray(setup.pilot_used))

    if plots_dir is not None:
        slope, sto = report.plot_phase_slope(
            h_est,
            plots_dir / "phase_slope_sto.png",
            f"Residual Timing From Phase Slope ({detector_label}, {setup.channel_desc})",
            sys.n_fft,
            sys.num_active,
        )
    else:
        from ofdm_sync_tpu.ops.estimate import estimate_timing_offset_from_phase_slope

        s, t = estimate_timing_offset_from_phase_slope(h_est, sys.n_fft, sys.num_active)
        slope, sto = float(s), float(t)

    data_cp_start = pilot_cp_start + sys.cp_len + sys.n_fft
    data_td = rx_eff[data_cp_start + sys.cp_len : data_cp_start + sys.cp_len + sys.n_fft]
    y_data = ofdm_fft_used(data_td, sys)
    xhat = equalize(y_data, h_est)
    xhat_aligned, gain = align_complex_gain(xhat, jnp.asarray(setup.data_used))
    evm, evm_db = evm_rms_db(xhat_aligned, jnp.asarray(setup.data_used))

    if plots_dir is not None:
        report.plot_constellation(
            xhat_aligned,
            setup.data_used,
            plots_dir / "constellation.png",
            f"Equalized Data Constellation ({detector_label}, {setup.channel_desc})",
        )
    return PostDetection(
        cfo_est_hz=cfo_est,
        h_est=np.asarray(h_est),
        slope_rad_per_bin=slope,
        timing_offset_samples=sto,
        gain=complex(gain),
        evm_rms=float(evm),
        evm_db=float(evm_db),
        xhat_aligned=np.asarray(xhat_aligned),
    )


def emit_standard_artifacts(setup: SimSetup, plots_dir: Path, detector_label: str) -> None:
    """tx/rx time series + channel CIR plots shared by every sim."""
    report.plot_time_series(
        setup.tx, "Transmit Frame (with Leading Zeros)", plots_dir / "tx_frame_time.png"
    )
    report.plot_time_series(
        setup.rx,
        f"Received Frame After Channel ({setup.channel_desc})",
        plots_dir / "rx_frame_time.png",
    )
    if setup.cir is not None:
        report.plot_time_series(
            setup.cir,
            f"Measured Channel CIR ('{setup.channel_name}')",
            plots_dir / "channel_cir.png",
        )


def emit_ls_cir_artifact(
    setup: SimSetup, post: PostDetection, timing_error: int, plots_dir: Path,
    detector_label: str,
) -> None:
    ls_cir = reconstruct_cir_from_ls(
        jnp.asarray(post.h_est), setup.sys.n_fft, setup.sys.num_active
    )
    report.plot_ls_cir(
        ls_cir,
        setup.cir,
        setup.channel_peak_offset,
        timing_error,
        plots_dir / "ls_cir.png",
        f"LS-Derived CIR ({detector_label}, {setup.channel_desc})",
    )


def print_common_header(setup: SimSetup, title: str) -> None:
    report.banner(f"{title} - {setup.channel_desc.upper()}")
    print(f"Transmit sequence length: {setup.tx.size} samples")
    print(f"Receive branches: {setup.rx.shape[0] if setup.rx.ndim == 2 else 1}")
    if setup.cir is not None:
        print(
            f"Applied measured channel '{setup.channel_name}' using "
            f"{setup.cir.shape[0]} RX branch(es) taps={setup.cir.shape[1]} "
            f"main-path offset={setup.channel_peak_offset}"
        )
    else:
        print("Channel profile: Flat AWGN (no multipath)")


def print_cfo_block(applied: float, estimated: float) -> None:
    print(f"\nCarrier Frequency Offset:")
    print(f"  Applied CFO: {applied} Hz")
    print(f"  Estimated CFO from CP: {estimated:.2f} Hz")
    err = abs(estimated - applied)
    pct = err / applied * 100 if applied else float("inf")
    print(f"  CFO error: {err:.2f} Hz ({pct:.1f}%)")


def print_eq_block(post: PostDetection) -> None:
    print(f"\nChannel Estimation & Equalization:")
    print(
        f"  Pilot LS phase slope: {post.slope_rad_per_bin:.6f} rad/bin "
        f"-> timing ~ {post.timing_offset_samples:.2f} samples"
    )
    print(
        f"  Post-EQ complex gain (mag, angle): "
        f"{abs(post.gain):.3f}, {np.angle(post.gain):.3f} rad"
    )
    print(f"  EVM RMS: {100 * post.evm_rms:.2f}%  ({post.evm_db:.2f} dB)")


def make_plots_dir(detector: str, subdir: str) -> Path:
    d = PLOTS_ROOT / detector / subdir
    d.mkdir(parents=True, exist_ok=True)
    return d
