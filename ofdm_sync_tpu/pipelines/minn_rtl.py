"""Minn-RTL fixed-point detector simulation + sequence/Q sweeps
(reference minn_rtl.py:849-1735)."""

from __future__ import annotations

import numpy as np

from ofdm_sync_tpu.params import MinnRTLParams, SYS_30M72
from ofdm_sync_tpu.models.detectors import MinnRTLDetector
from ofdm_sync_tpu.ops.detect import mask_segments
from ofdm_sync_tpu.ops.waveforms import build_minn_rtl_preamble
from ofdm_sync_tpu.pipelines import common
from ofdm_sync_tpu.utils import report

SNR_DB = 0.0
CFO_HZ = 1000.0
DETECTOR = "minn_rtl"
DEFAULT_PARAMS = MinnRTLParams()


def run_simulation(
    channel_name: str | None,
    plots_subdir: str | None = None,
    params: MinnRTLParams = DEFAULT_PARAMS,
):
    sys = SYS_30M72
    rng = np.random.default_rng(0)
    plots_dir = common.make_plots_dir(DETECTOR, plots_subdir) if plots_subdir else None

    preamble = build_minn_rtl_preamble(params.seq_type, rng, Q=params.quarter_len, sys=sys)
    # two frames with an inter-frame guard (reference minn_rtl.py:884-889)
    setup = common.build_setup(
        preamble, rng, sys=sys, channel_name=channel_name, cir_mode="two",
        snr_db=SNR_DB, cfo_hz=CFO_HZ, two_frames=True,
    )
    frame_len = setup.extras["frame_len"]

    det = MinnRTLDetector(sys, params)
    state, result = det.detect(setup.rx)
    events = result.events

    if events:
        primary = events[0]
        detected_start = primary.detected_start
        peak_position = primary.peak_index
    else:
        peak_position = int(np.argmax(np.asarray(state.smooth_metric)))
        detected_start = peak_position + params.timing_offset
    gate_segments = [
        (e.gate_start, e.gate_end) for e in events
    ] or mask_segments(result.gate_mask)

    # expected: RTL peak == pilot N-start, for each of the two frames
    Q = params.quarter_len
    preamble_len = 5 * Q
    frame_starts = [sys.tx_pre_pad, sys.tx_pre_pad + 2 * frame_len]
    s0_starts = [s + setup.channel_peak_offset for s in frame_starts]
    pilot_n_starts = [s0 + preamble_len + sys.cp_len for s0 in s0_starts]
    expected = pilot_n_starts[0]
    timing_error = detected_start - expected
    per_event_errors = [
        e.detected_start - pilot_n_starts[i] if i < len(pilot_n_starts) else None
        for i, e in enumerate(events)
    ]

    if plots_dir is not None:
        thresh_trace = np.full(np.asarray(state.energy_total).shape, np.nan)
        valid = np.asarray(state.metric_valid)
        thresh_trace[valid] = (
            np.asarray(state.energy_scaled)[valid] / float(1 << params.threshold_frac_bits)
        )
        report.plot_metric(
            state.corr_positive, plots_dir / "minn_rtl_metric.png",
            f"Minn RTL Metric & Gate - {setup.channel_desc}",
            vlines=[(peak_position, "tab:red", ":", "Detected peak")]
            + [(e, "tab:green", "--", "Pilot N start (exp)" if i == 0 else None)
               for i, e in enumerate(pilot_n_starts)],
            extra_traces=[
                (np.asarray(state.smooth_metric), "RTL smooth(d)", "--"),
                (thresh_trace, "Threshold (scaled)", ":"),
            ],
            spans=[(s, e, "Gate window") for s, e in gate_segments],
            ylabel="Metric",
        )
        report.plot_rx_and_metric(
            setup.rx, state.corr_positive, plots_dir / "start_detection.png",
            f"Received Magnitude and Detected Start (Minn RTL, {setup.channel_desc})",
            "Timing Metrics (Minn RTL)",
            vlines_top=[
                (s0_starts[0], "tab:purple", "--", "Preamble S0 start"),
                (expected, "tab:green", "--", "Pilot N start (exp)"),
                (detected_start, "tab:red", ":", "Detected start"),
            ],
            vlines_bottom=[
                (peak_position, "tab:red", ":", "Detected peak"),
                (expected, "tab:green", "--", "Pilot N start (exp)"),
            ],
            spans=[(s, e, "Gate window") for s, e in gate_segments],
        )
        common.emit_standard_artifacts(setup, plots_dir, "Minn RTL")

    post = common.post_detection_chain(setup, detected_start, plots_dir, "Minn RTL")
    if plots_dir is not None:
        common.emit_ls_cir_artifact(setup, post, timing_error, plots_dir, "Minn RTL")

    common.print_common_header(setup, "MINN RTL SYNCHRONIZATION RESULTS")
    print(f"\nTiming Detections:")
    if events:
        print(f"  Detected {len(events)} event(s)")
        for i, e in enumerate(events):
            exp = pilot_n_starts[i] if i < len(pilot_n_starts) else None
            err = per_event_errors[i]
            if exp is not None and err is not None:
                print(
                    f"    Event {i}: peak={e.peak_index} detected={e.detected_start} "
                    f"expected={exp} error={err} samples"
                )
            else:
                print(
                    f"    Event {i}: peak={e.peak_index} detected={e.detected_start} "
                    "(no expected reference)"
                )
    else:
        print(f"  No detection events; fallback peak at d={peak_position}")
    frac = params.threshold_value / float(1 << params.threshold_frac_bits)
    for i, (s, e) in enumerate(gate_segments):
        print(f"  Gate {i}: [{s}, {e}) threshold >={frac:.1%} span {e - s} samples")
    print(f"  Frame length: {frame_len} samples, guard length: {frame_len} samples")
    print(
        f"  Primary timing error: {timing_error} samples "
        f"({abs(timing_error)/sys.n_fft*100:.1f}% of symbol)"
    )
    common.print_cfo_block(CFO_HZ, post.cfo_est_hz)
    common.print_eq_block(post)
    if plots_dir is not None:
        print(f"\nPlots saved to {plots_dir.resolve()}/")
    print(report.BANNER + "\n")
    return {
        "events": [(e.peak_index, e.detected_start) for e in events],
        "timing_error": timing_error,
        "per_event_errors": per_event_errors,
        "cfo_est_hz": post.cfo_est_hz,
        "evm_rms": post.evm_rms,
        "evm_db": post.evm_db,
    }


# ---------------------------------------------------------------------------
# Sweeps (reference minn_rtl.py:1187-1328, 1493-1592)
# ---------------------------------------------------------------------------

def _metric_quality(metric: np.ndarray, peak_idx: int, tx_pre_pad: int) -> dict:
    mask = np.ones(metric.size, bool)
    mask[max(0, peak_idx - 500) : min(metric.size, peak_idx + 500)] = False
    mask[:tx_pre_pad] = False
    noise = metric[mask]
    peak_val = float(metric[peak_idx])
    nf = float(noise.mean()) if noise.size else 0.0
    nm = float(noise.max()) if noise.size else 0.0
    return {
        "peak_val": peak_val,
        "noise_floor": nf,
        "noise_max": nm,
        "par": peak_val / nf if nf > 0 else float("inf"),
        "pmr": peak_val / nm if nm > 0 else float("inf"),
    }


def run_sequence_comparison(
    channel_name: str | None,
    seq_types: tuple[str, ...] = (
        "bpsk_freq", "qpsk_freq", "zc_time", "zc_freq", "chirp", "gold", "random_phase",
    ),
    params: MinnRTLParams = DEFAULT_PARAMS,
) -> list[dict]:
    """Peak-to-sidelobe comparison across preamble base sequences
    (reference minn_rtl.py:1187-1328)."""
    sys = SYS_30M72
    results = []
    for seq_type in seq_types:
        rng = np.random.default_rng(0)
        p = MinnRTLParams(
            quarter_len=params.quarter_len,
            smooth_shift=params.smooth_shift,
            threshold_frac_bits=params.threshold_frac_bits,
            threshold_value=params.threshold_value,
            hysteresis=params.hysteresis,
            timing_offset=params.timing_offset,
            seq_type=seq_type,
        )
        preamble = build_minn_rtl_preamble(seq_type, rng, Q=p.quarter_len, sys=sys)
        setup = common.build_setup(
            preamble, rng, sys=sys, channel_name=channel_name, cir_mode="two",
            snr_db=SNR_DB, cfo_hz=CFO_HZ, two_frames=True,
        )
        det = MinnRTLDetector(sys, p)
        state, result = det.detect(setup.rx)
        frame_len = setup.extras["frame_len"]
        pilot_n_start = (
            sys.tx_pre_pad + setup.channel_peak_offset + 5 * p.quarter_len + sys.cp_len
        )
        metric = np.asarray(state.corr_positive)
        if result.events:
            peak_idx = result.events[0].peak_index
            timing_error = result.events[0].detected_start - pilot_n_start
        else:
            peak_idx = int(np.argmax(np.asarray(state.smooth_metric)))
            timing_error = peak_idx - pilot_n_start
        q = _metric_quality(metric, peak_idx, sys.tx_pre_pad)
        results.append({"seq_type": seq_type, "peak_idx": peak_idx,
                        "timing_error": timing_error, **q})
    results.sort(key=lambda r: -r["pmr"])
    desc = f"Measured CIR '{channel_name}'" if channel_name else "Flat AWGN"
    report.banner(f"SEQUENCE COMPARISON - {desc.upper()}")
    print(f"{'Sequence':<15} {'Peak':>10} {'Noise Avg':>12} {'Noise Max':>12} "
          f"{'PAR':>8} {'PMR':>8} {'Timing Err':>12}")
    for r in results:
        print(f"{r['seq_type']:<15} {r['peak_val']:>10.1f} {r['noise_floor']:>12.1f} "
              f"{r['noise_max']:>12.1f} {r['par']:>8.1f} {r['pmr']:>8.1f} "
              f"{r['timing_error']:>+12d}")
    return results


def compare_q_values(
    q_values: list[int],
    channel_name: str | None = None,
    params: MinnRTLParams = DEFAULT_PARAMS,
) -> dict[int, dict]:
    """Detection quality vs segment length Q (reference minn_rtl.py:1493-1592)."""
    sys = SYS_30M72
    out: dict[int, dict] = {}
    for Q in q_values:
        rng = np.random.default_rng(0)
        p = MinnRTLParams(
            quarter_len=Q,
            smooth_shift=params.smooth_shift,
            threshold_frac_bits=params.threshold_frac_bits,
            threshold_value=params.threshold_value,
            hysteresis=params.hysteresis,
            timing_offset=params.timing_offset,
            seq_type=params.seq_type,
        )
        preamble = build_minn_rtl_preamble(p.seq_type, rng, Q=Q, sys=sys)
        setup = common.build_setup(
            preamble, rng, sys=sys, channel_name=channel_name, cir_mode="two",
            snr_db=SNR_DB, cfo_hz=CFO_HZ, two_frames=True,
        )
        det = MinnRTLDetector(sys, p)
        state, result = det.detect(setup.rx)
        frame_len = setup.extras["frame_len"]
        pilot_n_start = sys.tx_pre_pad + setup.channel_peak_offset + 5 * Q + sys.cp_len
        metric = np.asarray(state.corr_positive)
        if result.events:
            peak_idx = result.events[0].peak_index
            timing_error = result.events[0].detected_start - pilot_n_start
        else:
            peak_idx = int(np.argmax(np.asarray(state.smooth_metric)))
            timing_error = peak_idx - pilot_n_start
        q = _metric_quality(metric, peak_idx, sys.tx_pre_pad)
        out[Q] = {
            "peak": q["peak_val"],
            "par": q["par"],
            "pmr": q["pmr"],
            "timing_error": timing_error,
            "preamble_len": 5 * Q,
            "overhead_pct": 100.0 * 5 * Q / frame_len,
        }
    return out


def plot_q_comparison(
    channel_name: str | None,
    q_values: tuple[int, ...] = (128, 256, 512),
    snr_values: tuple[float, ...] = (-5.0, 0.0, 5.0, 10.0),
    params: MinnRTLParams = DEFAULT_PARAMS,
) -> None:
    """Per-SNR overlay of the smoothed Minn-RTL metric for each segment
    length Q (reference minn_rtl.py:1620-1731; artifact set
    plots/minn_rtl/q_comparison/)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from pathlib import Path

    sys0 = SYS_30M72
    cond = "measured_channel" if channel_name else "flat_awgn"
    out_dir = Path("plots/minn_rtl/q_comparison")
    out_dir.mkdir(parents=True, exist_ok=True)
    for snr_db in snr_values:
        fig, ax = plt.subplots(figsize=(11, 5))
        for Q in q_values:
            rng = np.random.default_rng(0)
            p = MinnRTLParams(
                quarter_len=Q,
                smooth_shift=params.smooth_shift,
                threshold_frac_bits=params.threshold_frac_bits,
                threshold_value=params.threshold_value,
                hysteresis=params.hysteresis,
                timing_offset=params.timing_offset,
                seq_type=params.seq_type,
            )
            preamble = build_minn_rtl_preamble(p.seq_type, rng, Q=Q, sys=sys0)
            setup = common.build_setup(
                preamble, rng, sys=sys0, channel_name=channel_name,
                cir_mode="two", snr_db=snr_db, cfo_hz=CFO_HZ, two_frames=True,
            )
            state, _ = MinnRTLDetector(sys0, p).detect(setup.rx)
            sm = np.asarray(state.smooth_metric)
            ax.plot(sm / max(sm.max(), 1e-12), label=f"Q={Q}", linewidth=0.9)
        ax.set_title(
            f"Minn-RTL smoothed metric vs Q - {cond}, SNR {snr_db:+.0f} dB"
        )
        ax.set_xlabel("Sample offset")
        ax.set_ylabel("Normalized smoothed metric")
        ax.grid(True, alpha=0.4)
        ax.legend()
        fig.tight_layout()
        fig.savefig(
            out_dir / f"{cond}_q_comparison_snr{snr_db:+.0f}dB.png", dpi=110
        )
        plt.close(fig)
    print(f"Q comparison artifacts written to {out_dir}/")


def main() -> None:
    report.banner("MINN RTL PREAMBLE SYNCHRONIZATION - DUAL CONDITION ANALYSIS")
    run_simulation(channel_name="cir1", plots_subdir="measured_channel")
    run_simulation(channel_name=None, plots_subdir="flat_awgn")
    run_sequence_comparison(channel_name=None)
    q_results = compare_q_values([128, 256, 512])
    report.banner("Q VALUE COMPARISON - FLAT AWGN")
    print(f"{'Q':>6} {'Peak':>10} {'PAR':>8} {'PMR':>8} "
          f"{'TimingErr':>10} {'PreLen':>8} {'Overhead%':>10}")
    for Q, r in q_results.items():
        print(f"{Q:>6d} {r['peak']:>10.1f} {r['par']:>8.1f} {r['pmr']:>8.1f} "
              f"{r['timing_error']:>+10d} {r['preamble_len']:>8d} "
              f"{r['overhead_pct']:>10.2f}")
    plot_q_comparison(None)
    plot_q_comparison("cir1")
    report.banner("ALL MINN RTL SIMULATIONS COMPLETE")


if __name__ == "__main__":
    main()
