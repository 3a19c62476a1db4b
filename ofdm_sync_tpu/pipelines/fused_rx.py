"""End-to-end PRODUCTION receive chain on the fused TPU kernel.

The reference-parity pipelines mirror the reference scripts' math and
prints; this demo drives the deployment path instead: the fully-fused
Pallas [A][A] detector (one HBM read, event table out, CFO captured at the
peak in-kernel, reference sync_aa.py:421-571 + docs/aa_preamble_sync_design
.md sections 7-9), then the standard receive stages on the recovered frame:
CFO correction, pilot LS channel estimate, data equalization, EVM
(the stage shape of reference sc.py:279-309, on the 10 MHz AA system).

Run: ``python -m ofdm_sync_tpu fused_rx [--snr 10] [--channel cir1]``.
On TPU hardware the detector is the Mosaic kernel; elsewhere the same
kernel runs in Pallas interpret mode.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ofdm_sync_tpu.params import AADetectorParams, SYS_AA_10M
from ofdm_sync_tpu.models.detectors import AADetector
from ofdm_sync_tpu.ops.channel import (
    apply_cfo,
    apply_channel_multi_antenna,
    compute_clipping_stats,
    quantize_adc,
)
from ofdm_sync_tpu.ops.estimate import (
    align_complex_gain,
    equalize,
    evm_rms_db,
    ls_channel_estimate,
)
from ofdm_sync_tpu.ops.waveforms import (
    assemble_frame,
    build_aa_preamble,
    build_aa_qpsk_symbol,
    ofdm_fft_used,
)
from ofdm_sync_tpu.utils import report

SYS = SYS_AA_10M

SNR_DB = 10.0
CFO_HZ = 500.0
PREAMBLE_LEN = 1024
FULL_SCALE_RATIO = 2.0
SEED = 42


@dataclass
class FusedRxResult:
    detected: bool
    timing_error: int
    cfo_error_hz: float
    evm_pct: float
    evm_db: float


def run_fused_rx(
    snr_db: float = SNR_DB,
    channel_name: str | None = None,
    cfo_hz: float = CFO_HZ,
    preamble_length: int = PREAMBLE_LEN,
    full_scale_ratio: float = FULL_SCALE_RATIO,
    seed: int = SEED,
) -> FusedRxResult:
    """Synthesize one AA frame, receive it through the fused kernel, and
    demodulate: detect -> frame timing + CFO from the event table ->
    correct -> LS EQ on the pilot -> EVM on the data symbol."""
    rng = np.random.default_rng(seed)
    fs = SYS.sample_rate_hz
    # frame synthesis + demod math are tiny and complex-valued; run them on
    # the CPU backend (the experimental axon TPU backend cannot transfer
    # complex buffers to host) -- only detection runs on the accelerator
    cpu = jax.devices("cpu")[0]

    # --- transmit: [guard | preamble | pilot | data | guard] --------------
    preamble, _, papr_db = build_aa_preamble(preamble_length, SYS)
    pilot_symbol, pilot_used = build_aa_qpsk_symbol(rng, SYS)
    data_symbol, data_used = build_aa_qpsk_symbol(rng, SYS)
    tx = assemble_frame(
        preamble, pilot_symbol, data_symbol,
        pre_pad=SYS.tx_pre_pad, post_pad=500,
    )
    true_start = SYS.tx_pre_pad

    # --- channel + CFO + 12-bit ADC (reference sync_aa.py:712-735) --------
    with jax.default_device(cpu):
        rx, _cir, channel_peak_offset = apply_channel_multi_antenna(
            tx, snr_db, rng, channel_name, num_rx_antennas=2
        )
        true_start += channel_peak_offset
        rx = np.asarray(
            apply_cfo(jnp.asarray(rx, jnp.complex64), cfo_hz, fs)
        )
        full_scale = float(
            np.sqrt(np.mean(np.abs(rx) ** 2)) * full_scale_ratio
        )
        clip = compute_clipping_stats(rx.flatten(), full_scale)
        rx_q = np.asarray(
            quantize_adc(jnp.asarray(rx, jnp.complex64), full_scale)
        )

    # --- detect: fused Pallas kernel, events + CFO straight out -----------
    det = AADetector(SYS, AADetectorParams(preamble_len=preamble_length))
    result = det.detect_fused(rx_q)
    best = AADetector.best(result)

    channel_str = channel_name if channel_name else "awgn"
    report.banner(
        f"FUSED-KERNEL RECEIVE CHAIN - [A][A] {preamble_length}, "
        f"{channel_str.upper()}, SNR {snr_db:+.0f} dB"
    )
    print(f"Stream: {rx_q.shape[1]} samples x {rx_q.shape[0]} antennas, "
          f"12-bit ADC (clipping {clip['total_clip_pct']:.2f}%), "
          f"preamble PAPR {papr_db:.2f} dB")
    if best is None:
        print("NO DETECTION -- receiver idle")
        return FusedRxResult(False, -1, float("nan"), float("nan"),
                             float("nan"))

    timing_err = best.detected_start - true_start
    cfo_err = best.cfo_hz - cfo_hz
    print("\nDetection (from the in-kernel event table):")
    print(f"  Frame start: {best.detected_start} "
          f"(true {true_start}, error {timing_err:+d} samples)")
    print(f"  CFO at peak: {best.cfo_hz:.2f} Hz "
          f"(applied {cfo_hz:.1f}, error {cfo_err:+.2f} Hz)")
    print(f"  Gate [{best.gate_start}, {best.gate_end}], peak metric "
          f"M={best.metric_at_peak:.3f}, events={len(result.events)}")
    if abs(timing_err) > SYS.cp_len:
        # the reference design doc's multipath group-delay offset
        # (+77..+94 samples, docs/aa_preamble_sync_design.md section 13)
        # exceeds this system's 72-sample CP: ISI will degrade the EQ below
        print(f"  NOTE: timing error exceeds the {SYS.cp_len}-sample CP "
              "(multipath group delay) -- expect inter-symbol interference")

    # --- receive stages on the recovered frame (CPU: complex math) --------
    with jax.default_device(cpu):
        rx_c = np.asarray(
            apply_cfo(jnp.asarray(rx_q, jnp.complex64), -best.cfo_hz, fs)
        )
        combined = rx_c.mean(axis=0)
        pilot_n_start = best.detected_start + preamble_length + SYS.cp_len
        data_n_start = pilot_n_start + SYS.n_fft + SYS.cp_len
        pilot_bins = np.asarray(ofdm_fft_used(
            jnp.asarray(combined[pilot_n_start:pilot_n_start + SYS.n_fft]),
            SYS,
        ))
        data_bins = np.asarray(ofdm_fft_used(
            jnp.asarray(combined[data_n_start:data_n_start + SYS.n_fft]),
            SYS,
        ))
        h_est = np.asarray(ls_channel_estimate(pilot_bins, pilot_used))
        eq = np.asarray(equalize(data_bins, jnp.asarray(h_est)))
        eq_aligned, gain = align_complex_gain(jnp.asarray(eq), data_used)
        gain = complex(np.asarray(jnp.real(gain)) + 1j * np.asarray(jnp.imag(gain)))
        evm_rms, evm_db = evm_rms_db(eq_aligned, jnp.asarray(data_used))
        evm_pct, evm_db = 100.0 * float(evm_rms), float(evm_db)

    print("\nEqualization (pilot LS -> data):")
    print(f"  Complex gain after EQ: {abs(gain):.3f}, "
          f"{np.angle(gain):+.3f} rad")
    print(f"  Data EVM: {evm_pct:.2f}%  ({evm_db:.2f} dB)")
    print(report.BANNER)
    return FusedRxResult(True, int(timing_err), float(cfo_err),
                         evm_pct, evm_db)


def main(argv: list[str] | None = None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--snr", type=float, default=SNR_DB)
    ap.add_argument("--channel", default=None,
                    help="cir1 / cir2 / omit for AWGN")
    ap.add_argument("--cfo", type=float, default=CFO_HZ)
    ap.add_argument("--preamble-len", type=int, default=PREAMBLE_LEN)
    args = ap.parse_args(argv)
    run_fused_rx(
        snr_db=args.snr,
        channel_name=args.channel,
        cfo_hz=args.cfo,
        preamble_length=args.preamble_len,
    )


if __name__ == "__main__":
    main()
