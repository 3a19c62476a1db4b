"""Unified CLI: ``python -m ofdm_sync_tpu <command> [options]``.

The reference exposes its experiments as one flat script per detector, each
with a bare ``main()`` (reference sc.py:350, minn.py:635, minn_rtl.py:1467,
park.py:329, zc.py:261, zc_freq.py:272, zc_v2.py:765, combined_sc_min.py:558,
sync_aa.py:1075, ofdm_cp_fft_demo.py).  This dispatcher is their packaged
equivalent, plus framework-only commands (bench, native oracle, profiling).
"""

from __future__ import annotations

import argparse
import importlib
import sys

_PIPELINES = {
    "sc": "Schmidl-Cox end-to-end simulation (reference sc.py)",
    "minn": "standard Minn detector simulation + sweeps (reference minn.py)",
    "minn_rtl": "RTL-style adjacent-quarter Minn (reference minn_rtl.py)",
    "park": "Park detector simulation (reference park.py)",
    "zc": "Zadoff-Chu time-domain matched filter (reference zc.py)",
    "zc_freq": "Zadoff-Chu frequency-domain search (reference zc_freq.py)",
    "zc_v2": "streaming/CFAR Zadoff-Chu detector (reference zc_v2.py)",
    "combined_sc_minn": "S&C gate + Minn peak (reference combined_sc_min.py)",
    "aa": "[A][A] detector grid test (reference sync_aa.py)",
    "cp_fft_demo": "CP/FFT STO pedagogy demo (reference ofdm_cp_fft_demo.py)",
}


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="python -m ofdm_sync_tpu",
        description="TPU-native OFDM preamble-synchronization framework",
    )
    sub = parser.add_subparsers(dest="command", required=True)
    for name, help_text in _PIPELINES.items():
        sub.add_parser(name, help=help_text)
    sub.add_parser("bench", help="headline TPU benchmark (one JSON line)")
    p_cpu = sub.add_parser(
        "list", help="list detector families and system parameter sets"
    )
    del p_cpu
    args = parser.parse_args(argv)

    if args.command == "bench":
        import runpy
        from pathlib import Path

        bench = Path(__file__).resolve().parents[1] / "bench.py"
        runpy.run_path(str(bench), run_name="__main__")
        return 0
    if args.command == "list":
        from ofdm_sync_tpu.models import detectors

        for name in _PIPELINES:
            print(f"{name:18s} {_PIPELINES[name]}")
        print()
        for cls in (
            detectors.SCDetector, detectors.MinnDetector,
            detectors.MinnRTLDetector, detectors.ParkDetector,
            detectors.ZCTimeDetector, detectors.ZCFreqDetector,
            detectors.ZCStreamingDetector, detectors.CombinedSCMinnDetector,
            detectors.AADetector,
        ):
            print(f"model: {cls.__name__}")
        return 0

    mod = importlib.import_module(f"ofdm_sync_tpu.pipelines.{args.command}")
    mod.main()
    return 0


if __name__ == "__main__":
    sys.exit(main())
