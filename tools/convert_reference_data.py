#!/usr/bin/env python
"""Convert the reference repo's measured-data CSV assets into compact .npz
bundles under ofdm_sync_tpu/data/.

These are MEASURED DATA and GOLDEN TEST VECTORS (channel sounder captures and
documented detector traces), not code:
  * channel_models/cir{1,2}.csv  -- measured channel impulse responses
    (reference channel.py:9-12), 1100 taps x 2 RX each.
  * docs/preamble_test_vector.csv  -- [A][A] preamble samples, float + int12
    (documented in reference docs/aa_preamble_sync_design.md section 12).
  * docs/detector_test_vector.csv / detector_cfo_test_vector.csv -- golden
    per-sample detector traces (samples 1000-1599).

Usage: python tools/convert_reference_data.py [reference_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
DATA = REPO / "ofdm_sync_tpu" / "data"


def parse_cir(path: Path) -> np.ndarray:
    sys.path.insert(0, str(REPO))
    from ofdm_sync_tpu.ops.channel import parse_cir_csv

    return parse_cir_csv(path)


def parse_csv_commented(path: Path) -> tuple[list[str], np.ndarray]:
    header: list[str] = []
    rows = []
    cols: list[str] = []
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith("#"):
            header.append(line.lstrip("# "))
            continue
        if not cols:
            cols = line.split(",")
            continue
        rows.append([float(v) for v in line.split(",")])
    return header, np.asarray(rows)


def main() -> None:
    ref = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/root/reference")
    DATA.mkdir(parents=True, exist_ok=True)

    channels = {
        name: parse_cir(ref / "channel_models" / f"{name}.csv")
        for name in ("cir1", "cir2")
    }
    np.savez_compressed(DATA / "channels.npz", **channels)
    print("channels.npz:", {k: v.shape for k, v in channels.items()})

    _, pre = parse_csv_commented(ref / "docs" / "preamble_test_vector.csv")
    hdr_clean, det = parse_csv_commented(ref / "docs" / "detector_test_vector.csv")
    hdr_cfo, det_cfo = parse_csv_commented(ref / "docs" / "detector_cfo_test_vector.csv")
    np.savez_compressed(
        DATA / "golden_vectors.npz",
        preamble=pre,                # index, re_float, im_float, re_int12, im_int12
        detector_clean=det,          # sample, M, P_re, P_im, P_mag_sq, R
        detector_cfo=det_cfo,        # sample, M, P_re, P_im, P_mag_sq, angle_rad
        detector_clean_header=np.array(hdr_clean),
        detector_cfo_header=np.array(hdr_cfo),
    )
    print("golden_vectors.npz:", pre.shape, det.shape, det_cfo.shape)


if __name__ == "__main__":
    main()
