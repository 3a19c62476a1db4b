"""Golden test-vector replay.

The reference ships three documented golden vectors
(reference docs/aa_preamble_sync_design.md section 12, files
docs/preamble_test_vector.csv, docs/detector_test_vector.csv,
docs/detector_cfo_test_vector.csv), converted to
``data/golden_vectors.npz`` by tools/convert_reference_data.py:

  * 1024 [A][A] preamble samples as float + int12 pairs;
  * per-sample detector traces (M, P, R / angle) for samples 1000-1599 of the
    stimulus [500 zeros | preamble | zeros...], clean and with 500 Hz CFO.

These are the "bit-exact-within-tolerance" conformance targets; the reference
itself never replays them -- this framework does.
"""

from __future__ import annotations

from pathlib import Path
from typing import NamedTuple

import numpy as np

_DATA = Path(__file__).resolve().parent.parent / "data" / "golden_vectors.npz"

#: AA-system constants the vectors were generated under
#: (reference docs/aa_preamble_sync_design.md section 2).
VECTOR_FS_HZ = 15_360_000.0
VECTOR_L = 512
VECTOR_PRE_PAD = 500
VECTOR_CFO_HZ = 500.0


class GoldenVectors(NamedTuple):
    preamble_float: np.ndarray   # complex128[1024]
    preamble_int12: np.ndarray   # complex int pairs as complex128[1024]
    clean_samples: np.ndarray    # int[600]   (1000..1599)
    clean_M: np.ndarray
    clean_P: np.ndarray          # complex
    clean_P_mag_sq: np.ndarray
    clean_R: np.ndarray
    cfo_samples: np.ndarray
    cfo_M: np.ndarray
    cfo_P: np.ndarray
    cfo_P_mag_sq: np.ndarray
    cfo_angle: np.ndarray


def load_golden_vectors() -> GoldenVectors:
    with np.load(_DATA) as z:
        pre = z["preamble"]
        det = z["detector_clean"]
        cfo = z["detector_cfo"]
    return GoldenVectors(
        preamble_float=pre[:, 1] + 1j * pre[:, 2],
        preamble_int12=pre[:, 3] + 1j * pre[:, 4],
        clean_samples=det[:, 0].astype(int),
        clean_M=det[:, 1],
        clean_P=det[:, 2] + 1j * det[:, 3],
        clean_P_mag_sq=det[:, 4],
        clean_R=det[:, 5],
        cfo_samples=cfo[:, 0].astype(int),
        cfo_M=cfo[:, 1],
        cfo_P=cfo[:, 2] + 1j * cfo[:, 3],
        cfo_P_mag_sq=cfo[:, 4],
        cfo_angle=cfo[:, 5],
    )


def golden_stimulus(cfo_hz: float = 0.0, tail_zeros: int = 700) -> np.ndarray:
    """Reconstruct the exact stimulus the vectors were traced from:
    [500 zeros | 1024-sample preamble | zeros], optional CFO tone from n=0."""
    g = load_golden_vectors()
    stim = np.concatenate(
        [np.zeros(VECTOR_PRE_PAD), g.preamble_float, np.zeros(tail_zeros)]
    ).astype(complex)
    if cfo_hz:
        n = np.arange(stim.size)
        stim = stim * np.exp(1j * 2 * np.pi * cfo_hz * n / VECTOR_FS_HZ)
    return stim
