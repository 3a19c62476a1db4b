#!/usr/bin/env python
"""Record the reference sync_aa 135-config grid as a JSON fixture.

Runs `/root/reference/sync_aa.py`'s `run_grid_test` with exactly the grid its
`main()` uses (reference sync_aa.py:1075-1108: SNR {-5,0,5,10,15} x channels
{awgn,cir1,cir2} x FS {0.5,1.0,2.0} x preamble {1024,512,256}, CFO 500 Hz,
seed 42) and dumps every TestResult field per cell to
`tests/fixtures/reference_aa_grid.json`.

The fixture is the oracle for `tests/test_grid_parity.py`, which asserts that
`ofdm_sync_tpu.pipelines.aa.run_grid_test` reproduces every cell.

Usage (takes tens of minutes -- the reference detector is a per-sample
Python loop):

    python tools/record_reference_grid.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
from pathlib import Path

import matplotlib

matplotlib.use("Agg")

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")

# Reference plotting paths are cwd-relative; keep any stray artifact out of
# both the read-only reference tree and the repo.
scratch = Path(os.environ.get("TMPDIR", "/tmp")) / "refgrid_scratch"
scratch.mkdir(parents=True, exist_ok=True)
os.chdir(scratch)

sys.path.insert(0, str(REFERENCE))
import sync_aa  # noqa: E402  (reference module, read-only)


def main() -> None:
    results = sync_aa.run_grid_test(
        snr_values=[-5, 0, 5, 10, 15],
        channels=[None, "cir1", "cir2"],
        full_scale_ratios=[0.5, 1.0, 2.0],
        preamble_lengths=[1024, 512, 256],
        cfo_hz=500.0,
        plot_samples=False,
    )
    rows = [dataclasses.asdict(r) for r in results]
    out = REPO / "tests" / "fixtures" / "reference_aa_grid.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        "source": "reference sync_aa.py run_grid_test (main() grid, seed 42)",
        "grid": {
            "snr_values": [-5, 0, 5, 10, 15],
            "channels": ["awgn", "cir1", "cir2"],
            "full_scale_ratios": [0.5, 1.0, 2.0],
            "preamble_lengths": [1024, 512, 256],
            "cfo_hz": 500.0,
            "seed": 42,
        },
        "results": rows,
    }
    out.write_text(json.dumps(payload, indent=1))
    print(f"wrote {len(rows)} cells to {out}")


if __name__ == "__main__":
    main()
