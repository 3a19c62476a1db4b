"""Full-grid parity vs the reference's flagship statistical artifact.

`tests/fixtures/reference_aa_grid.json` is a one-time recording of the
reference `sync_aa.py run_grid_test` over its `main()` grid -- 135 cells:
SNR {-5,0,5,10,15} x channels {awgn,cir1,cir2} x FS {0.5,1.0,2.0} x preamble
{1024,512,256}, CFO 500 Hz, seed 42 (reference sync_aa.py:1075-1108; recorded
by tools/record_reference_grid.py).  Every cell's detection outcome, timing
error, CFO estimate, event count, clipping stats, and metric peak must be
reproduced by `pipelines.aa.run_single_test`.
"""

import json
from pathlib import Path

import pytest

FIXTURE = Path(__file__).parent / "fixtures" / "reference_aa_grid.json"


def _cells():
    rows = json.loads(FIXTURE.read_text())["results"]
    ids = [
        f"L{r['preamble_length']//2}-{r['channel']}-snr{r['snr_db']:+.0f}"
        f"-fs{r['full_scale_ratio']}"
        for r in rows
    ]
    return rows, ids


_ROWS, _IDS = _cells()

# Quick tier: a deterministic stratified 15-cell sample -- every
# (channel, SNR) pair exactly once, rotating through all three full-scale
# ratios and all three preamble lengths so each swept axis is touched.
# The full 135-cell replay runs in the slow/parity tier.
_QUICK_IDX = []
_seen = {}
_fs_cycle = {}
for _i, _r in enumerate(_ROWS):
    _key = (_r["channel"], _r["snr_db"])
    _want = _seen.setdefault(
        _key,
        (
            [0.5, 1.0, 2.0][len(_seen) % 3],
            [1024, 512, 256][(len(_seen) // 3) % 3],
        ),
    )
    if (_r["full_scale_ratio"], _r["preamble_length"]) == _want and _key not in _fs_cycle:
        _fs_cycle[_key] = _i
_QUICK_IDX = sorted(_fs_cycle.values())
assert len(_QUICK_IDX) == 15, _QUICK_IDX


@pytest.fixture(scope="module")
def aa_pipeline():
    from ofdm_sync_tpu.pipelines import aa

    return aa


def _check_cell(aa_pipeline, ref):
    got = aa_pipeline.run_single_test(
        snr_db=ref["snr_db"],
        channel_name=None if ref["channel"] == "awgn" else ref["channel"],
        full_scale_ratio=ref["full_scale_ratio"],
        preamble_length=ref["preamble_length"],
        cfo_hz=ref["cfo_applied_hz"],
        seed=42,
        plot=False,
    )
    assert bool(got.detected) == bool(ref["detected"])
    assert int(got.num_events) == int(ref["num_events"])
    if ref["detected"]:
        assert int(got.timing_error) == int(ref["timing_error"])
        assert abs(got.cfo_estimated_hz - ref["cfo_estimated_hz"]) < 0.5
    assert abs(got.clipping_pct - ref["clipping_pct"]) < 0.05
    assert abs(got.effective_bits - ref["effective_bits"]) < 0.02
    assert abs(got.metric_peak - ref["metric_peak"]) < 2e-3


@pytest.mark.parametrize(
    "ref", [_ROWS[i] for i in _QUICK_IDX], ids=[_IDS[i] for i in _QUICK_IDX]
)
def test_grid_cell_parity_quick(aa_pipeline, ref):
    _check_cell(aa_pipeline, ref)


@pytest.mark.slow
@pytest.mark.parity
@pytest.mark.parametrize(
    "ref",
    [r for i, r in enumerate(_ROWS) if i not in set(_QUICK_IDX)],
    ids=[s for i, s in enumerate(_IDS) if i not in set(_QUICK_IDX)],
)
def test_grid_cell_parity_full(aa_pipeline, ref):
    _check_cell(aa_pipeline, ref)
