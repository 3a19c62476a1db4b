"""Statistical detection-quality parity with the reference design doc.

Reference claims (docs/aa_preamble_sync_design.md sections 12-13, summarized
in BASELINE.md): the [A][A] detector at threshold 0.15 detects 100 % of
frames at SNR >= 0 dB (AWGN and measured channels), 0 % at -5 dB; AWGN
timing accuracy +-1 sample; multipath timing offset is positive (channel
group delay) and absorbed by the CP; CFO error well inside the +-15 kHz
capture range.
"""

import numpy as np
import pytest

from ofdm_sync_tpu.pipelines.aa import run_grid_test_batched

SEEDS = (42, 43, 44, 45, 46)


def _rates(channel, snr_values, seeds=SEEDS, fs=2.0):
    det = np.zeros((len(seeds), len(snr_values)), bool)
    terr = np.zeros((len(seeds), len(snr_values)))
    cerr = np.zeros((len(seeds), len(snr_values)))
    for i, seed in enumerate(seeds):
        out = run_grid_test_batched(
            preamble_length=1024,
            channel_name=channel,
            snr_values=snr_values,
            full_scale_ratios=(fs,),
            seed=seed,
        )
        det[i] = out["detected"][:, 0]
        terr[i] = out["timing_error"][:, 0]
        cerr[i] = out["cfo_error"][:, 0]
    return det, terr, cerr


@pytest.mark.parity
def test_awgn_detection_rates_match_design_doc():
    det, terr, cerr = _rates(None, (-5.0, 0.0, 10.0))
    # 100 % detection at SNR >= 0 dB (design doc section 13)
    assert det[:, 1].all() and det[:, 2].all()
    # 0 % at -5 dB
    assert not det[:, 0].any()
    # AWGN timing accuracy: +-1 sample at 10 dB (the doc's headline figure);
    # at 0 dB jitter grows but stays far inside the 72-sample CP
    assert np.abs(terr[:, 2][det[:, 2]]).max() <= 1
    assert np.abs(terr[:, 1][det[:, 1]]).max() <= 16
    # CFO error: single-preamble estimation theory gives sigma ~ 95 Hz at
    # 10 dB (angle noise of the L=512-term correlation); bound at ~3 sigma,
    # far inside the +-15 kHz capture range (doc section 8)
    assert np.abs(cerr[:, 2][det[:, 2]]).max() < 300.0


@pytest.mark.parity
def test_multipath_detection_rates_match_design_doc():
    det, terr, _ = _rates("cir1", (0.0, 10.0))
    assert det.all()  # 100 % at SNR >= 0 dB on measured channel
    # channel group delay: positive timing offset, absorbed by the CP
    # (doc section 13: +77..+94 samples on the 72-sample-CP system; exact
    # value depends on the peak-offset convention, sign is the invariant)
    assert (terr[det] >= 0).all()
    assert terr[det].max() < 1024  # well inside one preamble
