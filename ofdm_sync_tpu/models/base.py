"""Common detection-result containers.

The reference returns either bare indices (reference sc.py:42-146) or
per-detector event dataclasses (reference minn_rtl.py:736-748,
zc_v2.py:342-358, sync_aa.py:401-418).  Here all families share one event
shape plus family-specific extras, so sweep harnesses can treat detectors
uniformly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class DetectionEvent:
    peak_index: int
    peak_value: float
    gate_start: int
    gate_end: int
    closed: bool
    detected_start: int = 0
    cfo_hz: float = 0.0
    metric_at_peak: float = 0.0


@dataclass
class DetectionResult:
    events: list[DetectionEvent] = field(default_factory=list)
    gate_mask: np.ndarray | None = None

    @property
    def detected(self) -> bool:
        return len(self.events) > 0

    def best_by(self, key) -> DetectionEvent | None:
        return max(self.events, key=key) if self.events else None


def events_from_table(table, n: int, *, gate_end_mode: str = "close") -> list[dict]:
    """Convert a fixed-capacity `ops.detect.GateEvents` table into host dicts.

    gate_end_mode:
      'close'      -> gate_end = closing sample (reference zc_v2.py:426,
                      sync_aa.py:547); unclosed gates end at n (zc_v2) /
                      n (sync_aa).
      'close_excl' -> gate_end = close + 1 (the [start, end) segments of
                      reference minn_rtl.py:800-801).
    """
    out = []
    valid = np.asarray(table.valid)
    for slot in np.flatnonzero(valid):
        closed = bool(table.closed[slot])
        close = int(table.gate_close[slot])
        if not closed:
            gate_end = n
        elif gate_end_mode == "close_excl":
            gate_end = close + 1
        else:
            gate_end = close
        out.append(
            dict(
                peak_index=int(table.peak_idx[slot]),
                peak_value=float(table.peak_value[slot]),
                gate_start=int(table.gate_start[slot]),
                gate_end=gate_end,
                closed=closed,
            )
        )
    return out
