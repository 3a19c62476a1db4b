"""Quick-gate claims check: committed doc numbers vs driver artifacts.

Round-5 VERDICT item 8: every headline number quoted in README/PARITY/
design.md is registered in tools/check_claims.py with the artifact field
it must agree with; this test fails the gate on any contradiction, so the
docs can't silently drift from the measured BENCH/SCALING artifacts again.
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_doc_claims_match_artifacts():
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "check_claims.py")],
        capture_output=True, text=True, timeout=60,
    )
    assert proc.returncode == 0, (
        f"claims ledger found contradictions:\n{proc.stdout}{proc.stderr}")
    # the ledger itself must have found its claims (a regex that no longer
    # matches is reported as a contradiction, but guard the degenerate
    # no-artifact path too)
    assert "claims checked" in proc.stdout
