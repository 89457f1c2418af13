"""Released-checkpoint parity harness selftest (VERDICT r2 item 4): builds a
synthetic Lightning checkpoint in the REAL released key layout
(se_model.bsrnn.bsrnn.* / dnn.* + torch_ema "ema" record), round-trips it
through scripts/parity_vs_released.py's load/convert/enhance path, and
verifies against the independent torch oracle.  With the actual released
weights present, the same script produces the parity report directly."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent


def test_parity_harness_selftest():
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "parity_vs_released.py"),
         "--selftest"],
        capture_output=True, text=True, cwd=str(REPO), timeout=900,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "SELFTEST PASS" in r.stdout
