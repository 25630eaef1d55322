"""Real-chip kernel golden test (VERDICT r02 item 8).

The pytest process forces a CPU backend (conftest.py) so the suite runs
anywhere; this test runs the clustered-kernel-vs-oracle comparison ON THE
TPU in a subprocess.  Opt-in via BDPT_ON_CHIP_TESTS=1 (set in the bench
environment); skipped otherwise so CI stays hermetic.

    BDPT_ON_CHIP_TESTS=1 python -m pytest tests/test_chip.py -q
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    os.environ.get("BDPT_ON_CHIP_TESTS") != "1",
    reason="on-chip test: set BDPT_ON_CHIP_TESTS=1 (needs the TPU)")


def test_clustered_kernel_on_chip():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "chip_kernel_check.py")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3000)
    out = [l for l in p.stdout.splitlines() if l.startswith("{")]
    assert out, f"no report line:\n{p.stdout[-800:]}\n{p.stderr[-800:]}"
    report = json.loads(out[-1])
    if "skipped" in report:
        pytest.skip(report["skipped"])
    assert p.returncode == 0 and report["ok"], report
