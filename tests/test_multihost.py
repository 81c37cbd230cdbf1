"""True multi-process validation: tools/multihost_smoke.py forms a real
2-process jax.distributed cluster (CPU, 4 virtual devices each), runs the
per-host sharded ingest + fit + cross-process readback, and compares against
a single-process 8-device run. See the script for details."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_multihost_smoke():
    env = {**os.environ, "MULTIHOST_SMOKE_PORT": "12461"}
    # Fresh processes: the script must control backend init itself.
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_smoke.py")],
        env=env, capture_output=True, text=True, timeout=1100)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "MULTIHOST SMOKE OK" in out.stdout
