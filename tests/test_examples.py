"""The examples/ scripts must keep running (executable documentation)."""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # heavy end-to-end lane

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("script", ["01_loopback.py",
                                    "02_sharded_receiver.py",
                                    "03_streaming_state.py",
                                    "04_pipelined_streaming.py"])
def test_example_runs(script):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=ROOT)
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", script)],
        env=env, capture_output=True, text=True, timeout=540)
    assert out.returncode == 0, out.stdout + out.stderr
