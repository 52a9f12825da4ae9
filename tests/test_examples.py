"""The examples/ scripts must actually run (docs integrity): each executes
in a clean CPU subprocess with the virtual 8-device mesh."""

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_EXAMPLES = sorted(
    f for f in os.listdir(os.path.join(_REPO, "examples"))
    if f.endswith(".py"))


@pytest.mark.slow
@pytest.mark.parametrize("script", _EXAMPLES)
def test_example_runs(script):
    env = {k: v for k, v in os.environ.items()}
    env["PYTHONPATH"] = _REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "examples", script)],
        env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, f"{script}\n{out.stdout}\n{out.stderr}"
