"""Examples run end-to-end (the reference runs its examples in CI,
.github/workflows/ci.yml:74-81). Two fast ones as smoke tests."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

EXAMPLES = Path(__file__).resolve().parent.parent / "examples"


def _run(name, timeout=600):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, str(EXAMPLES / name), "--cpu"],
        capture_output=True, text=True, timeout=timeout, env=env,
    )


@pytest.mark.parametrize("name", ["security_levels.py", "gates_with_strategies.py"])
def test_example_runs(name):
    res = _run(name)
    assert res.returncode == 0, res.stderr[-2000:]
