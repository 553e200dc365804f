"""The shipped examples must run end-to-end and assert their own results."""

import subprocess
import sys
from pathlib import Path

import pytest

EXAMPLES = Path(__file__).resolve().parent.parent / "examples"


def run_example(name, *args):
    import os
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, str(EXAMPLES / name), *args],
                       capture_output=True, text=True, timeout=900, env=env)
    assert r.returncode == 0, f"{name} failed:\n{r.stdout}\n{r.stderr}"
    return r.stdout


def test_ex1():
    out = run_example("ex1_known_scale_registration.py")
    assert "selected 3 associations" in out


def test_ex3():
    out = run_example("ex3_plane_cloud.py")
    assert "recovered rotation" in out


@pytest.mark.slow
def test_ex4():
    out = run_example("ex4_bunny.py")
    assert "precision" in out


@pytest.mark.slow
def test_ex5():
    # small m keeps the CPU run in CI budget; the example defaults to
    # m=16,384 on real hardware
    out = run_example("ex5_large_scale.py", "2048")
    assert "facade triangle engine" in out
    assert "sharded facade engine" in out
    assert "precision" in out
