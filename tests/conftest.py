"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax initialises (SURVEY.md §4: multi-device
logic is validated with xla_force_host_platform_device_count, the piece
the reference lacks entirely).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the env globally sets axon (TPU tunnel)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "parallel_codegen_split_count" not in flags:
    # this jaxlib's XLA:CPU parallel codegen segfaults intermittently
    # when compiling BA programs deep into the suite (observed twice at
    # the same mid-suite compile; single-test runs pass) — serialize it
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags

# The suite compiles hundreds of XLA:CPU executables whose JIT code
# pages accumulate ~45k+ memory mappings; at the default
# vm.max_map_count (65530) mmap starts failing ~halfway through and the
# LLVM JIT SEGFAULTS on the next big compile (observed 3x at ~48%,
# always inside backend_compile).  Raise the limit when we can
# (privileged container); harmless no-op otherwise.
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        if int(_f.read()) < 1_000_000:
            with open("/proc/sys/vm/max_map_count", "w") as _g:
                _g.write("1000000")
except (OSError, PermissionError, ValueError):
    pass

# The jaxtyping pytest plugin imports jax BEFORE this conftest runs, which
# snapshots JAX_PLATFORMS=axon (the TPU tunnel) into jax.config.  Override
# the already-imported config so tests really run on the virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NOTE: do NOT enable the persistent compilation cache here — this
# jaxlib's XLA:CPU executable serialization segfaults intermittently
# when writing certain pose-graph/BA executables (observed crashing in
# compilation_cache.put_executable_and_time mid-suite).

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_PIC = "/root/reference/pic"


@pytest.fixture(scope="session")
def luna_gray():
    """pic/luna.jpg as grayscale uint8 — the reference's main fixture."""
    import cv2

    img = cv2.imread(os.path.join(REFERENCE_PIC, "luna.jpg"), cv2.IMREAD_GRAYSCALE)
    assert img is not None
    return img


@pytest.fixture(scope="session")
def tum_pair():
    """Two TUM-VI corridor frames (the matcher demo's fixture)."""
    import cv2
    import glob

    paths = sorted(glob.glob(os.path.join(REFERENCE_PIC, "TUM", "*", "*.png")))
    if len(paths) < 2:
        paths = sorted(
            glob.glob(os.path.join(REFERENCE_PIC, "TUM", "**", "*.png"), recursive=True)
        )
    assert len(paths) >= 2, paths
    a = cv2.imread(paths[0], cv2.IMREAD_GRAYSCALE)
    b = cv2.imread(paths[1], cv2.IMREAD_GRAYSCALE)
    return a, b


@pytest.fixture()
def rng():
    # function-scoped: a fresh fixed-seed generator per test, so scene
    # draws never depend on which tests ran before (order-flakiness)
    return np.random.default_rng(0)
