"""Device-gated TPU tests: Mosaic-compiled kernel parity on real hardware.

These tests exist because interpret-mode parity (tests/test_pallas_interp.py)
cannot catch Mosaic *codegen* regressions — e.g. the silent ~1e-2 wrap-seam
corruption class documented in docs/source/kernel.rst (fold/period-boundary
tap floors), which only manifested in compiled TPU programs.

Run them ON the TPU host (they skip cleanly anywhere else):

    timeout 1800 python -m pytest tests_tpu/ -q

They must run in their OWN pytest session — tests/conftest.py pins the
process to the virtual CPU mesh, so running ``pytest tests tests_tpu``
together makes these skip (by design).

Hygiene (CLAUDE.md): one TPU process at a time; a wedged tunnel takes
5-20 min to recover.  TPU availability is probed in a SUBPROCESS under a
timeout because in-process backend init blocks indefinitely while the
axon tunnel is down.
"""
import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Backend init through a cold axon tunnel takes ~110-180 s; the 02:18
# contact-queue run skipped all device tests because the probe timed out
# at 120 s while the tunnel was still warming.
_PROBE_TIMEOUT = float(os.environ.get("TPU_PROBE_TIMEOUT", "360"))

import jax  # noqa: E402

# share the repo-root persistent compile cache with bench.py so the
# flagship kernels compile once per code state
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

_PROBE_SRC = """
import numpy as np, jax, jax.numpy as jnp
d = jax.devices()[0]
x = np.asarray(jnp.ones((8, 128)) * 2.0)
print("PLATFORM:" + d.platform)
"""


def tpu_available() -> bool:
    try:
        out = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC], capture_output=True,
            text=True, timeout=_PROBE_TIMEOUT)
    except subprocess.TimeoutExpired:
        return False
    if out.returncode != 0:
        return False
    for line in out.stdout.splitlines():
        if line.startswith("PLATFORM:"):
            return line.split(":", 1)[1] not in ("cpu",)
    return False


def pytest_collection_modifyitems(config, items):
    if not items:
        return
    if tpu_available():
        return
    skip = pytest.mark.skip(reason="no live TPU backend (probe failed)")
    for item in items:
        item.add_marker(skip)
