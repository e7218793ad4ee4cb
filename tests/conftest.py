"""Test configuration: run all tests on a virtual 8-device CPU mesh with
float64 enabled, so numerical-parity assertions against the scipy oracle are
exact and sharding tests exercise multi-chip code paths without TPU hardware.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers a TPU platform plugin and
# overrides JAX_PLATFORMS; pin the config explicitly so tests really run on
# the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the SETTLS scan bodies are large graphs and
# XLA:CPU compiles them slowly; caching makes re-runs fast.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
