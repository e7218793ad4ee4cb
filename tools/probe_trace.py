"""Capture a jax.profiler trace of one flagship FTLE field and print the
op-level self-time breakdown (where the 1.86 s/field actually goes)."""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from lagrangiancoherence_tpu.grid import global_quarter_degree_grid
from lagrangiancoherence_tpu.models.pipeline import ftle_pipeline

TRACE_DIR = "/tmp/lcs_trace"


def main():
    grid = global_quarter_degree_grid()
    ny, nx = grid.shape
    nt = 33
    LON, LAT = np.meshgrid(np.deg2rad(grid.lons), np.deg2rad(grid.lats))
    base_u = 25.0 * np.cos(LAT) + 3.0 * np.cos(3 * LON) * np.sin(2 * LAT)
    base_v = 3.0 * np.sin(3 * LON) * np.cos(2 * LAT)
    t = np.arange(nt)[:, None, None]
    u = jnp.asarray((base_u[None] * (1.0 + 0.05 * np.sin(2 * np.pi * t / nt))
                     ).astype(np.float32))
    v = jnp.asarray((base_v[None] * (1.0 + 0.05 * np.cos(2 * np.pi * t / nt))
                     ).astype(np.float32))

    def run():
        out, ov = ftle_pipeline(u, v, -6.0 * 3600.0, grid, settls_order=4,
                                interp_order=3, kernel="pallas",
                                return_overflow=True)
        return out

    np.asarray(run())  # warm
    t0 = time.perf_counter()
    np.asarray(run())
    print("field time:", time.perf_counter() - t0, flush=True)

    with jax.profiler.trace(TRACE_DIR):
        np.asarray(run())

    # ---- parse the xplane ----
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    xs = glob.glob(TRACE_DIR + "/**/*.xplane.pb", recursive=True)
    print("xplanes:", xs, flush=True)
    data, _ = rtd.xspace_to_tool_data(xs, "framework_op_stats", {})
    import gzip, io, csv
    # tool data may be csv text
    open("/tmp/opstats.out", "wb").write(
        data if isinstance(data, bytes) else data.encode())
    print("wrote /tmp/opstats.out", len(data))


if __name__ == "__main__":
    main()
