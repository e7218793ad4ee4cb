"""Dump the flagship trajectory (all 33 step positions) to
/tmp/flagship_traj.npz for offline routing censuses (census_binned.py,
census_pair.py).  One device run + one ~380 MB download.

Run: timeout 1200 python -u tools/probe_traj_dump.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from lagrangiancoherence_tpu.grid import global_quarter_degree_grid
from lagrangiancoherence_tpu.models.settls import parcel_propagation_core
from probe_engine import flagship_winds


def main():
    print("devices:", jax.devices(), flush=True)
    grid = global_quarter_degree_grid()
    u, v = flagship_winds(grid)
    t0 = time.perf_counter()
    tx, ty, fl = parcel_propagation_core(
        u, v, -6.0 * 3600.0, grid, settls_order=4, interp_order=3,
        kernel="pallas", return_traj=True, return_overflow=True)
    tx = np.asarray(tx).astype(np.float32)
    ty = np.asarray(ty).astype(np.float32)
    print(f"traj in {time.perf_counter() - t0:.1f} s, flag={int(fl):#x}",
          flush=True)
    np.savez("/tmp/flagship_traj.npz", tx=tx, ty=ty)
    print("wrote /tmp/flagship_traj.npz", tx.shape, flush=True)


if __name__ == "__main__":
    main()
