"""Probe: native ``Precision.HIGH`` (bf16x3) for the pallas contraction.

ROUND2_NOTES records that a *manual* 3-pass hi/lo split compounded to
~0.06 p99 log-FTLE over a full integration — insufficient — which froze
the kernel at HIGHEST (6 MXU passes, ~2.9 us/tile).  Native
``Precision.HIGH`` keeps the cross terms the manual split dropped, so it
may sit in a different accuracy class at half the MXU cost.  This probe
measures, on the real flagship trajectory:

* full-scan time with _HIGH = HIGHEST vs HIGH vs DEFAULT;
* final-position max|Delta| vs the XLA (exact f32) kernel for each.

Run: python tools/probe_high.py
"""
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
from lagrangiancoherence_tpu.models import settls
from lagrangiancoherence_tpu.ops import pallas_interp


def flagship_winds(grid, nt=33):
    LON, LAT = np.meshgrid(np.deg2rad(grid.lons), np.deg2rad(grid.lats))
    base_u = 25.0 * np.cos(LAT) + 3.0 * np.cos(3 * LON) * np.sin(2 * LAT)
    base_v = 3.0 * np.sin(3 * LON) * np.cos(2 * LAT)
    t = np.arange(nt)[:, None, None]
    u = (base_u[None] * (1.0 + 0.05 * np.sin(2 * np.pi * t / nt))
         ).astype(np.float32)
    v = (base_v[None] * (1.0 + 0.05 * np.cos(2 * np.pi * t / nt))
         ).astype(np.float32)
    return jnp.asarray(u), jnp.asarray(v)


def run(kernel, grid, u, v, reps=3):
    fn = settls.parcel_propagation_core.__wrapped__  # skip jit cache keying
    jfn = jax.jit(lambda u, v: fn(u, v, -6.0 * 3600.0, grid,
                                  settls_order=4, interp_order=3,
                                  kernel=kernel))
    px, py = jfn(u, v)
    px.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        px, py = jfn(u, v)
    px.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    return np.asarray(px), np.asarray(py), dt


def main():
    print("devices:", jax.devices(), flush=True)
    grid = global_quarter_degree_grid()
    u, v = flagship_winds(grid)

    # reference = the pallas HIGHEST path itself (bench.py separately
    # records HIGHEST-vs-XLA ~1.3e-5, so HIGH/DEFAULT deltas measured
    # against HIGHEST transfer directly; running the XLA gather scan on
    # TPU would take ~15 min at ~10M elem/s)
    pallas_interp._HIGH = jax.lax.Precision.HIGHEST
    pxr, pyr, dtr = run("pallas", grid, u, v, reps=1)
    print(f"pallas HIGHEST reference scan: {dtr:.3f} s", flush=True)
    # interior rows only (pole rows use the order-1 path in both kernels)
    sl = slice(16, -16)

    for name, prec in [("HIGHEST", jax.lax.Precision.HIGHEST),
                       ("HIGH", jax.lax.Precision.HIGH),
                       ("DEFAULT", jax.lax.Precision.DEFAULT)]:
        pallas_interp._HIGH = prec
        px, py, dt = run("pallas", grid, u, v)
        dx = np.max(np.abs(px[sl] - pxr[sl]))
        dy = np.max(np.abs(py[sl] - pyr[sl]))
        p99x = np.percentile(np.abs(px[sl] - pxr[sl]), 99)
        print(f"{name:8s} scan {dt:.3f} s   max|dx|={dx:.3e} "
              f"max|dy|={dy:.3e} p99|dx|={p99x:.3e}", flush=True)
    pallas_interp._HIGH = jax.lax.Precision.HIGHEST


if __name__ == "__main__":
    main()
