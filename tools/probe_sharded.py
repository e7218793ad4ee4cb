"""Sharded-path perf on ONE real chip (VERDICT task 9): run
``parallel.pipeline.ftle_sharded`` on a 1-device ('y',) mesh with the
pallas kernel — the exact program a pod slice would run per chip — and
record its overhead vs the fused single-chip ``ftle_pipeline``.

Catches shard_map-induced Mosaic regressions (layout, halo exchange glue)
before any pod run.  SURVEY.md §2 parallelism plan.

Run: timeout 3000 python tools/probe_sharded.py
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
from lagrangiancoherence_tpu.models.pipeline import ftle_pipeline
from lagrangiancoherence_tpu.parallel.mesh import parcel_mesh
from lagrangiancoherence_tpu.parallel.pipeline import ftle_sharded
from probe_engine import flagship_winds


def main():
    print("devices:", jax.devices(), flush=True)
    grid = global_quarter_degree_grid()
    u, v = flagship_winds(grid)
    mesh = parcel_mesh(1)

    ref_fn = jax.jit(lambda u, v: ftle_pipeline(
        u, v, -6.0 * 3600.0, grid, settls_order=4, interp_order=3,
        kernel="pallas", return_overflow=True))
    sh_fn = jax.jit(lambda u, v: ftle_sharded(
        u, v, -6.0 * 3600.0, grid, mesh, settls_order=4, interp_order=3,
        kernel="pallas", return_overflow=True))

    res = {}
    for name, fn in (("fused", ref_fn), ("sharded-1dev", sh_fn)):
        t0 = time.perf_counter()
        out, fl = fn(u, v)
        np.asarray(out)
        print(f"{name:14} compile+first {time.perf_counter()-t0:6.1f} s",
              flush=True)
        t0 = time.perf_counter()
        for _ in range(3):
            out, fl = fn(u, v)
        out_h = np.asarray(out)
        dt = (time.perf_counter() - t0) / 3
        print(f"{name:14} {dt*1e3:8.1f} ms/field ({1.0/dt:.3f} fields/s) "
              f"flag={int(fl):#x}", flush=True)
        res[name] = (out_h, dt)
    # compare interior rows only: pole-home rows carry reference-quirk
    # garbage (conv_x ~ 1e10 at |lat|=90 flings their parcels to O(2^27)
    # deg — see pallas_interp_multi's pole-row docstring), and the fused
    # (band-sorted, pole-hoisted) vs sharded (group-sorted, in-gather
    # pole path) programs differ at the ulp level, which 8-day chaos
    # amplifies — garbage rows dominate a whole-field max.  FTLE agreement is asserted interior-only, like
    # bench.py's finiteness check.
    a, b = res["fused"][0], res["sharded-1dev"][0]
    d = np.nanmax(np.abs(a[2:-2] - b[2:-2]))
    # raw sigma is O(1e3+) where 8-day chaos amplifies the programs'
    # ulp-level split — the meaningful agreement metric is the one the
    # f32 accuracy contract uses: p99 |log-FTLE| difference (BASELINE.md)
    la = np.log(np.maximum(a[2:-2], 1e-30)) / 2
    lb = np.log(np.maximum(b[2:-2], 1e-30)) / 2
    p99 = np.nanpercentile(np.abs(la - lb), 99)
    ovh = res["sharded-1dev"][1] / res["fused"][1] - 1.0
    print(f"interior rows: p99|dlogFTLE| = {p99:.2e} "
          f"(max raw |d| {d:.3e}); "
          f"shard_map overhead {100 * ovh:+.1f}%", flush=True)


if __name__ == "__main__":
    main()
