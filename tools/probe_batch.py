"""Throughput mode A/B (VERDICT task 5): batch B flagship FTLE fields in
ONE vmapped program — amortises routing, launch and per-slot fixed costs
across fields in the animation workload
(/root/reference/LCS/LCS.py:236-268: one FTLE field per sliding window).

Reports ms/field and fields/s at B in {1, 2, 4}; mind HBM — the padded
5-slab coefficient stack is ~3.3 GB/field-scan (every engine; the lean
layout's arbitrary-offset DMAs turned out not to compile on device), so
B=4 approaches the v5e's 16 GB.

Run: timeout 3000 python tools/probe_batch.py [--engine=dma-all]
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
from probe_engine import flagship_winds


def main():
    # default to the device-measured winner recorded by probe_engine.py
    # (the contact queue runs that first); --engine= overrides
    engine = "blockspec"
    wy = 32
    cfg_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_config.json")
    if os.path.exists(cfg_path):
        try:
            import json
            cfg = json.load(open(cfg_path))
            engine = cfg.get("engine", engine)
            wy = int(cfg.get("wy", wy))
            if "half_tile" in cfg:
                os.environ.setdefault(
                    "LCS_HALF_TILE", "1" if cfg["half_tile"] else "0")
            if "pole_ladder" in cfg:
                os.environ.setdefault("LCS_POLE_LADDER",
                                      str(cfg["pole_ladder"]))
        except Exception:
            pass
    for a in sys.argv:
        if a.startswith("--engine="):
            engine = a.split("=", 1)[1]
    print("devices:", jax.devices(), "engine:", engine, "wy:", wy,
          flush=True)
    if "--sweep" in sys.argv:
        # Root-cause mode for the flagship B>=2 HTTP 500 (remote compile
        # helper subprocess exit 1, no diagnostic): if B=2 compiles at
        # reduced grid scales but fails at 0.25 deg, the failure is a
        # program/working-set SIZE limit of the axon compile toolchain,
        # not a vmap-of-pallas feature gap.
        from lagrangiancoherence_tpu.grid import Grid
        for ny, nx, tag in ((361, 720, "0.5deg"), (721, 1440, "0.25deg")):
            lats = np.linspace(-90.0, 90.0, ny)
            lons = np.linspace(-180.0, 180.0 - 360.0 / nx, nx)
            g = Grid(lats=lats, lons=lons, cyclic_x=True)
            u_s, v_s = flagship_winds(g)
            for B in (1, 2):
                ub = jnp.broadcast_to(u_s, (B, *u_s.shape)) \
                    * (1.0 + 0.01 * jnp.arange(B)[:, None, None, None])
                vb = jnp.broadcast_to(v_s, (B, *v_s.shape)) \
                    * (1.0 + 0.01 * jnp.arange(B)[:, None, None, None])
                fn = jax.jit(jax.vmap(lambda uu, vv: ftle_pipeline(
                    uu, vv, -6.0 * 3600.0, g, settls_order=4,
                    interp_order=3, kernel="pallas", pallas_engine=engine,
                    pallas_wy=wy, return_overflow=True)))
                try:
                    t0 = time.perf_counter()
                    out, fl = fn(ub, vb)
                    np.asarray(out)
                    print(f"{tag} B={B}: OK compile+first "
                          f"{time.perf_counter()-t0:6.1f} s "
                          f"flags={np.asarray(fl).tolist()}", flush=True)
                except Exception as e:
                    print(f"{tag} B={B}: FAILED {type(e).__name__}: "
                          f"{str(e)[:200]}", flush=True)
        return
    grid = global_quarter_degree_grid()
    u, v = flagship_winds(grid)
    for B in (1, 2, 4):
        ub = jnp.broadcast_to(u, (B, *u.shape)) \
            * (1.0 + 0.01 * jnp.arange(B)[:, None, None, None])
        vb = jnp.broadcast_to(v, (B, *v.shape)) \
            * (1.0 + 0.01 * jnp.arange(B)[:, None, None, None])
        fn = jax.jit(jax.vmap(lambda uu, vv: ftle_pipeline(
            uu, vv, -6.0 * 3600.0, grid, settls_order=4, interp_order=3,
            kernel="pallas", pallas_engine=engine, pallas_wy=wy,
            return_overflow=True)))
        try:
            t0 = time.perf_counter()
            out, fl = fn(ub, vb)
            np.asarray(out)
            print(f"B={B}: compile+first {time.perf_counter()-t0:6.1f} s",
                  flush=True)
            t0 = time.perf_counter()
            reps = 2
            for _ in range(reps):
                out, fl = fn(ub, vb)
            np.asarray(out)
            dt = (time.perf_counter() - t0) / reps
        except Exception as e:  # HBM OOM at high B is expected data
            print(f"B={B}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            continue
        print(f"B={B}: {dt*1e3/B:8.1f} ms/field ({B/dt:.3f} fields/s) "
              f"flags={np.asarray(fl).tolist()}", flush=True)


if __name__ == "__main__":
    main()
