"""A/B the manual-DMA escalation engine on the real flagship scan:
pallas_engine='blockspec' vs 'dma' — scan time, pipeline fields/s, flags,
and final-position agreement.

Run: python tools/probe_engine.py
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
from lagrangiancoherence_tpu.models.settls import parcel_propagation_core
from lagrangiancoherence_tpu.models.pipeline import ftle_pipeline


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


def main():
    print("devices:", jax.devices(), flush=True)
    grid = global_quarter_degree_grid()
    u, v = flagship_winds(grid)
    res = {}
    for eng in ("blockspec", "dma", "dma-all"):
        # one engine failing device-compile (VMEM/regalloc) must not kill
        # the A/B for the others — each leg is independently useful
        try:
            fn = jax.jit(lambda u, v, eng=eng: parcel_propagation_core(
                u, v, -6.0 * 3600.0, grid, settls_order=4, interp_order=3,
                kernel="pallas", pallas_engine=eng, return_overflow=True))
            t0 = time.perf_counter()
            px, py, fl = fn(u, v)
            np.asarray(px)
            print(f"engine={eng:10} compile+first "
                  f"{time.perf_counter()-t0:6.1f} s", flush=True)
            t0 = time.perf_counter()
            for _ in range(3):
                px, py, fl = fn(u, v)
            np.asarray(px)
            dt = (time.perf_counter() - t0) / 3
            print(f"engine={eng:10} scan {dt*1e3:8.1f} ms  flag={int(fl):#x}",
                  flush=True)
            res[eng] = (np.asarray(px), np.asarray(py))
        except Exception as e:  # noqa: BLE001 — report and move on
            print(f"engine={eng:10} scan FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
    for eng in ("dma", "dma-all"):
        if eng in res and "blockspec" in res:
            dx = np.max(np.abs(res[eng][0] - res["blockspec"][0]))
            dy = np.max(np.abs(res[eng][1] - res["blockspec"][1]))
            print(f"max|{eng}-blockspec| dx={dx:.3e} dy={dy:.3e}", flush=True)

    pipe = {}
    for eng in ("blockspec", "dma", "dma-all"):
        try:
            fn = jax.jit(lambda u, v, eng=eng: ftle_pipeline(
                u, v, -6.0 * 3600.0, grid, settls_order=4, interp_order=3,
                kernel="pallas", pallas_engine=eng, return_overflow=True))
            out, fl = fn(u, v)
            np.asarray(out)
            t0 = time.perf_counter()
            for _ in range(3):
                out, fl = fn(u, v)
            np.asarray(out)
            dt = (time.perf_counter() - t0) / 3
            print(f"pipeline engine={eng}: {dt*1e3:8.1f} ms/field "
                  f"({1.0/dt:.3f} fields/s) flag={int(fl):#x}", flush=True)
            if int(fl) == 0:
                pipe[eng] = 1.0 / dt
        except Exception as e:  # noqa: BLE001
            print(f"pipeline engine={eng}: FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    # Record the measured winner for bench.py (read when LCS_BENCH_ENGINE
    # is unset) so an unattended driver bench after a tunnel recovery uses
    # the best DEVICE-VALIDATED config, never an unmeasured guess.
    if pipe:
        import json
        best = max(pipe, key=pipe.get)
        rec = {"engine": best,
               "fields_per_sec": {k: round(v, 4) for k, v in pipe.items()},
               "source": "tools/probe_engine.py"}
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".bench_config.json")
        with open(path, "w") as f:
            json.dump(rec, f)
        print(f"wrote {path}: engine={best}", flush=True)


if __name__ == "__main__":
    main()
