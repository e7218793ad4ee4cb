"""A/B the polar sort-binning mode on the real flagship scan:
scan time and final-position agreement, rebin="sort" vs rebin=False.

Runs on the engine recorded in .bench_config.json (the probe_engine
winner) so the decision matches the config bench.py will use, and merges
the measured rebin winner back into .bench_config.json — the unattended
contact queue (tools/tpu_contact.sh) therefore leaves bench.py fully
self-configured to the device-validated optimum (VERDICT task 7).

Run: python tools/probe_sort.py
"""
import json
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
    cfg_path = os.path.join(_ROOT, ".bench_config.json")
    cfg = {}
    if os.path.exists(cfg_path):
        try:
            cfg = json.load(open(cfg_path))
        except Exception:
            cfg = {}
    engine = os.environ.get("LCS_PALLAS_ENGINE", cfg.get("engine", "auto"))
    print(f"engine under test: {engine!r}", flush=True)

    grid = global_quarter_degree_grid()
    u, v = flagship_winds(grid)
    res = {}
    for rb in (False, "sort"):
        try:
            fn = jax.jit(lambda u, v, rb=rb: parcel_propagation_core(
                u, v, -6.0 * 3600.0, grid, settls_order=4, interp_order=3,
                kernel="pallas", rebin=rb, pallas_engine=engine,
                return_overflow=True))
            px, py, fl = fn(u, v)
            np.asarray(px)
            t0 = time.perf_counter()
            for _ in range(3):
                px, py, fl = fn(u, v)
            np.asarray(px)
            dt = (time.perf_counter() - t0) / 3
            print(f"rebin={rb!r:8} scan {dt*1e3:8.1f} ms  flag={int(fl):#x}",
                  flush=True)
            res[rb] = (np.asarray(px), np.asarray(py))
        except Exception as e:  # noqa: BLE001 — one mode failing must not
            # kill the other leg's measurement
            print(f"rebin={rb!r:8} scan FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
    if "sort" in res and False in res:
        dx = np.max(np.abs(res["sort"][0] - res[False][0]))
        dy = np.max(np.abs(res["sort"][1] - res[False][1]))
        print(f"max|sort-off| dx={dx:.3e} dy={dy:.3e}", flush=True)

    # full pipeline (bench config incl. gradient) A/B; record the winner
    from lagrangiancoherence_tpu.models.pipeline import ftle_pipeline
    pipe = {}
    for rb in (False, "sort"):
        try:
            fn = jax.jit(lambda u, v, rb=rb: ftle_pipeline(
                u, v, -6.0 * 3600.0, grid, settls_order=4, interp_order=3,
                kernel="pallas", rebin=rb, pallas_engine=engine,
                return_overflow=True))
            out, fl = fn(u, v)
            np.asarray(out)
            t0 = time.perf_counter()
            for _ in range(3):
                out, fl = fn(u, v)
            np.asarray(out)
            dt = (time.perf_counter() - t0) / 3
            print(f"pipeline rebin={rb!r}: {dt*1e3:8.1f} ms/field "
                  f"({1.0/dt:.3f} fields/s) flag={int(fl):#x}", flush=True)
            if int(fl) == 0:
                pipe[rb] = 1.0 / dt
        except Exception as e:  # noqa: BLE001
            print(f"pipeline rebin={rb!r}: FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    if pipe:
        best = max(pipe, key=pipe.get)
        cfg["rebin"] = "sort" if best == "sort" else False
        cfg.setdefault("source", "")
        cfg["source"] = (cfg["source"] + "+tools/probe_sort.py").lstrip("+")
        cfg["rebin_fields_per_sec"] = {str(k): round(v, 4)
                                       for k, v in pipe.items()}
        with open(cfg_path, "w") as f:
            json.dump(cfg, f)
        print(f"wrote {cfg_path}: rebin={cfg['rebin']!r}", flush=True)


if __name__ == "__main__":
    main()
