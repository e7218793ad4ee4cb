"""Series-workload throughput on device (VERDICT round-3 task 3/9): N
flagship fields through the ``ftle_series`` runner (the animation
workload, /root/reference/LCS/LCS.py:236-268 — one FTLE field per
sliding window) vs N x the single-field pipeline.

The runner's batch='auto' policy resolves to sequential single-field
programs at flagship pallas scale (vmapped B>=2 fails device compile —
probe_batch --sweep); this probe records what that policy actually
delivers end-to-end, including the host-side window slicing and the
per-window device round-trips.

Run: timeout 3000 python tools/probe_series.py [N_windows]
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

from lagrangiancoherence_tpu.field import Field
from lagrangiancoherence_tpu.grid import global_quarter_degree_grid
from lagrangiancoherence_tpu.models.pipeline import ftle_pipeline
from lagrangiancoherence_tpu.runners import ftle_series


def main():
    n_win = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    window = 33
    nt = window + n_win - 1
    # apply the recorded bench winner's env knobs so the series runs the
    # same config the single-field bench measures
    cfg_path = os.path.join(_ROOT, ".bench_config.json")
    if os.path.exists(cfg_path):
        try:
            import json
            cfg = json.load(open(cfg_path))
            for k_e, v_e in (cfg.get("env") or {}).items():
                os.environ.setdefault(str(k_e), str(v_e))
            if "pole_ladder" in cfg:
                os.environ.setdefault("LCS_POLE_LADDER",
                                      str(cfg["pole_ladder"]))
        except Exception:
            pass
    print("devices:", jax.devices(), f"windows={n_win}", flush=True)

    grid = global_quarter_degree_grid()
    LON, LAT = np.meshgrid(np.deg2rad(grid.lons), np.deg2rad(grid.lats))
    base_u = 25.0 * np.cos(LAT) + 3.0 * np.cos(3 * LON) * np.sin(2 * LAT)
    base_v = 3.0 * np.sin(3 * LON) * np.cos(2 * LAT)
    t = np.arange(nt)[:, None, None]
    u = (base_u[None] * (1.0 + 0.05 * np.sin(2 * np.pi * t / nt))
         ).astype(np.float32)
    v = (base_v[None] * (1.0 + 0.05 * np.cos(2 * np.pi * t / nt))
         ).astype(np.float32)
    times = np.arange(nt)
    dims = ("time", "latitude", "longitude")
    coords = {"time": times, "latitude": grid.lats, "longitude": grid.lons}
    uf = Field(u, dims, coords, name="u")
    vf = Field(v, dims, coords, name="v")

    # single-field reference timing (same executable the series reuses);
    # device-resident winds — a numpy arg re-uploads ~274 MB through the
    # axon tunnel per call (measured ~6 s/field, first version of this
    # probe)
    u_d, v_d = jnp.asarray(u), jnp.asarray(v)
    fn = lambda uu, vv: ftle_pipeline(
        uu, vv, -6.0 * 3600.0, grid,
        settls_order=4, interp_order=3, kernel="pallas",
        return_overflow=True)
    out, fl = fn(u_d[:window], v_d[:window])
    np.asarray(out)   # compile + warm
    t0 = time.perf_counter()
    out, fl = fn(u_d[:window], v_d[:window])
    np.asarray(out)
    dt1 = time.perf_counter() - t0
    print(f"single-field: {dt1*1e3:8.1f} ms/field "
          f"({1.0/dt1:.3f} fields/s) flag={int(np.asarray(fl)):#x}",
          flush=True)

    # warm the series path's own jit entry first: jax.jit keys on the
    # SET of explicitly-passed kwargs, so the runner's internal
    # ftle_pipeline call signature gets its own cache entry — a cold
    # series pays one flagship re-trace (~50 s) + persistent-cache load
    # (~14 s) regardless of any prior single-field warmup (measured
    # 2026-08-21, JAX_LOG_COMPILES).  Steady-state throughput is the
    # number that answers VERDICT task 3/9.
    ftle_series(uf.isel(time=slice(0, window)),
                vf.isel(time=slice(0, window)), -6.0 * 3600.0,
                window=window, stride=1, settls_order=4, interp_order=3,
                kernel="pallas")
    t0 = time.perf_counter()
    series = ftle_series(uf, vf, -6.0 * 3600.0, window=window, stride=1,
                         settls_order=4, interp_order=3, kernel="pallas")
    dts = time.perf_counter() - t0
    assert series.data.shape[0] == n_win, series.data.shape
    assert np.isfinite(series.data[:, 2:-2]).all()
    print(f"series {n_win} windows: {dts:8.2f} s total, "
          f"{dts*1e3/n_win:8.1f} ms/field ({n_win/dts:.3f} fields/s), "
          f"overhead vs single {100.0*(dts/n_win/dt1-1.0):+.1f}%",
          flush=True)


if __name__ == "__main__":
    main()
