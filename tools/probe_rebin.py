"""A/B the row re-binning layout optimisation on the real flagship
trajectory: end-to-end scan time rebin on/off, plus a tier census on
offline-compacted positions (what the kernel sees post-rebin).

Run on the real TPU:  python tools/probe_rebin.py
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
from lagrangiancoherence_tpu.models.settls import (parcel_propagation_core,
                                                   _rebin_delta, _roll_rows)
from lagrangiancoherence_tpu.ops.interp import prefilter
from lagrangiancoherence_tpu.ops.pallas_interp import (
    pad_coeffs_for_pallas, pallas_interp_multi)


def flagship_winds(grid, nt=33):
    LON, LAT = np.meshgrid(np.deg2rad(grid.lons), np.deg2rad(grid.lats))
    base_u = 25.0 * np.cos(LAT) + 3.0 * np.cos(3 * LON) * np.sin(2 * LAT)
    base_v = 3.0 * np.sin(3 * LON) * np.cos(2 * LAT)
    t = np.arange(nt)[:, None, None]
    u = (base_u[None] * (1.0 + 0.05 * np.sin(2 * np.pi * t / nt)))
    v = (base_v[None] * (1.0 + 0.05 * np.cos(2 * np.pi * t / nt)))
    return (jnp.asarray(u.astype(np.float32)),
            jnp.asarray(v.astype(np.float32)))


def main():
    # phases selectable to stay under driver timeouts: ab / census / all
    phase = sys.argv[1] if len(sys.argv) > 1 else "all"
    grid = global_quarter_degree_grid()
    ny, nx = grid.shape
    u, v = flagship_winds(grid)

    variants = {"ab": (False, True), "rebin": (True,), "noreb": (False,),
                "census": (), "all": (False, True)}[phase]
    for rebin in variants:
        fn = jax.jit(lambda u, v, rb=rebin: parcel_propagation_core(
            u, v, -6.0 * 3600.0, grid, settls_order=4, interp_order=3,
            kernel="pallas", rebin=rb, return_overflow=True))
        px, py, fl = fn(u, v)
        np.asarray(px)
        t0 = time.perf_counter()
        for _ in range(3):
            px, py, fl = fn(u, v)
        np.asarray(px)
        dt = (time.perf_counter() - t0) / 3
        print(f"rebin={rebin}  scan {dt*1e3:8.1f} ms  flag={int(fl)}",
              flush=True)

    if phase not in ("census", "all"):
        return

    # tier census on compacted positions: roll each row by its own
    # circular-mean deviation (same delta the scan computes)
    tx, ty, _ = parcel_propagation_core(
        u, v, -6.0 * 3600.0, grid, settls_order=4, interp_order=3,
        return_traj=True, kernel="pallas", rebin=True,
        return_overflow=True)
    tx = np.asarray(tx)
    ty = np.asarray(ty)

    raw = jnp.stack([u[0], v[0], u[1], v[1]])
    cw = prefilter(raw, order=3)
    cwp = pad_coeffs_for_pallas(cw)
    bounds = dict(y_min=grid.y_min, y_max=grid.y_max,
                  x_min=grid.x_min, x_max=grid.x_max)
    dbg = jax.jit(lambda pxx, pyy: pallas_interp_multi(
        raw, cwp, pxx, pyy, ny=ny, nx=nx, order=3, **bounds,
        debug_flags=True)[1])

    @jax.jit
    def compact(pxx, pyy):
        d = _rebin_delta(pxx, nx, grid.x_min, grid.x_max, 32)
        return _roll_rows((pxx, pyy), d, nx, 32)

    print("step  escal  uncov  per-tier-taken   (compacted layout)",
          flush=True)
    for s in range(0, 33, 4):
        pxc, pyc = compact(jnp.asarray(tx[s]), jnp.asarray(ty[s]))
        d = dbg(pxc, pyc)
        taken = [int(np.asarray(tt).sum()) for tt in d["_tier_taken"]]
        print(f"{s:4d} {int(np.asarray(d['tiles_escalated'])):6d} "
              f"{int(np.asarray(d['uncovered'])):5d}  {taken}", flush=True)
        ymn, ymx, xmn, xmx = [np.asarray(a) for a in d["_spans"]]
        ysp = (ymx - ymn).ravel()
        xsp = (xmx - xmn).ravel()
        print(f"      yspan p50/p90/p99/max "
              f"{np.percentile(ysp, [50, 90, 99]).round(1)}"
              f"/{ysp.max():.0f}   >56:{(ysp > 56).sum()}"
              f" >120:{(ysp > 120).sum()} >184:{(ysp > 184).sum()}",
              flush=True)
        print(f"      xspan p50/p90/p99/max "
              f"{np.percentile(xsp, [50, 90, 99]).round(1)}"
              f"/{xsp.max():.0f}   >96:{(xsp > 96).sum()}"
              f" >224:{(xsp > 224).sum()} >608:{(xsp > 608).sum()}",
              flush=True)


if __name__ == "__main__":
    main()
