"""Decompose the flagship gather-group cost on the real TPU:

1. one jitted sort-bin pass (the per-rebin cost of rebin="sort");
2. isolated F=4 gather-group time at steps 0/16/32 positions:
   - full ladder, as-stored layout
   - tier A + pole only (retry_tiles=0), as-stored
   - full ladder, SORT-BINNED layout (storage built host-side)
3. the same with zeroed escalation need (home-mesh positions) as floor.

Run: python tools/probe_decomp.py
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
from lagrangiancoherence_tpu.ops.interp import prefilter
from lagrangiancoherence_tpu.ops.pallas_interp import (
    pad_coeffs_for_pallas, pallas_interp_multi)

CACHE = "/tmp/flagship_traj.npz"


def bin_storage_np(px, py, grid, order=3):
    """Host-side sort-binned storage (same scheme as settls sort mode)."""
    bands = settls._sort_bands(grid, order)
    ny, nx = grid.shape
    out_x, out_y = px.copy(), py.copy()
    for r0, nr in bands:
        sl = slice(r0, r0 + nr)
        yi = np.clip(ny * (py[sl] - grid.y_min) / (grid.y_max - grid.y_min),
                     0, ny - 1)
        xi = np.mod(np.floor(nx * (px[sl] - grid.x_min)
                             / (grid.x_max - grid.x_min)), nx)
        key = (yi.astype(np.int64) // 8) * (-(-nx // 32)) \
            + xi.astype(np.int64) // 32
        o = np.argsort(key.ravel(), kind="stable")
        for src, dst in ((px, out_x), (py, out_y)):
            flat = src[sl].ravel()[o]
            dst[sl] = np.asarray(settls._to_tile_storage(
                jnp.asarray(flat), nr, nx))
    return out_x, out_y


def main():
    print("devices:", jax.devices(), flush=True)
    grid = global_quarter_degree_grid()
    ny, nx = grid.shape
    d = np.load(CACHE)
    tx, ty = d["tx"], d["ty"]

    # --- sort-bin pass cost ---
    bands = settls._sort_bands(grid, 3)
    print("bands:", bands, flush=True)
    px = jnp.asarray(tx[20].astype(np.float32))
    py = jnp.asarray(ty[20].astype(np.float32))
    cv = jnp.ones_like(px)
    pm = jnp.zeros(px.shape, jnp.int32)

    sortf = jax.jit(lambda px, py, cv, pm: settls._sort_bin_bands(
        (px, py, cv, pm), px, py, bands, grid))
    o = sortf(px, py, cv, pm)
    o[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(20):
        o = sortf(px, py, cv, pm)
    o[0].block_until_ready()
    print(f"sort-bin pass: {(time.perf_counter()-t0)/20*1e3:7.3f} ms",
          flush=True)

    # --- isolated gather groups ---
    LON, LAT = np.meshgrid(np.deg2rad(grid.lons), np.deg2rad(grid.lats))
    base_u = 25.0 * np.cos(LAT)
    raw = jnp.asarray(np.stack([base_u, 0.3 * base_u, 1.1 * base_u,
                                0.7 * base_u]).astype(np.float32))
    cw = prefilter(raw, order=3)
    # NOTE: pad_coeffs_for_pallas must run INSIDE the jit: a ~400 MB
    # padded stack as an entry argument blows the axon remote-compile
    # request limit (HTTP 413); as an intermediate it compiles fine.
    bounds = dict(y_min=grid.y_min, y_max=grid.y_max,
                  x_min=grid.x_min, x_max=grid.x_max)

    def timed(fn, px, py, name):
        try:
            px = np.float32(px); py = np.float32(py)
            o, _ = fn(jnp.asarray(px), jnp.asarray(py))
            o.block_until_ready()
            pxj = jnp.asarray(px); pyj = jnp.asarray(py)
            t0 = time.perf_counter()
            for _ in range(20):
                o, _ = fn(pxj, pyj)
            o.block_until_ready()
            print(f"  {name:22s} {(time.perf_counter()-t0)/20*1e3:7.3f} "
                  f"ms/group", flush=True)
        except Exception as e:
            print(f"  {name:22s} FAILED {str(e)[:100]}", flush=True)

    from functools import partial

    # the axon remote compiler 413s on the standalone gather program but
    # accepts the (larger) scan program -- wrap in a 1-step lax.scan to
    # match the accepted shape and see whether that is really the trigger
    def scan_wrap(retry):
        def g(r, c, px, py):
            cp = pad_coeffs_for_pallas(c)

            def body(carry, _):
                px, py = carry
                o, fl = pallas_interp_multi(
                    r, cp, px, py, ny=ny, nx=nx, order=3, **bounds,
                    retry_tiles=retry)
                # keep the gather live through the carry
                return (px + 0.0 * o[0], py), fl

            (px2, py2), fls = jax.lax.scan(body, (px, py), None, length=1)
            return px2, fls[0]
        return partial(jax.jit(g), raw, cw)

    full = scan_wrap(256)
    tiera = scan_wrap(0)

    px0, py0 = grid.mesh_xy
    print("home mesh (floor):", flush=True)
    timed(full, px0, py0, "full ladder")
    timed(tiera, px0, py0, "tierA+pole")
    for s in (16, 32):
        print(f"step {s} positions:", flush=True)
        timed(full, tx[s], ty[s], "full as-stored")
        timed(tiera, tx[s], ty[s], "tierA as-stored")
        bx, by = bin_storage_np(tx[s], ty[s], grid)
        timed(full, bx, by, "full sort-binned")


if __name__ == "__main__":
    main()
