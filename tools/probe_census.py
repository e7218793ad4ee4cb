"""Per-step tier census + isolated gather-group timings on the REAL
flagship trajectory (which escalation tiers cost what)."""
import os
import sys
import time
from functools import partial

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
from lagrangiancoherence_tpu.ops.interp import prefilter
from lagrangiancoherence_tpu.ops.pallas_interp import (
    pad_coeffs_for_pallas, pallas_interp_multi)


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

    CACHE = "/tmp/flagship_traj.npz"
    if os.path.exists(CACHE):
        d = np.load(CACHE)
        tx, ty = d["tx"], d["ty"]
    else:
        tx, ty = parcel_propagation_core(u, v, -6.0 * 3600.0, grid,
                                         settls_order=4, interp_order=3,
                                         return_traj=True, kernel="pallas")
        tx = np.asarray(tx)
        ty = np.asarray(ty)
        np.savez_compressed(CACHE, tx=tx, ty=ty)
    print("traj done", tx.shape, flush=True)

    raw = jnp.stack([u[0], v[0], u[1], v[1]])
    cw = prefilter(raw, order=3)
    cwp = pad_coeffs_for_pallas(cw)
    bounds = dict(y_min=grid.y_min, y_max=grid.y_max,
                  x_min=grid.x_min, x_max=grid.x_max)

    dbg = jax.jit(lambda r, c, px, py: pallas_interp_multi(
        r, c, px, py, ny=ny, nx=nx, order=3, **bounds,
        debug_flags=True)[1])
    dbg = partial(dbg, raw, cwp)

    print("step  escal  uncov  per-tier-taken", flush=True)
    for s in ([] if os.environ.get("SKIP_DBG") else range(0, 33, 4)):
        px = jnp.asarray(tx[s])
        py = jnp.asarray(ty[s])
        d = dbg(px, py)
        taken = [int(np.asarray(tt).sum()) for tt in d["_tier_taken"]]
        print(f"{s:4d} {int(np.asarray(d['tiles_escalated'])):6d} "
              f"{int(np.asarray(d['uncovered'])):5d}  {taken}", flush=True)

    # isolated gather-group timings at early/mid/late positions
    full = jax.jit(lambda r, c, px, py: pallas_interp_multi(
        r, c, px, py, ny=ny, nx=nx, order=3, **bounds)[0])
    full = partial(full, raw, cwp)
    tier_a = jax.jit(lambda r, c, px, py: pallas_interp_multi(
        r, c, px, py, ny=ny, nx=nx, order=3, **bounds,
        retry_tiles=0)[0])
    tier_a = partial(tier_a, raw, cwp)
    for s in (0, 16, 32):
        px = jnp.asarray(tx[s])
        py = jnp.asarray(ty[s])
        for name, fn in (("full", full), ("tierA+pole", tier_a)):
            try:
                o = fn(px, py)
            except Exception as e:
                print(f"step {s} {name}: FAILED {str(e)[:120]}", flush=True)
                continue
            o.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(20):
                o = fn(px, py)
            o.block_until_ready()
            dt = (time.perf_counter() - t0) / 20
            print(f"step {s:2d} {name:12s} {dt*1e3:7.3f} ms/group",
                  flush=True)


if __name__ == "__main__":
    main()
