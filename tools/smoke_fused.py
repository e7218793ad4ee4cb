"""Quick interpret-mode smoke: fused SETTLS iterates vs the unfused
pallas path on a small GLOBAL grid (pole rows exercised), f64.

Run: python tools/smoke_fused.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

import lagrangiancoherence_tpu.ops.pallas_interp as PI

_orig = PI.pallas_interp_multi
PI.pallas_interp_multi = lambda *a, **k: _orig(*a, **{**k,
                                                      "interpret": True})

from lagrangiancoherence_tpu.grid import Grid
from lagrangiancoherence_tpu.models.settls import parcel_propagation_core


def main():
    lats = np.linspace(-90.0, 90.0, 61)
    lons = np.arange(-180.0, 180.0, 3.0)
    grid = Grid(lats=lats, lons=lons, cyclic_x=True)
    ny, nx = grid.shape
    nt = 4
    LON, LAT = np.meshgrid(np.deg2rad(lons), np.deg2rad(lats))
    t = np.arange(nt)[:, None, None]
    u = (22.0 * np.cos(LAT) + 4 * np.cos(2 * LON) * np.sin(2 * LAT)
         )[None] * (1 + 0.05 * np.sin(2 * np.pi * t / nt))
    v = (5.0 * np.sin(3 * LON) * np.cos(2 * LAT)
         )[None] * (1 + 0.05 * np.cos(2 * np.pi * t / nt))
    u = jnp.asarray(u)
    v = jnp.asarray(v)

    for case, rebin, order, so in (("plain", False, 3, 3),
                                   ("sort-whirl", "sort", 3, 4),
                                   ("order1", False, 1, 2)):
        uu = u * (3.0 if case == "sort-whirl" else 1.0)
        vv = v * (2.0 if case == "sort-whirl" else 1.0)
        res = {}
        for fuse in ("0", "1"):
            os.environ["LCS_FUSE"] = fuse
            # parcel_propagation_core is jitted and the env knob is read
            # at trace time — force a re-trace per config
            jax.clear_caches()
            px, py, fl = parcel_propagation_core(
                uu, vv, -6 * 3600.0, grid, settls_order=so,
                interp_order=order, kernel="pallas", rebin=rebin,
                return_overflow=True)
            res[fuse] = (np.asarray(px), np.asarray(py), int(fl))

        dx = np.max(np.abs(res["0"][0] - res["1"][0]))
        dy = np.max(np.abs(res["0"][1] - res["1"][1]))
        print(f"{case:12s}: max|dx|={dx:.3e} max|dy|={dy:.3e} flags "
              f"{res['0'][2]:#x}/{res['1'][2]:#x}", flush=True)
        assert res["1"][2] == 0, "fused path raised overflow"
        assert dx < 1e-9 and dy < 1e-9, (case, dx, dy)
    print("SMOKE OK", flush=True)


if __name__ == "__main__":
    main()
