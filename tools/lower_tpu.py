"""De-risk kernel changes without TPU hardware: Mosaic-lower the flagship
pipeline (and a standalone gather group) for platform 'tpu' via jax.export.

A clean lowering rules out Pallas/Mosaic *lowering* regressions (shape,
layout, alignment, unsupported-op errors); device-compile risk (VMEM,
regalloc) and numerics remain — validate on silicon with bench.py and
tests_tpu/ on first TPU contact (ROUND3_NOTES.md hygiene).

Usage:  timeout 1800 python tools/lower_tpu.py [--small]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")   # never touches the tunnel

import jax.numpy as jnp  # noqa: E402
from jax import export  # noqa: E402

from lagrangiancoherence_tpu.grid import Grid, global_quarter_degree_grid
from lagrangiancoherence_tpu.models.pipeline import ftle_pipeline


def main():
    small = "--small" in sys.argv
    if small:
        ny, nx, nt = 97, 256, 5
        lats = np.linspace(-90.0, 90.0, ny)
        lons = np.linspace(-180.0, 180.0 - 360.0 / nx, nx)
        grid = Grid(lats=lats, lons=lons, cyclic_x=True)
        order = 1
    else:
        grid = global_quarter_degree_grid()
        ny, nx = grid.shape
        nt = 33
        order = 4

    engine = "blockspec"
    for a in sys.argv:
        if a.startswith("--engine="):
            engine = a.split("=", 1)[1]
    u = jax.ShapeDtypeStruct((nt, ny, nx), jnp.float32)
    for rebin in (False, "sort"):
        t0 = time.time()
        fn = lambda uu, vv: ftle_pipeline(   # noqa: E731
            uu, vv, -6.0 * 3600.0, grid, settls_order=order,
            interp_order=3, kernel="pallas", rebin=rebin,
            pallas_engine=engine,
            return_overflow=True)
        exp = export.export(jax.jit(fn), platforms=["tpu"])(u, u)
        size = len(exp.mlir_module_serialized)
        print(f"rebin={rebin!r} engine={engine}: lowered OK, "
              f"{size/1e6:.1f} MB MLIR, {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
