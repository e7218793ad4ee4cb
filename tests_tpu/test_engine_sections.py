"""Silicon regression for the engine's edge-class-split sections.

The round-3 kernel rework routes every tile to a STATIC-path section
(interior / one-hot edge) of the manual-DMA engine, with the sections
assembled by ONE batched per-tile section-id scatter
(ops/pallas_interp.py `_engine_layout` + the absorb_A assignment).  A
mis-assignment is silent: an interior body applies no mirror remaps, so
an edge tile routed interior corrupts its seam taps at O(1e-2) while the
window-fit flag stays 0.  Interpret mode proves the routing logic; this
test pins the Mosaic-compiled behaviour on hardware at the committed
gather bound (kernel semantics: /root/reference/LCS/tools.py:21-41).

The position field is constructed to simultaneously exercise, in one
launch: interior base tiles, x-fold-seam edge tiles (taps straddling the
wrap column), y-edge tiles one row from the pole-window boundary, and
ladder-escalated tiles of both edge classes (violent within-tile spans).
"""
import jax
import jax.numpy as jnp
import numpy as np

from lagrangiancoherence_tpu.grid import Grid
from lagrangiancoherence_tpu.ops.interp import (interp_at_parcels_multi,
                                                prefilter)
from lagrangiancoherence_tpu.ops.pallas_interp import (pad_coeffs_for_pallas,
                                                       pallas_interp_multi)

from test_device_parity import GATHER_GROUP_ATOL


class TestEngineEdgeClassSections:
    def test_fold_seam_and_pole_window_mix(self):
        ny, nx = 96, 512
        lats = np.linspace(-90.0, 90.0, ny)
        lons = np.linspace(-180.0, 180.0 - 360.0 / nx, nx)
        grid = Grid(lats=lats, lons=lons, cyclic_x=True)
        bounds = dict(y_min=grid.y_min, y_max=grid.y_max,
                      x_min=grid.x_min, x_max=grid.x_max)

        @jax.jit
        def build():
            lon = jnp.deg2rad(jnp.asarray(lons, jnp.float32))
            lat = jnp.deg2rad(jnp.asarray(lats, jnp.float32))
            LON, LAT = jnp.meshgrid(lon, lat)
            u = 25.0 * jnp.cos(LAT) + 3.0 * jnp.cos(5 * LON) * jnp.sin(2 * LAT)
            v = 3.0 * jnp.sin(4 * LON) * jnp.cos(3 * LAT)
            raw = jnp.stack([u, v, 0.8 * u - v, 1.2 * v + 0.1 * u])

            px0, py0 = grid.mesh_xy
            px0 = jnp.asarray(px0, jnp.float32)
            py0 = jnp.asarray(py0, jnp.float32)
            row = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)

            # x-fold-seam edge class: park two 8-row bands right on the
            # wrap column (x taps straddle cols nx-1 / 0), one of them
            # ALSO given a violent within-tile spread so its tiles
            # escalate into an edge-half ladder section
            seam = jnp.where((row >= 24) & (row < 32), 179.5 - px0, 0.0)
            seam = seam + jnp.where(
                (row >= 32) & (row < 40),
                179.5 - px0 + 90.0 * jnp.sin(col.astype(jnp.float32)), 0.0)
            # interior escalation: violent spread away from any seam
            burst = jnp.where((row >= 56) & (row < 64),
                              60.0 * jnp.sin(col.astype(jnp.float32) * 0.7),
                              0.0)
            px = px0 + 6.0 * jnp.sin(py0 / 25.0) + seam + burst
            # y-edge class at the pole-WINDOW boundary: rows just outside
            # the order-1 pole-home band pushed to within one cell of the
            # y fold (floor <= 1 / >= ny-3) — the mirror-remap branch
            py = py0 + 4.0 * jnp.cos(px0 / 30.0)
            south = grid.y_min + 0.4 * (row.astype(jnp.float32) - 3.0)
            north = grid.y_max - 0.4 * (ny - 4.0 - row.astype(jnp.float32))
            py = jnp.where((row >= 3) & (row < 8), south, py)
            py = jnp.where((row >= ny - 8) & (row < ny - 3), north, py)
            py = jnp.clip(py, grid.y_min, grid.y_max)
            px = jnp.where(px > 180.0, -180.0 + (px % 180.0), px)
            px = jnp.where(px < -180.0, px % 180.0, px)
            return raw, px, py

        raw, px, py = build()

        @jax.jit
        def pallas_path(raw, px, py):
            cw = prefilter(raw, order=3)
            cwp = pad_coeffs_for_pallas(cw)
            return pallas_interp_multi(raw, cwp, px, py, ny=ny, nx=nx,
                                       order=3, engine="dma-all", **bounds)

        @jax.jit
        def xla_path(raw, px, py):
            cw = prefilter(raw, order=3)
            return interp_at_parcels_multi(raw, cw, px, py, order=3,
                                           **bounds)

        got, flag = pallas_path(raw, px, py)
        want = np.asarray(xla_path(raw, px, py))
        got, flag = np.asarray(got), int(np.asarray(flag))
        assert flag == 0, f"window overflow on section-mix gather: {flag:#x}"
        maxabs = float(np.max(np.abs(got - want)))
        assert maxabs <= GATHER_GROUP_ATOL, (
            f"engine section mix: pallas vs xla max|diff|={maxabs:.3e} "
            f"> {GATHER_GROUP_ATOL}")
