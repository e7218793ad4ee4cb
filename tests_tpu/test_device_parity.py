"""Mosaic-compiled pallas kernel parity on real TPU hardware.

Guards the semantics of the reference's hot kernel
(/root/reference/LCS/tools.py:21-41 — spline interpolation of wind fields
at parcel positions) for the compiled TPU fast path:

* flagship-scale gather group, pallas vs XLA, explicit f32 tolerance;
* the fold/period-boundary last-column case (docs/source/kernel.rst,
  "Fold-boundary determinism") — the 1e-2 silent wrap-seam regression
  class that interpret mode cannot reproduce;
* end-to-end f32 log-FTLE accuracy vs the f64 scipy oracle on a mid-size
  config, pinning the committed p99 bound.

Each test jit-builds its big arrays on device (never as entry constants —
the axon tunnel rejects ~400 MB requests, see ROUND3_NOTES.md).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lagrangiancoherence_tpu.grid import Grid, global_quarter_degree_grid
from lagrangiancoherence_tpu.ops.interp import (interp_at_parcels_multi,
                                                prefilter)
from lagrangiancoherence_tpu.ops.pallas_interp import (pad_coeffs_for_pallas,
                                                       pallas_interp_multi)

# f32 tolerance for one gather group, pallas (Mosaic HIGHEST-precision
# matmul contraction) vs XLA (take-based gather): measured 1.3e-5 on the
# flagship (ROUND2_NOTES.md); 5e-5 leaves ~4x headroom for wind-field
# magnitude (~25 m/s) while still catching any tap/fold slip (those are
# O(1e-2) or worse).
GATHER_GROUP_ATOL = 5e-5

# p99 |log-FTLE(pallas f32 device) - log-FTLE(oracle f64)| on the mid-size
# config below: measured ~3.5e-4 (round-2 notes); 1.5e-3 bounds the f32
# trajectory divergence class while failing loudly on tap corruption.
LOG_FTLE_P99_BOUND = 1.5e-3


def _flagship_positions(grid):
    """Analytic departure-like positions covering every kernel tier:
    smooth midlatitude drift, violent shear (escalation tiles) and polar
    full-circle whirl (full-x slabs), with Q5 wrap applied."""
    px0, py0 = grid.mesh_xy
    px0 = jnp.asarray(px0, jnp.float32)
    py0 = jnp.asarray(py0, jnp.float32)
    coslat = jnp.cos(jnp.deg2rad(py0))
    whirl = 500.0 * jnp.sin(py0 / 7.0) * (1.0 - coslat) ** 2
    shear = 40.0 * jnp.sin(py0 / 10.0) * jnp.cos(px0 / 15.0)
    px = px0 + 12.0 * jnp.sin(py0 / 30.0) + shear + whirl
    py = jnp.clip(py0 + 8.0 * jnp.cos(px0 / 40.0), -90.0, 90.0)
    px = jnp.where(px > 180.0, -180.0 + (px % 180.0), px)
    px = jnp.where(px < -180.0, px % 180.0, px)
    return px, py


class TestDeviceGatherParity:
    def test_flagship_gather_group(self):
        grid = global_quarter_degree_grid()
        ny, nx = grid.shape
        bounds = dict(y_min=grid.y_min, y_max=grid.y_max,
                      x_min=grid.x_min, x_max=grid.x_max)

        @jax.jit
        def build():
            lon = jnp.deg2rad(jnp.asarray(grid.lons, jnp.float32))
            lat = jnp.deg2rad(jnp.asarray(grid.lats, jnp.float32))
            LON, LAT = jnp.meshgrid(lon, lat)
            u = 25.0 * jnp.cos(LAT) + 3.0 * jnp.cos(3 * LON) * jnp.sin(2 * LAT)
            v = 3.0 * jnp.sin(3 * LON) * jnp.cos(2 * LAT)
            raw = jnp.stack([u, v, 0.9 * u, 1.1 * v])
            px, py = _flagship_positions(grid)
            return raw, px, py

        raw, px, py = build()

        @jax.jit
        def pallas_path(raw, px, py):
            cw = prefilter(raw, order=3)
            cwp = pad_coeffs_for_pallas(cw)
            return pallas_interp_multi(raw, cwp, px, py, ny=ny, nx=nx,
                                       order=3, **bounds)

        @jax.jit
        def xla_path(raw, px, py):
            cw = prefilter(raw, order=3)
            return interp_at_parcels_multi(raw, cw, px, py, order=3,
                                           **bounds)

        got, flag = pallas_path(raw, px, py)
        want = xla_path(raw, px, py)
        got, flag, want = (np.asarray(got), int(np.asarray(flag)),
                           np.asarray(want))
        assert flag == 0, f"pallas window overflow on flagship gather: {flag}"
        maxabs = float(np.max(np.abs(got - want)))
        assert maxabs <= GATHER_GROUP_ATOL, (
            f"pallas vs xla max|diff|={maxabs:.3e} > {GATHER_GROUP_ATOL}")

    def test_fold_boundary_last_column(self):
        """kernel.rst 'Fold-boundary determinism': the grid's own last
        column scales to exactly n under fused arithmetic; a float
        mod-unwrap can round across the integer and desynchronise tap
        floors from mirror branches (silent ~1e-2 seam error, flag 0).
        Compiled-device variant of tests/test_pallas_interp.py's
        TestFoldBoundary — this is the Mosaic-codegen-sensitive case."""
        ny, nx = 16, 128
        lats = np.linspace(-90.0, 90.0, ny)
        lons = np.linspace(-180.0, 180.0 - 360.0 / nx, nx)
        bounds = dict(y_min=lats[0], y_max=lats[-1],
                      x_min=lons[0], x_max=lons[-1])
        LON, LAT = np.meshgrid(np.deg2rad(lons), np.deg2rad(lats))
        u = 20.0 * np.cos(LAT) + 2.0 * np.cos(3 * LON) * np.sin(2 * LAT)
        raw = jnp.asarray(np.stack([u, 0.5 * u]), jnp.float32)
        px = jnp.asarray(np.broadcast_to(lons, (ny, nx)).copy(), jnp.float32)
        py = jnp.asarray(np.broadcast_to(lats[:, None], (ny, nx)).copy(),
                         jnp.float32)

        @jax.jit
        def pallas_path(raw, px, py):
            cw = prefilter(raw, order=3)
            cwp = pad_coeffs_for_pallas(cw)
            return pallas_interp_multi(raw, cwp, px, py, ny=ny, nx=nx,
                                       order=3, **bounds, wy=32)[0]

        @jax.jit
        def xla_path(raw, px, py):
            cw = prefilter(raw, order=3)
            return interp_at_parcels_multi(raw, cw, px, py, order=3,
                                           **bounds)

        got = np.asarray(pallas_path(raw, px, py))
        want = np.asarray(xla_path(raw, px, py))
        # rtol covers benign f32 reduction-order noise (different pole
        # window heights change the one-hot-matmul summation order,
        # measured rel diff ~3e-7); the guarded seam-corruption class is
        # O(1e-2) absolute — still ~200x above this gate.
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


class TestDeviceEndToEnd:
    def test_f32_log_ftle_vs_f64_oracle(self):
        """p99 |log-FTLE| error of the compiled f32 pallas pipeline vs the
        f64 scipy oracle on a mid-size global config — the committed
        device-accuracy bound (BASELINE.json metric is defined against the
        scipy reference, /root/reference/LCS/LCS.py:152-154)."""
        from lagrangiancoherence_tpu.models.pipeline import ftle_pipeline
        from lagrangiancoherence_tpu.testing.oracle import oracle_ftle

        ny, nx = 181, 360   # 1-degree global
        nt, dt = 9, -6.0 * 3600.0
        lats = np.linspace(-90.0, 90.0, ny)
        lons = np.linspace(-180.0, 179.0, nx)
        grid = Grid(lats=lats, lons=lons, cyclic_x=True)
        LON, LAT = np.meshgrid(np.deg2rad(lons), np.deg2rad(lats))
        base_u = 25.0 * np.cos(LAT) + 3.0 * np.cos(3 * LON) * np.sin(2 * LAT)
        base_v = 3.0 * np.sin(3 * LON) * np.cos(2 * LAT)
        t = np.arange(nt)[:, None, None]
        u = base_u[None] * (1.0 + 0.05 * np.sin(2 * np.pi * t / nt))
        v = base_v[None] * (1.0 + 0.05 * np.cos(2 * np.pi * t / nt))

        got = np.asarray(ftle_pipeline(
            jnp.asarray(u, jnp.float32), jnp.asarray(v, jnp.float32), dt,
            grid, settls_order=2, interp_order=3, kernel="pallas"))
        want = oracle_ftle(u, v, lats, lons, dt, settls_order=2,
                           interp_order=3, cyclic_x=True)

        mask = np.isfinite(want) & np.isfinite(got) & (want > 0) & (got > 0)
        # exclude the order-1/'constant' pole rows: the oracle's pole path
        # is itself an approximation band (tools.py:34-39)
        mask[:4] = mask[-4:] = False
        err = np.abs(np.log(got[mask]) - np.log(want[mask]))
        p99 = float(np.percentile(err, 99))
        assert p99 <= LOG_FTLE_P99_BOUND, (
            f"p99 |dlog-FTLE| = {p99:.2e} > {LOG_FTLE_P99_BOUND}")
