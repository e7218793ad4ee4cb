"""End-to-end FTLE parity vs the scipy oracle (the BASELINE.json metric:
max|delta| <= 1e-5), plus closed-form norm checks."""
import numpy as np
import pytest
import jax.numpy as jnp
from scipy.linalg import norm as scipy_norm

from lagrangiancoherence_tpu.grid import Grid
from lagrangiancoherence_tpu.models.settls import parcel_propagation_core
from lagrangiancoherence_tpu.models.ftle import (
    flowmap_gradient, ftle_norm, ftle_from_departures)
from lagrangiancoherence_tpu.testing import flows
from lagrangiancoherence_tpu.testing import oracle as O

RNG = np.random.default_rng(3)


def test_ftle_norm_compat_matches_scipy_svd():
    """Closed-form sigma_max == scipy.linalg.norm(ord=2) on the scrambled
    reshape (quirk Q1)."""
    tensor = RNG.normal(size=(9, 11, 13))
    tensor[6:] = 0.0  # radial derivatives are zero in the pipeline
    ref = O.oracle_ftle_norm(tensor)
    got = np.asarray(ftle_norm(jnp.asarray(tensor), compat=True))
    np.testing.assert_allclose(got, ref, rtol=1e-12)


def test_ftle_norm_corrected_mode():
    """Corrected mode equals sigma_max of the true 3x2 Jacobian."""
    tensor = RNG.normal(size=(9, 5, 7))
    tensor[6:] = 0.0
    F = np.stack([[tensor[0], tensor[1]], [tensor[2], tensor[3]],
                  [tensor[4], tensor[5]]])  # (3, 2, ny, nx)
    ref = np.empty((5, 7))
    for i in range(5):
        for j in range(7):
            ref[i, j] = scipy_norm(F[:, :, i, j], ord=2)
    got = np.asarray(ftle_norm(jnp.asarray(tensor), compat=False))
    np.testing.assert_allclose(got, ref, rtol=1e-12)


def test_ftle_norm_nan_propagation():
    tensor = RNG.normal(size=(9, 4, 4))
    tensor[2, 1, 1] = np.nan
    got = np.asarray(ftle_norm(jnp.asarray(tensor)))
    assert np.isnan(got[1, 1])
    assert np.isfinite(np.delete(got.ravel(), 5)).all()


@pytest.mark.parametrize("gauss_sigma", [None, 1.2])
def test_flowmap_gradient_parity(gauss_sigma):
    ny, nx = 25, 45
    lats = np.linspace(-88, 88, ny)
    lons = np.linspace(-180, 176, nx)
    grid = Grid(lats=lats, lons=lons, cyclic_x=True)
    px = np.meshgrid(lons, lats)[0] + RNG.uniform(-3, 3, (ny, nx))
    py = np.clip(np.meshgrid(lons, lats)[1] + RNG.uniform(-3, 3, (ny, nx)),
                 lats.min(), lats.max())
    ref = O.oracle_flowmap_gradient(px, py, lats, lons, sigma=gauss_sigma)
    got = np.asarray(flowmap_gradient(jnp.asarray(px), jnp.asarray(py), grid,
                                      sigma=gauss_sigma))
    # float32 stencil stage (quirk Q6) bounds achievable parity
    assert np.nanmax(np.abs(got - ref)) < 1e-4 * max(1, np.nanmax(np.abs(ref)))


def test_end_to_end_ftle_parity_ideal_vortex():
    """The minimum end-to-end slice (SURVEY.md section 7 step 3): ideal vortex
    -> backward FTLE, JAX vs scipy oracle, <= 1e-5."""
    cfg = dict(flows.VORTEX_CONFIG_SUBTROPICAL)
    cfg.update(dx=4, dy=4, nt=5)
    u, v, lats, lons, _ = flows.ideal_vortex(**cfg)
    grid = Grid(lats=lats, lons=lons, cyclic_x=True)
    timestep = -6 * 3600

    ref = O.oracle_ftle(u, v, lats, lons, timestep, settls_order=4,
                        interp_order=3, cyclic_x=True)
    px, py = parcel_propagation_core(jnp.asarray(u), jnp.asarray(v), timestep,
                                     grid, settls_order=4, interp_order=3)
    got = np.asarray(ftle_from_departures(px, py, grid))
    scale = np.nanmax(np.abs(ref))
    maxdiff = np.nanmax(np.abs(got - ref))
    assert maxdiff / scale < 1e-5, (maxdiff, scale)
