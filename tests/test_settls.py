"""SETTLS integrator parity vs the scipy oracle, plus analytic sanity tests."""
import numpy as np
import pytest
import jax.numpy as jnp

from lagrangiancoherence_tpu.grid import Grid, EARTH_RADIUS
from lagrangiancoherence_tpu.models.settls import parcel_propagation_core
from lagrangiancoherence_tpu.testing import flows
from lagrangiancoherence_tpu.testing.oracle import oracle_parcel_propagation


def _vortex_small():
    cfg = dict(flows.VORTEX_CONFIG_SUBTROPICAL)
    cfg.update(dx=4, dy=4, nt=5)
    return flows.ideal_vortex(**cfg)


@pytest.mark.parametrize("timestep,settls_order", [(-6 * 3600, 4), (6 * 3600, 0),
                                                   (-6 * 3600, 2)])
def test_parity_vs_oracle_vortex(timestep, settls_order):
    u, v, lats, lons, _ = _vortex_small()
    grid = Grid(lats=lats, lons=lons, cyclic_x=True)
    ref_x, ref_y = oracle_parcel_propagation(u, v, lats, lons, timestep,
                                             settls_order=settls_order,
                                             interp_order=3, cyclic_x=True)
    got_x, got_y = parcel_propagation_core(jnp.asarray(u), jnp.asarray(v),
                                           timestep, grid,
                                           settls_order=settls_order,
                                           interp_order=3)
    np.testing.assert_allclose(np.asarray(got_x), ref_x, atol=1e-8)
    np.testing.assert_allclose(np.asarray(got_y), ref_y, atol=1e-8)


def test_parity_trajectories_and_order1():
    u, v, lats, lons, _ = _vortex_small()
    grid = Grid(lats=lats, lons=lons, cyclic_x=True)
    ref_x, ref_y = oracle_parcel_propagation(u, v, lats, lons, -6 * 3600,
                                             settls_order=1, interp_order=1,
                                             cyclic_x=True, return_traj=True)
    got_x, got_y = parcel_propagation_core(jnp.asarray(u), jnp.asarray(v),
                                           -6 * 3600, grid, settls_order=1,
                                           interp_order=1, return_traj=True)
    assert got_x.shape == ref_x.shape == (u.shape[0],) + grid.shape
    np.testing.assert_allclose(np.asarray(got_x), ref_x, atol=1e-8)
    np.testing.assert_allclose(np.asarray(got_y), ref_y, atol=1e-8)


def test_noncyclic_boundary_clamps():
    u, v, lats, lons, _ = flows.ideal_saddle(**flows.SADDLE_CONFIG)
    grid = Grid(lats=lats, lons=lons, cyclic_x=False)
    ref_x, ref_y = oracle_parcel_propagation(u, v, lats, lons, 6 * 3600,
                                             settls_order=2, interp_order=3,
                                             cyclic_x=False)
    got_x, got_y = parcel_propagation_core(jnp.asarray(u), jnp.asarray(v),
                                           6 * 3600, grid, settls_order=2,
                                           interp_order=3)
    np.testing.assert_allclose(np.asarray(got_x), ref_x, atol=1e-8)
    np.testing.assert_allclose(np.asarray(got_y), ref_y, atol=1e-8)
    assert np.asarray(got_x).min() >= grid.x_min
    assert np.asarray(got_x).max() <= grid.x_max


def test_uniform_zonal_flow_analytic():
    """Uniform zonal wind: each step displaces by (1 + SETTLS_order) * u*dt*conv
    — the reference's cumulative SETTLS accumulation (quirk Q3,
    /root/reference/LCS/trajectory.py:110-112) makes every fixed-point
    iteration *add* a full displacement for a steady uniform flow."""
    u, v, lats, lons, _ = flows.shear_flow(**flows.SHEAR_FLOW_CONFIG)
    grid = Grid(lats=lats, lons=lons, cyclic_x=False)
    dt = 6 * 3600.0
    settls_order = 4
    got_x, got_y = parcel_propagation_core(jnp.asarray(u), jnp.asarray(v), dt,
                                           grid, settls_order=settls_order,
                                           interp_order=3)
    nt = u.shape[0]
    conv_x = 180.0 / (np.pi * EARTH_RADIUS * np.abs(np.cos(np.deg2rad(lats))))
    disp = (nt - 1) * (1 + settls_order) * dt * 1.0 * conv_x[:, None]
    expected_x = np.meshgrid(lons, lats)[0] + disp
    expected_x = np.clip(expected_x, lons.min(), lons.max())
    interior = slice(4, -4)
    np.testing.assert_allclose(np.asarray(got_x)[interior], expected_x[interior],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_y)[interior],
                               np.meshgrid(lons, lats)[1][interior], atol=1e-8)
