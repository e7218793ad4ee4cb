"""Analytic validation tests (SURVEY.md §4.2): flows with known FTLE
structure — the quantitative version of the reference's eyeball checks in
examples/ideal_vortex.py."""
import jax.numpy as jnp
import numpy as np

from lagrangiancoherence_tpu.grid import Grid
from lagrangiancoherence_tpu.models.pipeline import ftle_pipeline
from lagrangiancoherence_tpu.models.settls import parcel_propagation_core
from lagrangiancoherence_tpu.ops.regrid import regrid_linear_nearest
from lagrangiancoherence_tpu.testing import flows


def test_zero_wind_ftle():
    """No flow → identity flow map.  In the CORRECTED norm (compat=False)
    the Cauchy–Green sigma_max ≈ 1 everywhere; the quirk-Q1 scrambled norm
    (compat=True) is latitude-dependent in [1, sqrt(2)] even for identity —
    a faithful replication of /root/reference/LCS/LCS.py:152-154."""
    lats = np.linspace(-60.0, 60.0, 49)
    lons = np.linspace(-90.0, 90.0, 73)
    grid = Grid(lats=lats, lons=lons, cyclic_x=False)
    u = np.zeros((4, 49, 73))
    fixed = np.asarray(ftle_pipeline(jnp.asarray(u), jnp.asarray(u),
                                     -6 * 3600.0, grid, settls_order=2,
                                     compat=False))
    np.testing.assert_allclose(fixed[5:-5, 5:-5], 1.0, rtol=1e-3)
    quirk = np.asarray(ftle_pipeline(jnp.asarray(u), jnp.asarray(u),
                                     -6 * 3600.0, grid, settls_order=2))
    c = quirk[5:-5, 5:-5]
    assert c.min() >= 1.0 - 1e-3 and c.max() <= np.sqrt(2) + 1e-3


def test_uniform_shear_ftle_structure():
    """The uniform-zonal shear_flow advects without meridional motion:
    departure latitudes equal arrival latitudes exactly."""
    u, v, lats, lons, _ = flows.shear_flow(**flows.SHEAR_FLOW_CONFIG)
    grid = Grid(lats=lats, lons=lons, cyclic_x=False)
    px, py = parcel_propagation_core(jnp.asarray(u), jnp.asarray(v),
                                     -6 * 3600.0, grid, settls_order=1)
    py = np.asarray(py)
    mesh_y = np.broadcast_to(lats[:, None], py.shape)
    # interior rows: no meridional displacement at all
    np.testing.assert_allclose(py[4:-4], mesh_y[4:-4], atol=1e-8)


def test_saddle_ftle_grows_with_integration_time():
    """Steady saddle: stretching is exponential in time, so the FTLE norm
    of a longer backward integration strictly dominates a shorter one."""
    cfg = dict(flows.SADDLE_CONFIG, nt=9)
    u, v, lats, lons, _ = flows.ideal_saddle(**cfg)
    grid = Grid(lats=lats, lons=lons, cyclic_x=False)
    short = np.asarray(ftle_pipeline(jnp.asarray(u[:4]), jnp.asarray(v[:4]),
                                     -6 * 3600.0, grid, settls_order=1))
    long = np.asarray(ftle_pipeline(jnp.asarray(u), jnp.asarray(v),
                                    -6 * 3600.0, grid, settls_order=1))
    c = slice(10, -10)
    assert np.nanmedian(long[c, c]) > np.nanmedian(short[c, c])


class TestRegrid:
    def test_bilinear_inside_hull(self):
        src_lats = np.linspace(0.0, 10.0, 11)
        src_lons = np.linspace(0.0, 20.0, 21)
        f = src_lats[:, None] * 2.0 + src_lons[None, :] * 3.0  # bilinear-exact
        dst_lats = np.linspace(0.5, 9.5, 7)
        dst_lons = np.linspace(0.25, 19.75, 9)
        out = np.asarray(regrid_linear_nearest(jnp.asarray(f), src_lats,
                                               src_lons, dst_lats, dst_lons))
        want = dst_lats[:, None] * 2.0 + dst_lons[None, :] * 3.0
        np.testing.assert_allclose(out, want, rtol=1e-12)

    def test_nearest_outside_hull(self):
        src_lats = np.linspace(0.0, 10.0, 11)
        src_lons = np.linspace(0.0, 10.0, 11)
        f = np.arange(121, dtype=np.float64).reshape(11, 11)
        dst_lats = np.array([-5.0, 5.0, 15.0])
        dst_lons = np.array([-3.0, 5.0, 13.0])
        out = np.asarray(regrid_linear_nearest(jnp.asarray(f), src_lats,
                                               src_lons, dst_lats, dst_lons))
        assert out[0, 0] == f[0, 0]      # below both mins → corner
        assert out[2, 2] == f[-1, -1]    # above both maxes → corner
        assert out[1, 1] == f[5, 5]      # interior exact node

    def test_batched_time_axis(self):
        src_lats = np.linspace(0, 4, 5)
        src_lons = np.linspace(0, 4, 5)
        f = np.stack([np.full((5, 5), 1.0), np.full((5, 5), 2.0)])
        out = np.asarray(regrid_linear_nearest(
            jnp.asarray(f), src_lats, src_lons,
            np.array([1.5]), np.array([2.5])))
        np.testing.assert_allclose(out[:, 0, 0], [1.0, 2.0])
