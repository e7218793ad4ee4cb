"""Ridge-extraction and area-of-influence tests vs the loop oracle
(SURVEY.md §2 rows `find_ridges_spherical_hessian`, `find_area`)."""
import numpy as np
import pytest

from lagrangiancoherence_tpu.field import Field
from lagrangiancoherence_tpu.grid import Grid
from lagrangiancoherence_tpu.models.area import find_area, find_area_core
from lagrangiancoherence_tpu.models.ridges import (
    find_ridges_core, find_ridges_spherical_hessian, symmetric_eig_2x2)
from lagrangiancoherence_tpu.testing.oracle import (oracle_find_area,
                                                    oracle_find_ridges)
import jax.numpy as jnp


def ridge_test_field():
    """A smooth field with a clear straight ridge along lat=5."""
    lats = np.linspace(-30.0, 40.0, 36)
    lons = np.linspace(-60.0, 20.0, 41)
    LON, LAT = np.meshgrid(lons, lats)
    f = 3.0 * np.exp(-((LAT - 5.0) / 8.0) ** 2) + 0.1 * np.cos(LON / 30.0)
    return f, lats, lons


class TestSymmetricEig:
    def test_matches_numpy_eigenvalues(self):
        rng = np.random.RandomState(0)
        a, b, c = rng.randn(3, 50)
        lam0, lam1, v0, v1 = symmetric_eig_2x2(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
        lam0, lam1 = np.asarray(lam0), np.asarray(lam1)
        for i in range(50):
            w = np.linalg.eigvalsh(np.array([[a[i], b[i]], [b[i], c[i]]]))
            np.testing.assert_allclose([lam0[i], lam1[i]], w, rtol=1e-12,
                                       atol=1e-12)

    def test_eigenvector_equation(self):
        rng = np.random.RandomState(1)
        a, b, c = rng.randn(3, 20)
        lam0, lam1, v0, v1 = symmetric_eig_2x2(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
        lam0, v0 = np.asarray(lam0), np.asarray(v0)
        for i in range(20):
            M = np.array([[a[i], b[i]], [b[i], c[i]]])
            resid = M @ v0[i] - lam0[i] * v0[i]
            assert np.abs(resid).max() < 1e-10
            assert abs(np.linalg.norm(v0[i]) - 1) < 1e-12

    def test_isotropic_matrix_degenerate_direction(self):
        lam0, lam1, v0, v1 = symmetric_eig_2x2(
            jnp.asarray(2.0), jnp.asarray(0.0), jnp.asarray(2.0))
        assert np.isfinite(np.asarray(v0)).all()
        np.testing.assert_allclose(np.asarray(lam0), 2.0)


class TestFindRidges:
    def test_core_matches_oracle(self):
        f, lats, lons = ridge_test_field()
        grid = Grid(lats=lats, lons=lons)
        out = find_ridges_core(jnp.asarray(f), grid, sigma=1.2,
                               tolerance_threshold=5e-7, isglobal=False)
        o_r, o_em, o_dt, o_ev = oracle_find_ridges(
            f, lats, lons, sigma=1.2, tolerance_threshold=5e-7,
            isglobal=False)
        # the float32 stencil stage (quirk Q6) injects ~1e-6 relative noise
        np.testing.assert_allclose(np.asarray(out["eigmin"]), o_em,
                                   rtol=1e-4, atol=1e-12)
        np.testing.assert_allclose(np.asarray(out["dt_prod"]), o_dt,
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(out["eigvectors"]), o_ev,
                                   atol=1e-4)
        # mask equality away from decision boundaries (sign of eigmin and the
        # |dt| <= tol test are noise-sensitive exactly at 0 / at tol)
        em = np.asarray(out["eigmin"])
        robust = (np.abs(em) > 1e-12) & \
            (np.abs(np.abs(o_dt) - 5e-7) > 1e-10)
        np.testing.assert_array_equal(np.asarray(out["ridges"])[robust],
                                      o_r[robust])

    def test_ridge_found_on_crest(self):
        f, lats, lons = ridge_test_field()
        ridges, eigmin = find_ridges_spherical_hessian(
            Field(f, ("latitude", "longitude"),
                  {"latitude": lats, "longitude": lons}),
            sigma=1.2, tolerance_threshold=1e-5, isglobal=False)
        crest_row = np.argmin(np.abs(lats - 5.0))
        band = ridges.data[crest_row - 2:crest_row + 3]
        assert band.sum() > 0, "no ridge points found near the crest"
        # eigmin is negative (curvature down) along the crest
        assert (eigmin.data[crest_row] < 0).all()

    def test_return_eigvectors_six_outputs(self):
        f, lats, lons = ridge_test_field()
        out = find_ridges_spherical_hessian(
            Field(f, ("latitude", "longitude"),
                  {"latitude": lats, "longitude": lons}),
            sigma=1.0, return_eigvectors=True, isglobal=False)
        assert len(out) == 6
        ridges, eigmin, dt_prod, eigvectors, gradient, angle = out
        assert eigvectors.shape == (2,) + f.shape
        assert gradient.shape == (2,) + f.shape

    def test_scheme_param_accepted_and_ignored(self):
        f, lats, lons = ridge_test_field()
        fld = Field(f, ("latitude", "longitude"),
                    {"latitude": lats, "longitude": lons})
        a = find_ridges_spherical_hessian(fld, scheme="first_order",
                                          isglobal=False)[0]
        b = find_ridges_spherical_hessian(fld, scheme="second_order",
                                          isglobal=False)[0]
        np.testing.assert_array_equal(a.data, b.data)


class TestFindArea:
    def _setup(self):
        lats = np.linspace(-10.0, 10.0, 21)
        lons = np.linspace(-10.0, 10.0, 21)
        ny, nx = lats.size, lons.size
        ftle = np.full((ny, nx), 0.5)
        ridges = np.full((ny, nx), np.nan)
        ev = np.zeros((ny, nx, 2))
        # one ridge point in the middle walking diagonally
        ridges[10, 10] = 1.0
        ev[10, 10] = [1 / np.sqrt(2), 1 / np.sqrt(2)]
        # another walking purely zonally
        ridges[5, 5] = 1.0
        ev[5, 5] = [0.0, 1.0]
        return ftle, ev, ridges, lats, lons

    def test_core_matches_oracle(self):
        ftle, ev, ridges, lats, lons = self._setup()
        grid = Grid(lats=lats, lons=lons)
        bounds, overflow = find_area_core(
            jnp.asarray(ftle), jnp.asarray(ev), jnp.asarray(ridges), grid,
            0.5, max_steps=64)
        want = oracle_find_area(ftle, ev, ridges, lats, lons, 0.5)
        np.testing.assert_array_equal(np.asarray(bounds), want)
        assert not bool(overflow)

    def test_facade_with_fields(self):
        ftle, ev, ridges, lats, lons = self._setup()
        coords = {"latitude": lats, "longitude": lons}
        dims = ("latitude", "longitude")
        out = find_area(
            Field(ftle, dims, coords),
            Field(np.moveaxis(ev, -1, 0), ("eigvectors",) + dims,
                  {**coords, "eigvectors": np.arange(2)}),
            Field(ridges, dims, coords))
        assert out.dims == dims
        assert out.data.sum() > 0

    def test_overflow_flag(self):
        ftle, ev, ridges, lats, lons = self._setup()
        ftle = ftle + 5.0  # huge radius exp(5.5)/2 ~ 122 deg >> domain
        grid = Grid(lats=lats, lons=lons)
        _, overflow = find_area_core(
            jnp.asarray(ftle), jnp.asarray(ev), jnp.asarray(ridges), grid,
            0.5, max_steps=8)
        assert bool(overflow)

    def test_saturation_ratio_from_qsat_qdpt(self):
        ftle, ev, ridges, lats, lons = self._setup()
        coords = {"latitude": lats, "longitude": lons}
        dims = ("latitude", "longitude")
        evf = Field(np.moveaxis(ev, -1, 0), ("eigvectors",) + dims,
                    {**coords, "eigvectors": np.arange(2)})
        small = find_area(Field(ftle, dims, coords), evf,
                          Field(ridges, dims, coords), qsat=10.0, qdpt=1.0)
        big = find_area(Field(ftle, dims, coords), evf,
                        Field(ridges, dims, coords), qsat=10.0, qdpt=9.0)
        assert big.data.sum() >= small.data.sum()
