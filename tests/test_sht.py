"""Spectral-truncation tests (windspharm-equivalent behaviour,
/root/reference/LCS/LCS.py:115-118): a T20 triangular truncation must pass
low-total-wavenumber fields unchanged and annihilate high-wavenumber content."""
import numpy as np

from lagrangiancoherence_tpu.ops.sht import truncate


def _grid():
    # Periodic longitude grid (period exactly 360 degrees) — the FFT stage
    # assumes (near-)periodicity, as the reference's 721-point common grid has.
    lats = np.linspace(-89.75, 89.75, 180)
    lons = np.arange(-180.0, 180.0, 1.0)
    return lats, lons


def test_low_wavenumber_preserved():
    lats, lons = _grid()
    LON, LAT = np.meshgrid(np.deg2rad(lons), np.deg2rad(lats))
    f = np.cos(2 * LON) * np.cos(LAT) ** 2 + 0.5 * np.sin(LAT)
    out = np.asarray(truncate(f, lats, truncation=20))
    assert np.abs(out - f).max() < 1e-5


def test_high_wavenumber_removed():
    lats, lons = _grid()
    LON, LAT = np.meshgrid(np.deg2rad(lons), np.deg2rad(lats))
    f = np.cos(50 * LON) * np.sin(40 * LAT)
    out = np.asarray(truncate(f, lats, truncation=20))
    assert np.sqrt((out ** 2).mean()) < 1e-3 * np.sqrt((f ** 2).mean())


def test_zonal_mean_wavenumbers_above_T_removed():
    lats, lons = _grid()
    x = np.sin(np.deg2rad(lats))
    # Legendre P_30 profile (m=0, n=30): beyond T20, must vanish
    from numpy.polynomial.legendre import Legendre
    coeffs = np.zeros(31); coeffs[30] = 1.0
    f = np.broadcast_to(Legendre(coeffs)(x)[:, None], (lats.size, lons.size)).copy()
    out = np.asarray(truncate(f, lats, truncation=20))
    # interpolatory quadrature weights make the projector annihilate
    # out-of-span Legendre modes to machine precision
    assert np.abs(out).max() < 1e-12 * np.abs(f).max()


def _common_grid():
    """The reference's 0.5-degree common latitudes (LCS.py:107-108) with an
    exactly periodic longitude axis for the FFT stage."""
    lats = np.linspace(-89.75, 89.75, 360)
    lons = np.arange(-180.0, 180.0, 0.5)
    return lats, lons


def _real_ynm(n, m, lats, lons):
    """Independent Y_n^m oracle via scipy (not the module's own basis)."""
    from scipy.special import sph_harm_y
    LON, CLAT = np.meshgrid(np.deg2rad(lons), np.deg2rad(90.0 - lats))
    return np.real(sph_harm_y(n, m, CLAT, LON))


class TestSpectralContract:
    """The mathematically checkable contract of a T-truncation
    (windspharm ``VectorWind.truncate`` semantics,
    /root/reference/LCS/LCS.py:115-118): reproduce every Y_n^m with
    n <= T exactly, annihilate every Y_n^m with n > T or m > T."""

    T = 20

    def test_retained_modes_pass_through(self):
        lats, lons = _common_grid()
        for (n, m) in [(0, 0), (3, 2), (10, 7), (20, 5), (20, 20)]:
            f = _real_ynm(n, m, lats, lons)
            out = np.asarray(truncate(f, lats, truncation=self.T))
            err = np.abs(out - f).max() / np.abs(f).max()
            assert err < 1e-10, (n, m, err)

    def test_high_degree_modes_annihilated(self):
        lats, lons = _common_grid()
        for (n, m) in [(21, 0), (21, 20), (25, 10), (40, 0)]:
            f = _real_ynm(n, m, lats, lons)
            out = np.asarray(truncate(f, lats, truncation=self.T))
            resid = np.abs(out).max() / np.abs(f).max()
            assert resid < 1e-10, (n, m, resid)

    def test_high_order_modes_annihilated(self):
        # m > T is zeroed in the FFT stage regardless of n
        lats, lons = _common_grid()
        f = _real_ynm(25, 23, lats, lons)
        out = np.asarray(truncate(f, lats, truncation=self.T))
        assert np.abs(out).max() < 1e-10 * np.abs(f).max()

    def test_mixed_field_splits_exactly(self):
        lats, lons = _common_grid()
        f_low = (_real_ynm(4, 1, lats, lons)
                 + 0.3 * _real_ynm(15, 12, lats, lons))
        f_high = (0.7 * _real_ynm(22, 3, lats, lons)
                  + 0.5 * _real_ynm(30, 25, lats, lons))
        out = np.asarray(truncate(f_low + f_high, lats, truncation=self.T))
        err = np.abs(out - f_low).max() / np.abs(f_low).max()
        assert err < 1e-10, err


def test_batched_time_axis():
    lats, lons = _grid()
    LON, LAT = np.meshgrid(np.deg2rad(lons), np.deg2rad(lats))
    f = np.stack([np.cos(2 * LON) * np.cos(LAT) ** 2,
                  np.sin(LON) * np.cos(LAT)])
    out = np.asarray(truncate(f, lats, truncation=20))
    assert out.shape == f.shape
    assert np.abs(out - f).max() < 1e-5


def test_idempotent():
    lats, lons = _grid()
    rng = np.random.RandomState(0)
    f = rng.randn(lats.size, lons.size)
    once = np.asarray(truncate(f, lats, truncation=20))
    twice = np.asarray(truncate(once, lats, truncation=20))
    np.testing.assert_allclose(twice, once, atol=1e-8)
