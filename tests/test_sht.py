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
    # cos-weighted least squares on a regular (non-Gaussian) grid leaves
    # O(quadrature) leakage ~7e-4; exact annihilation needs Gaussian latitudes
    assert np.abs(out).max() < 2e-3 * np.abs(f).max()


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
