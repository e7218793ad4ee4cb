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


class TestFullAnalysisOracle:
    """End-to-end cross-implementation check against the composition
    windspharm actually computes (/root/reference/LCS/LCS.py:115-118):
    spharm analyses onto the FULL basis (n = m..nlat-1), zeroes n > T,
    then synthesises.  Our operator instead least-squares-projects
    directly onto the n <= T span — a different operator composition that
    must coincide whenever the analysis recovers exact coefficients.

    The oracle here is built entirely from ``scipy.special.sph_harm_y``
    (no code shared with ops/sht.py): per zonal wavenumber m it solves an
    unweighted least-squares analysis over a WIDE span (n = m..N_a with
    T < N_a << nlat-1), zeroes n > T, and re-synthesises.  For a field
    whose latitudinal content lies inside the analysis span the LSQ
    system is consistent, so the recovered coefficients — and hence the
    truncation — are mathematically exact regardless of the quadrature
    weights spharm would use; any disagreement therefore isolates a bug
    in our projector rather than a weighting convention."""

    T = 20
    N_FIELD = 60     # max total wavenumber of the synthetic field
    N_ANALYSIS = 120 # oracle analysis span (must be >= N_FIELD)

    def test_truncation_matches_full_analysis_pipeline(self):
        from scipy.special import sph_harm_y

        lats, lons = _common_grid()
        ny, nx = lats.size, lons.size
        theta = np.deg2rad(90.0 - lats)
        x = np.cos(theta)
        rng = np.random.RandomState(7)

        # basis per m: normalised P_n^m(x) columns from scipy (phi = 0)
        def basis(m, nmax):
            cols = [np.real(sph_harm_y(n, m, theta, 0.0))
                    for n in range(m, nmax + 1)]
            return np.stack(cols, axis=1)          # (ny, nmax-m+1)

        # synthesise a random field with content up to N_FIELD: per m,
        # random coefficients against cos/sin(m lon)
        f = np.zeros((ny, nx))
        LONR = np.deg2rad(lons)
        want = np.zeros((ny, nx))
        for m in range(0, self.T + 6):             # some m above T too
            P = basis(m, self.N_FIELD)
            c_cos = rng.randn(P.shape[1])
            c_sin = rng.randn(P.shape[1]) if m else np.zeros(P.shape[1])
            prof_cos = P @ c_cos
            prof_sin = P @ c_sin
            f += np.outer(prof_cos, np.cos(m * LONR)) \
                + np.outer(prof_sin, np.sin(m * LONR))
            if m <= self.T:
                # exact truncation: keep only n <= T coefficients
                k = self.T - m + 1
                want += np.outer(P[:, :k] @ c_cos[:k], np.cos(m * LONR)) \
                    + np.outer(P[:, :k] @ c_sin[:k], np.sin(m * LONR))

        # oracle: full-span analysis -> zero n > T -> synthesis
        oracle = np.zeros((ny, nx))
        spec = np.fft.rfft(f, axis=-1)
        out_spec = np.zeros_like(spec)
        for m in range(self.T + 1):
            Pa = basis(m, self.N_ANALYSIS)
            coef, *_ = np.linalg.lstsq(Pa, spec[:, m], rcond=None)
            k = self.T - m + 1
            out_spec[:, m] = Pa[:, :k] @ coef[:k]
        oracle = np.fft.irfft(out_spec, n=nx, axis=-1)

        got = np.asarray(truncate(f, lats, truncation=self.T))
        scale = np.abs(f).max()
        # oracle internal consistency first (validates the oracle itself)
        assert np.abs(oracle - want).max() < 1e-8 * scale
        # our direct-span projector vs the analysis-then-zero pipeline
        assert np.abs(got - want).max() < 1e-8 * scale
        assert np.abs(got - oracle).max() < 1e-8 * scale
