"""API facade tests: reference call-signature contract, return shapes,
timestamping, subdomain crop, resample — SURVEY.md §2 `LCS` class rows."""
import numpy as np
import pandas as pd
import pytest

from lagrangiancoherence_tpu.api import LCS, latlonsel, parcel_propagation
from lagrangiancoherence_tpu.field import Field
from lagrangiancoherence_tpu.testing import flows
from lagrangiancoherence_tpu.testing.oracle import oracle_ftle


def make_uv(cfg=None, nt=5):
    cfg = dict(cfg or flows.SADDLE_CONFIG)
    cfg["nt"] = nt
    u, v, lats, lons, times = flows.ideal_saddle(**cfg)
    dims = ("time", "latitude", "longitude")
    coords = dict(time=times, latitude=lats, longitude=lons)
    return (Field(u, dims, coords, name="u"),
            Field(v, dims, coords, name="v"), lats, lons, times)


class TestReturnShapes:
    """The 4 return arities of LCS.__call__ (/root/reference/LCS/LCS.py:161-168)."""

    def test_default_returns_single_field(self):
        U, V, lats, lons, _ = make_uv()
        out = LCS(timestep=6 * 3600)(u=U, v=V, verbose=False)
        assert out.dims == ("time", "latitude", "longitude")
        assert out.shape == (1, lats.size, lons.size)

    def test_return_dpts(self):
        U, V, *_ = make_uv()
        out = LCS(timestep=6 * 3600, return_dpts=True)(u=U, v=V, verbose=False)
        assert len(out) == 3
        ftle, xd, yd = out
        assert xd.dims == ("latitude", "longitude")

    def test_return_traj(self):
        U, V, _, _, times = make_uv()
        out = LCS(timestep=6 * 3600)(u=U, v=V, verbose=False, return_traj=True)
        ftle, xt, yt = out
        assert xt.shape[0] == times.size
        assert xt.dims[0] == "time"

    def test_return_dpts_and_traj(self):
        U, V, *_ = make_uv()
        out = LCS(timestep=6 * 3600, return_dpts=True)(
            u=U, v=V, verbose=False, return_traj=True)
        assert len(out) == 5


class TestTimestamping:
    """Forward runs stamp the last time; backward runs the first
    (/root/reference/LCS/LCS.py:158)."""

    def test_forward_stamps_last(self):
        U, V, _, _, times = make_uv()
        out = LCS(timestep=6 * 3600)(u=U, v=V, verbose=False)
        assert np.datetime64(out.coords["time"][0]) == times[-1]

    def test_backward_stamps_first(self):
        U, V, _, _, times = make_uv()
        out = LCS(timestep=-6 * 3600)(u=U, v=V, verbose=False)
        assert np.datetime64(out.coords["time"][0]) == times[0]


class TestAgainstOracle:
    def test_end_to_end_matches_scipy_oracle(self):
        cfg = dict(flows.SADDLE_CONFIG, nt=5)
        u, v, lats, lons, times = flows.ideal_saddle(**cfg)
        dims = ("time", "latitude", "longitude")
        coords = dict(time=times, latitude=lats, longitude=lons)
        U, V = Field(u, dims, coords), Field(v, dims, coords)
        got = LCS(timestep=-6 * 3600, SETTLS_order=2)(
            u=U, v=V, verbose=False).data[0]
        want = oracle_ftle(u, v, lats, lons, -6 * 3600.0, settls_order=2,
                           cyclic_x=False)
        assert np.nanmax(np.abs(got - want)) <= 1e-5 * max(1, np.nanmax(np.abs(want)))


class TestSubdomain:
    def test_strict_crop(self):
        U, V, lats, lons, _ = make_uv()
        sub = {"latitude": slice(-50, -30), "longitude": slice(-60, -20)}
        out = LCS(timestep=6 * 3600, subdomain=sub)(u=U, v=V, verbose=False)
        assert out.coords["latitude"].min() > -50
        assert out.coords["latitude"].max() < -30
        assert out.coords["longitude"].min() > -60

    def test_subdomain_values_match_postcrop_oracle(self):
        # The reference computes flowmap_gradient on the FULL grid and crops
        # the tensor afterwards (/root/reference/LCS/LCS.py:142-144), so
        # points near the crop boundary keep centred stencils fed by data
        # outside the subdomain.  Assert the full band, including the edge.
        cfg = dict(flows.SADDLE_CONFIG, nt=5)
        u, v, lats, lons, times = flows.ideal_saddle(**cfg)
        dims = ("time", "latitude", "longitude")
        coords = dict(time=times, latitude=lats, longitude=lons)
        U, V = Field(u, dims, coords), Field(v, dims, coords)
        sub = {"latitude": slice(-50, -30), "longitude": slice(-60, -20)}
        got = LCS(timestep=-6 * 3600, SETTLS_order=2, subdomain=sub)(
            u=U, v=V, verbose=False)
        full = oracle_ftle(u, v, lats, lons, -6 * 3600.0, settls_order=2,
                           cyclic_x=False)
        ii = np.nonzero((lats > -50) & (lats < -30))[0]
        jj = np.nonzero((lons > -60) & (lons < -20))[0]
        want = full[np.ix_(ii, jj)]
        assert got.shape[1:] == want.shape
        np.testing.assert_array_equal(got.coords["latitude"], lats[ii])
        scale = max(1, np.nanmax(np.abs(want)))
        assert np.nanmax(np.abs(got.data[0] - want)) <= 1e-5 * scale

    def test_latlonsel_list_and_slice(self):
        U, *_ = make_uv()
        a = latlonsel(U, latitude=slice(-50, -30), longitude=slice(-60, -20))
        b = latlonsel(U, latitude=[-50, -30], longitude=[-60, -20])
        np.testing.assert_array_equal(a.data, b.data)


class TestResample:
    def test_resample_halves_timestep(self):
        U, V, lats, lons, times = make_uv(nt=4)
        out = LCS(timestep=-6 * 3600, return_dpts=True)(
            u=U, v=V, verbose=False, resample="3h")
        ftle, xd, yd = out
        # steady flow: resampled integration spans the same window; shape holds
        assert ftle.shape == (1, lats.size, lons.size)

    def test_resampled_steady_flow_matches_unresampled(self):
        # For a steady (time-constant) field, linear time-resampling changes
        # nothing: FTLE at 3h steps over the same window must match 6h.
        U, V, lats, lons, times = make_uv(nt=4)
        a = LCS(timestep=-6 * 3600)(u=U, v=V, verbose=False).data
        cfg = dict(flows.SADDLE_CONFIG, nt=7)
        u7, v7, _, _, t7 = flows.ideal_saddle(**cfg)
        t7 = pd.date_range("2000-01-01", periods=7, freq="3h").values
        dims = ("time", "latitude", "longitude")
        coords = dict(time=t7, latitude=lats, longitude=lons)
        b = LCS(timestep=-3 * 3600)(
            u=Field(u7, dims, coords), v=Field(v7, dims, coords),
            verbose=False).data
        c = LCS(timestep=-6 * 3600)(u=U, v=V, verbose=False,
                                    resample="3h").data
        np.testing.assert_allclose(c, b, rtol=1e-10, atol=1e-10)
        assert not np.allclose(a, b)  # resample genuinely changed the path

    def test_offbin_record_aligns_to_frequency_grid(self):
        # pandas/xarray resample anchors bins at the start of day, NOT at
        # times[0] (/root/reference/LCS/LCS.py:88-91): a record starting at
        # 01:00 resampled to 3h gets labels 00:00, 03:00, 06:00, ...
        from lagrangiancoherence_tpu.api import _resample_linear
        U, V, lats, lons, _ = make_uv(nt=4)
        offbin = pd.date_range("2000-01-01 01:00", periods=4, freq="6h")
        U = U.assign_coords(time=offbin.values)
        out = _resample_linear(U, "3h", "time")
        got_times = pd.to_datetime(out.coords["time"])
        want_times = pd.Series(0.0, index=offbin).resample("3h").asfreq().index
        assert (got_times == want_times).all()
        assert got_times[0] == pd.Timestamp("2000-01-01 00:00")
        # the 00:00 label precedes the record -> NaN (scipy bounds behaviour)
        assert np.isnan(out.data[0]).all()
        # an interior label interpolates linearly in real time: 03:00 sits
        # 2h/6h of the way from 01:00 to 07:00
        w = 2.0 / 6.0
        want = (1 - w) * U.data[0] + w * U.data[1]
        np.testing.assert_allclose(out.data[1], want, rtol=1e-12)


class TestParcelPropagationFacade:
    def test_signature_and_backward_labels(self):
        U, V, _, _, times = make_uv()
        x, y = parcel_propagation(U, V, timestep=-6 * 3600, propdim="time",
                                  verbose=False, return_traj=True,
                                  SETTLS_order=1, cyclic_xboundary=True)
        # Q2: labels are reversed for backward integration
        assert x.coords["time"][0] == times[-1]
        assert x.coords["time"][-1] == times[0]

    def test_plain_numpy_rejected_without_dims(self):
        with pytest.raises(TypeError):
            parcel_propagation(np.zeros((3, 4, 5)), np.zeros((3, 4, 5)))

    def test_traj_rejects_360day_calendar(self):
        """Trajectories cannot carry cftime.Datetime360Day labels
        (/root/reference/LCS/trajectory.py:129-130) — matched by type
        name so cftime stays an optional dependency."""
        class Datetime360Day:       # stand-in for cftime.Datetime360Day
            pass

        U, V, _, _, times = make_uv()
        t360 = np.array([Datetime360Day() for _ in times], dtype=object)
        U2 = Field(np.asarray(U.data), U.dims,
                   {**{k: U.coords[k] for k in ("latitude", "longitude")},
                    "time": t360}, name="u")
        V2 = Field(np.asarray(V.data), V.dims, dict(U2.coords), name="v")
        with pytest.raises(AssertionError, match="Datetime360Day"):
            parcel_propagation(U2, V2, timestep=6 * 3600, verbose=False,
                               return_traj=True, cyclic_xboundary=True)


class TestIsGlobal:
    def test_isglobal_regrids_and_truncates(self):
        # small global field: exercises common-grid regrid + T20 truncation
        cfg = dict(flows.VORTEX_CONFIG_SUBTROPICAL, nt=4)
        u, v, lats, lons, times = flows.ideal_vortex(**cfg)
        dims = ("time", "latitude", "longitude")
        coords = dict(time=times, latitude=lats, longitude=lons)
        out = LCS(timestep=-6 * 3600, SETTLS_order=1)(
            u=Field(u, dims, coords), v=Field(v, dims, coords),
            verbose=False, isglobal=True, truncation=10)
        # output lives on the reference's common 0.5-degree grid
        # (/root/reference/LCS/LCS.py:107-108)
        assert out.shape == (1, 360, 721)
        assert np.isfinite(out.data[0, 5:-5]).all()

    def test_isglobal_without_truncation(self):
        cfg = dict(flows.VORTEX_CONFIG_SUBTROPICAL, nt=4)
        u, v, lats, lons, times = flows.ideal_vortex(**cfg)
        dims = ("time", "latitude", "longitude")
        coords = dict(time=times, latitude=lats, longitude=lons)
        out = LCS(timestep=-6 * 3600)(
            u=Field(u, dims, coords), v=Field(v, dims, coords),
            verbose=False, isglobal=True, truncation=None)
        assert out.shape == (1, 360, 721)


class TestCompatModes:
    def test_corrected_norm_differs_from_quirk(self):
        from lagrangiancoherence_tpu.models.ftle import ftle_norm
        import jax.numpy as jnp
        rng = np.random.RandomState(0)
        tensor = jnp.asarray(rng.randn(9, 8, 10))
        quirk = np.asarray(ftle_norm(tensor, compat=True))
        fixed = np.asarray(ftle_norm(tensor, compat=False))
        assert not np.allclose(quirk, fixed)
        # corrected mode = true sigma_max of the 3x2 Jacobian
        t = np.asarray(tensor)
        F = np.stack([np.stack([t[0], t[2], t[4]]),
                      np.stack([t[1], t[3], t[5]])])  # (2, 3, ny, nx)
        for i in range(8):
            for j in range(10):
                sv = np.linalg.svd(F[:, :, i, j], compute_uv=False).max()
                np.testing.assert_allclose(fixed[i, j], sv, rtol=1e-10)

    def test_ridges_corrected_mode_runs(self):
        from lagrangiancoherence_tpu.models.ridges import find_ridges_core
        from lagrangiancoherence_tpu.grid import Grid
        import jax.numpy as jnp
        lats = np.linspace(-30, 40, 24)
        lons = np.linspace(-60, 20, 32)
        LON, LAT = np.meshgrid(lons, lats)
        f = 3.0 * np.exp(-((LAT - 5.0) / 8.0) ** 2)
        out = find_ridges_core(jnp.asarray(f), Grid(lats=lats, lons=lons),
                               sigma=1.0, isglobal=False, compat=False)
        assert np.isfinite(np.asarray(out["eigmin"])).all()


class TestProgressSignal:
    def test_per_step_progress_lines(self, caplog):
        """verbose=True emits one per-step progress line from inside the
        scan, as the reference's verboseprint does
        (/root/reference/LCS/trajectory.py:81)."""
        import logging

        import jax

        from lagrangiancoherence_tpu.utils.logging import logger

        nt, ny, nx = 4, 12, 16
        lats = np.linspace(-60, 60, ny)
        lons = np.linspace(-100, 50, nx)
        dims = ("time", "latitude", "longitude")
        coords = dict(time=pd.date_range("2020-01-01", periods=nt, freq="6h"),
                      latitude=lats, longitude=lons)
        u = Field(np.full((nt, ny, nx), 5.0), dims, coords)
        with caplog.at_level(logging.INFO, logger=logger.name):
            parcel_propagation(u, u, timestep=6 * 3600.0, verbose=True)
            jax.effects_barrier()
        lines = [r.message for r in caplog.records
                 if "Propagating time index" in r.message]
        assert len(lines) == nt - 1, lines
