"""FTLE time-series runner tests (the animation workload, SURVEY.md §5)."""
import os

import jax
import numpy as np
import pandas as pd
import pytest

from lagrangiancoherence_tpu.field import Field
from lagrangiancoherence_tpu.grid import Grid
from lagrangiancoherence_tpu.models.pipeline import ftle_pipeline
from lagrangiancoherence_tpu.runners import ftle_series, ftle_series_to_files
from lagrangiancoherence_tpu.testing import flows


def wind_fields(nt=12):
    cfg = dict(flows.VORTEX_CONFIG_SUBTROPICAL, nt=nt)
    u, v, lats, lons, times = flows.ideal_vortex(**cfg)
    dims = ("time", "latitude", "longitude")
    coords = dict(time=times, latitude=lats, longitude=lons)
    return (Field(u, dims, coords, name="u"),
            Field(v, dims, coords, name="v"), u, v, lats, lons, times)


class TestFtleSeries:
    def test_windows_match_single_runs(self):
        U, V, u, v, lats, lons, times = wind_fields()
        import jax.numpy as jnp
        grid = Grid(lats=lats, lons=lons, cyclic_x=True)
        series = ftle_series(U, V, -6 * 3600.0, window=5, stride=3,
                             settls_order=1, batch=2)
        starts = [0, 3, 6]
        assert series.shape[0] == len(starts)
        for i, s in enumerate(starts):
            ref = np.asarray(ftle_pipeline(
                jnp.asarray(u[s:s + 5]), jnp.asarray(v[s:s + 5]),
                -6 * 3600.0, grid, settls_order=1))
            np.testing.assert_allclose(series.data[i], ref, atol=1e-10)
            # backward run stamps the window's first time (LCS.py:158)
            assert series.coords["time"][i] == times[s]

    def test_forward_stamps_last(self):
        U, V, *_, times = wind_fields()
        series = ftle_series(U, V, 6 * 3600.0, window=5, stride=5,
                             settls_order=0)
        assert series.coords["time"][0] == times[4]

    def test_sharded_batch(self):
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        from lagrangiancoherence_tpu.parallel.mesh import batch_mesh
        U, V, *_ = wind_fields()
        a = ftle_series(U, V, -6 * 3600.0, window=5, stride=2,
                        settls_order=1, batch=4, mesh=batch_mesh(4))
        b = ftle_series(U, V, -6 * 3600.0, window=5, stride=2,
                        settls_order=1, batch=4)
        np.testing.assert_allclose(a.data, b.data, atol=1e-10)

    def test_too_short_record_raises(self):
        U, V, *_ = wind_fields(nt=4)
        with pytest.raises(ValueError):
            ftle_series(U, V, -6 * 3600.0, window=10)


class TestStreaming:
    def test_idempotent_files(self, tmp_path):
        pytest.importorskip("h5py")
        U, V, *_ = wind_fields()
        out = str(tmp_path / "anim")
        w1 = ftle_series_to_files(U, V, -6 * 3600.0, out, window=5,
                                  stride=5, settls_order=0)
        assert len(w1) == 2
        assert all(os.path.exists(p) for p in w1)
        # second run skips everything (crash-recovery contract)
        w2 = ftle_series_to_files(U, V, -6 * 3600.0, out, window=5,
                                  stride=5, settls_order=0)
        assert w2 == []
