"""Field container + HDF5/netCDF IO round-trip tests (SURVEY.md §5
checkpoint/resume: idempotent per-timestamp outputs)."""
import numpy as np
import pandas as pd
import pytest

from lagrangiancoherence_tpu.field import Field, as_field
from lagrangiancoherence_tpu.utils.io import (open_dataarray, open_dataset,
                                              save_dataset, save_field)


def make_field():
    times = pd.date_range("2001-06-01", periods=4, freq="6h").values
    lats = np.linspace(-30, 30, 7)
    lons = np.linspace(-60, 60, 13)
    rng = np.random.RandomState(0)
    return Field(rng.randn(4, 7, 13), ("time", "latitude", "longitude"),
                 dict(time=times, latitude=lats, longitude=lons), name="u")


class TestField:
    def test_sortby_descending_inputs(self):
        f = make_field()
        flipped = Field(f.data[:, ::-1], f.dims,
                        {**f.coords, "latitude": f.coords["latitude"][::-1]})
        np.testing.assert_array_equal(flipped.sortby("latitude").data, f.data)

    def test_sel_slice_and_nearest(self):
        f = make_field()
        sub = f.sel(latitude=slice(-10, 10))
        assert sub.coords["latitude"].min() >= -10
        snap = f.sel(latitude=1.0)
        assert "latitude" not in snap.dims

    def test_isel_scalar_drops_dim(self):
        f = make_field()
        assert f.isel(time=0).dims == ("latitude", "longitude")

    def test_transpose_roundtrip(self):
        f = make_field()
        g = f.transpose("longitude", "time", "latitude")
        assert g.shape == (13, 4, 7)
        np.testing.assert_array_equal(
            g.transpose("time", "latitude", "longitude").data, f.data)

    def test_expand_dims_with_coord(self):
        f = make_field().isel(time=0)
        g = f.expand_dims("time", coord=np.datetime64("2001-06-01"))
        assert g.shape == (1, 7, 13)

    def test_arithmetic_preserves_labels(self):
        f = make_field()
        g = (f * 2 - f) / 1.0
        np.testing.assert_allclose(g.data, f.data)
        assert g.dims == f.dims

    def test_as_field_passthrough_and_errors(self):
        f = make_field()
        assert as_field(f) is f
        with pytest.raises(TypeError):
            as_field(np.zeros((2, 2)))

    def test_mismatched_coord_raises(self):
        with pytest.raises(ValueError):
            Field(np.zeros((3, 4)), ("a", "b"), {"a": np.arange(5)})


class TestIO:
    def test_roundtrip(self, tmp_path):
        pytest.importorskip("h5py")
        f = make_field()
        path = str(tmp_path / "test.nc")
        assert save_field(f, path)
        g = open_dataarray(path)
        np.testing.assert_allclose(g.data, f.data)
        assert g.dims == f.dims
        np.testing.assert_array_equal(
            pd.to_datetime(g.coords["time"]).values, f.coords["time"])
        np.testing.assert_allclose(g.coords["latitude"], f.coords["latitude"])

    def test_skip_if_exists(self, tmp_path):
        pytest.importorskip("h5py")
        f = make_field()
        path = str(tmp_path / "out.nc")
        assert save_field(f, path) is True
        assert save_field(f, path, skip_if_exists=True) is False

    def test_multi_var_dataset(self, tmp_path):
        pytest.importorskip("h5py")
        f = make_field()
        g = f.copy(); g.name = "v"
        path = str(tmp_path / "ds.nc")
        save_dataset({"u": f, "v": g}, path)
        ds = open_dataset(path)
        assert set(ds) == {"u", "v"}


class TestDebugUtils:
    def test_checked_ftle_flags_nan_winds(self):
        from lagrangiancoherence_tpu.grid import Grid
        from lagrangiancoherence_tpu.utils.debug import checked_ftle
        from lagrangiancoherence_tpu.testing import flows
        cfg = dict(flows.SADDLE_CONFIG, nt=3)
        u, v, lats, lons, _ = flows.ideal_saddle(**cfg)
        grid = Grid(lats=lats, lons=lons)
        err, out = checked_ftle(u, v, -21600.0, grid, settls_order=0)
        err.throw()  # clean input: no error
        u_bad = u.copy()
        u_bad[1, 5, 5] = np.nan
        err, out = checked_ftle(u_bad, v, -21600.0, grid, settls_order=0)
        with pytest.raises(Exception, match="non-finite"):
            err.throw()

    def test_nan_debug_toggles_flag(self):
        import jax
        from lagrangiancoherence_tpu.utils.debug import nan_debug
        before = jax.config.jax_debug_nans
        with nan_debug():
            assert jax.config.jax_debug_nans
        assert jax.config.jax_debug_nans == before
