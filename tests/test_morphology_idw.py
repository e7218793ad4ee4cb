"""Morphology / thresholding / component-filter / IDW tests
(SURVEY.md §2 rows: harvesine, Inverse_weighted_interpolation, xr_idx_interp,
plus the skimage surface the research driver uses)."""
import numpy as np
import pytest

from lagrangiancoherence_tpu.models.ridge_filter import (component_properties,
                                                         filter_ridges,
                                                         label_components)
from lagrangiancoherence_tpu.ops.idw import (haversine, idw_interpolate,
                                             idw_regrid)
from lagrangiancoherence_tpu.ops.morphology import (binary_dilation,
                                                    binary_erosion,
                                                    otsu_threshold,
                                                    skeletonize,
                                                    threshold_local)


class TestThresholds:
    def test_otsu_separates_bimodal(self):
        rng = np.random.RandomState(0)
        img = np.concatenate([rng.normal(0, .5, 5000),
                              rng.normal(10, .5, 5000)])
        t = otsu_threshold(img)
        # argmax over the flat between-class-variance plateau lands at the
        # left edge of the inter-mode gap (same first-max rule as skimage)
        assert 1 < t < 9

    def test_threshold_local_flags_local_peak(self):
        img = np.zeros((64, 64))
        img[30:34, 30:34] = 5.0
        thr = np.asarray(threshold_local(img, 31, offset=0.0))
        binary = img > thr
        assert binary[31, 31]
        assert not binary[5, 5]

    def test_threshold_local_mean_method(self):
        img = np.random.RandomState(1).rand(32, 32)
        thr = np.asarray(threshold_local(img, 9, method="mean", offset=0.1))
        # mean filter of a [0,1] field stays in [0,1]; offset shifts down
        assert thr.min() > -0.2 and thr.max() < 1.0

    def test_even_block_size_rejected(self):
        with pytest.raises(ValueError):
            threshold_local(np.zeros((8, 8)), 4)


class TestMorphology:
    def test_dilation_grows_erosion_shrinks(self):
        m = np.zeros((9, 9), bool)
        m[4, 4] = True
        d = np.asarray(binary_dilation(m))
        assert d.sum() == 5  # cross footprint
        d2 = np.asarray(binary_dilation(m, connectivity=2))
        assert d2.sum() == 9
        e = np.asarray(binary_erosion(d))
        assert e.sum() == 1 and e[4, 4]

    def test_dilation_does_not_wrap(self):
        m = np.zeros((5, 5), bool)
        m[0, 0] = True
        d = np.asarray(binary_dilation(m))
        assert not d[-1, 0] and not d[0, -1]

    def test_skeletonize_thins_thick_line(self):
        m = np.zeros((20, 20))
        m[8:12, 2:18] = 1.0  # 4-pixel-thick horizontal bar
        sk = np.asarray(skeletonize(m))
        assert sk.sum() > 0
        # thinned: at most ~1 pixel per column in the interior
        assert sk[:, 5:15].sum(axis=0).max() <= 2
        assert sk.sum() < m.sum() / 2

    def test_skeletonize_preserves_single_pixel_line(self):
        m = np.zeros((10, 10))
        m[5, 1:9] = 1.0
        sk = np.asarray(skeletonize(m))
        assert sk[5, 2:8].sum() >= 5  # interior of the line survives


class TestFilterRidges:
    def _mask(self):
        m = np.zeros((20, 20))
        m[2, 2:14] = 1.0           # long component (len 12)
        m[10:12, 5:7] = 1.0        # small blob (4 px)
        return m

    def test_filter_by_major_axis_length(self):
        m = self._mask()
        intensity = np.ones_like(m)
        out = filter_ridges(m, intensity, ["major_axis_length"], [8.0])
        assert np.nansum(out[2]) == 12          # long ridge kept
        assert np.isnan(out[10:12, 5:7]).all()  # blob dropped

    def test_filter_by_mean_intensity(self):
        m = self._mask()
        intensity = np.zeros_like(m)
        intensity[2] = 5.0  # only the long ridge is intense
        out = filter_ridges(m, intensity, ["mean_intensity"], [1.0])
        assert np.nansum(out[2]) == 12
        assert np.isnan(out[10:12, 5:7]).all()

    def test_unknown_criterion_raises(self):
        with pytest.raises(ValueError):
            filter_ridges(self._mask(), self._mask(), ["nope"], [1.0])

    def test_component_properties_area(self):
        labels, n = label_components(self._mask())
        assert n == 2
        props = component_properties(labels, n, self._mask())
        assert sorted(props["area"]) == [4, 12]


class TestIDW:
    def test_haversine_known_distance(self):
        # 1 degree of longitude at the equator ~ 111.3 km (equatorial radius)
        d = float(haversine(0.0, 0.0, 1.0, 0.0))
        assert abs(d - 6378.1 * np.pi / 180) < 0.5

    def test_idw_exactly_recovers_constant(self):
        rng = np.random.RandomState(0)
        x = rng.uniform(-10, 10, 50); y = rng.uniform(-10, 10, 50)
        z = np.full(50, 3.25)
        out = np.asarray(idw_interpolate(x, y, z, np.array([0.0]),
                                         np.array([0.0])))
        np.testing.assert_allclose(out, 3.25, rtol=1e-12)

    def test_idw_regrid_shape_and_locality(self):
        x = np.array([-5.0, 5.0]); y = np.array([0.0, 0.0])
        z = np.array([0.0, 10.0])
        lats = np.linspace(-2, 2, 5); lons = np.linspace(-8, 8, 17)
        out = idw_regrid(x, y, z, lons, lats)
        assert out.shape == (5, 17)
        assert out[2, 1] < 2.0 and out[2, -2] > 8.0  # near each sample
