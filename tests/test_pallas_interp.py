"""Pallas interpolation kernel parity (interpret mode on CPU, f64) against
the XLA gather path — must agree to machine precision, including quirk-Q4
fold semantics, wrap-straddling tiles, pole clamps, mirror-edge taps, the
polar full-x band, and the overflow-retry pass."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lagrangiancoherence_tpu.ops.interp import (interp_at_parcels_multi,
                                                prefilter)
from lagrangiancoherence_tpu.ops.pallas_interp import (pad_coeffs_for_pallas,
                                                       pallas_interp_multi)


def run_case(ny, nx, order, F, band, retry, wy=48, wx=256, seed=0,
             displacement="smooth", engine="blockspec"):
    rng = np.random.RandomState(seed)
    lats = np.linspace(-90, 90, ny)
    lons = np.linspace(-180, 180 - 360 / nx, nx)
    fields = rng.randn(F, ny, nx)
    coeffs = np.asarray(prefilter(jnp.asarray(fields), order=order))
    px0, py0 = np.meshgrid(lons, lats)
    if displacement == "smooth":
        px = px0 + 15 * np.sin(py0 / 30) + 3
        py = np.clip(py0 + 10 * np.cos(px0 / 40), -90, 90)
    elif displacement == "whirl":
        # full-circle zonal decorrelation (the flagship's polar whirl
        # band): x spans the whole period -> full-longitude slab tiers,
        # with plenty of parcels landing in the mirror-remap edge zones
        px = px0 + 700 * np.sin(py0 / 7) * np.cos(px0 / 11)
        py = np.clip(py0 + 4 * np.sin(px0 / 20), -90, 90)
    else:  # violent shear: exercises the retry pass
        px = px0 + 120 * np.sin(py0 / 10) * np.cos(px0 / 15)
        py = np.clip(py0 + 60 * np.sin(px0 / 20), -90, 90)
    px = np.where(px > 180, -180 + (px % 180), px)
    px = np.where(px < -180, px % 180, px)
    ref = np.asarray(interp_at_parcels_multi(
        jnp.asarray(fields), jnp.asarray(coeffs), jnp.asarray(px),
        jnp.asarray(py), x_min=lons.min(), x_max=lons.max(),
        y_min=lats.min(), y_max=lats.max(), order=order))
    cw_pad = pad_coeffs_for_pallas(jnp.asarray(coeffs))
    out, flag = pallas_interp_multi(
        jnp.asarray(fields), cw_pad, jnp.asarray(px), jnp.asarray(py),
        ny=ny, nx=nx, y_min=lats.min(), y_max=lats.max(),
        x_min=lons.min(), x_max=lons.max(), order=order, wy=wy, wx=wx,
        retry_tiles=retry, engine=engine, interpret=True)
    return np.asarray(out), int(flag), ref


class TestPallasParity:
    @pytest.mark.parametrize("order,F", [(3, 4), (3, 2), (1, 2)])
    def test_smooth_displacement_exact(self, order, F):
        out, flag, ref = run_case(73, 144, order, F, band=2, retry=8)
        assert flag == 0
        np.testing.assert_allclose(out, ref, atol=1e-11)

    def test_wrap_straddling_and_poles(self):
        out, flag, ref = run_case(89, 180, 3, 4, band=3, retry=8)
        assert flag == 0
        np.testing.assert_allclose(out, ref, atol=1e-11)

    def test_violent_shear_triggers_retry_but_stays_exact(self):
        out, flag, ref = run_case(73, 144, 3, 2, band=2, retry=20,
                                  displacement="shear", wy=32, wx=256)
        assert flag == 0, "retry pass should absorb the overflow"
        np.testing.assert_allclose(out, ref, atol=1e-11)

    def test_overflow_flag_raised_without_retry(self):
        out, flag, ref = run_case(73, 144, 3, 2, band=0, retry=0,
                                  displacement="shear", wy=16, wx=256)
        assert flag != 0  # diagnostic bitmask; nonzero == clamped

    def test_single_tile_grid(self):
        out, flag, ref = run_case(16, 128, 3, 2, band=1, retry=4)
        assert flag == 0
        np.testing.assert_allclose(out, ref, atol=1e-11)

    def test_full_circle_whirl_exact(self):
        """Tiles whose zonal taps span the whole period route to the
        full-longitude slab tiers, which read the mirror-baked copy —
        must stay exact, including parcels in the mirror edge zones."""
        out, flag, ref = run_case(73, 144, 3, 2, band=2, retry=256,
                                  displacement="whirl", wy=32, wx=256)
        assert flag == 0
        np.testing.assert_allclose(out, ref, atol=1e-11)

    def test_tall_grid_pole_blocks_fit(self):
        """ny far larger than the pole slab heights: the north and south
        pole candidate rows must be routed as SEPARATE blocks — a combined
        block's direct y span covers the whole field and can never fit a
        window (caught only at flagship scale on real TPU otherwise)."""
        out, flag, ref = run_case(241, 256, 3, 2, band=2, retry=8)
        assert flag == 0
        np.testing.assert_allclose(out, ref, atol=1e-11)


class TestPallasInScan:
    def test_propagation_pallas_matches_xla(self):
        """End-to-end scan with the pallas kernel (interpret mode) ==
        the XLA gather path, including trajectories."""
        from lagrangiancoherence_tpu.grid import Grid
        from lagrangiancoherence_tpu.models.settls import \
            parcel_propagation_core
        import lagrangiancoherence_tpu.ops.pallas_interp as PI
        from lagrangiancoherence_tpu.testing import flows

        cfg = dict(flows.VORTEX_CONFIG_SUBTROPICAL, nt=4)
        u, v, lats, lons, _ = flows.ideal_vortex(**cfg)
        grid = Grid(lats=lats, lons=lons, cyclic_x=True)
        orig = PI.pallas_interp_multi
        PI.pallas_interp_multi = \
            lambda *a, **k: orig(*a, **{**k, "interpret": True})
        try:
            tx, ty, fl = parcel_propagation_core(
                jnp.asarray(u), jnp.asarray(v), -6 * 3600.0, grid,
                settls_order=1, return_traj=True, kernel="pallas",
                return_overflow=True)
        finally:
            PI.pallas_interp_multi = orig
        rx, ry = parcel_propagation_core(
            jnp.asarray(u), jnp.asarray(v), -6 * 3600.0, grid,
            settls_order=1, return_traj=True)
        assert int(fl) == 0
        np.testing.assert_allclose(np.asarray(tx), np.asarray(rx),
                                   atol=1e-11)
        np.testing.assert_allclose(np.asarray(ty), np.asarray(ry),
                                   atol=1e-11)


class TestPoleHoist:
    def test_hoisted_pole_loop_is_bit_identical(self, monkeypatch):
        """The hoisted per-step pole loop (models/settls.py: sort the
        pole-home rows once per step, iterate them in sorted flat layout
        via pole_block=True/pole_presorted=True, skip_pole on the main
        gathers) must reproduce the per-group pole machinery exactly —
        it is a pure restructuring of where the same evaluations run."""
        import jax

        from lagrangiancoherence_tpu.grid import Grid
        from lagrangiancoherence_tpu.models.settls import \
            parcel_propagation_core
        import lagrangiancoherence_tpu.ops.pallas_interp as PI

        ny, nx = 33, 96
        lats = np.linspace(-90.0, 90.0, ny)
        lons = np.linspace(-180.0, 180.0 - 360.0 / nx, nx)
        grid = Grid(lats=lats, lons=lons, cyclic_x=True)
        LON, LAT = np.meshgrid(np.deg2rad(lons), np.deg2rad(lats))
        nt = 4
        t = np.arange(nt)[:, None, None]
        u = jnp.asarray((20.0 * np.cos(LAT) + 2.0 * np.cos(3 * LON)
                         * np.sin(2 * LAT))[None] * (1 + 0.05 * np.sin(t)))
        v = jnp.asarray((2.0 * np.sin(3 * LON) * np.cos(2 * LAT))[None]
                        * (1 + 0.05 * np.cos(t)))
        orig = PI.pallas_interp_multi
        PI.pallas_interp_multi = \
            lambda *a, **k: orig(*a, **{**k, "interpret": True})
        try:
            res = {}
            for hp in ("1", "0"):
                monkeypatch.setenv("LCS_POLE_HOIST", hp)
                jax.clear_caches()   # LCS_POLE_HOIST is read at trace time
                res[hp] = parcel_propagation_core(
                    u, v, -6 * 3600.0, grid, settls_order=2,
                    kernel="pallas", return_overflow=True)
            px1, py1, fl1 = res["1"]
            px0, py0, fl0 = res["0"]
        finally:
            PI.pallas_interp_multi = orig
        assert int(fl1) == int(fl0) == 0
        np.testing.assert_array_equal(np.asarray(px1), np.asarray(px0))
        np.testing.assert_array_equal(np.asarray(py1), np.asarray(py0))


class TestShardSortBin:
    def test_shard_sort_is_layout_invariant(self):
        """Sharded-block sort-binning (models/settls.py _sort_bin_shard):
        sorting a home_rows block's polar groups into spatial-tile storage
        order is a pure layout permutation — the scan with rebin='sort'
        must reproduce rebin=False on the same block to f64 rounding, with
        pole-home and non-polar groups left pinned."""
        from lagrangiancoherence_tpu.grid import Grid
        from lagrangiancoherence_tpu.models.settls import settls_scan
        from lagrangiancoherence_tpu.ops.interp import prefilter
        import lagrangiancoherence_tpu.ops.pallas_interp as PI

        ny, nx = 33, 96
        lats = np.linspace(-90.0, 90.0, ny)
        lons = np.linspace(-180.0, 180.0 - 360.0 / nx, nx)
        grid = Grid(lats=lats, lons=lons, cyclic_x=True)
        LON, LAT = np.meshgrid(np.deg2rad(lons), np.deg2rad(lats))
        nt = 3
        t = np.arange(nt)[:, None, None]
        u = jnp.asarray((20.0 * np.cos(LAT) + 2.0 * np.cos(3 * LON)
                         * np.sin(2 * LAT))[None] * (1 + 0.05 * np.sin(t)))
        v = jnp.asarray((2.0 * np.sin(3 * LON) * np.cos(2 * LAT))[None]
                        * (1 + 0.05 * np.cos(t)))
        cu, cv = prefilter(u, order=3), prefilter(v, order=3)

        # a 16-row block holding the south polar band (home rows 0..15):
        # group 0 has pole-home rows (pinned), group 1 is sortable
        rows = slice(0, 16)
        home = jnp.arange(16, dtype=jnp.int32)[:, None]
        px0, py0 = grid.mesh_xy
        conv_y = 180.0 / (6371000.0 * np.pi)
        convx = jnp.asarray(
            conv_y / np.abs(np.cos(np.deg2rad(lats[rows])))[:, None])
        orig = PI.pallas_interp_multi
        PI.pallas_interp_multi = \
            lambda *a, **k: orig(*a, **{**k, "interpret": True})
        try:
            res = {}
            for rb in ("sort", False):
                res[rb] = settls_scan(
                    u, v, cu, cv, jnp.asarray(px0[rows]),
                    jnp.asarray(py0[rows]), jnp.asarray(-6 * 3600.0,
                                                        u.dtype),
                    convx, grid, settls_order=1, interp_order=3,
                    return_traj=False, home_rows=home, kernel="pallas",
                    rebin=rb)
        finally:
            PI.pallas_interp_multi = orig
        px_s, py_s, fl_s = res["sort"]
        px_n, py_n, fl_n = res[False]
        assert int(fl_s) == int(fl_n) == 0
        np.testing.assert_allclose(np.asarray(px_s), np.asarray(px_n),
                                   atol=1e-11)
        np.testing.assert_allclose(np.asarray(py_s), np.asarray(py_n),
                                   atol=1e-11)


class TestRegionalGrid:
    def test_non_global_domain_exact(self):
        """Regional (non-cyclic-physics) grid: the scipy wrap-fold semantics
        apply regardless (the reference's interpolator always uses
        isglobal=True internally — /root/reference/LCS/LCS.py:129 defaults),
        so the pallas path must match on regional domains too."""
        out, flag, ref = run_case_grid(
            lats=np.linspace(-40.0, 15.0, 56),
            lons=np.linspace(-90.0, -32.0, 117),
            order=3, F=4)
        assert flag == 0
        np.testing.assert_allclose(out, ref, atol=1e-11)


def run_case_grid(lats, lons, order, F, seed=0):
    rng = np.random.RandomState(seed)
    ny, nx = lats.size, lons.size
    fields = rng.randn(F, ny, nx)
    coeffs = np.asarray(prefilter(jnp.asarray(fields), order=order))
    px0, py0 = np.meshgrid(lons, lats)
    px = np.clip(px0 + 2.5 * np.sin(py0 / 10), lons.min(), lons.max())
    py = np.clip(py0 - 1.5 * np.cos(px0 / 15), lats.min(), lats.max())
    ref = np.asarray(interp_at_parcels_multi(
        jnp.asarray(fields), jnp.asarray(coeffs), jnp.asarray(px),
        jnp.asarray(py), x_min=lons.min(), x_max=lons.max(),
        y_min=lats.min(), y_max=lats.max(), order=order))
    cw_pad = pad_coeffs_for_pallas(jnp.asarray(coeffs))
    out, flag = pallas_interp_multi(
        jnp.asarray(fields), cw_pad, jnp.asarray(px), jnp.asarray(py),
        ny=ny, nx=nx, y_min=lats.min(), y_max=lats.max(),
        x_min=lons.min(), x_max=lons.max(), order=order,
        wy=48, wx=384, retry_tiles=8, interpret=True)
    return np.asarray(out), int(flag), ref


class TestSortBinning:
    def test_sort_mode_is_layout_invariant(self):
        """Polar sort-binning (models/settls.py _sort_bin_bands) is a pure
        storage permutation carried through the scan and inverted on exit:
        final positions must match the unbinned scan to f64 rounding on a
        polar-whirl flow that engages the bands."""
        from lagrangiancoherence_tpu.grid import Grid
        from lagrangiancoherence_tpu.models import settls
        from lagrangiancoherence_tpu.models.settls import \
            parcel_propagation_core
        import lagrangiancoherence_tpu.ops.pallas_interp as PI

        # 97 rows: with the 8-aligned band starts (ADVICE round-1), the
        # south band needs >= 16 rows below -60 deg to survive truncation
        ny, nx = 97, 128
        lats = np.linspace(-90.0, 90.0, ny)
        lons = np.linspace(-180.0, 180.0 - 360.0 / nx, nx)
        grid = Grid(lats=lats, lons=lons, cyclic_x=True)
        bands = settls._sort_bands(grid, 3)
        assert bands, "test grid must have bands"
        for r0, nr in bands:
            assert r0 % 8 == 0 and nr % 8 == 0, bands
        LON, LAT = np.meshgrid(np.deg2rad(lons), np.deg2rad(lats))
        nt = 4
        t = np.arange(nt)[:, None, None]
        u = jnp.asarray((20.0 * np.cos(LAT) + 2.0 * np.cos(3 * LON)
                         * np.sin(2 * LAT))[None] * (1 + 0.05 * np.sin(t)))
        v = jnp.asarray((2.0 * np.sin(3 * LON) * np.cos(2 * LAT))[None]
                        * (1 + 0.05 * np.cos(t)))

        orig = PI.pallas_interp_multi
        PI.pallas_interp_multi = \
            lambda *a, **k: orig(*a, **{**k, "interpret": True})
        try:
            res = {}
            for rb in ("sort", False):
                res[rb] = parcel_propagation_core(
                    u, v, -6 * 3600.0, grid, settls_order=1,
                    kernel="pallas", rebin=rb, return_traj=False,
                    return_overflow=True)
        finally:
            PI.pallas_interp_multi = orig
        px_s, py_s, fl_s = res["sort"]
        px_n, py_n, fl_n = res[False]
        np.testing.assert_allclose(np.asarray(px_s), np.asarray(px_n),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(py_s), np.asarray(py_n),
                                   atol=1e-12)
        assert int(fl_s) == 0 and int(fl_n) == 0

    def test_sort_mode_return_traj_layout_invariant(self):
        """Sort mode with return_traj=True: every stored step must come
        out in home-storage layout (the per-step _unsort_bands emission in
        settls_scan), matching the unbinned trajectory to f64 rounding."""
        from lagrangiancoherence_tpu.grid import Grid
        from lagrangiancoherence_tpu.models import settls
        from lagrangiancoherence_tpu.models.settls import \
            parcel_propagation_core
        import lagrangiancoherence_tpu.ops.pallas_interp as PI

        ny, nx = 97, 128
        lats = np.linspace(-90.0, 90.0, ny)
        lons = np.linspace(-180.0, 180.0 - 360.0 / nx, nx)
        grid = Grid(lats=lats, lons=lons, cyclic_x=True)
        assert settls._sort_bands(grid, 3)
        LON, LAT = np.meshgrid(np.deg2rad(lons), np.deg2rad(lats))
        nt = 4
        t = np.arange(nt)[:, None, None]
        u = jnp.asarray((20.0 * np.cos(LAT) + 2.0 * np.cos(3 * LON)
                         * np.sin(2 * LAT))[None] * (1 + 0.05 * np.sin(t)))
        v = jnp.asarray((2.0 * np.sin(3 * LON) * np.cos(2 * LAT))[None]
                        * (1 + 0.05 * np.cos(t)))

        orig = PI.pallas_interp_multi
        PI.pallas_interp_multi = \
            lambda *a, **k: orig(*a, **{**k, "interpret": True})
        try:
            res = {}
            for rb in ("sort", False):
                res[rb] = parcel_propagation_core(
                    u, v, -6 * 3600.0, grid, settls_order=1,
                    kernel="pallas", rebin=rb, return_traj=True,
                    return_overflow=True)
        finally:
            PI.pallas_interp_multi = orig
        tx_s, ty_s, fl_s = res["sort"]
        tx_n, ty_n, fl_n = res[False]
        assert tx_s.shape == (nt, ny, nx)
        np.testing.assert_allclose(np.asarray(tx_s), np.asarray(tx_n),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(ty_s), np.asarray(ty_n),
                                   atol=1e-12)
        assert int(fl_s) == 0 and int(fl_n) == 0

    def test_to_tile_storage_tiles_hold_consecutive_ranks(self):
        """_to_tile_storage maps rank r to storage so that every kernel
        tile ((8,128) block of the (rows, nx) grid, last x-tile partial)
        holds one consecutive rank run — the property the sort-binning
        locality argument rests on."""
        from lagrangiancoherence_tpu.models.settls import _to_tile_storage

        nr, nx = 16, 320   # 2 tile rows, x tiles: 128,128,64(partial)
        flat = jnp.arange(nr * nx, dtype=jnp.int32)
        st = np.asarray(_to_tile_storage(flat, nr, nx))
        assert sorted(st.ravel().tolist()) == list(range(nr * nx))
        for i in range(nr // 8):
            for j, (c0, c1) in enumerate([(0, 128), (128, 256), (256, 320)]):
                blk = st[8 * i:8 * i + 8, c0:c1].ravel()
                assert blk.max() - blk.min() == blk.size - 1, (i, j)


class TestFoldBoundary:
    def test_last_column_exact_under_jit(self):
        """Regression: the grid's own last column scales to index n
        (fold 1-ulp-below-1 under jit-fused arithmetic); the float
        mod-unwrap then rounded across an integer for mid-tile anchors,
        desynchronising floor(unwrap) from the fold-decided mirror
        branches (~1e-2 silent error at the wrap seam).  Tap floors are
        now integer-exact (floor(fold) + n*k); this pins it, jitted,
        with A-sub engaged."""
        from lagrangiancoherence_tpu.ops.interp import (
            prefilter, interp_at_parcels_multi)
        from lagrangiancoherence_tpu.ops.pallas_interp import (
            pad_coeffs_for_pallas, pallas_interp_multi)

        ny, nx = 16, 128
        lats = np.linspace(-90.0, 90.0, ny)
        lons = np.linspace(-180.0, 180.0 - 360.0 / nx, nx)
        LON, LAT = np.meshgrid(np.deg2rad(lons), np.deg2rad(lats))
        u = 20.0 * np.cos(LAT) + 2.0 * np.cos(3 * LON) * np.sin(2 * LAT)
        raw = jnp.asarray(np.stack([u, 0.5 * u]))
        bounds = dict(y_min=lats[0], y_max=lats[-1],
                      x_min=lons[0], x_max=lons[-1])
        px = jnp.asarray(np.broadcast_to(lons, (ny, nx)).copy())
        py = jnp.asarray(np.broadcast_to(lats[:, None], (ny, nx)).copy())

        @jax.jit
        def pallas_path(raw, px, py):
            cw = prefilter(raw, order=3)
            cwp = pad_coeffs_for_pallas(cw)
            return pallas_interp_multi(raw, cwp, px, py, ny=ny, nx=nx,
                                       order=3, **bounds, wy=32,
                                       interpret=True)[0]

        @jax.jit
        def xla_path(raw, px, py):
            cw = prefilter(raw, order=3)
            return interp_at_parcels_multi(raw, cw, px, py, order=3,
                                           **bounds)

        got = np.asarray(pallas_path(raw, px, py))
        want = np.asarray(xla_path(raw, px, py))
        np.testing.assert_allclose(got, want, atol=1e-12)


class TestDmaEngine:
    """The manual-DMA escalation engine (engine='dma') must be
    bit-identical to the BlockSpec tier pipeline: same routing, same tile
    bodies — only the DMA/launch machinery differs (one grid step,
    fori_loop over live slots, double-buffered make_async_copy windows,
    in-place aliased output)."""

    @pytest.mark.parametrize("displacement", ["smooth", "violent", "whirl"])
    @pytest.mark.parametrize("eng", ["dma", "dma-all"])
    def test_engine_matches_blockspec(self, displacement, eng):
        out_b, flag_b, ref = run_case(64, 256, 3, 2, 2, 256,
                                      displacement=displacement)
        out_d, flag_d, _ = run_case(64, 256, 3, 2, 2, 256,
                                    displacement=displacement,
                                    engine=eng)
        assert flag_d == flag_b == 0
        np.testing.assert_array_equal(out_d, out_b)
        np.testing.assert_allclose(out_d, ref, atol=1e-10)

    def test_engine_order1(self):
        out_d, flag_d, ref = run_case(48, 128, 1, 3, 2, 256,
                                      displacement="violent", engine="dma")
        assert flag_d == 0
        np.testing.assert_allclose(out_d, ref, atol=1e-10)

    def test_engine_in_scan(self):
        """End-to-end SETTLS scan with the engine vs the XLA kernel."""
        from lagrangiancoherence_tpu.grid import Grid
        from lagrangiancoherence_tpu.models.settls import \
            parcel_propagation_core

        ny, nx = 48, 128
        lats = np.linspace(-90.0, 90.0, ny)
        lons = np.linspace(-180.0, 180.0 - 360.0 / nx, nx)
        grid = Grid(lats=lats, lons=lons, cyclic_x=True)
        LON, LAT = np.meshgrid(np.deg2rad(lons), np.deg2rad(lats))
        nt = 3
        t = np.arange(nt)[:, None, None]
        u = 25.0 * np.cos(LAT)[None] * (1 + 0.1 * np.sin(t))
        v = (5.0 * np.sin(3 * LON) * np.cos(LAT))[None] \
            * (1 + 0.1 * np.cos(t))
        import lagrangiancoherence_tpu.ops.pallas_interp as PI
        want = parcel_propagation_core(jnp.asarray(u), jnp.asarray(v),
                                       -6 * 3600.0, grid, settls_order=2,
                                       kernel="xla", return_overflow=True)
        orig = PI.pallas_interp_multi
        PI.pallas_interp_multi = \
            lambda *a, **k: orig(*a, **{**k, "interpret": True})
        try:
            got = parcel_propagation_core(
                jnp.asarray(u, jnp.float64), jnp.asarray(v, jnp.float64),
                -6 * 3600.0, grid, settls_order=2, kernel="pallas",
                pallas_engine="dma", return_overflow=True)
        finally:
            PI.pallas_interp_multi = orig
        assert int(got[2]) == 0
        np.testing.assert_allclose(np.asarray(got[0]),
                                   np.asarray(want[0]), atol=1e-9)
        np.testing.assert_allclose(np.asarray(got[1]),
                                   np.asarray(want[1]), atol=1e-9)


    def test_engine_auto_resolves_default(self, monkeypatch):
        """pallas_engine='auto' resolves to ops.pallas_interp.DEFAULT_ENGINE
        — the one-line flip point once the on-device A/B picks a winner."""
        import lagrangiancoherence_tpu.ops.pallas_interp as PI
        seen = {}
        orig = PI.resolve_engine

        def spy(e):
            seen["engine"] = orig(e)
            return seen["engine"]

        monkeypatch.setattr(PI, "resolve_engine", spy)
        out, flag, ref = run_case(64, 256, 3, 2, 2, 256, engine="auto")
        assert seen["engine"] == PI.DEFAULT_ENGINE
        assert flag == 0
        np.testing.assert_allclose(out, ref, atol=1e-10)

    @pytest.mark.parametrize("displacement", ["smooth", "violent", "whirl"])
    @pytest.mark.parametrize("K", ["2", "4"])
    def test_engine_unrolled_matches_serial(self, displacement, K,
                                            monkeypatch):
        """LCS_ENGINE_UNROLL=K (K slots per loop iteration, block double
        buffering) is a pure scheduling change — results must be
        bit-identical to the serial engine across every tier shape the
        displacement spectra exercise."""
        out_s, flag_s, ref = run_case(64, 256, 3, 2, 2, 256,
                                      displacement=displacement,
                                      engine="dma-all")
        monkeypatch.setenv("LCS_ENGINE_UNROLL", K)
        out_u, flag_u, _ = run_case(64, 256, 3, 2, 2, 256,
                                    displacement=displacement,
                                    engine="dma-all")
        assert flag_u == flag_s == 0
        np.testing.assert_array_equal(out_u, out_s)
        np.testing.assert_allclose(out_u, ref, atol=1e-10)

    def test_engine_unrolled_partial_tail(self, monkeypatch):
        """Live counts that are not a multiple of K exercise the gated
        tail slots (engine='dma' keeps the counts small and ragged)."""
        monkeypatch.setenv("LCS_ENGINE_UNROLL", "4")
        out_u, flag_u, ref = run_case(73, 144, 3, 2, 2, 256,
                                      displacement="shear", engine="dma")
        assert flag_u == 0
        np.testing.assert_allclose(out_u, ref, atol=1e-10)

    @pytest.mark.parametrize("eng", ["dma", "dma-all"])
    def test_engine_partial_and_tall_grids(self, eng):
        """Partial last x-tile (nx % 128 != 0) and tall grids through the
        engine — out-tile DMA offsets and the pseudo-tier masks must
        respect the padded tiling."""
        for (ny, nx, disp) in [(73, 144, "shear"), (241, 256, "whirl")]:
            out, flag, ref = run_case(ny, nx, 3, 2, 2, 256,
                                      displacement=disp, engine=eng)
            assert flag == 0, (ny, nx, disp)
            np.testing.assert_allclose(out, ref, atol=1e-10,
                                       err_msg=f"{ny}x{nx} {disp}")


class TestPadCoeffsLayout:
    def test_slab_stack_matches_index_oracle(self):
        """pad_coeffs_for_pallas builds the 5-slab stack purely from
        slices (the jnp.take mirror slab and the x-padded intermediate
        were removed — two full-HBM passes per field on the ~6.5 GB
        flagship stack, ROUND5_NOTES).  Pin the layout contract against
        a direct index-arithmetic oracle: copy c holds
        ty[(j + c*X_GRAN - xpad) mod nx] and the mirror slab bakes
        scipy's at-edge taps (lane 0 = col 1, 1..nx = 0..nx-1, then
        nx-2, nx-3, edge-repeat)."""
        from lagrangiancoherence_tpu.ops.pallas_interp import (
            X_COPIES, X_GRAN, coeff_pad_dims)
        rng = np.random.default_rng(7)
        for shape in [(3, 2, 17, 32), (5, 21, 40), (9, 8)]:
            a = rng.standard_normal(shape)
            got = np.asarray(pad_coeffs_for_pallas(jnp.asarray(a)))
            ny, nx = shape[-2:]
            ypad, xpad = coeff_pad_dims(ny, nx)
            nxp_c = nx + 2 * xpad - 128
            ty = a[..., (np.arange(-ypad, ny + ypad) % ny), :]
            for c in range(X_COPIES):
                idx = (np.arange(nxp_c) + c * X_GRAN - xpad) % nx
                np.testing.assert_array_equal(got[c], ty[..., idx],
                                              err_msg=f"copy {c} {shape}")
            mir_idx = np.r_[1, 0:nx, nx - 2, nx - 3]
            mir_idx = np.pad(mir_idx, (0, nxp_c - mir_idx.size),
                             mode="edge")
            np.testing.assert_array_equal(got[X_COPIES], ty[..., mir_idx],
                                          err_msg=f"mirror {shape}")


class TestSeamAwareSortKey:
    def test_seam_arc_tiles_stay_narrow(self):
        """The per-group circular-anchor sort key (_anchored_cells): a
        polar group whose parcels occupy a narrow arc CENTERED ON the
        periodic seam must sort into storage tiles whose anchored-unwrap
        x spans stay arc-sized.  The old absolute mod-nx key split the
        arc to the two ends of the sorted order, leaving one tile per
        group holding both ends (unwrap span ~nx - arc ⇒ the kernel's
        full-longitude escalation tier; measured ~33 such tiles per late
        flagship step, tools/census_binned.py)."""
        from lagrangiancoherence_tpu.grid import Grid
        from lagrangiancoherence_tpu.models import settls
        ny, nx = 16, 1440
        grid = Grid(lats=np.linspace(60.0, 63.75, ny),
                    lons=np.linspace(-180.0, 179.75, nx), cyclic_x=True)
        rng = np.random.default_rng(1)
        px = np.mod(rng.uniform(150.0, 210.0, size=(ny, nx)) + 180.0,
                    360.0) - 180.0   # 60-deg arc straddling x=+-180
        py = np.broadcast_to(np.linspace(60, 63.7, ny)[:, None],
                             (ny, nx)).copy()
        out = settls._sort_bin_bands(
            (jnp.asarray(px), jnp.asarray(py)), jnp.asarray(px),
            jnp.asarray(py), [(0, 16)], grid)
        spx = np.asarray(out[0])
        xi = np.mod(np.floor((nx / 360.0) * (spx + 180.0)), nx)
        full = xi[:, :1408].reshape(2, 8, 11, 128)  # full (8,128) tiles
        anchor = full[:, :1, :, :1]
        u = anchor + np.mod(full - anchor + 0.5 * nx, float(nx)) - 0.5 * nx
        span = u.max(axis=(1, 3)) - u.min(axis=(1, 3))
        # arc is 240 cells wide; every tile must hold a sub-arc, never
        # the straddle union (old key: max span 239+... ~= 1200+)
        assert span.max() <= 240, span.max()


class TestMergedPoleLaunch:
    def test_merged_sections_match_two_launches(self):
        """pole_lists= (the merged hoisted-pole launch: three "pole"
        sections ride the main dma-all engine launch, _engine_layout)
        must reproduce the two-launch hoist — skip_pole main gather +
        standalone pole_block/pole_presorted call — bit-exactly: same
        slot windows, same _pole_block_body, only the launch machinery
        differs."""
        from lagrangiancoherence_tpu.ops.interp import prefilter
        from lagrangiancoherence_tpu.ops.pallas_interp import (
            pallas_interp_multi, pole_apply_perm, pole_sort_state)
        rng = np.random.default_rng(3)
        ny, nx, F, order = 73, 144, 4, 3
        lats = np.linspace(-90, 90, ny)
        lons = np.linspace(-180, 180, nx)
        fields = rng.standard_normal((F, ny, nx))
        coeffs = prefilter(jnp.asarray(fields), order=order)
        cwp = pad_coeffs_for_pallas(coeffs)
        px0, py0 = np.meshgrid(lons, lats)
        px = px0 + 120 * np.sin(py0 / 10) * np.cos(px0 / 15)
        py = np.clip(py0 + 60 * np.sin(px0 / 20), -90, 90)
        px = np.where(px > 180, -180 + (px % 180), px)
        px = jnp.asarray(np.where(px < -180, px % 180, px))
        py = jnp.asarray(py)
        bounds = dict(y_min=lats.min(), y_max=lats.max(),
                      x_min=lons.min(), x_max=lons.max())
        pole_rows = np.r_[0:order, ny - order:ny]
        perm, _ = pole_sort_state(px[pole_rows], py[pole_rows],
                                  order=order, ny=ny, nx=nx, **bounds)
        pxp = pole_apply_perm(px[pole_rows], perm, order=order, nx=nx)
        pyp = pole_apply_perm(py[pole_rows], perm, order=order, nx=nx)
        kw = dict(ny=ny, nx=nx, order=order, engine="dma-all",
                  interpret=True, **bounds)
        raw = jnp.asarray(fields)
        out_ref, fl_ref = pallas_interp_multi(raw, cwp, px, py,
                                              skip_pole=True, **kw)
        vals_ref, flp_ref = pallas_interp_multi(
            raw, cwp, pxp, pyp, pole_block=True, pole_presorted=True,
            **kw)
        out_m, vals_m, fl_m = pallas_interp_multi(
            raw, cwp, px, py, pole_lists=(pxp, pyp), **kw)
        np.testing.assert_array_equal(np.asarray(out_m),
                                      np.asarray(out_ref))
        np.testing.assert_array_equal(np.asarray(vals_m),
                                      np.asarray(vals_ref))
        assert int(fl_m) == int(fl_ref) | int(flp_ref)

    def test_merged_rejected_off_dma_all(self):
        """Other engines keep the two-launch hoist; pole_lists must
        refuse loudly rather than silently diverge."""
        from lagrangiancoherence_tpu.ops.interp import prefilter
        from lagrangiancoherence_tpu.ops.pallas_interp import (
            pallas_interp_multi, pole_flat_dims)
        ny, nx, F, order = 17, 32, 2, 3
        rng = np.random.default_rng(0)
        fields = rng.standard_normal((F, ny, nx))
        coeffs = prefilter(jnp.asarray(fields), order=order)
        cwp = pad_coeffs_for_pallas(coeffs)
        lats = np.linspace(-90, 90, ny)
        lons = np.linspace(-180, 180, nx)
        px0, py0 = np.meshgrid(lons, lats)
        _, Mpad = pole_flat_dims(order, nx)
        zeros = jnp.zeros((2, Mpad))
        with pytest.raises(NotImplementedError):
            pallas_interp_multi(
                jnp.asarray(fields), cwp, jnp.asarray(px0),
                jnp.asarray(py0), ny=ny, nx=nx, order=order,
                engine="blockspec", interpret=True,
                y_min=lats.min(), y_max=lats.max(),
                x_min=lons.min(), x_max=lons.max(),
                pole_lists=(zeros, zeros))

    def test_merged_clamp_flag_matches(self, monkeypatch):
        """Level-3 clamped slots must raise the pole flag (bit 4)
        identically through the merged sections and the standalone
        pole_block call: shrink the pole ladder so slots spanning many
        rows cannot fit any level."""
        monkeypatch.setenv("LCS_POLE_LADDER", "8,8,8")
        from lagrangiancoherence_tpu.ops.interp import prefilter
        from lagrangiancoherence_tpu.ops.pallas_interp import (
            pallas_interp_multi, pole_flat_dims)
        rng = np.random.default_rng(5)
        ny, nx, F, order = 49, 128, 2, 3
        lats = np.linspace(-90, 90, ny)
        lons = np.linspace(-180, 180, nx)
        fields = rng.standard_normal((F, ny, nx))
        coeffs = prefilter(jnp.asarray(fields), order=order)
        cwp = pad_coeffs_for_pallas(coeffs)
        px0, py0 = np.meshgrid(lons, lats)
        px, py = jnp.asarray(px0), jnp.asarray(py0)
        _, Mpad = pole_flat_dims(order, nx)
        # pole list y positions smeared over the whole domain and NOT
        # sorted — one (8,128) slot then spans ~ny rows >> the 8-row
        # ladder, forcing the final-level clamp
        pxp = jnp.asarray(rng.uniform(-180, 180, (2, Mpad)))
        pyp = jnp.asarray(rng.uniform(-90, 90, (2, Mpad)))
        kw = dict(ny=ny, nx=nx, order=order, engine="dma-all",
                  interpret=True, y_min=lats.min(), y_max=lats.max(),
                  x_min=lons.min(), x_max=lons.max())
        vals_ref, flp_ref = pallas_interp_multi(
            jnp.asarray(fields), cwp, pxp, pyp, pole_block=True,
            pole_presorted=True, **kw)
        out_m, vals_m, fl_m = pallas_interp_multi(
            jnp.asarray(fields), cwp, px, py, pole_lists=(pxp, pyp),
            **kw)
        assert int(flp_ref) & (1 << 4), hex(int(flp_ref))
        assert int(fl_m) & (1 << 4), hex(int(fl_m))
        # ulp-class tolerance: interpret mode lowers the body through
        # XLA:CPU, whose fusion/reassociation of the chunked dot can
        # differ between the two surrounding programs (measured 4.4e-16
        # max on the clamped slots; the flag-0 parity test above is
        # bit-exact)
        np.testing.assert_allclose(np.asarray(vals_m),
                                   np.asarray(vals_ref), atol=1e-12,
                                   rtol=0)
