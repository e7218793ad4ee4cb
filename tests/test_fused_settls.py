"""Fused SETTLS-iterate engine vs the unfused pallas path (interpret).

The fused engine (ops/pallas_interp._fused_engine_kernel) runs all
``settls_order`` fixed-point iterations of a step inside one launch —
gather, Q3 cumulative update, Q5 clamp/wrap and re-fold in-kernel
(/root/reference/LCS/trajectory.py:100-124 semantics).  These tests pin
it to the unfused per-iterate gather path on a small GLOBAL grid (pole
rows exercised) in f64: the only differences are op-order ulps in the
in-kernel index scaling, so agreement is ~1e-13.
"""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import lagrangiancoherence_tpu.ops.pallas_interp as PI
from lagrangiancoherence_tpu.grid import Grid
from lagrangiancoherence_tpu.models.settls import parcel_propagation_core


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = PI.pallas_interp_multi
    monkeypatch.setattr(
        PI, "pallas_interp_multi",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))


def _global_case(whirl=1.0, nt=4, step=3.0):
    lats = np.linspace(-90.0, 90.0, int(round(180 / step)) + 1)
    lons = np.arange(-180.0, 180.0, step)
    grid = Grid(lats=lats, lons=lons, cyclic_x=True)
    LON, LAT = np.meshgrid(np.deg2rad(lons), np.deg2rad(lats))
    t = np.arange(nt)[:, None, None]
    u = whirl * (22.0 * np.cos(LAT) + 4 * np.cos(2 * LON)
                 * np.sin(2 * LAT))[None] \
        * (1 + 0.05 * np.sin(2 * np.pi * t / nt))
    v = whirl * (5.0 * np.sin(3 * LON) * np.cos(2 * LAT))[None] \
        * (1 + 0.05 * np.cos(2 * np.pi * t / nt))
    return grid, jnp.asarray(u), jnp.asarray(v)


def _run(grid, u, v, fuse, dt=-6 * 3600.0, **kw):
    os.environ["LCS_FUSE"] = fuse
    # the knob is read at trace time inside the jitted core
    jax.clear_caches()
    try:
        px, py, fl = parcel_propagation_core(
            u, v, dt, grid, kernel="pallas",
            return_overflow=True, **kw)
        return np.asarray(px), np.asarray(py), int(fl)
    finally:
        os.environ.pop("LCS_FUSE", None)


@pytest.mark.parametrize("rebin,order,so,whirl,step,dt_h", [
    (False, 3, 3, 1.0, 3.0, -6),
    ("sort", 3, 4, 2.5, 3.0, -6),   # polar whirl: full-x tiers + sort
    (False, 1, 2, 1.0, 3.0, -6),
    # drift stress: ~8 cells/iterate of Q3 cumulative displacement —
    # exercises the predicted per-iterate window offsets (1.5-deg grid
    # so x windows are real: nx_t=256 > quarter/256-wide windows)
    ("sort", 3, 4, 1.0, 1.5, -36),
])
def test_fused_matches_unfused(interpret_pallas, rebin, order, so, whirl,
                               step, dt_h):
    grid, u, v = _global_case(whirl=whirl, step=step)
    ax, ay, afl = _run(grid, u, v, "0", dt=dt_h * 3600.0,
                       settls_order=so, interp_order=order, rebin=rebin)
    bx, by, bfl = _run(grid, u, v, "1", dt=dt_h * 3600.0,
                       settls_order=so, interp_order=order, rebin=rebin)
    assert bfl == 0, hex(bfl)
    np.testing.assert_allclose(bx, ax, atol=1e-9)
    np.testing.assert_allclose(by, ay, atol=1e-9)


def test_fused_gate_engages(interpret_pallas):
    """The fused gate must engage for the bench-shaped configuration
    (dma-all, full grid, no trajectories) when LCS_FUSE=1 — guard
    against silent de-fusing."""
    grid, u, v = _global_case()
    calls = []
    orig = PI.pallas_interp_multi

    def spy(*a, **k):
        calls.append(k.get("settls_upd") is not None
                     or k.get("pole_block", False))
        return orig(*a, **{**k, "interpret": True})

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(PI, "pallas_interp_multi", spy)
        mp.setenv("LCS_FUSE", "1")
        jax.clear_caches()
        parcel_propagation_core(u, v, -6 * 3600.0, grid, settls_order=2,
                                interp_order=3, kernel="pallas",
                                return_overflow=True)
    assert any(calls), "fused engine never engaged with LCS_FUSE=1"
