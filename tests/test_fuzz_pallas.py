"""Randomized parity fuzz for the pallas gather kernel (interpret mode,
f64) against the XLA gather path.

The hand-written cases in test_pallas_interp.py pin the *known* hazard
classes (folds, mirrors, poles, full-x whirl, escalation).  This file
sweeps seeded-random combinations of grid shape (odd ny/nx, partial
tiles), spline order, displacement magnitude and launch engine, looking
for the routing/fold corner cases nobody thought to write down — the
class of bug (e.g. the round-2 wrap-seam 1e-2 corruption,
docs/source/kernel.rst "Fold-boundary determinism") that only odd
position/shape coincidences expose.

Displacements are random smooth fields (low-order Fourier modes with
random amplitudes up to full-circle zonal excursions) so every tier of
the escalation ladder gets hit across the sweep.  Reference semantics:
/root/reference/LCS/tools.py:21-41 (scipy map_coordinates wrap mode).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from lagrangiancoherence_tpu.ops.interp import (interp_at_parcels_multi,
                                                prefilter)
from lagrangiancoherence_tpu.ops.pallas_interp import (pad_coeffs_for_pallas,
                                                       pallas_interp_multi)


def random_case(seed):
    rng = np.random.RandomState(seed)
    ny = int(rng.choice([37, 61, 73, 96, 121, 144]))
    nx = int(rng.choice([128, 144, 192, 256, 288]))
    order = int(rng.choice([1, 3]))
    F = int(rng.choice([2, 4]))
    lats = np.linspace(-90, 90, ny)
    lons = np.linspace(-180, 180 - 360 / nx, nx)
    fields = rng.randn(F, ny, nx)
    px0, py0 = np.meshgrid(lons, lats)

    # random smooth displacement: a handful of low-order Fourier modes,
    # amplitude drawn log-uniform from gentle (2 deg) to violent
    # full-circle (400 deg) so tier A through the full-x slab all fire
    amp_x = float(np.exp(rng.uniform(np.log(2.0), np.log(400.0))))
    amp_y = float(np.exp(rng.uniform(np.log(1.0), np.log(60.0))))
    dx = np.zeros_like(px0)
    dy = np.zeros_like(py0)
    for _ in range(3):
        kx, ky = rng.randint(1, 5, size=2)
        phx, phy = rng.uniform(0, 2 * np.pi, size=2)
        dx += rng.uniform(0.2, 1.0) * np.sin(
            np.deg2rad(ky * py0) * 4 + phx) * np.cos(
            np.deg2rad(kx * px0) * 2 + phy)
        dy += rng.uniform(0.2, 1.0) * np.cos(
            np.deg2rad(kx * py0) * 3 + phy) * np.sin(
            np.deg2rad(ky * px0) * 2 + phx)
    px = px0 + amp_x / 3.0 * dx
    py = np.clip(py0 + amp_y / 3.0 * dy, -90.0, 90.0)
    # reference Q5 wrap (models/settls.py _clamp_wrap convention)
    px = np.where(px > 180, -180 + (px % 180), px)
    px = np.where(px < -180, px % 180, px)
    return ny, nx, order, F, lats, lons, fields, px, py


_CASES = ([("blockspec", s) for s in range(8)]
          + [("dma-all", s) for s in range(8)]
          # 'dma' shares dma-all's machinery for the escalation tiers and
          # differs only in keeping tier A on blockspec — 4 seeds bound
          # the suite cost while still crossing every ladder tier
          + [("dma", s) for s in range(4)])


@pytest.mark.parametrize("engine,seed", _CASES)
def test_random_parity(seed, engine):
    ny, nx, order, F, lats, lons, fields, px, py = random_case(seed)
    coeffs = np.asarray(prefilter(jnp.asarray(fields), order=order))
    bounds = dict(x_min=lons.min(), x_max=lons.max(),
                  y_min=lats.min(), y_max=lats.max())
    ref = np.asarray(interp_at_parcels_multi(
        jnp.asarray(fields), jnp.asarray(coeffs), jnp.asarray(px),
        jnp.asarray(py), order=order, **bounds))
    cw_pad = pad_coeffs_for_pallas(jnp.asarray(coeffs))
    out, flag = pallas_interp_multi(
        jnp.asarray(fields), cw_pad, jnp.asarray(px), jnp.asarray(py),
        ny=ny, nx=nx, order=order, wy=48, wx=256, retry_tiles=256,
        engine=engine, interpret=True, **bounds)
    # overflow must never fire on the default ladder for smooth fields
    # of this magnitude; if it does, the clamped tiles explain any
    # mismatch and BOTH are a finding.
    assert int(flag) == 0, (
        f"seed={seed} ny={ny} nx={nx} order={order}: flag={int(flag):#x}")
    np.testing.assert_allclose(
        np.asarray(out), ref, atol=1e-10,
        err_msg=f"seed={seed} ny={ny} nx={nx} order={order} F={F} "
                f"engine={engine}")
