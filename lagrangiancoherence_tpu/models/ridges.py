"""FTLE ridge extraction via the spherical Hessian — fully fused, no LAPACK.

Re-designs the reference's ``find_ridges_spherical_hessian``
(/root/reference/LCS/tools.py:52-155).  The reference loops over every grid
point calling ``np.linalg.eig`` on a 2x2 Hessian (tools.py:105-121) — O(N)
LAPACK calls through Python.  Here the symmetric 2x2 eigendecomposition is
closed-form (one sqrt + one atan2), vectorised over the whole grid inside one
jit; the full pipeline (Gaussian smooth → gradient → Hessian → eigensolve →
masks) is a single fused XLA program.

Quirk-Q7 note (SURVEY.md): the reference indexes ``eig[1][argmin(eig[0])]``,
taking a *row* of the eigenvector matrix where numpy stores eigenvectors as
*columns*; and its ``eigmin`` is actually the eigenvalue of **largest
magnitude** (``eig[0][argmax(abs(eig[0]))]``, tools.py:119).  Both quirks are
reproduced in ``compat=True`` mode.  Exact bit-parity with the reference is
impossible in principle: LAPACK's 2x2 ``dgeev`` eigenvalue ordering and
eigenvector signs are build-dependent (measured ~49% ascending on this
machine), so this module fixes a deterministic convention — eigenvalues
ascending (λ0 <= λ1), first eigenvector (cosθ, sinθ) with θ = atan2-based —
and notes that every downstream consumer (ridge tolerance test, area-of-
influence walk) is invariant to the residual sign/direction ambiguity.

``compat=False`` returns the textbook min-eigenvalue *column* eigenvector.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..grid import Grid
from ..ops.filters import gaussian_filter
from ..ops.stencil import derivative_spherical_coords

__all__ = ["symmetric_eig_2x2", "find_ridges_core", "find_ridges_spherical_hessian"]


def symmetric_eig_2x2(a: jax.Array, b: jax.Array, c: jax.Array):
    """Closed-form eigendecomposition of [[a, b], [b, c]] per point.

    Returns (lam0, lam1, v0, v1): eigenvalues ascending and unit column
    eigenvectors, v0 for lam0, v1 = perp(v0).  All arrays broadcast over the
    input shape; v0/v1 carry a trailing length-2 component axis.
    """
    half_tr = 0.5 * (a + c)
    half_diff = 0.5 * (a - c)
    disc = jnp.sqrt(half_diff * half_diff + b * b)
    lam0 = half_tr - disc
    lam1 = half_tr + disc
    # v1 (for lam1, the + root): direction (half_diff + disc, b), which is
    # non-degenerate whenever b != 0 or a != c; fall back to e_x when the
    # matrix is isotropic.
    vx = half_diff + disc
    vy = b
    norm = jnp.sqrt(vx * vx + vy * vy)
    safe = norm > 0
    inv = jnp.where(safe, 1.0 / jnp.where(safe, norm, 1.0), 0.0)
    v1x = jnp.where(safe, vx * inv, 1.0)
    v1y = jnp.where(safe, vy * inv, 0.0)
    # v0 orthogonal to v1
    v0x = -v1y
    v0y = v1x
    v0 = jnp.stack([v0x, v0y], axis=-1)
    v1 = jnp.stack([v1x, v1y], axis=-1)
    return lam0, lam1, v0, v1


@partial(jax.jit, static_argnames=("grid", "sigma", "isglobal", "compat"))
def find_ridges_core(field: jax.Array, grid: Grid, sigma,
                     tolerance_threshold: float = 0.0005e-3,
                     isglobal: bool = True, compat: bool = True):
    """Fused ridge pipeline on a (ny, nx) FTLE field.

    Returns a dict of (ny, nx) arrays:
      ridges      — binary mask (1 on ridge points)
      eigmin      — quirk-Q7 "min" eigenvalue (largest-|λ|, compat) or true λmin
      dt_prod     — raw eigvector·gradient (the ridge alignment residual)
      eigvectors  — (ny, nx, 2) quirk rows (compat) or min-λ column vectors,
                    zeroed where eigmin >= 0 (tools.py:132)
      gradient    — (2, ny, nx) spherical gradient (d/dx, d/dy)
      angle       — orientation angle in degrees (tools.py:125)
    """
    lats, lons = grid.lats, grid.lons
    if sigma is not None:
        field = gaussian_filter(field, sigma=sigma)

    def d(f, dim):
        return derivative_spherical_coords(f, lats, lons, dim=dim,
                                           isglobal=isglobal)

    ddadx = d(field, 1)
    ddady = d(field, 0)
    d2dadx2 = d(ddadx, 1)
    d2dady2 = d(ddady, 0)
    d2dadxdy = d(ddadx, 0)  # the reference uses d/dy(d/dx) for both
    # off-diagonal entries (tools.py:82-83)

    # inf/NaN → 0 before the eigensolve (tools.py:93-94)
    def clean(x):
        return jnp.where(jnp.isfinite(x), x, 0.0)

    a = clean(d2dadx2)
    b = clean(d2dadxdy)
    c = clean(d2dady2)
    gx = ddadx
    gy = ddady

    lam0, lam1, v0, v1 = symmetric_eig_2x2(a, b, c)

    if compat:
        # quirk Q7: "eigvector" = matrix row at argmin(λ); with ascending
        # order that is row 0 = (v0[0], v1[0])
        ev = jnp.stack([v0[..., 0], v1[..., 0]], axis=-1)
        # quirk: "eigmin" = eigenvalue of largest magnitude (tools.py:119)
        eigmin = jnp.where(jnp.abs(lam0) >= jnp.abs(lam1), lam0, lam1)
    else:
        ev = v0
        eigmin = lam0

    dt_prod_raw = ev[..., 0] * gx + ev[..., 1] * gy

    on_ridge = (jnp.abs(dt_prod_raw) <= tolerance_threshold) \
        & (jnp.sign(eigmin) == -1)
    ridges = on_ridge.astype(field.dtype)

    eigvectors = jnp.where((eigmin < 0)[..., None], ev, 0.0)
    angle = (180.0 / jnp.pi) * jnp.arctan(
        eigvectors[..., 0] / eigvectors[..., 1])

    return dict(ridges=ridges, eigmin=eigmin, dt_prod=dt_prod_raw,
                eigvectors=eigvectors,
                gradient=jnp.stack([gx, gy]), angle=angle)


def find_ridges_spherical_hessian(da, sigma=0.5, scheme: str = "first_order",
                                  tolerance_threshold: float = 0.0005e-3,
                                  return_eigvectors: bool = False,
                                  isglobal: bool = True, compat: bool = True):
    """Reference-signature facade (/root/reference/LCS/tools.py:52-54).

    ``scheme`` is accepted and unused, exactly as in the reference (its body
    never reads it — SURVEY.md Q7).  Returns Fields:
    ``(ridges, eigmin)`` or, with ``return_eigvectors=True``,
    ``(ridges, eigmin, dt_prod, eigvectors, gradient, angle)``.
    """
    from ..field import Field, as_field
    da = as_field(da).sortby("latitude").sortby("longitude")
    da = da.transpose("latitude", "longitude")
    lats = da.coords["latitude"]
    lons = da.coords["longitude"]
    grid = Grid(lats=lats, lons=lons, cyclic_x=isglobal)
    out = find_ridges_core(jnp.asarray(da.data, dtype=jnp.float64
                                       if jax.config.jax_enable_x64
                                       else jnp.float32),
                           grid, sigma, float(tolerance_threshold),
                           isglobal, compat)
    coords = {"latitude": lats, "longitude": lons}
    dims = ("latitude", "longitude")

    def f2(name, arr):
        return Field(np.asarray(arr), dims, dict(coords), name=name)

    ridges = f2("ridges", out["ridges"])
    eigmin = f2("eigmin", out["eigmin"])
    if not return_eigvectors:
        return ridges, eigmin
    dt_prod = f2("dt_prod", out["dt_prod"])
    eigvectors = Field(np.moveaxis(np.asarray(out["eigvectors"]), -1, 0),
                       ("eigvectors",) + dims,
                       {**coords, "eigvectors": np.arange(2)},
                       name="eigvectors")
    gradient = Field(np.asarray(out["gradient"]), ("elements",) + dims,
                     {**coords, "elements": np.arange(2)}, name="gradient")
    angle = f2("angle", out["angle"])
    return ridges, eigmin, dt_prod, eigvectors, gradient, angle
