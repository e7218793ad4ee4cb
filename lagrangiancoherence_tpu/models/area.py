"""Area of influence of attracting LCS ridges — vectorised walk + scatter.

Re-designs the reference's ``find_area``
(/root/reference/LCS/area_of_influence.py:17-87), which walks along the
Hessian eigenvector from every ridge point in a Python ``while`` loop,
marking grid cells until the walked distance exceeds ``2 * normal_radius``
(area_of_influence.py:63-79).  Here every ridge point walks **in parallel**:
a fixed-trip-count candidate sweep (static ``max_steps``) generates all walk
positions at once, nearest-grid-index snapping replicates the reference's
``argmin(|coord - x|)`` (first-minimum tie-breaking), and a single
scatter-max writes the influence mask — one fused XLA program, no per-point
Python.

Reference semantics kept exactly:

* ``saturation_ratio = qdpt/qsat`` when both given, else 0.5
  (area_of_influence.py:33-36);
* walk radius ``exp(ftle) * ridges * saturation_ratio``
  (area_of_influence.py:50-52);
* the walk starts at ``(pt - |ev| * r)`` and marks the *first* position
  beyond the start (the reference increments before marking), stepping by
  ``|ev| * res`` with ``res`` = latitude spacing (area_of_influence.py:48);
* the y-step uses eigvector component 0 and the x-step component 1
  (area_of_influence.py:66-75) — replicated verbatim;
* points whose ``sigma`` or eigvector is NaN are excluded (the stacked
  ``dropna``, area_of_influence.py:61-62).

``max_steps`` bounds the per-point trip count (the reference's while-loop is
unbounded); the returned ``overflow`` flag reports whether any point wanted
more steps than the cap.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..grid import Grid

__all__ = ["find_area_core", "find_area"]


def _nearest_index(coords: jax.Array, x: jax.Array) -> jax.Array:
    """Index of the coordinate nearest to ``x`` with numpy-argmin
    first-minimum tie-breaking (lower index wins ties)."""
    n = coords.shape[0]
    hi = jnp.clip(jnp.searchsorted(coords, x, side="left"), 1, n - 1)
    lo = hi - 1
    d_lo = jnp.abs(x - coords[lo])
    d_hi = jnp.abs(coords[hi] - x)
    return jnp.where(d_lo <= d_hi, lo, hi)


@partial(jax.jit, static_argnames=("grid", "max_steps"))
def find_area_core(ftle: jax.Array, eigvectors: jax.Array, ridges: jax.Array,
                   grid: Grid, saturation_ratio, max_steps: int = 128):
    """Influence mask from (ny, nx) FTLE, (ny, nx, 2) eigvectors and a ridge
    weight field (1 on ridges; NaN excludes a point entirely).

    Returns ``(bounds, overflow)``: the binary (ny, nx) mask and a scalar
    bool set when ``max_steps`` truncated any walk.
    """
    ny, nx = ftle.shape
    lats = jnp.asarray(grid.lats, dtype=ftle.dtype)
    lons = jnp.asarray(grid.lons, dtype=ftle.dtype)
    res = lats[1] - lats[0]

    sigma = jnp.exp(ftle) * ridges
    normal_radius = sigma * saturation_ratio

    ev_y = eigvectors[..., 0]   # reference walks y with component 0
    ev_x = eigvectors[..., 1]   # and x with component 1
    valid = (~jnp.isnan(sigma)) & (~jnp.isnan(ev_x)) & (~jnp.isnan(ev_y))

    lat_mesh, lon_mesh = jnp.meshgrid(lats, lons, indexing="ij")
    r = jnp.where(valid, normal_radius, 0.0)
    x_lower = lon_mesh - jnp.abs(ev_x) * r
    y_lower = lat_mesh - jnp.abs(ev_y) * r

    # step k (k = 1..max_steps) lands at lower + k*|ev|*res; the reference
    # marks step k iff the *previous* distance D_{k-1} = (k-1)*res*|ev| was
    # still <= 2r (while-condition checked before the increment+mark).
    k = jnp.arange(1, max_steps + 1, dtype=ftle.dtype)
    step_len = jnp.sqrt(ev_x * ev_x + ev_y * ev_y) * res   # per-step distance
    d_prev = (k[:, None, None] - 1.0) * step_len[None]
    marked = valid[None] & (d_prev <= 2.0 * r[None])

    xx = x_lower[None] + k[:, None, None] * jnp.abs(ev_x)[None] * res
    yy = y_lower[None] + k[:, None, None] * jnp.abs(ev_y)[None] * res
    xi = _nearest_index(lons, xx)
    yi = _nearest_index(lats, yy)

    bounds = jnp.zeros((ny, nx), dtype=ftle.dtype)
    bounds = bounds.at[yi.reshape(-1), xi.reshape(-1)].max(
        marked.reshape(-1).astype(ftle.dtype))

    # a walk overflows when even the last step's previous-distance was within
    # the radius (more marks wanted beyond the cap)
    overflow = jnp.any(valid & ((max_steps - 1.0) * step_len <= 2.0 * r)
                       & (step_len > 0))
    return bounds, overflow


def find_area(ftle, eigvectors, ridges, qsat=None, qdpt=None,
              max_steps: int = 128):
    """Reference-signature facade (/root/reference/LCS/area_of_influence.py:17).

    ``ftle``/``ridges``: Fields or arrays on (latitude, longitude);
    ``eigvectors``: Field with a leading ``eigvectors`` dim of length 2 (as
    returned by ``find_ridges_spherical_hessian``) or an (ny, nx, 2) array.
    Returns the binary influence mask as a Field.
    """
    from ..field import Field, as_field
    ftle = as_field(ftle).sortby("latitude").sortby("longitude")
    ridges = as_field(ridges).sortby("latitude").sortby("longitude")
    if hasattr(eigvectors, "dims"):
        eigvectors = as_field(eigvectors).sortby("latitude").sortby("longitude")
        ev = np.moveaxis(np.asarray(eigvectors.data), 0, -1) \
            if eigvectors.dims[0] == "eigvectors" else np.asarray(eigvectors.data)
    else:
        ev = np.asarray(eigvectors)

    if qsat is None or qdpt is None:
        saturation_ratio = 0.5
    else:
        saturation_ratio = qdpt / qsat

    lats = ftle.coords["latitude"]
    lons = ftle.coords["longitude"]
    grid = Grid(lats=lats, lons=lons)
    bounds, overflow = find_area_core(
        jnp.asarray(ftle.data), jnp.asarray(ev), jnp.asarray(ridges.data),
        grid, saturation_ratio, max_steps=max_steps)
    if bool(overflow):
        from ..utils.logging import logger
        logger.warning("find_area: max_steps=%d truncated at least one walk; "
                       "increase max_steps for full coverage", max_steps)
    return Field(np.asarray(bounds), ("latitude", "longitude"),
                 {"latitude": lats, "longitude": lons}, name="bounds")
