"""Regridding to the reference's common global grid.

Replaces the xarray pair ``interp(method='linear')`` +
``reindex(method='nearest')`` with NaN fallback used by the ``isglobal``
preprocessing path (/root/reference/LCS/LCS.py:107-114): bilinear
interpolation wherever the target point is inside the source hull, nearest
neighbour outside — all as gathers under one jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["regrid_linear_nearest"]


def _axis_weights(src: np.ndarray, dst: np.ndarray):
    """For each dst coordinate: bracketing src indices, linear weight, and an
    in-hull mask; plus the nearest src index (ties resolve to the lower index,
    matching xarray/pandas nearest reindex)."""
    src = np.asarray(src, dtype=np.float64)
    dst = np.asarray(dst, dtype=np.float64)
    n = src.shape[0]
    hi = np.searchsorted(src, dst, side="left")
    lo = np.clip(hi - 1, 0, n - 1)
    hi = np.clip(hi, 0, n - 1)
    denom = np.where(src[hi] > src[lo], src[hi] - src[lo], 1.0)
    t = np.clip((dst - src[lo]) / denom, 0.0, 1.0)
    inside = (dst >= src[0]) & (dst <= src[-1])
    # nearest: compare distance to lo/hi brackets, clip outside to edge
    d_lo = np.abs(dst - src[lo])
    d_hi = np.abs(src[hi] - dst)
    nearest = np.where(d_hi < d_lo, hi, lo)
    return lo.astype(np.int32), hi.astype(np.int32), t, inside, nearest.astype(np.int32)


def regrid_linear_nearest(field: jax.Array, src_lats: np.ndarray,
                          src_lons: np.ndarray, dst_lats: np.ndarray,
                          dst_lons: np.ndarray) -> jax.Array:
    """Regrid ``field`` (..., ny_src, nx_src) onto (dst_lats, dst_lons):
    bilinear inside the source domain, nearest-neighbour outside
    (the reference's NaN-fallback composite, /root/reference/LCS/LCS.py:109-114)."""
    ylo, yhi, ty, y_in, y_near = _axis_weights(src_lats, dst_lats)
    xlo, xhi, tx, x_in, x_near = _axis_weights(src_lons, dst_lons)

    f = jnp.asarray(field)
    ty_j = jnp.asarray(ty, dtype=f.dtype)[:, None]
    tx_j = jnp.asarray(tx, dtype=f.dtype)[None, :]

    def take_yx(yi, xi):
        return jnp.take(jnp.take(f, jnp.asarray(yi), axis=-2), jnp.asarray(xi),
                        axis=-1)

    v00 = take_yx(ylo, xlo)
    v01 = take_yx(ylo, xhi)
    v10 = take_yx(yhi, xlo)
    v11 = take_yx(yhi, xhi)
    linear = (v00 * (1 - ty_j) * (1 - tx_j) + v01 * (1 - ty_j) * tx_j
              + v10 * ty_j * (1 - tx_j) + v11 * ty_j * tx_j)
    nearest = take_yx(y_near, x_near)
    inside = jnp.asarray(y_in[:, None] & x_in[None, :])
    return jnp.where(inside, linear, nearest)
