"""Separable Gaussian smoothing matching ``scipy.ndimage.gaussian_filter``.

Used by the reference for optional departure-map smoothing
(/root/reference/LCS/LCS.py:187-190) and FTLE pre-smoothing in ridge
extraction (/root/reference/LCS/tools.py:76).  scipy defaults replicated:
``truncate=4.0`` (radius = int(truncate*sigma + 0.5)), ``mode='reflect'``
(symmetric edge padding), float64 kernel taps.
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

__all__ = ["gaussian_kernel1d", "gaussian_filter"]


@lru_cache(maxsize=32)
def gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """scipy's _gaussian_kernel1d for order=0: normalised exp(-x^2/2sigma^2)."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 * (x / sigma) ** 2)
    return phi / phi.sum()


def _correlate1d_reflect(arr: jnp.ndarray, taps: np.ndarray, axis: int) -> jnp.ndarray:
    """1-D correlation with scipy 'reflect' boundary ((d c b a | a b c d))."""
    r = (len(taps) - 1) // 2
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (r, r)
    padded = jnp.pad(arr, pad, mode="symmetric")
    out = jnp.zeros_like(arr)
    k = jnp.asarray(taps, dtype=arr.dtype)
    n = arr.shape[axis]
    for i in range(len(taps)):
        sl = [slice(None)] * arr.ndim
        sl[axis] = slice(i, i + n)
        out = out + k[i] * padded[tuple(sl)]
    return out


def gaussian_filter(arr: jnp.ndarray, sigma: float,
                    truncate: float = 4.0) -> jnp.ndarray:
    """2-D Gaussian smoothing over the trailing two axes, scipy-compatible."""
    arr = jnp.asarray(arr)
    taps = gaussian_kernel1d(float(sigma), truncate)
    out = _correlate1d_reflect(arr, taps, axis=arr.ndim - 2)
    out = _correlate1d_reflect(out, taps, axis=arr.ndim - 1)
    return out
