"""Binary morphology + thresholding — skimage-free, jit-friendly.

The reference's research driver leans on skimage
(/root/reference/LCS/area_of_influence.py:14,190-207,233): ``threshold_local``
to binarise local FTLE, ``skeletonize`` to thin ridge masks, and
``binary_dilation``/``binary_erosion`` for neighbourhood ops.  skimage is not
available here; these are vectorised re-implementations:

* ``threshold_local``: gaussian / mean / median windowed threshold, skimage
  conventions (``threshold = filtered(image) - offset``; gaussian sigma =
  ``(block_size - 1) / 6``);
* ``otsu_threshold``: classic histogram-variance maximisation;
* ``binary_dilation`` / ``binary_erosion``: connectivity-1 (cross) or
  connectivity-2 (square) footprints as fused roll/where passes;
* ``skeletonize``: Zhang-Suen thinning under ``lax.while_loop`` — iterates
  to a fixed point entirely on device.  (skimage's variant differs in a few
  boundary sub-cases; the thinned topology is equivalent.)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .filters import gaussian_filter

__all__ = ["otsu_threshold", "threshold_local", "binary_dilation",
           "binary_erosion", "skeletonize"]


def otsu_threshold(image, nbins: int = 256) -> float:
    """Otsu's threshold (host-side, numpy): maximise inter-class variance."""
    vals = np.asarray(image).ravel()
    vals = vals[np.isfinite(vals)]
    hist, edges = np.histogram(vals, bins=nbins)
    centers = 0.5 * (edges[:-1] + edges[1:])
    hist = hist.astype(np.float64)
    w0 = np.cumsum(hist)
    w1 = w0[-1] - w0
    mu_cum = np.cumsum(hist * centers)
    mu_total = mu_cum[-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        mu0 = mu_cum / w0
        mu1 = (mu_total - mu_cum) / w1
        between = w0 * w1 * (mu0 - mu1) ** 2
    between[~np.isfinite(between)] = -1
    return float(centers[int(np.argmax(between[:-1]))])


def threshold_local(image, block_size: int, method: str = "gaussian",
                    offset: float = 0.0):
    """Per-pixel local threshold, skimage semantics: pixel > threshold is
    foreground, with ``threshold = local_statistic - offset``
    (the driver uses ``threshold_local(ftle, 301, offset=-.8)``,
    /root/reference/LCS/area_of_influence.py:195-196)."""
    if block_size % 2 == 0:
        raise ValueError("block_size must be odd")
    img = jnp.asarray(image)
    if method == "gaussian":
        sigma = (block_size - 1) / 6.0
        stat = gaussian_filter(img, sigma=sigma)
    elif method == "mean":
        r = block_size // 2
        pad = [(0, 0)] * (img.ndim - 2) + [(r, r), (r, r)]
        p = jnp.pad(img, pad, mode="symmetric")
        ii = jnp.cumsum(jnp.cumsum(p, axis=-2), axis=-1)
        ii = jnp.pad(ii, [(0, 0)] * (img.ndim - 2) + [(1, 0), (1, 0)])
        ny, nx = img.shape[-2], img.shape[-1]
        b = block_size
        stat = (ii[..., b:b + ny, b:b + nx] - ii[..., :ny, b:b + nx]
                - ii[..., b:b + ny, :nx] + ii[..., :ny, :nx]) / (b * b)
    elif method == "median":
        from jax.scipy.signal import medfilt2d  # type: ignore[attr-defined]
        stat = medfilt2d(img, kernel_size=block_size)
    else:
        raise ValueError(f"unknown method {method!r}")
    return stat - offset


def _neighbor_or(mask, connectivity: int):
    m = mask
    up = jnp.roll(m, 1, axis=-2).at[..., 0, :].set(False)
    dn = jnp.roll(m, -1, axis=-2).at[..., -1, :].set(False)
    lf = jnp.roll(m, 1, axis=-1).at[..., :, 0].set(False)
    rt = jnp.roll(m, -1, axis=-1).at[..., :, -1].set(False)
    out = m | up | dn | lf | rt
    if connectivity == 2:
        ul = jnp.roll(up, 1, axis=-1).at[..., :, 0].set(False)
        ur = jnp.roll(up, -1, axis=-1).at[..., :, -1].set(False)
        dl = jnp.roll(dn, 1, axis=-1).at[..., :, 0].set(False)
        dr = jnp.roll(dn, -1, axis=-1).at[..., :, -1].set(False)
        out = out | ul | ur | dl | dr
    return out


def binary_dilation(mask, connectivity: int = 1):
    """Dilate a boolean mask; connectivity 1 = cross footprint (the skimage
    default), 2 = full 3x3 square."""
    m = jnp.asarray(mask).astype(bool)
    return _neighbor_or(m, connectivity)


def binary_erosion(mask, connectivity: int = 1):
    m = jnp.asarray(mask).astype(bool)
    return ~_neighbor_or(~m, connectivity)


@partial(jax.jit, static_argnames=("max_iter",))
def skeletonize(mask, max_iter: int = 256):
    """Zhang-Suen thinning to a 1-pixel-wide skeleton.

    Runs sub-iterations under ``lax.while_loop`` until no pixel changes (or
    ``max_iter`` sweeps).  Input: 2-D 0/1 or boolean; output same dtype as a
    float/int 0/1 array.
    """
    img = jnp.asarray(mask)
    m0 = (img > 0)

    def neighbors(m):
        mf = m.astype(jnp.int32)
        pad = jnp.pad(mf, 1)
        p2 = pad[:-2, 1:-1]   # N
        p3 = pad[:-2, 2:]     # NE
        p4 = pad[1:-1, 2:]    # E
        p5 = pad[2:, 2:]      # SE
        p6 = pad[2:, 1:-1]    # S
        p7 = pad[2:, :-2]     # SW
        p8 = pad[1:-1, :-2]   # W
        p9 = pad[:-2, :-2]    # NW
        return p2, p3, p4, p5, p6, p7, p8, p9

    def subiter(m, phase):
        p2, p3, p4, p5, p6, p7, p8, p9 = neighbors(m)
        seq = [p2, p3, p4, p5, p6, p7, p8, p9, p2]
        A = sum(((seq[i] == 0) & (seq[i + 1] == 1)).astype(jnp.int32)
                for i in range(8))
        B = p2 + p3 + p4 + p5 + p6 + p7 + p8 + p9
        cond_common = m & (B >= 2) & (B <= 6) & (A == 1)
        c1 = (p2 * p4 * p6 == 0) & (p4 * p6 * p8 == 0)  # phase 0
        c2 = (p2 * p4 * p8 == 0) & (p2 * p6 * p8 == 0)  # phase 1
        remove = cond_common & jnp.where(phase == 0, c1, c2)
        return m & ~remove

    def body(state):
        m, _, it = state
        m1 = subiter(m, 0)
        m2 = subiter(m1, 1)
        changed = jnp.any(m2 != m)
        return m2, changed, it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iter)

    out, _, _ = jax.lax.while_loop(cond, body, (m0, jnp.asarray(True), 0))
    return out.astype(img.dtype)
