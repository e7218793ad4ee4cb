"""Parity: ops.stencil vs a numpy oracle of the reference numba stencil
(/root/reference/LCS/tools.py:190-267), and ops.filters vs scipy."""
import numpy as np
import pytest
import jax.numpy as jnp
from scipy.ndimage import gaussian_filter as scipy_gaussian

from lagrangiancoherence_tpu.ops.stencil import (
    fourth_order_derivative, derivative_spherical_coords)
from lagrangiancoherence_tpu.ops.filters import gaussian_filter

RNG = np.random.default_rng(7)


def _oracle_stencil(arr, dim, isglobal):
    """Scalar-loop oracle re-implementing /root/reference/LCS/tools.py:190-245."""
    out = np.zeros_like(arr)
    ny, nx = arr.shape
    if dim == 0:
        for i in range(2, ny - 2):
            out[i, :] = (4/3) * (arr[i+1, :] - arr[i-1, :]) / 2 \
                        - (1/3) * (arr[i+2, :] - arr[i-2, :]) / 4
        for i in [0, 1]:
            out[i, :] = (arr[i+1, :] - arr[i, :]) / 2
        for i in [-1, -2]:
            out[i, :] = (arr[i, :] - arr[i-1, :]) / 2
    else:
        if isglobal:
            for j in range(nx):
                out[:, j] = (4/3) * (arr[:, (j+1) % nx] - arr[:, (j-1) % nx]) / 2 \
                            - (1/3) * (arr[:, (j+2) % nx] - arr[:, (j-2) % nx]) / 4
        else:
            for j in range(2, nx - 2):
                out[:, j] = (4/3) * (arr[:, j+1] - arr[:, j-1]) / 2 \
                            - (1/3) * (arr[:, j+2] - arr[:, j-2]) / 4
            for j in [0, 1]:
                out[:, j] = (arr[:, j+1] - arr[:, j]) / 2
            for j in [-1, -2]:
                out[:, j] = (arr[:, j] - arr[:, j-1]) / 2
    return out


@pytest.mark.parametrize("dim", [0, 1])
@pytest.mark.parametrize("isglobal", [True, False])
def test_fourth_order_derivative(dim, isglobal):
    arr = RNG.normal(size=(13, 17))
    ref = _oracle_stencil(arr, dim, isglobal)
    got = np.asarray(fourth_order_derivative(jnp.asarray(arr), dim=dim,
                                             isglobal=isglobal))
    np.testing.assert_allclose(got, ref, atol=1e-14)


@pytest.mark.parametrize("dim", [0, 1])
def test_derivative_spherical_coords(dim):
    ny, nx = 21, 33
    lats = np.linspace(-80, 80, ny)
    lons = np.linspace(-180, 176, nx)
    arr = RNG.normal(size=(ny, nx)) * 1e6
    # reference: float32 stencil then float64 metric division (tools.py:255-258)
    R = 6371000.0
    deriv32 = _oracle_stencil(arr.astype(np.float32), dim, True).astype(np.float64)
    if dim == 0:
        ref = deriv32 / ((np.pi/180) * (lats[1]-lats[0]) * R)
    else:
        dx = (np.pi/180) * (lons[1]-lons[0]) * R * np.cos(lats * np.pi/180)
        ref = deriv32 / dx[:, None]
    got = np.asarray(derivative_spherical_coords(jnp.asarray(arr), lats, lons,
                                                 dim=dim, out_dtype=jnp.float64))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


@pytest.mark.parametrize("sigma", [0.5, 1.2, 3.0])
def test_gaussian_filter_matches_scipy(sigma):
    arr = RNG.normal(size=(25, 37))
    ref = scipy_gaussian(arr, sigma=sigma)
    got = np.asarray(gaussian_filter(jnp.asarray(arr), sigma=sigma))
    np.testing.assert_allclose(got, ref, atol=1e-12)
