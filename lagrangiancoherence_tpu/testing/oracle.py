"""CPU parity oracle: a minimal numpy/scipy re-implementation of the
reference's numerical semantics (including quirks Q1-Q6 from SURVEY.md),
used only in tests to assert the JAX path to <= 1e-5.

This is NOT the production path — it exists so parity can be asserted without
the reference's xarray/numba/windspharm dependency stack (not installed here).
Every function cites the reference lines whose behaviour it reproduces.
"""
from __future__ import annotations

import numpy as np
from scipy.linalg import norm as scipy_norm
from scipy.ndimage import gaussian_filter as scipy_gaussian
from scipy.ndimage import map_coordinates

EARTH_RADIUS = 6371000.0


def oracle_map_coordinates(values, lats, lons, px, py, order=3):
    """xr_map_coordinates(isglobal=True) (/root/reference/LCS/tools.py:11-48):
    Q4 index scaling; order/`wrap` for interior rows; order-1/`constant` for
    the ``order`` rows nearest each pole."""
    ny, nx = values.shape
    new_x = nx * (px - lons.min()) / (lons.max() - lons.min())
    new_y = ny * (py - lats.min()) / (lats.max() - lats.min())
    out = np.empty((ny, nx), dtype=np.float64)
    interior = np.arange(order, ny - order)
    out[interior, :] = map_coordinates(
        values, np.array([new_y[interior, :].ravel(), new_x[interior, :].ravel()]),
        order=order, mode="wrap").reshape(interior.size, nx)
    pole = np.hstack([np.arange(0, order), np.arange(ny - order, ny)])
    out[pole, :] = map_coordinates(
        values, np.array([new_y[pole, :].ravel(), new_x[pole, :].ravel()]),
        order=1, mode="constant").reshape(pole.size, nx)
    return out


def oracle_parcel_propagation(u, v, lats, lons, timestep, settls_order=0,
                              interp_order=3, cyclic_x=True,
                              return_traj=False):
    """SETTLS integrator semantics of /root/reference/LCS/trajectory.py:8-144.

    ``u``/``v`` are (T, ny, nx); winds are traversed in forward storage order
    regardless of the sign of ``timestep`` (quirk Q2)."""
    conv_y = 180.0 / (EARTH_RADIUS * np.pi)
    conv_x = (conv_y / np.abs(np.cos(lats * np.pi / 180.0)))[:, None]
    y_min, y_max = lats.min(), lats.max()
    x_min, x_max = lons.min(), lons.max()

    def clamp_wrap(px, py):
        py = np.where(py > y_min, py, y_min)
        py = np.where(py < y_max, py, y_max)
        if cyclic_x:
            px = np.where(px > -180.0, px, px % 180.0)
            px = np.where(px < 180.0, px, -180.0 + (px % 180.0))
        else:
            px = np.where(px < x_min, x_min, px)
            px = np.where(px > x_max, x_max, px)
        return px, py

    px, py = np.meshgrid(lons, lats)
    traj_x, traj_y = [px.copy()], [py.copy()]
    nt = u.shape[0]
    for t in range(nt - 1):
        va = oracle_map_coordinates(v[t], lats, lons, px, py, interp_order)
        ua = oracle_map_coordinates(u[t], lats, lons, px, py, interp_order)
        py = py + timestep * conv_y * va
        px = px + timestep * conv_x * ua
        px, py = clamp_wrap(px, py)
        for _ in range(settls_order):
            v_t = oracle_map_coordinates(v[t], lats, lons, px, py, interp_order)
            v_n = oracle_map_coordinates(v[t + 1], lats, lons, px, py, interp_order)
            u_t = oracle_map_coordinates(u[t], lats, lons, px, py, interp_order)
            u_n = oracle_map_coordinates(u[t + 1], lats, lons, px, py, interp_order)
            py = py + 0.5 * timestep * conv_y * (va + 2 * v_t - v_n)
            px = px + 0.5 * timestep * conv_x * (ua + 2 * u_t - u_n)
            px, py = clamp_wrap(px, py)
        traj_x.append(px.copy())
        traj_y.append(py.copy())
    if return_traj:
        return np.stack(traj_x), np.stack(traj_y)
    return px, py


def _oracle_stencil(arr, dim, isglobal=True):
    """fourth_order_derivative (/root/reference/LCS/tools.py:190-245)."""
    out = np.zeros_like(arr)
    ny, nx = arr.shape
    if dim == 0:
        for i in range(2, ny - 2):
            out[i] = (4 / 3) * (arr[i + 1] - arr[i - 1]) / 2 \
                     - (1 / 3) * (arr[i + 2] - arr[i - 2]) / 4
        for i in (0, 1):
            out[i] = (arr[i + 1] - arr[i]) / 2
        for i in (-1, -2):
            out[i] = (arr[i] - arr[i - 1]) / 2
    else:
        if isglobal:
            for j in range(nx):
                out[:, j] = (4 / 3) * (arr[:, (j + 1) % nx] - arr[:, (j - 1) % nx]) / 2 \
                            - (1 / 3) * (arr[:, (j + 2) % nx] - arr[:, (j - 2) % nx]) / 4
        else:
            for j in range(2, nx - 2):
                out[:, j] = (4 / 3) * (arr[:, j + 1] - arr[:, j - 1]) / 2 \
                            - (1 / 3) * (arr[:, j + 2] - arr[:, j - 2]) / 4
            for j in (0, 1):
                out[:, j] = (arr[:, j + 1] - arr[:, j]) / 2
            for j in (-1, -2):
                out[:, j] = (arr[:, j] - arr[:, j - 1]) / 2
    return out


def oracle_derivative_spherical(values, lats, lons, dim, isglobal=True):
    """derivative_spherical_coords incl. the float32 cast (quirk Q6,
    /root/reference/LCS/tools.py:248-267)."""
    deriv = _oracle_stencil(values.astype(np.float32), dim, isglobal).astype(np.float64)
    if dim == 0:
        dy = (np.pi / 180.0) * (lats[1] - lats[0]) * EARTH_RADIUS
        return deriv / dy
    dx = (np.pi / 180.0) * (lons[1] - lons[0]) * EARTH_RADIUS \
        * np.cos(lats * np.pi / 180.0)
    return deriv / dx[:, None]


def oracle_flowmap_gradient(x_dep, y_dep, lats, lons, sigma=None):
    """flowmap_gradient (/root/reference/LCS/LCS.py:171-225): sphere map with
    colatitude = lat - 90, six spherical derivatives, three zero radial
    derivatives, stacked in the reference's element order."""
    if sigma is not None:
        x_dep = scipy_gaussian(x_dep, sigma=sigma)
        y_dep = scipy_gaussian(y_dep, sigma=sigma)
    LON = x_dep * np.pi / 180.0
    LAT = (y_dep - 90.0) * np.pi / 180.0
    X = EARTH_RADIUS * np.sin(LAT) * np.cos(LON)
    Y = EARTH_RADIUS * np.sin(LAT) * np.sin(LON)
    Z = EARTH_RADIUS * np.cos(LAT)
    d = oracle_derivative_spherical
    comps = [d(X, lats, lons, 1), d(X, lats, lons, 0),
             d(Y, lats, lons, 1), d(Y, lats, lons, 0),
             d(Z, lats, lons, 1), d(Z, lats, lons, 0),
             np.zeros_like(X), np.zeros_like(X), np.zeros_like(X)]
    return np.stack(comps)  # (9, ny, nx): dxdx,dxdy,dydx,dydy,dzdx,dzdy,0,0,0


def oracle_ftle_norm(def_tensor):
    """Q1-compatible matrix 2-norm (/root/reference/LCS/LCS.py:145-154): the
    9-vector is reshaped row-major to [3,3] — a *scrambled* matrix — and the
    largest singular value of that matrix is taken per point."""
    nine, ny, nx = def_tensor.shape
    vals = def_tensor.reshape(3, 3, ny * nx)
    out = scipy_norm(vals, axis=(0, 1), ord=2)
    return out.reshape(ny, nx)


def oracle_ftle(u, v, lats, lons, timestep, settls_order=0, interp_order=3,
                cyclic_x=True, gauss_sigma=None):
    """End-to-end FTLE pipeline parity oracle (LCS.__call__ core path,
    /root/reference/LCS/LCS.py:129-157, without the isglobal preprocessing)."""
    px, py = oracle_parcel_propagation(u, v, lats, lons, timestep,
                                       settls_order, interp_order, cyclic_x)
    tensor = oracle_flowmap_gradient(px, py, lats, lons, sigma=gauss_sigma)
    return oracle_ftle_norm(tensor)
