"""SETTLS two-time-level semi-Lagrangian parcel advection (Hortal 2002).

TPU-native re-design of the reference's integrator
(/root/reference/LCS/trajectory.py:8-144): the Python time loop with per-step
scipy ``map_coordinates`` calls becomes one ``lax.scan`` over the time axis,
with the wind fields cubic-prefiltered **once** up front (two MXU matmuls per
slice) and each step evaluating ``2 + 4*SETTLS_order`` fused gather-interp
kernels over the whole parcel grid.

Reference semantics replicated exactly (SURVEY.md quirks):

* Q2 — winds are indexed positionally **forward** even for backward
  (timestep < 0) integration; only time *labels* are reversed at the API
  layer (/root/reference/LCS/trajectory.py:59-60,82-84,105-108);
* Q3 — each SETTLS iteration *adds* the correction to the already-displaced
  iterate (/root/reference/LCS/trajectory.py:110-112);
* Q5 — cyclic wrap ``x % 180`` below -180 and ``-180 + (x % 180)`` above
  +180; hard clamp of latitude to [y_min, y_max] and, when non-cyclic, of
  longitude to [x_min, x_max] (/root/reference/LCS/trajectory.py:89-97);
* conversion factors ``conv_y = 180/(R*pi)`` and
  ``conv_x = conv_y/|cos(lat_grid)|`` are evaluated on the parcels' *home*
  latitudes, not their current positions
  (/root/reference/LCS/trajectory.py:54-57).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..grid import EARTH_RADIUS, Grid
from ..ops.interp import interp_at_parcels, prefilter

__all__ = ["parcel_propagation_core", "settls_scan"]


def _clamp_wrap(px, py, *, y_min, y_max, x_min, x_max, cyclic_x):
    """Boundary handling per /root/reference/LCS/trajectory.py:89-97."""
    py = jnp.where(py > y_min, py, y_min)
    py = jnp.where(py < y_max, py, y_max)
    if cyclic_x:
        px = jnp.where(px > -180.0, px, jnp.mod(px, 180.0))
        px = jnp.where(px < 180.0, px, -180.0 + jnp.mod(px, 180.0))
    else:
        px = jnp.where(px < x_min, x_min, px)
        px = jnp.where(px > x_max, x_max, px)
    return px, py


def settls_scan(u, v, cu, cv, px0, py0, dt, conv_x, grid: Grid, *,
                settls_order: int, interp_order: int, return_traj: bool,
                row_offset=0, home_rows=None):
    """The SETTLS time loop as one ``lax.scan`` over a position *block*.

    ``u``/``v``: full (T, ny, nx) winds; ``cu``/``cv``: their prefiltered
    coefficients.  ``px0``/``py0``: (rows, nx) initial positions whose home
    rows start at global row ``row_offset`` (traced OK — shards pass their
    offset).  ``conv_x``: (rows, 1) per-home-latitude m/s→deg/s factor.
    Shared by the single-chip jit and the shard_map per-device block.
    """
    dtype = u.dtype
    conv_y = jnp.asarray(180.0 / (EARTH_RADIUS * np.pi), dtype=dtype)
    bounds = dict(y_min=grid.y_min, y_max=grid.y_max,
                  x_min=grid.x_min, x_max=grid.x_max, cyclic_x=grid.cyclic_x)

    def interp(field_t, coeff_t, px, py):
        return interp_at_parcels(field_t, coeff_t, px, py,
                                 x_min=grid.x_min, x_max=grid.x_max,
                                 y_min=grid.y_min, y_max=grid.y_max,
                                 order=interp_order, row_offset=row_offset,
                                 home_rows=home_rows)

    def step(carry, t):
        px, py = carry
        u_t = jax.lax.dynamic_index_in_dim(u, t, axis=0, keepdims=False)
        v_t = jax.lax.dynamic_index_in_dim(v, t, axis=0, keepdims=False)
        cu_t = jax.lax.dynamic_index_in_dim(cu, t, axis=0, keepdims=False)
        cv_t = jax.lax.dynamic_index_in_dim(cv, t, axis=0, keepdims=False)
        u_n = jax.lax.dynamic_index_in_dim(u, t + 1, axis=0, keepdims=False)
        v_n = jax.lax.dynamic_index_in_dim(v, t + 1, axis=0, keepdims=False)
        cu_n = jax.lax.dynamic_index_in_dim(cu, t + 1, axis=0, keepdims=False)
        cv_n = jax.lax.dynamic_index_in_dim(cv, t + 1, axis=0, keepdims=False)

        # Euler first guess from winds at the current positions
        # (/root/reference/LCS/trajectory.py:82-87)
        va = interp(v_t, cv_t, px, py)
        ua = interp(u_t, cu_t, px, py)
        py = py + dt * conv_y * va
        px = px + dt * conv_x * ua
        px, py = _clamp_wrap(px, py, **bounds)

        # SETTLS fixed-point iterations, cumulative form (Q3)
        # (/root/reference/LCS/trajectory.py:100-124)
        for _ in range(settls_order):
            v_t_d = interp(v_t, cv_t, px, py)
            v_n_d = interp(v_n, cv_n, px, py)
            u_t_d = interp(u_t, cu_t, px, py)
            u_n_d = interp(u_n, cu_n, px, py)
            py = py + 0.5 * dt * conv_y * (va + 2.0 * v_t_d - v_n_d)
            px = px + 0.5 * dt * conv_x * (ua + 2.0 * u_t_d - u_n_d)
            px, py = _clamp_wrap(px, py, **bounds)

        out = (px, py) if return_traj else None
        return (px, py), out

    nsteps = u.shape[0] - 1
    (px, py), traj = jax.lax.scan(step, (px0, py0), jnp.arange(nsteps))

    if return_traj:
        traj_x, traj_y = traj
        traj_x = jnp.concatenate([px0[None], traj_x], axis=0)
        traj_y = jnp.concatenate([py0[None], traj_y], axis=0)
        return traj_x, traj_y
    return px, py


@partial(jax.jit, static_argnames=("grid", "settls_order", "interp_order",
                                   "return_traj"))
def parcel_propagation_core(u: jax.Array, v: jax.Array, timestep,
                            grid: Grid, *, settls_order: int = 0,
                            interp_order: int = 3,
                            return_traj: bool = False):
    """Integrate parcel positions through ``T-1`` SETTLS steps.

    Parameters
    ----------
    u, v : (T, ny, nx) zonal/meridional wind [m/s], lat/lon ascending, time
        in storage order (Q2: forward positional indexing regardless of the
        sign of ``timestep``).
    timestep : seconds (scalar; negative for backward integration).
    grid : static Grid.
    return_traj : if True, returns (T, ny, nx) stacked positions including
        the initial mesh; else the final (ny, nx) positions.

    Returns
    -------
    (positions_x, positions_y)
    """
    dtype = u.dtype
    ny, nx = grid.shape
    assert u.shape[-2:] == (ny, nx), (u.shape, grid.shape)

    # Prefilter every time slice once (order-3 only); raw fields are still
    # needed for the pole rows' order-1/constant path.
    cu = prefilter(u, order=interp_order)
    cv = prefilter(v, order=interp_order)

    dt = jnp.asarray(timestep, dtype=dtype)
    conv_y = jnp.asarray(180.0 / (EARTH_RADIUS * np.pi), dtype=dtype)
    lat_grid = jnp.asarray(grid.lats, dtype=dtype)
    conv_x = (conv_y / jnp.abs(jnp.cos(lat_grid * (np.pi / 180.0))))[:, None]

    px0_np, py0_np = grid.mesh_xy
    px0 = jnp.asarray(px0_np, dtype=dtype)
    py0 = jnp.asarray(py0_np, dtype=dtype)

    return settls_scan(u, v, cu, cv, px0, py0, dt, conv_x, grid,
                       settls_order=settls_order, interp_order=interp_order,
                       return_traj=return_traj)
