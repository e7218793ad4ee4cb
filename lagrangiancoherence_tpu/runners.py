"""Batch runners: FTLE time series (the animation workload).

The reference's production pattern is one batch job per timestamp, driven by
an HPC scheduler over netCDF files (/root/reference/LCS/LCS.py:236-268,
area_of_influence.py:168-184: a Python loop sliding an 8-step window).  Here
the same workload is a library call:

* ``ftle_series`` slides an integration window over a long wind record and
  computes one FTLE field per window — batched through ``vmap`` (one fused
  program evaluates ``batch`` windows at a time) and optionally sharded over
  a ``"t"`` device mesh axis (parallel/mesh.batch_mesh);
* ``ftle_series_to_files`` streams results to per-timestamp netCDF/HDF5
  files, skipping existing outputs — the idempotent retry-at-the-driver
  failure-recovery contract (SURVEY.md §5): a crashed run is resumed by
  re-invoking it.
"""
from __future__ import annotations

import os

import numpy as np

from .field import Field, as_field
from .grid import Grid
from .utils.logging import logger, timed_stage

__all__ = ["ftle_series", "ftle_series_to_files"]


def _windows(nt: int, window: int, stride: int) -> list[int]:
    return list(range(0, nt - window + 1, stride))


def ftle_series(u, v, timestep: float, *, window: int, stride: int = 1,
                settls_order: int = 4, interp_order: int = 3, sigma=None,
                compat: bool = True, batch="auto", mesh=None,
                kernel: str = "auto", propdim: str = "time"):
    """FTLE fields over sliding windows of a long wind record.

    ``u``/``v``: Fields (time, latitude, longitude) or arrays with the same
    layout; ``window``: time levels per integration (e.g. 33 for 8 days of
    6-hourly data); ``stride``: window start spacing.  Returns a Field
    (time, latitude, longitude) stamped per the reference's rule (last time
    of the window forward, first backward — /root/reference/LCS/LCS.py:158).

    ``batch``: windows evaluated per compiled program.  ``"auto"`` picks 8
    (vmap) on the XLA kernel and **1** on the pallas TPU path at
    production scale: vmapped B>=2 flagship programs fail device compile
    (remote-compile-helper size limit, tools/probe_batch.py --sweep), and
    the B=1 vmap wrapper itself measured ~9% slower than the plain
    pipeline (ROUND3_NOTES session 8).  ``batch=1`` therefore compiles the
    UN-vmapped single-field program once and streams windows through it —
    the throughput fallback for the animation workload.  A vmapped
    ``batch>1`` chunk that fails to compile falls back to the same
    sequential path with a warning instead of crashing the series.

    ``mesh``: optional ``batch_mesh`` to shard window batches across chips.
    """
    import jax.numpy as jnp

    from .api import _resolve_kernel
    from .models.pipeline import ftle_pipeline

    U = as_field(u) if hasattr(u, "dims") or not isinstance(u, np.ndarray) \
        else None
    if U is not None:
        V = as_field(v)
        order = (propdim, "latitude", "longitude")
        U = U.transpose(*order).sortby("latitude").sortby("longitude")
        V = V.transpose(*order).sortby("latitude").sortby("longitude")
        lats, lons = U.coords["latitude"], U.coords["longitude"]
        times = U.coords[propdim]
        ud, vd = U.data, V.data
    else:
        raise TypeError("pass Fields (or xarray DataArrays) with "
                        "time/latitude/longitude dims")

    grid = Grid(lats=lats, lons=lons, cyclic_x=True)
    starts = _windows(ud.shape[0], window, stride)
    if not starts:
        raise ValueError(f"record of {ud.shape[0]} steps is shorter than "
                         f"window={window}")
    kern = _resolve_kernel(kernel, int(interp_order))
    dtype = np.float32 if kern == "pallas" else np.float64
    if batch == "auto":
        # pallas at flagship scale: one field per program (see
        # docstring).  Measured boundary (tools/probe_batch.py --sweep,
        # v5e 2026-08-21): vmapped B=2 compiles and runs clean at the
        # 0.5-degree global grid (361x720) but the 0.25-degree (721x1440)
        # B=2 program crashes the device compile toolchain — the failure
        # is program size, not a vmap-of-pallas feature gap.
        batch = 1 if (kern == "pallas"
                      and grid.shape[0] * grid.shape[1] > 512 * 1024) else 8
    batch = max(1, int(batch))

    import jax

    # upload the whole wind record ONCE and slice windows on device:
    # re-uploading each (overlapping) window from host was measured at
    # ~5-20 s/field through the axon tunnel (tools/probe_series.py,
    # 274 MB per flagship window) — the transfer, not the compute,
    # dominated the series
    ud = jnp.asarray(np.asarray(ud), dtype=dtype)
    vd = jnp.asarray(np.asarray(vd), dtype=dtype)

    def run_single(us, vs):
        # plain (un-vmapped) single-field program — ftle_pipeline is
        # itself jitted, so repeated calls reuse one executable
        return ftle_pipeline(us, vs, timestep,
                             grid, settls_order=settls_order,
                             interp_order=interp_order, sigma=sigma,
                             compat=compat, kernel=kern,
                             return_overflow=True)

    def warn_overflow(overflow, chunk):
        bad = np.nonzero(np.atleast_1d(np.asarray(overflow)))[0]
        if bad.size:
            logger.warning(
                "pallas interpolation windows clamped some taps in "
                "windows starting at %s; affected tiles are "
                "approximate — re-run with kernel='xla' or larger "
                "windows for exact values", [chunk[i] for i in bad])

    fields = []
    with timed_stage(f"FTLE series: {len(starts)} windows"):
        for chunk_start in range(0, len(starts), batch):
            chunk = starts[chunk_start:chunk_start + batch]
            ub = jnp.stack([ud[s:s + window] for s in chunk])
            vb = jnp.stack([vd[s:s + window] for s in chunk])
            if mesh is not None:
                from .parallel.pipeline import ftle_batch
                out = ftle_batch(ub, vb, timestep, grid, mesh,
                                 settls_order=settls_order,
                                 interp_order=interp_order, sigma=sigma,
                                 compat=compat)
            elif len(chunk) == 1:
                out, overflow = run_single(ud[chunk[0]:chunk[0] + window],
                                           vd[chunk[0]:chunk[0] + window])
                out = np.asarray(out)[None]
                warn_overflow(overflow, chunk)
            else:
                fn = jax.vmap(lambda uu, vv: ftle_pipeline(
                    uu, vv, timestep, grid, settls_order=settls_order,
                    interp_order=interp_order, sigma=sigma, compat=compat,
                    kernel=kern, return_overflow=True))
                try:
                    out, overflow = jax.jit(fn)(ub, vb)
                    out = np.asarray(out)
                except Exception as e:  # noqa: BLE001 — vmapped flagship
                    # programs can exceed the device compiler's size
                    # limit; stream the chunk through the single-field
                    # executable instead of crashing the series
                    logger.warning(
                        "vmapped batch=%d failed to compile (%s: %.200s); "
                        "falling back to sequential single-field programs",
                        len(chunk), type(e).__name__, e)
                    outs, flags = [], []
                    for us, vs in zip(ub, vb):
                        o, f = run_single(us, vs)
                        outs.append(np.asarray(o))
                        flags.append(np.asarray(f))
                    out, overflow = np.stack(outs), np.stack(flags)
                warn_overflow(overflow, chunk)
            fields.append(np.asarray(out))
    data = np.concatenate(fields, axis=0)

    stamp_idx = [(s + window - 1 if timestep > 0 else s) for s in starts]
    stamps = np.asarray(times)[stamp_idx]
    return Field(data, (propdim, "latitude", "longitude"),
                 {propdim: stamps, "latitude": lats, "longitude": lons},
                 name="ftle")


def ftle_series_to_files(u, v, timestep: float, outdir: str, *,
                         window: int, stride: int = 1,
                         overwrite: bool = False, **kw) -> list[str]:
    """Streamed variant: one netCDF/HDF5 file per window timestamp, skipped
    when it already exists — idempotent crash recovery (SURVEY.md §5)."""
    from .utils.io import save_dataset

    os.makedirs(outdir, exist_ok=True)
    series = ftle_series(u, v, timestep, window=window, stride=stride, **kw)
    written = []
    for i, stamp in enumerate(series.coords["time"]):
        tag = np.datetime_as_string(np.datetime64(stamp), unit="h") \
            if np.issubdtype(np.asarray(stamp).dtype, np.datetime64) \
            else str(stamp)
        path = os.path.join(outdir, f"ftle_{tag}.nc")
        fld = series.isel(time=i).expand_dims("time", coord=stamp)
        fld.name = "ftle"
        if save_dataset({"ftle": fld}, path,
                        skip_if_exists=not overwrite):
            written.append(path)
        else:
            logger.info("skip existing %s", path)
    return written
