"""Batch runners: FTLE time series (the animation workload).

The reference's production pattern is one batch job per timestamp, driven by
an HPC scheduler over netCDF files (/root/reference/LCS/LCS.py:236-268,
area_of_influence.py:168-184: a Python loop sliding an 8-step window).  Here
the same workload is a library call:

* ``ftle_series`` slides an integration window over a long wind record and
  computes one FTLE field per window — batched through ``vmap`` (one fused
  program evaluates ``batch`` windows at a time) and optionally sharded over
  a ``"t"`` device mesh axis (parallel/mesh.batch_mesh);
* ``ftle_series_to_files`` **streams**: each window is computed and written
  to its per-timestamp netCDF/HDF5 file before the next chunk starts, and
  windows whose output file already exists are skipped *before* compute —
  the idempotent retry-at-the-driver failure-recovery contract
  (SURVEY.md §5): a crashed run is resumed by re-invoking it and pays only
  for the windows it had not finished.
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


def _prep_record(u, v, propdim):
    """Sort/transpose the wind record into (time, lat, lon) numpy arrays."""
    if not (hasattr(u, "dims") or not isinstance(u, np.ndarray)):
        raise TypeError("pass Fields (or xarray DataArrays) with "
                        "time/latitude/longitude dims")
    U, V = as_field(u), as_field(v)
    order = (propdim, "latitude", "longitude")
    U = U.transpose(*order).sortby("latitude").sortby("longitude")
    V = V.transpose(*order).sortby("latitude").sortby("longitude")
    lats, lons = U.coords["latitude"], U.coords["longitude"]
    times = U.coords[propdim]
    return np.asarray(U.data), np.asarray(V.data), lats, lons, times


def _auto_batch(kern: str, grid: Grid, mesh) -> int:
    """Windows per compiled program.

    pallas at flagship scale runs one field per program: vmapped B>=2
    flagship programs fail device compile (remote-compile-helper size
    limit — measured boundary tools/probe_batch.py --sweep, v5e
    2026-08-21: B=2 clean at 0.5 deg 361x720, dies at 0.25 deg 721x1440),
    and the B=1 vmap wrapper itself measured ~9% slower than the plain
    pipeline (ROUND3_NOTES session 8).  With a ``"t"`` mesh the batch must
    stay shardable (a size-1 batch axis cannot be partitioned N ways), so
    the heuristic returns a multiple of the mesh's device count — each
    shard then runs its own single-field-class program.
    """
    big = grid.shape[0] * grid.shape[1] > 512 * 1024
    pallas_big = kern == "pallas" and big
    if mesh is not None:
        n = int(np.prod(list(mesh.shape.values())))
        return n if pallas_big else n * max(1, 8 // n)
    return 1 if pallas_big else 8


def _iter_series_chunks(ud, vd, starts, window, timestep, grid, *,
                        batch, mesh, settls_order, interp_order, sigma,
                        compat, kern):
    """Yield ``(chunk_starts, fields_np)`` per compiled batch.

    ``ud``/``vd`` are the full device-resident wind records — uploaded ONCE
    by the caller; windows are sliced on device (re-uploading each
    overlapping window from host was measured at ~5-20 s/field through the
    axon tunnel: 274 MB per flagship window — the transfer, not the
    compute, dominated the series).
    """
    import jax
    import jax.numpy as jnp

    from .models.pipeline import ftle_pipeline

    def run_single(us, vs):
        # plain (un-vmapped) single-field program — ftle_pipeline is
        # itself jitted, so repeated calls reuse one executable
        return ftle_pipeline(us, vs, timestep, grid,
                             settls_order=settls_order,
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

    # one jitted vmapped executable shared by every multi-window chunk
    # (rebuilding it per chunk re-traced each time); vmap_ok remembers a
    # device-compile failure so later chunks skip straight to the
    # sequential fallback instead of re-attempting the known-failing
    # multi-minute compile
    vfn = jax.jit(jax.vmap(lambda uu, vv: ftle_pipeline(
        uu, vv, timestep, grid, settls_order=settls_order,
        interp_order=interp_order, sigma=sigma, compat=compat,
        kernel=kern, return_overflow=True)))
    vmap_ok = True

    if mesh is not None:
        from .parallel.pipeline import ftle_batch
        ndev = int(np.prod(list(mesh.shape.values())))

    for chunk_start in range(0, len(starts), batch):
        chunk = starts[chunk_start:chunk_start + batch]
        if mesh is not None:
            # pad the tail chunk to a multiple of the device count so the
            # "t" batch axis stays shardable; padded replicas are sliced
            # off below
            pad = (-len(chunk)) % ndev
            padded = chunk + [chunk[-1]] * pad
            ub = jnp.stack([ud[s:s + window] for s in padded])
            vb = jnp.stack([vd[s:s + window] for s in padded])
            out, overflow = ftle_batch(ub, vb, timestep, grid, mesh,
                                       settls_order=settls_order,
                                       interp_order=interp_order,
                                       sigma=sigma, compat=compat,
                                       kernel=kern, return_overflow=True)
            out = np.asarray(out)[:len(chunk)]
            warn_overflow(np.asarray(overflow)[:len(chunk)], chunk)
        elif len(chunk) == 1 or not vmap_ok:
            outs, flags = [], []
            for s in chunk:
                o, f = run_single(ud[s:s + window], vd[s:s + window])
                outs.append(np.asarray(o))
                flags.append(np.asarray(f))
            out, overflow = np.stack(outs), np.stack(flags)
            warn_overflow(overflow, chunk)
        else:
            ub = jnp.stack([ud[s:s + window] for s in chunk])
            vb = jnp.stack([vd[s:s + window] for s in chunk])
            try:
                out, overflow = vfn(ub, vb)
                out = np.asarray(out)
            except Exception as e:  # noqa: BLE001 — vmapped flagship
                # programs can exceed the device compiler's size limit;
                # stream this AND all later chunks through the
                # single-field executable instead of re-attempting the
                # failing compile per chunk
                logger.warning(
                    "vmapped batch=%d failed to compile (%s: %.200s); "
                    "falling back to sequential single-field programs "
                    "for the rest of the series",
                    len(chunk), type(e).__name__, e)
                vmap_ok = False
                outs, flags = [], []
                for us, vs in zip(ub, vb):
                    o, f = run_single(us, vs)
                    outs.append(np.asarray(o))
                    flags.append(np.asarray(f))
                out, overflow = np.stack(outs), np.stack(flags)
            warn_overflow(overflow, chunk)
        yield chunk, np.asarray(out)


def _stamp_indices(starts, window, timestep):
    """Per-window timestamp rule: last time of the window forward, first
    backward (/root/reference/LCS/LCS.py:158)."""
    return [(s + window - 1 if timestep > 0 else s) for s in starts]


def ftle_series(u, v, timestep: float, *, window: int, stride: int = 1,
                settls_order: int = 4, interp_order: int = 3, sigma=None,
                compat: bool = True, batch="auto", mesh=None,
                kernel: str = "auto", propdim: str = "time",
                cyclic_x: bool = True):
    """FTLE fields over sliding windows of a long wind record.

    ``u``/``v``: Fields (time, latitude, longitude) or arrays with the same
    layout; ``window``: time levels per integration (e.g. 33 for 8 days of
    6-hourly data); ``stride``: window start spacing.  Returns a Field
    (time, latitude, longitude) stamped per the reference's rule (last time
    of the window forward, first backward — /root/reference/LCS/LCS.py:158).

    ``batch``: windows evaluated per compiled program; ``"auto"`` picks per
    kernel/scale/mesh (see ``_auto_batch``).  A vmapped ``batch>1`` chunk
    that fails to compile falls back to sequential single-field programs
    for the rest of the series instead of crashing it.

    ``mesh``: optional ``batch_mesh`` to shard window batches across chips.

    ``cyclic_x``: longitude wrap semantics.  ``True`` (global records)
    wraps parcels across the dateline; pass ``False`` for regional records
    (the reference's own research workload is regional —
    /root/reference/LCS/area_of_influence.py:168-184), which clamp at the
    domain edge instead.
    """
    import jax.numpy as jnp

    from .api import _resolve_kernel

    ud, vd, lats, lons, times = _prep_record(u, v, propdim)
    grid = Grid(lats=lats, lons=lons, cyclic_x=cyclic_x)
    starts = _windows(ud.shape[0], window, stride)
    if not starts:
        raise ValueError(f"record of {ud.shape[0]} steps is shorter than "
                         f"window={window}")
    kern = _resolve_kernel(kernel, int(interp_order))
    dtype = np.float32 if kern == "pallas" else np.float64
    if batch == "auto":
        batch = _auto_batch(kern, grid, mesh)
    batch = max(1, int(batch))

    # upload the whole wind record ONCE; windows are sliced on device
    ud = jnp.asarray(ud, dtype=dtype)
    vd = jnp.asarray(vd, dtype=dtype)

    fields = []
    with timed_stage(f"FTLE series: {len(starts)} windows"):
        for _chunk, out in _iter_series_chunks(
                ud, vd, starts, window, timestep, grid, batch=batch,
                mesh=mesh, settls_order=settls_order,
                interp_order=interp_order, sigma=sigma, compat=compat,
                kern=kern):
            fields.append(out)
    data = np.concatenate(fields, axis=0)

    stamps = np.asarray(times)[_stamp_indices(starts, window, timestep)]
    return Field(data, (propdim, "latitude", "longitude"),
                 {propdim: stamps, "latitude": lats, "longitude": lons},
                 name="ftle")


def _stamp_tag(stamp) -> str:
    return np.datetime_as_string(np.datetime64(stamp), unit="h") \
        if np.issubdtype(np.asarray(stamp).dtype, np.datetime64) \
        else str(stamp)


def ftle_series_to_files(u, v, timestep: float, outdir: str, *,
                         window: int, stride: int = 1,
                         overwrite: bool = False, batch="auto", mesh=None,
                         settls_order: int = 4, interp_order: int = 3,
                         sigma=None, compat: bool = True,
                         kernel: str = "auto", propdim: str = "time",
                         cyclic_x: bool = True) -> list[str]:
    """Streaming variant: one netCDF/HDF5 file per window timestamp.

    Streams for real: each chunk of windows is written as soon as it is
    computed, so a crash at window N loses at most one chunk of compute and
    host memory stays O(batch) fields, not O(series).  On re-invocation,
    windows whose output file already exists are dropped *before* compute
    (unless ``overwrite``) — resume skips the work, not just the write.
    """
    import jax.numpy as jnp

    from .api import _resolve_kernel
    from .utils.io import save_dataset

    os.makedirs(outdir, exist_ok=True)
    ud, vd, lats, lons, times = _prep_record(u, v, propdim)
    grid = Grid(lats=lats, lons=lons, cyclic_x=cyclic_x)
    starts = _windows(ud.shape[0], window, stride)
    if not starts:
        raise ValueError(f"record of {ud.shape[0]} steps is shorter than "
                         f"window={window}")
    kern = _resolve_kernel(kernel, int(interp_order))
    dtype = np.float32 if kern == "pallas" else np.float64

    stamps = np.asarray(times)[_stamp_indices(starts, window, timestep)]
    paths = {s: os.path.join(outdir, f"ftle_{_stamp_tag(st)}.nc")
             for s, st in zip(starts, stamps)}
    stamp_of = dict(zip(starts, stamps))
    if overwrite:
        todo = starts
    else:
        todo = [s for s in starts if not os.path.exists(paths[s])]
        for s in starts:
            if s not in todo:
                logger.info("skip existing %s", paths[s])
    if not todo:
        return []

    if batch == "auto":
        batch = _auto_batch(kern, grid, mesh)
    batch = max(1, int(batch))
    ud = jnp.asarray(ud, dtype=dtype)
    vd = jnp.asarray(vd, dtype=dtype)

    written = []
    with timed_stage(f"FTLE series → files: {len(todo)} windows"):
        for chunk, out in _iter_series_chunks(
                ud, vd, todo, window, timestep, grid, batch=batch,
                mesh=mesh, settls_order=settls_order,
                interp_order=interp_order, sigma=sigma, compat=compat,
                kern=kern):
            for s, field2d in zip(chunk, out):
                stamp = stamp_of[s]
                fld = Field(field2d[None], (propdim, "latitude", "longitude"),
                            {propdim: np.asarray([stamp]),
                             "latitude": lats, "longitude": lons},
                            name="ftle")
                if save_dataset({"ftle": fld}, paths[s],
                                skip_if_exists=not overwrite):
                    written.append(paths[s])
    return written
