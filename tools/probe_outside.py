"""Itemise the flagship's ~91 ms OUTSIDE-SCAN pool on the real TPU.

The round-4 trace (tools/probe_trace.py, ROUND4_NOTES) attributed ~91 ms
of the 1,085 ms field to everything outside the SETTLS lax.scan —
prefilter, the CWP 5-slab padded-coefficient assembly, the W_p raw-field
padding, flow-map gradient + norm — as ONE line.  This probe times each
stage as its own jitted program (subtractive where a stage builds on
another), plus A/B legs for the candidate fixes (prefilter einsum
precision, with on-device coefficient deltas).

Timing forces execution by downloading one scalar per output leaf — the
axon tunnel's ``block_until_ready`` returns before the program ran
(measured: a 1-second program "times" at 0.08 ms without the download).

Run in steps (each fits a tunnel-safe timeout):
    python tools/probe_outside.py totals
    python tools/probe_outside.py stages
    python tools/probe_outside.py prec
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

# bench-config env knobs (bx8 winner etc.) BEFORE library import reads them
_cfg_path = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_config.json")
if os.path.exists(_cfg_path):
    _cfg = json.load(open(_cfg_path))
    for k, v in (_cfg.get("env") or {}).items():
        os.environ.setdefault(str(k), str(v))
    if "pole_ladder" in _cfg:
        os.environ.setdefault("LCS_POLE_LADDER", str(_cfg["pole_ladder"]))

from lagrangiancoherence_tpu.grid import global_quarter_degree_grid
from lagrangiancoherence_tpu.models import settls
from lagrangiancoherence_tpu.models.ftle import ftle_from_departures
from lagrangiancoherence_tpu.models.pipeline import ftle_pipeline
from lagrangiancoherence_tpu.models.settls import parcel_propagation_core
from lagrangiancoherence_tpu.ops.interp import prefilter, spline_filter_matrix
from lagrangiancoherence_tpu.ops.pallas_interp import (POLE_PAD, TILE_C,
                                                       TILE_R,
                                                       pad_coeffs_for_pallas)


def flagship_winds(grid, nt=33):
    LON, LAT = np.meshgrid(np.deg2rad(grid.lons), np.deg2rad(grid.lats))
    base_u = 25.0 * np.cos(LAT) + 3.0 * np.cos(3 * LON) * np.sin(2 * LAT)
    base_v = 3.0 * np.sin(3 * LON) * np.cos(2 * LAT)
    t = np.arange(nt)[:, None, None]
    u = (base_u[None] * (1.0 + 0.05 * np.sin(2 * np.pi * t / nt))).astype(np.float32)
    v = (base_v[None] * (1.0 + 0.05 * np.cos(2 * np.pi * t / nt))).astype(np.float32)
    return jnp.asarray(u), jnp.asarray(v)


def _force(out):
    """Force + fence: download one scalar from every output leaf."""
    for a in jax.tree_util.tree_leaves(out):
        if hasattr(a, "ravel"):
            np.asarray(jnp.ravel(a)[0])


def timeit(fn, *args, reps=6, warm=2, name=""):
    try:
        for _ in range(warm):
            out = fn(*args)
        _force(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
            _force(out)
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"  {name:34s} {ms:9.3f} ms", flush=True)
        return ms, out
    except Exception as e:  # noqa: BLE001
        print(f"  {name:34s} FAILED {type(e).__name__}: {str(e)[:140]}",
              flush=True)
        return float("nan"), None


GRID = global_quarter_degree_grid()
NY, NX = GRID.shape
T = 33


def pipe_fn(u, v):
    # EXACT bench.py signature (cache-shared with the driver's bench runs)
    return ftle_pipeline(u, v, -6.0 * 3600.0, GRID, settls_order=4,
                         interp_order=3, kernel="pallas", rebin="sort",
                         pallas_wy=32, pallas_engine="dma-all",
                         return_overflow=True)


def core_fn(u, v):
    return parcel_propagation_core(u, v, -6.0 * 3600.0, GRID,
                                   settls_order=4, interp_order=3,
                                   kernel="pallas")


def step_totals(u_j, v_j):
    print("== reference totals ==", flush=True)
    t_pipe, out = timeit(pipe_fn, u_j, v_j, reps=3, warm=1,
                         name="ftle_pipeline (total)")
    if out is not None:
        print(f"    overflow={int(np.asarray(out[1]))}", flush=True)
    t_core, core_out = timeit(core_fn, u_j, v_j, reps=3, warm=1,
                              name="parcel_propagation_core")
    print(f"    grad+norm by subtraction: {t_pipe - t_core:9.3f} ms",
          flush=True)
    return core_out


def step_stages(u_j, v_j):
    print("== outside-scan stages ==", flush=True)
    t_pref, _ = timeit(jax.jit(lambda u, v: (prefilter(u), prefilter(v))),
                       u_j, v_j, name="prefilter u+v (HIGHEST)")

    def build_cwp(u, v):
        cu, cv = prefilter(u), prefilter(v)
        CW = jnp.stack([cu, cv], axis=1)
        CWP = pad_coeffs_for_pallas(CW)
        return CWP.reshape(CWP.shape[0], T * 2, *CWP.shape[3:])

    t_cwp, cwp_out = timeit(jax.jit(build_cwp), u_j, v_j,
                            name="prefilter+stack+CWP 5-slab")
    if cwp_out is not None:
        gb = cwp_out.size * cwp_out.dtype.itemsize / 1e9
        print(f"    CWP shape {cwp_out.shape} = {gb:.2f} GB; "
              f"assembly-only by subtraction: {t_cwp - t_pref:.3f} ms",
              flush=True)
        del cwp_out

    def build_wp(u, v):
        W = jnp.stack([u, v], axis=1)
        ny_tf = -(-NY // TILE_R) * TILE_R
        nx_t = -(-NX // TILE_C) * TILE_C
        W_flat = W.reshape(T * 2, NY, NX)
        pr = ny_tf + POLE_PAD - NY
        W_wrap = jnp.take(W_flat, jnp.arange(pr) % NY, axis=1)
        return jnp.pad(jnp.concatenate([W_flat, W_wrap], axis=1),
                       ((0, 0), (0, 0), (0, nx_t - NX)))

    timeit(jax.jit(build_wp), u_j, v_j, name="W_p raw assembly")

    # gradient + norm on realistic departure points (cached core program)
    px, py = core_fn(u_j, v_j)
    timeit(jax.jit(lambda a, b: ftle_from_departures(a, b, GRID)),
           px, py, name="flowmap gradient + norm")

    bands = settls._sort_bands(GRID, 3)
    px0, py0 = GRID.mesh_xy
    pxj = jnp.asarray(px0, jnp.float32)
    pyj = jnp.asarray(py0, jnp.float32)
    cvj = jnp.ones_like(pxj)
    pmj = jnp.zeros(pxj.shape, jnp.int32)
    timeit(jax.jit(lambda a, b, c, d: settls._sort_bin_bands(
        (a, b, c, d), a, b, bands, GRID)), pxj, pyj, cvj, pmj,
        name="one sort-bin pass")


def step_prec(u_j, v_j):
    print("== prefilter precision A/B ==", flush=True)
    prec = jax.lax.Precision

    def pref_at(p):
        my = jnp.asarray(spline_filter_matrix(NY, 3), dtype=jnp.float32)
        mx = jnp.asarray(spline_filter_matrix(NX, 3), dtype=jnp.float32)

        def f(a):
            c = jnp.einsum("ij,...jk->...ik", my, a, precision=p)
            return jnp.einsum("...ij,kj->...ik", c, mx, precision=p)
        return jax.jit(lambda u, v: (f(u), f(v)))

    ref_fn = jax.jit(lambda u, v: (prefilter(u), prefilter(v)))
    ref_c = ref_fn(u_j, v_j)
    scale = float(jnp.max(jnp.abs(ref_c[0])))
    for nm, p in (("HIGHEST", prec.HIGHEST), ("HIGH", prec.HIGH),
                  ("DEFAULT", prec.DEFAULT)):
        t, o = timeit(pref_at(p), u_j, v_j, name=f"prefilter u+v ({nm})")
        if o is not None:
            d = float(jnp.max(jnp.abs(o[0] - ref_c[0])))
            print(f"    {nm} maxabs dc={d:.3e} (rel {d / scale:.2e})",
                  flush=True)


def main():
    steps = sys.argv[1:] or ["totals", "stages", "prec"]
    print("devices:", jax.devices(), "steps:", steps, flush=True)
    u_j, v_j = flagship_winds(GRID)
    if "totals" in steps:
        step_totals(u_j, v_j)
    if "stages" in steps:
        step_stages(u_j, v_j)
    if "prec" in steps:
        step_prec(u_j, v_j)
    print("done", flush=True)


if __name__ == "__main__":
    main()
