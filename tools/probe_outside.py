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


def timeit(fn, *args, reps=6, warm=2, name="", keep=True):
    """``keep=False`` drops each rep's output before the next call —
    REQUIRED for multi-GB outputs (holding rep N's result while rep N+1
    allocates doubles the footprint and OOMs the 16 GB HBM)."""
    try:
        out = None
        for _ in range(warm):
            del out
            out = fn(*args)
            _force(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            del out
            out = fn(*args)
            _force(out)
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"  {name:34s} {ms:9.3f} ms", flush=True)
        if not keep:
            out = None
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


def step_stages(u_j, v_j):
    print("== outside-scan stages ==", flush=True)
    t_pref, _ = timeit(jax.jit(lambda u, v: (prefilter(u), prefilter(v))),
                       u_j, v_j, name="prefilter u+v (HIGHEST)")

    def build_cwp(u, v):
        cu, cv = prefilter(u), prefilter(v)
        CW = jnp.stack([cu, cv], axis=1)
        CWP = pad_coeffs_for_pallas(CW)
        CWP = CWP.reshape(CWP.shape[0], T * 2, *CWP.shape[3:])
        # materialise the full 6.5 GB stack (barrier defeats slice-into-
        # producer fusion) but OUTPUT only a strided sample — holding two
        # full stacks across timing reps OOMs the HBM
        CWP = jax.lax.optimization_barrier(CWP)
        return CWP[:, :, ::8, ::8]

    t_cwp, cwp_out = timeit(jax.jit(build_cwp), u_j, v_j,
                            name="prefilter+stack+CWP 5-slab")
    if cwp_out is not None:
        print(f"    assembly-only by subtraction: {t_cwp - t_pref:.3f} ms",
              flush=True)
    del cwp_out

    def build_wp(u, v):
        W = jnp.stack([u, v], axis=1)
        ny_tf = -(-NY // TILE_R) * TILE_R
        nx_t = -(-NX // TILE_C) * TILE_C
        W_flat = W.reshape(T * 2, NY, NX)
        pr = ny_tf + POLE_PAD - NY
        W_wrap = jnp.take(W_flat, jnp.arange(pr) % NY, axis=1)
        out = jnp.pad(jnp.concatenate([W_flat, W_wrap], axis=1),
                      ((0, 0), (0, 0), (0, nx_t - NX)))
        return jax.lax.optimization_barrier(out)[:, ::8, ::8]

    timeit(jax.jit(build_wp), u_j, v_j, name="W_p raw assembly")

    # gradient + norm on synthetic drift-class departure points (the
    # stage's cost is value-independent; avoids a fresh ~5-min
    # parcel_propagation_core compile through the tunnel)
    rng = np.random.default_rng(0)
    px0, py0 = GRID.mesh_xy
    px = jnp.asarray(px0 + 8.0 * rng.standard_normal(px0.shape),
                     jnp.float32)
    py = jnp.asarray(np.clip(py0 + 5.0 * rng.standard_normal(py0.shape),
                             -90, 90), jnp.float32)
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
    # (a BANDED leg measured 417.9 ms on 2026-08-21 — the banded-conv
    # prefilter was deleted after that falsification; see ops/interp.py)


def step_prefvar(u_j, v_j):
    """Which leg of the 67 ms dense prefilter is slow — and does the
    transpose-to-clean-2-D-matmul formulation fix it?  (The DEFAULT-
    precision leg measuring ~54 ms vs HIGHEST 67 proved the einsum is
    layout-bound, not compute-bound.)"""
    print("== prefilter formulation variants ==", flush=True)
    prec = jax.lax.Precision.HIGHEST
    my = jnp.asarray(spline_filter_matrix(NY, 3), dtype=jnp.float32)
    mx = jnp.asarray(spline_filter_matrix(NX, 3), dtype=jnp.float32)

    def y_einsum(u, v):
        return tuple(jnp.einsum("ij,...jk->...ik", my, a, precision=prec)
                     for a in (u, v))

    def x_einsum(u, v):
        return tuple(jnp.einsum("...ij,kj->...ik", a, mx, precision=prec)
                     for a in (u, v))

    def y_mm(a):
        # (T, ny, nx) -> (ny, T*nx) clean 2-D matmul -> back
        t_, ny_, nx_ = a.shape
        at = a.transpose(1, 0, 2).reshape(ny_, t_ * nx_)
        c = jax.numpy.matmul(my, at, precision=prec)
        return c.reshape(ny_, t_, nx_).transpose(1, 0, 2)

    def x_mm(a):
        t_, ny_, nx_ = a.shape
        c = jax.numpy.matmul(a.reshape(t_ * ny_, nx_), mx.T,
                             precision=prec)
        return c.reshape(t_, ny_, nx_)

    timeit(jax.jit(y_einsum), u_j, v_j, name="y-pass einsum only")
    timeit(jax.jit(x_einsum), u_j, v_j, name="x-pass einsum only")
    timeit(jax.jit(lambda u, v: (y_mm(u), y_mm(v))), u_j, v_j,
           name="y-pass 2-D matmul")
    timeit(jax.jit(lambda u, v: (x_mm(u), x_mm(v))), u_j, v_j,
           name="x-pass 2-D matmul")
    full = jax.jit(lambda u, v: (x_mm(y_mm(u)), x_mm(y_mm(v))))
    t, o = timeit(full, u_j, v_j, name="full 2-D-matmul prefilter")
    if o is not None:
        os.environ["LCS_PREFILTER_BANDED"] = "0"
        jax.clear_caches()
        ref = jax.jit(lambda u, v: (prefilter(u), prefilter(v)))(u_j, v_j)
        d = float(jnp.max(jnp.abs(o[0] - ref[0])))
        s = float(jnp.max(jnp.abs(ref[0])))
        print(f"    2-D-matmul maxabs dc={d:.3e} (rel {d / s:.2e})",
              flush=True)


def step_prefcal(u_j, v_j):
    """Separate harness/dispatch overhead from real prefilter cost: an
    identity program bounds the per-call overhead; a 10x-chained
    prefilter's marginal slope is the true per-prefilter device cost."""
    print("== prefilter calibration ==", flush=True)
    timeit(jax.jit(lambda u, v: (u + 0.0, v + 0.0)), u_j, v_j,
           name="identity (+0.0) program")

    def chain(n):
        def f(u, v):
            a, b = u, v
            for _ in range(n):
                a = prefilter(a)
                b = prefilter(b)
            return a, b
        return jax.jit(f)

    t1, _ = timeit(chain(1), u_j, v_j, name="prefilter x1")
    t10, _ = timeit(chain(10), u_j, v_j, name="prefilter x10")
    print(f"    marginal per-prefilter (pair): {(t10 - t1) / 9.0:.3f} ms",
          flush=True)


def main():
    steps = sys.argv[1:] or ["totals", "stages", "prec"]
    print("devices:", jax.devices(), "steps:", steps, flush=True)
    u_j, v_j = flagship_winds(GRID)
    run = {"totals": step_totals, "stages": step_stages, "prec": step_prec,
           "prefvar": step_prefvar, "prefcal": step_prefcal}
    for s in steps:               # CLI order — a step that OOMs the
        run[s](u_j, v_j)          # device must not shadow earlier steps
    print("done", flush=True)


if __name__ == "__main__":
    main()
