"""Decompose the per-slot cost of the manual-DMA engine's tile body.

Standings (ROUND3_NOTES session 7): the flagship scan sits at ~1363 ms
~= 160 gather-group launches x ~8.5 ms, and the launch-config sweep is
exhausted — the remaining time is INSIDE the slot bodies.  This probe
times ONE real gather group (``pallas_interp_multi``, flagship geometry,
F=4, dma-all engine, sort-mode ladder) repeatedly inside a single
program, then re-times it with individual body stages monkeypatched to
no-ops.  The deltas attribute the ~7 us/slot to:

  full        — baseline (real body)
  noflag      — tap-offset builds + the 20 any-reductions of the
                overflow flag skipped (interior path keeps direct basis)
  nofinish    — _finish_y (y-basis eval + masked per-field lane reduce)
                replaced by a single cheap lane slice
  nobasis     — _basis_direct (piecewise-B3 lane evaluation) replaced by
                a constant basis (broadcast + iota costs stay)
  defaultprec — MXU contraction at DEFAULT precision instead of HIGHEST
                (numerics-invalid; measures the 6-pass premium)
  nounwrap    — _unwrap_k period math replaced by zeros

Each variant is a separate trace/compile (env-knob-free monkeypatching).
Run: timeout 3600 python tools/probe_slotbody.py [variant ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from lagrangiancoherence_tpu.grid import global_quarter_degree_grid
from lagrangiancoherence_tpu.models.settls import _sort_ladder
from lagrangiancoherence_tpu.ops import pallas_interp as pi
from lagrangiancoherence_tpu.ops.interp import prefilter

K_REPS = 40


def build_inputs():
    """Flagship-like single gather group: F=4 fields, displacement field
    shaped like the post-sort mid-scan state (most tiles quarter-fit,
    a realistic minority escalated)."""
    grid = global_quarter_degree_grid()
    ny, nx = grid.shape
    LON, LAT = np.meshgrid(np.deg2rad(grid.lons), np.deg2rad(grid.lats))
    flds = np.stack([
        25.0 * np.cos(LAT) + 3.0 * np.cos(3 * LON) * np.sin(2 * LAT),
        3.0 * np.sin(3 * LON) * np.cos(2 * LAT),
        20.0 * np.cos(LAT) - 2.0 * np.sin(2 * LON) * np.sin(LAT),
        2.0 * np.cos(4 * LON) * np.cos(2 * LAT),
    ]).astype(np.float32)                        # (4, ny, nx)

    # displacement: smooth few-cell drift + a capped polar amplification
    # (the sort keeps storage-local spans; emulate with a tanh cap)
    lat = np.deg2rad(grid.lats)[:, None]
    amp = np.tanh(1.0 / np.maximum(np.cos(lat), 1e-3) / 20.0) * 20.0
    dx = (3.0 * np.sin(2 * LON + 1.0) + amp) * 0.25      # deg
    dy = 1.5 * np.cos(3 * LON) * np.cos(lat) * 0.25
    px = (grid.lons[None, :] + dx).astype(np.float32)
    py = np.clip(grid.lats[:, None] + dy, grid.y_min,
                 grid.y_max).astype(np.float32) + 0 * LON.astype(np.float32)
    return grid, jnp.asarray(flds), jnp.asarray(px), jnp.asarray(py)


def make_fn(grid, flds, engine):
    ny, nx = grid.shape
    ladder = _sort_ladder()

    def run(flds, px, py):
        cw = prefilter(flds, order=3)
        cwp = pi.pad_coeffs_for_pallas(cw)
        ny_tf = -(-ny // pi.TILE_R) * pi.TILE_R
        nx_t = -(-nx // pi.TILE_C) * pi.TILE_C
        pr = ny_tf + pi.POLE_PAD - ny
        wrap = jnp.take(flds, jnp.arange(pr) % ny, axis=1)
        raw_p = jnp.pad(jnp.concatenate([flds, wrap], axis=1),
                        ((0, 0), (0, 0), (0, nx_t - nx)))

        def body(i, acc):
            out, fl = pi.pallas_interp_multi(
                raw_p, cwp, px + acc * 1e-30, py, ny=ny, nx=nx,
                y_min=grid.y_min, y_max=grid.y_max,
                x_min=grid.x_min, x_max=grid.x_max,
                order=3, wy=32, wx=256, ladder=ladder, engine=engine,
                f0=0, nf=4, raw_prepadded=True)
            return acc + jnp.mean(out) * 1e-20 + fl.astype(jnp.float32)

        return jax.lax.fori_loop(0, K_REPS, body, jnp.zeros(()))

    return jax.jit(run)


def _patch_empty_bodies(sub):
    def empty_sub(fyx, win_refs, out_ref, write_flag, y0, x0s, *,
                  F, ny, nx, WY, order, edge, **kw):
        write_flag(jnp.zeros((), jnp.int32))
        for f in range(F):
            out_ref[f] = jnp.zeros(out_ref.shape[1:], out_ref.dtype)

    def empty_spline(fyx, win_ref, out_ref, write_flag, y0, x0, *,
                     F, ny, nx, WY, WX, order, x_full, edge=None, **kw):
        write_flag(jnp.zeros((), jnp.int32))
        for f in range(F):
            out_ref[f] = jnp.zeros(out_ref.shape[1:], out_ref.dtype)
    sub("_sub_tile_body", empty_sub)
    sub("_spline_tile_body", empty_spline)


def patch(variant):
    """Monkeypatch pi internals for one variant; returns an undo fn."""
    saved = []   # (obj, attr, original) triples

    def sub(name, fn, obj=pi):
        saved.append((obj, name, getattr(obj, name)))
        setattr(obj, name, fn)

    if variant == "noflag":
        # constant offsets: the bounds compares and any-reductions fold
        # away, and the tap-offset mirror/select chains are never built
        sub("_tap_offsets",
            lambda fold_c, kper, base, n, order:
            [jnp.zeros_like(jnp.floor(fold_c).astype(jnp.int32))
             for _ in range(4 if order == 3 else 2)])
    elif variant == "nofinish":
        def cheap_finish(g3, build_y, out_ref, F, WY, dtype,
                         in_range=None, tr=pi.TILE_R):
            v = g3[:, :, 0].astype(dtype)   # one lane extract, reused
            for f in range(F):
                out_ref[f] = v
        sub("_finish_y", cheap_finish)
    elif variant == "nobasis":
        sub("_basis_direct",
            lambda pos_rel, iota, order:
            jnp.full(iota.shape, 0.25, pos_rel.dtype))
    elif variant == "defaultprec":
        sub("_HIGH", jax.lax.Precision.DEFAULT)
    elif variant == "nounwrap":
        sub("_unwrap_k",
            lambda fold_c, anchor, n:
            jnp.zeros(fold_c.shape, jnp.int32))
    elif variant == "intonehot":
        # interior basis via trivial-offset one-hot (floor+k taps, no
        # mirror chains): 3 W-passes per tap (12 for order 3) vs the
        # ~14-pass piecewise _bspline3 lane evaluation.  Numerically the
        # same weights (see _tap_weights docstring) — implementable for
        # real if it wins.
        def onehot_direct(pos_rel, iota, order):
            ff = jnp.floor(pos_rel)
            t = pos_rel - ff
            ws = pi._cubic_w(t) if order == 3 else (1.0 - t, t)
            ks = (-1, 0, 1, 2) if order == 3 else (0, 1)
            f0 = ff.astype(jnp.int32)
            acc = None
            for k, w in zip(ks, ws):
                oc = (f0 + k)[..., None]
                term = jnp.where(iota == oc, w[..., None], 0.0)
                acc = term if acc is None else acc + term
            return acc
        sub("_basis_direct", onehot_direct)
    elif variant == "combo":
        # noflag + nofinish + nobasis together (tests additivity)
        sub("_tap_offsets",
            lambda fold_c, kper, base, n, order:
            [jnp.zeros_like(jnp.floor(fold_c).astype(jnp.int32))
             for _ in range(4 if order == 3 else 2)])

        def cheap_finish(g3, build_y, out_ref, F, WY, dtype,
                         in_range=None, tr=pi.TILE_R):
            v = g3[:, :, 0].astype(dtype)
            for f in range(F):
                out_ref[f] = v
        sub("_finish_y", cheap_finish)
        sub("_basis_direct",
            lambda pos_rel, iota, order:
            jnp.full(iota.shape, 0.25, pos_rel.dtype))
    elif variant == "finB":
        # log-shift segmented lane reduce: 5 circular lane-rolls + adds
        # replace the F masked full-lane reduces; lane f*WY then holds
        # field f's sum (segments are 2^k-aligned, no wrap contamination
        # at the read lanes).  One static lane extract per field.
        from jax.experimental.pallas import tpu as pltpu

        def finish_logshift(g3, build_y, out_ref, F, WY, dtype,
                            in_range=None, tr=pi.TILE_R):
            F_WY = F * WY
            i3e = jax.lax.broadcasted_iota(jnp.int32,
                                           (tr, pi.TILE_C, F_WY), 2)
            P = g3 * build_y(i3e % WY)
            s = WY // 2
            while s >= 1:
                # pull lane l+s into l == circular roll by (L - s)
                P = P + pltpu.roll(P, F_WY - s, 2)
                s //= 2
            for f in range(F):
                val = P[:, :, f * WY]
                if in_range is not None:
                    val = jnp.where(in_range, val, 0.0)
                out_ref[f] = val.astype(dtype)
        sub("_finish_y", finish_logshift)
    elif variant == "finC":
        # MXU segment-sum: ONE (M,F*WY)@(F*WY,F*WY) dot against a 0/1
        # block-replicate matrix replaces the F masked lane reduces; the
        # per-field sums land replicated across each 32-lane segment,
        # read back with one static lane extract per field.
        def finish_dot(g3, build_y, out_ref, F, WY, dtype,
                       in_range=None, tr=pi.TILE_R):
            F_WY = F * WY
            cdt = g3.dtype
            i3e = jax.lax.broadcasted_iota(jnp.int32,
                                           (tr, pi.TILE_C, F_WY), 2)
            P = g3 * build_y(i3e % WY)
            il = jax.lax.broadcasted_iota(jnp.int32, (F_WY, F_WY), 0)
            jl = jax.lax.broadcasted_iota(jnp.int32, (F_WY, F_WY), 1)
            S = (il // WY == jl // WY).astype(cdt)
            o2 = jax.lax.dot_general(P.reshape(tr * pi.TILE_C, F_WY), S,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=cdt,
                                     precision=pi._HIGH)
            o3 = o2.reshape(tr, pi.TILE_C, F_WY)
            for f in range(F):
                val = o3[:, :, f * WY]
                if in_range is not None:
                    val = jnp.where(in_range, val, 0.0)
                out_ref[f] = val.astype(dtype)
        sub("_finish_y", finish_dot)
    elif variant == "noonehot":
        # discriminator: if the engine's per-slot pl.when branches are
        # if-converted (both sides execute), trivialising the EDGE
        # branch's one-hot build saves on EVERY tile (~0.8 ms/group);
        # if branches are real, savings ~ edge fraction only (~0.1)
        sub("_onehot_basis",
            lambda offs, ws, iota, W:
            jnp.full(iota.shape, 0.25, ws[0].dtype))
    elif variant == "finD":
        # evaluate the y basis ONCE on WY lanes and lane-tile it F times
        # (the mod-WY iota repeats the same WY values per field): B3
        # eval area /F, at the risk of the concat's lane relayout
        def finish_tiled(g3, build_y, out_ref, F, WY, dtype,
                         in_range=None, tr=pi.TILE_R):
            F_WY = F * WY
            i3s = jax.lax.broadcasted_iota(jnp.int32,
                                           (tr, pi.TILE_C, WY), 2)
            by_s = build_y(i3s)
            by = jnp.concatenate([by_s] * F, axis=2)
            P = g3 * by
            i3e = jax.lax.broadcasted_iota(jnp.int32,
                                           (tr, pi.TILE_C, F_WY), 2)
            fl = i3e // WY
            for f in range(F):
                val = jnp.sum(jnp.where(fl == f, P, 0.0), axis=2)
                if in_range is not None:
                    val = jnp.where(in_range, val, 0.0)
                out_ref[f] = val.astype(dtype)
        sub("_finish_y", finish_tiled)
    elif variant == "flagmm":
        # exact flag via ONE any-reduce: bounds-check min/max of the tap
        # offsets instead of any-reducing each tap separately.  Same
        # truth value (offsets unchanged), ~1/4 the reduce passes.
        real_offsets = pi._tap_offsets

        # the bodies do `for off in offs: over |= any(...)`; intercept by
        # returning a list-alike whose ITERATION yields only [mn, mx]
        # (flag loops see 2 entries, 1/2 the reduces and no per-tap
        # compare chains) while INDEXING still sees the real taps (the
        # edge one-hot path is built by index in the real code path; the
        # probe's zip-based _onehot_basis consumes the 2-iter view, which
        # skews edge tiles only — rare, acceptable for timing)
        def offsets_two(fold_c, kper, base, n, order):
            offs = real_offsets(fold_c, kper, base, n, order)
            mn, mx = offs[0], offs[0]
            for o in offs[1:]:
                mn = jnp.minimum(mn, o)
                mx = jnp.maximum(mx, o)
            return _TapsMM(offs, mn, mx)

        class _TapsMM:
            """List-alike: iterating for the FLAG sees only [mn, mx];
            indexing (edge one-hot path) sees the real taps."""
            def __init__(self, offs, mn, mx):
                self.offs = offs
                self.mm = [mn, mx]

            def __iter__(self):
                return iter(self.mm)

            def __getitem__(self, i):
                return self.offs[i]

            def __len__(self):
                return len(self.offs)
        sub("_tap_offsets", offsets_two)
    elif variant == "nodma":
        # empty bodies AND no window DMAs: isolates the per-slot DMA
        # issue/wait cost from the loop/launch machinery.  (Quarters
        # issue FOUR async copies + waits per slot.)
        class _NopCopy:
            def start(self):
                pass

            def wait(self):
                pass

        sub("make_async_copy", lambda *a, **k: _NopCopy(), obj=pi.pltpu)
        _patch_empty_bodies(sub)
    elif variant == "nokern":
        # engine kernel replaced by a constant writer: measures routing
        # + pole pass + launch/operand machinery without the engine loop
        def noop_engine(counts, sel_s, pack_s, x0q2_s,
                        f0_s, folds_ref, cw_hbm, outA_ref, out_ref,
                        flags_ref, win_buf, win_sems, **kw):
            out_ref[...] = outA_ref[...]
            for t_i in range(flags_ref.shape[0]):   # SMEM: scalar stores
                flags_ref[t_i, 0] = jnp.int32(0)
        sub("_engine_kernel", noop_engine)
    elif variant == "nopole":
        # pole compute body trivialised (launches + DMAs remain)
        def empty_pole(yc, xc, vmask, mask, win_ref, out_ref, write_flag,
                       y0, **kw):
            write_flag(jnp.zeros((), jnp.int32))
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)
        sub("_pole_block_body", empty_pole)
    elif variant == "empty":
        # trivial tile bodies: measures the launch + routing + DMA +
        # loop/scalar floor with ZERO tile compute
        _patch_empty_bodies(sub)
    elif variant != "full":
        raise SystemExit(f"unknown variant {variant}")

    def undo():
        for obj, name, orig in saved:
            setattr(obj, name, orig)

    return undo


def main():
    variants = [a for a in sys.argv[1:] if not a.startswith("-")] or \
        ["full", "noflag", "nofinish", "nobasis", "defaultprec",
         "nounwrap"]
    engine = os.environ.get("LCS_PALLAS_ENGINE", "dma-all")
    print("devices:", jax.devices(), "engine:", engine, flush=True)
    grid, flds, px, py = build_inputs()
    results = {}
    for variant in variants:
        undo = patch(variant)
        try:
            fn = make_fn(grid, flds, engine)
            t0 = time.perf_counter()
            acc = float(np.asarray(fn(flds, px, py)))
            comp = time.perf_counter() - t0
            t0 = time.perf_counter()
            acc = float(np.asarray(fn(flds, px, py)))
            dt = (time.perf_counter() - t0) / K_REPS
            results[variant] = dt
            print(f"{variant:12s}: {dt*1e3:8.3f} ms/group "
                  f"(compile {comp:.0f}s, acc={acc:.3g})", flush=True)
        except Exception as e:  # keep sweeping on per-variant failures
            print(f"{variant:12s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
        finally:
            undo()
    if "full" in results:
        base = results["full"]
        print(f"\nbaseline {base*1e3:.3f} ms/group; deltas:", flush=True)
        for k, v in results.items():
            if k != "full":
                print(f"  full - {k:12s} = {(base-v)*1e3:7.3f} ms/group "
                      f"({(base-v)/base*100:5.1f}%)", flush=True)


if __name__ == "__main__":
    main()
