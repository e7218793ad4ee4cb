"""One-shot device sweep of the pallas launch-config space on the real
flagship pipeline: engine x tier-A-sub x tier-A window height x pole
ladder — the combinations the per-knob probes (probe_engine/probe_sort)
never crossed.  Every knob here is trace-time (env or kwarg), so one
process sweeps them all; each leg is independently fault-tolerant.

Rationale (ROUND3_NOTES session 5/6): the serial manual-DMA engine runs
~7 us/slot compute-bound with no cross-iteration pipelining, while the
blockspec grid pipeline hits ~2.8 us/tile but pays ~1.6 us per DEAD
ladder slot and a second full-grid pass for tier A-sub.  Sort-binning
(now default) collapses tap spans, which changes every one of those
trade-offs — the winners must be re-crossed on silicon.

Run: python tools/probe_config.py
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

from lagrangiancoherence_tpu.grid import global_quarter_degree_grid
from lagrangiancoherence_tpu.models.pipeline import ftle_pipeline


def flagship_winds(grid, nt=33):
    LON, LAT = np.meshgrid(np.deg2rad(grid.lons), np.deg2rad(grid.lats))
    base_u = 25.0 * np.cos(LAT) + 3.0 * np.cos(3 * LON) * np.sin(2 * LAT)
    base_v = 3.0 * np.sin(3 * LON) * np.cos(2 * LAT)
    t = np.arange(nt)[:, None, None]
    u = (base_u[None] * (1.0 + 0.05 * np.sin(2 * np.pi * t / nt))
         ).astype(np.float32)
    v = (base_v[None] * (1.0 + 0.05 * np.cos(2 * np.pi * t / nt))
         ).astype(np.float32)
    return jnp.asarray(u), jnp.asarray(v)


# (name, engine, half_tile, pallas_wy, pole_ladder, unroll, fuse)
# fuse: always None — the fused-iterate engine was deleted round 4
# (measured-broken + premise falsified; see models/settls.py).
# Round-3 honest re-sweep: the env-only legs of the round-2 sweep
# (head-u2/u4, head-pole8, dmaall-half0) silently reused head's trace
# (see the clear_caches note below) and must be re-measured.
CONFIGS = [
    ("head",         "dma-all",   True,  32, "16,160,288", 1, None),
    ("head-u2",      "dma-all",   True,  32, "16,160,288", 2, None),
    ("head-u4",      "dma-all",   True,  32, "16,160,288", 4, None),
    ("head-u8",      "dma-all",   True,  32, "16,160,288", 8, None),
    ("dmaall-half0", "dma-all",   False, 32, "16,160,288", 1, None),
    ("head-pole8",   "dma-all",   True,  32, "8,160,288",  1, None),
    ("head-pole24",  "dma-all",   True,  32, "24,160,288", 1, None),
    ("head-nb6",     "dma-all",   True,  32, "16,160,288", 1, None,
     {"LCS_ENGINE_NB": "6"}),
]

# second-round legs on top of the u2 winner (LCS_ROUND2_LEGS=1): sort
# cadence/bucket knobs and the wy16 y-basis-area cut, all untested
# combinations after the phantom-leg fix
CONFIGS_R2 = [
    ("head-u2",        "dma-all", True,  32, "16,160,288", 2, None),
    ("u2-sortk1",      "dma-all", True,  32, "16,160,288", 2, None,
     {"LCS_SORT_K": "1"}),
    ("u2-bx16",        "dma-all", True,  32, "16,160,288", 2, None,
     {"LCS_SORT_BX": "16"}),
    ("u2-sortk1-bx16", "dma-all", True,  32, "16,160,288", 2, None,
     {"LCS_SORT_K": "1", "LCS_SORT_BX": "16"}),
    ("u2-wy16",        "dma-all", True,  16, "16,160,288", 2, None),
    ("u2-nb6",         "dma-all", True,  32, "16,160,288", 2, None,
     {"LCS_ENGINE_NB": "6"}),
    ("u2-pole24",      "dma-all", True,  32, "24,160,288", 2, None),
]

# round-4 legs (LCS_ROUND4_LEGS=1): sort cadence/bucket re-cross after
# the cond-free unrolled scan body + single-pass pole escalation (the
# old sortk1/bx legs were measured under the per-step lax.cond regime
# the round-4 rework removed).  fuse column retained as None-only (the
# fused engine was deleted round 4).
CONFIGS_R4 = [
    ("head",          "dma-all", True, 32, "32,160,288", 2, None,
     {"LCS_SORT_BX": "16"}),
    ("sortk1",        "dma-all", True, 32, "32,160,288", 2, None,
     {"LCS_SORT_BX": "16", "LCS_SORT_K": "1"}),
    ("bx8",           "dma-all", True, 32, "32,160,288", 2, None,
     {"LCS_SORT_BX": "8"}),
    ("sortk1-bx8",    "dma-all", True, 32, "32,160,288", 2, None,
     {"LCS_SORT_BX": "8", "LCS_SORT_K": "1"}),
    ("pole40",        "dma-all", True, 32, "40,160,288", 2, None,
     {"LCS_SORT_BX": "16"}),
    ("pole24-192",    "dma-all", True, 32, "24,160,192", 2, None,
     {"LCS_SORT_BX": "16"}),
    ("u3",            "dma-all", True, 32, "32,160,288", 3, None,
     {"LCS_SORT_BX": "16"}),
]

# round-5 legs (LCS_ROUND5_LEGS=1): re-cross around the recorded round-4
# winner (bx8 x pole24-192 x u2) at the round-5 HEAD (slice-only stack
# assembly + seam-aware circular-anchor sort key) — VERDICT round-4
# task 1c: the top four round-4 legs sat within ~0.5% (noise class), so
# the composition must be re-measured.  The seam key removes the
# per-group straddle tile, shifting the sort-geometry trade-offs: bx16
# and wider sort bands (lat55/50) are re-crossed too.
CONFIGS_R5 = [
    ("r5head",      "dma-all", True, 32, "24,160,192", 2, None,
     {"LCS_SORT_BX": "8"}),
    ("sortk1",      "dma-all", True, 32, "24,160,192", 2, None,
     {"LCS_SORT_BX": "8", "LCS_SORT_K": "1"}),
    ("bx4",         "dma-all", True, 32, "24,160,192", 2, None,
     {"LCS_SORT_BX": "4"}),
    ("bx16",        "dma-all", True, 32, "24,160,192", 2, None,
     {"LCS_SORT_BX": "16"}),
    ("pole16-192",  "dma-all", True, 32, "16,160,192", 2, None,
     {"LCS_SORT_BX": "8"}),
    ("lat55",       "dma-all", True, 32, "24,160,192", 2, None,
     {"LCS_SORT_BX": "8", "LCS_SORT_LAT": "55"}),
    ("lat50",       "dma-all", True, 32, "24,160,192", 2, None,
     {"LCS_SORT_BX": "8", "LCS_SORT_LAT": "50"}),
    ("u3",          "dma-all", True, 32, "24,160,192", 3, None,
     {"LCS_SORT_BX": "8"}),
]

# round-5B legs (LCS_ROUND5B_LEGS=1): post-merged-pole-launch re-cross —
# the pole sections now ride the engine (each slot evaluated once at its
# assigned level; no standalone launch), so the pole-ladder and engine
# unroll/prefetch trade-offs changed shape; sort cadence K=4 halves the
# lax.sort copies the trace attributes ~12 ms/field to.
CONFIGS_R5B = [
    ("r5bhead",     "dma-all", True, 32, "24,160,192", 2, None,
     {"LCS_SORT_BX": "8"}),
    ("u3",          "dma-all", True, 32, "24,160,192", 3, None,
     {"LCS_SORT_BX": "8"}),
    ("u4",          "dma-all", True, 32, "24,160,192", 4, None,
     {"LCS_SORT_BX": "8"}),
    ("pole16-192",  "dma-all", True, 32, "16,160,192", 2, None,
     {"LCS_SORT_BX": "8"}),
    ("k4",          "dma-all", True, 32, "24,160,192", 2, None,
     {"LCS_SORT_BX": "8", "LCS_SORT_K": "4"}),
    ("nb4",         "dma-all", True, 32, "24,160,192", 1, None,
     {"LCS_SORT_BX": "8", "LCS_ENGINE_NB": "4"}),
]

# round-5C legs (LCS_ROUND5C_LEGS=1): the 5B surprise — unroll=1 with a
# 4-deep prefetch ring beat the 2-way unrolled body by 32 ms at the
# merged-pole HEAD (1041.8 vs 1073.4; the unroll's per-slot pl.when
# gates cost more than the ILP buys once the pole launches are gone) —
# so cross the ring depth itself.
CONFIGS_R5C = [
    ("nb5",  "dma-all", True, 32, "24,160,192", 1, None,
     {"LCS_SORT_BX": "8", "LCS_ENGINE_NB": "5"}),
    ("nb6",  "dma-all", True, 32, "24,160,192", 1, None,
     {"LCS_SORT_BX": "8", "LCS_ENGINE_NB": "6"}),
    ("nb8",  "dma-all", True, 32, "24,160,192", 1, None,
     {"LCS_SORT_BX": "8", "LCS_ENGINE_NB": "8"}),
]

# round-5D legs (LCS_ROUND5D_LEGS=1): sort-knob re-cross under the new
# u1-nb6 regime (bx/sortk1 were tuned under u2; the engine slot order
# interacts with storage locality differently without the unroll).
CONFIGS_R5D = [
    ("bx4-nb6",    "dma-all", True, 32, "24,160,192", 1, None,
     {"LCS_SORT_BX": "4", "LCS_ENGINE_NB": "6"}),
    ("sortk1-nb6", "dma-all", True, 32, "24,160,192", 1, None,
     {"LCS_SORT_BX": "8", "LCS_SORT_K": "1", "LCS_ENGINE_NB": "6"}),
    ("bx16-nb6",   "dma-all", True, 32, "24,160,192", 1, None,
     {"LCS_SORT_BX": "16", "LCS_ENGINE_NB": "6"}),
]

# round-5E legs (LCS_ROUND5E_LEGS=1): pole ladder x sort band under the
# final bx4-nb6 regime (both were last crossed under u2).
CONFIGS_R5E = [
    ("pole16-bx4nb6", "dma-all", True, 32, "16,160,192", 1, None,
     {"LCS_SORT_BX": "4", "LCS_ENGINE_NB": "6"}),
    ("pole32-bx4nb6", "dma-all", True, 32, "32,160,192", 1, None,
     {"LCS_SORT_BX": "4", "LCS_ENGINE_NB": "6"}),
    ("lat55-bx4nb6",  "dma-all", True, 32, "24,160,192", 1, None,
     {"LCS_SORT_BX": "4", "LCS_ENGINE_NB": "6", "LCS_SORT_LAT": "55"}),
]

# third round on top of u2-bx16: sort-band width + pole level-1 height
CONFIGS_R3 = [
    ("u2bx16",         "dma-all", True,  32, "16,160,288", 2, None,
     {"LCS_SORT_BX": "16"}),
    ("u2bx16-lat55",   "dma-all", True,  32, "16,160,288", 2, None,
     {"LCS_SORT_BX": "16", "LCS_SORT_LAT": "55"}),
    ("u2bx16-lat50",   "dma-all", True,  32, "16,160,288", 2, None,
     {"LCS_SORT_BX": "16", "LCS_SORT_LAT": "50"}),
    ("u2bx16-pole32",  "dma-all", True,  32, "32,160,288", 2, None,
     {"LCS_SORT_BX": "16"}),
    ("u2bx16-lat55-pole32", "dma-all", True, 32, "32,160,288", 2, None,
     {"LCS_SORT_BX": "16", "LCS_SORT_LAT": "55"}),
]


def main():
    print("devices:", jax.devices(), flush=True)
    grid = global_quarter_degree_grid()
    u, v = flagship_winds(grid)
    table = {}
    ref = None
    legs = CONFIGS
    if os.environ.get("LCS_ROUND2_LEGS"):
        legs = CONFIGS_R2
    if os.environ.get("LCS_ROUND3_LEGS"):
        legs = CONFIGS_R3
    if os.environ.get("LCS_ROUND4_LEGS"):
        legs = CONFIGS_R4
    if os.environ.get("LCS_ROUND5_LEGS"):
        legs = CONFIGS_R5
    if os.environ.get("LCS_ROUND5B_LEGS"):
        legs = CONFIGS_R5B
    if os.environ.get("LCS_ROUND5C_LEGS"):
        legs = CONFIGS_R5C
    if os.environ.get("LCS_ROUND5D_LEGS"):
        legs = CONFIGS_R5D
    if os.environ.get("LCS_ROUND5E_LEGS"):
        legs = CONFIGS_R5E
    for spec_row in legs:
        name, eng, half, wy, pole, unroll, fuse = spec_row[:7]
        extra_env = spec_row[7] if len(spec_row) > 7 else {}
        os.environ["LCS_HALF_TILE"] = "1" if half else "0"
        os.environ["LCS_POLE_LADDER"] = pole
        os.environ["LCS_ENGINE_UNROLL"] = str(unroll)
        for k_p in ("LCS_ENGINE_NB", "LCS_SORT_K", "LCS_SORT_BX",
                    "LCS_SORT_LAT"):
            os.environ.pop(k_p, None)
        for k_e, v_e in extra_env.items():
            os.environ[k_e] = v_e
        # env knobs are read at TRACE time, and ftle_pipeline /
        # parcel_propagation_core are themselves jitted: two legs with
        # identical static args would silently REUSE the first leg's
        # trace, making env-only legs phantom copies of it (this bit the
        # round-2 sweep: head-fuse/head-u2/head-pole8 never actually ran
        # their configs).  Clear every jit cache so each leg re-traces;
        # the persistent compile cache still skips identical recompiles.
        jax.clear_caches()
        try:
            fn = jax.jit(lambda u, v, eng=eng, wy=wy: ftle_pipeline(
                u, v, -6.0 * 3600.0, grid, settls_order=4, interp_order=3,
                kernel="pallas", pallas_engine=eng, pallas_wy=wy,
                return_overflow=True))
            t0 = time.perf_counter()
            out, fl = fn(u, v)
            oh = np.asarray(out)
            print(f"{name:14} compile+first {time.perf_counter()-t0:6.1f} s",
                  flush=True)
            t0 = time.perf_counter()
            for _ in range(3):
                out, fl = fn(u, v)
            oh = np.asarray(out)
            dt = (time.perf_counter() - t0) / 3
            flag = int(fl)
            ok = flag == 0 and np.isfinite(oh[2:-2]).all()
            print(f"{name:14} {dt*1e3:8.1f} ms/field ({1.0/dt:.3f} fields/s)"
                  f" flag={flag:#x}{'' if ok else '  [EXCLUDED]'}",
                  flush=True)
            if ok:
                table[name] = 1.0 / dt
            if ref is None:
                ref = oh      # first successful leg anchors the record
            else:
                # layout/engine changes must be numerically inert beyond
                # chaos-amplified ulps; report p99 |dlogFTLE| for the record
                a = np.log(np.maximum(oh[2:-2], 1e-30)) / 2
                b = np.log(np.maximum(ref[2:-2], 1e-30)) / 2
                print(f"{name:14} p99|dlogFTLE vs head| = "
                      f"{np.percentile(np.abs(a-b), 99):.2e}", flush=True)
        except Exception as e:  # noqa: BLE001 — report and move on
            print(f"{name:14} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    for k in ("LCS_HALF_TILE", "LCS_POLE_LADDER",
              "LCS_ENGINE_UNROLL", "LCS_ENGINE_NB",
              "LCS_SORT_K", "LCS_SORT_BX", "LCS_SORT_LAT"):
        os.environ.pop(k, None)

    if table:
        best = max(table, key=table.get)
        spec = dict((c[0], c) for c in legs)[best]
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".bench_config.json")
        rec = {}
        if os.path.exists(path):
            try:
                rec = json.load(open(path))
            except Exception:
                rec = {}
        rec.update({
            "engine": spec[1],
            "half_tile": bool(spec[2]),
            "wy": int(spec[3]),
            "pole_ladder": spec[4],
            # trace-time env knobs of the winner (unroll + extras);
            # bench.py setdefaults these before tracing
            "env": {**({"LCS_ENGINE_UNROLL": str(spec[5])}
                       if spec[5] != 1 else {}),
                    **(spec[7] if len(spec) > 7 else {})},
            "config_fields_per_sec": {k: round(v, 4)
                                      for k, v in table.items()},
            "source": (rec.get("source", "") +
                       "+tools/probe_config.py").lstrip("+"),
        })
        with open(path, "w") as f:
            json.dump(rec, f)
        print(f"wrote {path}: {best} -> engine={spec[1]} half={spec[2]} "
              f"wy={spec[3]} pole={spec[4]}", flush=True)


if __name__ == "__main__":
    main()
