"""Capture a jax.profiler trace of one flagship FTLE field and print the
op-level self-time breakdown (where the time actually goes), parsed
in-process with jax.profiler.ProfileData (the tensorboard plugin
converter is incompatible with the installed TF)."""
import os
import sys
import time
from collections import defaultdict

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

TRACE_DIR = "/tmp/lcs_trace"


def main():
    grid = global_quarter_degree_grid()
    ny, nx = grid.shape
    nt = 33
    LON, LAT = np.meshgrid(np.deg2rad(grid.lons), np.deg2rad(grid.lats))
    base_u = 25.0 * np.cos(LAT) + 3.0 * np.cos(3 * LON) * np.sin(2 * LAT)
    base_v = 3.0 * np.sin(3 * LON) * np.cos(2 * LAT)
    t = np.arange(nt)[:, None, None]
    u = jnp.asarray((base_u[None] * (1.0 + 0.05 * np.sin(2 * np.pi * t / nt))
                     ).astype(np.float32))
    v = jnp.asarray((base_v[None] * (1.0 + 0.05 * np.cos(2 * np.pi * t / nt))
                     ).astype(np.float32))

    def run():
        out, ov = ftle_pipeline(u, v, -6.0 * 3600.0, grid, settls_order=4,
                                interp_order=3, kernel="pallas",
                                return_overflow=True)
        return out

    np.asarray(run())  # warm
    t0 = time.perf_counter()
    np.asarray(run())
    print("field time:", time.perf_counter() - t0, flush=True)

    with jax.profiler.trace(TRACE_DIR):
        np.asarray(run())

    import glob
    xs = sorted(glob.glob(TRACE_DIR + "/**/*.xplane.pb", recursive=True))
    print("parsing", xs[-1], flush=True)
    pd = jax.profiler.ProfileData.from_file(xs[-1])
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        print("== plane:", plane.name)
        agg = defaultdict(lambda: [0.0, 0])
        for line in plane.lines:
            lname = line.name
            if "XLA Ops" not in lname and "Ops" not in lname \
                    and "step" not in lname.lower():
                pass
            for ev in line.events:
                # group fusion instances: strip trailing .N digits
                name = ev.name
                base = name.rstrip("0123456789").rstrip(".")
                a = agg[(lname, base)]
                a[0] += ev.duration_ns / 1e6
                a[1] += 1
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:45]
        tot = sum(v[0] for v in agg.values())
        print(f"   total accounted: {tot:.1f} ms (all lines)")
        for (lname, base), (ms, n) in rows:
            print(f"   {ms:9.2f} ms  n={n:6d}  [{lname[:16]:16s}] "
                  f"{base[:90]}")
        # outside-scan itemisation: ops executing <= 4 times run outside
        # the 16-iteration (K-unrolled) while loop — the ~91 ms pool the
        # round-4 notes never decomposed (VERDICT round-4 task 1)
        print("== outside-scan candidates (n <= 4, >= 0.3 ms) ==")
        out_rows = [(k, v) for k, v in agg.items()
                    if v[1] <= 4 and v[0] >= 0.3]
        out_tot = sum(v[0] for k, v in agg.items() if v[1] <= 4)
        print(f"   total n<=4: {out_tot:.1f} ms")
        for (lname, base), (ms, n) in sorted(out_rows,
                                             key=lambda kv: -kv[1][0])[:40]:
            print(f"   {ms:9.2f} ms  n={n:6d}  {base[:95]}")


if __name__ == "__main__":
    main()
