"""Time ONE flagship-scan config, driven entirely by env knobs.

The ladder / A-sub / engine knobs are read at trace time, so each config
needs its own process; this probe is the per-process worker for arbitrary
config sweeps (tools/tpu_contact.sh-style, ONE process at a time):

    LCS_HALF_TILE=0 LCS_LADDER='[[64,null,768],...]' \
        timeout 2400 python tools/probe_one.py [tag]

Prints one line: ``cfg <tag> compile_s=<..> scan_ms=<..> flag=<..>``.
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
from lagrangiancoherence_tpu.models.settls import parcel_propagation_core


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


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "default"
    engine = os.environ.get("LCS_PALLAS_ENGINE", "blockspec")
    rebin = os.environ.get("LCS_REBIN", "0") not in ("0", "", "false")
    print(f"devices: {jax.devices()}  tag={tag}  engine={engine} "
          f"rebin={'sort' if rebin else False} "
          f"half_tile={os.environ.get('LCS_HALF_TILE', '1')} "
          f"ladder={'env' if os.environ.get('LCS_LADDER') else 'default'}",
          flush=True)
    grid = global_quarter_degree_grid()
    u, v = flagship_winds(grid)
    fn = jax.jit(lambda u, v: parcel_propagation_core(
        u, v, -6.0 * 3600.0, grid, settls_order=4, interp_order=3,
        kernel="pallas", pallas_engine=engine,
        rebin="sort" if rebin else False, return_overflow=True))
    t0 = time.perf_counter()
    px, py, fl = fn(u, v)
    np.asarray(px)
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        px, py, fl = fn(u, v)
    np.asarray(px)
    dt = (time.perf_counter() - t0) / 3
    # positions checksum so configs can be cross-checked for agreement
    chk = float(np.mean(np.asarray(px))), float(np.mean(np.asarray(py)))
    print(f"cfg {tag} compile_s={comp:.1f} scan_ms={dt*1e3:.1f} "
          f"flag={int(fl):#x} chk=({chk[0]:.9g},{chk[1]:.9g})", flush=True)


if __name__ == "__main__":
    main()
