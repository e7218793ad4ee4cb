"""Host-side (numpy) tier census on real flagship trajectories — no TPU
compile needed.  Replicates ops/pallas_interp.py routing (fold, tile
min/max spans) and reports span distributions for the as-stored layout,
full per-row compaction, and gradient-capped (smoothed) compaction, so
layout strategies can be compared without shipping debug programs
through the tunnel.

Usage: python tools/census_np.py [traj.npz]
Builds the trajectory on the TPU once (cached under /tmp) if no file.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TILE_R, TILE_C = 8, 128
CACHE = "/tmp/flagship_traj.npz"


def fold(x, n):
    sz = float(n - 1)
    neg = x + sz * (np.floor(-x / sz) + 1.0)
    pos = x - sz * np.floor(x / sz)
    return np.where(x < 0, neg, np.where(x > sz, pos, x))


def tile_minmax(fold_t, n):
    nyt, nxt = fold_t.shape
    gy, gx = nyt // TILE_R, nxt // TILE_C
    tiles = fold_t.reshape(gy, TILE_R, gx, TILE_C)
    anchor = tiles[:, :1, :, :1]
    u = anchor + np.mod(tiles - anchor + 0.5 * n, float(n)) - 0.5 * n
    f = np.floor(u)
    return f.min(axis=(1, 3)), f.max(axis=(1, 3))


def spans(px, py, grid, sub=3):
    """(gy, gx) y/x spans with pole-row substitution (order=3)."""
    ny, nx = grid.shape
    R = py.shape[0]
    idx = np.clip(np.arange(R), sub, ny - 1 - sub)
    px = px[idx]
    py = py[idx]
    ny_t = -(-R // TILE_R) * TILE_R
    nx_t = -(-nx // TILE_C) * TILE_C
    px = np.pad(px, ((0, ny_t - R), (0, nx_t - nx)), mode="edge")
    py = np.pad(py, ((0, ny_t - R), (0, nx_t - nx)), mode="edge")
    yi = ny * (py - grid.y_min) / (grid.y_max - grid.y_min)
    xi = nx * (px - grid.x_min) / (grid.x_max - grid.x_min)
    ymn, ymx = tile_minmax(fold(yi, ny), ny)
    xmn, xmx = tile_minmax(fold(xi, nx), nx)
    return ymx - ymn, xmx - xmn


def compact(px, grid, gran=32, grad_cap=None):
    """Per-row circular-mean compaction; optional cumulative-shift
    gradient cap (cells per row) applied by clipping against a running
    profile from the equator outward."""
    ny, nx = grid.shape
    w = 2 * np.pi / nx
    sxw = nx / (grid.x_max - grid.x_min) * w
    lane = np.arange(nx) * w
    theta = (px - grid.x_min) * sxw - lane
    m = np.arctan2(np.sin(theta).mean(1), np.cos(theta).mean(1)) \
        * (nx / (2 * np.pi))
    delta = np.round(m / gran).astype(np.int64) * gran
    delta[~np.isfinite(m)] = 0
    if grad_cap is not None:
        # smooth outward from the equator so neighbouring rows' shifts
        # differ by at most grad_cap cells
        eq = px.shape[0] // 2
        sm = delta.copy()
        for i in range(eq + 1, px.shape[0]):
            sm[i] = np.clip(sm[i], sm[i - 1] - grad_cap,
                            sm[i - 1] + grad_cap)
        for i in range(eq - 1, -1, -1):
            sm[i] = np.clip(sm[i], sm[i + 1] - grad_cap,
                            sm[i + 1] + grad_cap)
        delta = (sm // gran) * gran
    out = np.empty_like(px)
    for i in range(px.shape[0]):
        out[i] = np.roll(px[i], int(delta[i]))
    return out, delta


def report(tag, ysp, xsp):
    ysp = ysp.ravel()
    xsp = xsp.ravel()
    print(f"  {tag:16s} yspan p50/p90/p99/max "
          f"{np.percentile(ysp, [50, 90, 99]).round(0)}/{ysp.max():.0f} "
          f" >56:{(ysp > 56).sum():4d} >120:{(ysp > 120).sum():4d} "
          f">184:{(ysp > 184).sum():4d}")
    print(f"  {'':16s} xspan p50/p90/p99/max "
          f"{np.percentile(xsp, [50, 90, 99]).round(0)}/{xsp.max():.0f} "
          f" >96:{(xsp > 96).sum():4d} >224:{(xsp > 224).sum():4d} "
          f">608:{(xsp > 608).sum():4d}")
    # joint: would-fit tier A (yspan<=~24 for wy=32, xspan<=~92 for wx=256)
    fitA = (ysp <= 24) & (xsp <= 92 + 128)   # xspan includes ~128.1 home
    print(f"  {'':16s} ~tierA-fit: {fitA.sum():4d}/{ysp.size}")


def row_segment_spans(px, py, grid, sub=3):
    """x span within each (1, TILE_C) row segment, and the per-tile span
    of the segment MEANS — separates within-row spread (irreducible for
    a shared-window tile) from cross-row decorrelation (removable with
    per-row in-kernel rolls)."""
    ny, nx = grid.shape
    R = py.shape[0]
    idx = np.clip(np.arange(R), sub, ny - 1 - sub)
    px = px[idx]
    ny_t = -(-R // TILE_R) * TILE_R
    nx_t = -(-nx // TILE_C) * TILE_C
    px = np.pad(px, ((0, ny_t - R), (0, nx_t - nx)), mode="edge")
    xi = fold(nx * (px - grid.x_min) / (grid.x_max - grid.x_min), nx)
    gy, gx = ny_t // TILE_R, nx_t // TILE_C
    seg = xi.reshape(gy, TILE_R, gx, TILE_C)
    anchor = seg[..., :1]
    u = anchor + np.mod(seg - anchor + 0.5 * nx, float(nx)) - 0.5 * nx
    f = np.floor(u)
    smn = f.min(3)
    smx = f.max(3)                       # (gy, TILE_R, gx)
    seg_span = smx - smn
    # per-tile span (what the shared window must hold), for selection
    tmn, tmx = tile_minmax(xi, nx)
    tile_span = tmx - tmn
    # circular mean per segment, then cross-row span of means per tile
    th = seg * (2 * np.pi / nx)
    m = np.arctan2(np.sin(th).mean(3), np.cos(th).mean(3)) * (nx / 2 / np.pi)
    return seg_span, tile_span, m


def main():
    from lagrangiancoherence_tpu.grid import global_quarter_degree_grid
    grid = global_quarter_degree_grid()
    if os.path.exists(CACHE):
        d = np.load(CACHE)
        tx, ty = d["tx"], d["ty"]
    else:
        import jax.numpy as jnp
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        from lagrangiancoherence_tpu.models.settls import \
            parcel_propagation_core
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from probe_rebin import flagship_winds
        u, v = flagship_winds(grid)
        tx, ty, _ = parcel_propagation_core(
            u, v, -6.0 * 3600.0, grid, settls_order=4, interp_order=3,
            return_traj=True, kernel="pallas", rebin=False,
            return_overflow=True)
        tx = np.asarray(tx)
        ty = np.asarray(ty)
        np.savez_compressed(CACHE, tx=tx, ty=ty)

    for s in [int(a) for a in (sys.argv[1:] or [8, 20, 32])]:
        px, py = np.float64(tx[s]), np.float64(ty[s])
        print(f"step {s}:")
        ysp, xsp = spans(px, py, grid)
        report("as-stored", ysp, xsp)
        seg, tile, m = row_segment_spans(px, py, grid)
        for lo, hi in ((224, 608), (608, 1 << 30)):
            sel = (tile > lo) & (tile <= hi)          # escalated tiles
            if not sel.any():
                continue
            ss = seg.transpose(0, 2, 1)[sel].ravel()  # their row segments
            print(f"  tiles xspan in ({lo},{hi}]: {sel.sum():4d}   "
                  f"row-seg span p50/p90/p99/max "
                  f"{np.percentile(ss, [50, 90, 99]).round(0)}"
                  f"/{ss.max():.0f}  >96:{(ss > 96).sum()}"
                  f" >224:{(ss > 224).sum()} (of {ss.size})")


if __name__ == "__main__":
    main()
