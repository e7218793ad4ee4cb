"""Offline (numpy) validation of SPATIALLY RE-BINNED parcel storage.

Hypothesis: sorting parcels into field-tile order by their position at a
bin step s0 keeps every (8, 128) storage tile's tap spans narrow at steps
s0..s0+K (chaotic spread per 6 h step is small even where the cumulative
spread covers the whole circle), collapsing the escalation ladder that
currently costs ~0.9 s/field (full-x whirl tiles etc).

Key = (y_tile, x_tile, y_sub, x_lane) of the CURRENT position - i.e.
parcels sorted into the storage order of the field tile containing them.
Reports per-tile y/x spans at staleness 0..K for bin steps across the
flagship trajectory, plus the would-be tier census.

Usage: python tools/census_binned.py  (uses /tmp/flagship_traj.npz)
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


def tile_spans(px, py, grid):
    """(gy, gx) spans of the (possibly reordered) storage grid."""
    ny, nx = grid.shape          # scaling constants only
    R, C = py.shape
    ny_t = -(-R // TILE_R) * TILE_R
    nx_t = -(-C // TILE_C) * TILE_C
    px = np.pad(px, ((0, ny_t - R), (0, nx_t - C)), mode="edge")
    py = np.pad(py, ((0, ny_t - R), (0, nx_t - C)), mode="edge")
    yi = fold(ny * (py - grid.y_min) / (grid.y_max - grid.y_min), ny)
    xi = fold(nx * (px - grid.x_min) / (grid.x_max - grid.x_min), nx)
    gy, gx = ny_t // TILE_R, nx_t // TILE_C

    def mm(f, n):
        t = f.reshape(gy, TILE_R, gx, TILE_C)
        anchor = t[:, :1, :, :1]
        u = anchor + np.mod(t - anchor + 0.5 * n, float(n)) - 0.5 * n
        ff = np.floor(u)
        return ff.min(axis=(1, 3)), ff.max(axis=(1, 3))

    ymn, ymx = mm(yi, ny)
    xmn, xmx = mm(xi, nx)
    return ymx - ymn, xmx - xmn


def bin_order(px, py, grid, bx=32):
    """Sort order by spatial key blocks: (8, bx)-cell blocks in row-major
    block order.  Ranks are then assigned to storage TILE-MAJOR (1024
    consecutive ranks per (8, 128) storage tile) so each tile holds a
    spatially compact run of blocks."""
    ny, nx = grid.shape
    yi = np.clip(ny * (py - grid.y_min) / (grid.y_max - grid.y_min),
                 0, ny - 1).astype(np.int64)
    xi = np.mod(np.floor(nx * (px - grid.x_min)
                         / (grid.x_max - grid.x_min)).astype(np.int64), nx)
    key = (yi // TILE_R) * (nx // bx) + xi // bx
    return np.argsort(key.ravel(), kind="stable")


def to_storage(a_sorted, R, nx):
    """rank-ordered flat array -> (R, nx) storage, tile-major."""
    gy, gx = R // TILE_R, nx // TILE_C
    return (a_sorted[:gy * gx * TILE_R * TILE_C]
            .reshape(gy, gx, TILE_R, TILE_C)
            .transpose(0, 2, 1, 3).reshape(R, nx))


def main():
    from lagrangiancoherence_tpu.grid import global_quarter_degree_grid
    grid = global_quarter_degree_grid()
    d = np.load(CACHE)
    tx, ty = np.float64(d["tx"]), np.float64(d["ty"])
    ny, nx = grid.shape
    sub = 3
    inner = slice(sub, ny - sub)

    def rep(tag, ysp, xsp):
        ysp, xsp = ysp.ravel(), xsp.ravel()
        fitA = (ysp <= 24) & (xsp <= 92 + 128)
        print(f"    {tag:12s} ysp p50/p99/max "
              f"{np.percentile(ysp, [50, 99]).round(0)}/{ysp.max():.0f}  "
              f"xsp p50/p99/max {np.percentile(xsp, [50, 99]).round(0)}"
              f"/{xsp.max():.0f}  tierA {fitA.sum()}/{ysp.size}"
              f"  x>224:{(xsp > 224 + 128).sum():3d}"
              f" x>608:{(xsp > 608).sum():3d} y>56:{(ysp > 56).sum():3d}")

    R = ny - 2 * sub           # 715 interior rows -> 89 full tile rows
    R = (R // TILE_R) * TILE_R
    for s0 in (8, 20, 28):
        print(f"bin at step {s0}:")
        px0, py0 = tx[s0][inner], ty[s0][inner]
        order = bin_order(px0, py0, grid)
        for k in (0, 1, 2, 4):
            s = s0 + k
            if s >= tx.shape[0]:
                continue
            # spans depend only on which parcels share a 1024-slot tile:
            # analyse rank-tiles directly (8, 128 within-tile layout)
            n_t = (tx[s][inner].size // 1024) * 1024
            px = tx[s][inner].ravel()[order][:n_t].reshape(-1, TILE_C)
            py = ty[s][inner].ravel()[order][:n_t].reshape(-1, TILE_C)
            ysp, xsp = tile_spans(px, py, grid)
            rep(f"stale={k}", ysp, xsp)
        ysp, xsp = tile_spans(tx[s0][inner], ty[s0][inner], grid)
        rep("as-stored", ysp, xsp)


if __name__ == "__main__":
    main()
