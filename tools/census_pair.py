"""Offline census: would 16-row paired tiles route as cheaply as the
current (8, 128) tiles?  (Round-5 pairing lever: the engine's per-slot
fixed cost is ~40% of the launch pool; pairing vertically-adjacent tiles
halves slot count and shares one window+basis per pair, IF the pair's
combined spans still fit the same window tiers.)

Uses /tmp/flagship_traj.npz (tools/probe_traj_dump.py) and mirrors the
runtime storage layout: interior rows in home layout, polar bands
(|lat| >= 60, 8-aligned, pole-home rows excluded) re-sorted every K=2
steps by the seam-aware anchored key (models/settls.py).

Reports, per analysed step: (8,128)-tile y/x spans, (16,128)-pair spans,
and the fraction of pairs whose spans fit (wy=48, 256)-class windows /
per-32-lane quarter windows — the pairing coverage.

Run: python tools/census_pair.py
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


def spans(px, py, grid, R):
    """anchored-unwrap floor min/max per (R, TILE_C) block over full
    tiles; returns (ymn, ymx, xmn, xmx) shaped (rows/R, gx)."""
    ny, nx = grid.shape
    nr, nc = py.shape
    gx = nc // TILE_C
    yi = fold(ny * (py - grid.y_min) / (grid.y_max - grid.y_min), ny)
    xi = fold(nx * (px - grid.x_min) / (grid.x_max - grid.x_min), nx)

    def mm(f, n):
        t = f[: (nr // R) * R, : gx * TILE_C].reshape(
            nr // R, R, gx, TILE_C)
        anchor = t[:, :1, :, :1]
        u = anchor + np.mod(t - anchor + 0.5 * n, float(n)) - 0.5 * n
        ff = np.floor(u)
        return ff.min(axis=(1, 3)), ff.max(axis=(1, 3))

    ymn, ymx = mm(yi, ny)
    xmn, xmx = mm(xi, nx)
    return ymn, ymx, xmn, xmx


def quarter_ok(px, grid, R, wq=92):
    """per-(R, 32)-sub-block x span <= wq for ALL 4 quarters of each
    (R, 128) block (the A-sub eligibility proxy)."""
    ny, nx = grid.shape
    nr, nc = px.shape
    gx = nc // TILE_C
    xi = fold(nx * (px - grid.x_min) / (grid.x_max - grid.x_min), nx)
    t = xi[: (nr // R) * R, : gx * TILE_C].reshape(
        nr // R, R, gx, 4, 32)
    anchor = t[:, :1, :, :, :1]
    u = anchor + np.mod(t - anchor + 0.5 * nx, float(nx)) - 0.5 * nx
    ff = np.floor(u)
    sp = ff.max(axis=(1, 4)) - ff.min(axis=(1, 4))      # (gy, gx, 4)
    return (sp <= wq).all(axis=-1)


def anchored_sort(px_key, arrs, r0, nr, grid, bx=8):
    """seam-aware group-pinned sort of band rows [r0, r0+nr) by the key
    of px_key; permutes every array in arrs identically (rank order —
    the census analyses rank tiles, so tile-major relayout is not
    needed: consecutive 1024 ranks of a group = one storage tile)."""
    ny, nx = grid.shape
    sl = slice(r0, r0 + nr)
    xi = np.mod(np.floor(nx * (px_key[sl] - grid.x_min)
                         / (grid.x_max - grid.x_min)), nx).astype(int)
    g = nr // 8
    ang = xi * (2 * np.pi / nx)
    s = np.sin(ang).reshape(g, -1).mean(1)
    c = np.cos(ang).reshape(g, -1).mean(1)
    anc = np.mod(np.floor(np.arctan2(s, c) / (2 * np.pi) * nx).astype(int),
                 nx)
    rel = np.mod(xi - np.repeat(anc, 8)[:, None] + nx // 2, nx)
    grp = np.repeat(np.arange(g), 8)[:, None] * (nx // bx + 1)
    order = np.argsort((grp + rel // bx).ravel(), kind="stable")
    out = []
    for a in arrs:
        seg = a[sl].ravel()[order].reshape(nr, nx)
        b = a.copy()
        b[sl] = seg
        out.append(b)
    return out


def main():
    from lagrangiancoherence_tpu.grid import global_quarter_degree_grid
    from lagrangiancoherence_tpu.models.settls import _sort_bands
    grid = global_quarter_degree_grid()
    d = np.load(CACHE)
    tx, ty = np.float64(d["tx"]), np.float64(d["ty"])
    bands = _sort_bands(grid, 3)
    print("bands:", bands)
    for s0 in (8, 20, 28, 31):
        sbin = s0 - (s0 % 2)          # K=2: sorted at the even step
        px, py = tx[sbin].copy(), ty[sbin].copy()
        pxs, pys = tx[s0].copy(), ty[s0].copy()
        for r0, nr in bands:
            _, px2, py2 = anchored_sort(px, [px, pxs, pys], r0, nr, grid)
            pxs, pys = px2, py2
        ymn, ymx, xmn, xmx = spans(pxs, pys, grid, TILE_R)
        ysp, xsp = ymx - ymn, xmx - xmn
        q_ok = quarter_ok(pxs, grid, TILE_R)
        ymn2, ymx2, xmn2, xmx2 = spans(pxs, pys, grid, 2 * TILE_R)
        ysp2, xsp2 = ymx2 - ymn2, xmx2 - xmn2
        q_ok2 = quarter_ok(pxs, grid, 2 * TILE_R)
        n_t, n_p = ysp.size, ysp2.size
        subA = q_ok & (ysp <= 24)
        intA = (~q_ok) & (ysp <= 24) & (xsp <= 92 + 128)
        pair_sub = q_ok2 & (ysp2 <= 40)
        pair_int = (ysp2 <= 40) & (xsp2 <= 92 + 128)
        print(f"step {s0} (binned@{sbin}):")
        print(f"  tiles {n_t}: ysp p50/p99 "
              f"{np.percentile(ysp, [50, 99]).round(0)}  sub-ok "
              f"{subA.sum()} ({100 * subA.sum() / n_t:.0f}%)  "
              f"A-int {intA.sum()}  esc {(n_t - subA.sum() - intA.sum())}")
        print(f"  pairs {n_p}: ysp2 p50/p99 "
              f"{np.percentile(ysp2, [50, 99]).round(0)}  "
              f"pair-sub(48q) {pair_sub.sum()} "
              f"({100 * pair_sub.sum() / n_p:.0f}%)  pair-int(48,256) "
              f"{pair_int.sum()} ({100 * pair_int.sum() / n_p:.0f}%)")


if __name__ == "__main__":
    main()
