"""Micro-probe: banded VPU x-contraction vs the current one-hot/direct-B3
MXU contraction for interior tier-A tiles (ops/pallas_interp.py).

Idea under test: within a tile the tap column of parcel (r, c) deviates
from its home lane c only by the within-tile shear (p50 ~16 cells at the
flagship final step), so the x gather

    H[r, c, fy] = sum_k w_k[r,c] * Win[fy, o0[r,c] + k]

can be computed as a short static loop over the deviation band j:

    H += B3(xpos - (c + b + j)) * roll(Win, -(b + j))[:, :TC]

— pure f32 VPU (exact; no HIGHEST matmul, no (M, WX) basis build).  Cost
scales with the actual shear band instead of the window area.

Run on the real TPU:  python tools/probe_band.py
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 8
TILE_C = 128
_M = TILE_R * TILE_C
_HIGH = jax.lax.Precision.HIGHEST
_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

F = 4
WY = 32
WX = 256
GY, GX = 91, 12          # flagship tile grid
NYP = 91 * TILE_R + 2 * 64
NXP = 12 * TILE_C + 2 * 256


def _bspline3(s):
    a = jnp.abs(s)
    near = (4.0 - 6.0 * a * a + 3.0 * a * a * a) / 6.0
    t2 = 2.0 - a
    far = t2 * t2 * t2 / 6.0
    return jnp.where(a <= 1.0, near, jnp.where(a < 2.0, far, 0.0))


def _basis_direct(pos_rel, iota):
    s = iota.astype(pos_rel.dtype) - pos_rel[..., None]
    return _bspline3(s)


# ---------------------------------------------------------------- current
def cur_body(pos_ref, win_ref, out_ref):
    """Replica of the tier-A interior path: direct-B3 x basis (TR,TC,WX)
    + chunked HIGHEST dot + masked full-lane y reduce."""
    ypos = pos_ref[0]
    xpos = pos_ref[1]
    cdt = ypos.dtype
    w2 = win_ref[...].reshape(F * WY, WX).astype(cdt)
    g = jnp.zeros((_M, F * WY), cdt)
    c0 = 0
    while c0 < WX:
        xc = min(512, WX - c0)
        i3c = c0 + jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C, xc), 2)
        ohc = _basis_direct(xpos, i3c)
        g = g + jax.lax.dot_general(ohc.reshape(_M, xc), w2[:, c0:c0 + xc],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=cdt,
                                    precision=_HIGH)
        c0 += xc
    g3 = g.reshape(TILE_R, TILE_C, F * WY)
    i3e = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C, F * WY), 2)
    yl = i3e % WY
    P = g3 * _bspline3(yl.astype(cdt) - ypos[..., None])
    fl = i3e // WY
    for f in range(F):
        out_ref[f] = jnp.sum(jnp.where(fl == f, P, 0.0), axis=2)


# ---------------------------------------------------------------- banded
def band_body(pos_ref, win_ref, out_ref, *, BAND, roll_mode):
    """Banded x-contraction, layout H (TR, F*WY, TC)."""
    ypos = pos_ref[0]
    xpos = pos_ref[1]
    cdt = ypos.dtype
    c_i = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 1)
    dev = jnp.floor(xpos).astype(jnp.int32) - c_i
    b = jnp.min(dev) - 1
    w2 = win_ref[...].reshape(F * WY, WX).astype(cdt)
    w2r = pltpu.roll(w2, jnp.mod(-b, WX), axis=1)   # dynamic base roll
    xrel = xpos - (c_i + b).astype(cdt)        # distance to lane-c tap at j=0
    H = jnp.zeros((TILE_R, F * WY, TILE_C), cdt)
    for j in range(BAND):
        if roll_mode == "inc":
            cur = w2r[:, :TILE_C]
            w2r = pltpu.roll(w2r, WX - 1, axis=1)
        else:                                  # static slice per j
            cur = jax.lax.slice(w2r, (0, j), (F * WY, j + TILE_C))
        bx = _bspline3(xrel - j)               # (TR, TC)
        H = H + bx[:, None, :] * cur[None]
    yl = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, F * WY, TILE_C), 1) % WY
    P = H * _bspline3(yl.astype(cdt) - ypos[:, None, :])
    for f in range(F):
        out_ref[f] = jnp.sum(P[:, f * WY:(f + 1) * WY, :], axis=1)


# ---------------------------------------------------------------- dma-only
def dma_body(pos_ref, win_ref, out_ref):
    v = win_ref[0, 0, 0] + pos_ref[0, 0, 0]
    for f in range(F):
        out_ref[f] = jnp.full((TILE_R, TILE_C), v, out_ref.dtype)


def run(body, name, reps=200):
    ny_t, nx_t = GY * TILE_R, GX * TILE_C
    rng = np.random.default_rng(0)
    # WINDOW-RELATIVE positions: every (8,128) tile block sees y in
    # [5, 19] (within WY=32) and x = lane + dev with dev in [1, 8]
    # (within-tile shear band ~7 cells) — the tier-A interior regime.
    yy = np.arange(ny_t)[:, None]
    xx = np.arange(nx_t)[None, :]
    ypos = ((yy % TILE_R) + 8.5 + 3.0 * np.sin(xx / 97.0)).astype(np.float32)
    xpos = ((xx % TILE_C) + 4.2 + 3.0 * np.cos(yy / 53.0)).astype(np.float32)
    pos = jnp.asarray(np.stack([ypos, xpos]))
    field = jnp.asarray(rng.standard_normal((F, NYP, NXP)).astype(np.float32))
    y0s = jnp.asarray((np.arange(GY) * TILE_R // 8 * 8 + 32)[:, None]
                      * np.ones((1, GX), np.int32), jnp.int32)
    x0s = jnp.asarray(np.ones((GY, 1), np.int32)
                      * (np.arange(GX) * TILE_C + 128)[None, :], jnp.int32)

    def kern(y0r, x0r, pos_ref, win_ref, out_ref):
        body(pos_ref, win_ref, out_ref)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(GY, GX),
        in_specs=[
            pl.BlockSpec((2, TILE_R, TILE_C), lambda i, j, *_: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pl.Element(F), pl.Element(WY), pl.Element(WX)),
                         lambda i, j, y0r, x0r:
                         (0, pl.multiple_of(y0r[i, j], 8),
                          pl.multiple_of((x0r[i, j] // 128) * 128, 128)),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((F, TILE_R, TILE_C), lambda i, j, *_: (0, i, j),
                               memory_space=pltpu.VMEM),
    )
    fn = jax.jit(lambda p, w: pl.pallas_call(
        kern, grid_spec=grid,
        out_shape=jax.ShapeDtypeStruct((F, ny_t, nx_t), jnp.float32),
        compiler_params=_CPARAMS)(y0s, x0s, p, w))
    out = fn(pos, field)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(pos, field)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    us_tile = dt / (GY * GX) * 1e6
    print(f"{name:28s} {dt*1e3:8.3f} ms/grid   {us_tile:6.2f} us/tile")
    return out


def main():
    print("devices:", jax.devices())
    o_dma = run(dma_body, "dma_only")
    o_cur = run(cur_body, "current (B3+MXU HIGHEST)")
    for band in (16, 24, 32):
        for mode in ("inc", "slice"):
            try:
                o_b = run(partial(band_body, BAND=band, roll_mode=mode),
                          f"banded B={band} {mode}")
                d = float(jnp.max(jnp.abs(o_b - o_cur)))
                print(f"    max|band-cur| = {d:.3e}", flush=True)
            except Exception as e:
                print(f"banded B={band} {mode}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
