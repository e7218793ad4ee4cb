"""Micro-probe: does a compacted-list escalation tier cost scale with
LIVE slots or with CAPACITY slots?

Replicates _list_kernel's structure (scalar-prefetched slot list, dead
slots repeat slot 0's blocks and are pl.when-gated off) with an Element-
indexed (F, WY, WX) window, and times launches at n_live = 0, 16, 64,
cap.  If dead slots cost ~3 us each (DMA issued despite the repeated
index map), the 9-tier ladder's ~1900 capacity slots explain the
measured ~5.9 ms/group escalation pool regardless of live counts — and
the fix is small caps / consolidated tiers, not fewer live tiles.

Run: python tools/probe_deadslot.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

TILE_R, TILE_C = 8, 128
_M = TILE_R * TILE_C
F, WY, WX = 4, 64, 512
GY, GX = 91, 12
NYP = GY * TILE_R + 2 * 64
NXP = GX * TILE_C + 2 * 512
CAP = 256
_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def kern(n_live, iy, jx, iy_out, y0s, x0s, pos_ref, win_ref, out_ref,
         flag_ref):
    i = pl.program_id(0)
    flag_ref[i, 0] = jnp.int32(0)

    @pl.when(i < n_live[0])
    def _():
        ypos = pos_ref[0]
        xpos = pos_ref[1]
        cdt = ypos.dtype
        w2 = win_ref[...].reshape(F * WY, WX).astype(cdt)
        g = jnp.zeros((_M, F * WY), cdt)
        c0 = 0
        while c0 < WX:
            xc = min(512, WX - c0)
            i3c = c0 + jax.lax.broadcasted_iota(
                jnp.int32, (TILE_R, TILE_C, xc), 2)
            s = i3c.astype(cdt) - xpos[..., None]
            a = jnp.abs(s)
            bx = jnp.where(a <= 1.0, (4 - 6 * a * a + 3 * a * a * a) / 6,
                           jnp.where(a < 2.0, (2 - a) ** 3 / 6, 0.0))
            g = g + jax.lax.dot_general(
                bx.reshape(_M, xc), w2[:, c0:c0 + xc],
                (((1,), (1,)), ((), ())), preferred_element_type=cdt,
                precision=jax.lax.Precision.HIGHEST)
            c0 += xc
        g3 = g.reshape(TILE_R, TILE_C, F * WY)
        i3e = jax.lax.broadcasted_iota(jnp.int32,
                                       (TILE_R, TILE_C, F * WY), 2)
        yl = (i3e % WY).astype(cdt) - ypos[..., None]
        a = jnp.abs(yl)
        by = jnp.where(a <= 1.0, (4 - 6 * a * a + 3 * a * a * a) / 6,
                       jnp.where(a < 2.0, (2 - a) ** 3 / 6, 0.0))
        P = g3 * by
        fl = i3e // WY
        for f in range(F):
            out_ref[f] = jnp.sum(jnp.where(fl == f, P, 0.0), axis=2)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    field = jnp.asarray(rng.standard_normal((F, NYP, NXP)).astype(np.float32))
    ny_t, nx_t = GY * TILE_R, GX * TILE_C
    yy = np.arange(ny_t)[:, None]
    xx = np.arange(nx_t)[None, :]
    ypos = ((yy % TILE_R) + 20.5).astype(np.float32) + 0 * xx
    xpos = ((xx % TILE_C) + 180.2).astype(np.float32) + 0 * yy
    pos = jnp.asarray(np.stack([ypos, xpos]))

    idx = rng.permutation(GY * GX)[:CAP]
    iy_all = (idx // GX).astype(np.int32)
    jx_all = (idx % GX).astype(np.int32)

    gridspec_args = dict(
        num_scalar_prefetch=6,
        grid=(CAP,),
        in_specs=[
            pl.BlockSpec((2, TILE_R, TILE_C),
                         lambda i, nl, iyr, jxr, iyo, y0r, x0r:
                         (0, iyr[i], jxr[i]), memory_space=pltpu.VMEM),
            pl.BlockSpec((pl.Element(F), pl.Element(WY), pl.Element(WX)),
                         lambda i, nl, iyr, jxr, iyo, y0r, x0r:
                         (0, pl.multiple_of(y0r[i], 8),
                          pl.multiple_of(x0r[i], 128)),
                         memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((F, TILE_R, TILE_C),
                                lambda i, nl, iyr, jxr, iyo, y0r, x0r:
                                (0, iyo[i], jxr[i]),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((CAP, 1), lambda i, *_: (0, 0),
                                memory_space=pltpu.SMEM)],
    )

    for n_live in (0, 16, 64, CAP):
        live = np.arange(CAP) < n_live
        iy = np.where(live, iy_all, iy_all[0]).astype(np.int32)
        jx = np.where(live, jx_all, jx_all[0]).astype(np.int32)
        iy_out = np.where(live, iy_all, GY).astype(np.int32)
        y0 = np.where(live, iy * 8 + 8, iy_all[0] * 8 + 8).astype(np.int32)
        x0 = np.where(live, jx * 128 + 128,
                      jx_all[0] * 128 + 128).astype(np.int32)
        nl = np.full((1,), n_live, np.int32)

        fn = jax.jit(lambda p, w, nl=jnp.asarray(nl), iy=jnp.asarray(iy),
                     jx=jnp.asarray(jx), iyo=jnp.asarray(iy_out),
                     y0=jnp.asarray(y0), x0=jnp.asarray(x0):
                     pl.pallas_call(
                         kern,
                         grid_spec=pltpu.PrefetchScalarGridSpec(
                             **gridspec_args),
                         out_shape=[jax.ShapeDtypeStruct(
                             (F, ny_t + TILE_R, nx_t), jnp.float32),
                             jax.ShapeDtypeStruct((CAP, 1), jnp.int32)],
                         compiler_params=_CPARAMS)(nl, iy, jx, iyo, y0,
                                                   x0, p, w)[0])
        o = fn(pos, field)
        o.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(100):
            o = fn(pos, field)
        o.block_until_ready()
        dt = (time.perf_counter() - t0) / 100
        print(f"n_live={n_live:4d}/{CAP}: {dt*1e3:8.3f} ms/launch "
              f"({dt/CAP*1e6:5.2f} us/slot)", flush=True)


if __name__ == "__main__":
    main()
