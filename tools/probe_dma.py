"""Micro-probe: manual-DMA escalation engine vs the BlockSpec-pipelined
compacted-list tier.

The measured escalation pool is SLOT-dominated (~3 us per *capacity* slot
— dead slots pay the Element-window DMA machinery even when pl.when-gated
off; tools/probe_deadslot.py).  This probe times the alternative: ONE grid
step, window source left in HBM (`pl.ANY`), and an in-kernel
``fori_loop(0, n_live)`` that issues double-buffered ``make_async_copy``
windows per LIVE slot only — dead capacity is never touched, so tier cost
should scale with live tiles and the ladder's capacity margins become
free.

Variants timed (same synthetic flagship-like tile geometry as
probe_deadslot):
  A. blockspec — the current _list_kernel structure (baseline);
  B. dma_engine — manual-DMA loop, n_live in {0, 16, 64, cap}.

Run: python tools/probe_dma.py [--interpret]
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

INTERPRET = "--interpret" in sys.argv
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

TILE_R, TILE_C = 8, 128
_M = TILE_R * TILE_C
F, WY, WX = 4, 64, 512
GY, GX = 91, 12
NYP = GY * TILE_R + 2 * 64
NXP = GX * TILE_C + 2 * 512
CAP = 256
_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _spline_block(ypos, xpos, win, out_ref, f_slot):
    """The tier-B3 contraction body (direct cubic B-spline basis), same
    arithmetic as probe_deadslot's kernel."""
    cdt = ypos.dtype
    w2 = win.reshape(F * WY, WX).astype(cdt)
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
    i3e = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C, F * WY), 2)
    yl = (i3e % WY).astype(cdt) - ypos[..., None]
    a = jnp.abs(yl)
    by = jnp.where(a <= 1.0, (4 - 6 * a * a + 3 * a * a * a) / 6,
                   jnp.where(a < 2.0, (2 - a) ** 3 / 6, 0.0))
    P = g3 * by
    fl = i3e // WY
    for f in range(F):
        out_ref[f_slot, f] = jnp.sum(jnp.where(fl == f, P, 0.0), axis=2)


def dma_engine_kernel(nl, iy, jx, iy_out, y0s, x0s, pos_hbm, win_hbm,
                      out_hbm, win_buf, pos_buf, out_buf, sems, psems,
                      osems):
    """One grid step; fori_loop over LIVE slots with double-buffered
    window DMAs.  HBM refs: pos (2, ny_t, nx_t), win (F, NYP, NXP),
    out (F, ny_t + TILE_R, nx_t)."""
    nb = 2  # buffers

    def win_dma(slot, k):
        # Mosaic must PROVE the HBM slice start divisible by the (8,128)
        # tiling — scalar-prefetched starts carry no such fact, so assert
        # it (the routing builds them 8/128-aligned).  Without this the
        # device compile fails: "Failed to prove that a tile index in
        # dimension 1 is divisible by the tiling (8)".
        return pltpu.make_async_copy(
            win_hbm.at[:, pl.ds(pl.multiple_of(y0s[k], 8), WY),
                       pl.ds(pl.multiple_of(x0s[k], 128), WX)],
            win_buf.at[slot], sems.at[slot])

    def pos_dma(slot, k):
        return pltpu.make_async_copy(
            pos_hbm.at[:, pl.ds(iy[k] * TILE_R, TILE_R),
                       pl.ds(jx[k] * TILE_C, TILE_C)],
            pos_buf.at[slot], psems.at[slot])

    n = nl[0]

    @pl.when(n > 0)
    def _():
        win_dma(0, 0).start()
        pos_dma(0, 0).start()

        def body(k, _):
            slot = jax.lax.rem(k, nb)
            nxt = jax.lax.rem(k + 1, nb)

            @pl.when(k + 1 < n)
            def _():
                win_dma(nxt, k + 1).start()
                pos_dma(nxt, k + 1).start()

            win_dma(slot, k).wait()
            pos_dma(slot, k).wait()
            _spline_block(pos_buf[slot, 0], pos_buf[slot, 1],
                          win_buf[slot], out_buf, slot)
            # previous slot's output write must have drained before
            # reusing its buffer row next iteration
            @pl.when(k >= nb)
            def _():
                pltpu.make_async_copy(
                    out_buf.at[slot],
                    out_hbm.at[:, pl.ds(iy_out[k] * TILE_R, TILE_R),
                               pl.ds(jx[k] * TILE_C, TILE_C)],
                    osems.at[slot]).wait()

            out_dma = pltpu.make_async_copy(
                out_buf.at[slot],
                out_hbm.at[:, pl.ds(iy_out[k] * TILE_R, TILE_R),
                           pl.ds(jx[k] * TILE_C, TILE_C)],
                osems.at[slot])
            out_dma.start()
            return 0

        jax.lax.fori_loop(0, n, body, 0)

        # drain the tail output DMAs
        def drain(k, _):
            slot = jax.lax.rem(k, nb)
            pltpu.make_async_copy(
                out_buf.at[slot],
                out_hbm.at[:, pl.ds(iy_out[k] * TILE_R, TILE_R),
                           pl.ds(jx[k] * TILE_C, TILE_C)],
                osems.at[slot]).wait()
            return 0

        jax.lax.fori_loop(jnp.maximum(n - nb, 0), n, drain, 0)


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

    lives = (0, 16, 64, CAP) if not INTERPRET else (3,)
    for n_live in lives:
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
                         dma_engine_kernel,
                         grid_spec=pltpu.PrefetchScalarGridSpec(
                             num_scalar_prefetch=6,
                             grid=(1,),
                             in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                                       pl.BlockSpec(memory_space=pl.ANY)],
                             out_specs=pl.BlockSpec(memory_space=pl.ANY),
                             scratch_shapes=[
                                 pltpu.VMEM((2, F, WY, WX), jnp.float32),
                                 pltpu.VMEM((2, 2, TILE_R, TILE_C),
                                            jnp.float32),
                                 pltpu.VMEM((2, F, TILE_R, TILE_C),
                                            jnp.float32),
                                 pltpu.SemaphoreType.DMA((2,)),
                                 pltpu.SemaphoreType.DMA((2,)),
                                 pltpu.SemaphoreType.DMA((2,)),
                             ]),
                         out_shape=jax.ShapeDtypeStruct(
                             (F, ny_t + TILE_R, nx_t), jnp.float32),
                         compiler_params=_CPARAMS,
                         interpret=INTERPRET)(nl, iy, jx, iyo, y0, x0,
                                              p, w))
        o = fn(pos, field)
        o.block_until_ready()
        if INTERPRET:
            # correctness vs a numpy replica of the spline contraction
            o_np = np.asarray(o)
            def bsp(a):
                a = np.abs(a)
                return np.where(a <= 1.0, (4 - 6*a*a + 3*a*a*a)/6,
                                np.where(a < 2.0, (2-a)**3/6, 0.0))
            w_np = np.asarray(field)
            for k in range(n_live):
                ty, tx = iy_all[k], jx_all[k]
                ypb = ypos[ty*8:(ty+1)*8, tx*128:(tx+1)*128]
                xpb = xpos[ty*8:(ty+1)*8, tx*128:(tx+1)*128]
                yw = np.arange(WY)[None, None, :]
                xw = np.arange(WX)[None, None, :]
                wyb = bsp(yw - ypb[..., None])          # (8,128,WY)
                wxb = bsp(xw - xpb[..., None])          # (8,128,WX)
                win = w_np[:, y0[k]:y0[k]+WY, x0[k]:x0[k]+WX]
                want = np.einsum("rcy,rcx,fyx->frc", wyb, wxb, win)
                got = o_np[:, ty*8:(ty+1)*8, tx*128:(tx+1)*128]
                err = np.max(np.abs(got - want))
                print(f"slot {k} tile ({ty},{tx}): max|d|={err:.2e}",
                      flush=True)
                assert err < 1e-3, err
            print("interpret OK", flush=True)
            continue
        t0 = time.perf_counter()
        for _ in range(100):
            o = fn(pos, field)
        o.block_until_ready()
        dt = (time.perf_counter() - t0) / 100
        print(f"dma_engine n_live={n_live:4d}/{CAP}: {dt*1e3:8.3f} ms "
              f"({dt/max(n_live,1)*1e6:6.2f} us/LIVE slot)", flush=True)


if __name__ == "__main__":
    main()
