"""Chained-marginal A/B of the padded-coefficient stack assembly
(pad_coeffs_for_pallas) on the flagship shapes — the largest outside-scan
pool (ROUND5_NOTES: standalone timings through the axon tunnel are ~55 ms
lies, and a standalone CWP rep OOMs; so each leg runs K assemblies inside
ONE lax.scan, each reduced to a scalar — the per-iteration delta is the
true marginal cost of (assembly + one full-stack read), with the read
(~8 ms at roofline) identical across legs).

Legs:
  new     — HEAD: y-pad once, per-slab concat of ty slices, stack
            (writes the 6.5 GB stack twice: inner concats + outer stack)
  old     — round-4: y-pad, x-pad, mirror via jnp.take (slab-sized TPU
            gather), stack of single slices
  text    — single precursor: one wide lane concat holding x-pad AND
            mirror content, then stack of 5 single slices (stack written
            twice, but no gather and no inner multi-piece concats)
  lanecat — one concat straight into a (F, nyp, 5*nxp_c128) lane-major
            stack (the minimal-traffic layout; consuming it needs kernel
            index-map surgery, so this leg measures the prize first)

Run: timeout 2400 python -u tools/probe_asm.py [K]
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

from lagrangiancoherence_tpu.ops.pallas_interp import (X_COPIES, X_GRAN,
                                                       coeff_pad_dims,
                                                       pad_coeffs_for_pallas)


def _wrap_pad(a, axis, pad, n):
    if pad <= n:
        lo = jax.lax.slice_in_dim(a, n - pad, n, axis=axis)
        hi = jax.lax.slice_in_dim(a, 0, pad, axis=axis)
        return jnp.concatenate([lo, a, hi], axis=axis)
    reps = -(-pad // n)
    big = jnp.concatenate([a] * (2 * reps + 1), axis=axis)
    start = reps * n - pad
    return jax.lax.slice_in_dim(big, start, start + n + 2 * pad,
                                axis=axis)


def old_pad(coeffs):
    ny, nx = coeffs.shape[-2], coeffs.shape[-1]
    ypad, xpad = coeff_pad_dims(ny, nx)
    t = _wrap_pad(coeffs, coeffs.ndim - 2, ypad, ny)
    t = _wrap_pad(t, coeffs.ndim - 1, xpad, nx)
    nxp_c = nx + 2 * xpad - 128
    mir_idx = np.r_[1, 0:nx, nx - 2, nx - 3]
    mir_idx = np.pad(mir_idx, (0, nxp_c - mir_idx.size), mode="edge")
    mir = jnp.take(t[..., xpad:xpad + nx], jnp.asarray(mir_idx), axis=-1)
    copies = [t[..., c * X_GRAN: c * X_GRAN + nxp_c]
              for c in range(X_COPIES)]
    return jnp.stack(copies + [mir], axis=0)


def text_pad(coeffs):
    """Single wide precursor: [x-padded row | mirror row] in one concat;
    every slab is then ONE slice -> the outer stack is a concat of 5
    single operands (no inner materialisation beyond the precursor)."""
    ny, nx = coeffs.shape[-2], coeffs.shape[-1]
    ypad, xpad = coeff_pad_dims(ny, nx)
    ax = coeffs.ndim - 1
    ty = _wrap_pad(coeffs, coeffs.ndim - 2, ypad, ny)
    nxp_c = nx + 2 * xpad - 128

    def col(a, b):
        return jax.lax.slice_in_dim(ty, a, b, axis=ax)

    # x-pad span [-xpad, nx+xpad) as cycling slices of ty
    pieces, j, s = [], 0, (-xpad) % nx
    total = nx + 2 * xpad
    while j < total:
        w = min(nx - s, total - j)
        pieces.append(col(s, s + w))
        j += w
        s = 0
    # mirror span appended on the lane axis
    edge = jnp.broadcast_to(col(nx - 3, nx - 2),
                            ty.shape[:-1] + (nxp_c - (nx + 3),))
    pieces += [col(1, 2), ty, col(nx - 2, nx - 1), col(nx - 3, nx - 2),
               edge]
    t_ext = jnp.concatenate(pieces, axis=ax)
    off = nx + 2 * xpad
    slabs = [jax.lax.slice_in_dim(t_ext, c * X_GRAN, c * X_GRAN + nxp_c,
                                  axis=ax) for c in range(X_COPIES)]
    slabs.append(jax.lax.slice_in_dim(t_ext, off, off + nxp_c, axis=ax))
    return jnp.stack(slabs, axis=0)


def lanecat_pad(coeffs):
    """One concat into (F, nyp, 5*nxp_c128): the minimal-write layout."""
    ny, nx = coeffs.shape[-2], coeffs.shape[-1]
    ypad, xpad = coeff_pad_dims(ny, nx)
    ax = coeffs.ndim - 1
    ty = _wrap_pad(coeffs, coeffs.ndim - 2, ypad, ny)
    nxp_c = -(-(nx + 2 * xpad - 128) // 128) * 128   # 128-divisible

    def col(a, b):
        return jax.lax.slice_in_dim(ty, a, b, axis=ax)

    pieces = []
    for c in range(X_COPIES):
        j, s = 0, (c * X_GRAN - xpad) % nx
        while j < nxp_c:
            w = min(nx - s, nxp_c - j)
            pieces.append(col(s, s + w))
            j += w
            s = 0
    edge = jnp.broadcast_to(col(nx - 3, nx - 2),
                            ty.shape[:-1] + (nxp_c - (nx + 3),))
    pieces += [col(1, 2), ty, col(nx - 2, nx - 1), col(nx - 3, nx - 2),
               edge]
    return jnp.concatenate(pieces, axis=ax)


LEGS = {"new": pad_coeffs_for_pallas, "old": old_pad, "text": text_pad,
        "lanecat": lanecat_pad}


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    print("devices:", jax.devices(), f"K={K}", flush=True)
    T, ny, nx = 33, 721, 1440
    rng = np.random.default_rng(0)
    cw = jnp.asarray(rng.standard_normal((T * 2, ny, nx)), jnp.float32)

    # parity first (tiny shape, on device): text/lanecat must re-create
    # the committed layout exactly
    small = jnp.asarray(rng.standard_normal((4, 17, 32)), jnp.float32)
    ref = np.asarray(pad_coeffs_for_pallas(small))
    for name in ("old", "text"):
        got = np.asarray(LEGS[name](small))
        assert np.array_equal(got, ref), name
    lc = np.asarray(lanecat_pad(small))
    nxp_c = ref.shape[-1]
    for c in range(X_COPIES + 1):
        nxp128 = -(-nxp_c // 128) * 128
        assert np.array_equal(lc[..., c * nxp128: c * nxp128 + nxp_c],
                              ref[c]), f"lanecat slab {c}"
    print("parity ok", flush=True)

    for name, fn in LEGS.items():
        def body(acc, i, fn=fn):
            stk = fn(cw + i.astype(jnp.float32) * 1e-6)
            return acc + jnp.sum(stk, dtype=jnp.float32), None

        stepper = jax.jit(lambda c0, fn=fn, body=body: jax.lax.scan(
            body, jnp.zeros((), jnp.float32), jnp.arange(K))[0])
        try:
            t0 = time.perf_counter()
            v = float(np.asarray(stepper(cw)))
            t_first = time.perf_counter() - t0
            t0 = time.perf_counter()
            v = float(np.asarray(stepper(cw)))
            dt = time.perf_counter() - t0
            print(f"{name:8s} first {t_first:6.2f} s   steady "
                  f"{dt * 1e3:8.1f} ms / {K} = {dt * 1e3 / K:7.2f} ms per "
                  f"(asm + full read)   [{v:.3e}]", flush=True)
        except Exception as e:  # noqa: BLE001 — keep later legs alive
            print(f"{name:8s} FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
