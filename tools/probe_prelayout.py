"""Device A/B of prefilter formulations AGAINST the downstream stack
assembly: the round-5 trace shows the y-pass einsum propagating a
y-minor layout ({2,3,0,1}) through pad/concat until four ~4 ms relayout
copies force {3,2,1,0} at the stack DUS — plus an 8 ms remat of the
assembly fusion.  Same chained form as probe_asm3: prefilter + pad +
optimization_barrier + full-stack reduce, identical reduce across legs.

Legs: yx (HEAD: y-pass then x-pass), xy (x first), fused (one 3-operand
einsum), xt (y-pass executed as an x-pass on explicitly transposed
data).

Run: timeout 2400 python -u tools/probe_prelayout.py
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

from lagrangiancoherence_tpu.ops.interp import spline_filter_matrix
from lagrangiancoherence_tpu.ops.pallas_interp import pad_coeffs_for_pallas

_HI = jax.lax.Precision.HIGHEST


def make_legs(ny, nx, dtype):
    my = jnp.asarray(spline_filter_matrix(ny, 3), dtype)
    mx = jnp.asarray(spline_filter_matrix(nx, 3), dtype)

    def yx(f):
        c = jnp.einsum("ij,...jk->...ik", my, f, precision=_HI)
        return jnp.einsum("...ij,kj->...ik", c, mx, precision=_HI)

    def xy(f):
        c = jnp.einsum("...ij,kj->...ik", f, mx, precision=_HI)
        return jnp.einsum("ij,...jk->...ik", my, c, precision=_HI)

    def fused(f):
        return jnp.einsum("ij,...jk,lk->...il", my, f, mx,
                          precision=_HI)

    def xt(f):
        ft = jnp.swapaxes(f, -1, -2)
        ct = jnp.einsum("...ij,kj->...ik", ft, my, precision=_HI)
        c = jnp.swapaxes(ct, -1, -2)
        return jnp.einsum("...ij,kj->...ik", c, mx, precision=_HI)

    return {"yx": yx, "xy": xy, "fused": fused, "xt": xt}


def main():
    print("devices:", jax.devices(), flush=True)
    T, ny, nx = 33, 721, 1440
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((T * 2, ny, nx)), jnp.float32)
    np.asarray(w)
    legs = {"ident": lambda f: f[..., :1, :1]}
    pre = make_legs(ny, nx, jnp.float32)

    ref = None
    for name in ("ident", "yx", "xy", "fused", "xt"):
        if name == "ident":
            f = jax.jit(lambda f: jnp.sum(f, dtype=jnp.float32))
        else:
            fn = pre[name]
            f = jax.jit(lambda f, fn=fn: jnp.sum(
                jax.lax.optimization_barrier(
                    pad_coeffs_for_pallas(fn(f))), dtype=jnp.float32))
        try:
            v = float(np.asarray(f(w)))
            ts = []
            for _ in range(8):
                t0 = time.perf_counter()
                v = float(np.asarray(f(w)))
                ts.append(time.perf_counter() - t0)
            ts = np.array(ts) * 1e3
            print(f"{name:6s} med {np.median(ts):7.2f} ms  "
                  f"min {ts.min():7.2f}  [{v:.6e}]", flush=True)
            if name not in ("ident",):
                if ref is None:
                    ref = v
                else:
                    # formulations must agree to f32 reduction noise
                    print(f"       rel vs yx: {abs(v - ref) / abs(ref):.2e}",
                          flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:6s} FAILED {type(e).__name__}: {str(e)[:150]}",
                  flush=True)


if __name__ == "__main__":
    main()
