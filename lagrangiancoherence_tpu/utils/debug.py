"""Numerical-safety helpers — the sanitizer story for a pure-functional core.

SURVEY.md §5: the reference needs no race detection (single-threaded numba)
and the JAX rebuild needs none either (no mutable shared state); what CAN go
wrong is numerical — NaNs from bad inputs, out-of-range coordinates.  These
wrappers make those failures loud:

* ``nan_debug()``: context manager enabling ``jax_debug_nans`` (every jitted
  op re-runs eagerly on NaN production and raises at the producing op);
* ``checked_ftle``: a ``checkify``-wrapped FTLE pipeline that returns
  machine-checkable errors for non-finite winds instead of silently
  propagating NaNs through the scan.
"""
from __future__ import annotations

from contextlib import contextmanager

__all__ = ["nan_debug", "checked_ftle"]


@contextmanager
def nan_debug():
    """Enable ``jax_debug_nans`` inside the context (slow; debugging only)."""
    import jax
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checked_ftle(u, v, timestep, grid, **kw):
    """FTLE pipeline with input validation via ``jax.experimental.checkify``.

    Returns ``(err, field)``; call ``err.throw()`` to raise on the host when
    winds contain non-finite values (the reference would silently produce a
    NaN-pocked field, /root/reference/LCS/LCS.py:146 dropna).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import checkify

    from ..models.pipeline import ftle_pipeline

    def fn(u_, v_):
        checkify.check(jnp.isfinite(u_).all() & jnp.isfinite(v_).all(),
                       "non-finite values in the wind fields")
        return ftle_pipeline(u_, v_, timestep, grid, **kw)

    checked = checkify.checkify(fn)
    return checked(jnp.asarray(u), jnp.asarray(v))
