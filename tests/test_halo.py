"""Direct unit tests for the halo-exchange building blocks
(parallel/halo.py) on the virtual device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from lagrangiancoherence_tpu.parallel.halo import (exchange_cols_cyclic,
                                                   exchange_rows,
                                                   fourth_order_dim0_blocked,
                                                   fourth_order_dim1_blocked)
from lagrangiancoherence_tpu.parallel.mesh import parcel_mesh
from lagrangiancoherence_tpu.ops.stencil import fourth_order_derivative

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


@needs_8
def test_exchange_rows_reassembles_neighbours():
    mesh = parcel_mesh(8)
    x = np.arange(64 * 4, dtype=np.float64).reshape(64, 4)

    def block(b):
        return exchange_rows(b, 2)

    fn = shard_map(block, mesh=mesh, in_specs=P("y", None),
                   out_specs=P("y", None))
    out = np.asarray(jax.jit(fn)(
        jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("y", None)))))
    # each shard's padded block is (8+4, 4); shard 3 (rows 24..31) must see
    # rows 22..33 with zeros only at the global edges
    blk = out.reshape(8, 12, 4)
    np.testing.assert_array_equal(blk[3, :, :], x[22:34])
    assert (blk[0, :2] == 0).all()       # north edge: zero halo
    assert (blk[7, -2:] == 0).all()      # south edge: zero halo


@needs_8
def test_exchange_cols_wraps_cyclically():
    mesh = parcel_mesh(8, x_parallel=2)
    x = np.arange(8 * 256, dtype=np.float64).reshape(8, 256)

    def block(b):
        return exchange_cols_cyclic(b, 2)

    fn = shard_map(block, mesh=mesh, in_specs=P(None, "x"),
                   out_specs=P(None, "x"))
    out = np.asarray(jax.jit(fn)(
        jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(None, "x")))))
    blk = out.reshape(8, 2, 132).swapaxes(0, 1)
    # left halo of shard 0 = last 2 cols of shard 1 (cyclic wraparound)
    np.testing.assert_array_equal(blk[0, :, :2], x[:, -2:])
    np.testing.assert_array_equal(blk[1, :, -2:], x[:, :2])


def test_blocked_stencils_match_full(monkeypatch):
    # single "device": blocked stencil with h=2 zero halos over the whole
    # array must equal the full-field stencil
    rng = np.random.RandomState(0)
    f = rng.randn(24, 32)
    padded = np.pad(f, ((2, 2), (0, 0)))
    got = np.asarray(fourth_order_dim0_blocked(jnp.asarray(padded), 2,
                                               0, 24))
    want = np.asarray(fourth_order_derivative(jnp.asarray(f), dim=0))
    np.testing.assert_allclose(got, want, atol=1e-12)

    padded_x = np.concatenate([f[:, -2:], f, f[:, :2]], axis=1)
    got_x = np.asarray(fourth_order_dim1_blocked(jnp.asarray(padded_x), 2))
    want_x = np.asarray(fourth_order_derivative(jnp.asarray(f), dim=1,
                                                isglobal=True))
    np.testing.assert_allclose(got_x, want_x, atol=1e-12)
