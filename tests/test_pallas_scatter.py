"""Exactness of the pipelined DMA row scatter (ops/pallas_scatter).

Interpret mode on CPU; the on-chip path was validated + timed on the
real v5e (numbers in the module docstring / docs/PERF.md r4). The
kernel is not wired into the product sparse lane (measured 1.36x
isolated does not survive its 128-lane width-padding cost) but its
semantics are load-bearing for any future wiring."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rechorus_tpu.ops.pallas_scatter import scatter_rows


@pytest.mark.parametrize("N,D,R,rpb", [(1000, 128, 64, 16), (257, 256, 96, 32)])
def test_scatter_rows_matches_xla(N, D, R, rpb):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    rows = rng.permutation(N)[:R].astype(np.int32)
    rows[3] = N      # dropped
    rows[11] = N     # dropped
    block = jnp.asarray(rng.normal(size=(R, D)), jnp.float32)
    want = table.at[jnp.asarray(rows)].set(block, mode="drop")
    got = jax.jit(lambda t, r, b: scatter_rows(t, r, b, rpb=rpb))(
        table, jnp.asarray(rows), block)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_scatter_rows_ragged_pad():
    # R not a multiple of rpb: the tail is padded with dropped rows
    N, D, R = 300, 128, 37
    rng = np.random.default_rng(1)
    table = jnp.zeros((N, D), jnp.float32)
    rows = jnp.asarray(rng.permutation(N)[:R].astype(np.int32))
    block = jnp.asarray(rng.normal(size=(R, D)), jnp.float32)
    want = table.at[rows].set(block, mode="drop")
    got = jax.jit(lambda t, r, b: scatter_rows(t, r, b, rpb=16))(table, rows, block)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
