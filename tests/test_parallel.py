"""Distributed top-k over a row-sharded item table (8 virtual devices)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rechorus_tpu.parallel.mesh import make_mesh
from rechorus_tpu.parallel.topk import sharded_catalog_topk


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, model_parallel=4)


def test_sharded_topk_matches_dense(mesh):
    rng = np.random.default_rng(0)
    B, N, d, k = 16, 512, 32, 10
    u = jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(N, d)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
    clicked = jnp.asarray(rng.integers(1, N, size=(B, 7)), dtype=jnp.int32)

    table_sharded = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    with jax.set_mesh(mesh):
        vals, ids = sharded_catalog_topk(u, table_sharded, k, mesh,
                                         clicked_rows=clicked, item_bias=bias)

    scores = np.array(u @ table.T + bias[None, :])
    scores[:, 0] = -np.inf
    for b in range(B):
        scores[b, np.asarray(clicked)[b]] = -np.inf
    expect_ids = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    got_vals, got_ids = np.asarray(vals), np.asarray(ids)
    # compare score values (ids can differ under exact ties)
    np.testing.assert_allclose(got_vals, np.take_along_axis(scores, expect_ids, 1), rtol=1e-5)
    assert (np.take_along_axis(scores, got_ids, 1) == got_vals).all()
    # exclusions respected
    assert not np.isin(got_ids, [0]).any()
    for b in range(B):
        assert not np.isin(got_ids[b], np.asarray(clicked)[b]).any()


def test_sharded_topk_no_mask(mesh):
    rng = np.random.default_rng(1)
    B, N, d, k = 4, 256, 16, 5
    u = jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))
    table = jax.device_put(
        jnp.asarray(rng.normal(size=(N, d)).astype(np.float32)),
        NamedSharding(mesh, P("model", None)))
    with jax.set_mesh(mesh):
        vals, ids = sharded_catalog_topk(u, table, k, mesh)
    assert vals.shape == (B, k) and ids.shape == (B, k)
    assert (np.diff(np.asarray(vals), axis=1) <= 1e-6).all()  # descending


def test_pad_rows_quantum():
    from rechorus_tpu.parallel import mesh as M

    try:
        M.set_table_row_pad(4)
        assert M.pad_rows(2049) == 2052
        assert M.pad_rows(2048) == 2048
        M.set_table_row_pad(1)
        assert M.pad_rows(2049) == 2049
    finally:
        M.set_table_row_pad(1)


def test_param_spec_nondivisible_falls_back_to_replication(caplog):
    """Tables whose rows don't divide the model axis must replicate, not
    crash (round-1 regression: 2049-row table on a 2-way model axis)."""
    import logging

    from rechorus_tpu.parallel.mesh import param_spec

    v = jnp.zeros((2049, 32))
    with caplog.at_level(logging.WARNING):
        spec = param_spec(("i_embeddings", "embedding"), v, model_size=2)
    assert spec == P()
    assert any("not divisible" in r.message for r in caplog.records)
    # divisible table on the same axis still shards
    assert param_spec(("i_embeddings", "embedding"), jnp.zeros((2050, 32)), 2) == P("model", None)


def test_dryrun_multichip_product_path():
    """The EXACT config the driver checks: n_items=2048 (2049 logical
    rows, non-divisible), SASRec, 8 devices, 4x2 mesh, full train epoch +
    sharded eval through the runner product path."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from rechorus_tpu.parallel import mesh as M

    from __graft_entry__ import dryrun_multichip

    try:
        dryrun_multichip(8)
    finally:
        M.set_table_row_pad(1)


def test_sharded_tiled_branch_matches_dense(mesh, monkeypatch):
    """Big-shard branch (streamed tiles inside shard_map, ops/topk.py
    kernels with col_offset): force the threshold down so the 128-row
    shards take it; results must match the dense-shard branch."""
    import rechorus_tpu.parallel.topk as ptopk
    from rechorus_tpu.parallel.topk import sharded_catalog_ranks

    rng = np.random.default_rng(5)
    B, N, d, k = 16, 512, 32, 10
    u = jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(N, d)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
    clicked = np.zeros((B, 7), dtype=np.int32)
    target = rng.integers(1, N, size=(B,))
    for b in range(B):
        clicked[b, 0] = target[b]  # residual set contains the target
        clicked[b, 1:] = rng.choice(np.arange(1, N), size=6, replace=False)
    clicked = jnp.asarray(clicked)
    target = jnp.asarray(target, dtype=jnp.int32)

    table_sharded = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    with jax.set_mesh(mesh):
        want_v, want_i = sharded_catalog_topk(u, table_sharded, k, mesh,
                                              clicked_rows=clicked, item_bias=bias)
        want_r = sharded_catalog_ranks(u, table_sharded, target, mesh,
                                       clicked, item_bias=bias)
        monkeypatch.setattr(ptopk, "MIN_ROWS_FOR_TILED", 64)
        got_v, got_i = sharded_catalog_topk(u, table_sharded, k, mesh,
                                            clicked_rows=clicked, item_bias=bias)
        got_r = sharded_catalog_ranks(u, table_sharded, target, mesh,
                                      clicked, item_bias=bias)

    np.testing.assert_allclose(np.asarray(want_v), np.asarray(got_v), rtol=1e-5, atol=1e-6)
    diff = np.asarray(want_i) != np.asarray(got_i)
    if diff.any():  # ties only
        np.testing.assert_allclose(np.asarray(want_v)[diff], np.asarray(got_v)[diff], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(want_r), np.asarray(got_r))
