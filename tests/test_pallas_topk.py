"""Pallas-fused catalog kernels (ops/pallas_topk.py) vs dense references,
and the PALLAS="on" routes through ops/topk.py (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rechorus_tpu.ops import topk as T
from rechorus_tpu.ops.pallas_topk import (expand_bucket_items, fused_bucket_max,
                                          fused_ge_count)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _dense(u, t, bias):
    s = np.asarray(u) @ np.asarray(t).T
    if bias is not None:
        s = s + np.asarray(bias)[None]
    return s


def _strided_bucket_ref(s_masked, N, bucket, nb):
    TN = bucket * nb
    nblocks = -(-N // TN)
    ref = np.full((s_masked.shape[0], nblocks * nb), -np.inf, np.float32)
    for g in range(nblocks * nb):
        j, l = g // nb, g % nb
        idx = [j * TN + b * nb + l for b in range(bucket) if j * TN + b * nb + l < N]
        if idx:
            ref[:, g] = s_masked[:, idx].max(axis=1)
    return ref


def test_fused_bucket_max_matches_reference(rng):
    B, D, N, bucket, nb = 12, 24, 4196, 4, 128   # odd N: block overhang
    u = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
    n_valid = N - 37
    s = _dense(u, t, bias)
    cols = np.arange(N)
    s_masked = np.where(((cols > 0) & (cols < n_valid))[None], s, -np.inf)

    bm = np.asarray(fused_bucket_max(u, t, bucket=bucket, bias=bias,
                                     n_valid=n_valid, nb=nb, tb=8))
    ref = _strided_bucket_ref(s_masked, N, bucket, nb)
    assert (np.isinf(ref) == np.isinf(bm)).all()
    np.testing.assert_allclose(np.where(np.isinf(ref), 0, ref),
                               np.where(np.isinf(bm), 0, bm), atol=1e-5)

    # expand_bucket_items inverts the partition: every catalog row in
    # exactly one bucket
    nblocks = -(-N // (bucket * nb))
    items = np.asarray(expand_bucket_items(
        jnp.arange(nblocks * nb, dtype=jnp.int32)[None], bucket, nb))[0]
    assert sorted(items[items < N].tolist()) == list(range(N))


def test_fused_bucket_max_col_offset_no_bias(rng):
    B, D, N, bucket, nb = 9, 16, 1024, 2, 128
    u = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    off, n_valid = 100, N + 60
    s = _dense(u, t, None)
    gcols = np.arange(N) + off
    s_masked = np.where(((gcols > 0) & (gcols < n_valid))[None], s, -np.inf)
    bm = np.asarray(fused_bucket_max(u, t, bucket=bucket, n_valid=n_valid,
                                     col_offset=jnp.int32(off), nb=nb, tb=8))
    ref = _strided_bucket_ref(s_masked, N, bucket, nb)
    assert (np.isinf(ref) == np.isinf(bm)).all()
    np.testing.assert_allclose(np.where(np.isinf(ref), 0, ref),
                               np.where(np.isinf(bm), 0, bm), atol=1e-5)


def test_fused_ge_count_matches_dense(rng):
    B, D, N = 11, 24, 1541
    u = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
    n_valid = N - 11
    tgt = jnp.asarray(rng.integers(1, n_valid, size=(B,)), jnp.int32)
    s = _dense(u, t, bias)
    ts = jnp.asarray(s[np.arange(B), np.asarray(tgt)], jnp.float32)

    cnt = np.asarray(fused_ge_count(u, t, ts, target_col=tgt, bias=bias,
                                    n_valid=n_valid, tn=512, tb=8))
    cols = np.arange(N)
    ok = ((cols > 0) & (cols < n_valid))[None] & (cols[None] != np.asarray(tgt)[:, None])
    ref = ((s >= np.asarray(ts)[:, None]) & ok).sum(1)
    np.testing.assert_array_equal(cnt, ref)


def test_tiled_topk_pallas_route_matches_scan(rng):
    B, D, N, k = 8, 16, 4196, 10
    u = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
    clicked = jnp.asarray(rng.integers(0, N, size=(B, 7)), jnp.int32)
    n_valid = N - 5

    T.PALLAS = "off"
    v0, i0 = jax.jit(lambda: T.tiled_catalog_topk(
        u, t, k, bias=bias, clicked_rows=clicked, n_valid=n_valid, tile=1024))()
    T.PALLAS = "on"
    try:
        assert T._use_pallas()
        v1, i1 = jax.jit(lambda: T.tiled_catalog_topk(
            u, t, k, bias=bias, clicked_rows=clicked, n_valid=n_valid))()
    finally:
        T.PALLAS = "auto"
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-5)


def test_tiled_ranks_pallas_route_matches_scan(rng):
    B, D, N = 10, 16, 2600
    u = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    tgt = jnp.asarray(rng.integers(1, N, size=(B,)), jnp.int32)
    clicked = jnp.asarray(rng.integers(0, N, size=(B, 6)), jnp.int32)
    clicked = clicked.at[:, 0].set(tgt)  # residual set holds the target

    T.PALLAS = "off"
    r0 = np.asarray(jax.jit(lambda: T.tiled_catalog_ranks(
        u, t, tgt, clicked, n_valid=N, tile=512))())
    T.PALLAS = "on"
    try:
        r1 = np.asarray(jax.jit(lambda: T.tiled_catalog_ranks(
            u, t, tgt, clicked, n_valid=N))())
    finally:
        T.PALLAS = "auto"
    np.testing.assert_array_equal(r0, r1)


def test_sharded_pallas_matches_scan(rng, monkeypatch):
    """PALLAS='on' inside shard_map shards: col_offset arrives as an
    axis_index tracer; topk + rank results must match the scan kernels."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    import rechorus_tpu.parallel.topk as ptopk
    from rechorus_tpu.parallel.mesh import make_mesh
    from rechorus_tpu.parallel.topk import sharded_catalog_ranks, sharded_catalog_topk

    mesh = make_mesh(8, model_parallel=4)
    B, N, d, k = 8, 8192, 16, 10            # 2048-row shards: pallas-eligible
    u = jnp.asarray(rng.normal(size=(B, d)), jnp.float32)
    table = jnp.asarray(rng.normal(size=(N, d)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
    tgt = jnp.asarray(rng.integers(1, N, size=(B,)), jnp.int32)
    clicked = jnp.asarray(rng.integers(1, N, size=(B, 5)), jnp.int32).at[:, 0].set(tgt)
    monkeypatch.setattr(ptopk, "MIN_ROWS_FOR_TILED", 64)

    table_sharded = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    results = {}
    for mode in ("off", "on"):
        T.PALLAS = mode
        try:
            with jax.set_mesh(mesh):
                v, i = sharded_catalog_topk(u, table_sharded, k, mesh,
                                            clicked_rows=clicked, item_bias=bias)
                r = sharded_catalog_ranks(u, table_sharded, tgt, mesh,
                                          clicked, item_bias=bias)
            results[mode] = (np.asarray(v), np.asarray(i), np.asarray(r))
        finally:
            T.PALLAS = "auto"
    np.testing.assert_allclose(results["off"][0], results["on"][0], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(results["off"][1], results["on"][1])
    np.testing.assert_array_equal(results["off"][2], results["on"][2])


def test_tiled_ge_count_pallas_with_clicked_offset(rng):
    """The sharded building block: global-id masks via col_offset, clicked
    correction by gather, target excluded by id."""
    B, D, N = 7, 16, 1300
    off = 1300                                  # shard 2 of a 2600-catalog
    u = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    n_valid = 2595
    tgt = jnp.asarray(rng.integers(off, off + N, size=(B,)), jnp.int32)  # on-shard rows
    clicked = jnp.asarray(rng.integers(0, 2 * N, size=(B, 5)), jnp.int32)
    clicked = clicked.at[:, 0].set(tgt)
    s = _dense(u, t, None)
    ts = jnp.asarray(s[np.arange(B), np.asarray(tgt) - off] - 1e-6, jnp.float32)

    T.PALLAS = "off"
    c0 = np.asarray(jax.jit(lambda: T.tiled_ge_count(
        u, t, ts, clicked_rows=clicked, n_valid=n_valid, col_offset=off,
        tile=512, target_col=tgt))())
    T.PALLAS = "on"
    try:
        c1 = np.asarray(jax.jit(lambda: T.tiled_ge_count(
            u, t, ts, clicked_rows=clicked, n_valid=n_valid, col_offset=off,
            target_col=tgt))())
    finally:
        T.PALLAS = "auto"
    np.testing.assert_array_equal(c0, c1)
