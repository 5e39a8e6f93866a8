"""Tiled/hierarchical catalog top-k and rank kernels vs the dense paths.

The tiled kernels (`ops/topk.py`) must reproduce the dense
`metrics.masked_topk` / `pallas_kernels.catalog_ranks` results exactly
(mod index ties at equal scores) on every edge: non-tile-divisible
catalogs, bucket-unaligned tails, item bias, dead padded rows, clicked
exclusions.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rechorus_tpu.ops import metrics as metrics_ops
from rechorus_tpu.ops.pallas_kernels import catalog_ranks
from rechorus_tpu.ops.topk import tiled_catalog_ranks, tiled_catalog_topk


def _setup(N, B=13, D=16, M=7, seed=0, bias=True):
    rng = np.random.default_rng(seed)
    table = jnp.asarray(rng.standard_normal((N, D)), dtype=jnp.float32)
    u = jnp.asarray(rng.standard_normal((B, D)), dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal((N,)), dtype=jnp.float32) if bias else None
    clicked = np.zeros((B, M), dtype=np.int32)
    for i in range(B):
        m = rng.integers(0, M + 1)
        clicked[i, :m] = rng.choice(np.arange(1, N), size=m, replace=False)
    return u, table, b, jnp.asarray(clicked)


def _dense_scores(u, table, b, n_valid):
    s = u @ table.T
    if b is not None:
        s = s + b[None, :]
    if n_valid is not None and n_valid < table.shape[0]:
        s = jnp.where(jnp.arange(table.shape[0]) < n_valid, s, -jnp.inf)
    return s


@pytest.mark.parametrize("N,tile,bucket,n_valid", [
    (4096, 1024, 16, None),       # divisible everything
    (5000, 1024, 16, 4993),       # tail chunk + dead rows
    (2049, 2048, 16, 2049),       # driver shape: 1-row tail
    (777, 4096, 8, None),         # single short tile, unaligned to bucket
    (4096, 1000, 16, None),       # tile forced down to a bucket multiple
])
def test_tiled_topk_matches_dense(N, tile, bucket, n_valid):
    k = 20
    u, table, b, clicked = _setup(N)
    dense = _dense_scores(u, table, b, n_valid)
    dv, di = metrics_ops.masked_topk(dense, clicked, k, n_valid=n_valid)
    tv, ti = tiled_catalog_topk(u, table, k, bias=b, clicked_rows=clicked,
                                n_valid=n_valid, bucket=bucket, tile=tile)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(tv), rtol=1e-5, atol=1e-5)
    # ids equal except where scores tie
    mism = np.asarray(di) != np.asarray(ti)
    if mism.any():
        np.testing.assert_allclose(np.asarray(dv)[mism], np.asarray(tv)[mism],
                                   rtol=1e-5, atol=1e-5)


def test_tiled_topk_no_clicked_no_bias():
    u, table, _, _ = _setup(3000, bias=False)
    dense = _dense_scores(u, table, None, None)
    dv, di = metrics_ops.masked_topk(dense, jnp.zeros((u.shape[0], 1), jnp.int32), 10)
    tv, ti = tiled_catalog_topk(u, table, 10, tile=1024)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(tv), rtol=1e-5, atol=1e-5)


def test_tiled_topk_under_jit_in_scan():
    """The kernel must trace inside the eval scan (static tile plan)."""
    u, table, b, clicked = _setup(2049)

    @jax.jit
    def run(u, table):
        def step(c, _):
            v, i = tiled_catalog_topk(u, table, 5, bias=b, clicked_rows=clicked,
                                      tile=512)
            return c + v.sum(), i
        acc, ids = jax.lax.scan(step, jnp.float32(0), jnp.arange(2))
        return acc, ids

    acc, ids = run(u, table)
    assert np.isfinite(float(acc))
    assert ids.shape == (2, u.shape[0], 5)


@pytest.mark.parametrize("N,tile,n_valid", [
    (4096, 1024, None), (5000, 1024, 4993), (2049, 2048, 2049), (777, 4096, None),
])
def test_tiled_ranks_match_dense(N, tile, n_valid):
    u, table, b, clicked = _setup(N, seed=3)
    rng = np.random.default_rng(4)
    hi = n_valid if n_valid is not None else N
    target = jnp.asarray(rng.integers(1, hi, size=(u.shape[0],)), dtype=jnp.int32)
    dense = _dense_scores(u, table, b, n_valid)
    want = catalog_ranks(dense, target, clicked)
    got = tiled_catalog_ranks(u, table, target, clicked, bias=b,
                              n_valid=n_valid, tile=tile)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_tiled_topk_approx_recall():
    """Approx lane: recall vs exact should be near the target."""
    u, table, b, clicked = _setup(8192, B=32, seed=5)
    dense = _dense_scores(u, table, b, None)
    dv, di = metrics_ops.masked_topk(dense, clicked, 100)
    tv, ti = tiled_catalog_topk(u, table, 100, bias=b, clicked_rows=clicked,
                                tile=2048, approx=True, recall_target=0.95)
    exact = [set(map(int, row)) for row in np.asarray(di)]
    appr = [set(map(int, row)) for row in np.asarray(ti)]
    recall = np.mean([len(e & a) / len(e) for e, a in zip(exact, appr)])
    assert recall >= 0.9, recall


def test_bucket_overhang_does_not_duplicate_last_item():
    """Regression: the last bucket's expansion overhangs a non-divisible
    catalog; clamping those slots to N-1 used to inject duplicate copies
    of the last item that could occupy top-k slots and displace a true
    winner. N=17, bucket=16, k=2 with item 16 ranked 1st and item 5 2nd:
    the buggy kernel returned [16, 16]."""
    N, D, k = 17, 8, 2
    table = np.zeros((N, D), np.float32)
    table[16, 0] = 2.0   # top-1
    table[5, 0] = 1.0    # top-2
    table[7, 0] = 0.5    # top-3
    u = np.asarray([[1.0] + [0.0] * (D - 1)], np.float32)
    v, ids = tiled_catalog_topk(jnp.asarray(u), jnp.asarray(table), k,
                                bucket=16, tile=64)
    ids = np.asarray(ids)[0].tolist()
    assert ids == [16, 5], ids
    # uniqueness holds at larger k too (excluding id 0, masked as pad)
    v, ids = tiled_catalog_topk(jnp.asarray(u), jnp.asarray(table), 8,
                                bucket=16, tile=64)
    row = np.asarray(ids)[0]
    valid = row[np.asarray(v)[0] > -np.inf]
    assert len(set(valid.tolist())) == len(valid)


def test_grouped_rescore_matches_flat():
    """`grouped_table` (the slice-contiguous rescore copy, r5) must be a
    pure layout change: identical values/ids to the flat rescore through
    the pallas branch, across bucket-unaligned catalogs and dead rows."""
    from rechorus_tpu.ops import topk as T
    from rechorus_tpu.ops.topk import group_table_for_rescore

    old_pallas = T.PALLAS
    T.PALLAS = "on"
    try:
        for N, n_valid in [(4096, None), (5000, 4993), (2049, 2049)]:
            u, table, b, clicked = _setup(N)
            grouped = group_table_for_rescore(table, bucket=16)
            fv, fi = tiled_catalog_topk(u, table, 20, bias=b,
                                        clicked_rows=clicked, n_valid=n_valid,
                                        bucket=16)
            gv, gi = tiled_catalog_topk(u, table, 20, bias=b,
                                        clicked_rows=clicked, n_valid=n_valid,
                                        bucket=16, grouped_table=grouped)
            np.testing.assert_allclose(np.asarray(fv), np.asarray(gv),
                                       rtol=1e-5, atol=1e-6, err_msg=f"N={N}")
            mism = np.asarray(fi) != np.asarray(gi)
            if mism.any():  # ties only
                np.testing.assert_allclose(np.asarray(fv)[mism],
                                           np.asarray(gv)[mism], rtol=1e-5)
            # approx lane shares the rescore
            fv, _ = tiled_catalog_topk(u, table, 20, bias=b, clicked_rows=clicked,
                                       n_valid=n_valid, bucket=16, approx=True)
            gv, _ = tiled_catalog_topk(u, table, 20, bias=b, clicked_rows=clicked,
                                       n_valid=n_valid, bucket=16, approx=True,
                                       grouped_table=grouped)
            np.testing.assert_allclose(np.asarray(fv), np.asarray(gv),
                                       rtol=1e-5, atol=1e-6)
    finally:
        T.PALLAS = old_pallas


def test_tiled_topk_pallas_wide_bucket_matrix_matches_dense():
    """Pallas stage 1 with a wide (3000-bucket) matrix + the direct
    full-width exact select (the only exact select since r5 -- see the
    measurement graveyard in ops/topk.py) must match dense."""
    from rechorus_tpu.ops import topk as T

    u, table, b, clicked = _setup(6000, B=5, D=8)
    dv, di = metrics_ops.masked_topk(
        (u @ table.T + b[None, :]).at[:, 0].set(-np.inf), clicked, 10)
    old_pallas = T.PALLAS
    T.PALLAS = "on"
    try:
        tv, ti = tiled_catalog_topk(u, table, 10, bias=b, clicked_rows=clicked,
                                    tile=2048, bucket=2)
    finally:
        T.PALLAS = old_pallas
    np.testing.assert_allclose(np.asarray(tv), np.asarray(dv), rtol=1e-5)


def test_two_level_bucket_select_matches_direct():
    """The contiguous two-level exact select (r5, routes wide bucket-max
    matrices at G >= TWO_LEVEL_MIN_G) must reproduce direct lax.top_k:
    bit-identical ids on tie-free data, value-identical on ties (the
    documented convention difference: tied ids may come back in
    super-rank rather than lowest-index order)."""
    from rechorus_tpu.ops.topk import two_level_bucket_select

    rng = np.random.default_rng(3)
    for B, G, kk, fan in [(7, 5000, 30, 16), (3, 4097, 150, 16),
                          (5, 2048, 17, 8), (2, 640, 3, 16)]:
        bm = jnp.asarray(rng.standard_normal((B, G)), dtype=jnp.float32)
        dv, di = jax.lax.top_k(bm, kk)
        tv, ti = two_level_bucket_select(bm, kk, fan)
        np.testing.assert_array_equal(np.asarray(tv), np.asarray(dv),
                                      err_msg=f"G={G}")
        np.testing.assert_array_equal(np.asarray(ti), np.asarray(di),
                                      err_msg=f"G={G}")

    # adversarial exact ties: integer-valued f32 scores, heavy collisions
    bm = jnp.asarray(rng.integers(0, 9, size=(6, 4000)).astype(np.float32))
    dv, _ = jax.lax.top_k(bm, 50)
    tv, ti = two_level_bucket_select(bm, 50, 16)
    np.testing.assert_array_equal(np.asarray(tv), np.asarray(dv))
    tin = np.asarray(ti)
    # ids must be distinct and each id's value must match its slot value
    for r in range(tin.shape[0]):
        assert len(set(tin[r])) == tin.shape[1]
    np.testing.assert_array_equal(np.asarray(bm)[np.arange(6)[:, None], tin],
                                  np.asarray(tv))

    # degenerate widths fall back to direct
    bm = jnp.asarray(rng.standard_normal((4, 40)), dtype=jnp.float32)
    dv, di = jax.lax.top_k(bm, 12)
    tv, ti = two_level_bucket_select(bm, 12, 16)   # G <= fan*kk
    np.testing.assert_array_equal(np.asarray(tv), np.asarray(dv))
    np.testing.assert_array_equal(np.asarray(ti), np.asarray(di))


def test_tiled_topk_two_level_route_matches_dense():
    """End-to-end pallas path with the two-level select forced on (the
    product route for G >= TWO_LEVEL_MIN_G wide catalogs) must match the
    dense masked_topk oracle, incl. clicked knockout, bias, dead rows
    and the grouped-rescore table."""
    from rechorus_tpu.ops import topk as T
    from rechorus_tpu.ops.topk import group_table_for_rescore

    u, table, b, clicked = _setup(6100, B=9, D=8)
    n_valid = 6091
    dv, di = metrics_ops.masked_topk(
        jnp.where(jnp.arange(6100)[None, :] < n_valid,
                  u @ table.T + b[None, :], -jnp.inf).at[:, 0].set(-np.inf),
        clicked, 10)
    old_pallas, old_min = T.PALLAS, T.TWO_LEVEL_MIN_G
    T.PALLAS, T.TWO_LEVEL_MIN_G = "on", 64
    try:
        tv, ti = tiled_catalog_topk(u, table, 10, bias=b, clicked_rows=clicked,
                                    n_valid=n_valid, bucket=2)
        gv, gi = tiled_catalog_topk(u, table, 10, bias=b, clicked_rows=clicked,
                                    n_valid=n_valid, bucket=2,
                                    grouped_table=group_table_for_rescore(table, bucket=2))
    finally:
        T.PALLAS, T.TWO_LEVEL_MIN_G = old_pallas, old_min
    np.testing.assert_allclose(np.asarray(tv), np.asarray(dv), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ti), np.asarray(di))
    np.testing.assert_allclose(np.asarray(gv), np.asarray(dv), rtol=1e-5)
