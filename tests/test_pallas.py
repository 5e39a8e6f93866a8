"""Pallas kernels: golden-tested against the reference's scatter-based
masked catalog ranking (BaseRunner.py:244-251 + evaluate_method :63).
Runs in interpreter mode on the CPU test backend."""
import jax.numpy as jnp
import numpy as np

from rechorus_tpu.ops.pallas_kernels import catalog_ranks, ge_count


def test_ge_count_matches_numpy():
    rng = np.random.default_rng(0)
    pred = rng.normal(size=(37, 513)).astype(np.float32)
    target = pred[np.arange(37), rng.integers(0, 513, size=37)]
    got = np.asarray(ge_count(jnp.asarray(pred), jnp.asarray(target), tile_n=256))
    expect = (pred >= target[:, None]).sum(axis=1)
    np.testing.assert_array_equal(got, expect)


def test_catalog_ranks_match_scatter_reference():
    rng = np.random.default_rng(1)
    B, N, M = 16, 300, 12
    pred = rng.normal(size=(B, N)).astype(np.float32)
    target_col = rng.integers(1, N, size=B).astype(np.int32)
    # clicked rows: unique ids per row, pad 0, ALWAYS include the target
    clicked = np.zeros((B, M), dtype=np.int32)
    for b in range(B):
        ids = rng.choice(np.arange(1, N), size=M - 1, replace=False)
        ids = np.unique(np.concatenate([[target_col[b]], ids]))[: M]
        clicked[b, : len(ids)] = ids

    got = np.asarray(catalog_ranks(
        jnp.asarray(pred), jnp.asarray(target_col), jnp.asarray(clicked)))

    # reference semantics: mask item 0 + clicked to -inf, rank vs >= target
    expect = np.zeros(B, dtype=np.int64)
    for b in range(B):
        t = pred[b, target_col[b]]
        p = pred[b].copy()
        p[0] = -np.inf
        p[clicked[b][clicked[b] > 0]] = -np.inf
        expect[b] = 1 + (p >= t).sum()
    np.testing.assert_array_equal(got, expect)
