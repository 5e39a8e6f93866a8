"""Packed [p | mu | nu] epoch-carry lane (--packed_opt_rows).

The sparse-grad lane commits each lazy table's Adam step with ONE
[R, 3D] row scatter by carrying [param | mu | nu] concatenated through
the epoch scan (ops/lazy_adam.pack_lazy_leaves). The Adam math is
lane-for-lane the same as the three-scatter lane, so in f32 the two
must produce IDENTICAL trajectories through the real runner epoch path.
"""
import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rechorus_tpu import registry
from rechorus_tpu.data.batching import get_batcher
from rechorus_tpu.data.synthetic import make_kg_dataset, make_topk_dataset
from rechorus_tpu.ops.lazy_adam import (
    LazyAdamState, pack_lazy_leaves, unpack_lazy_leaves)

BASE = dict(
    epoch=2, check_epoch=0, test_epoch=-1, early_stop=10, lr=1e-2, l2=1e-4,
    batch_size=32, eval_batch_size=64, optimizer="Adam", num_workers=0,
    pin_memory=0, topk="5", metric="NDCG,HR", main_metric="", model_path="",
    random_seed=7, num_neg=1, dropout=0.0, test_all=0, emb_size=16, buffer=1,
    history_max=8, dataset="Synth", sep="\t", lazy_emb_adam=1,
    sparse_emb_grad=1,
)


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("packed_sparse")
    make_topk_dataset(str(root / "Synth"), n_users=50, n_items=80, n_per_user=9)
    return root


def _run_epochs(data_root, name, packed, margs=None, epochs=2):
    ns = argparse.Namespace(**{**BASE, "path": str(data_root),
                               "packed_opt_rows": packed, **(margs or {})})
    model_cls = registry.get_model(name)
    reader_cls = registry.get_reader(model_cls.reader)
    corpus = reader_cls(ns)
    model = model_cls.from_args(ns, corpus)
    runner = registry.get_runner(model_cls.runner)(ns)
    batcher = get_batcher(model_cls.batcher)(corpus, model, "train", ns)
    arrays = runner.place_arrays(batcher.device_arrays())
    state = runner.init_state(model, batcher, ns.random_seed)
    key = jax.random.key(ns.random_seed)
    for ep in range(epochs):
        key, ek = jax.random.split(key)
        state, loss = runner.fit(state, model, batcher, arrays, ep, ek)
    return jax.device_get({"params": state.params,
                           "mu": state.opt_state.mu,
                           "nu": state.opt_state.nu}), float(loss), runner


@pytest.mark.parametrize("name", ["BPRMF", "SASRec", "GRU4Rec"])
def test_packed_lane_matches_unpacked(data_root, name):
    margs = {"SASRec": dict(num_layers=1, num_heads=2),
             "GRU4Rec": dict(hidden_size=16)}.get(name, {})
    packed, l1, r1 = _run_epochs(data_root, name, packed=1, margs=margs)
    assert r1._packed_paths, "packed lane did not engage"
    plain, l2, r2 = _run_epochs(data_root, name, packed=0, margs=margs)
    assert not r2._packed_paths
    assert np.isclose(l1, l2, rtol=1e-5), (l1, l2)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(packed)
    flat_u = dict(jax.tree_util.tree_flatten_with_path(plain)[0])
    for path, leaf in flat_p:
        np.testing.assert_allclose(
            leaf, flat_u[path], rtol=0, atol=1e-6,
            err_msg=f"{name}: {jax.tree_util.keystr(path)}")


def test_pack_unpack_roundtrip():
    params = {"emb": {"embedding": jnp.arange(24, dtype=jnp.float32).reshape(6, 4)},
              "w": jnp.ones((3,), jnp.float32)}
    state = LazyAdamState(
        count=jnp.asarray(5, jnp.int32),
        mu=jax.tree.map(lambda p: p * 0.5, params),
        nu=jax.tree.map(lambda p: p * 0.25, params))
    paths = [("emb", "embedding")]
    pp, ps, dt = pack_lazy_leaves(params, state, paths)
    assert pp["emb"]["embedding"].shape == (6, 12)
    assert ps.mu["emb"]["embedding"].shape == (0,)
    up, us = unpack_lazy_leaves(pp, ps, dt)
    for tree, ref in [(up, params), (us.mu, state.mu), (us.nu, state.nu)]:
        for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(ref)):
            np.testing.assert_array_equal(a, b)


def test_pack_bf16_roundtrip_exact():
    p = jnp.linspace(-1, 1, 32, dtype=jnp.float32).astype(jnp.bfloat16).reshape(8, 4)
    params = {"t": {"embedding": p}}
    state = LazyAdamState(count=jnp.asarray(0, jnp.int32),
                          mu={"t": {"embedding": jnp.zeros((8, 4), jnp.float32)}},
                          nu={"t": {"embedding": jnp.zeros((8, 4), jnp.float32)}})
    pp, ps, dt = pack_lazy_leaves(params, state, [("t", "embedding")])
    assert pp["t"]["embedding"].dtype == jnp.float32
    up, _ = unpack_lazy_leaves(pp, ps, dt)
    assert up["t"]["embedding"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(up["t"]["embedding"], np.float32),
                                  np.asarray(p, np.float32))


def test_packed_lane_on_mesh(data_root):
    """Packed [N, 3D] carry under a 4x2 mesh (row-sharded tables): the
    epoch must compile, run, and keep a finite loss; the packed paths
    must actually engage."""
    out, loss, runner = _run_epochs(
        data_root, "BPRMF", packed=1,
        margs={"data_parallel": 4, "model_parallel": 2}, epochs=1)
    assert runner.mesh is not None
    assert runner._packed_paths
    assert np.isfinite(loss)
    for leaf in jax.tree.leaves(out):
        assert np.all(np.isfinite(leaf))


def test_nan_placeholder_is_dead_in_correct_models(data_root):
    """--debug_nan_placeholder poisons the spliced placeholder; a model
    whose table reads all go through TableEmbed's sparse-lookup gather
    (BPRMF) must still train with a finite loss — proving the
    placeholder is truly dead code for the supported model set."""
    _, loss, runner = _run_epochs(data_root, "BPRMF", packed=1,
                                  margs={"debug_nan_placeholder": 1}, epochs=1)
    assert runner._packed_paths
    assert np.isfinite(loss)


def test_packed_lane_engages_with_l2_decay(data_root):
    """l2 > 0 exercises the decay-mask path on the packed carry."""
    packed, l1, _ = _run_epochs(data_root, "BPRMF", packed=1,
                                margs={"l2": 1e-3}, epochs=1)
    plain, l2_, _ = _run_epochs(data_root, "BPRMF", packed=0,
                                margs={"l2": 1e-3}, epochs=1)
    assert np.isclose(l1, l2_, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(packed), jax.tree.leaves(plain)):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)
