"""Zoo-wide lazy_table_specs audit: for every model family that declares
lazy specs, (a) every row the dense gradient touches is covered by
resolve_lazy_rows (so --lazy_emb_adam never silently freezes a trained
row), and (b) the --sparse_emb_grad lane is exact: same loss, identical
row gradients at the touched rows, identical gradients on every other
leaf. This is the regression gate for converting models from raw
`self.param(...)[ids]` gathers to ops.layers.embed (TableEmbed) -- a raw
gather bypasses the sparse-lookup context and would fail (a) or (b).
"""
import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rechorus_tpu import registry
from rechorus_tpu.data.batching import get_batcher
from rechorus_tpu.data.synthetic import make_kg_dataset, make_topk_dataset
from rechorus_tpu.ops import layers as L
from rechorus_tpu.ops.lazy_adam import (
    resolve_lazy_rows, sparse_rows_and_vals, split_params)

BASE = dict(
    epoch=1, check_epoch=0, test_epoch=-1, early_stop=10, lr=1e-2, l2=0.0,
    batch_size=64, eval_batch_size=64, optimizer="Adam", num_workers=0,
    pin_memory=0, topk="5", metric="NDCG,HR", main_metric="", model_path="",
    random_seed=0, num_neg=1, dropout=0.0, test_all=0, emb_size=16, buffer=1,
    history_max=8, dataset="Synth", sep="\t",
)

# (model, reader, reader args, model args). OPT_OUT models declare {} on
# purpose (documented in the model); everything else must audit clean.
CASES = [
    ("BPRMF", "BaseReader", {}, {}),
    ("NeuMF", "BaseReader", {}, dict(layers="[16]")),
    ("LightGCN", "BaseReader", {}, dict(n_layers=2)),
    ("BUIR", "BaseReader", {}, dict(momentum=0.995)),
    ("DirectAU", "BaseReader", {}, dict(gamma=0.3)),
    ("SASRec", "SeqReader", {}, dict(num_layers=1, num_heads=2)),
    ("GRU4Rec", "SeqReader", {}, dict(hidden_size=16)),
    ("NARM", "SeqReader", {}, dict(hidden_size=16, attention_size=8)),
    ("Caser", "SeqReader", {}, dict(num_horizon=4, num_vertical=2, L=3)),
    ("FPMC", "SeqReader", {}, {}),
    ("TiSASRec", "SeqReader", {}, dict(num_layers=1, num_heads=2, time_max=64)),
    ("ComiRec", "SeqReader", {}, dict(attn_size=8, K=2, add_pos=1)),
    ("CFKG", "KGReader", dict(dataset="SynthKG", include_attr=1),
     dict(margin=1.0, include_attr=1, dataset="SynthKG")),
    ("SLRCPlus", "KGReader", dict(dataset="SynthKG", include_attr=0),
     dict(time_scalar=864000, dataset="SynthKG")),
    ("KDA", "KDAReader", dict(dataset="SynthKG", include_attr=1, t_scalar=60,
                              n_dft=32, freq_rand=0, regenerate=0),
     dict(num_layers=1, num_heads=2, gamma=-1, attention_size=8,
          pooling="average", include_val=1, neg_head_p=0.5, include_attr=1,
          t_scalar=60, n_dft=32, freq_rand=0, regenerate=0, dataset="SynthKG")),
]

OPT_OUT = {"LightGCN"}  # graph conv back-props into every row each step


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("lazy_audit")
    make_topk_dataset(str(root / "Synth"), n_users=60, n_items=90, n_per_user=8)
    make_kg_dataset(str(root / "SynthKG"))
    return root


_CORPORA = {}


def _corpus(root, reader, rargs):
    rargs = dict(rargs)
    key = (reader, tuple(sorted(rargs.items())))
    if key not in _CORPORA:
        a = argparse.Namespace(path=str(root), dataset=rargs.pop("dataset", "Synth"),
                               sep="\t", **rargs)
        _CORPORA[key] = registry.get_reader(reader)(a)
    return _CORPORA[key]


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _leaf_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _leaf_paths(v, prefix + (k,))
    else:
        yield prefix, tree


@pytest.mark.parametrize("name,reader,rargs,margs",
                         CASES, ids=[c[0] for c in CASES])
def test_lazy_specs_cover_and_sparse_lane_exact(data_root, name, reader, rargs, margs):
    corpus = _corpus(data_root, reader, rargs)
    ns = argparse.Namespace(**{**BASE, "path": str(data_root), **margs})
    model_cls = registry.get_model(name)
    model = model_cls.from_args(ns, corpus)
    specs = model.lazy_table_specs()
    if name in OPT_OUT:
        assert specs == {}, f"{name} is expected to opt out of lazy Adam"
        return
    assert specs, f"{name} declares no lazy_table_specs"

    runner = registry.get_runner(model_cls.runner)(ns)
    batcher = get_batcher(model_cls.batcher)(corpus, model, "train", ns)
    arrays = runner.place_arrays(batcher.device_arrays())
    state = runner.init_state(model, batcher, 0)
    n = min(ns.batch_size, len(batcher))
    feed = batcher.train_feed(arrays, jnp.arange(n, dtype=jnp.int32), jax.random.key(3))

    def loss_fn(params):
        variables = {"params": params, **state.extra_vars}
        mutable = [k for k in state.extra_vars if k == "batch_stats"]
        if mutable:
            out, _ = model.apply(variables, feed, training=True,
                                 rngs={"dropout": jax.random.key(1)}, mutable=mutable)
        else:
            out = model.apply(variables, feed, training=True,
                              rngs={"dropout": jax.random.key(1)})
        return model.loss(out, feed)

    rows_map = resolve_lazy_rows(specs, state.params, feed)
    assert rows_map, (f"{name}: specs matched no param/feed keys -- the runner "
                      "raises ValueError for this under --lazy_emb_adam")

    # (a) coverage: dense-touched rows of every lazy table are in rows_map
    dense_loss, dense_grads = jax.value_and_grad(loss_fn)(state.params)
    for path, rows in rows_map.items():
        g = np.asarray(_get(dense_grads, path))
        touched = np.nonzero(np.abs(g).reshape(g.shape[0], -1).sum(1))[0]
        covered = np.unique(np.asarray(rows))
        missing = sorted(set(touched.tolist()) - set(covered.tolist()))
        assert not missing, (f"{name} {path}: rows {missing[:8]} get dense "
                             "gradient but are not covered by lazy_table_specs "
                             "-- lazy Adam would silently freeze them")

    # (b) sparse-grad lane exactness (mirrors runners/base.py:335-358)
    rows_info, vals0 = sparse_rows_and_vals(state.params, rows_map)
    rest0, reassemble = split_params(state.params, list(rows_map))

    def sparse_loss_fn(vals, rest):
        L.set_sparse_lookup({p: (rows_info[p][0], vals[p], None,
                         rows_info[p][2]) for p in rows_info})
        try:
            return loss_fn(reassemble(rest))
        finally:
            L.set_sparse_lookup(None)

    sparse_loss, (g_vals, g_rest) = jax.value_and_grad(
        sparse_loss_fn, argnums=(0, 1))(vals0, rest0)

    np.testing.assert_allclose(np.asarray(sparse_loss), np.asarray(dense_loss),
                               rtol=1e-5, err_msg=f"{name}: sparse-lane forward drifts")
    for path in rows_info:
        rows, scatter = (np.asarray(a) for a in rows_info[path][:2])
        valid = scatter < _get(state.params, path).shape[0]
        got = np.asarray(g_vals[path])[valid]
        want = np.asarray(_get(dense_grads, path))[rows[valid]]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6,
                                   err_msg=f"{name} {path}: sparse row grads != dense rows")
    for path, g in _leaf_paths(g_rest):
        want = np.asarray(_get(dense_grads, path))
        np.testing.assert_allclose(np.asarray(g), want, rtol=1e-4, atol=1e-6,
                                   err_msg=f"{name} {path}: non-table grads differ")
