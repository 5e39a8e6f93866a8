"""ServeIndex: build-once / query-many serving API vs the runner paths."""
import argparse

import jax
import numpy as np
import pytest

from rechorus_tpu import registry
from rechorus_tpu.data.batching import get_batcher
from rechorus_tpu.data.synthetic import make_topk_dataset
from rechorus_tpu.serve import ServeIndex


@pytest.fixture(scope="module")
def stack(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    make_topk_dataset(str(root / "Synth"), n_users=60, n_items=900,
                      n_per_user=8, n_neg=9)
    args = argparse.Namespace(
        path=str(root), dataset="Synth", sep="\t",
        epoch=2, check_epoch=0, test_epoch=-1, early_stop=10, lr=1e-2, l2=0.0,
        batch_size=64, eval_batch_size=16, optimizer="Adam", num_workers=0,
        pin_memory=0, topk="5", metric="NDCG,HR", main_metric="",
        model_path="", random_seed=3, num_neg=1, dropout=0.0, test_all=1,
        emb_size=16, buffer=1,
    )
    model_cls = registry.get_model("BPRMF")
    corpus = registry.get_reader(model_cls.reader)(args)
    model = model_cls.from_args(args, corpus)
    runner = registry.get_runner(model_cls.runner)(args)
    batchers = {p: get_batcher(model_cls.batcher)(corpus, model, p, args)
                for p in ["train", "test"]}
    arrays = {p: b.device_arrays() for p, b in batchers.items()}
    state = runner.init_state(model, batchers["train"], 3)
    state, _ = runner.fit(state, model, batchers["train"], arrays["train"], 1,
                          jax.random.key(0))
    return corpus, model, runner, batchers, arrays, state


def test_serve_index_matches_runner_export(stack):
    """ServeIndex.query == the runner's predict_topk export for the same
    users (same params, same clicked exclusion)."""
    corpus, model, runner, batchers, arrays, state = stack
    idx = ServeIndex.build(model, state, corpus, k=10)
    items_r, scores_r = runner.predict_topk(
        state, model, batchers["test"], arrays["test"], "test", k=10)
    users = batchers["test"].arrays["user_id"][: items_r.shape[0]]
    items_s, scores_s = idx.query(users)
    np.testing.assert_allclose(scores_s, scores_r, rtol=2e-5, atol=1e-5)
    diff = items_s != items_r
    if diff.any():  # ties only
        np.testing.assert_allclose(scores_s[diff], scores_r[diff], rtol=2e-5)


def test_serve_index_exclusions(stack):
    corpus, model, runner, batchers, arrays, state = stack
    idx = ServeIndex.build(model, state, corpus, k=20)
    users = np.arange(1, 33, dtype=np.int32)
    items, _ = idx.query(users)
    assert not (items == 0).any()
    clicked = np.asarray(corpus.clicked_matrix(include_residual=True))
    for b, u in enumerate(users):
        cl = set(int(x) for x in clicked[u] if x > 0)
        assert not set(int(x) for x in items[b]) & cl

    # without exclusion, clicked items may appear (they score high)
    idx2 = ServeIndex.build(model, state, corpus, k=20, exclude_clicked=False)
    items2, _ = idx2.query(users)
    assert any(set(int(x) for x in items2[b])
               & set(int(x) for x in clicked[u] if x > 0)
               for b, u in enumerate(users))


def test_serve_index_approx_smoke(stack):
    corpus, model, runner, batchers, arrays, state = stack
    idx = ServeIndex.build(model, state, corpus, k=10, approx=True)
    items, v = idx.query(np.arange(1, 17, dtype=np.int32))
    assert np.isfinite(v[:, 0]).all() and not (items == 0).any()


def test_serve_index_from_tables_transformed(stack):
    """Transformed-table models route through from_tables; build() on
    them errors loudly."""
    corpus, model, runner, batchers, arrays, state = stack
    lightgcn_cls = registry.get_model("LightGCN")
    with pytest.raises(ValueError, match="from_tables"):
        ServeIndex.build(lightgcn_cls.from_args(argparse.Namespace(
            emb_size=16, n_layers=1, num_neg=1, dropout=0.0, test_all=0,
            model_path="", buffer=1), corpus), state)

    rng = np.random.default_rng(0)
    idx = ServeIndex.from_tables(rng.normal(size=(60, 8)).astype(np.float32),
                                 rng.normal(size=(900, 8)).astype(np.float32),
                                 k=5)
    items, v = idx.query(np.arange(1, 9, dtype=np.int32))
    assert v.shape == (8, 5) and not (items == 0).any()
