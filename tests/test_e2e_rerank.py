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
        ranker_model_file=ranker_setup["ckpt"], tuneranker=0, **extra,
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
