"""End-to-end: context/CTR models on a synthetic corpus with features."""
import argparse

import numpy as np
import pytest

from rechorus_tpu import registry
from rechorus_tpu.data.batching import get_batcher
from rechorus_tpu.data.synthetic import make_ctr_dataset


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    make_ctr_dataset(str(root / "SynthCTR"))
    return str(root)


def make_args(**over):
    base = dict(
        path=None, dataset="SynthCTR", sep="\t",
        include_item_features=1, include_user_features=1, include_situation_features=1,
        epoch=6, check_epoch=0, test_epoch=-1, early_stop=10, lr=5e-3, l2=0.0,
        batch_size=256, eval_batch_size=256, optimizer="Adam", num_workers=0,
        pin_memory=0, topk="5", metric="AUC,LOG_LOSS,ACC,F1_SCORE", main_metric="",
        model_path="", random_seed=3,
        num_neg=1, dropout=0.0, test_all=0, emb_size=16, loss_n="BCE", buffer=1,
    )
    base.update(over)
    return argparse.Namespace(**base)


def run_ctr(data_root, name, args):
    args.path = data_root
    model_cls = registry.get_model(name)
    reader = registry.get_reader(model_cls.reader)(args)
    model = model_cls.from_args(args, reader)
    runner = registry.get_runner(model_cls.runner)(args)
    batchers = {p: get_batcher(model_cls.batcher)(reader, model, p, args) for p in ["train", "dev", "test"]}
    arrays = {p: b.device_arrays() for p, b in batchers.items()}
    state = runner.init_state(model, batchers["train"], args.random_seed)
    before = runner.evaluate(state, model, batchers["test"], arrays["test"], "test", [], runner.metrics)
    state = runner.train(model, batchers, state)
    after = runner.evaluate(state, model, batchers["test"], arrays["test"], "test", [], runner.metrics)
    return before, after


def test_fm_ctr_learns(data_root):
    before, after = run_ctr(data_root, "FMCTR", make_args(epoch=15, lr=1e-2))
    assert after["AUC"] > 0.8, (before, after)
    assert after["LOG_LOSS"] < before["LOG_LOSS"]


@pytest.mark.parametrize(
    "name,extra",
    [
        ("WideDeepCTR", dict(layers="[32]")),
        ("DeepFMCTR", dict(layers="[32]")),
        ("AFMCTR", dict(attention_size=16, reg_weight=0.1)),
        ("DCNCTR", dict(layers="[32]", cross_layer_num=2, reg_weight=0.1)),
        ("DCNv2CTR", dict(layers="[32]", cross_layer_num=2, mixed=1, structure="parallel",
                          low_rank=8, expert_num=2, reg_weight=0.1)),
        ("DCNv2CTR", dict(layers="[32]", cross_layer_num=2, mixed=0, structure="stacked",
                          low_rank=8, expert_num=2, reg_weight=0.1)),
        # AutoInt converges slowly on tiny data (deep attention stack,
        # N(0,0.01) init) -- verified trending 0.50->0.65 over 40 epochs
        ("AutoIntCTR", dict(layers="[32]", attention_size=16, num_heads=2, num_layers=1, epoch=25)),
        ("xDeepFMCTR", dict(layers="[32]", cin_layers="[4,4]", direct=0, reg_weight=0.01)),
        ("xDeepFMCTR", dict(layers="[32]", cin_layers="[4,4]", direct=1, reg_weight=0.01)),
        ("SAMCTR", dict(interaction_type="SAM2E", aggregation="concat", num_layers=1, use_residual=0)),
        ("SAMCTR", dict(interaction_type="SAM3A", aggregation="mean_pooling", num_layers=1, use_residual=1, epoch=30)),
        ("FinalMLPCTR", dict(mlp1_hidden_units="[32]", mlp1_hidden_activations="ReLU", mlp1_dropout=0.0,
                             mlp1_batch_norm=0, mlp2_hidden_units="[32]", mlp2_hidden_activations="ReLU",
                             mlp2_dropout=0.0, mlp2_batch_norm=0, use_fs=1, fs_hidden_units="[16]",
                             fs1_context="", fs2_context="c_hour_c,i_category_c", num_heads=2)),
    ],
)
def test_context_ctr_models_learn(data_root, name, extra):
    overrides = dict(epoch=10, lr=1e-2)
    overrides.update(extra)
    before, after = run_ctr(data_root, name, make_args(**overrides))
    assert np.isfinite(after["AUC"]) and np.isfinite(after["LOG_LOSS"]), name
    assert after["AUC"] > 0.65, f"{name}: {after}"


def test_fm_topk_runs(data_root):
    # top-k mode on the same data (labels ignored; positives only in BPR)
    args = make_args(loss_n="BPR", metric="NDCG,HR", epoch=2)
    args.path = data_root
    model_cls = registry.get_model("FMTopK")
    reader = registry.get_reader(model_cls.reader)(args)
    model = model_cls.from_args(args, reader)
    runner = registry.get_runner(model_cls.runner)(args)
    # top-k eval requires neg_items columns; synthesize candidates by using
    # train only -- here we simply check the train step runs finite.
    batcher = get_batcher(model_cls.batcher)(reader, model, "train", args)
    arrays = batcher.device_arrays()
    state = runner.init_state(model, batcher, 0)
    import jax

    state, loss = runner.fit(state, model, batcher, arrays, 1, jax.random.key(0))
    assert np.isfinite(loss)


def test_ctr_runner_metrics_match_ops(data_root):
    from rechorus_tpu.ops import metrics as M

    before, after = run_ctr(data_root, "FMCTR", make_args(epoch=1))
    for k in ["AUC", "ACC", "F1_SCORE", "LOG_LOSS"]:
        assert k in after and np.isfinite(after[k])
