"""End-to-end: context-sequential (DIN family) models."""
import argparse

import numpy as np
import pytest

from rechorus_tpu import registry
from rechorus_tpu.data.batching import get_batcher
from rechorus_tpu.data.synthetic import make_ctr_dataset


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    make_ctr_dataset(str(root / "SynthCTR"), n_per_user=20, expose_bias=0.7)
    return str(root)


def make_args(**over):
    base = dict(
        path=None, dataset="SynthCTR", sep="\t",
        include_item_features=1, include_user_features=1, include_situation_features=1,
        epoch=8, check_epoch=0, test_epoch=-1, early_stop=20, lr=1e-2, l2=0.0,
        batch_size=256, eval_batch_size=256, optimizer="Adam", num_workers=0,
        pin_memory=0, topk="5", metric="AUC,LOG_LOSS", main_metric="",
        model_path="", random_seed=3,
        num_neg=1, dropout=0.0, test_all=0, emb_size=16, loss_n="BCE", buffer=1,
        history_max=10, add_historical_situations=0,
        # ETA/SDIM field selections (defaults)
        short_target_field='["item_id"]', short_sequence_field='["history_item_id"]',
        long_target_field='["item_id"]', long_sequence_field='["history_item_id"]',
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
    state = runner.train(model, batchers, state)
    return runner.evaluate(state, model, batchers["test"], arrays["test"], "test", [], runner.metrics)


# AGRU/AIGRU gate updates by softmaxed attention (~1/H each) so they
# converge much slower than AUGRU on tiny data -- lower bar, still > random.
@pytest.mark.parametrize(
    "name,thresh,extra",
    [
        ("DINCTR", 0.65, dict(att_layers="[16]", dnn_layers="[32]")),
        ("DINCTR", 0.65, dict(att_layers="[16]", dnn_layers="[32]", add_historical_situations=1)),
        ("DIENCTR", 0.65, dict(evolving_gru_type="AUGRU", fcn_hidden_layers="[32]",
                               fcn_activations="ReLU", aux_hidden_layers="[16]",
                               aux_activations="ReLU", alpha_aux=0.0, epoch=25)),
        ("DIENCTR", 0.55, dict(evolving_gru_type="AGRU", fcn_hidden_layers="[32]",
                               fcn_activations="ReLU", aux_hidden_layers="[16]",
                               aux_activations="ReLU", alpha_aux=0.5, epoch=25)),
        ("DIENCTR", 0.55, dict(evolving_gru_type="AIGRU", fcn_hidden_layers="[32]",
                               fcn_activations="ReLU", aux_hidden_layers="[16]",
                               aux_activations="ReLU", alpha_aux=0.0, epoch=25)),
        # ETA/SDIM predict from attention outputs only (no direct target
        # features, reference parity) -- weaker/slower signal on tiny data;
        # verified trending upward over long runs. Tuple fields exercise
        # the concat_field path.
        ("ETACTR", 0.55, dict(dnn_hidden_units="[32]", attention_dim=16, retrieval_k=3,
                              hash_bits=2, recent_k=5, epoch=40,
                              short_target_field='[("item_id","i_category_c")]',
                              short_sequence_field='[("history_item_id","history_i_category_c")]',
                              long_target_field='[("item_id","i_category_c")]',
                              long_sequence_field='[("history_item_id","history_i_category_c")]')),
        ("SDIMCTR", 0.55, dict(dnn_hidden_units="[32]", attention_dim=16,
                               hash_bits=2, recent_k=5, num_hashes=2, epoch=40,
                               short_target_field='[("item_id","i_category_c")]',
                               short_sequence_field='[("history_item_id","history_i_category_c")]',
                               long_target_field='[("item_id","i_category_c")]',
                               long_sequence_field='[("history_item_id","history_i_category_c")]')),
        ("CANCTR", 0.55, dict(evolving_gru_type="AUGRU", fcn_hidden_layers="[32]",
                              fcn_activations="ReLU", aux_hidden_layers="[16]",
                              aux_activations="ReLU", alpha_aux=0.1,
                              induce_vec_size=128, orders=1, co_action_layers="[4,4]",
                              epoch=30)),
    ],
)
def test_din_ctr_learns(data_root, name, thresh, extra):
    after = run_ctr(data_root, name, make_args(**extra))
    assert np.isfinite(after["AUC"]) and after["AUC"] > thresh, f"{name}: {after}"


def test_din_topk_runs(data_root):
    import jax

    args = make_args(loss_n="BPR", metric="NDCG,HR", att_layers="[16]", dnn_layers="[32]")
    args.path = data_root
    model_cls = registry.get_model("DINTopK")
    reader = registry.get_reader(model_cls.reader)(args)
    model = model_cls.from_args(args, reader)
    runner = registry.get_runner(model_cls.runner)(args)
    batcher = get_batcher(model_cls.batcher)(reader, model, "train", args)
    arrays = batcher.device_arrays()
    state = runner.init_state(model, batcher, 0)
    state, loss = runner.fit(state, model, batcher, arrays, 1, jax.random.key(0))
    assert np.isfinite(loss)
