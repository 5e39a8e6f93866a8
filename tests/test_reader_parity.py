"""Reader-output parity vs the torch reference's helpers.

The readers are the layer least directly pinned by the weight-port /
metric-parity suites (those only see readers through batched feeds).
Here the reference readers run on the SAME CSVs and every corpus
statistic they expose -- id spaces, clicked sets, per-user histories,
feature vocabularies, impression groupings, KG triplets, KDA frequency
spectra -- must match ours exactly.
"""
import argparse
import os
import shutil
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from rechorus_tpu import registry
from rechorus_tpu.data.synthetic import (make_ctr_dataset,
                                         make_impression_dataset,
                                         make_kg_dataset)

REF_SRC = "/root/reference/src"


@pytest.fixture(scope="module", autouse=True)
def ref_path():
    sys.path.insert(0, REF_SRC)
    np.int = int  # reference code predates numpy 1.24
    np.object = object  # collate_batch dtype check (BaseModel.py:146)
    yield
    sys.path.remove(REF_SRC)
    del np.int
    del np.object


def ns(**kw):
    return argparse.Namespace(**kw)


@pytest.fixture(scope="module")
def kg_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kg")
    make_kg_dataset(str(root / "SynthKG"))
    # the reference and our KDAReader both cache interval.pkl in the
    # dataset dir -- give each side its own copy
    shutil.copytree(str(root / "SynthKG"), str(root / "SynthKG_ref"))
    return root


def test_base_seq_reader_parity(kg_root):
    from helpers.SeqReader import SeqReader as RefSeqReader

    ref = RefSeqReader(ns(path=str(kg_root), dataset="SynthKG_ref", sep="\t"))
    ours = registry.get_reader("SeqReader")(
        ns(path=str(kg_root), dataset="SynthKG", sep="\t"))

    assert ours.n_users == ref.n_users and ours.n_items == ref.n_items
    for u in range(ref.n_users):
        assert set(np.asarray(ours.train_clicked_set.get(u, ())).tolist()) == \
            ref.train_clicked_set.get(u, set()), f"clicked mismatch u={u}"
        assert set(np.asarray(ours.residual_clicked_set.get(u, ())).tolist()) == \
            ref.residual_clicked_set.get(u, set()), f"residual mismatch u={u}"
        ours_his = [tuple(r) for r in np.asarray(ours.user_his.get(u, np.empty((0, 2))))]
        ref_his = [tuple(map(int, x)) for x in ref.user_his.get(u, [])]
        assert ours_his == ref_his, f"user_his mismatch u={u}"
    # per-split row parity incl. the position column SeqReader appends
    for phase in ["train", "dev", "test"]:
        np.testing.assert_array_equal(
            ours.data_df[phase]["position"].to_numpy(),
            ref.data_df[phase]["position"].to_numpy())


def test_context_reader_parity(tmp_path):
    from helpers.ContextReader import ContextReader as RefContextReader

    make_ctr_dataset(str(tmp_path / "SynthCTR"))
    flags = dict(include_item_features=1, include_user_features=1,
                 include_situation_features=1)
    ref = RefContextReader(ns(path=str(tmp_path), dataset="SynthCTR", sep="\t", **flags))
    ours = registry.get_reader("ContextReader")(
        ns(path=str(tmp_path), dataset="SynthCTR", sep="\t", **flags))

    assert dict(ours.feature_max) == dict(ref.feature_max)
    assert list(ours.item_feature_names) == list(ref.item_feature_names)
    assert list(ours.user_feature_names) == list(ref.user_feature_names)
    assert list(ours.situation_feature_names) == list(ref.situation_feature_names)
    for i in range(1, ref.n_items):
        for c in ref.item_feature_names:
            assert ours.item_features[i][c] == ref.item_features[i][c]
    for u in range(1, ref.n_users):
        for c in ref.user_feature_names:
            assert ours.user_features[u][c] == ref.user_features[u][c]


def test_impression_reader_parity(tmp_path):
    from helpers.ImpressionReader import ImpressionReader as RefImpressionReader

    make_impression_dataset(str(tmp_path / "SynthImp"))
    ref = RefImpressionReader(ns(path=str(tmp_path), dataset="SynthImp", sep="\t",
                                 impression_idkey="time"))
    ours = registry.get_reader("ImpressionReader")(
        ns(path=str(tmp_path), dataset="SynthImp", sep="\t", impression_idkey="time"))

    assert ours.n_users == ref.n_users and ours.n_items == ref.n_items
    for phase in ["train", "dev", "test"]:
        od, rd = ours.data_df[phase], ref.data_df[phase]
        assert len(od) == len(rd), phase
        np.testing.assert_array_equal(od["user_id"].to_numpy(), rd["user_id"].to_numpy())
        np.testing.assert_array_equal(
            od["pos_num"].to_numpy().astype(np.int64),
            rd["pos_num"].to_numpy().astype(np.int64))
        np.testing.assert_array_equal(
            od["neg_num"].to_numpy().astype(np.int64),
            rd["neg_num"].to_numpy().astype(np.int64))
        for j in range(len(od)):
            # sorted lists, not sets: multiplicity must match too (the
            # within-impression ORDER is a documented deviation -- the
            # reference iterates python sets, readers.py:344-352)
            assert sorted(map(int, od["pos_items"].iloc[j])) == sorted(map(int, rd["pos_items"].iloc[j]))
            assert sorted(map(int, od["neg_items"].iloc[j])) == sorted(map(int, rd["neg_items"].iloc[j]))


def test_kg_reader_parity(kg_root):
    from helpers.KGReader import KGReader as RefKGReader

    ref = RefKGReader(ns(path=str(kg_root), dataset="SynthKG_ref", sep="\t", include_attr=1))
    ours = registry.get_reader("KGReader")(
        ns(path=str(kg_root), dataset="SynthKG", sep="\t", include_attr=1))

    assert ours.n_relations == ref.n_relations
    assert ours.n_entities == ref.n_entities
    assert list(ours.item_relations) == list(ref.item_relations)
    assert list(ours.attr_relations) == list(ref.attr_relations)
    ours_triplets = set(map(tuple, ours.relation_df[["head", "relation", "tail"]].to_numpy().tolist()))
    assert ours_triplets == ref.triplet_set
    # no duplicate rows: KDA's KG sampling is uniform over relation_df
    assert len(ours.relation_df) == len(ours_triplets)


def test_kda_reader_parity(kg_root):
    """The DFT frequency spectra (freq_x) initialize KDA's temporal
    decay; they are a function of the interval distributions, so this
    also pins the chunked nearest-predecessor interval counting against
    the reference's early-exit loop."""
    from helpers.KDAReader import KDAReader as RefKDAReader

    common = dict(sep="\t", include_attr=1, t_scalar=60, n_dft=16, freq_rand=0,
                  regenerate=1)
    ref = RefKDAReader(ns(path=str(kg_root), dataset="SynthKG_ref", **common))
    ours = registry.get_reader("KDAReader")(
        ns(path=str(kg_root), dataset="SynthKG", **common))

    assert ours.freq_x.shape == ref.freq_x.shape
    # ours frees interval_dict after the DFT; both sides cache it
    import pickle

    with open(os.path.join(str(kg_root), "SynthKG", "interval.pkl"), "rb") as f:
        ours_iv = pickle.load(f)
    with open(os.path.join(str(kg_root), "SynthKG_ref", "interval.pkl"), "rb") as f:
        ref_iv = pickle.load(f)
    for col in ["virtual"] + list(ref.relations):
        assert sorted(map(int, ours_iv[col])) == sorted(map(int, ref_iv[col])), col
    np.testing.assert_allclose(np.asarray(ours.freq_x), np.asarray(ref.freq_x),
                               atol=1e-8)


def test_slrc_interval_feed_parity(kg_root):
    """SLRC's [B, C, R] relational_interval feed: our device searchsorted
    kernel (ops/kg.relational_intervals via SLRCBatcher) vs the reference
    Dataset's python loops (SLRCPlus.py:84-116), on identical dev rows."""
    import types

    import torch
    from helpers.KGReader import KGReader as RefKGReader
    from models.sequential.SLRCPlus import SLRCPlus as TorchSLRC

    from rechorus_tpu.data.batching import get_batcher
    from rechorus_tpu.registry import get_model

    ref_corpus = RefKGReader(ns(path=str(kg_root), dataset="SynthKG_ref",
                                sep="\t", include_attr=0))
    rargs = types.SimpleNamespace(
        device=torch.device("cpu"), model_path="", buffer=0, num_neg=1,
        dropout=0.0, test_all=0, emb_size=16, history_max=10,
        time_scalar=60 * 60 * 24 * 100)
    torch.manual_seed(0)
    ref_model = TorchSLRC(rargs, ref_corpus)
    ref_ds = TorchSLRC.Dataset(ref_model, ref_corpus, "dev")

    ours_corpus = registry.get_reader("KGReader")(
        ns(path=str(kg_root), dataset="SynthKG", sep="\t", include_attr=0))
    args = ns(emb_size=16, time_scalar=60 * 60 * 24 * 100, num_neg=1,
              dropout=0.0, test_all=0, model_path="", buffer=1,
              history_max=10, host_shard_input=0)
    model = get_model("SLRCPlus").from_args(args, ours_corpus)
    batcher = get_batcher("slrc")(ours_corpus, model, "dev", args)
    ours_iv = np.asarray(batcher.arrays["relational_interval"], dtype=np.float32)

    assert len(batcher) == len(ref_ds)
    for j in range(len(ref_ds)):
        fd = ref_ds._get_feed_dict(j)
        np.testing.assert_allclose(
            ours_iv[j], fd["relational_interval"].astype(np.float32),
            atol=1e-6, err_msg=f"row {j}")


def test_kda_feed_parity(kg_root):
    """KDA eval feeds: per-candidate relation-value entities (item_val)
    and log-normalized history time deltas vs the reference KDA.Dataset
    (KDA.py:192-218) on identical dev rows."""
    import types

    import jax.numpy as jnp
    import torch
    from helpers.KDAReader import KDAReader as RefKDAReader
    from models.sequential.KDA import KDA as TorchKDA

    from rechorus_tpu.data.batching import get_batcher
    from rechorus_tpu.registry import get_model

    common = dict(sep="\t", include_attr=1, t_scalar=60, n_dft=16, freq_rand=0,
                  regenerate=0)
    ref_corpus = RefKDAReader(ns(path=str(kg_root), dataset="SynthKG_ref", **common))
    rargs = types.SimpleNamespace(
        device=torch.device("cpu"), model_path="", buffer=0, num_neg=1,
        dropout=0.0, test_all=0, emb_size=16, history_max=10, num_layers=1,
        num_heads=1, n_dft=16, freq_rand=0, gamma=0.5, attention_size=10,
        pooling="average", include_val=1, neg_head_p=0.5)
    torch.manual_seed(0)
    ref_model = TorchKDA(rargs, ref_corpus)
    ref_ds = TorchKDA.Dataset(ref_model, ref_corpus, "dev")

    ours_corpus = registry.get_reader("KDAReader")(
        ns(path=str(kg_root), dataset="SynthKG", **common))
    args = ns(emb_size=16, num_layers=1, num_heads=1, gamma=0.5,
              attention_size=10, pooling="average", include_val=1,
              neg_head_p=0.5, t_scalar=60, freq_rand=0, num_neg=1,
              dropout=0.0, test_all=0, model_path="", buffer=1,
              history_max=10, host_shard_input=0)
    model = get_model("KDA").from_args(args, ours_corpus)
    batcher = get_batcher("kda")(ours_corpus, model, "dev", args)
    assert len(batcher) == len(ref_ds)
    B = len(batcher)
    feed = batcher.eval_feed(batcher.device_arrays(), jnp.arange(B))
    ours_val = np.asarray(feed["item_val"])
    ours_dt = np.asarray(feed["history_delta_t"])

    for j in range(B):
        fd = ref_ds._get_feed_dict(j)
        np.testing.assert_array_equal(ours_val[j], np.asarray(fd["item_val"]),
                                      err_msg=f"item_val row {j}")
        H = len(fd["history_delta_t"])
        np.testing.assert_allclose(ours_dt[j, :H], fd["history_delta_t"],
                                   atol=1e-5, err_msg=f"delta_t row {j}")


def test_din_pipeline_parity(tmp_path):
    """End-to-end pipeline parity for the DIN family: the SAME corpus
    flows through both frameworks' FULL data paths -- the reference's
    ContextSeqReader -> Dataset._get_feed_dict -> collate_batch vs our
    ContextSeqReader -> ContextSeqCTRBatcher.eval_feed -- into the same
    (weight-ported) model, and every dev-row prediction must match.
    This pins the feature joins, history assembly, and row alignment of
    the real batcher, not a hand-built feed."""
    import types

    import jax
    import jax.numpy as jnp
    from helpers.ContextSeqReader import ContextSeqReader as RefReader
    from models.context_seq.DIN import DINCTR as TorchDIN

    from rechorus_tpu.data.batching import get_batcher
    from rechorus_tpu.data.context import build_schema, is_categorical
    from rechorus_tpu.registry import get_model

    make_ctr_dataset(str(tmp_path / "SynthCTR"))
    flags = dict(include_item_features=1, include_user_features=1,
                 include_situation_features=1)
    ref_corpus = RefReader(ns(path=str(tmp_path), dataset="SynthCTR", sep="\t", **flags))
    ours_corpus = registry.get_reader("ContextSeqReader")(
        ns(path=str(tmp_path), dataset="SynthCTR", sep="\t", **flags))

    H = 5
    rargs = types.SimpleNamespace(
        device=torch.device("cpu"), model_path="", buffer=0, num_neg=0,
        dropout=0.0, test_all=0, emb_size=16, history_max=H,
        att_layers="[32]", dnn_layers="[24]", add_historical_situations=0,
        loss_n="BCE")
    torch.manual_seed(0)
    ref = TorchDIN(rargs, ref_corpus).eval()

    args = ns(emb_size=16, att_layers="[32]", dnn_layers="[24]",
              add_historical_situations=0, loss_n="BCE", dropout=0.0,
              test_all=0, num_neg=0, model_path="", buffer=1, history_max=H,
              host_shard_input=0)
    model_cls = get_model("DINCTR")
    model = model_cls.from_args(args, ours_corpus)

    # port the torch weights (same mapping as test_weight_port's DIN test)
    schema = build_schema(ours_corpus)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    fused = np.zeros((schema.total_vocab, 16), dtype=np.float32)
    params = {}
    for name, off in zip(schema.names, schema.offsets):
        if is_categorical(name):
            w = ref.embedding_dict[name].weight.detach().numpy()
            fused[off: off + w.shape[0]] = w
        else:
            params[f"float_{name}"] = {
                "kernel": ref.embedding_dict[name].weight.detach().numpy().T}
    params["fused_table"] = {"embedding": fused}
    params["att_mlp_layers"] = {
        "dense_0": {"kernel": sd["att_mlp_layers.mlp.0.weight"].T,
                    "bias": sd["att_mlp_layers.mlp.0.bias"]},
        "head": {"kernel": sd["att_mlp_layers.mlp.2.weight"].T,
                 "bias": sd["att_mlp_layers.mlp.2.bias"]},
    }
    params["dnn_mlp_layers"] = {
        "dense_0": {"kernel": sd["dnn_mlp_layers.mlp.0.weight"].T,
                    "bias": sd["dnn_mlp_layers.mlp.0.bias"]},
        "bn_0": {"scale": sd["dnn_mlp_layers.mlp.1.weight"],
                 "bias": sd["dnn_mlp_layers.mlp.1.bias"]},
        "dice_0": {"alpha": sd["dnn_mlp_layers.mlp.2.alpha"],
                   "bn": {"scale": sd["dnn_mlp_layers.mlp.2.bn.weight"],
                          "bias": sd["dnn_mlp_layers.mlp.2.bn.bias"]}},
        "head": {"kernel": sd["dnn_mlp_layers.mlp.3.weight"].T,
                 "bias": sd["dnn_mlp_layers.mlp.3.bias"]},
    }

    # reference pipeline: Dataset -> feed dicts -> collate -> forward
    ref_ds = TorchDIN.Dataset(ref, ref_corpus, "dev")
    batch = ref_ds.collate_batch([ref_ds._get_feed_dict(j) for j in range(len(ref_ds))])
    with torch.no_grad():
        ref_pred = ref(batch)["prediction"].numpy().reshape(-1)

    # our pipeline: batcher feeds straight from the corpus
    batcher = get_batcher(model_cls.batcher)(ours_corpus, model, "dev", args)
    assert len(batcher) == len(ref_ds)
    feed = batcher.eval_feed(batcher.device_arrays(), jnp.arange(len(batcher)))
    variables = model.init({"params": jax.random.key(0)}, feed, training=False)
    extra = {k: v for k, v in variables.items() if k != "params"}
    out = model.apply({"params": params, **extra}, feed, training=False)
    np.testing.assert_allclose(np.asarray(out["prediction"]).reshape(-1),
                               ref_pred, atol=2e-5)


def test_sasrec_pipeline_parity(kg_root):
    """End-to-end pipeline parity for the sequential top-k path: the
    reference's SeqReader -> SequentialModel.Dataset -> collate vs our
    SeqReader -> SequentialBatcher, into the weight-ported SASRec, on
    identical dev rows (candidates = [target | logged neg_items])."""
    import types

    import jax.numpy as jnp
    from helpers.SeqReader import SeqReader as RefSeqReader
    from models.sequential.SASRec import SASRec as TorchSASRec

    from rechorus_tpu.data.batching import get_batcher
    from rechorus_tpu.registry import get_model

    ref_corpus = RefSeqReader(ns(path=str(kg_root), dataset="SynthKG_ref", sep="\t"))
    ours_corpus = registry.get_reader("SeqReader")(
        ns(path=str(kg_root), dataset="SynthKG", sep="\t"))

    H = 8
    rargs = types.SimpleNamespace(
        device=torch.device("cpu"), model_path="", buffer=0, num_neg=1,
        dropout=0.0, test_all=0, emb_size=16, history_max=H,
        num_layers=1, num_heads=2)
    torch.manual_seed(0)
    ref = TorchSASRec(rargs, ref_corpus).eval()

    args = ns(emb_size=16, num_layers=1, num_heads=2, num_neg=1, dropout=0.0,
              test_all=0, model_path="", buffer=1, history_max=H,
              host_shard_input=0)
    model_cls = get_model("SASRec")
    model = model_cls.from_args(args, ours_corpus)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    blk = "transformer_block.0."
    params = {
        "i_embeddings": {"embedding": sd["i_embeddings.weight"]},
        "p_embeddings": {"embedding": sd["p_embeddings.weight"]},
        "transformer_0": {
            "mha": {
                "q": {"kernel": sd[blk + "masked_attn_head.q_linear.weight"].T,
                      "bias": sd[blk + "masked_attn_head.q_linear.bias"]},
                "k": {"kernel": sd[blk + "masked_attn_head.k_linear.weight"].T,
                      "bias": sd[blk + "masked_attn_head.k_linear.bias"]},
                "v": {"kernel": sd[blk + "masked_attn_head.v_linear.weight"].T,
                      "bias": sd[blk + "masked_attn_head.v_linear.bias"]},
            },
            "ln1": {"scale": sd[blk + "layer_norm1.weight"], "bias": sd[blk + "layer_norm1.bias"]},
            "ff1": {"kernel": sd[blk + "linear1.weight"].T, "bias": sd[blk + "linear1.bias"]},
            "ff2": {"kernel": sd[blk + "linear2.weight"].T, "bias": sd[blk + "linear2.bias"]},
            "ln2": {"scale": sd[blk + "layer_norm2.weight"], "bias": sd[blk + "layer_norm2.bias"]},
        },
    }

    ref_ds = TorchSASRec.Dataset(ref, ref_corpus, "dev")
    batch = ref_ds.collate_batch([ref_ds._get_feed_dict(j) for j in range(len(ref_ds))])
    with torch.no_grad():
        ref_pred = ref(batch)["prediction"].numpy()

    batcher = get_batcher(model_cls.batcher)(ours_corpus, model, "dev", args)
    assert len(batcher) == len(ref_ds)
    feed = batcher.eval_feed(batcher.device_arrays(), jnp.arange(len(batcher)))
    out = model.apply({"params": params}, feed, training=False)
    np.testing.assert_allclose(np.asarray(out["prediction"]), ref_pred, atol=2e-5)


def test_impression_pipeline_parity(tmp_path):
    """End-to-end pipeline + metric parity for the impression path: the
    reference's ImpressionReader -> ImpressionModel.Dataset -> DataLoader
    -> ImpressionRunner.evaluate vs our ImpressionReader ->
    ImpressionBatcher -> ImpressionRunner.evaluate, with the same
    weight-ported BPRMFImpression. The listwise HR/NDCG/MAP must match
    exactly (metrics are order-invariant over the documented
    set-iteration candidate-order deviation)."""
    import types

    from helpers.ImpressionReader import ImpressionReader as RefReader
    from helpers.ImpressionRunner import ImpressionRunner as RefRunner
    from models.general.BPRMF import BPRMFImpression as TorchBPRMFImp

    from rechorus_tpu.data.batching import get_batcher
    from rechorus_tpu.registry import get_model, get_runner

    make_impression_dataset(str(tmp_path / "SynthImp"))
    ref_corpus = RefReader(ns(path=str(tmp_path), dataset="SynthImp", sep="\t",
                              impression_idkey="time"))
    ours_corpus = registry.get_reader("ImpressionReader")(
        ns(path=str(tmp_path), dataset="SynthImp", sep="\t", impression_idkey="time"))

    # the reference's evaluate_method builds its label matrix 2*pos_cap
    # wide and take_along_axis'es with full-width sort indices -- it
    # implicitly requires pos and neg caps to be EQUAL (its demo configs
    # use 20/20), so use symmetric caps above the data maxima
    caps = dict(train_max_pos_item=10, train_max_neg_item=10,
                test_max_pos_item=10, test_max_neg_item=10)
    rargs = types.SimpleNamespace(
        device=torch.device("cpu"), model_path="", buffer=0, num_neg=0,
        dropout=0.0, test_all=0, emb_size=16, loss_n="BPR", **caps)
    torch.manual_seed(0)
    ref = TorchBPRMFImp(rargs, ref_corpus).eval()

    run_args = types.SimpleNamespace(
        epoch=1, check_epoch=0, test_epoch=-1, early_stop=10, lr=1e-3, l2=0.0,
        batch_size=64, eval_batch_size=64, optimizer="Adam", num_workers=0,
        pin_memory=0, topk="3", metric="HR,NDCG,MAP", main_metric="",
        model_path="", random_seed=0, train=1, log_file="/tmp/ref_imp.log")
    ref_runner = RefRunner(run_args)
    ref_ds = TorchBPRMFImp.Dataset(ref, ref_corpus, "dev")
    with torch.no_grad():
        ref_res = ref_runner.evaluate(ref_ds, [3], ["HR", "NDCG", "MAP"])

    args = ns(emb_size=16, loss_n="BPR", num_neg=0, dropout=0.0, test_all=0,
              model_path="", buffer=1, host_shard_input=0, **caps)
    model_cls = get_model("BPRMF", "Impression")
    model = model_cls.from_args(args, ours_corpus)
    runner = get_runner(model_cls.runner)(run_args)
    batchers = {p: get_batcher(model_cls.batcher)(ours_corpus, model, p, args)
                for p in ["train", "dev"]}
    arrays = {p: runner.place_arrays(b.device_arrays()) for p, b in batchers.items()}
    state = runner.init_state(model, batchers["train"], 0)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    import jax.numpy as jnp

    state = state.replace(params={
        "u_embeddings": {"embedding": jnp.asarray(sd["u_embeddings.weight"])},
        "i_embeddings": {"embedding": jnp.asarray(sd["i_embeddings.weight"])}})
    ours_res = runner.evaluate(state, model, batchers["dev"], arrays["dev"],
                               "dev", [3], ["HR", "NDCG", "MAP"])

    assert set(ours_res) == set(ref_res)
    for k in ref_res:
        np.testing.assert_allclose(ours_res[k], ref_res[k], atol=1e-6, err_msg=k)


def test_ctr_pipeline_parity(tmp_path):
    """End-to-end pipeline + metric parity for the CTR path: the
    reference's ContextReader -> FMCTR.Dataset -> DataLoader ->
    CTRRunner.evaluate vs our ContextReader -> ContextCTRBatcher ->
    CTRRunner.evaluate, with the same weight-ported FM: AUC / LOG_LOSS /
    ACC / F1 must match."""
    import types

    import jax
    import jax.numpy as jnp
    from helpers.ContextReader import ContextReader as RefReader
    from helpers.CTRRunner import CTRRunner as RefRunner
    from models.context.FM import FMCTR as TorchFM

    from rechorus_tpu.data.batching import get_batcher
    from rechorus_tpu.data.context import build_schema, is_categorical
    from rechorus_tpu.registry import get_model, get_runner

    make_ctr_dataset(str(tmp_path / "SynthCTR"))
    flags = dict(include_item_features=1, include_user_features=1,
                 include_situation_features=1)
    ref_corpus = RefReader(ns(path=str(tmp_path), dataset="SynthCTR", sep="\t", **flags))
    ours_corpus = registry.get_reader("ContextReader")(
        ns(path=str(tmp_path), dataset="SynthCTR", sep="\t", **flags))

    rargs = types.SimpleNamespace(
        device=torch.device("cpu"), model_path="", buffer=0, num_neg=0,
        dropout=0.0, test_all=0, emb_size=16, loss_n="BCE")
    torch.manual_seed(0)
    ref = TorchFM(rargs, ref_corpus).eval()

    run_args = types.SimpleNamespace(
        epoch=1, check_epoch=0, test_epoch=-1, early_stop=10, lr=1e-3, l2=0.0,
        batch_size=64, eval_batch_size=64, optimizer="Adam", num_workers=0,
        pin_memory=0, topk="5", metric="AUC,LOG_LOSS,ACC,F1_SCORE",
        main_metric="", model_path="", random_seed=0, train=1,
        log_file="/tmp/ref_ctr.log")
    ref_runner = RefRunner(run_args)
    ref_ds = TorchFM.Dataset(ref, ref_corpus, "dev")
    with torch.no_grad():
        ref_res = ref_runner.evaluate(ref_ds, [5], ["AUC", "LOG_LOSS", "ACC", "F1_SCORE"])

    args = ns(emb_size=16, loss_n="BCE", num_neg=0, dropout=0.0, test_all=0,
              model_path="", buffer=1, host_shard_input=0)
    model_cls = get_model("FM", "CTR")
    model = model_cls.from_args(args, ours_corpus)
    runner = get_runner(model_cls.runner)(run_args)
    batchers = {p: get_batcher(model_cls.batcher)(ours_corpus, model, p, args)
                for p in ["train", "dev"]}
    arrays = {p: runner.place_arrays(b.device_arrays()) for p, b in batchers.items()}
    state = runner.init_state(model, batchers["train"], 0)

    # port the FM tables (same mapping as test_weight_port._port_fm_tables)
    schema = build_schema(ours_corpus)
    d = 16
    fused = np.zeros((schema.total_vocab, d), dtype=np.float32)
    fused_lin = np.zeros((schema.total_vocab, 1), dtype=np.float32)
    bank = {}
    fj = 0
    for name, off in zip(schema.names, schema.offsets):
        if is_categorical(name):
            w = ref.context_embedding[name].weight.detach().numpy()
            fused[off: off + w.shape[0]] = w
            fused_lin[off: off + w.shape[0]] = ref.linear_embedding[name].weight.detach().numpy()
        else:
            bank[f"float_emb_{fj}"] = {"kernel": ref.context_embedding[name].weight.detach().numpy().T}
            bank[f"float_lin_{fj}"] = {"kernel": ref.linear_embedding[name].weight.detach().numpy().T}
            fj += 1
    bank["fused_table"] = {"embedding": jnp.asarray(fused)}
    bank["fused_linear"] = {"embedding": jnp.asarray(fused_lin)}
    state = state.replace(params={"bank": bank,
                                  "overall_bias": jnp.asarray(ref.overall_bias.detach().numpy())})
    ours_res = runner.evaluate(state, model, batchers["dev"], arrays["dev"],
                               "dev", [5], ["AUC", "LOG_LOSS", "ACC", "F1_SCORE"])

    assert set(ours_res) == set(ref_res)
    for k in ref_res:
        np.testing.assert_allclose(ours_res[k], ref_res[k], atol=1e-5, err_msg=k)


def test_rerank_pipeline_parity(tmp_path, monkeypatch):
    """End-to-end pipeline + metric parity for the re-ranking path: the
    same frozen BPRMFImpression ranker (identical weights, saved in each
    framework's checkpoint format) feeds the same weight-ported PRM
    through both full stacks -- the reference's ranker-inside-collate
    (BaseRerankerModel.py:70-84) vs our ranker-as-first-jitted-stage --
    and the listwise metrics must match."""
    import types

    import flax
    import jax
    import jax.numpy as jnp
    import yaml as _yaml
    from helpers.ImpressionReader import ImpressionReader as RefReader
    from helpers.ImpressionRunner import ImpressionRunner as RefRunner
    from models.general.BPRMF import BPRMFImpression as TorchBPRMFImp
    from models.reranker.PRM import PRMGeneral as TorchPRM
    from test_weight_port import _port_torch_tel

    from rechorus_tpu.data.batching import get_batcher
    from rechorus_tpu.registry import get_model, get_runner

    make_impression_dataset(str(tmp_path / "SynthImp"))
    monkeypatch.chdir(tmp_path)  # both sides resolve ./model/<Ranker>Impression/
    rdir = tmp_path / "model" / "BPRMFImpression"
    rdir.mkdir(parents=True)

    ref_corpus = RefReader(ns(path=str(tmp_path), dataset="SynthImp", sep="\t",
                              impression_idkey="time"))
    ours_corpus = registry.get_reader("ImpressionReader")(
        ns(path=str(tmp_path), dataset="SynthImp", sep="\t", impression_idkey="time"))

    # one frozen ranker, two checkpoint formats
    caps = dict(train_max_pos_item=10, train_max_neg_item=10,
                test_max_pos_item=10, test_max_neg_item=10)
    rk_args = types.SimpleNamespace(
        device=torch.device("cpu"), model_path="", buffer=0, num_neg=0,
        dropout=0.0, test_all=0, emb_size=16, loss_n="BPR", **caps)
    torch.manual_seed(7)
    ranker = TorchBPRMFImp(rk_args, ref_corpus)
    torch.save(ranker.state_dict(), str(rdir / "ranker.pt"))
    with open(rdir / "ranker.yaml", "w") as f:
        _yaml.safe_dump({"emb_size": 16}, f)
    rsd = {k: v.detach().numpy() for k, v in ranker.state_dict().items()}
    with open(rdir / "ranker.bin", "wb") as f:
        f.write(flax.serialization.to_bytes({
            "params": {"u_embeddings": {"embedding": rsd["u_embeddings.weight"]},
                       "i_embeddings": {"embedding": rsd["i_embeddings.weight"]}},
            "extra_vars": {}}))

    # reference PRM over the frozen ranker
    prm_args = types.SimpleNamespace(
        device=torch.device("cpu"), model_path="", buffer=0, num_neg=0,
        dropout=0.0, test_all=0, emb_size=16, loss_n="BPR",
        ranker_name="BPRMF", ranker_config_file="ranker.yaml",
        ranker_model_file="ranker.pt", tuneranker=0,
        n_blocks=2, num_heads=2, num_hidden_unit=16, **caps)
    torch.manual_seed(0)
    ref = TorchPRM(prm_args, ref_corpus).eval()

    run_args = types.SimpleNamespace(
        epoch=1, check_epoch=0, test_epoch=-1, early_stop=10, lr=1e-3, l2=0.0,
        batch_size=64, eval_batch_size=64, optimizer="Adam", num_workers=0,
        pin_memory=0, topk="3", metric="HR,NDCG,MAP", main_metric="",
        model_path="", random_seed=0, train=1, log_file="/tmp/ref_prm.log")
    # REFERENCE BUG (documented deviation): PRMBase._base_init ends with
    # self.apply(self.init_weights) AFTER RerankModel.__init__ has loaded
    # the frozen ranker, RE-RANDOMIZING the loaded checkpoint (values
    # change; requires_grad stays False) -- the reference's rerankers
    # actually run over a random frozen first stage, which is why they
    # degrade below their own backbone (PARITY.md). Reload the ranker to
    # compare the INTENDED semantics, which our pipeline implements.
    ref.ranker.load_state_dict(torch.load(str(rdir / "ranker.pt")))
    ref = ref.eval()

    ref_runner = RefRunner(run_args)
    ref_ds = TorchPRM.Dataset(ref, ref_corpus, "dev")
    with torch.no_grad():
        ref_res = ref_runner.evaluate(ref_ds, [3], ["HR", "NDCG", "MAP"])

    # ours: same ported PRM weights over the same frozen ranker
    args = ns(emb_size=16, loss_n="BPR", num_neg=0, dropout=0.0, test_all=0,
              model_path="", buffer=1, host_shard_input=0,
              ranker_name="BPRMF", ranker_config_file="ranker.yaml",
              ranker_model_file="ranker.bin", tuneranker=0,
              n_blocks=2, num_heads=2, num_hidden_unit=16,
              random_seed=0, **caps)
    model_cls = get_model("PRMGeneral")
    model = model_cls.from_args(args, ours_corpus)
    runner = get_runner(model_cls.runner)(run_args)
    batchers = {p: get_batcher(model_cls.batcher)(ours_corpus, model, p, args)
                for p in ["train", "dev"]}
    arrays = {p: runner.place_arrays(b.device_arrays()) for p, b in batchers.items()}
    state = runner.init_state(model, batchers["train"], 0)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "i_embeddings": {"embedding": jnp.asarray(sd["i_embeddings.weight"])},
        "ordinal_position_embedding": {
            "embedding": jnp.asarray(sd["ordinal_position_embedding.weight"])},
        "rFF0": {"kernel": sd["rFF0.weight"].T, "bias": sd["rFF0.bias"]},
        "rFF1": {"kernel": sd["rFF1.weight"].T, "bias": sd["rFF1.bias"]},
    }
    for k in range(2):
        params[f"encoder_{k}"] = _port_torch_tel(sd, f"encoder.{k}")
    state = state.replace(params=jax.tree.map(jnp.asarray, params))

    ours_res = runner.evaluate(state, model, batchers["dev"], arrays["dev"],
                               "dev", [3], ["HR", "NDCG", "MAP"])
    assert set(ours_res) == set(ref_res)
    for k in ref_res:
        np.testing.assert_allclose(ours_res[k], ref_res[k], atol=1e-6, err_msg=k)


def test_cfkg_pipeline_parity(kg_root):
    """End-to-end pipeline parity for the KG path: CFKG's entity-indexed
    eval feeds (tail = [target | neg_items] + n_users offset, 'buy'
    relation) through the reference's Dataset/BaseRunner vs our KG batcher
    /BaseRunner, with ported TransE embeddings: HR/NDCG must match."""
    import types

    import jax
    import jax.numpy as jnp
    from helpers.BaseRunner import BaseRunner as RefRunner
    from helpers.KGReader import KGReader as RefKGReader
    from models.general.CFKG import CFKG as TorchCFKG

    from rechorus_tpu.data.batching import get_batcher
    from rechorus_tpu.registry import get_model, get_runner

    ref_corpus = RefKGReader(ns(path=str(kg_root), dataset="SynthKG_ref",
                                sep="\t", include_attr=0))
    ours_corpus = registry.get_reader("KGReader")(
        ns(path=str(kg_root), dataset="SynthKG", sep="\t", include_attr=0))

    rargs = types.SimpleNamespace(
        device=torch.device("cpu"), model_path="", buffer=0, num_neg=1,
        dropout=0.0, test_all=0, emb_size=16, margin=0.0)
    torch.manual_seed(0)
    ref = TorchCFKG(rargs, ref_corpus).eval()

    run_args = types.SimpleNamespace(
        epoch=1, check_epoch=0, test_epoch=-1, early_stop=10, lr=1e-3, l2=0.0,
        batch_size=64, eval_batch_size=64, optimizer="Adam", num_workers=0,
        pin_memory=0, topk="3,5", metric="HR,NDCG", main_metric="",
        model_path="", random_seed=0, train=1, log_file="/tmp/ref_cfkg.log")
    ref_runner = RefRunner(run_args)
    ref_ds = TorchCFKG.Dataset(ref, ref_corpus, "dev")
    with torch.no_grad():
        ref_res = ref_runner.evaluate(ref_ds, [3, 5], ["HR", "NDCG"])

    args = ns(emb_size=16, margin=0.0, num_neg=1, dropout=0.0, test_all=0,
              model_path="", buffer=1, host_shard_input=0, random_seed=0)
    model_cls = get_model("CFKG")
    model = model_cls.from_args(args, ours_corpus)
    runner = get_runner(model_cls.runner)(run_args)
    batchers = {p: get_batcher(model_cls.batcher)(ours_corpus, model, p, args)
                for p in ["train", "dev"]}
    arrays = {p: runner.place_arrays(b.device_arrays()) for p, b in batchers.items()}
    state = runner.init_state(model, batchers["train"], 0)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    state = state.replace(params=jax.tree.map(jnp.asarray, {
        "e_embeddings": {"embedding": sd["e_embeddings.weight"]},
        "r_embeddings": {"embedding": sd["r_embeddings.weight"]}}))
    ours_res = runner.evaluate(state, model, batchers["dev"], arrays["dev"],
                               "dev", [3, 5], ["HR", "NDCG"])

    assert set(ours_res) == set(ref_res)
    for k in ref_res:
        np.testing.assert_allclose(ours_res[k], ref_res[k], atol=1e-6, err_msg=k)


def test_chorus_pipeline_parity(kg_root, tmp_path, monkeypatch):
    """End-to-end pipeline parity for the two-stage temporal-kernel path:
    Chorus dev eval (category ids + relational intervals built by the
    reference Dataset loops vs our chorus batcher's device kernels)
    through both BaseRunners with ported weights."""
    import types

    import jax
    import jax.numpy as jnp
    from helpers.BaseRunner import BaseRunner as RefRunner
    from helpers.KGReader import KGReader as RefKGReader
    from models.sequential.Chorus import Chorus as TorchChorus

    from rechorus_tpu.data.batching import get_batcher
    from rechorus_tpu.registry import get_model, get_runner

    monkeypatch.chdir(tmp_path)  # reference derives ../model/Chorus paths
    ref_corpus = RefKGReader(ns(path=str(kg_root), dataset="SynthKG_ref",
                                sep="\t", include_attr=0))
    ours_corpus = registry.get_reader("KGReader")(
        ns(path=str(kg_root), dataset="SynthKG", sep="\t", include_attr=0))

    rargs = types.SimpleNamespace(
        device=torch.device("cpu"), model_path="", buffer=0, num_neg=1,
        dropout=0.0, test_all=0, emb_size=16, history_max=10, stage=1,
        base_method="BPR", time_scalar=60 * 60 * 24, category_col="i_category_c",
        lr_scale=0.1, margin=1.0, lr=1e-3)
    torch.manual_seed(0)
    ref = TorchChorus(rargs, ref_corpus).eval()

    run_args = types.SimpleNamespace(
        epoch=1, check_epoch=0, test_epoch=-1, early_stop=10, lr=1e-3, l2=0.0,
        batch_size=64, eval_batch_size=64, optimizer="Adam", num_workers=0,
        pin_memory=0, topk="3,5", metric="HR,NDCG", main_metric="",
        model_path="", random_seed=0, train=1, log_file="/tmp/ref_chorus.log")
    ref_runner = RefRunner(run_args)
    ref_ds = TorchChorus.Dataset(ref, ref_corpus, "dev")
    with torch.no_grad():
        ref_res = ref_runner.evaluate(ref_ds, [3, 5], ["HR", "NDCG"])

    args = ns(emb_size=16, stage=1, base_method="BPR", time_scalar=60 * 60 * 24,
              category_col="i_category_c", lr_scale=0.1, margin=1.0,
              num_neg=1, dropout=0.0, test_all=0, buffer=1, history_max=10,
              host_shard_input=0, random_seed=0, dataset="SynthKG",
              model_path=str(tmp_path / "m.bin"))
    model_cls = get_model("Chorus")
    model = model_cls.from_args(args, ours_corpus)
    runner = get_runner(model_cls.runner)(run_args)
    batchers = {p: get_batcher(model_cls.batcher)(ours_corpus, model, p, args)
                for p in ["train", "dev"]}
    arrays = {p: runner.place_arrays(b.device_arrays()) for p, b in batchers.items()}
    state = runner.init_state(model, batchers["train"], 0)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {name: sd[f"{name}.weight"]
              for name in ("u_embeddings", "i_embeddings", "r_embeddings",
                           "betas", "mus", "sigmas", "user_bias", "item_bias")}
    params["prediction_w"] = sd["prediction.weight"].T
    state = state.replace(params=jax.tree.map(jnp.asarray, params))
    ours_res = runner.evaluate(state, model, batchers["dev"], arrays["dev"],
                               "dev", [3, 5], ["HR", "NDCG"])

    assert set(ours_res) == set(ref_res)
    for k in ref_res:
        np.testing.assert_allclose(ours_res[k], ref_res[k], atol=1e-6, err_msg=k)


def test_kda_pipeline_parity(kg_root):
    """End-to-end pipeline parity for the flagship KDA: dev eval through
    the reference's KDAReader/Dataset/BaseRunner vs our KDAReader/kda
    batcher/BaseRunner with ported weights (freq_rand=1 so the DFT init
    is bypassed on both sides -- the ported tables carry the state)."""
    import types

    import jax
    import jax.numpy as jnp
    from helpers.BaseRunner import BaseRunner as RefRunner
    from helpers.KDAReader import KDAReader as RefKDAReader
    from models.sequential.KDA import KDA as TorchKDA

    from rechorus_tpu.data.batching import get_batcher
    from rechorus_tpu.registry import get_model, get_runner

    common = dict(sep="\t", include_attr=1, t_scalar=60, n_dft=16, freq_rand=1,
                  regenerate=0)
    ref_corpus = RefKDAReader(ns(path=str(kg_root), dataset="SynthKG_ref", **common))
    ours_corpus = registry.get_reader("KDAReader")(
        ns(path=str(kg_root), dataset="SynthKG", **common))

    rargs = types.SimpleNamespace(
        device=torch.device("cpu"), model_path="", buffer=0, num_neg=1,
        dropout=0.0, test_all=0, emb_size=16, history_max=10, num_layers=1,
        num_heads=2, n_dft=16, freq_rand=1, gamma=0.5, attention_size=10,
        pooling="average", include_val=1, neg_head_p=0.5)
    torch.manual_seed(0)
    ref = TorchKDA(rargs, ref_corpus).eval()

    run_args = types.SimpleNamespace(
        epoch=1, check_epoch=0, test_epoch=-1, early_stop=10, lr=1e-3, l2=0.0,
        batch_size=64, eval_batch_size=64, optimizer="Adam", num_workers=0,
        pin_memory=0, topk="3,5", metric="HR,NDCG", main_metric="",
        model_path="", random_seed=0, train=1, log_file="/tmp/ref_kda.log")
    ref_runner = RefRunner(run_args)
    ref_ds = TorchKDA.Dataset(ref, ref_corpus, "dev")
    with torch.no_grad():
        ref_res = ref_runner.evaluate(ref_ds, [3, 5], ["HR", "NDCG"])

    args = ns(emb_size=16, num_layers=1, num_heads=2, gamma=0.5,
              attention_size=10, pooling="average", include_val=1,
              neg_head_p=0.5, t_scalar=60, freq_rand=1, num_neg=1,
              dropout=0.0, test_all=0, model_path="", buffer=1,
              history_max=10, host_shard_input=0, random_seed=0)
    model_cls = get_model("KDA")
    model = model_cls.from_args(args, ours_corpus)
    runner = get_runner(model_cls.runner)(run_args)
    batchers = {p: get_batcher(model_cls.batcher)(ours_corpus, model, p, args)
                for p in ["train", "dev"]}
    arrays = {p: runner.place_arrays(b.device_arrays()) for p, b in batchers.items()}
    state = runner.init_state(model, batchers["train"], 0)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "user_embeddings": {"embedding": sd["user_embeddings.weight"]},
        "entity_embeddings": {"embedding": sd["entity_embeddings.weight"]},
        "relation_embeddings": sd["relation_embeddings.weight"],
        "freq_real": sd["relational_dynamic_aggregation.freq_real.weight"],
        "freq_imag": sd["relational_dynamic_aggregation.freq_imag.weight"],
        "item_bias": {"embedding": sd["item_bias.weight"]},
        "attn_0": {"q": {"kernel": sd["attn_head.q_linear.weight"].T},
                   "k": {"kernel": sd["attn_head.k_linear.weight"].T},
                   "v": {"kernel": sd["attn_head.v_linear.weight"].T}},
        "w1_0": {"kernel": sd["W1.weight"].T, "bias": sd["W1.bias"]},
        "w2_0": {"kernel": sd["W2.weight"].T, "bias": sd["W2.bias"]},
        "ln_0": {"scale": sd["layer_norm.weight"], "bias": sd["layer_norm.bias"]},
    }
    state = state.replace(params=jax.tree.map(jnp.asarray, params))
    ours_res = runner.evaluate(state, model, batchers["dev"], arrays["dev"],
                               "dev", [3, 5], ["HR", "NDCG"])

    assert set(ours_res) == set(ref_res)
    for k in ref_res:
        np.testing.assert_allclose(ours_res[k], ref_res[k], atol=1e-6, err_msg=k)


def test_tisasrec_pipeline_parity(kg_root):
    """End-to-end pipeline parity for the time-interval-aware path:
    TiSASRec dev eval through both full stacks, pinning the batcher's
    per-user minimum-interval computation (reference TiSASRec.py:47-52)
    and the history-times feed against the reference Dataset."""
    import types

    import jax
    import jax.numpy as jnp
    from helpers.BaseRunner import BaseRunner as RefRunner
    from helpers.SeqReader import SeqReader as RefSeqReader
    from models.sequential.TiSASRec import TiSASRec as TorchTiSASRec

    from rechorus_tpu.data.batching import get_batcher
    from rechorus_tpu.registry import get_model, get_runner

    ref_corpus = RefSeqReader(ns(path=str(kg_root), dataset="SynthKG_ref", sep="\t"))
    ours_corpus = registry.get_reader("SeqReader")(
        ns(path=str(kg_root), dataset="SynthKG", sep="\t"))

    H, T_MAX = 8, 16
    rargs = types.SimpleNamespace(
        device=torch.device("cpu"), model_path="", buffer=0, num_neg=1,
        dropout=0.0, test_all=0, emb_size=16, history_max=H,
        num_layers=1, num_heads=2, time_max=T_MAX)
    torch.manual_seed(0)
    ref = TorchTiSASRec(rargs, ref_corpus).eval()

    run_args = types.SimpleNamespace(
        epoch=1, check_epoch=0, test_epoch=-1, early_stop=10, lr=1e-3, l2=0.0,
        batch_size=64, eval_batch_size=64, optimizer="Adam", num_workers=0,
        pin_memory=0, topk="3,5", metric="HR,NDCG", main_metric="",
        model_path="", random_seed=0, train=1, log_file="/tmp/ref_tisas.log")
    ref_runner = RefRunner(run_args)
    ref_ds = TorchTiSASRec.Dataset(ref, ref_corpus, "dev")
    with torch.no_grad():
        ref_res = ref_runner.evaluate(ref_ds, [3, 5], ["HR", "NDCG"])

    args = ns(emb_size=16, num_layers=1, num_heads=2, time_max=T_MAX,
              num_neg=1, dropout=0.0, test_all=0, model_path="", buffer=1,
              history_max=H, host_shard_input=0, random_seed=0)
    model_cls = get_model("TiSASRec")
    model = model_cls.from_args(args, ours_corpus)
    runner = get_runner(model_cls.runner)(run_args)
    batchers = {p: get_batcher(model_cls.batcher)(ours_corpus, model, p, args)
                for p in ["train", "dev"]}
    arrays = {p: runner.place_arrays(b.device_arrays()) for p, b in batchers.items()}
    state = runner.init_state(model, batchers["train"], 0)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    blk = "transformer_block.0."
    params = {
        "i_embeddings": {"embedding": sd["i_embeddings.weight"]},
        "p_k_embeddings": {"embedding": sd["p_k_embeddings.weight"]},
        "p_v_embeddings": {"embedding": sd["p_v_embeddings.weight"]},
        "t_k_embeddings": {"embedding": sd["t_k_embeddings.weight"]},
        "t_v_embeddings": {"embedding": sd["t_v_embeddings.weight"]},
        "block_0": {
            "q": {"kernel": sd[blk + "masked_attn_head.q_linear.weight"].T,
                  "bias": sd[blk + "masked_attn_head.q_linear.bias"]},
            "k": {"kernel": sd[blk + "masked_attn_head.k_linear.weight"].T,
                  "bias": sd[blk + "masked_attn_head.k_linear.bias"]},
            "v": {"kernel": sd[blk + "masked_attn_head.v_linear.weight"].T,
                  "bias": sd[blk + "masked_attn_head.v_linear.bias"]},
            "ln1": {"scale": sd[blk + "layer_norm1.weight"], "bias": sd[blk + "layer_norm1.bias"]},
            "ff1": {"kernel": sd[blk + "linear1.weight"].T, "bias": sd[blk + "linear1.bias"]},
            "ff2": {"kernel": sd[blk + "linear2.weight"].T, "bias": sd[blk + "linear2.bias"]},
            "ln2": {"scale": sd[blk + "layer_norm2.weight"], "bias": sd[blk + "layer_norm2.bias"]},
        },
    }
    state = state.replace(params=jax.tree.map(jnp.asarray, params))
    ours_res = runner.evaluate(state, model, batchers["dev"], arrays["dev"],
                               "dev", [3, 5], ["HR", "NDCG"])

    assert set(ours_res) == set(ref_res)
    for k in ref_res:
        np.testing.assert_allclose(ours_res[k], ref_res[k], atol=1e-6, err_msg=k)


# --------------------------------------------------------------------- #
def _eta_flags(H):
    return dict(dnn_hidden_units="[24]", dnn_activations="ReLU",
                net_dropout=0.0, batch_norm=0, attention_dim=16,
                num_heads=2, use_scale=1, attention_dropout=0.0,
                use_qkvo=1, reuse_hash=1, num_hashes=2,
                short_target_field='["item_id"]',
                short_sequence_field='["history_item_id"]',
                long_target_field='["item_id"]',
                long_sequence_field='["history_item_id"]',
                recent_k=3, add_historical_situations=0, history_max=H)


def _ctxseq_pipeline_pair(tmp_path, torch_cls, ours_name, H, ref_over, over,
                          patch_ref=None):
    """Run the SAME corpus through both frameworks' FULL context-seq CTR
    data paths (reference ContextSeqReader -> Dataset -> collate vs our
    reader -> batcher), restricted to dev rows whose history length == H:
    with no padding, the reference's right-aligned reversed-arange
    recency masks coincide with our left-aligned ones (the documented
    ETA/SDIM deviation, models/context_seq/eta.py:9-15), so the REST of
    the path -- feature joins, history assembly, SimHash rotations,
    Hamming attention, bucket collisions -- is pinned exactly."""
    import types

    import jax.numpy as jnp
    from helpers.ContextSeqReader import ContextSeqReader as RefReader

    from rechorus_tpu.data.batching import get_batcher
    from rechorus_tpu.registry import get_model

    make_ctr_dataset(str(tmp_path / "SynthCTR"))
    flags = dict(include_item_features=1, include_user_features=1,
                 include_situation_features=1)
    ref_corpus = RefReader(ns(path=str(tmp_path), dataset="SynthCTR", sep="\t", **flags))
    ours_corpus = registry.get_reader("ContextSeqReader")(
        ns(path=str(tmp_path), dataset="SynthCTR", sep="\t", **flags))

    base = dict(emb_size=16, loss_n="BCE", dropout=0.0, test_all=0,
                num_neg=0, model_path="", buffer=0, **_eta_flags(H))
    rargs = types.SimpleNamespace(device=torch.device("cpu"), **{**base, **ref_over})
    torch.manual_seed(0)
    ref = torch_cls(rargs, ref_corpus).eval()
    if patch_ref is not None:
        patch_ref(ref)

    args = ns(**{**base, **ref_over, **over,
                 "host_shard_input": 0, "buffer": 1})
    model_cls = get_model(ours_name)
    model = model_cls.from_args(args, ours_corpus)
    batcher = get_batcher(model_cls.batcher)(ours_corpus, model, "dev", args)

    ref_ds = torch_cls.Dataset(ref, ref_corpus, "dev")
    feeds = [ref_ds._get_feed_dict(j) for j in range(len(ref_ds))]
    full_idx = [j for j, f in enumerate(feeds) if int(f["lengths"]) == H]
    assert len(full_idx) >= 8, f"need full-length dev rows, got {len(full_idx)}"
    batch = ref_ds.collate_batch([feeds[j] for j in full_idx])
    with torch.no_grad():
        ref_pred = ref(batch)["prediction"].numpy().reshape(-1)

    assert len(batcher) == len(feeds)
    feed = batcher.eval_feed(batcher.device_arrays(),
                             jnp.asarray(full_idx, jnp.int32))
    return ref, model, ours_corpus, feed, ref_pred


def _apply_ctxseq_ported(model, params, consts, feed):
    import jax

    variables = model.init({"params": jax.random.key(0)}, feed, training=False)
    extra = {k: v for k, v in variables.items() if k != "params"}
    extra["constants"] = {**extra.get("constants", {}), **consts}
    out = model.apply({"params": params, **extra}, feed, training=False)
    return np.asarray(out["prediction"]).reshape(-1)


def test_eta_pipeline_parity(tmp_path):
    """ETA full-pipeline prediction parity (VERDICT r2 item 7): SimHash
    rotations + Hamming top-k retrieval + target attention through both
    REAL data paths. retrieval_k == H so the retrieved set is tie-break
    independent (reference ETA.py:24-122)."""
    from models.context_seq.ETA import ETACTR as TorchETA
    from test_weight_port import _port_group_tables, _port_mhta, _port_mlp_block

    from rechorus_tpu.data.context import build_schema

    H = 5
    ref, model, corpus, feed, ref_pred = _ctxseq_pipeline_pair(
        tmp_path, TorchETA, "ETACTR", H,
        ref_over=dict(retrieval_k=H, hash_bits=8), over={})

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {**_port_group_tables(ref, corpus, build_schema(corpus)),
              "short_attention_0": _port_mhta(sd, "short_attention.0"),
              "long_attention_0": _port_mhta(sd, "long_attention.0"),
              "dnn": _port_mlp_block(sd, "dnn", [0, 2])}
    consts = {"random_rotations_0": sd["random_rotations.0"]}
    ours = _apply_ctxseq_ported(model, params, consts, feed)
    np.testing.assert_allclose(ours, ref_pred, atol=2e-5)


def test_sdim_pipeline_parity(tmp_path):
    """SDIM full-pipeline parity: LSH bucket-collision pooling over the
    long window + short target attention through both REAL data paths.
    The reference's collision sum is unmasked over the full history
    (pads + short window, SDIM.py:114-131); ours masks to the long
    window, so the torch side gets the same masked pooling monkeypatched
    as in test_weight_port (documented deviation) -- rotations, hashes
    and weights stay the reference's."""
    import types as _types

    from models.context_seq.SDIM import SDIMCTR as TorchSDIM
    from test_weight_port import _port_group_tables, _port_mhta, _port_mlp_block

    from rechorus_tpu.data.context import build_schema

    def masked_long(self, fed, mask, feats):
        for idx, (tfld, sfld) in enumerate(zip(self.long_target_field,
                                               self.long_sequence_field)):
            te_ = self.concat_embedding(tfld, fed)
            se_ = self.concat_embedding(sfld, fed)
            tflat = te_.view(-1, te_.size(-1))
            sflat = se_.unsqueeze(1).repeat(1, te_.size(1), 1, 1).view(
                -1, se_.size(1), se_.size(2))
            mflat = mask.unsqueeze(1).repeat(1, te_.size(1), 1).view(-1, sflat.size(1))
            bs = self.lsh_hash(sflat, self.random_rotations[idx])
            bq = self.lsh_hash(tflat.unsqueeze(1), self.random_rotations[idx])
            collide = ((bq - bs) == 0) & mflat[:, :, None].bool()
            out = torch.einsum("bhn,bhd->bnd", collide.float(), sflat).mean(1)
            feats.append(out.view(te_.shape))
        return feats

    H = 5
    ref, model, corpus, feed, ref_pred = _ctxseq_pipeline_pair(
        tmp_path, TorchSDIM, "SDIMCTR", H,
        ref_over=dict(retrieval_k=3, hash_bits=4), over={},
        patch_ref=lambda r: setattr(r, "long_interest_attention",
                                    _types.MethodType(masked_long, r)))

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {**_port_group_tables(ref, corpus, build_schema(corpus)),
              "short_attention_0": _port_mhta(sd, "short_attention.0"),
              "dnn": _port_mlp_block(sd, "dnn", [0, 2])}
    consts = {"random_rotations_0": sd["random_rotations.0"]}
    ours = _apply_ctxseq_ported(model, params, consts, feed)
    np.testing.assert_allclose(ours, ref_pred, atol=2e-5)
