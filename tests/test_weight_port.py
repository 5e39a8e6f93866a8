"""Weight-port forward parity vs the torch reference (VERDICT item 5).

Initializes the reference model (torch, CPU), copies its weights into the
flax params, and asserts identical predictions on an identical feed.
Catches silently-wrong attention masks / feature joins that task-level
metrics cannot. Reference forwards: src/models/sequential/SASRec.py:51-86,
src/models/context/FM.py:44-63, src/models/context_seq/DIN.py:147-160.
"""
import argparse
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_SRC = "/root/reference/src"


@pytest.fixture(scope="module", autouse=True)
def ref_path():
    sys.path.insert(0, REF_SRC)
    np.int = int  # reference code predates numpy 1.24 (np.tril(..., dtype=np.int))
    yield
    sys.path.remove(REF_SRC)
    del np.int


def t(x):
    x = np.asarray(x)
    return torch.from_numpy(x.astype(np.int64) if x.dtype.kind in "iu" else x.astype(np.float32))


def ref_args(**over):
    base = dict(device=torch.device("cpu"), model_path="", buffer=1, num_neg=1,
                dropout=0.0, test_all=0, emb_size=16, history_max=8,
                num_layers=1, num_heads=2, loss_n="BCE")
    base.update(over)
    return types.SimpleNamespace(**base)


# --------------------------------------------------------------------- #
def test_sasrec_forward_parity():
    from models.sequential.SASRec import SASRec as TorchSASRec

    from rechorus_tpu.registry import get_model

    n_users, n_items, H, d = 30, 50, 8, 16
    corpus = types.SimpleNamespace(n_users=n_users, n_items=n_items)
    torch.manual_seed(0)
    ref = TorchSASRec(ref_args(), corpus).eval()

    model = get_model("SASRec")(user_num=n_users, item_num=n_items, emb_size=d,
                                num_layers=1, num_heads=2, dropout=0.0, history_max=H)

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

    rng = np.random.default_rng(1)
    B, C = 6, 4
    lengths = rng.integers(1, H + 1, size=B).astype(np.int32)
    hist = np.zeros((B, H), dtype=np.int32)
    for b in range(B):
        hist[b, : lengths[b]] = rng.integers(1, n_items, size=lengths[b])
    items = rng.integers(1, n_items, size=(B, C)).astype(np.int32)
    users = rng.integers(1, n_users, size=B).astype(np.int32)

    with torch.no_grad():
        ref_out = ref({"item_id": t(items), "history_items": t(hist),
                       "lengths": t(lengths), "user_id": t(users),
                       "batch_size": B, "phase": "test"})
    import jax.numpy as jnp

    feed = {"user_id": jnp.asarray(users), "item_id": jnp.asarray(items),
            "history_items": jnp.asarray(hist), "lengths": jnp.asarray(lengths)}
    out = model.apply({"params": params}, feed, training=False)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)



# --------------------------------------------------------------------- #
@pytest.fixture(scope="module")
def ctr_corpus(tmp_path_factory):
    from rechorus_tpu import registry
    from rechorus_tpu.data.synthetic import make_ctr_dataset

    root = tmp_path_factory.mktemp("data")
    make_ctr_dataset(str(root / "SynthCTR"))
    args = argparse.Namespace(
        path=str(root), dataset="SynthCTR", sep="\t",
        include_item_features=1, include_user_features=1, include_situation_features=1)
    return registry.get_reader("ContextReader")(args)


def _port_fm_tables(ref, corpus, schema):
    """Per-feature reference tables -> one fused table at schema offsets."""
    from rechorus_tpu.data.context import is_categorical

    d = ref.vec_size
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
            bank[f"float_emb_{fj}"] = {
                "kernel": ref.context_embedding[name].weight.detach().numpy().T}
            bank[f"float_lin_{fj}"] = {
                "kernel": ref.linear_embedding[name].weight.detach().numpy().T}
            fj += 1
    bank["fused_table"] = {"embedding": fused}
    bank["fused_linear"] = {"embedding": fused_lin}
    return bank


def test_fm_ctr_forward_parity(ctr_corpus):
    from models.context.FM import FMCTR as TorchFMCTR

    from rechorus_tpu.data.context import build_schema
    from rechorus_tpu.registry import get_model

    corpus = ctr_corpus
    torch.manual_seed(0)
    ref = TorchFMCTR(ref_args(), corpus).eval()

    args = argparse.Namespace(emb_size=16, loss_n="BCE", dropout=0.0, test_all=0,
                              num_neg=0, model_path="", buffer=1)
    model_cls = get_model("FMCTR")
    model = model_cls.from_args(args, corpus)
    schema = build_schema(corpus)
    params = {"bank": _port_fm_tables(ref, corpus, schema),
              "overall_bias": ref.overall_bias.detach().numpy()}

    rng = np.random.default_rng(2)
    B = 16
    df = corpus.data_df["dev"]
    rows = rng.choice(len(df), size=B, replace=False)
    users = df["user_id"].to_numpy()[rows].astype(np.int32)
    items = df["item_id"].to_numpy()[rows].astype(np.int32)
    labels = df["label"].to_numpy()[rows].astype(np.float32)

    # torch feed: per-feature columns, item-side [B, 1]
    tf = {"user_id": t(users), "item_id": t(items[:, None]), "label": t(labels[:, None])}
    for c in corpus.user_feature_names:
        tf[c] = t(np.asarray([corpus.user_features[u][c] for u in users]))
    for c in corpus.item_feature_names:
        tf[c] = t(np.asarray([[corpus.item_features[i][c]] for i in items]))
    for c in corpus.situation_feature_names:
        tf[c] = t(df[c].to_numpy()[rows])
    with torch.no_grad():
        ref_out = ref(tf)

    import jax.numpy as jnp

    situ_names = corpus.situation_feature_names
    feed = {"user_id": jnp.asarray(users), "item_id": jnp.asarray(items[:, None]),
            "label": jnp.asarray(labels[:, None])}
    situ_cat = [df[c].to_numpy()[rows] for c in situ_names if c.endswith(("_c", "_id"))]
    situ_float = [df[c].to_numpy()[rows] for c in situ_names if c.endswith("_f")]
    feed["situ_cat"] = jnp.asarray(np.stack(situ_cat, -1).astype(np.int32)) if situ_cat else jnp.zeros((B, 0), jnp.int32)
    feed["situ_float"] = jnp.asarray(np.stack(situ_float, -1).astype(np.float32)) if situ_float else jnp.zeros((B, 0), jnp.float32)

    variables = model.init({"params": __import__("jax").random.key(0)}, feed, training=False)
    out = model.apply({"params": params, **{k: v for k, v in variables.items() if k != "params"}},
                      feed, training=False)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


# --------------------------------------------------------------------- #
def test_din_forward_parity(ctr_corpus):
    """DIN: target attention + Dice/BatchNorm DNN. Exercises the fused
    feature bank, history feature join, masked unnormalized attention,
    and the (fresh-stats) BatchNorm/Dice stack."""
    from models.context_seq.DIN import DINTopK as TorchDIN

    from rechorus_tpu.data.context import build_schema, is_categorical
    from rechorus_tpu.registry import get_model

    corpus = ctr_corpus
    torch.manual_seed(0)
    rargs = ref_args(att_layers="[32]", dnn_layers="[24]", add_historical_situations=0,
                     history_max=5)
    ref = TorchDIN(rargs, corpus).eval()

    args = argparse.Namespace(emb_size=16, att_layers="[32]", dnn_layers="[24]",
                              add_historical_situations=0, loss_n="BPR", dropout=0.0,
                              test_all=0, num_neg=1, model_path="", buffer=1, history_max=5)
    model_cls = get_model("DINTopK")
    model = model_cls.from_args(args, corpus)
    schema = build_schema(corpus)

    d = 16
    fused = np.zeros((schema.total_vocab, d), dtype=np.float32)
    params = {}
    for name, off in zip(schema.names, schema.offsets):
        if is_categorical(name):
            w = ref.embedding_dict[name].weight.detach().numpy()
            fused[off: off + w.shape[0]] = w
        else:
            params[f"float_{name}"] = {
                "kernel": ref.embedding_dict[name].weight.detach().numpy().T}
    params["fused_table"] = {"embedding": fused}

    def port_mlp(prefix, torch_layers):
        out = {}
        di = 0
        for kind, idx in torch_layers:
            sd = ref.state_dict()
            if kind == "dense":
                out[f"dense_{di}" if idx != "head" else "head"] = {
                    "kernel": sd[f"{prefix}.mlp.{idx if idx != 'head' else torch_layers[-1][1]}.weight"].numpy().T,
                    "bias": sd[f"{prefix}.mlp.{idx}.bias"].numpy()} if idx != "head" else None
        return out

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
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

    rng = np.random.default_rng(4)
    B, C, H = 6, 3, 5
    n_users, n_items = corpus.n_users, corpus.n_items
    users = rng.integers(1, n_users, size=B).astype(np.int32)
    items = rng.integers(1, n_items, size=(B, C)).astype(np.int32)
    lengths = rng.integers(1, H + 1, size=B).astype(np.int32)
    hist = np.zeros((B, H), dtype=np.int32)
    for b in range(B):
        hist[b, : lengths[b]] = rng.integers(1, n_items, size=lengths[b])
    hours = rng.integers(0, 24, size=B).astype(np.int32)

    def ifeat(ids, c):
        flat = np.asarray([corpus.item_features[i][c] if i > 0 else 0 for i in ids.ravel()])
        return flat.reshape(ids.shape)

    tf = {"user_id": t(users), "item_id": t(items), "lengths": t(lengths),
          "history_item_id": t(hist), "c_hour_c": t(hours)}
    for c in corpus.user_feature_names:
        tf[c] = t(np.asarray([corpus.user_features[u][c] for u in users]))
    for c in corpus.item_feature_names:
        tf[c] = t(ifeat(items, c))
        tf["history_" + c] = t(ifeat(hist, c))
    with torch.no_grad():
        ref_out = ref(tf)

    import jax
    import jax.numpy as jnp

    feed = {"user_id": jnp.asarray(users), "item_id": jnp.asarray(items),
            "history_items": jnp.asarray(hist), "lengths": jnp.asarray(lengths),
            "situ_cat": jnp.asarray(hours[:, None]),
            "situ_float": jnp.zeros((B, 0), jnp.float32)}
    variables = model.init({"params": jax.random.key(0)}, feed, training=False)
    extra = {k: v for k, v in variables.items() if k != "params"}
    out = model.apply({"params": params, **extra}, feed, training=False)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=2e-5)


def test_fpmc_forward_parity():
    """FPMC: 4 tables, MF + transition dots (published-number gap on
    Grocery is training-side if this passes)."""
    from models.sequential.FPMC import FPMC as TorchFPMC

    from rechorus_tpu.registry import get_model

    n_users, n_items, H = 30, 50, 8
    corpus = types.SimpleNamespace(n_users=n_users, n_items=n_items)
    torch.manual_seed(0)
    ref = TorchFPMC(ref_args(), corpus).eval()

    model = get_model("FPMC")(user_num=n_users, item_num=n_items, emb_size=16,
                              history_max=H, dropout=0.0)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {name: {"embedding": sd[f"{name}.weight"]}
              for name in ("ui_embeddings", "iu_embeddings", "li_embeddings", "il_embeddings")}

    rng = np.random.default_rng(6)
    B, C = 6, 4
    lengths = rng.integers(1, H + 1, size=B).astype(np.int32)
    hist = np.zeros((B, H), dtype=np.int32)
    for b in range(B):
        hist[b, : lengths[b]] = rng.integers(1, n_items, size=lengths[b])
    items = rng.integers(1, n_items, size=(B, C)).astype(np.int32)
    users = rng.integers(1, n_users, size=B).astype(np.int32)
    last = hist[np.arange(B), lengths - 1]

    with torch.no_grad():
        ref_out = ref({"user_id": t(users), "item_id": t(items),
                       "last_item_id": t(last), "batch_size": B})
    import jax.numpy as jnp

    feed = {"user_id": jnp.asarray(users), "item_id": jnp.asarray(items),
            "history_items": jnp.asarray(hist), "lengths": jnp.asarray(lengths)}
    out = model.apply({"params": params}, feed, training=False)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


# --------------------------------------------------------------------- #
def _port_gru(sd, prefix):
    """torch nn.GRU (gate order r,z,n; separate ih/hh biases) -> flax
    GRUCell (ir/iz/in with bias, hr/hz without -- fold b_hr/b_hz into the
    input-side bias; hn keeps its own bias for the r-gated term)."""
    H = sd[f"{prefix}.bias_ih_l0"].shape[0] // 3
    wi, wh = sd[f"{prefix}.weight_ih_l0"], sd[f"{prefix}.weight_hh_l0"]
    bi, bh = sd[f"{prefix}.bias_ih_l0"], sd[f"{prefix}.bias_hh_l0"]
    return {"GRUCell_0": {
        "ir": {"kernel": wi[:H].T, "bias": bi[:H] + bh[:H]},
        "iz": {"kernel": wi[H:2 * H].T, "bias": bi[H:2 * H] + bh[H:2 * H]},
        "in": {"kernel": wi[2 * H:].T, "bias": bi[2 * H:]},
        "hr": {"kernel": wh[:H].T},
        "hz": {"kernel": wh[H:2 * H].T},
        "hn": {"kernel": wh[2 * H:].T, "bias": bh[2 * H:]},
    }}


def _seq_feed(rng, n_users, n_items, H, B=6, C=4):
    lengths = rng.integers(1, H + 1, size=B).astype(np.int32)
    lengths[0] = H  # reference NARM's pad_packed output must span H cols
    hist = np.zeros((B, H), dtype=np.int32)
    for b in range(B):
        hist[b, : lengths[b]] = rng.integers(1, n_items, size=lengths[b])
    items = rng.integers(1, n_items, size=(B, C)).astype(np.int32)
    users = rng.integers(1, n_users, size=B).astype(np.int32)
    return users, items, hist, lengths


def test_gru4rec_forward_parity():
    """GRU4Rec: validates the MaskedGRU fixed-shape scan against torch's
    sort+pack_padded_sequence path (reference GRU4Rec.py:49-66), plus the
    r/z/n gate-order weight mapping."""
    from models.sequential.GRU4Rec import GRU4Rec as TorchGRU4Rec

    from rechorus_tpu.registry import get_model

    n_users, n_items, H = 30, 50, 8
    corpus = types.SimpleNamespace(n_users=n_users, n_items=n_items)
    torch.manual_seed(0)
    ref = TorchGRU4Rec(ref_args(hidden_size=12), corpus).eval()

    model = get_model("GRU4Rec")(user_num=n_users, item_num=n_items, emb_size=16,
                                 hidden_size=12, dropout=0.0, history_max=H)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "i_embeddings": {"embedding": sd["i_embeddings.weight"]},
        "rnn": _port_gru(sd, "rnn"),
        "out": {"kernel": sd["out.weight"].T, "bias": sd["out.bias"]},
    }

    rng = np.random.default_rng(3)
    users, items, hist, lengths = _seq_feed(rng, n_users, n_items, H)
    with torch.no_grad():
        ref_out = ref({"item_id": t(items), "history_items": t(hist),
                       "lengths": t(lengths), "user_id": t(users), "batch_size": 6})
    import jax.numpy as jnp

    feed = {"user_id": jnp.asarray(users), "item_id": jnp.asarray(items),
            "history_items": jnp.asarray(hist), "lengths": jnp.asarray(lengths)}
    out = model.apply({"params": params}, feed, training=False)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


def test_narm_forward_parity():
    """NARM: dual GRU encoders + sigmoid-MLP attention (reference
    NARM.py:53-86). Catches wrong masking of padded GRU outputs (our
    MaskedGRU carries the last valid state past `lengths`; the attention
    mask must hide it exactly like torch's zero-padded pack output)."""
    from models.sequential.NARM import NARM as TorchNARM

    from rechorus_tpu.registry import get_model

    n_users, n_items, H = 30, 50, 8
    corpus = types.SimpleNamespace(n_users=n_users, n_items=n_items)
    torch.manual_seed(0)
    ref = TorchNARM(ref_args(hidden_size=12, attention_size=7), corpus).eval()

    model = get_model("NARM")(user_num=n_users, item_num=n_items, emb_size=16,
                              hidden_size=12, attention_size=7, dropout=0.0,
                              history_max=H)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "i_embeddings": {"embedding": sd["i_embeddings.weight"]},
        "encoder_g": _port_gru(sd, "encoder_g"),
        "encoder_l": _port_gru(sd, "encoder_l"),
        "A1": {"kernel": sd["A1.weight"].T},
        "A2": {"kernel": sd["A2.weight"].T},
        "attention_out": {"kernel": sd["attention_out.weight"].T},
        "out": {"kernel": sd["out.weight"].T},
    }

    rng = np.random.default_rng(5)
    users, items, hist, lengths = _seq_feed(rng, n_users, n_items, H)
    with torch.no_grad():
        ref_out = ref({"item_id": t(items), "history_items": t(hist),
                       "lengths": t(lengths), "user_id": t(users), "batch_size": 6})
    import jax.numpy as jnp

    feed = {"user_id": jnp.asarray(users), "item_id": jnp.asarray(items),
            "history_items": jnp.asarray(hist), "lengths": jnp.asarray(lengths)}
    out = model.apply({"params": params}, feed, training=False)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


def test_tisasrec_forward_parity():
    """TiSASRec: time-interval-aware attention (reference
    TiSASRec.py:118-199) -- the most intricate sequential forward. Checks
    the pairwise-interval K/V einsums, interval bucketing (floor-div by
    per-user min interval, clip to time_max) and position indexing."""
    import pandas as pd
    from models.sequential.TiSASRec import TiSASRec as TorchTiSASRec

    from rechorus_tpu.registry import get_model

    n_users, n_items, H, T_MAX = 30, 50, 8, 16
    all_df = pd.DataFrame({
        "user_id": np.repeat(np.arange(1, n_users), 3),
        "time": np.tile(np.array([3, 10, 24]), n_users - 1),
    })
    corpus = types.SimpleNamespace(n_users=n_users, n_items=n_items, all_df=all_df)
    torch.manual_seed(0)
    ref = TorchTiSASRec(ref_args(num_layers=1, num_heads=2, time_max=T_MAX), corpus).eval()

    model = get_model("TiSASRec")(user_num=n_users, item_num=n_items, emb_size=16,
                                  num_layers=1, num_heads=2, time_max=T_MAX,
                                  dropout=0.0, history_max=H)
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

    rng = np.random.default_rng(7)
    users, items, hist, lengths = _seq_feed(rng, n_users, n_items, H)
    times = np.sort(rng.integers(0, 200, size=(6, H)), axis=1).astype(np.int64)
    min_iv = rng.integers(1, 6, size=6).astype(np.int64)
    with torch.no_grad():
        ref_out = ref({"item_id": t(items), "history_items": t(hist),
                       "history_times": t(times), "user_min_intervals": t(min_iv),
                       "lengths": t(lengths), "user_id": t(users), "batch_size": 6})
    import jax.numpy as jnp

    feed = {"user_id": jnp.asarray(users), "item_id": jnp.asarray(items),
            "history_items": jnp.asarray(hist), "lengths": jnp.asarray(lengths),
            "history_times": jnp.asarray(times.astype(np.int32)),
            "user_min_intervals": jnp.asarray(min_iv.astype(np.int32))}
    out = model.apply({"params": params}, feed, training=False)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


def test_caser_forward_parity():
    """Caser: horizontal/vertical CNN (reference Caser.py:55-103). The
    vertical-conv flatten order differs (torch NCHW channel-major vs our
    NHWC position-major), so the fc weight columns are permuted to match
    -- a pure input-permutation absorbed by the dense layer."""
    from models.sequential.Caser import Caser as TorchCaser

    from rechorus_tpu.registry import get_model

    n_users, n_items, H, E = 30, 50, 8, 16
    num_h, num_v, L = 5, 3, 4
    corpus = types.SimpleNamespace(n_users=n_users, n_items=n_items)
    torch.manual_seed(0)
    ref = TorchCaser(ref_args(num_horizon=num_h, num_vertical=num_v, L=L), corpus).eval()

    model = get_model("Caser")(user_num=n_users, item_num=n_items, emb_size=E,
                               num_horizon=num_h, num_vertical=num_v, L=L,
                               dropout=0.0, history_max=H)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    v_dim = num_v * E
    fc_w = sd["fc.weight"]  # [E, v_dim + h_dim], v-part channel-major
    fc_v = fc_w[:, :v_dim].reshape(E, num_v, E).transpose(0, 2, 1).reshape(E, v_dim)
    fc_ours = np.concatenate([fc_v, fc_w[:, v_dim:]], axis=1)
    params = {
        "i_embeddings": {"embedding": sd["i_embeddings.weight"]},
        "u_embeddings": {"embedding": sd["u_embeddings.weight"]},
        "conv_v": {"kernel": sd["conv_v.weight"].transpose(2, 3, 1, 0),
                   "bias": sd["conv_v.bias"]},
        "fc": {"kernel": fc_ours.T, "bias": sd["fc.bias"]},
        "out": {"kernel": sd["out.weight"].T, "bias": sd["out.bias"]},
    }
    for h in range(1, L + 1):
        params[f"conv_h_{h}"] = {
            "kernel": sd[f"conv_h.{h - 1}.weight"].transpose(2, 3, 1, 0),
            "bias": sd[f"conv_h.{h - 1}.bias"]}

    rng = np.random.default_rng(8)
    users, items, hist, lengths = _seq_feed(rng, n_users, n_items, H)
    with torch.no_grad():
        ref_out = ref({"item_id": t(items), "history_items": t(hist),
                       "lengths": t(lengths), "user_id": t(users), "batch_size": 6})
    import jax.numpy as jnp

    feed = {"user_id": jnp.asarray(users), "item_id": jnp.asarray(items),
            "history_items": jnp.asarray(hist), "lengths": jnp.asarray(lengths)}
    out = model.apply({"params": params}, feed, training=False)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


def test_lightgcn_forward_parity(monkeypatch):
    """LightGCN: our edge-list segment_sum propagation vs the reference's
    scipy CSR + torch.sparse.mm (LightGCN.py:22-53,137-154). Same
    D^-1/2 A D^-1/2 normalization, K layers, mean-of-layers."""
    from models.general.LightGCN import LightGCN as TorchLightGCN

    from rechorus_tpu.registry import get_model

    # reference hardcodes .cuda() on the sparse adjacency (LightGCN.py:120)
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self, raising=False)

    n_users, n_items, E, K = 20, 40, 16, 2
    rng = np.random.default_rng(9)
    clicked = {u: set(rng.choice(np.arange(1, n_items), size=5, replace=False).tolist())
               for u in range(1, n_users)}
    corpus = types.SimpleNamespace(n_users=n_users, n_items=n_items,
                                   train_clicked_set=clicked)
    torch.manual_seed(0)
    ref = TorchLightGCN(ref_args(n_layers=K, batch_size=256), corpus).eval()

    model_cls = get_model("LightGCN")
    model = model_cls(user_num=n_users, item_num=n_items, emb_size=E, n_layers=K,
                      dropout=0.0, **model_cls.graph_kwargs(corpus))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {"user_emb": sd["encoder.embedding_dict.user_emb"],
              "item_emb": sd["encoder.embedding_dict.item_emb"]}

    B, C = 6, 4
    users = rng.integers(1, n_users, size=B).astype(np.int32)
    items = rng.integers(1, n_items, size=(B, C)).astype(np.int32)
    with torch.no_grad():
        ref_out = ref({"user_id": t(users), "item_id": t(items), "batch_size": B})
    import jax
    import jax.numpy as jnp

    feed = {"user_id": jnp.asarray(users), "item_id": jnp.asarray(items)}
    variables = model.init({"params": jax.random.key(0)}, feed, training=False)
    extra = {k: v for k, v in variables.items() if k != "params"}
    out = model.apply({"params": params, **extra}, feed, training=False)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-4)


def test_autoint_forward_parity(ctr_corpus):
    """AutoInt: stacked feature self-attention + linear residual over the
    FM embedding bank (reference AutoInt.py:50-80). attention_d != d_model
    and bias=False exercise the MHA projection options."""
    from models.context.AutoInt import AutoIntCTR as TorchAutoInt

    from rechorus_tpu.data.context import build_schema
    from rechorus_tpu.registry import get_model

    corpus = ctr_corpus
    torch.manual_seed(0)
    rargs = ref_args(attention_size=8, num_heads=2, num_layers=1, layers="[24]")
    ref = TorchAutoInt(rargs, corpus).eval()

    args = argparse.Namespace(emb_size=16, attention_size=8, num_heads=2,
                              num_layers=1, layers="[24]", loss_n="BCE",
                              dropout=0.0, test_all=0, num_neg=0, model_path="",
                              buffer=1)
    model_cls = get_model("AutoIntCTR")
    model = model_cls.from_args(args, corpus)
    schema = build_schema(corpus)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "bank": _port_fm_tables(ref, corpus, schema),
        "overall_bias": ref.overall_bias.detach().numpy(),
        "att_0": {
            "q": {"kernel": sd["autoint_attentions.0.q_linear.weight"].T},
            "k": {"kernel": sd["autoint_attentions.0.k_linear.weight"].T},
            "v": {"kernel": sd["autoint_attentions.0.v_linear.weight"].T},
        },
        "residual_0": {"kernel": sd["residual_embeddings.0.weight"].T,
                       "bias": sd["residual_embeddings.0.bias"]},
        "deep_layers": {
            "dense_0": {"kernel": sd["deep_layers.mlp.0.weight"].T,
                        "bias": sd["deep_layers.mlp.0.bias"]},
            "head": {"kernel": sd["deep_layers.mlp.2.weight"].T,
                     "bias": sd["deep_layers.mlp.2.bias"]},
        },
    }

    rng = np.random.default_rng(11)
    B = 16
    df = corpus.data_df["dev"]
    rows = rng.choice(len(df), size=B, replace=False)
    users = df["user_id"].to_numpy()[rows].astype(np.int32)
    items = df["item_id"].to_numpy()[rows].astype(np.int32)
    labels = df["label"].to_numpy()[rows].astype(np.float32)

    tf = {"user_id": t(users), "item_id": t(items[:, None]), "label": t(labels[:, None])}
    for c in corpus.user_feature_names:
        tf[c] = t(np.asarray([corpus.user_features[u][c] for u in users]))
    for c in corpus.item_feature_names:
        tf[c] = t(np.asarray([[corpus.item_features[i][c]] for i in items]))
    for c in corpus.situation_feature_names:
        tf[c] = t(df[c].to_numpy()[rows])
    with torch.no_grad():
        ref_out = ref(tf)

    import jax
    import jax.numpy as jnp

    situ_names = corpus.situation_feature_names
    feed = {"user_id": jnp.asarray(users), "item_id": jnp.asarray(items[:, None]),
            "label": jnp.asarray(labels[:, None])}
    situ_cat = [df[c].to_numpy()[rows] for c in situ_names if c.endswith(("_c", "_id"))]
    situ_float = [df[c].to_numpy()[rows] for c in situ_names if c.endswith("_f")]
    feed["situ_cat"] = jnp.asarray(np.stack(situ_cat, -1).astype(np.int32)) if situ_cat else jnp.zeros((B, 0), jnp.int32)
    feed["situ_float"] = jnp.asarray(np.stack(situ_float, -1).astype(np.float32)) if situ_float else jnp.zeros((B, 0), jnp.float32)

    variables = model.init({"params": jax.random.key(0)}, feed, training=False)
    extra = {k: v for k, v in variables.items() if k != "params"}
    out = model.apply({"params": params, **extra}, feed, training=False)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


def test_kda_forward_parity():
    """KDA (the flagship Grocery model): relational dynamic aggregation
    with the learnable inverse-DFT temporal decay, relation
    self-attention, average pooling and item bias (reference
    KDA.py:105-160, 266-303). Proves the architecture matches so the
    above-published Grocery numbers are training-side, not a different
    model. num_layers=1 (the benchmarked config; for >1 layers the
    reference re-applies ONE shared block where we stack fresh ones)."""
    from models.sequential.KDA import KDA as TorchKDA

    from rechorus_tpu.registry import get_model

    n_users, n_items, H, d, R, N_ENT, N_DFT = 30, 50, 8, 16, 3, 70, 8
    F = N_DFT // 2 + 1
    corpus = types.SimpleNamespace(
        n_users=n_users, n_items=n_items, n_relations=R, n_entities=N_ENT,
        freq_x=np.zeros((R, F), dtype=complex))
    torch.manual_seed(0)
    rargs = ref_args(n_dft=N_DFT, freq_rand=1, gamma=0.5, attention_size=10,
                     pooling="average", include_val=1, neg_head_p=0.5)
    ref = TorchKDA(rargs, corpus).eval()

    model = get_model("KDA")(
        user_num=n_users, item_num=n_items, emb_size=d, num_layers=1,
        num_heads=2, dropout=0.0, history_max=H, relation_num=R,
        entity_num=N_ENT, freq_dim=F, t_scalar=60, freq_rand=1, gamma=0.5,
        include_val=1, pooling="average")

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

    rng = np.random.default_rng(12)
    users, items, hist, lengths = _seq_feed(rng, n_users, n_items, H)
    B, C = items.shape
    item_val = rng.integers(0, N_ENT, size=(B, C, R)).astype(np.int32)
    delta_t = rng.uniform(0.0, 4.0, size=(B, H)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref({"user_id": t(users), "item_id": t(items),
                       "item_val": t(item_val), "history_items": t(hist),
                       "history_delta_t": t(delta_t), "lengths": t(lengths),
                       "batch_size": B, "phase": "test"})
    import jax.numpy as jnp

    feed = {"user_id": jnp.asarray(users), "item_id": jnp.asarray(items),
            "item_val": jnp.asarray(item_val), "history_items": jnp.asarray(hist),
            "history_delta_t": jnp.asarray(delta_t), "lengths": jnp.asarray(lengths)}
    out = model.apply({"params": params}, feed, training=False)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


# --------------------------------------------------------------------- #
def test_comirec_forward_parity():
    """ComiRec: K-head history attention -> K interests, eval takes the
    max over interests per candidate (reference ComiRec.py:55-91)."""
    from models.sequential.ComiRec import ComiRec as TorchComiRec

    from rechorus_tpu.registry import get_model

    n_users, n_items, H = 30, 50, 8
    corpus = types.SimpleNamespace(n_users=n_users, n_items=n_items)
    torch.manual_seed(0)
    ref = TorchComiRec(ref_args(attn_size=7, K=3, add_pos=1), corpus).eval()

    model = get_model("ComiRec")(user_num=n_users, item_num=n_items, emb_size=16,
                                 attn_size=7, K=3, add_pos=1, dropout=0.0,
                                 history_max=H)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "i_embeddings": {"embedding": sd["i_embeddings.weight"]},
        "p_embeddings": {"embedding": sd["p_embeddings.weight"]},
        "W1": {"kernel": sd["W1.weight"].T, "bias": sd["W1.bias"]},
        "W2": {"kernel": sd["W2.weight"].T, "bias": sd["W2.bias"]},
    }

    rng = np.random.default_rng(25)
    users, items, hist, lengths = _seq_feed(rng, n_users, n_items, H)
    with torch.no_grad():
        ref_out = ref({"item_id": t(items), "history_items": t(hist),
                       "lengths": t(lengths), "user_id": t(users),
                       "batch_size": 6, "phase": "test"})
    import jax.numpy as jnp

    feed = {"user_id": jnp.asarray(users), "item_id": jnp.asarray(items),
            "history_items": jnp.asarray(hist), "lengths": jnp.asarray(lengths)}
    out = model.apply({"params": params}, feed, training=False)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


def test_slrcplus_forward_parity():
    """SLRC+: Hawkes base intensity + relational excitation with
    exponential/normal mixture kernels (reference SLRCPlus.py:63-92)."""
    from models.sequential.SLRCPlus import SLRCPlus as TorchSLRC

    from rechorus_tpu.registry import get_model

    n_users, n_items, R = 30, 50, 3
    corpus = types.SimpleNamespace(n_users=n_users, n_items=n_items,
                                   item_relations=["r_a", "r_b"])
    torch.manual_seed(0)
    ref = TorchSLRC(ref_args(time_scalar=60), corpus).eval()

    model = get_model("SLRCPlus")(user_num=n_users, item_num=n_items, emb_size=16,
                                  time_scalar=60, relation_num=R, dropout=0.0,
                                  history_max=8)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {"global_alpha": sd["global_alpha"]}
    for name in ("u_embeddings", "i_embeddings", "user_bias", "item_bias",
                 "alphas", "pis", "betas", "sigmas", "mus"):
        params[name] = {"embedding": sd[f"{name}.weight"]}

    rng = np.random.default_rng(26)
    B, C = 6, 4
    users = rng.integers(1, n_users, size=B).astype(np.int32)
    items = rng.integers(1, n_items, size=(B, C)).astype(np.int32)
    # intervals: mix of -1 (absent) and positive values
    r_int = rng.uniform(0, 3, size=(B, C, R)).astype(np.float32)
    r_int[rng.random((B, C, R)) < 0.5] = -1.0

    with torch.no_grad():
        ref_out = ref({"user_id": t(users), "item_id": t(items),
                       "relational_interval": t(r_int), "batch_size": B})
    import jax.numpy as jnp

    feed = {"user_id": jnp.asarray(users), "item_id": jnp.asarray(items),
            "relational_interval": jnp.asarray(r_int)}
    out = model.apply({"params": params}, feed, training=False)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


# --------------------------------------------------------------------- #
def test_bprmf_forward_parity():
    """BPRMF: u.i dot product (reference BPRMF.py:33-45)."""
    from models.general.BPRMF import BPRMF as TorchBPRMF

    from rechorus_tpu.registry import get_model

    n_users, n_items = 30, 50
    corpus = types.SimpleNamespace(n_users=n_users, n_items=n_items)
    torch.manual_seed(0)
    ref = TorchBPRMF(ref_args(), corpus).eval()

    model = get_model("BPRMF")(user_num=n_users, item_num=n_items, emb_size=16, dropout=0.0)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {"u_embeddings": {"embedding": sd["u_embeddings.weight"]},
              "i_embeddings": {"embedding": sd["i_embeddings.weight"]}}

    rng = np.random.default_rng(30)
    B, C = 6, 4
    users = rng.integers(1, n_users, size=B).astype(np.int32)
    items = rng.integers(1, n_items, size=(B, C)).astype(np.int32)
    with torch.no_grad():
        ref_out = ref({"user_id": t(users), "item_id": t(items), "batch_size": B})
    import jax.numpy as jnp

    feed = {"user_id": jnp.asarray(users), "item_id": jnp.asarray(items)}
    out = model.apply({"params": params}, feed, training=False)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


def test_neumf_forward_parity():
    """NeuMF: GMF element-product + MLP towers -> linear head
    (reference NeuMF.py:42-77)."""
    from models.general.NeuMF import NeuMF as TorchNeuMF

    from rechorus_tpu.registry import get_model

    n_users, n_items = 30, 50
    corpus = types.SimpleNamespace(n_users=n_users, n_items=n_items)
    torch.manual_seed(0)
    ref = TorchNeuMF(ref_args(layers="[24,12]"), corpus).eval()

    model = get_model("NeuMF")(user_num=n_users, item_num=n_items, emb_size=16,
                               layers=(24, 12), dropout=0.0)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {name: {"embedding": sd[f"{name}.weight"]}
              for name in ("mf_u_embeddings", "mf_i_embeddings",
                           "mlp_u_embeddings", "mlp_i_embeddings")}
    for k in range(2):
        params[f"mlp_{k}"] = {"kernel": sd[f"mlp.{k}.weight"].T, "bias": sd[f"mlp.{k}.bias"]}
    params["prediction"] = {"kernel": sd["prediction.weight"].T}

    rng = np.random.default_rng(31)
    B, C = 6, 4
    users = rng.integers(1, n_users, size=B).astype(np.int32)
    items = rng.integers(1, n_items, size=(B, C)).astype(np.int32)
    with torch.no_grad():
        ref_out = ref({"user_id": t(users), "item_id": t(items), "batch_size": B})
    import jax.numpy as jnp

    feed = {"user_id": jnp.asarray(users), "item_id": jnp.asarray(items)}
    out = model.apply({"params": params}, feed, training=False)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


def test_directau_forward_parity():
    """DirectAU: dot-product scoring (alignment/uniformity live in the
    loss; reference DirectAU.py:64-80)."""
    from models.general.DirectAU import DirectAU as TorchDirectAU

    from rechorus_tpu.registry import get_model

    n_users, n_items = 30, 50
    corpus = types.SimpleNamespace(n_users=n_users, n_items=n_items)
    torch.manual_seed(0)
    ref = TorchDirectAU(ref_args(gamma=1.0), corpus).eval()

    model = get_model("DirectAU")(user_num=n_users, item_num=n_items, emb_size=16,
                                  gamma=1.0, dropout=0.0)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {"u_embeddings": {"embedding": sd["u_embeddings.weight"]},
              "i_embeddings": {"embedding": sd["i_embeddings.weight"]}}

    rng = np.random.default_rng(32)
    B, C = 6, 4
    users = rng.integers(1, n_users, size=B).astype(np.int32)
    items = rng.integers(1, n_items, size=(B, C)).astype(np.int32)
    with torch.no_grad():
        ref_out = ref({"user_id": t(users), "item_id": t(items),
                       "batch_size": B, "phase": "test"})
    import jax.numpy as jnp

    feed = {"user_id": jnp.asarray(users), "item_id": jnp.asarray(items)}
    out = model.apply({"params": params}, feed, training=False)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


def test_buir_forward_parity():
    """BUIR inference: symmetric predictor-crossed online scoring
    (reference BUIR.py:73-78)."""
    from models.general.BUIR import BUIR as TorchBUIR

    from rechorus_tpu.registry import get_model

    n_users, n_items = 30, 50
    corpus = types.SimpleNamespace(n_users=n_users, n_items=n_items)
    torch.manual_seed(0)
    ref = TorchBUIR(ref_args(momentum=0.995), corpus).eval()

    model = get_model("BUIR")(user_num=n_users, item_num=n_items, emb_size=16,
                              momentum=0.995, dropout=0.0)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {"user_online": {"embedding": sd["user_online.weight"]},
              "item_online": {"embedding": sd["item_online.weight"]},
              "predictor": {"kernel": sd["predictor.weight"].T,
                            "bias": sd["predictor.bias"]}}

    rng = np.random.default_rng(33)
    B, C = 6, 4
    users = rng.integers(1, n_users, size=B).astype(np.int32)
    items = rng.integers(1, n_items, size=(B, C)).astype(np.int32)
    with torch.no_grad():
        ref_out = ref({"user_id": t(users), "item_id": t(items),
                       "batch_size": B, "phase": "test"})
    import jax.numpy as jnp

    feed = {"user_id": jnp.asarray(users), "item_id": jnp.asarray(items)}
    out = model.apply({"params": params}, feed, training=False)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


def test_cfkg_forward_parity():
    """CFKG: TransE scoring over the joint [users | entities] table
    (reference CFKG.py:51-69)."""
    from models.general.CFKG import CFKG as TorchCFKG

    from rechorus_tpu.registry import get_model

    n_users, n_items, n_ent, n_rel = 30, 50, 70, 4
    corpus = types.SimpleNamespace(n_users=n_users, n_items=n_items,
                                   n_entities=n_ent, n_relations=n_rel)
    torch.manual_seed(0)
    ref = TorchCFKG(ref_args(margin=0.0), corpus).eval()

    model = get_model("CFKG")(user_num=n_users, item_num=n_items, emb_size=16,
                              entity_num=n_ent, relation_num=n_rel, margin=0.0,
                              dropout=0.0)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {"e_embeddings": {"embedding": sd["e_embeddings.weight"]},
              "r_embeddings": {"embedding": sd["r_embeddings.weight"]}}

    rng = np.random.default_rng(34)
    B, C = 6, 4
    heads = rng.integers(0, n_users + n_ent, size=(B, C)).astype(np.int32)
    tails = rng.integers(0, n_users + n_ent, size=(B, C)).astype(np.int32)
    rels = rng.integers(0, n_rel, size=(B, C)).astype(np.int32)
    with torch.no_grad():
        ref_out = ref({"head_id": t(heads), "tail_id": t(tails),
                       "relation_id": t(rels), "batch_size": B})
    import jax.numpy as jnp

    feed = {"head_id": jnp.asarray(heads), "tail_id": jnp.asarray(tails),
            "relation_id": jnp.asarray(rels)}
    out = model.apply({"params": params}, feed, training=False)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-4)


def _port_trm(sd, prefix):
    """torch TransformerLayer (layers.py:92-118) -> our TransformerLayer."""
    return {
        "mha": {
            "q": {"kernel": sd[f"{prefix}.masked_attn_head.q_linear.weight"].T,
                  "bias": sd[f"{prefix}.masked_attn_head.q_linear.bias"]},
            "k": {"kernel": sd[f"{prefix}.masked_attn_head.k_linear.weight"].T,
                  "bias": sd[f"{prefix}.masked_attn_head.k_linear.bias"]},
            "v": {"kernel": sd[f"{prefix}.masked_attn_head.v_linear.weight"].T,
                  "bias": sd[f"{prefix}.masked_attn_head.v_linear.bias"]},
        },
        "ln1": {"scale": sd[f"{prefix}.layer_norm1.weight"], "bias": sd[f"{prefix}.layer_norm1.bias"]},
        "ff1": {"kernel": sd[f"{prefix}.linear1.weight"].T, "bias": sd[f"{prefix}.linear1.bias"]},
        "ff2": {"kernel": sd[f"{prefix}.linear2.weight"].T, "bias": sd[f"{prefix}.linear2.bias"]},
        "ln2": {"scale": sd[f"{prefix}.layer_norm2.weight"], "bias": sd[f"{prefix}.layer_norm2.bias"]},
    }


def test_timirec_forward_parity():
    """TiMiRec finetune inference: multi-interest extractor (attention +
    transformer) combined via softmax(proj(GRU interest-predictor))
    (reference TiMiRec.py:104-144). n_layers=2 exercises the hidden
    projection layer."""
    from models.sequential.TiMiRec import TiMiRec as TorchTiMiRec

    from rechorus_tpu.registry import get_model

    n_users, n_items, H = 30, 50, 8
    corpus = types.SimpleNamespace(n_users=n_users, n_items=n_items, dataset="Synth")
    torch.manual_seed(0)
    rargs = ref_args(attn_size=7, K=3, add_pos=1, add_trm=1, temp=1.0,
                     n_layers=2, stage="finetune", random_seed=0)
    ref = TorchTiMiRec(rargs, corpus).eval()

    model = get_model("TiMiRec")(user_num=n_users, item_num=n_items, emb_size=16,
                                 attn_size=7, K=3, add_pos=1, add_trm=1, temp=1.0,
                                 n_layers=2, stage="finetune", dropout=0.0,
                                 history_max=H)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "interest_extractor": {
            "i_embeddings": {"embedding": sd["interest_extractor.i_embeddings.weight"]},
            "p_embeddings": {"embedding": sd["interest_extractor.p_embeddings.weight"]},
            "W1": {"kernel": sd["interest_extractor.W1.weight"].T,
                   "bias": sd["interest_extractor.W1.bias"]},
            "W2": {"kernel": sd["interest_extractor.W2.weight"].T,
                   "bias": sd["interest_extractor.W2.bias"]},
            "transformer": _port_trm(sd, "interest_extractor.transformer"),
        },
        "interest_predictor": {
            "i_embeddings": {"embedding": sd["interest_predictor.i_embeddings.weight"]},
            "rnn": _port_gru(sd, "interest_predictor.rnn"),
        },
        "proj_0": {"kernel": sd["proj.proj_0.weight"].T, "bias": sd["proj.proj_0.bias"]},
        "proj_final": {"kernel": sd["proj.proj_final.weight"].T,
                       "bias": sd["proj.proj_final.bias"]},
    }

    rng = np.random.default_rng(28)
    users, items, hist, lengths = _seq_feed(rng, n_users, n_items, H)
    with torch.no_grad():
        ref_out = ref({"item_id": t(items), "history_items": t(hist),
                       "lengths": t(lengths), "user_id": t(users),
                       "batch_size": 6, "phase": "test"})
    import jax.numpy as jnp

    feed = {"user_id": jnp.asarray(users), "item_id": jnp.asarray(items),
            "history_items": jnp.asarray(hist), "lengths": jnp.asarray(lengths)}
    out = model.apply({"params": params}, feed, training=False)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


@pytest.mark.parametrize("encoder", ["BERT4Rec", "GRU4Rec", "Caser"])
def test_contrarec_forward_parity(encoder):
    """ContraRec inference across all three sequence encoders
    (reference ContraRec.py:70-84, 196-276). History length == max_his
    for Caser (the reference pads to max_his; ours convolves the given
    length)."""
    from models.sequential.ContraRec import ContraRec as TorchContraRec

    from rechorus_tpu.registry import get_model

    n_users, n_items, H = 30, 50, 8
    corpus = types.SimpleNamespace(n_users=n_users, n_items=n_items)
    torch.manual_seed(0)
    rargs = ref_args(gamma=1.0, beta_a=3, beta_b=3, ctc_temp=1.0, ccc_temp=0.2,
                     encoder=encoder)
    ref = TorchContraRec(rargs, corpus).eval()

    model = get_model("ContraRec")(user_num=n_users, item_num=n_items, emb_size=16,
                                   encoder=encoder, dropout=0.0, history_max=H)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {"i_embeddings": {"embedding": sd["i_embeddings.weight"]}}
    if encoder == "BERT4Rec":
        params["encoder"] = {
            "p_embeddings": {"embedding": sd["encoder.p_embeddings.weight"]},
            "trm_0": _port_trm(sd, "encoder.transformer_block.0"),
            "trm_1": _port_trm(sd, "encoder.transformer_block.1"),
        }
    elif encoder == "GRU4Rec":
        params["encoder"] = {
            "rnn": _port_gru(sd, "encoder.rnn"),
            "out": {"kernel": sd["encoder.out.weight"].T},
        }
    else:  # Caser
        nv, E = 8, 16
        v_dim = nv * E
        fc_w = sd["encoder.fc.weight"]  # [E, v_dim + h_dim], v-part channel-major
        fc_v = fc_w[:, :v_dim].reshape(E, nv, E).transpose(0, 2, 1).reshape(E, v_dim)
        fc_ours = np.concatenate([fc_v, fc_w[:, v_dim:]], axis=1)
        enc = {
            "conv_v": {"kernel": sd["encoder.conv_v.weight"].transpose(2, 3, 1, 0),
                       "bias": sd["encoder.conv_v.bias"]},
            "fc": {"kernel": fc_ours.T, "bias": sd["encoder.fc.bias"]},
        }
        for i in range(1, 6):
            enc[f"conv_h_{i}"] = {
                "kernel": sd[f"encoder.conv_h.{i - 1}.weight"].transpose(2, 3, 1, 0),
                "bias": sd[f"encoder.conv_h.{i - 1}.bias"]}
        params["encoder"] = enc

    rng = np.random.default_rng(29)
    users, items, hist, lengths = _seq_feed(rng, n_users, n_items, H)
    with torch.no_grad():
        ref_out = ref({"item_id": t(items), "history_items": t(hist),
                       "lengths": t(lengths), "user_id": t(users),
                       "batch_size": 6, "phase": "test"})
    import jax.numpy as jnp

    feed = {"user_id": jnp.asarray(users), "item_id": jnp.asarray(items),
            "history_items": jnp.asarray(hist), "lengths": jnp.asarray(lengths)}
    out = model.apply({"params": params}, feed, training=False)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


@pytest.mark.parametrize("base_method", ["BPR", "GMF"])
def test_chorus_forward_parity(base_method, tmp_path, monkeypatch):
    """Chorus stage-2 rec forward: per-relation temporal kernels
    (exponential / complement=normal / substitute=-normal+normal) weight
    relation-translated item embeddings (reference Chorus.py:100-153).
    Built at stage=1 with a 'test' phase feed, which routes both
    frameworks through rec_forward without needing a pretrain checkpoint
    on disk (Chorus.py:96-99)."""
    import pandas as pd
    from models.sequential.Chorus import Chorus as TorchChorus

    from rechorus_tpu.registry import get_model

    n_users, n_items, R, n_cat = 30, 50, 3, 5
    meta = pd.DataFrame({"item_id": np.arange(1, n_items),
                         "i_category": np.arange(1, n_items) % n_cat})
    corpus = types.SimpleNamespace(n_users=n_users, n_items=n_items,
                                   item_relations=["r_complement", "r_substitute"],
                                   item_meta_df=meta, dataset="Synth")
    torch.manual_seed(0)
    monkeypatch.chdir(tmp_path)  # reference writes ../model/Chorus paths
    rargs = ref_args(stage=1, base_method=base_method, time_scalar=60,
                     category_col="i_category", lr_scale=0.1, margin=1.0, lr=1e-3)
    ref = TorchChorus(rargs, corpus).eval()

    args = argparse.Namespace(stage=1, base_method=base_method, emb_size=16,
                              time_scalar=60, category_col="i_category",
                              lr_scale=0.1, margin=1.0, dataset="Synth",
                              model_path=str(tmp_path / "m.bin"), history_max=8,
                              dropout=0.0, test_all=0, num_neg=1, buffer=1)
    model = get_model("Chorus").from_args(args, corpus)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {name: sd[f"{name}.weight"]
              for name in ("u_embeddings", "i_embeddings", "r_embeddings",
                           "betas", "mus", "sigmas", "user_bias", "item_bias")}
    params["prediction_w"] = sd["prediction.weight"].T

    rng = np.random.default_rng(27)
    B, C = 6, 4
    users = rng.integers(1, n_users, size=B).astype(np.int32)
    items = rng.integers(1, n_items, size=(B, C)).astype(np.int32)
    cats = (items % n_cat).astype(np.int32)
    r_int = rng.uniform(0, 3, size=(B, C, R)).astype(np.float32)
    r_int[rng.random((B, C, R)) < 0.5] = -1.0

    with torch.no_grad():
        ref_out = ref({"user_id": t(users), "item_id": t(items),
                       "category_id": t(cats), "relational_interval": t(r_int),
                       "batch_size": B, "phase": "test"})
    import jax.numpy as jnp

    feed = {"user_id": jnp.asarray(users), "item_id": jnp.asarray(items),
            "category_id": jnp.asarray(cats),
            "relational_interval": jnp.asarray(r_int)}
    out = model.apply({"params": params}, feed, training=False)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


def _ctr_feed_pair(corpus, seed, B=16):
    """Identical CTR feeds for both frameworks: torch per-feature columns
    (item-side [B, 1]) and our fused situ_cat/situ_float layout."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    df = corpus.data_df["dev"]
    rows = rng.choice(len(df), size=B, replace=False)
    users = df["user_id"].to_numpy()[rows].astype(np.int32)
    items = df["item_id"].to_numpy()[rows].astype(np.int32)
    labels = df["label"].to_numpy()[rows].astype(np.float32)

    tf = {"user_id": t(users), "item_id": t(items[:, None]), "label": t(labels[:, None])}
    for c in corpus.user_feature_names:
        tf[c] = t(np.asarray([corpus.user_features[u][c] for u in users]))
    for c in corpus.item_feature_names:
        tf[c] = t(np.asarray([[corpus.item_features[i][c]] for i in items]))
    for c in corpus.situation_feature_names:
        tf[c] = t(df[c].to_numpy()[rows])

    situ_names = corpus.situation_feature_names
    feed = {"user_id": jnp.asarray(users), "item_id": jnp.asarray(items[:, None]),
            "label": jnp.asarray(labels[:, None])}
    situ_cat = [df[c].to_numpy()[rows] for c in situ_names if c.endswith(("_c", "_id"))]
    situ_float = [df[c].to_numpy()[rows] for c in situ_names if c.endswith("_f")]
    feed["situ_cat"] = jnp.asarray(np.stack(situ_cat, -1).astype(np.int32)) if situ_cat else jnp.zeros((B, 0), jnp.int32)
    feed["situ_float"] = jnp.asarray(np.stack(situ_float, -1).astype(np.float32)) if situ_float else jnp.zeros((B, 0), jnp.float32)
    return tf, feed


def _apply_ported(model, params, feed):
    """model.apply with freshly-initialized non-param collections kept."""
    import jax

    variables = model.init({"params": jax.random.key(0)}, feed, training=False)
    extra = {k: v for k, v in variables.items() if k != "params"}
    return model.apply({"params": params, **extra}, feed, training=False)


def _port_mlp_block(sd, prefix, torch_idx):
    """torch MLP_Block (Linear/ReLU/... + output Linear) -> our MLPBlock
    {dense_i, head}. torch_idx lists the Linear indices inside .mlp;
    the last one becomes 'head'."""
    out = {}
    for i, ti in enumerate(torch_idx):
        name = "head" if i == len(torch_idx) - 1 else f"dense_{i}"
        out[name] = {"kernel": sd[f"{prefix}.mlp.{ti}.weight"].T,
                     "bias": sd[f"{prefix}.mlp.{ti}.bias"]}
    return out


def test_widedeep_forward_parity(ctr_corpus):
    """Wide&Deep: FM linear wide part + deep MLP over flattened feature
    embeddings (reference WideDeep.py:34-46)."""
    from models.context.WideDeep import WideDeepCTR as TorchWD

    from rechorus_tpu.data.context import build_schema
    from rechorus_tpu.registry import get_model

    corpus = ctr_corpus
    torch.manual_seed(0)
    ref = TorchWD(ref_args(layers="[24]"), corpus).eval()

    args = argparse.Namespace(emb_size=16, layers="[24]", loss_n="BCE", dropout=0.0,
                              test_all=0, num_neg=0, model_path="", buffer=1)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {"bank": _port_fm_tables(ref, corpus, build_schema(corpus)),
              "overall_bias": ref.overall_bias.detach().numpy(),
              "deep_layers": _port_mlp_block(sd, "deep_layers", [0, 2])}

    tf, feed = _ctr_feed_pair(corpus, 13)
    with torch.no_grad():
        ref_out = ref(tf)
    out = _apply_ported(get_model("WideDeepCTR").from_args(args, corpus), params, feed)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


def test_deepfm_forward_parity(ctr_corpus):
    """DeepFM: FM second-order term + shared-embedding deep tower
    (reference DeepFM.py:19-28)."""
    from models.context.DeepFM import DeepFMCTR as TorchDeepFM

    from rechorus_tpu.data.context import build_schema
    from rechorus_tpu.registry import get_model

    corpus = ctr_corpus
    torch.manual_seed(0)
    ref = TorchDeepFM(ref_args(layers="[24]"), corpus).eval()

    args = argparse.Namespace(emb_size=16, layers="[24]", loss_n="BCE", dropout=0.0,
                              test_all=0, num_neg=0, model_path="", buffer=1)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {"bank": _port_fm_tables(ref, corpus, build_schema(corpus)),
              "overall_bias": ref.overall_bias.detach().numpy(),
              "deep_layers": _port_mlp_block(sd, "deep_layers", [0, 2])}

    tf, feed = _ctr_feed_pair(corpus, 14)
    with torch.no_grad():
        ref_out = ref(tf)
    out = _apply_ported(get_model("DeepFMCTR").from_args(args, corpus), params, feed)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


def test_afm_forward_parity(ctr_corpus):
    """AFM: pairwise interactions weighted by AttLayer softmax + projection
    p (reference AFM.py:46-81). Checks the triu pair enumeration order."""
    from models.context.AFM import AFMCTR as TorchAFM

    from rechorus_tpu.data.context import build_schema
    from rechorus_tpu.registry import get_model

    corpus = ctr_corpus
    torch.manual_seed(0)
    ref = TorchAFM(ref_args(attention_size=8, reg_weight=2.0), corpus).eval()

    args = argparse.Namespace(emb_size=16, attention_size=8, reg_weight=2.0,
                              loss_n="BCE", dropout=0.0, test_all=0, num_neg=0,
                              model_path="", buffer=1)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {"bank": _port_fm_tables(ref, corpus, build_schema(corpus)),
              "overall_bias": ref.overall_bias.detach().numpy(),
              "attlayer": {"w": {"kernel": sd["attlayer.w.weight"].T},
                           "h": sd["attlayer.h"]},
              "p": sd["p"]}

    tf, feed = _ctr_feed_pair(corpus, 15)
    with torch.no_grad():
        ref_out = ref(tf)
    out = _apply_ported(get_model("AFMCTR").from_args(args, corpus), params, feed)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


def _port_ctx_tables(ref, corpus, schema, attr="context_embedding"):
    """Per-feature context tables (no linear part) -> fused bank."""
    from rechorus_tpu.data.context import is_categorical

    table_dict = getattr(ref, attr)
    d = next(iter(table_dict.values())).weight.shape[-1]
    fused = np.zeros((schema.total_vocab, d), dtype=np.float32)
    bank = {}
    fj = 0
    for name, off in zip(schema.names, schema.offsets):
        if is_categorical(name):
            w = table_dict[name].weight.detach().numpy()
            fused[off: off + w.shape[0]] = w
        else:
            bank[f"float_emb_{fj}"] = {
                "kernel": table_dict[name].weight.detach().numpy().T}
            fj += 1
    bank["fused_table"] = {"embedding": fused}
    return bank


def test_dcn_forward_parity(ctr_corpus):
    """DCN: rank-1 cross network + BatchNorm deep tower in parallel
    (reference DCN.py:64-97)."""
    from models.context.DCN import DCNCTR as TorchDCN

    from rechorus_tpu.data.context import build_schema
    from rechorus_tpu.registry import get_model

    corpus = ctr_corpus
    torch.manual_seed(0)
    ref = TorchDCN(ref_args(layers="[24]", cross_layer_num=2, reg_weight=2.0),
                   corpus).eval()

    args = argparse.Namespace(emb_size=16, layers="[24]", cross_layer_num=2,
                              reg_weight=2.0, loss_n="BCE", dropout=0.0,
                              test_all=0, num_neg=0, model_path="", buffer=1)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {"bank": _port_ctx_tables(ref, corpus, build_schema(corpus)),
              "deep_layers": {
                  "dense_0": {"kernel": sd["deep_layers.mlp.0.weight"].T,
                              "bias": sd["deep_layers.mlp.0.bias"]},
                  "bn_0": {"scale": sd["deep_layers.mlp.1.weight"],
                           "bias": sd["deep_layers.mlp.1.bias"]}},
              "predict_layer": {"kernel": sd["predict_layer.weight"].T,
                                "bias": sd["predict_layer.bias"]}}
    for l in range(2):
        params[f"cross_w_{l}"] = sd[f"cross_layer_w.{l}"]
        params[f"cross_b_{l}"] = sd[f"cross_layer_b.{l}"]

    tf, feed = _ctr_feed_pair(corpus, 16)
    with torch.no_grad():
        ref_out = ref(tf)
    out = _apply_ported(get_model("DCNCTR").from_args(args, corpus), params, feed)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


@pytest.mark.parametrize("mixed,structure", [(1, "parallel"), (0, "stacked")])
def test_dcnv2_forward_parity(ctr_corpus, mixed, structure):
    """DCNv2: full-matrix cross (mixed=0) and low-rank MoE cross (mixed=1)
    x parallel/stacked head (reference DCNv2.py:79-172). The gating Linear
    is per-expert, shared across layers (DCNv2.py:62)."""
    from models.context.DCNv2 import DCNv2CTR as TorchDCNv2

    from rechorus_tpu.data.context import build_schema
    from rechorus_tpu.registry import get_model

    corpus = ctr_corpus
    torch.manual_seed(0)
    L, E = 2, 2
    rargs = ref_args(layers="[24]", cross_layer_num=L, reg_weight=2.0,
                     mixed=mixed, structure=structure, low_rank=8, expert_num=E)
    ref = TorchDCNv2(rargs, corpus).eval()

    args = argparse.Namespace(emb_size=16, layers="[24]", cross_layer_num=L,
                              reg_weight=2.0, mixed=mixed, structure=structure,
                              low_rank=8, expert_num=E, loss_n="BCE", dropout=0.0,
                              test_all=0, num_neg=0, model_path="", buffer=1)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {"bank": _port_ctx_tables(ref, corpus, build_schema(corpus)),
              "deep_layers": {
                  "dense_0": {"kernel": sd["deep_layers.mlp.0.weight"].T,
                              "bias": sd["deep_layers.mlp.0.bias"]},
                  "bn_0": {"scale": sd["deep_layers.mlp.1.weight"],
                           "bias": sd["deep_layers.mlp.1.bias"]}},
              "predict_layer": {"kernel": sd["predict_layer.weight"].T,
                                "bias": sd["predict_layer.bias"]}}
    for l in range(L):
        params[f"cross_b_{l}"] = sd[f"bias.{l}"][:, 0]
        if mixed:
            params[f"cross_u_{l}"] = sd[f"cross_layer_u.{l}"]
            params[f"cross_v_{l}"] = sd[f"cross_layer_v.{l}"]
            params[f"cross_c_{l}"] = sd[f"cross_layer_c.{l}"]
        else:
            params[f"cross_w2_{l}"] = sd[f"cross_layer_w2.{l}"]
    if mixed:
        for e in range(E):
            params[f"gating_{e}"] = {"kernel": sd[f"gating.{e}.weight"].T,
                                     "bias": sd[f"gating.{e}.bias"]}

    tf, feed = _ctr_feed_pair(corpus, 17)
    with torch.no_grad():
        ref_out = ref(tf)
    out = _apply_ported(get_model("DCNv2CTR").from_args(args, corpus), params, feed)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


def test_xdeepfm_forward_parity(ctr_corpus):
    """xDeepFM: FM + deep + CIN. The reference's forward DROPS the CIN
    term from the sum and its CIN loop keeps only the last candidate
    (xDeepFM.py:130-151, documented deviation) -- we fix both, so the
    expectation is rebuilt as sigmoid(ref_fm_deep_logit + ref_cin_logit),
    with the CIN logit computed by the reference's own CIN on the C=1
    feed (where its last-candidate quirk is harmless)."""
    from models.context.xDeepFM import xDeepFMBase as TorchXDFMBase
    from models.context.xDeepFM import xDeepFMCTR as TorchXDFM

    from rechorus_tpu.data.context import build_schema
    from rechorus_tpu.registry import get_model

    corpus = ctr_corpus
    torch.manual_seed(0)
    rargs = ref_args(layers="[24]", cin_layers="[4,4]", direct=0, reg_weight=2.0)
    ref = TorchXDFM(rargs, corpus).eval()

    args = argparse.Namespace(emb_size=16, layers="[24]", cin_layers="[4,4]",
                              direct=0, reg_weight=2.0, loss_n="BCE", dropout=0.0,
                              test_all=0, num_neg=0, model_path="", buffer=1)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {"bank": _port_fm_tables(ref, corpus, build_schema(corpus)),
              "overall_bias": ref.overall_bias.detach().numpy(),
              "deep_layers": _port_mlp_block(sd, "deep_layers", [0, 2]),
              "cin_linear": {"kernel": sd["cin_linear.weight"].T,
                             "bias": sd["cin_linear.bias"]}}
    for i in range(2):
        params[f"cin_w_{i}"] = sd[f"conv1d_list.{i}.weight"][:, :, 0]
        params[f"cin_b_{i}"] = sd[f"conv1d_list.{i}.bias"]

    tf, feed = _ctr_feed_pair(corpus, 18)
    with torch.no_grad():
        raw = TorchXDFMBase.forward(ref, tf)["prediction"]  # fm + deep only
        ctx, _ = ref._get_embeddings_FM(tf)
        cin_out = ref.compreseed_interaction_network(ctx)
        cin_pred = ref.cin_linear(cin_out).squeeze(-1)
        expected = torch.sigmoid(raw[:, 0] + cin_pred).numpy()
    out = _apply_ported(get_model("xDeepFMCTR").from_args(args, corpus), params, feed)
    np.testing.assert_allclose(np.asarray(out["prediction"]), expected, atol=1e-5)


@pytest.mark.parametrize("itype,agg,residual,layers", [
    ("SAM2A", "concat", 0, 1),
    ("SAM2E", "concat", 0, 1),
    ("SAM3A", "weighted_pooling", 1, 1),
    ("SAM3E", "sum_pooling", 1, 2),
])
def test_sam_forward_parity(ctr_corpus, itype, agg, residual, layers):
    """SAM: all four FuxiCTR interaction blocks + aggregation modes
    (reference SAM.py:118-219)."""
    from models.context.SAM import SAMCTR as TorchSAM

    from rechorus_tpu.data.context import build_schema
    from rechorus_tpu.registry import get_model

    corpus = ctr_corpus
    torch.manual_seed(0)
    rargs = ref_args(interaction_type=itype, aggregation=agg,
                     use_residual=residual, num_layers=layers)
    ref = TorchSAM(rargs, corpus).eval()

    args = argparse.Namespace(emb_size=16, interaction_type=itype, aggregation=agg,
                              use_residual=residual, num_layers=layers,
                              loss_n="BCE", dropout=0.0, test_all=0, num_neg=0,
                              model_path="", buffer=1)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    block = {}
    if agg == "weighted_pooling":
        block["agg_weight"] = sd["block.weight"]
    if itype == "SAM2A":
        block["W"] = sd["block.layers.0.W"]
    for i in range(layers if itype in ("SAM3A", "SAM3E") else 0):
        block[f"K_{i}"] = {"kernel": sd[f"block.layers.{i}.K.weight"].T}
        if itype == "SAM3A":
            block[f"W_{i}"] = sd[f"block.layers.{i}.W"]
        if residual:
            block[f"Q_{i}"] = {"kernel": sd[f"block.layers.{i}.Q.weight"].T}
    params = {"bank": _port_ctx_tables(ref, corpus, build_schema(corpus), "embedding_dict"),
              "block": block,
              "output_layer": {"kernel": sd["output_layer.weight"].T,
                               "bias": sd["output_layer.bias"]}}

    tf, feed = _ctr_feed_pair(corpus, 19)
    with torch.no_grad():
        ref_out = ref(tf)
    out = _apply_ported(get_model("SAMCTR").from_args(args, corpus), params, feed)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


@pytest.fixture(scope="module")
def ctr_corpus_nouser(tmp_path_factory):
    """Corpus WITHOUT u_* features: the reference FinalMLP builds tables
    for all context features but its forward only consumes user_id +
    item-side + situation embeddings, so its first MLP layer's in_features
    only matches when there are no u_* columns."""
    from rechorus_tpu import registry
    from rechorus_tpu.data.synthetic import make_ctr_dataset

    root = tmp_path_factory.mktemp("data_nu")
    make_ctr_dataset(str(root / "SynthCTR"))
    args = argparse.Namespace(
        path=str(root), dataset="SynthCTR", sep="\t",
        include_item_features=1, include_user_features=0, include_situation_features=1)
    return registry.get_reader("ContextReader")(args)


@pytest.mark.parametrize("fs1", ["", "c_hour_c"])
def test_finalmlp_forward_parity(ctr_corpus_nouser, fs1):
    """FinalMLP: two-stream MLPs + feature-selection gates + bilinear
    multi-head fusion (reference FinalMLP.py:77-103,141-249). The
    reference flattens features as [user_id, i_*, item_id, c_*] while our
    bank is canonical [i_*, c_*, user_id, item_id]; the permutation is
    absorbed into the first MLP kernels / gate-head outputs."""
    from models.context.FinalMLP import FinalMLPCTR as TorchFinalMLP

    from rechorus_tpu.data.context import build_schema
    from rechorus_tpu.registry import get_model

    corpus = ctr_corpus_nouser
    torch.manual_seed(0)
    d = 16
    rargs = ref_args(mlp1_hidden_units="[24,12]", mlp1_hidden_activations="ReLU",
                     mlp1_dropout=0.0, mlp1_batch_norm=0,
                     mlp2_hidden_units="[18]", mlp2_hidden_activations="ReLU",
                     mlp2_dropout=0.0, mlp2_batch_norm=0,
                     use_fs=1, fs_hidden_units="[10]", fs1_context=fs1,
                     fs2_context="", num_heads=2)
    ref = TorchFinalMLP(rargs, corpus).eval()

    args = argparse.Namespace(emb_size=d, mlp1_hidden_units="[24,12]",
                              mlp1_hidden_activations="ReLU", mlp1_dropout=0.0,
                              mlp1_batch_norm=0, mlp2_hidden_units="[18]",
                              mlp2_hidden_activations="ReLU", mlp2_dropout=0.0,
                              mlp2_batch_norm=0, use_fs=1, fs_hidden_units="[10]",
                              fs1_context=fs1, fs2_context="", num_heads=2,
                              loss_n="BCE", dropout=0.0, test_all=0, num_neg=0,
                              model_path="", buffer=1)
    schema = build_schema(corpus)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    # reference X order vs our canonical order, as emb_size-blocks
    ref_order = (["user_id"]
                 + [f for f in corpus.item_feature_names] + ["item_id"]
                 + list(corpus.situation_feature_names))
    perm = [ref_order.index(n) for n in schema.names]  # ours[j] = ref[perm[j]]

    def permute_in(kernel):  # [in, out] rows are d-blocks in ref order
        blocks = kernel.reshape(len(perm), d, -1)
        return blocks[perm].reshape(kernel.shape)

    def permute_out(kernel, bias):  # head producing a gate over ref order
        kb = kernel.reshape(kernel.shape[0], len(perm), d)[:, perm]
        bb = bias.reshape(len(perm), d)[perm]
        return kb.reshape(kernel.shape), bb.reshape(bias.shape)

    g1k, g1b = permute_out(sd["fs_module.fs1_gate.mlp.2.weight"].T,
                           sd["fs_module.fs1_gate.mlp.2.bias"])
    g2k, g2b = permute_out(sd["fs_module.fs2_gate.mlp.2.weight"].T,
                           sd["fs_module.fs2_gate.mlp.2.bias"])
    params = {"bank": _port_ctx_tables(ref, corpus, schema, "embedding_dict"),
              "mlp1": {"dense_0": {"kernel": permute_in(sd["mlp1.mlp.0.weight"].T),
                                   "bias": sd["mlp1.mlp.0.bias"]},
                       "dense_1": {"kernel": sd["mlp1.mlp.2.weight"].T,
                                   "bias": sd["mlp1.mlp.2.bias"]}},
              "mlp2": {"dense_0": {"kernel": permute_in(sd["mlp2.mlp.0.weight"].T),
                                   "bias": sd["mlp2.mlp.0.bias"]}},
              "fs1_gate": {"dense_0": {"kernel": sd["fs_module.fs1_gate.mlp.0.weight"].T,
                                       "bias": sd["fs_module.fs1_gate.mlp.0.bias"]},
                           "head": {"kernel": g1k, "bias": g1b}},
              "fs2_gate": {"dense_0": {"kernel": sd["fs_module.fs2_gate.mlp.0.weight"].T,
                                       "bias": sd["fs_module.fs2_gate.mlp.0.bias"]},
                           "head": {"kernel": g2k, "bias": g2b}},
              "fs2_ctx_bias": sd["fs_module.fs2_ctx_bias"],
              "w_x": {"kernel": sd["fusion_module.w_x.weight"].T,
                      "bias": sd["fusion_module.w_x.bias"]},
              "w_y": {"kernel": sd["fusion_module.w_y.weight"].T,
                      "bias": sd["fusion_module.w_y.bias"]},
              "w_xy": sd["fusion_module.w_xy"].reshape(2, 12 // 2, 18 // 2)}
    if fs1:
        params["fs1_emb_0"] = {"embedding": sd["fs_module.fs1_ctx_emb.0.weight"]}
    else:
        params["fs1_ctx_bias"] = sd["fs_module.fs1_ctx_bias"]

    tf, feed = _ctr_feed_pair(corpus, 20)
    with torch.no_grad():
        ref_out = ref(tf)
    out = _apply_ported(get_model("FinalMLPCTR").from_args(args, corpus), params, feed)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


# --------------------------------------------------------------------- #
def _port_group_tables(ref, corpus, schema, attr="embedding_dict"):
    """Per-feature tables -> the top-level fused_table / float_{name}
    params used by group_embeddings models (DIN/DIEN/CAN/ETA/SDIM)."""
    from rechorus_tpu.data.context import is_categorical

    table_dict = getattr(ref, attr)
    d = next(iter(table_dict.values())).weight.shape[-1]
    fused = np.zeros((schema.total_vocab, d), dtype=np.float32)
    out = {}
    for name, off in zip(schema.names, schema.offsets):
        if is_categorical(name):
            w = table_dict[name].weight.detach().numpy()
            fused[off: off + w.shape[0]] = w
        else:
            out[f"float_{name}"] = {
                "kernel": table_dict[name].weight.detach().numpy().T}
    out["fused_table"] = {"embedding": fused}
    return out


def _port_attentional_gru(sd, prefix, cell=True):
    """Reference AGRU/AUGRU cell (chunk order u,r,n; DIEN.py:325-369) or
    nn.GRU (order r,z,n; AIGRU path) -> our AttentionalGRU wx/wh/bx/bh
    in torch-GRU order (r,z,n)."""
    if cell:
        wx, wh = sd[f"{prefix}.gru_cell.x2h.weight"], sd[f"{prefix}.gru_cell.h2h.weight"]
        bx, bh = sd[f"{prefix}.gru_cell.x2h.bias"], sd[f"{prefix}.gru_cell.h2h.bias"]
        Hs = wx.shape[0] // 3
        reorder = lambda m: np.concatenate([m[Hs:2 * Hs], m[:Hs], m[2 * Hs:]], axis=0)
        wx, wh, bx, bh = reorder(wx), reorder(wh), reorder(bx), reorder(bh)
    else:
        wx, wh = sd[f"{prefix}.weight_ih_l0"], sd[f"{prefix}.weight_hh_l0"]
        bx, bh = sd[f"{prefix}.bias_ih_l0"], sd[f"{prefix}.bias_hh_l0"]
    return {"wx": wx.T, "wh": wh.T, "bias_x": bx, "bias_h": bh}


def _patch_paper_attention(ref):
    """Replace the reference's target_attention (softmax over the BATCH
    axis of a [B*C, H] tensor, DIEN.py:122 -- a latent bug vs the
    paper/FuxiCTR) with the paper-correct masked softmax over history."""

    def fixed_attention(self, target_emb, interest_emb, lengths):
        bsz = interest_emb.shape[0]
        proj = torch.bmm(interest_emb, self.attentionW.unsqueeze(0).repeat(bsz, 1, 1))
        prod = (proj * target_emb.unsqueeze(1)).sum(-1)  # [B*C, H]
        mask = torch.arange(prod.shape[1])[None, :] < lengths[:, None]
        return prod.masked_fill(~mask, -1e9).softmax(dim=-1)

    ref.target_attention = types.MethodType(fixed_attention, ref)


@pytest.mark.parametrize("gru_type", ["AGRU", "AUGRU", "AIGRU"])
def test_dien_forward_parity(ctr_corpus, gru_type):
    """DIEN: extractor GRU + target attention + evolving AGRU/AUGRU/AIGRU
    + FCN (reference DIEN.py:108-171). The reference's target_attention
    softmaxes dim=-2 -- the flattened BATCH axis of a [B*C, H] tensor
    (DIEN.py:122), a latent bug vs the paper/FuxiCTR that our model fixes
    (masked softmax over the history axis); the test monkeypatches the
    paper-correct attention onto the torch model and then requires exact
    parity, which pins the GRU ports, the (u,r,n)->(r,z,n) gate mapping,
    and the FCN input assembly."""
    from models.context_seq.DIEN import DIENTopK as TorchDIEN

    from rechorus_tpu.registry import get_model

    corpus = ctr_corpus
    torch.manual_seed(0)
    rargs = ref_args(evolving_gru_type=gru_type, fcn_hidden_layers="[24]",
                     fcn_activations="ReLU", aux_hidden_layers="[16]",
                     aux_activations="ReLU", alpha_aux=0,
                     add_historical_situations=0, history_max=5)
    ref = TorchDIEN(rargs, corpus).eval()
    _patch_paper_attention(ref)

    args = argparse.Namespace(emb_size=16, evolving_gru_type=gru_type,
                              fcn_hidden_layers="[24]", fcn_activations="ReLU",
                              aux_hidden_layers="[16]", aux_activations="ReLU",
                              alpha_aux=0.0, add_historical_situations=0,
                              history_max=5, loss_n="BPR", dropout=0.0,
                              test_all=0, num_neg=1, model_path="", buffer=1)
    model = get_model("DIENTopK").from_args(args, corpus)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    from rechorus_tpu.data.context import build_schema
    params = {**_port_group_tables(ref, corpus, build_schema(corpus)),
              "gru": _port_gru(sd, "gru"),
              "attentionW": sd["attentionW"],
              "evolving_gru": _port_attentional_gru(sd, "evolving_gru",
                                                    cell=gru_type != "AIGRU"),
              "fcn_net": _port_mlp_block(sd, "fcn_net", [0, 2])}

    tf, feed, _ = _ctxseq_feed_pair(corpus, 21, H=5)
    with torch.no_grad():
        ref_out = ref(tf)
    out = _apply_ported(model, params, feed)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=2e-5)


def _ctxseq_feed_pair(corpus, seed, B=6, C=3, H=8, full_lengths=False):
    """Aligned context-seq feeds for both frameworks."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    n_users, n_items = corpus.n_users, corpus.n_items
    users = rng.integers(1, n_users, size=B).astype(np.int32)
    items = rng.integers(1, n_items, size=(B, C)).astype(np.int32)
    if full_lengths:
        lengths = np.full(B, H, np.int32)
    else:
        lengths = rng.integers(1, H + 1, size=B).astype(np.int32)
    hist = np.zeros((B, H), dtype=np.int32)
    for b in range(B):
        hist[b, : lengths[b]] = rng.integers(1, n_items, size=lengths[b])
    hours = rng.integers(0, 24, size=B).astype(np.int32)

    def ifeat(ids, c):
        flat = np.asarray([corpus.item_features[i][c] if i > 0 else 0 for i in ids.ravel()])
        return flat.reshape(ids.shape)

    tf = {"user_id": t(users), "item_id": t(items), "lengths": t(lengths),
          "history_item_id": t(hist), "c_hour_c": t(hours), "phase": "test"}
    for c in corpus.user_feature_names:
        tf[c] = t(np.asarray([corpus.user_features[u][c] for u in users]))
    for c in corpus.item_feature_names:
        tf[c] = t(ifeat(items, c))
        tf["history_" + c] = t(ifeat(hist, c))
    feed = {"user_id": jnp.asarray(users), "item_id": jnp.asarray(items),
            "history_items": jnp.asarray(hist), "lengths": jnp.asarray(lengths),
            "situ_cat": jnp.asarray(hours[:, None]),
            "situ_float": jnp.zeros((B, 0), jnp.float32)}
    return tf, feed, lengths


def _port_mhta(sd, prefix):
    return {n: {"kernel": sd[f"{prefix}.{n}.weight"].T}
            for n in ("W_q", "W_k", "W_v", "W_o")}


def test_eta_forward_parity(ctr_corpus):
    """ETA: short-window target attention + SimHash top-k retrieval over
    the long window (reference ETA.py:165-278). All lengths == H so the
    reference's reversed-arange masks coincide with our recency masks on
    left-aligned sequences (documented deviation, eta.py:9-13), and
    retrieval_k == H so the retrieved SET is identical regardless of
    torch.topk vs lax.top_k tie-breaking (attention is order-invariant)."""
    from models.context_seq.ETA import ETATopK as TorchETA

    from rechorus_tpu.data.context import build_schema
    from rechorus_tpu.registry import get_model

    corpus = ctr_corpus
    H = 8
    torch.manual_seed(0)
    rargs = ref_args(dnn_hidden_units="[24]", dnn_activations="ReLU",
                     net_dropout=0.0, batch_norm=0, attention_dim=16,
                     num_heads=2, use_scale=1, attention_dropout=0.0,
                     use_qkvo=1, retrieval_k=H, reuse_hash=1, num_hashes=2,
                     hash_bits=8, short_target_field='["item_id"]',
                     short_sequence_field='["history_item_id"]',
                     long_target_field='["item_id"]',
                     long_sequence_field='["history_item_id"]',
                     recent_k=3, add_historical_situations=0, history_max=H)
    ref = TorchETA(rargs, corpus).eval()

    args = argparse.Namespace(emb_size=16, dnn_hidden_units="[24]",
                              dnn_activations="ReLU", net_dropout=0.0,
                              batch_norm=0, attention_dim=16, num_heads=2,
                              use_scale=1, attention_dropout=0.0, use_qkvo=1,
                              retrieval_k=H, reuse_hash=1, num_hashes=2,
                              hash_bits=8, short_target_field='["item_id"]',
                              short_sequence_field='["history_item_id"]',
                              long_target_field='["item_id"]',
                              long_sequence_field='["history_item_id"]',
                              recent_k=3, add_historical_situations=0,
                              history_max=H, loss_n="BPR", dropout=0.0,
                              test_all=0, num_neg=1, model_path="", buffer=1,
                              # parity runs pin the reference-faithful
                              # retrieval explicitly (ADVICE r4); with
                              # retrieval_k == H the retrieved SET is
                              # identical either way, but the pin keeps
                              # this suite comparing like-for-like
                              ref_retrieval=1)
    model = get_model("ETATopK").from_args(args, corpus)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {**_port_group_tables(ref, corpus, build_schema(corpus)),
              "short_attention_0": _port_mhta(sd, "short_attention.0"),
              "long_attention_0": _port_mhta(sd, "long_attention.0"),
              "dnn": _port_mlp_block(sd, "dnn", [0, 2])}
    consts = {"random_rotations_0": sd["random_rotations.0"]}

    tf, feed, _ = _ctxseq_feed_pair(corpus, 23, H=H, full_lengths=True)
    with torch.no_grad():
        ref_out = ref(tf)

    import jax

    variables = model.init({"params": jax.random.key(0)}, feed, training=False)
    extra = {k: v for k, v in variables.items() if k != "params"}
    extra["constants"] = {**extra.get("constants", {}), **consts}
    out = model.apply({"params": params, **extra}, feed, training=False)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


def test_sdim_forward_parity(ctr_corpus):
    """SDIM: short target attention + LSH bucket-collision pooling over
    the long window (reference SDIM.py:79-130). The reference's collision
    sum runs over the FULL history (pads and the short window included,
    no mask, SDIM.py:114-131); ours applies the long mask -- the paper's
    sampling-from-long-term-history semantics -- so the test monkeypatches
    a masked (einsum) collision pooling onto the torch model; the hash
    functions, rotations and all weights stay the reference's."""
    from models.context_seq.SDIM import SDIMTopK as TorchSDIM

    from rechorus_tpu.data.context import build_schema
    from rechorus_tpu.registry import get_model

    corpus = ctr_corpus
    H = 8
    torch.manual_seed(0)
    rargs = ref_args(dnn_hidden_units="[24]", dnn_activations="ReLU",
                     net_dropout=0.0, batch_norm=0, attention_dim=16,
                     num_heads=2, use_scale=1, attention_dropout=0.0,
                     use_qkvo=1, retrieval_k=5, reuse_hash=1, num_hashes=2,
                     hash_bits=4, short_target_field='["item_id"]',
                     short_sequence_field='["history_item_id"]',
                     long_target_field='["item_id"]',
                     long_sequence_field='["history_item_id"]',
                     recent_k=3, add_historical_situations=0, history_max=H)
    ref = TorchSDIM(rargs, corpus).eval()

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

    ref.long_interest_attention = types.MethodType(masked_long, ref)

    args = argparse.Namespace(emb_size=16, dnn_hidden_units="[24]",
                              dnn_activations="ReLU", net_dropout=0.0,
                              batch_norm=0, attention_dim=16, num_heads=2,
                              use_scale=1, attention_dropout=0.0, use_qkvo=1,
                              retrieval_k=5, reuse_hash=1, num_hashes=2,
                              hash_bits=4, short_target_field='["item_id"]',
                              short_sequence_field='["history_item_id"]',
                              long_target_field='["item_id"]',
                              long_sequence_field='["history_item_id"]',
                              recent_k=3, add_historical_situations=0,
                              history_max=H, loss_n="BPR", dropout=0.0,
                              test_all=0, num_neg=1, model_path="", buffer=1)
    model = get_model("SDIMTopK").from_args(args, corpus)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {**_port_group_tables(ref, corpus, build_schema(corpus)),
              "short_attention_0": _port_mhta(sd, "short_attention.0"),
              "dnn": _port_mlp_block(sd, "dnn", [0, 2])}
    consts = {"random_rotations_0": sd["random_rotations.0"]}

    tf, feed, _ = _ctxseq_feed_pair(corpus, 24, H=H, full_lengths=True)
    with torch.no_grad():
        ref_out = ref(tf)

    import jax

    variables = model.init({"params": jax.random.key(0)}, feed, training=False)
    extra = {k: v for k, v in variables.items() if k != "params"}
    extra["constants"] = {**extra.get("constants", {}), **consts}
    out = model.apply({"params": params, **extra}, feed, training=False)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


def test_can_forward_parity(ctr_corpus):
    """CAN: the target item's induce embedding reshaped into per-item
    micro-MLP weights applied to user / situation / history embeddings
    (tanh, masked mean over history), concatenated with the DIEN input
    (reference CAN.py:55-140). Same patched target attention as the DIEN
    test (reference softmaxes over the batch axis, documented deviation)."""
    from models.context_seq.CAN import CANTopK as TorchCAN

    from rechorus_tpu.data.context import build_schema
    from rechorus_tpu.registry import get_model

    corpus = ctr_corpus
    torch.manual_seed(0)
    rargs = ref_args(evolving_gru_type="AGRU", fcn_hidden_layers="[24]",
                     fcn_activations="ReLU", aux_hidden_layers="[16]",
                     aux_activations="ReLU", alpha_aux=0,
                     add_historical_situations=0, history_max=5,
                     induce_vec_size=96, orders=1, co_action_layers="[4,4]")
    ref = TorchCAN(rargs, corpus).eval()
    _patch_paper_attention(ref)

    args = argparse.Namespace(emb_size=16, evolving_gru_type="AGRU",
                              fcn_hidden_layers="[24]", fcn_activations="ReLU",
                              aux_hidden_layers="[16]", aux_activations="ReLU",
                              alpha_aux=0.0, add_historical_situations=0,
                              induce_vec_size=96, orders=1, co_action_layers="[4,4]",
                              history_max=5, loss_n="BPR", dropout=0.0,
                              test_all=0, num_neg=1, model_path="", buffer=1)
    model = get_model("CANTopK").from_args(args, corpus)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {**_port_group_tables(ref, corpus, build_schema(corpus)),
              "gru": _port_gru(sd, "gru"),
              "attentionW": sd["attentionW"],
              "evolving_gru": _port_attentional_gru(sd, "evolving_gru", cell=True),
              "item_embedding_induce": {"embedding": sd["item_embedding_induce.weight"]},
              "fcn_net": _port_mlp_block(sd, "fcn_net", [0, 2])}

    tf, feed, _ = _ctxseq_feed_pair(corpus, 22, H=5)
    with torch.no_grad():
        ref_out = ref(tf)
    out = _apply_ported(model, params, feed)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=2e-5)


# --------------------------------------------------------------------- #
def test_srgnn_forward_parity():
    """SRGNN: per-row session graph (unique nodes, degree-normalized
    in/out adjacency) + gated GNN + soft attention readout (reference
    SRGNN.py:43-101). Row 0 of the torch table is zeroed first: the
    reference's post-init uniform_ loop overwrites nn.Embedding's zeroed
    padding row (SRGNN.py:30-32 vs padding_idx=0 at :36), so its pads
    embed to a random frozen vector; our model enforces the declared
    padding_idx=0 semantics (srgnn.py:122)."""
    from models.developing.SRGNN import SRGNN as TorchSRGNN

    from rechorus_tpu.registry import get_model

    n_users, n_items, H = 30, 50, 8
    corpus = types.SimpleNamespace(n_users=n_users, n_items=n_items)
    torch.manual_seed(0)
    ref = TorchSRGNN(ref_args(num_layers=1), corpus).eval()
    with torch.no_grad():
        ref.i_embeddings.weight[0] = 0.0

    model = get_model("SRGNN")(user_num=n_users, item_num=n_items, emb_size=16,
                               num_layers=1, dropout=0.0, history_max=H)
    import jax.numpy as _jnp

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "i_embeddings": _jnp.asarray(sd["i_embeddings.weight"]),
        "gnn": {"w_ih": sd["gnn.w_ih"].T, "w_hh": sd["gnn.w_hh"].T,
                "b_ih": sd["gnn.b_ih"], "b_hh": sd["gnn.b_hh"],
                "b_iah": sd["gnn.b_iah"], "b_ioh": sd["gnn.b_ioh"],
                "linear_edge_in": {"kernel": sd["gnn.linear_edge_in.weight"].T,
                                   "bias": sd["gnn.linear_edge_in.bias"]},
                "linear_edge_out": {"kernel": sd["gnn.linear_edge_out.weight"].T,
                                    "bias": sd["gnn.linear_edge_out.bias"]}},
        "linear1": {"kernel": sd["linear1.weight"].T, "bias": sd["linear1.bias"]},
        "linear2": {"kernel": sd["linear2.weight"].T, "bias": sd["linear2.bias"]},
        "linear3": {"kernel": sd["linear3.weight"].T},
        "linear_transform": {"kernel": sd["linear_transform.weight"].T,
                             "bias": sd["linear_transform.bias"]},
    }

    rng = np.random.default_rng(35)
    users, items, hist, lengths = _seq_feed(rng, n_users, n_items, H)
    with torch.no_grad():
        ref_out = ref({"item_id": t(items), "history_items": t(hist),
                       "lengths": t(lengths), "user_id": t(users),
                       "batch_size": 6, "phase": "test"})
    import jax.numpy as jnp

    feed = {"user_id": jnp.asarray(users), "item_id": jnp.asarray(items),
            "history_items": jnp.asarray(hist), "lengths": jnp.asarray(lengths)}
    out = model.apply({"params": params}, feed, training=False)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


@pytest.mark.parametrize("name", ["CLRec", "S3Rec"])
def test_bert4rec_backbone_forward_parity(name):
    """CLRec / S3Rec inference: both score dot(BERT4Rec(history), item)
    (reference CLRec.py:38-58, S3Rec.py:94-103); their training-time
    losses (contrastive / MIP+SP) are exercised elsewhere."""
    if name == "CLRec":
        from models.developing.CLRec import CLRec as TorchModel
    else:
        from models.developing.S3Rec import S3Rec as TorchModel

    from rechorus_tpu.registry import get_model

    n_users, n_items, H = 30, 50, 8
    corpus = types.SimpleNamespace(n_users=n_users, n_items=n_items, dataset="Synth")
    torch.manual_seed(0)
    extra = dict(temp=0.2) if name == "CLRec" else dict(
        mip_weight=0.2, sp_weight=0.5, mask_ratio=0.2, stage=0)
    ref = TorchModel(ref_args(**extra), corpus).eval()

    kwargs = dict(user_num=n_users, item_num=n_items, emb_size=16,
                  dropout=0.0, history_max=H)
    if name == "S3Rec":
        kwargs.update(stage=0)
    model = get_model(name)(**kwargs)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "i_embeddings": {"embedding": sd["i_embeddings.weight"]},
        "encoder": {
            "p_embeddings": {"embedding": sd["encoder.p_embeddings.weight"]},
            "trm_0": _port_trm(sd, "encoder.transformer_block.0"),
            "trm_1": _port_trm(sd, "encoder.transformer_block.1"),
        },
    }
    if name == "S3Rec":  # input LayerNorm variant (S3Rec.py:193,205)
        params["encoder"]["layer_norm"] = {"scale": sd["encoder.layer_norm.weight"],
                                           "bias": sd["encoder.layer_norm.bias"]}

    rng = np.random.default_rng(36)
    users, items, hist, lengths = _seq_feed(rng, n_users, n_items, H)
    with torch.no_grad():
        ref_out = ref({"item_id": t(items), "history_items": t(hist),
                       "lengths": t(lengths), "user_id": t(users),
                       "batch_size": 6, "phase": "test"})
    import jax.numpy as jnp

    feed = {"user_id": jnp.asarray(users), "item_id": jnp.asarray(items),
            "history_items": jnp.asarray(hist), "lengths": jnp.asarray(lengths)}
    out = model.apply({"params": params}, feed, training=False)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


def test_fourierta_forward_parity():
    """FourierTA: MLP target attention scaled by a learnable inverse-DFT
    temporal decay + FFN/LayerNorm residual (reference
    FourierTA.py:44-120)."""
    from models.developing.FourierTA import FourierTA as TorchFourierTA

    from rechorus_tpu.registry import get_model

    n_users, n_items, H, d = 30, 50, 8, 16
    corpus = types.SimpleNamespace(n_users=n_users, n_items=n_items)
    torch.manual_seed(0)
    ref = TorchFourierTA(ref_args(t_scalar=60), corpus).eval()

    model = get_model("FourierTA")(user_num=n_users, item_num=n_items, emb_size=d,
                                   t_scalar=60, dropout=0.0, history_max=H)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "user_embeddings": sd["user_embeddings.weight"],
        "item_embeddings": sd["item_embeddings.weight"],
        "item_bias": sd["item_bias.weight"],
        "freq_real": sd["fourier_attn.freq_real"],
        "freq_imag": sd["fourier_attn.freq_imag"],
        "A": {"kernel": sd["fourier_attn.A.weight"].T, "bias": sd["fourier_attn.A.bias"]},
        "A_out": {"kernel": sd["fourier_attn.A_out.weight"].T},
        "W1": {"kernel": sd["W1.weight"].T, "bias": sd["W1.bias"]},
        "W2": {"kernel": sd["W2.weight"].T, "bias": sd["W2.bias"]},
        "layer_norm": {"scale": sd["layer_norm.weight"], "bias": sd["layer_norm.bias"]},
    }

    rng = np.random.default_rng(37)
    users, items, hist, lengths = _seq_feed(rng, n_users, n_items, H)
    delta_t = rng.uniform(0.0, 4.0, size=(6, H)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref({"item_id": t(items), "history_items": t(hist),
                       "history_delta_t": t(delta_t), "lengths": t(lengths),
                       "user_id": t(users), "batch_size": 6, "phase": "test"})
    import jax.numpy as jnp

    feed = {"user_id": jnp.asarray(users), "item_id": jnp.asarray(items),
            "history_items": jnp.asarray(hist), "lengths": jnp.asarray(lengths),
            "history_delta_t": jnp.asarray(delta_t)}
    out = model.apply({"params": params}, feed, training=False)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


# --------------------------------------------------------------------- #
def _rerank_attrs():
    return dict(item_num=50, train_max_pos_item=2, train_max_neg_item=6,
                test_max_pos_item=2, test_max_neg_item=6, ranker_emb_size=8)


def _rerank_feed(rng, B=4, L=8, ranker_d=8):
    """Shared reranker feed: candidate ids, frozen-ranker u_v/i_v vectors,
    score-rank positions, padding mask (True = pad)."""
    items = rng.integers(1, 50, size=(B, L)).astype(np.int32)
    u_v = rng.normal(size=(B, L, ranker_d)).astype(np.float32)
    i_v = rng.normal(size=(B, L, ranker_d)).astype(np.float32)
    position = np.tile(np.arange(L, dtype=np.int32), (B, 1))
    pad = np.zeros((B, L), bool)
    pad[0, -2:] = True
    pad[2, -1:] = True
    return items, u_v, i_v, position, pad


def _port_torch_tel(sd, prefix):
    """torch nn.TransformerEncoderLayer -> our TransformerLayer(out_proj)."""
    w = sd[f"{prefix}.self_attn.in_proj_weight"]
    b = sd[f"{prefix}.self_attn.in_proj_bias"]
    D = w.shape[1]
    return {
        "mha": {
            "q": {"kernel": w[:D].T, "bias": b[:D]},
            "k": {"kernel": w[D:2 * D].T, "bias": b[D:2 * D]},
            "v": {"kernel": w[2 * D:].T, "bias": b[2 * D:]},
            "out_proj": {"kernel": sd[f"{prefix}.self_attn.out_proj.weight"].T,
                         "bias": sd[f"{prefix}.self_attn.out_proj.bias"]},
        },
        "ln1": {"scale": sd[f"{prefix}.norm1.weight"], "bias": sd[f"{prefix}.norm1.bias"]},
        "ff1": {"kernel": sd[f"{prefix}.linear1.weight"].T, "bias": sd[f"{prefix}.linear1.bias"]},
        "ff2": {"kernel": sd[f"{prefix}.linear2.weight"].T, "bias": sd[f"{prefix}.linear2.bias"]},
        "ln2": {"scale": sd[f"{prefix}.norm2.weight"], "bias": sd[f"{prefix}.norm2.bias"]},
    }


def test_prm_forward_parity():
    """PRM: [item emb | ranker u_v | ranker i_v] + ordinal position emb ->
    transformer encoder stack with key-padding mask -> linear head
    (reference PRM.py:29-101). The torch side instantiates PRMBase through
    a shim module (the real RerankModel.__init__ loads a ranker checkpoint
    from disk, orthogonal to the forward being pinned here)."""
    from models.BaseModel import BaseModel as TorchBaseModel
    from models.reranker.PRM import PRMBase as TorchPRMBase

    from rechorus_tpu.registry import get_model

    class RefPRM(torch.nn.Module, TorchPRMBase):
        init_weights = staticmethod(TorchBaseModel.init_weights)

        def __init__(self, rargs):
            torch.nn.Module.__init__(self)
            self.__dict__.update(_rerank_attrs())
            self._base_init(rargs, None)

        def forward(self, fd):
            return TorchPRMBase.forward(self, fd)

    torch.manual_seed(0)
    rargs = ref_args(n_blocks=2, num_heads=2, num_hidden_unit=16)
    ref = RefPRM(rargs).eval()

    attrs = {k: v for k, v in _rerank_attrs().items() if k != "item_num"}
    model = get_model("PRMGeneral")(
        user_num=30, item_num=50, emb_size=16, n_blocks=2, num_heads=2,
        num_hidden_unit=16, dropout=0.0, **attrs)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "i_embeddings": {"embedding": sd["i_embeddings.weight"]},
        "ordinal_position_embedding": {
            "embedding": sd["ordinal_position_embedding.weight"]},
        "rFF0": {"kernel": sd["rFF0.weight"].T, "bias": sd["rFF0.bias"]},
        "rFF1": {"kernel": sd["rFF1.weight"].T, "bias": sd["rFF1.bias"]},
    }
    for k in range(2):
        params[f"encoder_{k}"] = _port_torch_tel(sd, f"encoder.{k}")

    rng = np.random.default_rng(38)
    items, u_v, i_v, position, pad = _rerank_feed(rng)
    with torch.no_grad():
        ref_out = ref({"item_id": t(items), "u_v": t(u_v), "i_v": t(i_v),
                       "position": t(position),
                       "padding_mask": torch.from_numpy(pad)})
    import jax.numpy as jnp

    feed = {"item_id": jnp.asarray(items), "u_v": jnp.asarray(u_v),
            "i_v": jnp.asarray(i_v), "position": jnp.asarray(position),
            "padding_mask": jnp.asarray(pad)}
    out = model.apply({"params": params}, feed, training=False)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


def _port_torch_mab(sd, prefix):
    """torch MAB (SetRank.py:29-56) -> our MAB submodule params."""
    w = sd[f"{prefix}.attn.in_proj_weight"]
    b = sd[f"{prefix}.attn.in_proj_bias"]
    D = w.shape[1]
    return {
        "attn": {
            "q": {"kernel": w[:D].T, "bias": b[:D]},
            "k": {"kernel": w[D:2 * D].T, "bias": b[D:2 * D]},
            "v": {"kernel": w[2 * D:].T, "bias": b[2 * D:]},
            "out_proj": {"kernel": sd[f"{prefix}.attn.out_proj.weight"].T,
                         "bias": sd[f"{prefix}.attn.out_proj.bias"]},
        },
        "norm1": {"scale": sd[f"{prefix}.norm1.weight"], "bias": sd[f"{prefix}.norm1.bias"]},
        "linear1": {"kernel": sd[f"{prefix}.linear1.weight"].T, "bias": sd[f"{prefix}.linear1.bias"]},
        "linear2": {"kernel": sd[f"{prefix}.linear2.weight"].T, "bias": sd[f"{prefix}.linear2.bias"]},
        "norm2": {"scale": sd[f"{prefix}.norm2.weight"], "bias": sd[f"{prefix}.norm2.bias"]},
    }


@pytest.mark.parametrize("setrank_type", ["MSAB", "IMSAB"])
def test_setrank_forward_parity(setrank_type):
    """SetRank: multihead set-attention blocks (MSAB) / induced set
    attention with 20 inducing points (IMSAB), position embedding added
    AFTER rFF0 (reference SetRank.py:57-156)."""
    from models.BaseModel import BaseModel as TorchBaseModel
    from models.reranker.SetRank import SetRankBase as TorchSetRankBase

    from rechorus_tpu.registry import get_model

    class RefSetRank(torch.nn.Module, TorchSetRankBase):
        init_weights = staticmethod(TorchBaseModel.init_weights)

        def __init__(self, rargs):
            torch.nn.Module.__init__(self)
            self.__dict__.update(_rerank_attrs())
            self._base_init(rargs, None)

        def forward(self, fd):
            return TorchSetRankBase.forward(self, fd)

    torch.manual_seed(0)
    rargs = ref_args(n_blocks=2, num_heads=2, num_hidden_unit=16,
                     setrank_type=setrank_type)
    ref = RefSetRank(rargs).eval()

    attrs = {k: v for k, v in _rerank_attrs().items() if k != "item_num"}
    model = get_model("SetRankGeneral")(
        user_num=30, item_num=50, emb_size=16, n_blocks=2, num_heads=2,
        num_hidden_unit=16, setrank_type=setrank_type, dropout=0.0, **attrs)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "i_embeddings": {"embedding": sd["i_embeddings.weight"]},
        "ordinal_position_embedding": {
            "embedding": sd["ordinal_position_embedding.weight"]},
        "rFF0": {"kernel": sd["rFF0.weight"].T, "bias": sd["rFF0.bias"]},
        "rFF1": {"kernel": sd["rFF1.weight"].T, "bias": sd["rFF1.bias"]},
    }
    for k in range(2):
        if setrank_type == "MSAB":
            params[f"msab_{k}"] = _port_torch_mab(sd, f"encoder.{k}.MAB1")
        else:
            params[f"imsab_{k}_1"] = _port_torch_mab(sd, f"encoder.{k}.MAB1")
            params[f"imsab_{k}_2"] = _port_torch_mab(sd, f"encoder.{k}.MAB2")
            params[f"inducing_{k}"] = sd[f"encoder.{k}.I"]

    rng = np.random.default_rng(39)
    items, u_v, i_v, position, pad = _rerank_feed(rng)
    with torch.no_grad():
        ref_out = ref({"item_id": t(items), "u_v": t(u_v), "i_v": t(i_v),
                       "position": t(position),
                       "padding_mask": torch.from_numpy(pad)})
    import jax.numpy as jnp

    feed = {"item_id": jnp.asarray(items), "u_v": jnp.asarray(u_v),
            "i_v": jnp.asarray(i_v), "position": jnp.asarray(position),
            "padding_mask": jnp.asarray(pad)}
    out = model.apply({"params": params}, feed, training=False)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)


def _port_torch_lstm_dir(sd, prefix, suffix=""):
    """One direction of a torch LSTM (packed gate rows i,f,g,o; separate
    ih/hh biases) -> flax OptimizedLSTMCell (input kernels without bias,
    recurrent kernels carrying b_ih + b_hh)."""
    wi = sd[f"{prefix}.weight_ih_l0{suffix}"]
    wh = sd[f"{prefix}.weight_hh_l0{suffix}"]
    bi = sd[f"{prefix}.bias_ih_l0{suffix}"]
    bh = sd[f"{prefix}.bias_hh_l0{suffix}"]
    H = wh.shape[1]
    out = {}
    for j, g in enumerate("ifgo"):
        out[f"i{g}"] = {"kernel": wi[j * H:(j + 1) * H].T}
        out[f"h{g}"] = {"kernel": wh[j * H:(j + 1) * H].T,
                        "bias": bi[j * H:(j + 1) * H] + bh[j * H:(j + 1) * H]}
    return out


def test_mir_forward_parity():
    """MIR: intra-set MHA over candidates + intra-list BiLSTM over the
    history + SLAttention set<->list co-attention with learned time decay
    + 4-layer MLP head (reference MIR.py:18-181). Full-length histories:
    the reference's unpacked LSTM also consumes pad positions while ours
    stops at `lengths` (documented deviation)."""
    from models.BaseModel import BaseModel as TorchBaseModel
    from models.reranker.MIR import MIRBase as TorchMIRBase

    from rechorus_tpu.registry import get_model

    class RefMIR(torch.nn.Module, TorchMIRBase):
        init_weights = staticmethod(TorchBaseModel.init_weights)

        def __init__(self, rargs):
            torch.nn.Module.__init__(self)
            self.__dict__.update(_rerank_attrs() | {"ranker_emb_size": 16})
            self._base_init(rargs, None)

        def forward(self, fd):
            return TorchMIRBase.forward(self, fd)

    torch.manual_seed(0)
    rargs = ref_args(num_heads=2, num_hidden_unit=12, batch_size=4,
                     train_max_pos_item=2, train_max_neg_item=6)
    ref = RefMIR(rargs).eval()

    # the reference masks attn output with a 2*emb_size-wide mask
    # (MIR.py:146-147) -- it implicitly requires ranker_emb_size == emb_size
    attrs = {k: v for k, v in _rerank_attrs().items() if k != "item_num"}
    attrs["ranker_emb_size"] = 16
    model = get_model("MIRGeneral")(
        user_num=30, item_num=50, emb_size=16, num_heads=2,
        num_hidden_unit=12, dropout=0.0, **attrs)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    D_att = 16 + 16  # emb_size + ranker_emb_size
    w = sd["intra_set.in_proj_weight"]
    b = sd["intra_set.in_proj_bias"]
    params = {
        "i_embeddings": {"embedding": sd["i_embeddings.weight"]},
        "intra_set": {
            "q": {"kernel": w[:D_att].T, "bias": b[:D_att]},
            "k": {"kernel": w[D_att:2 * D_att].T, "bias": b[D_att:2 * D_att]},
            "v": {"kernel": w[2 * D_att:].T, "bias": b[2 * D_att:]},
            "out_proj": {"kernel": sd["intra_set.out_proj.weight"].T,
                         "bias": sd["intra_set.out_proj.bias"]},
        },
        "intra_list": {
            "OptimizedLSTMCell_0": _port_torch_lstm_dir(sd, "intra_list"),
            "OptimizedLSTMCell_1": _port_torch_lstm_dir(sd, "intra_list", "_reverse"),
        },
        "SLAttention": {
            "w_b": sd["SLAttention.w_b"][0],
            "w_v": sd["SLAttention.w_v"],
            "w_q": sd["SLAttention.w_q"],
            "fc_decay1": {"kernel": sd["SLAttention.fc_decay1.weight"].T,
                          "bias": sd["SLAttention.fc_decay1.bias"]},
            "fc_decay2": {"kernel": sd["SLAttention.fc_decay2.weight"].T,
                          "bias": sd["SLAttention.fc_decay2.bias"]},
        },
    }
    for name in ("fc1", "fc2", "fc3", "fc4"):
        params[name] = {"kernel": sd[f"{name}.weight"].T, "bias": sd[f"{name}.bias"]}

    rng = np.random.default_rng(40)
    B, L, H = 4, 8, 6
    items, u_v, i_v, position, pad = _rerank_feed(rng, B=B, L=L, ranker_d=16)
    hist = rng.integers(1, 50, size=(B, H)).astype(np.int32)
    his_v = rng.normal(size=(B, H, 16)).astype(np.float32)
    times = np.sort(rng.integers(1, 500, size=(B, H)), axis=1).astype(np.int64)
    lengths = np.full(B, H, np.int32)

    with torch.no_grad():
        ref_out = ref({"item_id": t(items), "history_items": t(hist),
                       "i_v": t(i_v), "his_v": t(his_v), "u_v": t(u_v),
                       "history_times": t(times),
                       "padding_mask": torch.from_numpy(pad)})
    import jax.numpy as jnp

    feed = {"item_id": jnp.asarray(items), "history_items": jnp.asarray(hist),
            "i_v": jnp.asarray(i_v), "his_v": jnp.asarray(his_v),
            "u_v": jnp.asarray(u_v), "history_times": jnp.asarray(times.astype(np.int32)),
            "padding_mask": jnp.asarray(pad), "lengths": jnp.asarray(lengths)}
    out = model.apply({"params": params}, feed, training=False)
    np.testing.assert_allclose(
        np.asarray(out["prediction"]), ref_out["prediction"].numpy(), atol=1e-5)
