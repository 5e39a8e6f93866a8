"""End-to-end: sequential models on a tiny synthetic corpus with SeqReader."""
import argparse

import numpy as np
import pytest

from rechorus_tpu import registry
from rechorus_tpu.data.batching import get_batcher
from rechorus_tpu.data.synthetic import make_topk_dataset


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    make_topk_dataset(str(root / "Synth"), n_users=150, n_items=80, n_per_user=10)
    reader_cls = registry.get_reader("SeqReader")
    args = argparse.Namespace(path=str(root), dataset="Synth", sep="\t")
    return reader_cls(args)


def make_args(**over):
    base = dict(
        epoch=4, check_epoch=0, test_epoch=-1, early_stop=10, lr=1e-2, l2=0.0,
        batch_size=128, eval_batch_size=128, optimizer="Adam", num_workers=0,
        pin_memory=0, topk="5", metric="NDCG,HR", main_metric="",
        model_path="", random_seed=7,
        num_neg=1, dropout=0.0, test_all=0, emb_size=16, history_max=8, buffer=1,
    )
    base.update(over)
    return argparse.Namespace(**base)


def run_model(corpus, name, args):
    model_cls = registry.get_model(name)
    model = model_cls.from_args(args, corpus)
    runner = registry.get_runner(model_cls.runner)(args)
    batchers = {p: get_batcher(model_cls.batcher)(corpus, model, p, args) for p in ["train", "dev", "test"]}
    arrays = {p: b.device_arrays() for p, b in batchers.items()}
    state = runner.init_state(model, batchers["train"], args.random_seed)
    state = runner.train(model, batchers, state)
    return runner.evaluate(state, model, batchers["test"], arrays["test"], "test", [5], ["HR", "NDCG"])


@pytest.mark.parametrize(
    "name,extra",
    [
        ("SASRec", dict(num_layers=1, num_heads=2)),
        ("GRU4Rec", dict(hidden_size=32)),
        ("FPMC", dict()),
        ("Caser", dict(num_horizon=8, num_vertical=4, L=3)),
        ("NARM", dict(hidden_size=32, attention_size=16)),
        ("ComiRec", dict(attn_size=8, K=2, add_pos=1)),
        ("TiSASRec", dict(num_layers=1, num_heads=2, time_max=64)),
    ],
)
def test_sequential_models_learn(corpus, name, extra):
    res = run_model(corpus, name, make_args(**extra))
    assert np.isfinite(res["HR@5"]) and np.isfinite(res["NDCG@5"])
    # 20 candidates -> random HR@5 = 0.25; block structure must be learned
    assert res["HR@5"] > 0.35, f"{name}: {res}"


def test_history_arrays_match_user_his(corpus):
    df = corpus.data_df["dev"]
    keep = df["position"].to_numpy() > 0
    df = df[keep].reset_index(drop=True)
    his_items, his_times, lengths = corpus.history_arrays(df, 8)
    for r in [0, 1, len(df) - 1]:
        u, p = int(df["user_id"][r]), int(df["position"][r])
        expected = [x[0] for x in corpus.user_his[u][:p][-8:]]
        got = list(his_items[r][: lengths[r]])
        assert got == expected


def test_contrarec_learns(corpus):
    args = make_args(epoch=5, lr=5e-3, gamma=1.0, beta_a=3, beta_b=3,
                     ctc_temp=1.0, ccc_temp=0.2, encoder="BERT4Rec", batch_size=256)
    res = run_model(corpus, "ContraRec", args)
    assert np.isfinite(res["HR@5"])
    assert res["HR@5"] > 0.35


def test_contrarec_gru_encoder(corpus):
    args = make_args(epoch=2, lr=5e-3, gamma=1.0, beta_a=3, beta_b=3,
                     ctc_temp=1.0, ccc_temp=0.2, encoder="GRU4Rec")
    res = run_model(corpus, "ContraRec", args)
    assert np.isfinite(res["HR@5"])


def test_timirec_two_stage(corpus, tmp_path):
    common = dict(attn_size=8, K=2, add_pos=1, add_trm=1, temp=1.0, n_layers=1, dataset="Synth",
                  model_path=str(tmp_path / "TiMiRec" / "x.bin"), epoch=4, lr=5e-3)
    res1 = run_model(corpus, "TiMiRec", make_args(stage="pretrain", **common))
    assert np.isfinite(res1["HR@5"])
    import os
    files = os.listdir(tmp_path / "TiMiRec")
    assert any(f.startswith("Extractor__") for f in files)
    res2 = run_model(corpus, "TiMiRec", make_args(stage="finetune", **common))
    assert np.isfinite(res2["HR@5"])
    assert res2["HR@5"] > 0.35


def test_native_history_matches_numpy(corpus):
    """C++ corpus kernel (native/corpus_ops.cpp) must reproduce the numpy
    fallback bit-exactly."""
    from rechorus_tpu import native

    if not native.available():
        import pytest

        pytest.skip("no native compiler")
    df = corpus.data_df["train"]
    flat_i, flat_t, offsets = corpus._history_flat()
    got = native.build_history_arrays(
        df["user_id"].to_numpy(), df["position"].to_numpy(), flat_i, flat_t, offsets, 8)
    # numpy fallback path
    his_np = corpus._history_views()
    n = len(df)
    exp_items = np.zeros((n, 8), dtype=np.int32)
    exp_times = np.zeros((n, 8), dtype=np.int64)
    exp_len = np.zeros((n,), dtype=np.int32)
    users, positions = df["user_id"].to_numpy(), df["position"].to_numpy()
    for r in range(n):
        u, p = users[r], int(positions[r])
        if p <= 0:
            continue
        h = his_np[u][max(0, p - 8): p]
        exp_items[r, :len(h)] = h[:, 0]
        exp_times[r, :len(h)] = h[:, 1]
        exp_len[r] = len(h)
    np.testing.assert_array_equal(got[0], exp_items)
    np.testing.assert_array_equal(got[1], exp_times)
    np.testing.assert_array_equal(got[2], exp_len)
