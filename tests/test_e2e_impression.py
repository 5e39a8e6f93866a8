"""End-to-end: impression-based listwise ranking."""
import argparse

import numpy as np
import pytest

from rechorus_tpu import registry
from rechorus_tpu.data.batching import get_batcher
from rechorus_tpu.data.synthetic import make_impression_dataset


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    make_impression_dataset(str(root / "SynthImp"))
    return str(root)


def make_args(**over):
    base = dict(
        path=None, dataset="SynthImp", sep="\t", impression_idkey="time",
        epoch=30, check_epoch=0, test_epoch=-1, early_stop=40, lr=1e-2, l2=0.0,
        batch_size=128, eval_batch_size=128, optimizer="Adam", num_workers=0,
        pin_memory=0, topk="2,5", metric="NDCG,HR,MAP", main_metric="",
        model_path="", random_seed=5,
        num_neg=1, dropout=0.0, test_all=0, emb_size=16, buffer=1,
        loss_n="BPR", train_max_pos_item=5, train_max_neg_item=8,
        test_max_pos_item=5, test_max_neg_item=8, history_max=10,
    )
    base.update(over)
    return argparse.Namespace(**base)


def run_model(data_root, name, args):
    args.path = data_root
    model_cls = registry.get_model(name)
    reader = registry.get_reader(model_cls.reader)(args)
    model = model_cls.from_args(args, reader)
    runner = registry.get_runner(model_cls.runner)(args)
    batchers = {p: get_batcher(model_cls.batcher)(reader, model, p, args) for p in ["train", "dev", "test"]}
    arrays = {p: b.device_arrays() for p, b in batchers.items()}
    state = runner.init_state(model, batchers["train"], args.random_seed)
    state = runner.train(model, batchers, state)
    return runner.evaluate(state, model, batchers["test"], arrays["test"], "test", [2, 5], runner.metrics)


@pytest.mark.parametrize(
    "name,extra",
    [
        ("BPRMFImpression", dict(loss_n="BPR")),
        ("BPRMFImpression", dict(loss_n="listnet")),
        ("BPRMFImpression", dict(loss_n="softmaxCE")),
        ("BPRMFImpression", dict(loss_n="attention_rank")),
        ("BPRMFImpression", dict(loss_n="BPRafter")),
        ("BPRMFImpression", dict(loss_n="BPRhard")),
        ("GRU4RecImpression", dict(loss_n="BPR", hidden_size=32)),
        ("SASRecImpression", dict(loss_n="BPR", num_layers=1, num_heads=2)),
    ],
)
def test_impression_models_learn(data_root, name, extra):
    res = run_model(data_root, name, make_args(**extra))
    # positives are group items: a learner should rank them above negatives
    assert np.isfinite(res["NDCG@2"])
    assert res["NDCG@2"] > 0.5, f"{name}: {res}"
    assert "MAP@5" in res and "HR@5" in res


def test_impression_test_all_matches_oracle(data_root):
    """--test_all on an impression model (VERDICT r4 item 2): candidates
    become [pos | full catalog], with id 0 + the user's positively-clicked
    items (all splits) masked -- the masking the reference INTENDS at
    ImpressionRunner.py:141-149 (its own path is non-functional: the
    test_all branch of evaluate_method returns {} and the clicked mask
    indexes columns by raw item id). Oracle: hand-built masked prediction
    matrix from the same trained params + the parity-tested listwise
    metric kernels."""
    import jax
    import jax.numpy as jnp

    from rechorus_tpu.ops import metrics as metrics_ops

    args = make_args(test_all=1, epoch=1, eval_batch_size=32)
    args.path = data_root
    model_cls = registry.get_model("BPRMFImpression")
    reader = registry.get_reader(model_cls.reader)(args)
    model = model_cls.from_args(args, reader)
    runner = registry.get_runner(model_cls.runner)(args)
    batchers = {p: get_batcher(model_cls.batcher)(reader, model, p, args)
                for p in ["train", "test"]}
    arrays = {p: b.device_arrays() for p, b in batchers.items()}
    state = runner.init_state(model, batchers["train"], 0)
    state, _ = runner.fit(state, model, batchers["train"], arrays["train"], 1,
                          jax.random.key(0))
    topks, mets = [2, 5], ["NDCG", "HR", "MAP"]
    got = runner.evaluate(state, model, batchers["test"], arrays["test"],
                          "test", topks, mets)

    # ---- oracle ----
    N = reader.n_items
    P = batchers["test"].pos_len
    df = reader.data_df["test"]
    pos_df = reader.all_df[reader.all_df["label"] != 0]
    clicked = {u: set(g["item_id"]) - {0}
               for u, g in pos_df.groupby("user_id")}
    n = len(df)
    item_id = np.zeros((n, P + N), np.int32)
    item_id[:, P:] = np.arange(N)
    pos_num = np.zeros(n, np.int32)
    mask = np.zeros((n, P + N), bool)  # True = valid candidate
    neg_num = np.zeros(n, np.int32)
    for r in range(n):
        u = int(df["user_id"].iloc[r])
        pos = list(df["pos_items"].iloc[r])[:P]
        item_id[r, : len(pos)] = pos
        pos_num[r] = len(pos)
        mask[r, : len(pos)] = True
        cat_ok = np.ones(N, bool)
        cat_ok[0] = False
        cat_ok[np.array(sorted(clicked.get(u, set())), np.int64)] = False
        mask[r, P:] = cat_ok
        neg_num[r] = int(cat_ok.sum())
    variables = {"params": state.params, **state.extra_vars}
    feed = {"user_id": jnp.asarray(df["user_id"].to_numpy(np.int32)),
            "item_id": jnp.asarray(item_id), "batch_size": n}
    pred = np.asarray(model.apply(variables, feed, training=False)["prediction"])
    pred = np.where(mask, pred, -np.inf)
    want = metrics_ops.evaluate_impression(pred, topks, mets, pos_num, neg_num, P)

    # neg_num accounting must match the batcher's
    np.testing.assert_array_equal(
        neg_num, np.asarray(batchers["test"].arrays["neg_num"]))
    for k, v in want.items():
        np.testing.assert_allclose(got[k], v, rtol=1e-6, atol=1e-8, err_msg=k)
    assert 0.0 < got["NDCG@5"] < 1.0


def test_impression_test_all_export(data_root, tmp_path):
    """save_rec_results under impression --test_all exports top-k CATALOG
    recommendations (the logged-negatives columns would pair mismatched
    lists against the catalog block)."""
    import os
    import shutil

    import jax
    import pandas as pd

    from rechorus_tpu.main import save_rec_results

    args = make_args(test_all=1, epoch=1, eval_batch_size=32)
    args.path = str(tmp_path)
    shutil.copytree(os.path.join(data_root, "SynthImp"),
                    os.path.join(str(tmp_path), "SynthImp"))
    model_cls = registry.get_model("BPRMFImpression")
    reader = registry.get_reader(model_cls.reader)(args)
    model = model_cls.from_args(args, reader)
    runner = registry.get_runner(model_cls.runner)(args)
    batchers = {p: get_batcher(model_cls.batcher)(reader, model, p, args)
                for p in ["train", "test"]}
    arrays = {p: b.device_arrays() for p, b in batchers.items()}
    state = runner.init_state(model, batchers["train"], 0)
    state, _ = runner.fit(state, model, batchers["train"], arrays["train"], 1,
                          jax.random.key(0))
    save_rec_results(args, reader, model, runner, state, batchers, arrays, topk=10)
    out = pd.read_csv(os.path.join(str(tmp_path), "SynthImp",
                                   "rec-BPRMFImpression-test.csv"), sep="\t")
    assert {"user_id", "pos_items", "pos_predictions",
            "rec_items", "rec_predictions"} <= set(out.columns)
    rec0 = eval(out["rec_items"].iloc[0])
    assert len(rec0) == 10 and 0 not in rec0
    # clicked items must be masked out of the recommendations
    clicked = reader.pos_clicked_matrix()
    u0 = int(out["user_id"].iloc[0])
    assert not set(rec0) & set(int(x) for x in clicked[u0] if x > 0)


def test_rerank_test_all_hard_error(data_root):
    """--test_all on a reranker must be a loud error, not silently
    different numbers (VERDICT r4 item 2 alternative for this family)."""
    args = make_args(test_all=1, ranker_name="BPRMF", ranker_config_file="",
                     ranker_model_file="", tuneranker=0, emb_size=16,
                     n_blocks=1, num_heads=2, num_hidden_unit=16)
    args.path = data_root
    model_cls = registry.get_model("PRMGeneral")
    reader = registry.get_reader(model_cls.reader)(args)
    model = model_cls.from_args(args, reader)
    with pytest.raises(ValueError, match="test_all"):
        get_batcher(model_cls.batcher)(reader, model, "test", args)


def test_impression_reader_grouping(data_root):
    args = make_args()
    args.path = data_root
    reader = registry.get_reader("ImpressionReader")(args)
    df = reader.data_df["train"]
    assert (df["pos_num"] > 0).all() and (df["neg_num"] > 0).all()
    # one request per (user, time)
    assert df.groupby(["user_id", "time"]).size().max() == 1


def test_impression_context_reader(tmp_path):
    """ImpressionContextReader: impression grouping + context metadata
    (reference src/helpers/ImpressionContextReader.py)."""
    import argparse

    import pandas as pd

    from rechorus_tpu import registry
    from rechorus_tpu.data.synthetic import make_impression_dataset

    root = tmp_path / "d"
    stats = make_impression_dataset(str(root / "SynthImp"))
    n_items = stats["n_items"]
    pd.DataFrame({
        "item_id": range(1, n_items + 1),
        "i_category_c": [i % 4 for i in range(1, n_items + 1)],
    }).to_csv(root / "SynthImp" / "item_meta.csv", sep="\t", index=False)
    args = argparse.Namespace(
        path=str(root), dataset="SynthImp", sep="\t", impression_idkey="time",
        include_item_features=1, include_user_features=0, include_context_features=0)
    reader = registry.get_reader("ImpressionContextReader")(args)
    assert len(reader.data_df["train"]) > 0
    assert "pos_items" in reader.data_df["train"].columns
    assert reader.feature_max["i_category_c"] == 4
    assert reader.item_features is not None
