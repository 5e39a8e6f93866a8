"""Catalog-protocol eval: matmul scoring, gather-only top-k, sharded
kernels -- all must agree with the generic model-apply path."""
import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rechorus_tpu import registry
from rechorus_tpu.data.batching import get_batcher
from rechorus_tpu.data.synthetic import make_topk_dataset
from rechorus_tpu.ops.metrics import masked_topk


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    make_topk_dataset(str(root / "Synth"), n_users=48, n_items=1500, n_per_user=8, n_neg=9)
    reader_cls = registry.get_reader("SeqReader")
    args = argparse.Namespace(path=str(root), dataset="Synth", sep="\t")
    return reader_cls(args)


def make_args(**over):
    base = dict(
        epoch=1, check_epoch=0, test_epoch=-1, early_stop=10, lr=1e-2, l2=0.0,
        batch_size=64, eval_batch_size=16, optimizer="Adam", num_workers=0,
        pin_memory=0, topk="5", metric="NDCG,HR", main_metric="",
        model_path="", random_seed=7, num_neg=1, dropout=0.0, test_all=1,
        emb_size=16, history_max=8, buffer=1, num_layers=1, num_heads=2,
        data_parallel=1, model_parallel=1,
    )
    base.update(over)
    return argparse.Namespace(**base)


def _setup(corpus, name, args, train=True):
    model_cls = registry.get_model(name)
    model = model_cls.from_args(args, corpus)
    runner = registry.get_runner(model_cls.runner)(args)
    batchers = {p: get_batcher(model_cls.batcher)(corpus, model, p, args)
                for p in ["train", "dev", "test"]}
    arrays = {p: runner.place_arrays(b.device_arrays()) for p, b in batchers.items()}
    state = runner.init_state(model, batchers["train"], args.random_seed)
    if train:
        state, _ = runner.fit(state, model, batchers["train"], arrays["train"], 1, jax.random.key(0))
    return model, runner, batchers, arrays, state


def test_masked_topk_matches_scatter_reference():
    rng = np.random.default_rng(3)
    B, N, M, k = 8, 400, 37, 10
    pred = rng.normal(size=(B, N)).astype(np.float32)
    clicked = np.zeros((B, M), dtype=np.int32)
    for b in range(B):
        n = rng.integers(1, M)
        clicked[b, :n] = rng.choice(np.arange(1, N), size=n, replace=False)
    ref = pred.copy()
    ref[:, 0] = -np.inf
    for b in range(B):
        ref[b, clicked[b]] = -np.inf
        ref[b, 0] = -np.inf
    exp_cols = np.argsort(-ref, axis=1, kind="stable")[:, :k]
    v, cols = masked_topk(jnp.asarray(pred), jnp.asarray(clicked), k)
    np.testing.assert_allclose(np.asarray(v), np.take_along_axis(ref, exp_cols, 1), rtol=1e-6)
    got = np.asarray(cols)
    assert not np.isin(got, [0]).any()
    for b in range(B):
        assert not np.isin(got[b], clicked[b][clicked[b] > 0]).any()


def test_masked_topk_n_valid_excludes_tail():
    pred = jnp.asarray(np.linspace(1, 2, 32, dtype=np.float32))[None, :].repeat(2, 0)
    v, cols = masked_topk(pred, jnp.zeros((2, 1), jnp.int32), 5, n_valid=20)
    assert (np.asarray(cols) < 20).all() and (np.asarray(cols) > 0).all()


@pytest.mark.parametrize("name", ["SASRec", "GRU4Rec", "NARM", "Caser", "FPMC", "TiSASRec"])
def test_catalog_protocol_matches_generic_path(corpus, name):
    """ranks + top-k from the u@table.T catalog path == the generic
    model-apply path (same trained params)."""
    args = make_args()
    model, runner, batchers, arrays, state = _setup(corpus, name, args)

    ranks_cat = runner.predict_ranks(state, model, batchers["test"], arrays["test"], "test")
    items_cat, scores_cat = runner.predict_topk(state, model, batchers["test"], arrays["test"], "test", k=10)

    model_cls = type(model)
    orig = model_cls.supports_catalog
    try:
        model_cls.supports_catalog = False
        runner._compiled.pop("test", None)
        runner._compiled.pop(("test", "topk", 10), None)
        ranks_gen = runner.predict_ranks(state, model, batchers["test"], arrays["test"], "test")
        items_gen, scores_gen = runner.predict_topk(state, model, batchers["test"], arrays["test"], "test", k=10)
    finally:
        model_cls.supports_catalog = orig

    np.testing.assert_array_equal(ranks_cat, ranks_gen)
    np.testing.assert_allclose(scores_cat, scores_gen, rtol=2e-5, atol=1e-5)
    # ids can differ only under exact score ties
    diff = items_cat != items_gen
    if diff.any():
        np.testing.assert_allclose(scores_cat[diff], scores_gen[diff], rtol=2e-5, atol=1e-5)


def test_sharded_catalog_eval_matches_dense(corpus):
    """VERDICT item 3 'Done' criterion: sharded vs dense top-100 + ranks
    end-to-end through BaseRunner.predict_topk / predict_ranks. Table is
    1501 logical rows (non-divisible) -> padded to 1504 on mp=4; the same
    pad is forced on the dense runner so params match bit-for-bit."""
    from rechorus_tpu.parallel import mesh as M

    try:
        mesh_args = make_args(data_parallel=2, model_parallel=4, batch_size=64, eval_batch_size=16)
        # eval on INIT params: sharded training reorders float reductions,
        # so post-train params differ in ulps; path equivalence is the test
        model_s, runner_s, batchers_s, arrays_s, state_s = _setup(corpus, "SASRec", mesh_args, train=False)
        assert runner_s.mesh is not None
        table = state_s.params["i_embeddings"]["embedding"]
        assert table.shape[0] % 4 == 0 and not table.sharding.is_fully_replicated

        # dense single-device run with the SAME row pad -> identical params
        M.set_table_row_pad(4)
        dense_args = make_args(batch_size=64, eval_batch_size=16)
        model_d, runner_d, batchers_d, arrays_d, state_d = _setup(corpus, "SASRec", dense_args, train=False)

        np.testing.assert_allclose(
            np.asarray(table), np.asarray(state_d.params["i_embeddings"]["embedding"]),
            rtol=1e-6, atol=1e-7)

        ranks_s = runner_s.predict_ranks(state_s, model_s, batchers_s["test"], arrays_s["test"], "test")
        ranks_d = runner_d.predict_ranks(state_d, model_d, batchers_d["test"], arrays_d["test"], "test")
        np.testing.assert_array_equal(ranks_s, ranks_d)

        items_s, scores_s = runner_s.predict_topk(state_s, model_s, batchers_s["test"], arrays_s["test"], "test", k=100)
        items_d, scores_d = runner_d.predict_topk(state_d, model_d, batchers_d["test"], arrays_d["test"], "test", k=100)
        np.testing.assert_allclose(scores_s, scores_d, rtol=2e-5, atol=1e-5)
        diff = items_s != items_d
        if diff.any():  # ties only
            np.testing.assert_allclose(scores_s[diff], scores_d[diff], rtol=2e-5, atol=1e-5)
    finally:
        M.set_table_row_pad(1)


def test_candidate_tiled_forward_matches_dense(corpus):
    """VERDICT r3 item 5: the candidate-tiled test_all eval (chunked
    candidate axis through the ordinary forward) must reproduce the dense
    [B, N] generic path's ranks exactly. Chunk 367 exercises the
    non-divisible overhang clamp (1501 % 367 != 0)."""
    args = make_args()
    model, runner, batchers, arrays, state = _setup(corpus, "SASRec", args)

    model_cls = type(model)
    orig = model_cls.supports_catalog
    try:
        model_cls.supports_catalog = False
        runner._compiled.pop("test", None)
        ranks_dense = runner.predict_ranks(
            state, model, batchers["test"], arrays["test"], "test")

        runner.eval_candidate_chunk = 367
        runner.__dict__["_use_tiled_forward"] = lambda m, b: True
        runner._compiled.pop("test", None)
        ranks_tiled = runner.predict_ranks(
            state, model, batchers["test"], arrays["test"], "test")
    finally:
        model_cls.supports_catalog = orig

    np.testing.assert_array_equal(ranks_dense, ranks_tiled)


def test_candidate_tiled_topk_matches_dense(corpus):
    """ADVICE r4 medium: predict_topk (the --save_final_results export)
    must ALSO stream the candidate axis for tiled-forward configs -- it
    used to build the dense [B, N] eval feed and OOM after training
    succeeded. Equivalence vs the dense generic path, odd chunk for the
    overhang."""
    args = make_args()
    model, runner, batchers, arrays, state = _setup(corpus, "SASRec", args)

    model_cls = type(model)
    orig = model_cls.supports_catalog
    try:
        model_cls.supports_catalog = False
        runner._compiled.pop(("test", "topk", 10), None)
        items_d, scores_d = runner.predict_topk(
            state, model, batchers["test"], arrays["test"], "test", k=10)

        runner.eval_candidate_chunk = 367
        runner.__dict__["_use_tiled_forward"] = lambda m, b: True
        runner._compiled.pop(("test", "topk", 10), None)
        items_t, scores_t = runner.predict_topk(
            state, model, batchers["test"], arrays["test"], "test", k=10)
    finally:
        model_cls.supports_catalog = orig

    np.testing.assert_allclose(scores_d, scores_t, rtol=2e-5, atol=1e-5)
    diff = items_d != items_t
    if diff.any():  # ties only
        np.testing.assert_allclose(scores_d[diff], scores_t[diff], rtol=2e-5, atol=1e-5)
    # export contract: no pad item, no clicked items
    assert not (items_t == 0).any()


def test_dense_feed_bytes_routing(corpus, monkeypatch):
    """VERDICT r4 weak 5: the tiled-forward guard must account for
    per-candidate feed bytes, not just catalog width. A KDA-like feed
    ([B, N, H, R] intervals) at modest N routes tiled once its dense
    bytes pass the cap; a light feed at the same N stays dense."""
    args = make_args()
    model_cls = registry.get_model("SASRec")
    monkeypatch.setattr(model_cls, "supports_catalog", False)
    model = model_cls.from_args(args, corpus)
    runner = registry.get_runner(model_cls.runner)(args)
    b = get_batcher(model_cls.batcher)(corpus, model, "test", args)
    # 1501 items, chunk 512: 2-3 chunks wide -- width rule alone says dense
    runner.eval_candidate_chunk = 512
    assert not runner._use_tiled_forward(model, b)  # light feed
    est = runner._dense_feed_bytes(b)
    assert est > 0
    # force the cap below this corpus' dense estimate -> routes tiled
    runner.MAX_DENSE_FEED_BYTES = max(1, est - 1)
    assert runner._use_tiled_forward(model, b)
    # single-chunk catalogs always stay dense (the chunk IS the feed)
    runner.eval_candidate_chunk = 8192
    assert not runner._use_tiled_forward(model, b)


@pytest.fixture(scope="module")
def kda_corpus(tmp_path_factory):
    from rechorus_tpu.data.synthetic import make_kg_dataset

    root = tmp_path_factory.mktemp("data_kda")
    make_kg_dataset(str(root / "SynthKG"), n_items=900)
    reader_cls = registry.get_reader("KDAReader")
    a = argparse.Namespace(path=str(root), dataset="SynthKG", sep="\t",
                           include_attr=1, t_scalar=60, n_dft=32, freq_rand=0,
                           regenerate=0)
    return reader_cls(a)


def _kda_args(**over):
    base = dict(num_layers=1, num_heads=2, gamma=-1, attention_size=8,
                pooling="average", include_val=1, neg_head_p=0.5,
                include_attr=1, t_scalar=60, n_dft=32, freq_rand=0,
                regenerate=0, history_max=8)
    base.update(over)
    return make_args(**base)


def test_candidate_tiled_kda_matches_dense(kda_corpus):
    """Same equivalence for a model with candidate-ALIGNED feed extras
    (KDA's per-candidate relational intervals + item values are rebuilt
    per chunk by eval_feed(cands=...))."""
    args = _kda_args()
    model, runner, batchers, arrays, state = _setup(kda_corpus, "KDA", args)

    runner._compiled.pop("test", None)
    ranks_dense = runner.predict_ranks(
        state, model, batchers["test"], arrays["test"], "test")

    runner.eval_candidate_chunk = 251
    runner.__dict__["_use_tiled_forward"] = lambda m, b: True
    runner._compiled.pop("test", None)
    ranks_tiled = runner.predict_ranks(
        state, model, batchers["test"], arrays["test"], "test")

    np.testing.assert_array_equal(ranks_dense, ranks_tiled)


@pytest.mark.slow
def test_candidate_tiled_100k_catalog(tmp_path_factory):
    """VERDICT r3 item 5 'Done' criterion: KDA (no catalog protocol)
    evaluates --test_all on a >=100k-item synthetic catalog without OOM —
    the r3 code raised a RuntimeError guard here. The dense [B, N]
    candidate feed would be ~100k*B*(H+R) ids; the tiled path streams
    8192-candidate chunks."""
    from rechorus_tpu.data.synthetic import make_kg_dataset

    root = tmp_path_factory.mktemp("data_kda_big")
    make_kg_dataset(str(root / "SynthKG"), n_users=40, n_items=100_000,
                    n_per_user=9)
    reader_cls = registry.get_reader("KDAReader")
    a = argparse.Namespace(path=str(root), dataset="SynthKG", sep="\t",
                           include_attr=1, t_scalar=60, n_dft=32, freq_rand=0,
                           regenerate=0)
    corpus = reader_cls(a)
    args = _kda_args(eval_batch_size=8, emb_size=16)
    model, runner, batchers, arrays, state = _setup(corpus, "KDA", args,
                                                    train=False)
    assert runner._use_tiled_forward(model, batchers["test"])  # real routing
    ranks = runner.predict_ranks(state, model, batchers["test"],
                                 arrays["test"], "test")
    n_rows = len(batchers["test"])
    assert ranks.shape[0] == n_rows
    assert (ranks >= 1).all() and (ranks <= corpus.n_items).all()


def test_masked_topk_approx_recall():
    """--approx_topk lane: exclusions still exact, recall vs exact top-k
    high (lax.approx_max_k recall_target=0.98; on CPU it falls back to
    exact so this bounds the contract, the TPU speed is measured in
    scripts/prod_bench.py)."""
    rng = np.random.default_rng(9)
    B, N, M, k = 8, 2000, 20, 100
    pred = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
    clicked = jnp.asarray(rng.integers(1, N, size=(B, M)), dtype=jnp.int32)
    ve, ie = masked_topk(pred, clicked, k)
    va, ia = masked_topk(pred, clicked, k, approx=True)
    assert not np.isin(np.asarray(ia), [0]).any()
    for b in range(B):
        assert not np.isin(np.asarray(ia)[b], np.asarray(clicked)[b]).any()
        recall = len(set(np.asarray(ia)[b]) & set(np.asarray(ie)[b])) / k
        assert recall >= 0.9, recall


def test_tiled_catalog_route_matches_dense(corpus, monkeypatch):
    """Large-catalog route (ops/topk.py tiled kernels) end-to-end through
    BaseRunner.predict_ranks/predict_topk: force the tiled threshold below
    this corpus' 1501-row table and compare against the dense route on the
    same trained params. Odd tile (.e.g 640) exercises the tail chunk."""
    from rechorus_tpu.ops import topk as topk_ops

    args = make_args()
    model, runner, batchers, arrays, state = _setup(corpus, "BPRMF", args)

    ranks_dense = runner.predict_ranks(state, model, batchers["test"], arrays["test"], "test")
    items_dense, scores_dense = runner.predict_topk(
        state, model, batchers["test"], arrays["test"], "test", k=20)

    monkeypatch.setattr(topk_ops, "MIN_ROWS_FOR_TILED", 64)
    monkeypatch.setattr(topk_ops, "DEFAULT_TILE", 640)
    runner._compiled.pop("test", None)
    runner._compiled.pop(("test", "topk", 20), None)
    ranks_tiled = runner.predict_ranks(state, model, batchers["test"], arrays["test"], "test")
    items_tiled, scores_tiled = runner.predict_topk(
        state, model, batchers["test"], arrays["test"], "test", k=20)

    np.testing.assert_array_equal(ranks_dense, ranks_tiled)
    np.testing.assert_allclose(scores_dense, scores_tiled, rtol=2e-5, atol=1e-5)
    diff = items_dense != items_tiled
    if diff.any():  # ties only
        np.testing.assert_allclose(scores_dense[diff], scores_tiled[diff], rtol=2e-5, atol=1e-5)

    # Pallas-fused stage 1 (interpret mode on CPU) through the same
    # product route: bucket lowered so the 1501-row table is eligible
    # (route needs N >= bucket*128)
    monkeypatch.setattr(topk_ops, "DEFAULT_BUCKET", 8)
    monkeypatch.setattr(topk_ops, "PALLAS", "on")
    runner._compiled.pop("test", None)
    runner._compiled.pop(("test", "topk", 20), None)
    ranks_pl = runner.predict_ranks(state, model, batchers["test"], arrays["test"], "test")
    items_pl, scores_pl = runner.predict_topk(
        state, model, batchers["test"], arrays["test"], "test", k=20)
    np.testing.assert_array_equal(ranks_dense, ranks_pl)
    np.testing.assert_allclose(scores_dense, scores_pl, rtol=2e-5, atol=1e-5)
    diff = items_dense != items_pl
    if diff.any():  # ties only
        np.testing.assert_allclose(scores_dense[diff], scores_pl[diff], rtol=2e-5, atol=1e-5)
