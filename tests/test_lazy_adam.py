"""Lazy (touched-rows-only) Adam: math parity with optax.adam where
semantics coincide, and the e2e `--lazy_emb_adam` runner path."""
import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rechorus_tpu.ops.lazy_adam import LazyAdamState, LazyAdamTx, lazy_adam_step, resolve_lazy_rows


def _trees(seed=0, N=64, D=8):
    rng = np.random.default_rng(seed)
    params = {
        "table": {"embedding": jnp.asarray(rng.standard_normal((N, D)), jnp.float32)},
        "dense": {"kernel": jnp.asarray(rng.standard_normal((D, D)), jnp.float32),
                  "bias": jnp.zeros((D,), jnp.float32)},
    }
    grads = jax.tree.map(lambda p: jnp.asarray(np.random.default_rng(seed + 1)
                                               .standard_normal(p.shape), jnp.float32), params)
    return params, grads


def test_first_step_matches_dense_adam_everywhere():
    """From zero moments, one lazy step == one optax.adam step on every
    leaf: touched rows by the shared math, untouched rows because both
    produce exactly 0 update (0-moments, 0 grad)."""
    params, grads = _trees()
    # untouched rows get zero grads (as a real embedding grad would)
    touched = jnp.asarray([1, 3, 5, 7, 9, 3], jnp.int32)  # incl. a duplicate
    mask = jnp.zeros((64, 1), jnp.float32).at[touched].set(1.0)
    grads = dict(grads)
    grads["table"] = {"embedding": grads["table"]["embedding"] * mask}

    tx = LazyAdamTx(lr=1e-2, l2=0.0)
    new_p, _ = lazy_adam_step(tx, params, grads, tx.init(params),
                              {("table", "embedding"): touched})

    ref_tx = optax.adam(1e-2)
    upd, _ = ref_tx.update(grads, ref_tx.init(params), params)
    want = optax.apply_updates(params, upd)
    for path in [("table", "embedding"), ("dense", "kernel"), ("dense", "bias")]:
        a, b = new_p, want
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7,
                                   err_msg=str(path))


def test_full_coverage_multi_step_bitwise_dense():
    """If every row is touched every step, lazy == dense adam for many
    steps (bias correction, moments, everything)."""
    params, _ = _trees(seed=2, N=16)
    all_rows = jnp.arange(16, dtype=jnp.int32)
    tx = LazyAdamTx(lr=3e-3, l2=0.0)
    st = tx.init(params)
    ref_tx = optax.adam(3e-3)
    ref_st = ref_tx.init(params)
    ref_p = params
    for step in range(5):
        _, grads = _trees(seed=10 + step, N=16)
        params, st = lazy_adam_step(tx, params, grads, st, {("table", "embedding"): all_rows})
        upd, ref_st = ref_tx.update(grads, ref_st, ref_p)
        ref_p = optax.apply_updates(ref_p, upd)
    for (pa, pb) in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(ref_p)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-6, atol=1e-7)


def test_untouched_rows_frozen():
    """Rows never in the ids must be bit-identical across steps even when
    their moments are non-zero (the lazy semantics: no ghost decay)."""
    params, grads = _trees(seed=3)
    tx = LazyAdamTx(lr=1e-2, l2=1e-4)
    st = LazyAdamState(count=jnp.zeros((), jnp.int32),
                       mu=jax.tree.map(jnp.ones_like, params),
                       nu=jax.tree.map(jnp.ones_like, params))
    touched = jnp.asarray([0, 1, 2], jnp.int32)
    new_p, _ = lazy_adam_step(tx, params, grads, st, {("table", "embedding"): touched})
    before = np.asarray(params["table"]["embedding"])[3:]
    after = np.asarray(new_p["table"]["embedding"])[3:]
    np.testing.assert_array_equal(before, after)


def test_resolve_lazy_rows_skips_missing():
    params, _ = _trees()
    feed = {"user_id": jnp.arange(4), "item_id": jnp.arange(8).reshape(4, 2)}
    specs = {("table", "embedding"): ("item_id",),
             ("nope", "embedding"): ("user_id",)}
    rows = resolve_lazy_rows(specs, params, feed)
    assert set(rows) == {("table", "embedding")}
    assert rows[("table", "embedding")].shape == (8,)


@pytest.mark.slow
def test_e2e_lazy_vs_dense_bprmf(tmp_path):
    """--lazy_emb_adam trains BPRMF to metrics within noise of dense Adam
    on a small synthetic corpus (product path end-to-end)."""
    from rechorus_tpu import registry
    from rechorus_tpu.data.batching import get_batcher
    from rechorus_tpu.data.synthetic import make_topk_dataset

    make_topk_dataset(str(tmp_path / "Synth"), n_users=64, n_items=800, n_per_user=10, n_neg=9)

    def run(lazy):
        args = argparse.Namespace(
            path=str(tmp_path), dataset="Synth", sep="\t",
            epoch=3, check_epoch=0, test_epoch=-1, early_stop=10, lr=1e-2, l2=1e-6,
            batch_size=64, eval_batch_size=32, optimizer="Adam", num_workers=0,
            pin_memory=0, topk="5", metric="NDCG,HR", main_metric="",
            model_path="", random_seed=0, num_neg=1, dropout=0.0, test_all=0,
            emb_size=16, buffer=1, lazy_emb_adam=lazy,
            data_parallel=1, model_parallel=1,
        )
        corpus = registry.get_reader("BaseReader")(args)
        model_cls = registry.get_model("BPRMF")
        model = model_cls.from_args(args, corpus)
        runner = registry.get_runner(model_cls.runner)(args)
        batchers = {p: get_batcher(model_cls.batcher)(corpus, model, p, args)
                    for p in ["train", "dev"]}
        arrays = {p: runner.place_arrays(b.device_arrays()) for p, b in batchers.items()}
        state = runner.init_state(model, batchers["train"], 0)
        if lazy:
            assert runner._lazy_specs, "lazy path not engaged"
        for e in range(1, 4):
            state, loss = runner.fit(state, model, batchers["train"], arrays["train"], e, jax.random.key(0))
        res = runner.evaluate(state, model, batchers["dev"], arrays["dev"], "dev", [5], ["HR", "NDCG"])
        return loss, res

    loss_d, res_d = run(0)
    loss_l, res_l = run(1)
    assert np.isfinite(loss_l)
    assert abs(loss_d - loss_l) < 0.1, (loss_d, loss_l)
    assert abs(res_d["HR@5"] - res_l["HR@5"]) < 0.1, (res_d, res_l)


@pytest.mark.slow
def test_e2e_bf16_tables(tmp_path):
    """--bf16_emb: tables stored bfloat16, moments f32, metrics within
    noise of the f32 run, checkpoint round-trip preserved."""
    from rechorus_tpu import registry
    from rechorus_tpu.data.batching import get_batcher
    from rechorus_tpu.data.synthetic import make_topk_dataset
    from rechorus_tpu.ops.layers import set_table_dtype

    make_topk_dataset(str(tmp_path / "Synth"), n_users=64, n_items=800, n_per_user=10, n_neg=9)

    def run(bf16):
        args = argparse.Namespace(
            path=str(tmp_path), dataset="Synth", sep="\t",
            epoch=3, check_epoch=0, test_epoch=-1, early_stop=10, lr=1e-2, l2=1e-6,
            batch_size=64, eval_batch_size=32, optimizer="Adam", num_workers=0,
            pin_memory=0, topk="5", metric="NDCG,HR", main_metric="",
            model_path=str(tmp_path / f"m{bf16}.bin"), random_seed=0, num_neg=1,
            dropout=0.0, test_all=0, emb_size=16, buffer=1,
            lazy_emb_adam=1, bf16_emb=bf16, data_parallel=1, model_parallel=1,
        )
        corpus = registry.get_reader("BaseReader")(args)
        model_cls = registry.get_model("BPRMF")
        model = model_cls.from_args(args, corpus)
        runner = registry.get_runner(model_cls.runner)(args)
        batchers = {p: get_batcher(model_cls.batcher)(corpus, model, p, args)
                    for p in ["train", "dev"]}
        arrays = {p: runner.place_arrays(b.device_arrays()) for p, b in batchers.items()}
        state = runner.init_state(model, batchers["train"], 0)
        if bf16:
            assert state.params["i_embeddings"]["embedding"].dtype == jnp.bfloat16
            assert state.opt_state.mu["i_embeddings"]["embedding"].dtype == jnp.float32
        for e in range(1, 4):
            state, loss = runner.fit(state, model, batchers["train"], arrays["train"], e, jax.random.key(0))
        res = runner.evaluate(state, model, batchers["dev"], arrays["dev"], "dev", [5], ["HR", "NDCG"])
        # checkpoint round-trip keeps the storage dtype
        runner.save_model(state)
        state2 = runner.load_model(state)
        assert state2.params["i_embeddings"]["embedding"].dtype == state.params["i_embeddings"]["embedding"].dtype
        return res

    try:
        res32 = run(0)
        res16 = run(1)
    finally:
        set_table_dtype(None)
    assert abs(res32["HR@5"] - res16["HR@5"]) < 0.12, (res32, res16)


def test_lazy_adam_on_mesh(tmp_path):
    """--lazy_emb_adam composes with the (data, model) mesh: scatter
    row-updates on a row-sharded table compile + run under SPMD, loss
    finite, moments inherit the table sharding."""
    from rechorus_tpu import registry
    from rechorus_tpu.data.batching import get_batcher
    from rechorus_tpu.data.synthetic import make_topk_dataset
    from rechorus_tpu.parallel import mesh as M

    make_topk_dataset(str(tmp_path / "Synth"), n_users=32, n_items=2048,
                      n_per_user=6, n_neg=9)
    try:
        args = argparse.Namespace(
            path=str(tmp_path), dataset="Synth", sep="\t",
            epoch=1, check_epoch=0, test_epoch=-1, early_stop=10, lr=1e-2, l2=1e-6,
            batch_size=32, eval_batch_size=16, optimizer="Adam", num_workers=0,
            pin_memory=0, topk="5", metric="NDCG,HR", main_metric="",
            model_path="", random_seed=0, num_neg=2, dropout=0.0, test_all=0,
            emb_size=16, history_max=6, buffer=1, num_layers=1, num_heads=2,
            lazy_emb_adam=1, data_parallel=4, model_parallel=2,
        )
        corpus = registry.get_reader("SeqReader")(args)
        model_cls = registry.get_model("SASRec")
        model = model_cls.from_args(args, corpus)
        runner = registry.get_runner(model_cls.runner)(args)
        batcher = get_batcher(model_cls.batcher)(corpus, model, "train", args)
        arrays = runner.place_arrays(batcher.device_arrays())
        state = runner.init_state(model, batcher, 0)
        assert runner._lazy_specs
        table = state.params["i_embeddings"]["embedding"]
        mu = state.opt_state.mu["i_embeddings"]["embedding"]
        assert not table.sharding.is_fully_replicated
        assert mu.sharding == table.sharding
        state, loss = runner.fit(state, model, batcher, arrays, 1, jax.random.key(0))
        assert np.isfinite(loss)
    finally:
        M.set_table_row_pad(1)


# --------------------------------------------------------------------- #
# sparse-grad lane (--sparse_emb_grad)

def test_unique_rows_semantics():
    from rechorus_tpu.ops.lazy_adam import unique_rows

    ids = jnp.asarray([5, 3, 5, 9, 3, 1], jnp.int32)
    rows, scatter = unique_rows(ids, num_rows=10)
    np.testing.assert_array_equal(np.asarray(rows), [1, 3, 5, 9, 9, 9])
    # 9 == num_rows-1 is genuinely touched: its first slot scatters, the
    # fill duplicates are routed out of range (dropped)
    np.testing.assert_array_equal(np.asarray(scatter), [1, 3, 5, 9, 10, 10])
    # untouched fill row: every pad slot dropped
    rows2, scatter2 = unique_rows(jnp.asarray([2, 2, 0], jnp.int32), num_rows=10)
    np.testing.assert_array_equal(np.asarray(rows2), [0, 2, 9])
    np.testing.assert_array_equal(np.asarray(scatter2), [0, 2, 10])


def test_table_embed_sparse_lookup_forward_and_grads():
    """With the sparse-lookup context set, TableEmbed resolves covered ids
    from the row block (grads flow to the [R, D] vals, aggregated across
    duplicates) and uncovered ids from a stop-gradient dense gather (exact
    forward, zero grad)."""
    from rechorus_tpu.ops import layers as L
    from rechorus_tpu.ops.lazy_adam import unique_rows

    import flax.linen as nn

    N, D = 12, 4

    class Wrap(nn.Module):
        @nn.compact
        def __call__(self, x):
            return L.TableEmbed(N, D, embedding_init=L.NORMAL_INIT, name="tbl")(x)

    mod = Wrap()
    ids = jnp.asarray([[3, 7, 3], [0, 7, 11]], jnp.int32)
    params = mod.init(jax.random.key(0), ids)
    table = params["params"]["tbl"]["embedding"]

    covered = jnp.asarray([3, 7, 0], jnp.int32)  # 11 deliberately uncovered
    rows, _ = unique_rows(covered, N)
    vals = table[rows]

    def apply_sparse(vals):
        L.set_sparse_lookup({("tbl", "embedding"): (rows, vals)})
        try:
            return mod.apply(params, ids)
        finally:
            L.set_sparse_lookup(None)

    out_sparse = apply_sparse(vals)
    out_dense = mod.apply(params, ids)
    np.testing.assert_allclose(np.asarray(out_sparse), np.asarray(out_dense), atol=1e-7)

    g = jax.grad(lambda v: (apply_sparse(v) ** 2).sum())(vals)
    g_dense = jax.grad(lambda t: (jnp.take(t, ids, axis=0) ** 2).sum())(table)
    # covered rows: aggregated over duplicates, matching the dense cotangent
    for slot, row in enumerate(np.asarray(rows)):
        if row in np.asarray(covered):
            np.testing.assert_allclose(np.asarray(g[slot]), np.asarray(g_dense[row]),
                                       atol=1e-6, err_msg=f"row {row}")
    # uncovered id 11 contributed nothing anywhere
    assert not np.any(np.isnan(np.asarray(g)))


@pytest.mark.slow
def test_e2e_sparse_vs_dense_grad_lazy(tmp_path):
    """The sparse-grad lane trains to (near-)identical params as the
    dense-grad lazy lane: same math, only the cotangent representation
    differs (fp reduction order => tiny tolerances)."""
    from rechorus_tpu import registry
    from rechorus_tpu.data.batching import get_batcher
    from rechorus_tpu.data.synthetic import make_topk_dataset

    make_topk_dataset(str(tmp_path / "Synth"), n_users=48, n_items=600, n_per_user=8, n_neg=9)

    def run(sparse):
        args = argparse.Namespace(
            path=str(tmp_path), dataset="Synth", sep="\t",
            epoch=2, check_epoch=0, test_epoch=-1, early_stop=10, lr=1e-2, l2=1e-6,
            batch_size=48, eval_batch_size=24, optimizer="Adam", num_workers=0,
            pin_memory=0, topk="5", metric="NDCG,HR", main_metric="",
            model_path="", random_seed=0, num_neg=1, dropout=0.0, test_all=0,
            emb_size=16, buffer=1, lazy_emb_adam=1, sparse_emb_grad=sparse,
            data_parallel=1, model_parallel=1,
        )
        corpus = registry.get_reader("BaseReader")(args)
        model_cls = registry.get_model("BPRMF")
        model = model_cls.from_args(args, corpus)
        runner = registry.get_runner(model_cls.runner)(args)
        batcher = get_batcher(model_cls.batcher)(corpus, model, "train", args)
        arrays = runner.place_arrays(batcher.device_arrays())
        state = runner.init_state(model, batcher, 0)
        for e in range(1, 3):
            state, loss = runner.fit(state, model, batcher, arrays, e, jax.random.key(7))
        return state.params, loss

    p0, l0 = run(0)
    p1, l1 = run(1)
    assert abs(float(l0) - float(l1)) < 1e-4, (l0, l1)
    for (a, b) in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
