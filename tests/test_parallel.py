"""Distributed top-k over a row-sharded item table (8 virtual devices)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rechorus_tpu.parallel.mesh import make_mesh
from rechorus_tpu.parallel.topk import sharded_catalog_topk


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, model_parallel=4)


def test_sharded_topk_matches_dense(mesh):
    rng = np.random.default_rng(0)
    B, N, d, k = 16, 512, 32, 10
    u = jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(N, d)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
    clicked = jnp.asarray(rng.integers(1, N, size=(B, 7)), dtype=jnp.int32)

    table_sharded = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    with jax.set_mesh(mesh):
        vals, ids = sharded_catalog_topk(u, table_sharded, k, mesh,
                                         clicked_rows=clicked, item_bias=bias)

    scores = np.array(u @ table.T + bias[None, :])
    scores[:, 0] = -np.inf
    for b in range(B):
        scores[b, np.asarray(clicked)[b]] = -np.inf
    expect_ids = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    got_vals, got_ids = np.asarray(vals), np.asarray(ids)
    # compare score values (ids can differ under exact ties)
    np.testing.assert_allclose(got_vals, np.take_along_axis(scores, expect_ids, 1), rtol=1e-5)
    assert (np.take_along_axis(scores, got_ids, 1) == got_vals).all()
    # exclusions respected
    assert not np.isin(got_ids, [0]).any()
    for b in range(B):
        assert not np.isin(got_ids[b], np.asarray(clicked)[b]).any()


def test_sharded_topk_no_mask(mesh):
    rng = np.random.default_rng(1)
    B, N, d, k = 4, 256, 16, 5
    u = jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))
    table = jax.device_put(
        jnp.asarray(rng.normal(size=(N, d)).astype(np.float32)),
        NamedSharding(mesh, P("model", None)))
    with jax.set_mesh(mesh):
        vals, ids = sharded_catalog_topk(u, table, k, mesh)
    assert vals.shape == (B, k) and ids.shape == (B, k)
    assert (np.diff(np.asarray(vals), axis=1) <= 1e-6).all()  # descending


def test_pad_rows_quantum():
    from rechorus_tpu.parallel import mesh as M

    try:
        M.set_table_row_pad(4)
        assert M.pad_rows(2049) == 2052
        assert M.pad_rows(2048) == 2048
        M.set_table_row_pad(1)
        assert M.pad_rows(2049) == 2049
    finally:
        M.set_table_row_pad(1)


def test_param_spec_nondivisible_falls_back_to_replication(caplog):
    """Tables whose rows don't divide the model axis must replicate, not
    crash (round-1 regression: 2049-row table on a 2-way model axis)."""
    import logging

    from rechorus_tpu.parallel.mesh import param_spec

    v = jnp.zeros((2049, 32))
    with caplog.at_level(logging.WARNING):
        spec = param_spec(("i_embeddings", "embedding"), v, model_size=2)
    assert spec == P()
    assert any("not divisible" in r.message for r in caplog.records)
    # divisible table on the same axis still shards
    assert param_spec(("i_embeddings", "embedding"), jnp.zeros((2050, 32)), 2) == P("model", None)


def test_dryrun_multichip_product_path():
    """The EXACT config the driver checks: n_items=2048 (2049 logical
    rows, non-divisible), SASRec, 8 devices, 4x2 mesh, full train epoch +
    sharded eval through the runner product path."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from rechorus_tpu.parallel import mesh as M

    from __graft_entry__ import dryrun_multichip

    try:
        dryrun_multichip(8)
    finally:
        M.set_table_row_pad(1)


def test_sharded_tiled_branch_matches_dense(mesh, monkeypatch):
    """Big-shard branch (streamed tiles inside shard_map, ops/topk.py
    kernels with col_offset): force the threshold down so the 128-row
    shards take it; results must match the dense-shard branch."""
    import rechorus_tpu.parallel.topk as ptopk
    from rechorus_tpu.parallel.topk import sharded_catalog_ranks

    rng = np.random.default_rng(5)
    B, N, d, k = 16, 512, 32, 10
    u = jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(N, d)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
    clicked = np.zeros((B, 7), dtype=np.int32)
    target = rng.integers(1, N, size=(B,))
    for b in range(B):
        clicked[b, 0] = target[b]  # residual set contains the target
        clicked[b, 1:] = rng.choice(np.arange(1, N), size=6, replace=False)
    clicked = jnp.asarray(clicked)
    target = jnp.asarray(target, dtype=jnp.int32)

    table_sharded = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    with jax.set_mesh(mesh):
        want_v, want_i = sharded_catalog_topk(u, table_sharded, k, mesh,
                                              clicked_rows=clicked, item_bias=bias)
        want_r = sharded_catalog_ranks(u, table_sharded, target, mesh,
                                       clicked, item_bias=bias)
        monkeypatch.setattr(ptopk, "MIN_ROWS_FOR_TILED", 64)
        got_v, got_i = sharded_catalog_topk(u, table_sharded, k, mesh,
                                            clicked_rows=clicked, item_bias=bias)
        got_r = sharded_catalog_ranks(u, table_sharded, target, mesh,
                                      clicked, item_bias=bias)

    np.testing.assert_allclose(np.asarray(want_v), np.asarray(got_v), rtol=1e-5, atol=1e-6)
    diff = np.asarray(want_i) != np.asarray(got_i)
    if diff.any():  # ties only
        np.testing.assert_allclose(np.asarray(want_v)[diff], np.asarray(got_v)[diff], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(want_r), np.asarray(got_r))


def test_sharded_input_arrays_match_replicated(tmp_path):
    """--shard_input_mb: corpus arrays row-sharded over 'data' must train
    and evaluate to (near) identical results as fully replicated inputs.
    GSPMD turns the id-gathers into masked local-gather + all-reduce, so
    the math is the same; this guards the padding and placement logic."""
    import argparse

    from rechorus_tpu import registry
    from rechorus_tpu.data.batching import get_batcher
    from rechorus_tpu.data.synthetic import make_topk_dataset
    from rechorus_tpu.parallel import mesh as M

    make_topk_dataset(str(tmp_path / "Synth"), n_users=48, n_items=500,
                      n_per_user=8, n_neg=9)

    def run(shard_mb):
        args = argparse.Namespace(
            path=str(tmp_path), dataset="Synth", sep="\t",
            epoch=1, check_epoch=0, test_epoch=-1, early_stop=10, lr=1e-2, l2=1e-6,
            batch_size=32, eval_batch_size=16, optimizer="Adam", num_workers=0,
            pin_memory=0, topk="5", metric="NDCG,HR", main_metric="",
            model_path="", random_seed=0, num_neg=2, dropout=0.0, test_all=0,
            emb_size=16, history_max=6, buffer=1, num_layers=1, num_heads=2,
            data_parallel=4, model_parallel=2, shard_input_mb=shard_mb,
        )
        corpus = registry.get_reader("SeqReader")(args)
        model_cls = registry.get_model("SASRec")
        model = model_cls.from_args(args, corpus)
        runner = registry.get_runner(model_cls.runner)(args)
        batchers = {p: get_batcher(model_cls.batcher)(corpus, model, p, args)
                    for p in ["train", "dev"]}
        arrays = {p: runner.place_arrays(b.device_arrays()) for p, b in batchers.items()}
        if shard_mb == 0:
            sharded = [k for k, v in arrays["train"].items()
                       if hasattr(v, "sharding") and not v.sharding.is_fully_replicated]
            assert sharded, "no input array actually sharded at threshold 0"
        state = runner.init_state(model, batchers["train"], 0)
        for e in range(1, 3):
            state, loss = runner.fit(state, model, batchers["train"], arrays["train"],
                                     e, jax.random.key(0))
        res = runner.evaluate(state, model, batchers["dev"], arrays["dev"],
                              "dev", [5], ["HR", "NDCG"])
        return loss, res

    try:
        loss_rep, res_rep = run(-1)
        loss_sh, res_sh = run(0)
    finally:
        M.set_table_row_pad(1)
    assert np.isfinite(loss_sh)
    np.testing.assert_allclose(loss_sh, loss_rep, rtol=1e-4)
    for k in res_rep:
        np.testing.assert_allclose(res_sh[k], res_rep[k], atol=1e-6,
                                   err_msg=f"{k}: {res_sh} vs {res_rep}")


def test_host_shard_input_lazy_builds_match_eager(tmp_path):
    """--host_shard_input: history banks build per addressable 'data'
    block through LazyRows callbacks (host-sharded corpus loading) and
    train/eval identically to the eager replicated path."""
    import argparse

    from rechorus_tpu import registry
    from rechorus_tpu.data import batching as B
    from rechorus_tpu.data.batching import get_batcher
    from rechorus_tpu.data.synthetic import make_topk_dataset
    from rechorus_tpu.parallel import mesh as M

    make_topk_dataset(str(tmp_path / "Synth"), n_users=48, n_items=500,
                      n_per_user=8, n_neg=9)

    seen_ranges = []
    orig_materialize = B.LazyRows.materialize

    def spy(self, lo=0, hi=None):
        seen_ranges.append((lo, self.shape[0] if hi is None else hi))
        return orig_materialize(self, lo, hi)

    def run(host_shard):
        args = argparse.Namespace(
            path=str(tmp_path), dataset="Synth", sep="\t",
            epoch=1, check_epoch=0, test_epoch=-1, early_stop=10, lr=1e-2, l2=1e-6,
            batch_size=32, eval_batch_size=16, optimizer="Adam", num_workers=0,
            pin_memory=0, topk="5", metric="NDCG,HR", main_metric="",
            model_path="", random_seed=0, num_neg=2, dropout=0.0, test_all=0,
            emb_size=16, history_max=6, buffer=1, num_layers=1, num_heads=2,
            data_parallel=4, model_parallel=2, host_shard_input=host_shard,
        )
        corpus = registry.get_reader("SeqReader")(args)
        model_cls = registry.get_model("SASRec")
        model = model_cls.from_args(args, corpus)
        runner = registry.get_runner(model_cls.runner)(args)
        batchers = {p: get_batcher(model_cls.batcher)(corpus, model, p, args)
                    for p in ["train", "dev"]}
        raw = {p: b.device_arrays() for p, b in batchers.items()}
        if host_shard:
            assert isinstance(raw["train"]["history_items"], B.LazyRows)
        arrays = {p: runner.place_arrays(v) for p, v in raw.items()}
        state = runner.init_state(model, batchers["train"], 0)
        for e in range(1, 3):
            state, loss = runner.fit(state, model, batchers["train"], arrays["train"],
                                     e, jax.random.key(0))
        res = runner.evaluate(state, model, batchers["dev"], arrays["dev"],
                              "dev", [5], ["HR", "NDCG"])
        return loss, res

    try:
        loss_e, res_e = run(0)
        B.LazyRows.materialize = spy
        try:
            loss_l, res_l = run(1)
        finally:
            B.LazyRows.materialize = orig_materialize
    finally:
        M.set_table_row_pad(1)
    # every build was a strict sub-range (per-shard blocks, 'data'=4)
    assert seen_ranges, "LazyRows.materialize never called"
    widths = {hi - lo for lo, hi in seen_ranges}
    full = max(hi for _, hi in seen_ranges)
    assert all(w < full for w in widths), (widths, full)
    np.testing.assert_allclose(loss_l, loss_e, rtol=1e-4)
    for k in res_e:
        np.testing.assert_allclose(res_l[k], res_e[k], atol=1e-6,
                                   err_msg=f"{k}: {res_l} vs {res_e}")
