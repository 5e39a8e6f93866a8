"""Checkpoint formats: flax single-file bytes (reference torch.save
parity, BaseModel.py:75-86) vs the orbax sharded async lane
(--ckpt_format orbax). Round-trips must be bit-exact and, on a mesh,
restore straight onto the live shardings without a host gather."""
import argparse

import jax
import jax.numpy as jnp
import numpy as np

from rechorus_tpu import registry
from rechorus_tpu.data.batching import get_batcher
from rechorus_tpu.data.synthetic import make_topk_dataset
from rechorus_tpu.parallel import mesh as M


def _args(tmp_path, **over):
    base = dict(
        path=str(tmp_path), dataset="Synth", sep="\t",
        epoch=1, check_epoch=0, test_epoch=-1, early_stop=10, lr=1e-2, l2=1e-6,
        batch_size=32, eval_batch_size=16, optimizer="Adam", num_workers=0,
        pin_memory=0, topk="5", metric="NDCG,HR", main_metric="",
        model_path="", random_seed=0, num_neg=2, dropout=0.0, test_all=0,
        emb_size=16, buffer=1,
    )
    base.update(over)
    return argparse.Namespace(**base)


def _setup(tmp_path, args):
    corpus = registry.get_reader("BaseReader")(args)
    model_cls = registry.get_model("BPRMF")
    model = model_cls.from_args(args, corpus)
    runner = registry.get_runner(model_cls.runner)(args)
    batcher = get_batcher(model_cls.batcher)(corpus, model, "train", args)
    arrays = runner.place_arrays(batcher.device_arrays())
    return model, runner, batcher, arrays


def _train_some(runner, model, batcher, arrays, seed=0, epochs=2):
    state = runner.init_state(model, batcher, seed)
    for e in range(1, epochs + 1):
        state, _ = runner.fit(state, model, batcher, arrays, e, jax.random.key(0))
    return state


def test_orbax_roundtrip_matches_flax(tmp_path):
    make_topk_dataset(str(tmp_path / "Synth"), n_users=32, n_items=300,
                      n_per_user=6, n_neg=9)
    path = str(tmp_path / "ckpt" / "model.bin")

    args = _args(tmp_path, model_path=path, ckpt_format="flax")
    model, runner, batcher, arrays = _setup(tmp_path, args)
    state = _train_some(runner, model, batcher, arrays)
    runner.save_model(state)

    args_o = _args(tmp_path, model_path=path, ckpt_format="orbax")
    model_o, runner_o, batcher_o, arrays_o = _setup(tmp_path, args_o)
    runner_o.save_model(state)
    runner_o.finalize_ckpt()

    # restore each format into a FRESH differently-seeded state
    fresh = runner.init_state(model, batcher, seed=7)
    got_flax = runner.load_model(fresh)
    fresh_o = runner_o.init_state(model_o, batcher_o, seed=7)
    got_orbax = runner_o.load_model(fresh_o)

    flat_f = jax.tree.leaves(got_flax.params)
    flat_o = jax.tree.leaves(got_orbax.params)
    assert len(flat_f) == len(flat_o) > 0
    for a, b in zip(flat_f, flat_o):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and both equal the trained source state
    for a, b in zip(flat_f, jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_mesh_restore_keeps_sharding(tmp_path):
    """4x2 mesh: the row-sharded item table must come back row-sharded
    (restore onto live shardings, no replication detour) and bit-exact."""
    # >=1024 rows so the item table actually shards (and 1539 is NOT
    # divisible by model_parallel=2: exercises the row-pad path too)
    make_topk_dataset(str(tmp_path / "Synth"), n_users=32, n_items=1538,
                      n_per_user=6, n_neg=9)
    path = str(tmp_path / "ckpt" / "mesh.bin")
    try:
        args = _args(tmp_path, model_path=path, ckpt_format="orbax",
                     data_parallel=4, model_parallel=2)
        model, runner, batcher, arrays = _setup(tmp_path, args)
        state = _train_some(runner, model, batcher, arrays)
        runner.save_model(state)
        runner.finalize_ckpt()

        fresh = runner.init_state(model, batcher, seed=7)
        got = runner.load_model(fresh)
        for (ka, a), (kb, b) in zip(
                sorted(jax.tree_util.tree_leaves_with_path(state.params), key=lambda t: str(t[0])),
                sorted(jax.tree_util.tree_leaves_with_path(got.params), key=lambda t: str(t[0]))):
            assert ka == kb
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            assert a.sharding == b.sharding, (ka, a.sharding, b.sharding)
        sharded = [x for x in jax.tree.leaves(got.params)
                   if not x.sharding.is_fully_replicated]
        assert sharded, "expected at least one row-sharded table after restore"

        # training continues from the restored state (donation-safe)
        cont, loss = runner.fit(got, model, batcher, arrays, 3, jax.random.key(1))
        assert np.isfinite(loss)
    finally:
        M.set_table_row_pad(1)
