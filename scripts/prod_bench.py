"""Production-scale throughput benchmark (single chip).

The research datasets (9k-item catalogs) undersell the design; this
measures the regime the framework targets: 200k users x 1M items,
batch 4096, device-side negative sampling -- training examples/s and
full-catalog top-100 serving rate.

Lanes (select via flags; `--compare 1` runs dense-Adam then the packed
lazy+sparse+bf16 lane in ONE process so bench.py pays the TPU-client
setup once):

  train (default)   training examples/s with the optimizer lane chosen
                    by --lazy_adam/--sparse_grad/--packed/--bf16
  --compare 1       dense lane, then packed [p|mu|nu] lane, both emitted
  --serve LIST      comma list of dense_exact,dense_approx,tiled_exact,
                    tiled_approx full-catalog top-100 serving benches
                    ("all" = every lane that fits the catalog size)

Measured on 1 TPU chip (2026-08-17, 2M interactions): ~1.39M train
examples/s on 100k items; round 3 (1M items): dense 434k ex/s, packed
sparse lane 1.21M ex/s; serving 30.6k users/s exact / 280k approx at
100k items.
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _enable_cache():
    """Persistent XLA compilation cache (same dir as main.py's default) so
    repeated driver/bench runs skip recompiles of the big scatter programs."""
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/rechorus_tpu_xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def run_train(a, users, items, idx_mat, *, lazy, sparse, packed, bf16, label=""):
    """Build a fresh BPRMF model at (users,items,emb) and time `a.epochs`
    jitted-scan epochs with the requested optimizer lane. Returns ex/s."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from rechorus_tpu.ops import losses, sampling
    from rechorus_tpu.registry import get_model
    from rechorus_tpu.runners.base import TrainState, build_optimizer

    U, I, D, B = a.users, a.items, a.emb_size, a.batch_size
    clicked = jnp.zeros((U, 1), dtype=jnp.int32)

    from rechorus_tpu.ops.layers import set_table_dtype

    # the dtype global is read at every module-construction (trace) time,
    # so it must stay set for the whole lane; each run_train call re-asserts
    # it at entry, so back-to-back lanes (--compare) never leak the setting
    set_table_dtype(jnp.bfloat16 if bf16 else None)
    model = get_model("BPRMF")(user_num=U, item_num=I, emb_size=D, num_neg=1)
    feed0 = {"user_id": users[: B],
             "item_id": jnp.stack([items[: B], items[B: 2 * B]], 1)}
    params = model.init({"params": jax.random.key(0)}, feed0,
                        training=False)["params"]
    tx = build_optimizer("Adam", 1e-3, 1e-6)
    state = TrainState(params=params, extra_vars={}, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))

    if lazy:
        from rechorus_tpu.ops.lazy_adam import LazyAdamTx, lazy_adam_step, resolve_lazy_rows
        from rechorus_tpu.runners.base import _decay_mask

        tx = LazyAdamTx(1e-3, 1e-6, decay_mask=_decay_mask)
        state = state.replace(opt_state=tx.init(params))
        specs = model.lazy_table_specs()

    def step_fn(state, xs):
        u, t, key = xs
        neg = sampling.sample_negatives(key, u, clicked, 1, I)
        feed = {"user_id": u, "item_id": jnp.concatenate([t[:, None], neg], 1)}

        def loss_fn(p):
            out = model.apply({"params": p}, feed, training=True)
            return losses.bpr_multi_neg(out["prediction"])

        if lazy and sparse and packed:
            from rechorus_tpu.ops import layers as L
            from rechorus_tpu.ops.lazy_adam import (
                _get as _tget, _set as _tset,
                lazy_adam_sparse_step_packed, packed_rows_and_vals,
                split_params)

            rows_map = resolve_lazy_rows(specs, state.params, feed)
            rows_info, gathered, vals0 = packed_rows_and_vals(state.params, rows_map)
            view_params = state.params
            fb_tables = {}
            for _p in rows_map:
                _pk = _tget(state.params, _p)
                fb_tables[_p] = jax.lax.stop_gradient(_pk)
                view_params = _tset(view_params, _p,
                                    jnp.zeros((_pk.shape[0], _pk.shape[1] // 3),
                                              jnp.float32))
            rest0, reassemble = split_params(view_params, list(rows_map))

            def sparse_loss_fn(vals, rest):
                L.set_sparse_lookup({p: (rows_info[p][0], vals[p], fb_tables[p],
                                         rows_info[p][2])
                                     for p in rows_info})
                try:
                    return loss_fn(reassemble(rest))
                finally:
                    L.set_sparse_lookup(None)

            loss, (g_vals, g_rest) = jax.value_and_grad(
                sparse_loss_fn, argnums=(0, 1))(vals0, rest0)
            new_params, new_opt = lazy_adam_sparse_step_packed(
                tx, state.params, state.opt_state, rows_info, gathered, g_vals, g_rest)
            return state.replace(params=new_params, opt_state=new_opt,
                                 step=state.step + 1), loss
        if lazy and sparse:
            from rechorus_tpu.ops import layers as L
            from rechorus_tpu.ops.lazy_adam import (
                lazy_adam_sparse_step, sparse_rows_and_vals, split_params)

            rows_map = resolve_lazy_rows(specs, state.params, feed)
            rows_info, vals0 = sparse_rows_and_vals(state.params, rows_map)
            rest0, reassemble = split_params(state.params, list(rows_map))

            def sparse_loss_fn(vals, rest):
                L.set_sparse_lookup({p: (rows_info[p][0], vals[p], None,
                                         rows_info[p][2]) for p in rows_info})
                try:
                    return loss_fn(reassemble(rest))
                finally:
                    L.set_sparse_lookup(None)

            loss, (g_vals, g_rest) = jax.value_and_grad(
                sparse_loss_fn, argnums=(0, 1))(vals0, rest0)
            new_params, new_opt = lazy_adam_sparse_step(
                tx, state.params, state.opt_state, rows_info, vals0, g_vals, g_rest)
            return state.replace(params=new_params, opt_state=new_opt,
                                 step=state.step + 1), loss
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        if lazy:
            rows_map = resolve_lazy_rows(specs, state.params, feed)
            new_params, new_opt = lazy_adam_step(tx, state.params, grads,
                                                 state.opt_state, rows_map)
            return state.replace(params=new_params, opt_state=new_opt,
                                 step=state.step + 1), loss
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        return state.replace(params=optax.apply_updates(state.params, updates),
                             opt_state=new_opt, step=state.step + 1), loss

    pack_paths = []
    if lazy and sparse and packed:
        pack_paths = list(resolve_lazy_rows(specs, state.params, feed0))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch(state, idx_mat, key):
        keys = jax.random.split(key, idx_mat.shape[0])
        if pack_paths:
            from rechorus_tpu.ops.lazy_adam import (
                pack_lazy_leaves, unpack_lazy_leaves)

            params, opt, dts = pack_lazy_leaves(state.params, state.opt_state,
                                                pack_paths)
            state = state.replace(params=params, opt_state=opt)
        # gather the epoch's per-step ids ONCE up front: gathering [B]
        # from the [n_inter] arrays inside the scan made XLA re-stage the
        # big arrays every step (6 async 500k-elem slice streams/step in
        # the round-3 trace)
        state, losses = jax.lax.scan(step_fn, state,
                                     (users[idx_mat], items[idx_mat], keys))
        if pack_paths:
            params, opt = unpack_lazy_leaves(state.params, state.opt_state, dts)
            state = state.replace(params=params, opt_state=opt)
        return state, losses

    n_steps = idx_mat.shape[0]
    state, _ = epoch(state, idx_mat, jax.random.key(0))
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for e in range(a.epochs):
        state, _ = epoch(state, idx_mat, jax.random.key(e))
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / a.epochs
    if a.profile:
        with jax.profiler.trace(a.profile):
            state, _ = epoch(state, idx_mat, jax.random.key(99))
            jax.block_until_ready(state.params)
    row = {"train_examples_per_s": round(n_steps * a.batch_size / dt),
           "s_per_epoch": round(dt, 3),
           "lazy_adam": int(lazy), "sparse_grad": int(sparse),
           "params_M": round(sum(x.size for x in
                                 jax.tree_util.tree_leaves(state.params)) / 1e6, 1)}
    if label:
        row["lane"] = label
    print(json.dumps(row), flush=True)
    return state


def run_serve(a, state, serve_lanes):
    """Full-catalog top-100 serving rate. T batches scanned in ONE call so
    the tunnel RPC amortizes; the dependent scalar defeats async timing."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rechorus_tpu.ops.topk import group_table_for_rescore, tiled_catalog_topk

    rng = np.random.default_rng(1)
    T, B, I = 20, a.batch_size, a.items
    serve_users = jnp.asarray(rng.integers(1, a.users, size=(T, B)), dtype=jnp.int32)

    def serve_bench(label, body, grouped=False):
        @jax.jit
        def run(params, serve_users):
            it = params["i_embeddings"]["embedding"]
            ut = params["u_embeddings"]["embedding"]
            # grouped-slice rescore copy built ONCE outside the batch scan
            # (mirrors runners/base.py predict_topk's prologue)
            g = group_table_for_rescore(it) if grouped else None

            def step(carry, ids):
                v, i = body(ut[ids], it, g)
                return carry + i.sum() + v.sum().astype(jnp.float32), None

            acc, _ = jax.lax.scan(step, jnp.float32(0), serve_users)
            return acc

        float(np.asarray(run(state.params, serve_users)))  # compile
        t0 = time.perf_counter()
        float(np.asarray(run(state.params, serve_users)))
        dt = (time.perf_counter() - t0) / T
        print(json.dumps({label: round(B / dt), "catalog": I}), flush=True)
        return B / dt

    if "dense_exact" in serve_lanes and I <= 200_000:
        serve_bench("serving_users_per_s_full_catalog_top100_dense_exact",
                    lambda u, it, g: jax.lax.top_k(u @ it.T, 100))
    if "dense_approx" in serve_lanes and I <= 200_000:
        serve_bench("serving_users_per_s_full_catalog_top100_dense_approx",
                    lambda u, it, g: jax.lax.approx_max_k(
                        u.astype(jnp.bfloat16) @ it.astype(jnp.bfloat16).T, 100,
                        recall_target=0.98))
    # product lanes (runners/base.py predict_topk routes here for
    # catalogs >= ops.topk.MIN_ROWS_FOR_TILED): hierarchical exact
    # streaming top-k, and the bucket-approx fast lane
    if "tiled_exact" in serve_lanes:
        serve_bench("serving_users_per_s_full_catalog_top100_tiled_exact",
                    lambda u, it, g: tiled_catalog_topk(u, it, 100, grouped_table=g),
                    grouped=True)
    if "tiled_approx" in serve_lanes:
        serve_bench("serving_users_per_s_full_catalog_top100_tiled_approx",
                    lambda u, it, g: tiled_catalog_topk(u, it, 100, approx=True,
                                                        recall_target=0.98,
                                                        grouped_table=g),
                    grouped=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=200_000)
    ap.add_argument("--items", type=int, default=100_000)
    ap.add_argument("--emb_size", type=int, default=64)
    ap.add_argument("--batch_size", type=int, default=4096)
    ap.add_argument("--interactions", type=int, default=2_000_000)
    ap.add_argument("--epochs", type=int, default=3, help="timing epochs")
    ap.add_argument("--train", type=int, default=1, help="run the training lane")
    ap.add_argument("--compare", type=int, default=0,
                    help="run dense Adam AND the packed lazy+sparse+bf16 lane "
                         "in one process (ignores the per-lane flags below)")
    ap.add_argument("--lazy_adam", type=int, default=0,
                    help="Benchmark the --lazy_emb_adam lane (touched-rows "
                         "optimizer updates, ops/lazy_adam.py)")
    ap.add_argument("--bf16", type=int, default=0,
                    help="Benchmark --bf16_emb storage (with --lazy_adam)")
    ap.add_argument("--sparse_grad", type=int, default=0,
                    help="Benchmark the --sparse_emb_grad lane (row-block "
                         "cotangents, no dense table grad; with --lazy_adam)")
    ap.add_argument("--packed", type=int, default=1,
                    help="With --sparse_grad: packed [p|mu|nu] epoch carry "
                         "(one row gather + one row scatter per table per "
                         "step; runners/base.py --packed_opt_rows lane)")
    ap.add_argument("--serve", default="auto",
                    help="comma list of dense_exact,dense_approx,tiled_exact,"
                         "tiled_approx serving lanes; 'all'; 'auto' = all "
                         "when the training lane is dense (legacy behavior); "
                         "'' = none")
    ap.add_argument("--profile", default="",
                    help="capture a jax.profiler trace of one steady epoch here")
    a = ap.parse_args()

    _enable_cache()
    import jax  # noqa: F401  (client init before timers)
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    n_inter = a.interactions
    users = jnp.asarray(rng.integers(1, a.users, size=n_inter), dtype=jnp.int32)
    items = jnp.asarray(rng.integers(1, a.items, size=n_inter), dtype=jnp.int32)
    n_steps = n_inter // a.batch_size
    idx_mat = jnp.asarray(
        rng.permutation(n_inter)[: n_steps * a.batch_size].reshape(n_steps, a.batch_size),
        dtype=jnp.int32)

    state = None
    if a.compare:
        run_train(a, users, items, idx_mat,
                  lazy=False, sparse=False, packed=False, bf16=False, label="dense")
        run_train(a, users, items, idx_mat,
                  lazy=True, sparse=True, packed=True, bf16=True, label="packed")
    elif a.train:
        state = run_train(a, users, items, idx_mat,
                          lazy=bool(a.lazy_adam), sparse=bool(a.sparse_grad),
                          packed=bool(a.packed), bf16=bool(a.bf16))

    serve = a.serve
    if serve == "auto":
        # legacy behavior: dense training lane also benchmarks serving
        serve = "all" if (a.train and not a.compare and not a.lazy_adam) else ""
    if serve:
        lanes = ("dense_exact,dense_approx,tiled_exact,tiled_approx"
                 if serve == "all" else serve).split(",")
        if state is None:
            from rechorus_tpu.registry import get_model

            model = get_model("BPRMF")(user_num=a.users, item_num=a.items,
                                       emb_size=a.emb_size, num_neg=1)
            feed0 = {"user_id": users[: a.batch_size],
                     "item_id": jnp.stack([items[: a.batch_size],
                                           items[a.batch_size: 2 * a.batch_size]], 1)}
            params = model.init({"params": jax.random.key(0)}, feed0,
                                training=False)["params"]

            class _S:  # minimal state shim for run_serve
                pass

            state = _S()
            state.params = params
        run_serve(a, state, lanes)


if __name__ == "__main__":
    main()
