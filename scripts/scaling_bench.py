"""Scaling-efficiency harness: epoch throughput vs mesh size.

The reference has no distributed mode to compare against (SURVEY.md §2:
single device only); this measures OUR data-parallel scaling: the same
global corpus, batch sharded over the 'data' axis, embedding tables
row-sharded over 'model'. Target: >=80% parallel efficiency from 1 chip
to a slice.

On a real slice, run as-is. Without one, validate functionally on a
virtual CPU mesh:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/scaling_bench.py --model SASRec --sizes 1,2,4,8

Prints one JSON line per mesh size:
  {"n_devices": N, "s_per_epoch": t, "examples_per_s": r, "efficiency": e}
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(n_devices: int, model_name: str, corpus, base_args) -> float:
    import jax

    from rechorus_tpu import registry
    from rechorus_tpu.data.batching import get_batcher
    from rechorus_tpu.parallel.mesh import make_mesh, replicated, shard_params

    model_cls = registry.get_model(model_name)
    model = model_cls.from_args(base_args, corpus)
    runner = registry.get_runner(model_cls.runner)(base_args)
    batcher = get_batcher(model_cls.batcher)(corpus, model, "train", base_args)

    mesh = make_mesh(n_devices)
    with jax.set_mesh(mesh):
        state = runner.init_state(model, batcher, 0)
        state = state.replace(params=shard_params(state.params, mesh))
        arrays = {k: jax.device_put(v, replicated(mesh))
                  for k, v in batcher.device_arrays().items()}
        key = jax.random.key(0)
        state, _ = runner.fit(state, model, batcher, arrays, 0, key)  # compile
        jax.block_until_ready(state.params)
        n_epochs = 3
        t0 = time.perf_counter()
        for e in range(1, n_epochs + 1):
            state, _ = runner.fit(state, model, batcher, arrays, e, key)
        jax.block_until_ready(state.params)
        return (time.perf_counter() - t0) / n_epochs, len(batcher)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="SASRec")
    parser.add_argument("--sizes", type=str, default="1,2,4,8")
    parser.add_argument("--dataset", type=str, default="")
    parser.add_argument("--path", type=str, default="data/")
    parser.add_argument("--batch_size", type=int, default=256)
    args = parser.parse_args()

    from rechorus_tpu import registry
    from rechorus_tpu.data.synthetic import make_topk_dataset

    if not args.dataset:
        tmp = tempfile.mkdtemp(prefix="scale_")
        make_topk_dataset(os.path.join(tmp, "Synth"), n_users=2000, n_items=4096,
                          n_per_user=16, n_neg=9)
        args.path, args.dataset = tmp, "Synth"

    base_args = argparse.Namespace(
        path=args.path, dataset=args.dataset, sep="\t",
        epoch=1, check_epoch=0, test_epoch=-1, early_stop=10, lr=1e-3, l2=1e-6,
        batch_size=args.batch_size, eval_batch_size=args.batch_size, optimizer="Adam",
        num_workers=0, pin_memory=0, topk="5", metric="NDCG,HR", main_metric="",
        model_path="", random_seed=0, num_neg=2, dropout=0.0, test_all=0,
        emb_size=64, history_max=20, buffer=1, num_layers=1, num_heads=2,
    )
    model_cls = registry.get_model(args.model)
    corpus = registry.get_reader(model_cls.reader)(base_args)

    base_rate = None
    for n in [int(x) for x in args.sizes.split(",")]:
        t, n_ex = run_one(n, args.model, corpus, base_args)
        rate = n_ex / t
        if base_rate is None:
            base_rate = rate
        print(json.dumps({
            "n_devices": n,
            "s_per_epoch": round(t, 4),
            "examples_per_s": round(rate),
            "efficiency": round(rate / (base_rate * n), 3),
        }))


if __name__ == "__main__":
    main()
