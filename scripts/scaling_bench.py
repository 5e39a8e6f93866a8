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
    """Product path: the runner owns the mesh (--data_parallel/
    --model_parallel), shards state + batches itself."""
    import copy

    import jax

    from rechorus_tpu import registry
    from rechorus_tpu.data.batching import get_batcher
    from rechorus_tpu.parallel import mesh as M

    args = copy.deepcopy(base_args)
    args.model_parallel = 2 if n_devices % 2 == 0 and n_devices >= 4 else 1
    args.data_parallel = n_devices // args.model_parallel
    try:
        model_cls = registry.get_model(model_name)
        runner = registry.get_runner(model_cls.runner)(args)  # builds mesh, sets row pad
        model = model_cls.from_args(args, corpus)
        batcher = get_batcher(model_cls.batcher)(corpus, model, "train", args)
        state = runner.init_state(model, batcher, 0)
        arrays = runner.place_arrays(batcher.device_arrays())
        key = jax.random.key(0)
        state, loss = runner.fit(state, model, batcher, arrays, 0, key)  # compile
        n_epochs = 3
        t0 = time.perf_counter()
        for e in range(1, n_epochs + 1):
            state, loss = runner.fit(state, model, batcher, arrays, e, key)
        # fit's float(loss) already syncs the whole epoch
        return (time.perf_counter() - t0) / n_epochs, len(batcher)
    finally:
        M.set_table_row_pad(1)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="SASRec")
    parser.add_argument("--sizes", type=str, default="1,2,4,8")
    parser.add_argument("--dataset", type=str, default="")
    parser.add_argument("--path", type=str, default="data/")
    parser.add_argument("--batch_size", type=int, default=256)
    args = parser.parse_args()

    # the image's TPU init hook overrides JAX_PLATFORMS; re-assert it and
    # size the virtual CPU device pool to the largest requested mesh
    sizes = [int(x) for x in args.sizes.split(",")]
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", max(sizes))

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
    for n in sizes:
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
