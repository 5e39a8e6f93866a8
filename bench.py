"""Benchmark: BPRMF training throughput on Grocery_and_Gourmet_Food.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's published time-per-training-iteration for BPRMF
on this dataset is 2.5 s (BASELINE.md §1, docs/demo_scripts_results/
README.md:47; torch 1.12 on an unspecified GPU at "~90% utilization").
We measure the same quantity -- wall-clock seconds per training epoch
(92.5k examples, batch 256, 1 negative) -- after compilation, and report
vs_baseline = 2.5 / ours (higher is better).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_S_PER_ITER = 2.5


def main():
    import argparse

    import jax
    import numpy as np

    from rechorus_tpu import registry
    from rechorus_tpu.data.batching import get_batcher

    root = os.path.dirname(os.path.abspath(__file__))
    data_path = os.path.join(root, "data")
    dataset = "Grocery_and_Gourmet_Food"
    if not os.path.exists(os.path.join(data_path, dataset, "dev.csv")):
        import subprocess

        subprocess.run([sys.executable, os.path.join(root, "scripts", "prepare_grocery.py")], check=True)

    args = argparse.Namespace(
        path=data_path, dataset=dataset, sep="\t",
        epoch=5, check_epoch=0, test_epoch=-1, early_stop=10, lr=1e-3, l2=1e-6,
        batch_size=256, eval_batch_size=256, optimizer="Adam", num_workers=0,
        pin_memory=0, topk="5,10", metric="NDCG,HR", main_metric="",
        model_path="", random_seed=0, num_neg=1, dropout=0.0, test_all=0,
        emb_size=64, buffer=1,
    )
    reader_cls = registry.get_reader("BaseReader")
    corpus = reader_cls(args)
    model_cls = registry.get_model("BPRMF")
    model = model_cls.from_args(args, corpus)
    runner = registry.get_runner(model_cls.runner)(args)
    batcher = get_batcher(model_cls.batcher)(corpus, model, "train", args)
    arrays = runner.place_arrays(batcher.device_arrays())  # resolves LazyRows
    state = runner.init_state(model, batcher, 0)
    rng = jax.random.key(0)

    # warmup (compile)
    state, _ = runner.fit(state, model, batcher, arrays, 0, rng)
    jax.block_until_ready(state.params)

    n_epochs = 5
    t0 = time.perf_counter()
    acc = 0.0
    for e in range(1, n_epochs + 1):
        state, loss = runner.fit(state, model, batcher, arrays, e, rng)
        # materialize a scalar that depends on the epoch's compute:
        # block_until_ready alone under-reports through the TPU tunnel
        acc += float(np.asarray(loss))
    dt = (time.perf_counter() - t0) / n_epochs

    print(json.dumps({
        "metric": "BPRMF Grocery s/train-epoch (batch 256, 92.5k ex)",
        "value": round(dt, 4),
        "unit": "s",
        "vs_baseline": round(REFERENCE_S_PER_ITER / dt, 2),
    }))


if __name__ == "__main__":
    main()
