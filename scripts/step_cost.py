"""Exact per-train-step FLOPs/bytes from XLA's CPU-backend cost model.

The TPU (axon) plugin reports flops=0 for compiled executables, so
docs/PERF.md derives lane rooflines by compiling the SAME product train
step on the CPU backend (identical HLO math, reliable cost model) and
pairing those counts with the TPU-measured step times from
scripts/perf_note.py.

Usage: JAX_PLATFORMS=cpu python scripts/step_cost.py --lanes bprmf,sasrec,kda
"""
from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench


def lane_cost(lane: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rechorus_tpu.data.batching import get_batcher
    from rechorus_tpu.main import build_corpus

    model_name, flags, _ = bench.GROCERY_LANES[lane]
    args, model_cls, reader_cls, runner_cls = bench._build_args(model_name, flags)
    corpus = build_corpus(args, reader_cls)
    runner = runner_cls(args)
    model = model_cls.from_args(args, corpus)
    batcher = get_batcher(model_cls.batcher)(corpus, model, "train", args)
    arrays = runner.place_arrays(batcher.device_arrays())
    state = runner.init_state(model, batcher, 0)
    rng = jax.random.key(0)

    epoch_fn = runner._get_epoch_fn(model, batcher)
    B = args.batch_size
    # ONE scan step + no tail: cost_analysis then scales per-step
    idx_mat = jnp.arange(B, dtype=jnp.int32).reshape(1, B)
    tail = jnp.zeros((0,), jnp.int32)
    ca = epoch_fn.lower(state, arrays, idx_mat, tail, rng,
                        has_tail=False).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    n = len(batcher)
    steps = (n + B - 1) // B
    return {"lane": lane, "batch": B, "steps_per_epoch": steps,
            "flops_step": ca.get("flops"), "bytes_step": ca.get("bytes accessed"),
            "params": int(sum(np.prod(x.shape) for x in jax.tree.leaves(state.params)))}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", default="bprmf,sasrec,kda")
    a = ap.parse_args()
    for lane in a.lanes.split(","):
        r = lane_cost(lane)
        fl, by = r["flops_step"], r["bytes_step"]
        print(f"{lane}: batch={r['batch']} steps/epoch={r['steps_per_epoch']} "
              f"params={r['params']:,} "
              f"flops/step={fl/1e6:.1f}M bytes/step={by/1e6:.1f}MB "
              f"flops/epoch={fl*r['steps_per_epoch']/1e9:.2f}G "
              f"bytes/epoch={by*r['steps_per_epoch']/1e9:.2f}GB", flush=True)


if __name__ == "__main__":
    main()
