"""Roofline / MFU measurement for the flagship lanes (VERDICT r2 item 6).

For each lane: compile the REAL product train step (runner.fit's inner
scan over one epoch), pull XLA's own cost model (flops + bytes accessed)
from the compiled executable, measure wall-clock, and derive achieved
TFLOP/s and GB/s as a fraction of chip peaks -> name each lane compute-
or memory- or latency-bound. Prints a markdown table; docs/PERF.md
records the results with the arithmetic.

Chip peaks default to TPU v5e (v5 lite): 197 TFLOP/s bf16 / ~49 TFLOP/s
f32 MXU, 819 GB/s HBM. Override with --peak_tflops/--peak_gbs.

Usage: python scripts/perf_note.py [--lanes bprmf,sasrec,kda] [--profile DIR]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench  # reuse lane configs + arg builder


def jnp_zeros():
    import jax.numpy as jnp

    return jnp.zeros((0,), jnp.int32)


def measure_lane(lane: str, profile_dir: str = ""):
    import jax
    import numpy as np

    from rechorus_tpu.data.batching import get_batcher
    from rechorus_tpu.main import build_corpus, enable_compilation_cache

    model_name, flags, ref_s = bench.GROCERY_LANES[lane]
    args, model_cls, reader_cls, runner_cls = bench._build_args(model_name, flags)
    enable_compilation_cache(args)
    corpus = build_corpus(args, reader_cls)
    runner = runner_cls(args)
    model = model_cls.from_args(args, corpus)
    batcher = get_batcher(model_cls.batcher)(corpus, model, "train", args)
    arrays = runner.place_arrays(batcher.device_arrays())
    state = runner.init_state(model, batcher, 0)
    rng = jax.random.key(0)

    state, _ = runner.fit(state, model, batcher, arrays, 0, rng)  # compile
    jax.block_until_ready(state.params)

    # XLA's own cost model for the jitted epoch fn (same args fit passes)
    flops = bytes_ac = None
    try:
        epoch_fn = runner._compiled["train"]
        n, B = len(batcher), args.batch_size
        n_full, n_tail = n // B, n % B
        perm = np.arange(n)
        idx_mat = runner._place_index_matrix(
            perm[: n_full * B].reshape(n_full, B).astype(np.int32))
        tail_idx = runner._place_index_matrix(perm[n_full * B:].astype(np.int32)) \
            if n_tail else jnp_zeros()
        ca = epoch_fn.lower(state, arrays, idx_mat, tail_idx, rng,
                            has_tail=bool(n_tail)).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops, bytes_ac = ca.get("flops"), ca.get("bytes accessed")
    except Exception as e:  # cost model is best-effort; timing still prints
        print(f"[perf] cost_analysis unavailable for {lane}: {e!r}", flush=True)

    n_epochs = 5
    t0 = time.perf_counter()
    acc = 0.0
    for e in range(1, n_epochs + 1):
        state, loss = runner.fit(state, model, batcher, arrays, e, rng)
        acc += float(np.asarray(loss))
    dt = (time.perf_counter() - t0) / n_epochs

    if profile_dir:
        with jax.profiler.trace(os.path.join(profile_dir, lane)):
            state, loss = runner.fit(state, model, batcher, arrays, 99, rng)
            jax.block_until_ready(state.params)

    n_ex = len(batcher)
    steps = max(1, (n_ex + args.batch_size - 1) // args.batch_size)
    return {"lane": lane, "model": model_name, "s_epoch": dt, "steps": steps,
            "ex_s": n_ex / dt, "us_step": dt / steps * 1e6,
            "flops": flops, "bytes": bytes_ac}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", default="bprmf,sasrec,kda")
    ap.add_argument("--profile", default="")
    ap.add_argument("--peak_tflops", type=float, default=49.0,
                    help="f32 MXU peak (models run f32 at these shapes)")
    ap.add_argument("--peak_gbs", type=float, default=819.0)
    a = ap.parse_args()
    if a.profile:
        os.makedirs(a.profile, exist_ok=True)

    rows = []
    for lane in a.lanes.split(","):
        r = measure_lane(lane, a.profile)
        rows.append(r)
        print(f"[perf] {lane}: {r['s_epoch']:.4f} s/epoch, {r['us_step']:.0f} us/step, "
              f"{r['ex_s']:.0f} ex/s", flush=True)

    print("\n| lane | s/epoch | us/step | ex/s | XLA GFLOP/epoch | XLA GB/epoch | "
          "TFLOP/s (%peak) | GB/s (%peak) |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        fl = r["flops"]; by = r["bytes"]
        tf = fl / r["s_epoch"] / 1e12 if fl else None
        gb = by / r["s_epoch"] / 1e9 if by else None
        print("| {} | {:.3f} | {:.0f} | {:.0f} | {} | {} | {} | {} |".format(
            r["lane"], r["s_epoch"], r["us_step"], r["ex_s"],
            f"{fl/1e9:.1f}" if fl else "n/a",
            f"{by/1e9:.2f}" if by else "n/a",
            f"{tf:.2f} ({100*tf/a.peak_tflops:.1f}%)" if tf else "n/a",
            f"{gb:.0f} ({100*gb/a.peak_gbs:.1f}%)" if gb else "n/a"))


if __name__ == "__main__":
    main()
