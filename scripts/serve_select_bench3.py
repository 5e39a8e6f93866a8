"""Recall sweep for the verified-approx select (r5 follow-up #2).

bench2 showed recall 0.95 -> 73% row-failures (fallback always) and 0.99
-> 0 failures but ~320 ms approx cost (slower than direct top_k!). This
sweeps the intermediate recall targets: per-target approx cost + count
pass cost + failed-row count on Gaussian bucket maxes, plus the final
e2e number with the chosen config.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=3):
    @jax.jit
    def loop(*a):
        def body(carry, _):
            out = fn(*((a[0] + 0.0 * carry,) + a[1:]))
            s = sum(jnp.sum(o.astype(jnp.float32)) for o in jax.tree_util.tree_leaves(out))
            return carry + s - s, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return c

    float(np.asarray(loop(*args)))
    t0 = time.perf_counter()
    float(np.asarray(loop(*args)))
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--b", type=int, default=4096)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--m", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--recalls", default="0.96,0.97,0.98")
    a = ap.parse_args()

    from rechorus_tpu.ops import pallas_topk as PT

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(a.b, a.d)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(a.n, a.d)).astype(np.float32))
    kk = a.k + a.m
    bm = PT.fused_bucket_max(u, table, bucket=16)
    G = bm.shape[1]
    kk_o = min(G, 2 * kk + 16)

    for recall in [float(x) for x in a.recalls.split(",")]:
        dt = timed(lambda x: jax.lax.approx_max_k(x, kk_o, recall_target=recall),
                   bm, reps=a.reps)
        v, ids = jax.lax.approx_max_k(bm, kk_o, recall_target=recall)
        tau = v[:, kk - 1]
        fails = int(np.asarray(
            ((bm >= tau[:, None]).sum(1) != (v >= tau[:, None]).sum(1)).sum()))
        print(json.dumps({"recall": recall, "kk_o": kk_o,
                          "approx_ms": round(dt * 1e3, 2),
                          "failed_rows": fails, "total": a.b}), flush=True)


if __name__ == "__main__":
    main()
