"""Stage microbench for the 1M-item serve select bound (VERDICT r4 item 2).

At catalog 1M (B=4096, D=64, k=100) both serve lanes are SELECT-bound,
not matmul-bound (PERF.md r4): the exact lane's `_exact_bucket_select`
two-level row-gather over the [B, 62592] bucket-max matrix and the approx
lane's per-128k-tile `approx_max_k` PartialReduce dominate the ~200 ms
batch. This bench times each candidate select strategy on the REAL chip
so the product routing is measurement-driven:

  bucket_max      fused pallas stage 1 (bucket 16/32)
  direct_topk     full-width `lax.top_k` on the bucket-max matrix at
                  several widths (the exact select since r5; the
                  two-level `_exact_bucket_select` this bench originally
                  measured was deleted -- see ops/topk.py's graveyard)
  approx_bm       `lax.approx_max_k` on the bucket-max matrix
  count_pass      one streaming `>= tau` count over the matrix (the
                  verify step of approx-select-with-exact-fallback)
  e2e             current product tiled_catalog_topk exact/approx

Timing: T reps inside ONE jit (lax.scan), each rep's input perturbed by
0*carry so XLA cannot hoist it; the dependent output is materialized
(np.asarray) -- the only reliable protocol through the tunnel-attached
chip (docs/PERF.md methodology).
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
    """Compile once, then run `reps` dependent iterations in one jit."""

    @jax.jit
    def loop(*a):
        def body(carry, _):
            out = fn(*((a[0] + 0.0 * carry,) + a[1:]))
            s = sum(jnp.sum(o.astype(jnp.float32)) for o in jax.tree_util.tree_leaves(out))
            return carry + 0.0 * s + s * 0.0 + s - s, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return c

    r = loop(*args)
    float(np.asarray(r))  # compile + warm
    t0 = time.perf_counter()
    float(np.asarray(loop(*args)))
    dt = (time.perf_counter() - t0) / reps
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--b", type=int, default=4096)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--m", type=int, default=50, help="clicked width")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--stages", default="all")
    a = ap.parse_args()

    from rechorus_tpu.ops import pallas_topk as PT
    from rechorus_tpu.ops import topk as topk_ops

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(a.b, a.d)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(a.n, a.d)).astype(np.float32))
    clicked = jnp.asarray(rng.integers(1, a.n, size=(a.b, a.m)), dtype=jnp.int32)
    kk = a.k + a.m
    stages = a.stages.split(",") if a.stages != "all" else [
        "bucket_max", "direct_topk", "approx_bm", "count_pass", "e2e"]

    def emit(name, dt, **kw):
        print(json.dumps({"stage": name, "ms": round(dt * 1e3, 2),
                          "users_per_s": round(a.b / dt), **kw}), flush=True)

    bms = {}
    for bucket in (16, 32):
        if "bucket_max" in stages or "direct_topk" in stages \
                or "approx_bm" in stages or "count_pass" in stages:
            fn = lambda uu, bb=bucket: PT.fused_bucket_max(uu, table, bucket=bb)
            if "bucket_max" in stages:
                dt = timed(fn, u, reps=a.reps)
                emit("bucket_max", dt, bucket=bucket, width=int(fn(u).shape[1]))
            bms[bucket] = fn(u)

    bm = bms.get(16)
    if bm is not None:
        G = bm.shape[1]
        # ("two_level" stage removed with ops.topk._exact_bucket_select;
        # its measurements live in docs/PERF.md r5 and the graveyard
        # comment in ops/topk.py)
        if "direct_topk" in stages:
            for w in (6250, 16384, 31296, G):
                sub = bm[:, :w]
                dt = timed(lambda x: jax.lax.top_k(x, kk), sub, reps=a.reps)
                emit("direct_topk", dt, width=w, kk=kk)
        if "approx_bm" in stages:
            for mult in (1, 2):
                dt = timed(lambda x: jax.lax.approx_max_k(x, kk * mult,
                                                          recall_target=0.95),
                           bm, reps=a.reps)
                emit("approx_bm", dt, width=G, kk=kk * mult)
        if "count_pass" in stages:
            tau = bm[:, 1000]
            dt = timed(lambda x: jnp.sum(x >= tau[:, None], axis=1), bm, reps=a.reps)
            emit("count_pass", dt, width=G)
        if "direct_topk" in stages and 32 in bms:
            dt = timed(lambda x: jax.lax.top_k(x, kk), bms[32], reps=a.reps)
            emit("direct_topk_b32", dt, width=int(bms[32].shape[1]), kk=kk)

    if "recall" in stages:
        # effective ITEM recall of the bucket-approx lane vs exact, at a
        # smaller B (one batch suffices for a recall estimate)
        grouped = topk_ops.group_table_for_rescore(table)
        us = u[:512]
        ev, ei = topk_ops.tiled_catalog_topk(us, table, a.k, n_valid=a.n,
                                             grouped_table=grouped)
        ei = np.asarray(ei)
        for rt in (0.95, 0.98):
            _, ai = topk_ops.tiled_catalog_topk(us, table, a.k, n_valid=a.n,
                                                approx=True, recall_target=rt,
                                                grouped_table=grouped)
            ai = np.asarray(ai)
            rec = np.mean([len(set(ai[b]) & set(ei[b])) / a.k
                           for b in range(ei.shape[0])])
            print(json.dumps({"stage": "bucket_approx_item_recall",
                              "recall_target": rt,
                              "measured_recall": round(float(rec), 4)}),
                  flush=True)

    if "e2e" in stages:
        # NB the grouped copy must be built INSIDE the jit from the table
        # (like the product paths do): closing over the 256 MB array
        # embeds it in the compile payload and the axon tunnel rejects
        # the RPC with HTTP 413
        for approx in (False, True):
            for grouped in (False, True):
                def fn(uu, ap_=approx, g_=grouped):
                    gt = topk_ops.group_table_for_rescore(table) if g_ else None
                    return topk_ops.tiled_catalog_topk(
                        uu, table, a.k, clicked_rows=clicked, n_valid=a.n,
                        approx=ap_, grouped_table=gt)
                dt = timed(fn, u, reps=a.reps)
                emit("e2e_product", dt, approx=approx, grouped=grouped)


if __name__ == "__main__":
    main()
