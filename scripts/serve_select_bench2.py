"""Round-5 follow-up microbench: rescore + select alternatives at 1M.

serve_select_bench.py showed select candidates (approx_bm 23 ms vs
two-level 190 / direct 144), but e2e barely moved -- hypothesis: (a) the
verified-approx select's per-ROW failure rate makes the whole-batch cond
fall back nearly always, and (b) the stage-2 rescore row-gather
([B, kk*bucket] rows from [1M, D]) is its own ~110 ms transaction-bound
floor. This bench measures:

  fallback_rate   fraction of rows failing the count-verify at several
                  oversample factors / recall targets
  rescore_flat    current row gather + einsum ([B, 2400] rows)
  rescore_slice   contiguous-slice gather from a [G, bucket, D] GROUPED
                  copy of the table (4 KB per candidate bucket instead
                  of 16 scattered 256 B rows)
  group_build     one-time cost of building the grouped copy
  onehot_gather   member-value gather for the exact two-level select as
                  a chunked one-hot einsum (replaces the 118 ms
                  take_along_axis scalar gather)
  topk_super      direct top_k on the fan-16 super-max matrix
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
    ap.add_argument("--stages", default="all")
    a = ap.parse_args()
    stages = (a.stages.split(",") if a.stages != "all"
              else ["fallback", "rescore", "onehot", "super"])

    from rechorus_tpu.ops import pallas_topk as PT

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(a.b, a.d)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(a.n, a.d)).astype(np.float32))
    kk = a.k + a.m
    bucket, nb = 16, 128
    bm = PT.fused_bucket_max(u, table, bucket=bucket)
    G = bm.shape[1]

    def emit(name, dt=None, **kw):
        row = {"stage": name, **kw}
        if dt is not None:
            row["ms"] = round(dt * 1e3, 2)
        print(json.dumps(row), flush=True)

    if "fallback" in stages:
        for mult, recall in [(1.5, 0.95), (2.0, 0.95), (2.0, 0.99), (3.0, 0.99)]:
            kk_o = min(G, int(kk * mult) + 16)
            v, ids = jax.lax.approx_max_k(bm, kk_o, recall_target=recall)
            tau = v[:, kk - 1]
            cnt_all = (bm >= tau[:, None]).sum(axis=1)
            cnt_sel = (v >= tau[:, None]).sum(axis=1)
            fails = int(np.asarray((cnt_all != cnt_sel).sum()))
            emit("fallback_rate", None, oversample=mult, recall=recall,
                 kk_o=kk_o, failed_rows=fails, total_rows=a.b)

    gb = jnp.asarray(rng.integers(0, G, size=(a.b, kk)), dtype=jnp.int32)

    if "rescore" in stages:
        def flat(uu):
            raw = PT.expand_bucket_items(gb, bucket)
            cand = jnp.minimum(raw, a.n - 1)
            cvec = table[cand]
            return jnp.einsum("bd,bcd->bc", uu, cvec)

        emit("rescore_flat", timed(flat, u, reps=a.reps), C=kk * bucket)

        # grouped copy: strided bucket g -> contiguous [bucket, D] slice
        n_blocks = -(-a.n // (bucket * nb))
        g_ids = jnp.arange(n_blocks * nb)
        old = (g_ids[:, None] // nb) * (bucket * nb) + (g_ids[:, None] % nb) \
            + jnp.arange(bucket)[None, :] * nb
        old = jnp.minimum(old, a.n - 1)

        def build(_):
            return table[old]  # [G, bucket, D]

        emit("group_build", timed(lambda uu: build(None) + 0 * uu[0, 0], u, reps=a.reps))
        grouped = build(None)

        def sliced(uu):
            cvec = grouped[gb]          # [B, kk, bucket, D] contiguous slices
            return jnp.einsum("bd,bksd->bks", uu, cvec)

        emit("rescore_slice", timed(sliced, u, reps=a.reps), C=kk * bucket)

    if "onehot" in stages:
        fan = 16
        gp = -(-G // fan) * fan
        bmp = jnp.pad(bm, ((0, 0), (0, gp - G)), constant_values=-jnp.inf)
        bm3 = bmp.reshape(a.b, gp // fan, fan)
        sb = jnp.asarray(rng.integers(0, gp // fan, size=(a.b, kk)), dtype=jnp.int32)

        def onehot_gather(uu):
            out = []
            chunk = 512
            for lo in range(0, a.b, chunk):
                oh = (sb[lo:lo + chunk, :, None]
                      == jnp.arange(gp // fan)[None, None, :]).astype(jnp.bfloat16)
                vals = jnp.einsum("bkg,bgf->bkf", oh,
                                  bm3[lo:lo + chunk].astype(jnp.bfloat16))
                out.append(vals)
            return jnp.concatenate(out) + 0 * uu[0, 0]

        emit("onehot_gather", timed(onehot_gather, u, reps=a.reps),
             supers=gp // fan, kk=kk)

        def taa(uu):
            l1 = (sb[:, :, None] * fan
                  + jnp.arange(fan, dtype=sb.dtype)[None, None, :]).reshape(a.b, -1)
            return jnp.take_along_axis(bmp, l1, axis=1) + 0 * uu[0, 0]

        emit("taa_gather", timed(taa, u, reps=a.reps))

    if "super" in stages:
        fan = 16
        gp = -(-G // fan) * fan
        bmp = jnp.pad(bm, ((0, 0), (0, gp - G)), constant_values=-jnp.inf)

        def super_topk(uu):
            bm2 = (bmp + 0 * uu[0, 0]).reshape(a.b, gp // fan, fan).max(axis=2)
            return jax.lax.top_k(bm2, kk)

        emit("topk_super", timed(super_topk, u, reps=a.reps), width=gp // fan)


if __name__ == "__main__":
    main()
