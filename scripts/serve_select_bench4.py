"""Two-level CONTIGUOUS-member exact bucket select vs direct top_k (r5 #3).

The r3/r4 two-level super-bucket select died on its member-value gather:
take_along_axis over a STRIDED [B, G] layout is a ~12 ns/element scalar
row-gather (PERF.md r5 stage table, 190 ms e2e). The r5 grouped-slice
rescore showed the same gather becomes ~80 ns/slice when the members are
CONTIGUOUS. This benchmark applies that lesson one level up: reshape the
bucket-max matrix [B, G] -> [B, G/F, F] (members of super-bucket s are
the F contiguous columns s*F..s*F+F-1), max over the minor axis, top_k
over the [B, G/F] super maxes, then gather the winners' member rows as
[B, kk, F] contiguous minor-dim slices and finish with a small top_k
over [B, kk*F].

Exactness (same containment argument as tiled_catalog_topk's): let v* be
the k-th largest unmasked score; #buckets with max >= v* <= k_wide, and
each lives in a super-bucket with max >= v*, so #supers with max >= v*
<= k_wide and ALL of them are in the top-k_wide supers (anything ranked
above them is itself >= v*). The gathered [B, kk*F] member set therefore
contains every bucket with max >= v*; the final top_k(kk) keeps them.

Prints one JSON line per fan F plus the direct baseline, with an ids-set
equality check against direct lax.top_k (rank order may differ on exact
value ties; set equality is what stage 2 consumes).
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


def two_level_select(bm, kk: int, fan: int):
    """Exact top-kk (values, bucket ids) over [B, G] via contiguous
    two-level select; G is padded up to a multiple of fan with -inf."""
    B, G = bm.shape
    pad = (-G) % fan
    if pad:
        bm = jnp.pad(bm, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    mem = bm.reshape(B, -1, fan)                       # [B, S, F] contiguous members
    sv, sb = jax.lax.top_k(mem.max(-1), kk)            # [B, kk] super select
    rows = jnp.take_along_axis(mem, sb[:, :, None], axis=1)  # [B, kk, F] slice gather
    gb_all = sb[:, :, None] * fan + jnp.arange(fan)[None, None, :]
    v, sel = jax.lax.top_k(rows.reshape(B, -1), kk)
    gb = jnp.take_along_axis(gb_all.reshape(B, -1), sel, axis=1)
    return v, gb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--b", type=int, default=4096)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--m", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--fans", default="8,16,32")
    a = ap.parse_args()

    from rechorus_tpu.ops import pallas_topk as PT

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(a.b, a.d)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(a.n, a.d)).astype(np.float32))
    kk = a.k + a.m
    bm = jax.jit(lambda u, t: PT.fused_bucket_max(u, t, bucket=16))(u, table)
    bm.block_until_ready()
    G = bm.shape[1]

    dt = timed(lambda x: jax.lax.top_k(x, kk), bm, reps=a.reps)
    v0, g0 = jax.jit(lambda x: jax.lax.top_k(x, kk))(bm)
    ref_ids = np.sort(np.asarray(g0), axis=1)
    print(json.dumps({"select": "direct", "G": G, "kk": kk,
                      "ms": round(dt * 1e3, 2)}), flush=True)

    for fan in [int(x) for x in a.fans.split(",")]:
        dt = timed(lambda x: two_level_select(x, kk, fan), bm, reps=a.reps)
        v, g = jax.jit(lambda x: two_level_select(x, kk, fan))(bm)
        ids = np.sort(np.asarray(g), axis=1)
        exact = bool((ids == ref_ids).all())
        # value-level check too (ties can legitimately reorder ids)
        vals_ok = bool(np.allclose(np.sort(np.asarray(v), 1),
                                   np.sort(np.asarray(v0), 1)))
        print(json.dumps({"select": "two_level", "fan": fan,
                          "ms": round(dt * 1e3, 2),
                          "ids_equal": exact, "vals_equal": vals_ok}), flush=True)


if __name__ == "__main__":
    main()
