"""Pallas-fused stage-1 kernels for the streaming catalog top-k / rank path.

`ops/topk.py`'s scan-based kernels stream the catalog in tiles, but each
tile's score matrix `u @ tile.T` still materializes in HBM between the
matmul and its reduction (XLA does not fuse a reduce through a dot): at
serving shapes (B=4096, tile=128k) that is ~2 GB written + read back per
tile -- far more HBM traffic than the table itself (256 MB at N=1M).
The two kernels here run the reduction in VMEM right after the MXU
produces each score block, so the catalog table is the only large HBM
read and the only large write is the [B, N/bucket] bucket-max matrix
(fused_bucket_max) or nothing at all (fused_ge_count):

`fused_bucket_max` -- stage 1 of the hierarchical exact top-k
  (`ops.topk.tiled_catalog_topk`): per catalog block of `bucket*128`
  rows, compute scores on the MXU, mask pad/col-0/dead rows, and reduce
  to 128 bucket maxes -- all in VMEM. Buckets are STRIDED within the
  block: bucket `l` of block `j` holds items
  `{j*bucket*128 + b*128 + l : b < bucket}`, so the in-kernel reduction
  is a max over `bucket` aligned 128-lane chunks (no sub-lane reshape).
  The exactness argument of the hierarchical top-k holds for any fixed
  partition of the catalog into <=`bucket`-sized groups, so stage 2 only
  needs the matching `expand_bucket_items` id mapping.

`fused_ge_count` -- the >=-count behind the streaming rank kernels
  (`ops.topk.tiled_catalog_ranks` / `tiled_ge_count`): per block, count
  scores >= the per-row target score under the id masks and accumulate
  into a [B] total. Grid order keeps the count block resident in VMEM
  while the catalog streams past, so HBM traffic is exactly one table
  read (plus u).

Both take `col_offset` as a runtime scalar (SMEM) so they work inside
`shard_map` shards where the local->global id shift is a tracer
(parallel/topk.py). `n_valid` is static. On non-TPU backends the kernels
run in interpreter mode (CPU tests); the scan kernels remain the default
CPU product path (`ops.topk.PALLAS = "auto"`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 128          # bucket maxes per catalog block == one lane register row
DEFAULT_TB = 256  # user-batch block rows


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _scores(u_ref, t_ref, b_ref):
    """[TB, TN] f32 score block on the MXU (storage dtype cast per block)."""
    s = jax.lax.dot_general(
        u_ref[:].astype(jnp.float32), t_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if b_ref is not None:
        s = s + b_ref[:].astype(jnp.float32)
    return s


def _bucket_max_kernel(off_ref, u_ref, t_ref, *rest, bucket, nb, n_rows, n_valid, has_bias):
    if has_bias:
        b_ref, out_ref = rest
    else:
        b_ref, (out_ref,) = None, rest
    j = pl.program_id(0)
    s = _scores(u_ref, t_ref, b_ref)
    base = j * (bucket * nb)
    off = off_ref[0, 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    m = jnp.full(out_ref.shape, -jnp.inf, jnp.float32)
    for b in range(bucket):
        lcol = base + b * nb + lane           # local row ids of this chunk
        gcol = lcol + off                     # global item ids (masks live here)
        ok = (lcol < n_rows) & (gcol > 0)
        if n_valid is not None:
            ok = ok & (gcol < n_valid)
        m = jnp.maximum(m, jnp.where(ok, s[:, b * nb:(b + 1) * nb], -jnp.inf))
    out_ref[:] = m


def fused_bucket_max(u, table, *, bucket: int, bias=None, n_valid=None,
                     col_offset=0, nb: int = NB, tb: int = DEFAULT_TB):
    """[B, cdiv(N, bucket*nb)*nb] strided-bucket maxes of the masked score
    matrix u @ table.T (+ bias). Bucket g covers items
    `(g // nb) * bucket * nb + (g % nb) + arange(bucket) * nb`
    (see `expand_bucket_items`); masked-out and overhang slots are -inf.
    """
    B, _ = u.shape
    N = table.shape[0]
    TN = bucket * nb
    tb = min(tb, max(8, B))
    grid = (_cdiv(N, TN), _cdiv(B, tb))
    off = jnp.asarray(col_offset, jnp.int32).reshape(1, 1)
    kernel = functools.partial(_bucket_max_kernel, bucket=bucket, nb=nb,
                               n_rows=N, n_valid=n_valid, has_bias=bias is not None)
    in_specs = [
        pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((tb, u.shape[1]), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TN, table.shape[1]), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
    ]
    args = [off, u, table]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, TN), lambda j, i: (0, j), memory_space=pltpu.VMEM))
        args.append(bias.reshape(1, -1))
    out = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec((tb, nb), lambda j, i: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_cdiv(B, tb) * tb, grid[0] * nb), jnp.float32),
        interpret=_interpret(),
    )(*args)
    return out[:B]


def expand_bucket_items(gb, bucket: int, nb: int = NB):
    """Strided-bucket ids [B, kk] -> candidate LOCAL item ids [B, kk*bucket]
    (the stage-2 counterpart of `fused_bucket_max`'s partition)."""
    base = (gb // nb) * (bucket * nb) + gb % nb
    items = base[:, :, None] + (jnp.arange(bucket, dtype=gb.dtype) * nb)[None, None, :]
    return items.reshape(gb.shape[0], -1)


def _ge_count_kernel(off_ref, u_ref, t_ref, ts_ref, *rest, tn, n_rows, n_valid,
                     has_bias, has_target):
    rest = list(rest)
    tc_ref = rest.pop(0) if has_target else None
    b_ref = rest.pop(0) if has_bias else None
    (out_ref,) = rest
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    s = _scores(u_ref, t_ref, b_ref)
    lcol = j * tn + jax.lax.broadcasted_iota(jnp.int32, (1, tn), 1)
    gcol = lcol + off_ref[0, 0]
    ok = (lcol < n_rows) & (gcol > 0)
    if n_valid is not None:
        ok = ok & (gcol < n_valid)
    if has_target:
        ok = ok & (gcol != tc_ref[:])
    ge = (s >= ts_ref[:]) & ok
    out_ref[:] += jnp.sum(ge.astype(jnp.int32), axis=1, keepdims=True)


def fused_ge_count(u, table, tscore, *, target_col=None, bias=None, n_valid=None,
                   col_offset=0, tn: int = 2048, tb: int = DEFAULT_TB):
    """[B] int32 counts of `#{row r: score(b, r) >= tscore[b]}` over rows
    passing the id masks (global id > 0, < n_valid, != target_col[b]),
    with `score = u @ table.T (+ bias)` never materialized off-chip.
    Clicked-id exclusion is NOT handled here -- callers subtract a
    gathered clicked correction (see `ops.topk.tiled_ge_count`).
    """
    B = u.shape[0]
    N = table.shape[0]
    tn = min(tn, max(NB, _cdiv(N, NB) * NB))
    tb = min(tb, max(8, B))
    grid = (_cdiv(B, tb), _cdiv(N, tn))
    off = jnp.asarray(col_offset, jnp.int32).reshape(1, 1)
    kernel = functools.partial(_ge_count_kernel, tn=tn, n_rows=N, n_valid=n_valid,
                               has_bias=bias is not None,
                               has_target=target_col is not None)
    in_specs = [
        pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((tb, u.shape[1]), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tn, table.shape[1]), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
    ]
    args = [off, u, table, tscore.astype(jnp.float32).reshape(-1, 1)]
    if target_col is not None:
        in_specs.append(pl.BlockSpec((tb, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM))
        args.append(target_col.astype(jnp.int32).reshape(-1, 1))
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM))
        args.append(bias.reshape(1, -1))
    out = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec((tb, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_cdiv(B, tb) * tb, 1), jnp.int32),
        interpret=_interpret(),
    )(*args)
    return out[:B, 0]
