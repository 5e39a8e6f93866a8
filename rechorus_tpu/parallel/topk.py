"""Distributed full-catalog scoring over a row-sharded item table.

SURVEY.md §7 flags sharded full-catalog eval as the hardest scaling case:
score [B, n_items] against an item table row-sharded over the 'model'
axis and take a global top-k / ground-truth rank. The reference has no
counterpart (single device). Design: shard_map over 'model' -- each
shard scores ITS rows ([B, N/m] local matmul on the MXU) and only tiny
reductions ride the ICI:

  * top-k: LOCAL top-k per shard (k << N/m), all_gather the k winners,
    final top-k over m*k candidates. Comm O(B * m * k), not O(B * N).
  * ranks: LOCAL >=-count with clicked/pad masking, psum the counts.
    Comm O(B).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rechorus_tpu.ops.topk import MIN_ROWS_FOR_TILED


def sharded_catalog_topk(u_vecs, item_table, k: int, mesh: Mesh,
                         clicked_rows=None, item_bias=None,
                         n_valid: int | None = None):
    """(values [B, k], item_ids [B, k]) of the top-k catalog items.

    u_vecs [B, d] replicated; item_table [N, d] row-sharded over 'model'
    (N divisible by the axis size); clicked_rows [B, M] optional item ids
    to exclude (0 = pad; item 0 is always excluded); item_bias [N] opt;
    n_valid masks dead padded rows (global ids >= n_valid), see
    parallel.mesh.set_table_row_pad.
    """
    m = mesh.shape["model"]
    N = item_table.shape[0]
    assert N % m == 0, "item table rows must divide the model axis"
    if item_bias is None:
        item_bias = jnp.zeros((N,), item_table.dtype)
    if clicked_rows is None:
        clicked_rows = jnp.zeros((u_vecs.shape[0], 1), jnp.int32)
    nv = N if n_valid is None else n_valid

    def local(u, items_shard, bias_shard, clicked):
        shard_n = items_shard.shape[0]
        offset = jax.lax.axis_index("model") * shard_n
        kk = min(k, shard_n)
        if shard_n >= MIN_ROWS_FOR_TILED:
            # big shard: stream tiles instead of the [B, N/m] dense matrix
            # (ops/topk.py hierarchical exact kernel, global-id masks via
            # col_offset)
            from rechorus_tpu.ops.topk import tiled_catalog_topk

            v, gi = tiled_catalog_topk(u, items_shard, kk, bias=bias_shard,
                                       clicked_rows=clicked, n_valid=nv,
                                       col_offset=offset)
        else:
            scores = u @ items_shard.T + bias_shard[None, :]  # [B, N/m] on-shard MXU
            gids = offset + jnp.arange(shard_n)[None, :]  # global item ids
            mask = (gids == 0) | (gids >= nv) | (gids[:, :, None] == clicked[:, None, :]).any(-1)
            scores = jnp.where(mask, -jnp.inf, scores)
            v, i = jax.lax.top_k(scores, kk)  # local winners only
            gi = i + offset
        v_all = jax.lax.all_gather(v, "model", axis=1, tiled=True)  # [B, m*k]
        i_all = jax.lax.all_gather(gi, "model", axis=1, tiled=True)
        v2, sel = jax.lax.top_k(v_all, min(k, v_all.shape[1]))
        return v2, jnp.take_along_axis(i_all, sel, axis=1)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P("model", None), P("model"), P()),
        out_specs=(P(), P()),
        # outputs are replicated by construction (post-all_gather top_k);
        # the static replication checker can't prove it
        check_vma=False,
    )
    return fn(u_vecs, item_table, item_bias, clicked_rows)


def sharded_catalog_ranks(u_vecs, item_table, target, mesh: Mesh,
                          clicked_rows, item_bias=None,
                          n_valid: int | None = None):
    """Ground-truth catalog rank [B] over a row-sharded table.

    Semantics match ops.pallas_kernels.catalog_ranks (reference
    BaseRunner.py:244-251): item 0 and clicked items excluded, >= tie
    counting, target's own masked copy re-added as the +1. target [B]
    global item ids; each shard counts its local >=-scores and the counts
    psum over 'model' -- O(B) communication.
    """
    m = mesh.shape["model"]
    N = item_table.shape[0]
    assert N % m == 0, "item table rows must divide the model axis"
    if item_bias is None:
        item_bias = jnp.zeros((N,), item_table.dtype)
    nv = N if n_valid is None else n_valid

    def local(u, items_shard, bias_shard, clicked, tgt):
        shard_n = items_shard.shape[0]
        offset = jax.lax.axis_index("model") * shard_n
        if shard_n >= MIN_ROWS_FOR_TILED:
            # big shard: gather the owner shard's target row for the
            # score (einsum; exact ties with OTHER items may flip at 1
            # ulp vs the tile matmul -- the target's own column is id-
            # excluded via clicked, so the reference semantics hold),
            # then stream the >=-count without the [B, N/m] matrix
            from rechorus_tpu.ops.topk import tiled_ge_count

            loc = tgt - offset
            in_shard = (loc >= 0) & (loc < shard_n)
            row = jnp.clip(loc, 0, shard_n - 1).astype(jnp.int32)
            tv = jnp.einsum("bd,bd->b", u, items_shard[row].astype(u.dtype))
            tv = tv + bias_shard[row]
            t = jax.lax.psum(jnp.where(in_shard, tv, 0.0), "model")  # [B]
            ge = tiled_ge_count(u, items_shard, t, bias=bias_shard,
                                clicked_rows=clicked, n_valid=nv,
                                col_offset=offset, target_col=tgt)
        else:
            scores = u @ items_shard.T + bias_shard[None, :]  # [B, N/m]
            gids = offset + jnp.arange(shard_n)[None, :]
            # target score: exactly one shard holds the row; sum+psum selects it
            t_local = jnp.sum(jnp.where(gids == tgt[:, None], scores, 0.0), axis=1)
            t = jax.lax.psum(t_local, "model")  # [B]
            excluded = (gids == 0) | (gids >= nv) | (gids[:, :, None] == clicked[:, None, :]).any(-1)
            ge = ((scores >= t[:, None]) & ~excluded).sum(axis=1)
        total = jax.lax.psum(ge, "model")
        return total + 1

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P("model", None), P("model"), P(), P()),
        out_specs=P(),
        check_vma=False,  # psum output is replicated by construction
    )
    return fn(u_vecs, item_table, item_bias, clicked_rows, target)
