"""Distributed full-catalog top-k over a row-sharded item table.

SURVEY.md §7 flags sharded full-catalog eval as the hardest scaling case:
score [B, n_items] against an item table row-sharded over the 'model'
axis and take a global top-k. The reference has no counterpart (single
device). Design: shard_map over 'model' -- each shard scores ITS rows
([B, N/m] local matmul on the MXU), takes a LOCAL top-k (k << N/m), and
only the k winners per shard ride the ICI all_gather; the final top-k
over m*k candidates is elementwise. Communication: O(B * m * k) instead
of O(B * N).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sharded_catalog_topk(u_vecs, item_table, k: int, mesh: Mesh,
                         clicked_rows=None, item_bias=None):
    """(values [B, k], item_ids [B, k]) of the top-k catalog items.

    u_vecs [B, d] replicated; item_table [N, d] row-sharded over 'model'
    (N divisible by the axis size); clicked_rows [B, M] optional item ids
    to exclude (0 = pad; item 0 is always excluded); item_bias [N] opt.
    """
    m = mesh.shape["model"]
    N = item_table.shape[0]
    assert N % m == 0, "item table rows must divide the model axis"
    if item_bias is None:
        item_bias = jnp.zeros((N,), item_table.dtype)
    if clicked_rows is None:
        clicked_rows = jnp.zeros((u_vecs.shape[0], 1), jnp.int32)

    def local(u, items_shard, bias_shard, clicked):
        shard_n = items_shard.shape[0]
        offset = jax.lax.axis_index("model") * shard_n
        scores = u @ items_shard.T + bias_shard[None, :]  # [B, N/m] on-shard MXU
        gids = offset + jnp.arange(shard_n)[None, :]  # global item ids
        mask = (gids == 0) | (gids[:, :, None] == clicked[:, None, :]).any(-1)
        scores = jnp.where(mask, -jnp.inf, scores)
        v, i = jax.lax.top_k(scores, k)  # local winners only
        gi = i + offset
        v_all = jax.lax.all_gather(v, "model", axis=1, tiled=True)  # [B, m*k]
        i_all = jax.lax.all_gather(gi, "model", axis=1, tiled=True)
        v2, sel = jax.lax.top_k(v_all, k)
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
