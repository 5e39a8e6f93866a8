"""Pallas TPU kernels for the hot eval ops.

Full-catalog evaluation (`--test_all 1`) is the framework's largest single
computation: score every catalog item per user, mask the user's clicked
items, and rank the ground truth (reference BaseRunner.py:244-251 +
evaluate_method :51-78). The reference materializes the [B, N] score
matrix and scatters -inf into clicked positions; scatters are slow on TPU
and the big matrix costs an extra HBM round trip.

Design here:
  * rank = 1 + #{j in catalog: s_j >= t}  MINUS  #{clicked j: s_j >= t}
    MINUS  [s_0 >= t] -- gathers only, no scatters (ops-level rewrite in
    runners/base.py).
  * `ge_count`: a Pallas kernel for the dominant term -- a streaming
    count of catalog scores >= target, tiled over the score matrix so the
    compare+reduce epilogue runs in VMEM right after each tile is read
    (one HBM pass, no [B, N] temporary for the comparison result).

On non-TPU backends (CPU tests) the kernels run in interpreter mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ge_count_kernel(pred_ref, target_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    tile = pred_ref[:]  # [TILE_B, TILE_N]
    t = target_ref[:]  # [TILE_B, 1]
    out_ref[:] += jnp.sum((tile >= t).astype(jnp.int32), axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("tile_n",))
def ge_count(pred: jnp.ndarray, target: jnp.ndarray, tile_n: int = 2048) -> jnp.ndarray:
    """#{j: pred[b, j] >= target[b]} per row, streamed over column tiles.

    pred [B, N] float32, target [B] float32 -> [B] int32.
    """
    B, N = pred.shape
    tile_n = min(tile_n, max(128, N))
    pad_n = (-N) % tile_n
    if pad_n:
        pred = jnp.pad(pred, ((0, 0), (0, pad_n)), constant_values=-jnp.inf)
    Np = N + pad_n
    tile_b = min(B, 256)
    pad_b = (-B) % tile_b
    if pad_b:
        pred = jnp.pad(pred, ((0, pad_b), (0, 0)), constant_values=0.0)
        target = jnp.pad(target, (0, pad_b), constant_values=jnp.inf)
    Bp = B + pad_b

    counts = pl.pallas_call(
        _ge_count_kernel,
        grid=(Bp // tile_b, Np // tile_n),
        in_specs=[
            pl.BlockSpec((tile_b, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
        interpret=_interpret(),
    )(pred, target[:, None])
    return counts[:B, 0]


def catalog_ranks(pred: jnp.ndarray, target_col: jnp.ndarray, clicked_rows: jnp.ndarray) -> jnp.ndarray:
    """Ground-truth rank over the full catalog with clicked-item masking,
    scatter-free (reference BaseRunner.py:244-251 semantics: item 0 and
    every train+residual clicked item are excluded from the ranking; ties
    counted with >=, evaluate_method :63).

    pred [B, N] catalog scores; target_col [B] the target's column;
    clicked_rows [B, M] clicked item ids padded with 0 (unique per row).
    """
    B = pred.shape[0]
    tscore = jnp.take_along_axis(pred, target_col[:, None].astype(jnp.int32), axis=1)[:, 0]
    total = ge_count(pred, tscore)
    clicked_scores = jnp.take_along_axis(pred, clicked_rows.astype(jnp.int32), axis=1)  # [B, M]
    clicked_ge = ((clicked_scores >= tscore[:, None]) & (clicked_rows > 0)).sum(axis=1)
    zero_ge = (pred[:, 0] >= tscore).astype(jnp.int32)
    # the target itself sits in clicked (residual set) -> subtracted there;
    # add 1 back for the reference's "1 + #better-or-equal-others... "
    # convention: rank = (pred >= tscore).sum() over the masked catalog,
    # where the target's own masked copy no longer counts, so re-add it.
    return total - clicked_ge - zero_ge + 1
