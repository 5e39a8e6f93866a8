"""Fused context-feature embedding bank.

The reference keeps a ModuleDict with one nn.Embedding per categorical
feature and one nn.Linear(1,d) per float feature (src/models/context/
FM.py:34-42). TPU-first, all categorical vocabularies are fused into ONE
table with per-feature offsets -- a single MXU-friendly gather -- and the
stacked per-feature tensor [B, C, F, d] is assembled in the reference's
canonical feature order.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from rechorus_tpu.ops.layers import NORMAL_INIT, dense, embed


class FeatureEmbeddingBank(nn.Module):
    """Embeds packed context features.

    Inputs (from ContextModel.context_inputs):
      cat_ids:    [B, C, F_cat] int32 with vocab offsets already applied
      float_vals: [B, C, F_float] float32
      kinds:      static tuple of 'cat'|'float' in canonical feature order
    Output: [B, C, F, vec_size] stacked in canonical order
            (+ [B, C, F] linear terms if include_linear).
    """

    total_vocab: int
    kinds: Tuple[str, ...]
    vec_size: int
    include_linear: bool = False

    @nn.compact
    def __call__(self, cat_ids, float_vals):
        parts = {}
        if cat_ids.shape[-1] > 0:
            table = embed(self.total_vocab, self.vec_size, name="fused_table")
            parts["cat"] = table(cat_ids)  # [B, C, F_cat, d]
        float_embs = []
        for j, pos in enumerate([i for i, k in enumerate(self.kinds) if k == "float"]):
            float_embs.append(
                dense(self.vec_size, use_bias=False, name=f"float_emb_{j}")(float_vals[..., j : j + 1])
            )
        if float_embs:
            parts["float"] = jnp.stack(float_embs, axis=-2)  # [B, C, F_float, d]

        stacked = _interleave(parts, self.kinds)

        if not self.include_linear:
            return stacked

        lin_parts = {}
        if cat_ids.shape[-1] > 0:
            lin_table = embed(self.total_vocab, 1, name="fused_linear")
            lin_parts["cat"] = lin_table(cat_ids)  # [B, C, F_cat, 1]
        lin_float = []
        for j in range(float_vals.shape[-1]):
            lin_float.append(dense(1, use_bias=False, name=f"float_lin_{j}")(float_vals[..., j : j + 1]))
        if lin_float:
            lin_parts["float"] = jnp.stack(lin_float, axis=-2)
        linear = _interleave(lin_parts, self.kinds)[..., 0]  # [B, C, F]
        return stacked, linear


def _interleave(parts, kinds):
    """Merge cat/float stacks back into canonical feature order."""
    ci = fi = 0
    cols = []
    for k in kinds:
        if k == "cat":
            cols.append(parts["cat"][..., ci, :])
            ci += 1
        else:
            cols.append(parts["float"][..., fi, :])
            fi += 1
    return jnp.stack(cols, axis=-2)
