"""ComiRec -- controllable multi-interest sequential recommendation.

Reference behavior: src/models/sequential/ComiRec.py (Cen et al., KDD'20):
K attention heads over history -> K interest vectors; training scores with
the interest closest to the target, eval takes the max over interests per
candidate.

Note: the reference selects the "target" as column 0 AFTER the runner's
anti-leak permutation, i.e. a random candidate (latent quirk). We select
the true target via the feed's `_target_col` (set by the runner when it
permutes), which matches the paper.
"""
from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax.numpy as jnp

from rechorus_tpu.models.base import SequentialModel
from rechorus_tpu.ops.layers import dense, embed
from rechorus_tpu.ops.losses import masked_softmax
from rechorus_tpu.registry import register_model


@register_model("ComiRec")
class ComiRec(SequentialModel):
    extra_log_args: ClassVar[list] = ["emb_size", "attn_size", "K"]

    emb_size: int = 64
    attn_size: int = 8
    K: int = 2
    add_pos: int = 1

    @staticmethod
    def parse_model_args(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        parser.add_argument("--attn_size", type=int, default=8, help="Size of attention vectors.")
        parser.add_argument("--K", type=int, default=2, help="Number of hidden intent.")
        parser.add_argument("--add_pos", type=int, default=1, help="Whether add position embedding.")
        return SequentialModel.parse_model_args(parser)

    @nn.compact
    def __call__(self, feed, training: bool = False):
        i_ids = feed["item_id"]
        history = feed["history_items"]
        lengths = feed["lengths"]
        B, L = history.shape

        valid_his = (history > 0).astype(jnp.int32)
        i_emb = embed(self.item_num, self.emb_size, "i_embeddings")
        his_vectors = i_emb(history)

        if self.add_pos:
            position = (lengths[:, None] - jnp.arange(L)[None, :]) * valid_his
            pos_vectors = embed(self.history_max + 1, self.emb_size, "p_embeddings")(position)
            his_pos_vectors = his_vectors + pos_vectors
        else:
            his_pos_vectors = his_vectors

        attn_score = dense(self.K, name="W2")(nn.tanh(dense(self.attn_size, name="W1")(his_pos_vectors)))
        attn_score = attn_score.swapaxes(-1, -2)  # [B, K, L]
        attn_score = masked_softmax(attn_score, (valid_his == 1)[:, None, :], axis=-1)
        interest_vectors = (his_vectors[:, None, :, :] * attn_score[:, :, :, None]).sum(-2)  # [B, K, E]

        i_vectors = i_emb(i_ids)
        if training:
            tcol = feed.get("_target_col", jnp.zeros((B,), jnp.int32))
            target_vector = jnp.take_along_axis(i_vectors, tcol[:, None, None], axis=1)[:, 0, :]
            target_pred = (interest_vectors * target_vector[:, None, :]).sum(-1)  # [B, K]
            idx_select = target_pred.argmax(-1)
            user_vector = jnp.take_along_axis(interest_vectors, idx_select[:, None, None], axis=1)[:, 0, :]
            prediction = (user_vector[:, None, :] * i_vectors).sum(-1)
        else:
            prediction = (interest_vectors[:, None, :, :] * i_vectors[:, :, None, :]).sum(-1).max(-1)

        return {"prediction": prediction}
