"""NARM -- neural attentive session-based recommendation.

Reference behavior: src/models/sequential/NARM.py (Li et al., CIKM'17):
global GRU final state + local GRU outputs attended (sigmoid MLP
attention), concatenated -> linear -> dot with candidates.
"""
from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax.numpy as jnp

from rechorus_tpu.models.base import SequentialModel
from rechorus_tpu.ops.layers import MaskedGRU, dense, embed
from rechorus_tpu.registry import register_model


@register_model("NARM")
class NARM(SequentialModel):
    extra_log_args: ClassVar[list] = ["emb_size", "hidden_size", "attention_size"]

    emb_size: int = 64
    hidden_size: int = 100
    attention_size: int = 50
    supports_catalog: ClassVar[bool] = True

    @staticmethod
    def parse_model_args(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        parser.add_argument("--hidden_size", type=int, default=100, help="Size of hidden vectors in GRU.")
        parser.add_argument("--attention_size", type=int, default=50, help="Size of attention hidden space.")
        return SequentialModel.parse_model_args(parser)

    def encode(self, feed):
        history = feed["history_items"]
        lengths = feed["lengths"]

        i_emb = embed(self.item_num, self.emb_size, "i_embeddings")
        his_vectors = i_emb(history)

        _, hidden_g = MaskedGRU(self.hidden_size, name="encoder_g")(his_vectors, lengths)
        output_l, _ = MaskedGRU(self.hidden_size, name="encoder_l")(his_vectors, lengths)

        attention_g = dense(self.attention_size, use_bias=False, name="A1")(hidden_g)
        attention_l = dense(self.attention_size, use_bias=False, name="A2")(output_l)
        attention_value = dense(1, use_bias=False, name="attention_out")(
            nn.sigmoid(attention_g[:, None, :] + attention_l)
        )
        mask = (history > 0)[:, :, None]
        attention_value = jnp.where(mask, attention_value, 0.0)
        c_l = (attention_value * output_l).sum(axis=1)

        pred_vector = dense(self.emb_size, use_bias=False, name="out")(
            jnp.concatenate([hidden_g, c_l], axis=1)
        )
        return pred_vector, i_emb

    @nn.compact
    def __call__(self, feed, training: bool = False, catalog: bool = False):
        pred_vector, i_emb = self.encode(feed)
        if catalog:
            return {"u_v": pred_vector}
        i_vectors = i_emb(feed["item_id"])
        prediction = (pred_vector[:, None, :] * i_vectors).sum(-1)
        return {"prediction": prediction}
