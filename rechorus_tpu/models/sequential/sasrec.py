"""SASRec -- self-attentive sequential recommendation.

Reference behavior: src/models/sequential/SASRec.py (Kang & McAuley,
ICDM'18): item + reversed-position embeddings, causal mask, post-LN
transformer stack, state at position lengths-1 dotted with candidates.
"""
from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax.numpy as jnp

from rechorus_tpu.models.base import SequentialModel
from rechorus_tpu.ops.layers import TransformerLayer, embed
from rechorus_tpu.registry import register_model


class SASRecBase:
    @staticmethod
    def parse_model_args_base(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        parser.add_argument("--num_layers", type=int, default=1, help="Number of self-attention layers.")
        parser.add_argument("--num_heads", type=int, default=4, help="Number of attention heads.")
        return parser

    def encode_history(self, feed, training: bool):
        history = feed["history_items"]  # [B, H]
        lengths = feed["lengths"]  # [B]
        B, L = history.shape

        valid_his = (history > 0).astype(jnp.int32)
        i_emb = embed(self.item_num, self.emb_size, "i_embeddings")
        his_vectors = i_emb(history)

        # reversed positions: lengths=4 -> [4,3,2,1,0,...] masked by validity
        position = (lengths[:, None] - jnp.arange(L)[None, :]) * valid_his
        pos_vectors = embed(self.history_max + 1, self.emb_size, "p_embeddings")(position)
        his_vectors = his_vectors + pos_vectors

        causal = jnp.tril(jnp.ones((1, 1, L, L), dtype=bool))
        for k in range(self.num_layers):
            his_vectors = TransformerLayer(
                d_model=self.emb_size, d_ff=self.emb_size, n_heads=self.num_heads,
                dropout=self.dropout, kq_same=False, name=f"transformer_{k}",
            )(his_vectors, mask=causal, training=training)
        his_vectors = his_vectors * valid_his[:, :, None].astype(his_vectors.dtype)

        his_vector = jnp.take_along_axis(
            his_vectors, jnp.maximum(lengths - 1, 0)[:, None, None], axis=1
        )[:, 0, :]
        return his_vector, i_emb

    def score(self, feed, training: bool):
        his_vector, i_emb = self.encode_history(feed, training)
        i_vectors = i_emb(feed["item_id"])
        prediction = (his_vector[:, None, :] * i_vectors).sum(-1)
        u_v = jnp.broadcast_to(his_vector[:, None, :], i_vectors.shape)
        return {"prediction": prediction, "u_v": u_v, "i_v": i_vectors}


@register_model("SASRec")
class SASRec(SequentialModel, SASRecBase):
    extra_log_args: ClassVar[list] = ["emb_size", "num_layers", "num_heads"]
    supports_catalog: ClassVar[bool] = True

    emb_size: int = 64
    num_layers: int = 1
    num_heads: int = 4

    @staticmethod
    def parse_model_args(parser):
        parser = SASRecBase.parse_model_args_base(parser)
        return SequentialModel.parse_model_args(parser)

    @nn.compact
    def __call__(self, feed, training: bool = False, catalog: bool = False):
        if catalog:
            his_vector, _ = self.encode_history(feed, training)
            return {"u_v": his_vector}
        return {"prediction": self.score(feed, training)["prediction"]}


from rechorus_tpu.models.base import ImpressionSeqModel  # noqa: E402


@register_model("SASRecImpression")
class SASRecImpression(ImpressionSeqModel, SASRecBase):
    """Impression-mode SASRec (reference SASRec.py:107-122)."""

    extra_log_args: ClassVar[list] = ["emb_size", "num_layers", "num_heads"]

    emb_size: int = 64
    num_layers: int = 1
    num_heads: int = 4

    @staticmethod
    def parse_model_args(parser):
        parser = SASRecBase.parse_model_args_base(parser)
        return ImpressionSeqModel.parse_model_args(parser)

    @nn.compact
    def __call__(self, feed, training: bool = False):
        return self.score(feed, training)
