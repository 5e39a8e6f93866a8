"""GRU4Rec -- session-based recommendation with GRU.

Reference behavior: src/models/sequential/GRU4Rec.py (Hidasi et al.,
ICLR'16): item emb -> GRU (packed in reference; masked scan here) ->
linear -> dot with candidate embeddings.
"""
from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax.numpy as jnp

from rechorus_tpu.models.base import SequentialModel
from rechorus_tpu.ops.layers import MaskedGRU, dense, embed
from rechorus_tpu.registry import register_model


class GRU4RecBase:
    @staticmethod
    def parse_model_args_base(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        parser.add_argument("--hidden_size", type=int, default=100, help="Size of hidden vectors in GRU.")
        return parser

    def encode(self, feed, training: bool):
        i_emb = embed(self.item_num, self.emb_size, "i_embeddings")
        his_vectors = i_emb(feed["history_items"])
        _, hidden = MaskedGRU(self.hidden_size, name="rnn")(his_vectors, feed["lengths"])
        rnn_vector = dense(self.emb_size, name="out")(hidden)
        return rnn_vector, i_emb

    def score(self, feed, training: bool):
        rnn_vector, i_emb = self.encode(feed, training)
        pred_vectors = i_emb(feed["item_id"])
        prediction = (rnn_vector[:, None, :] * pred_vectors).sum(-1)
        u_v = jnp.broadcast_to(rnn_vector[:, None, :], pred_vectors.shape)
        return {"prediction": prediction, "u_v": u_v, "i_v": pred_vectors}


@register_model("GRU4Rec")
class GRU4Rec(SequentialModel, GRU4RecBase):
    extra_log_args: ClassVar[list] = ["emb_size", "hidden_size"]
    supports_catalog: ClassVar[bool] = True

    emb_size: int = 64
    hidden_size: int = 100

    @staticmethod
    def parse_model_args(parser):
        parser = GRU4RecBase.parse_model_args_base(parser)
        return SequentialModel.parse_model_args(parser)

    @nn.compact
    def __call__(self, feed, training: bool = False, catalog: bool = False):
        if catalog:
            rnn_vector, _ = self.encode(feed, training)
            return {"u_v": rnn_vector}
        return {"prediction": self.score(feed, training)["prediction"]}


from rechorus_tpu.models.base import ImpressionSeqModel  # noqa: E402


@register_model("GRU4RecImpression")
class GRU4RecImpression(ImpressionSeqModel, GRU4RecBase):
    """Impression-mode GRU4Rec (reference GRU4Rec.py:93-106)."""

    extra_log_args: ClassVar[list] = ["emb_size", "hidden_size"]

    emb_size: int = 64
    hidden_size: int = 100

    @staticmethod
    def parse_model_args(parser):
        parser = GRU4RecBase.parse_model_args_base(parser)
        return ImpressionSeqModel.parse_model_args(parser)

    @nn.compact
    def __call__(self, feed, training: bool = False):
        return self.score(feed, training)
