"""BPRMF -- Bayesian Personalized Ranking matrix factorization.

Reference behavior: src/models/general/BPRMF.py (Rendle et al., UAI'09):
prediction = dot(u_emb[user], i_emb[items]); returns u_v/i_v for the
re-ranking pipeline.
CMD example:
  python -m rechorus_tpu.main --model_name BPRMF --emb_size 64 --lr 1e-3 \
      --l2 1e-6 --dataset Grocery_and_Gourmet_Food
"""
from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax.numpy as jnp

from rechorus_tpu.models.base import GeneralModel
from rechorus_tpu.ops.layers import embed
from rechorus_tpu.registry import register_model


class BPRMFBase:
    @staticmethod
    def parse_model_args_base(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        return parser

    def score(self, feed):
        u_ids = feed["user_id"]  # [B]
        i_ids = feed["item_id"]  # [B, C]
        u_v = embed(self.user_num, self.emb_size, "u_embeddings")(u_ids)
        i_v = embed(self.item_num, self.emb_size, "i_embeddings")(i_ids)
        prediction = (u_v[:, None, :] * i_v).sum(-1)  # [B, C]
        u_v_tiled = jnp.broadcast_to(u_v[:, None, :], i_v.shape)
        return {"prediction": prediction, "u_v": u_v_tiled, "i_v": i_v}


@register_model("BPRMF")
class BPRMF(GeneralModel, BPRMFBase):
    extra_log_args: ClassVar[list] = ["emb_size", "batch_size"]
    supports_catalog: ClassVar[bool] = True

    emb_size: int = 64

    @staticmethod
    def parse_model_args(parser):
        parser = BPRMFBase.parse_model_args_base(parser)
        return GeneralModel.parse_model_args(parser)

    @nn.compact
    def __call__(self, feed, training: bool = False, catalog: bool = False):
        if catalog:
            u_v = embed(self.user_num, self.emb_size, "u_embeddings")(feed["user_id"])
            return {"u_v": u_v}
        return {"prediction": self.score(feed)["prediction"]}


from rechorus_tpu.models.base import ImpressionModel  # noqa: E402


@register_model("BPRMFImpression")
class BPRMFImpression(ImpressionModel, BPRMFBase):
    """Impression-mode BPRMF (reference BPRMF.py:65-80)."""

    extra_log_args: ClassVar[list] = ["emb_size", "batch_size"]

    emb_size: int = 64

    @staticmethod
    def parse_model_args(parser):
        parser = BPRMFBase.parse_model_args_base(parser)
        return ImpressionModel.parse_model_args(parser)

    @nn.compact
    def __call__(self, feed, training: bool = False):
        return self.score(feed)
