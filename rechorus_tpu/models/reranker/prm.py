"""PRM -- personalized re-ranking model.

Reference behavior: src/models/reranker/PRM.py (Pei et al., RecSys'19):
input per candidate = [reranker item emb | ranker u_v | ranker i_v] +
learned ordinal position embedding (by ranker-score rank), transformer
encoder stack with key-padding mask, linear head. Modes: PRMGeneral
(ImpressionReader ranker feeds) and PRMSequential (ImpressionSeqReader).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from rechorus_tpu.models.base import RerankModel, RerankSeqModel
from rechorus_tpu.ops.layers import TransformerLayer, dense, embed
from rechorus_tpu.registry import register_model


class PRMBase:
    @staticmethod
    def parse_model_args_prm(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of item embedding vectors.")
        parser.add_argument("--n_blocks", type=int, default=4, help="num of transformer blocks")
        parser.add_argument("--num_heads", type=int, default=4, help="Number of attention heads.")
        parser.add_argument("--num_hidden_unit", type=int, default=64, help="Hidden units in Transformer layer.")
        return parser

    def prm_prediction(self, feed, training: bool):
        feed = self.rerank_feed(feed, training)  # no-op unless --tuneranker
        i_ids = feed["item_id"]  # [B, L]
        L = i_ids.shape[1]
        i_vectors = embed(self.item_num, self.emb_size, "i_embeddings")(i_ids)
        pv = jnp.concatenate([feed["u_v"], feed["i_v"]], axis=2)
        di = jnp.concatenate([i_vectors, pv], axis=2)
        # sized by the LARGER of the train/test caps: the reference sizes
        # by train caps only and index-errors when test caps exceed them;
        # a JAX gather would silently clamp instead, so size for both
        pi = embed(
            max(self.train_max_pos_item + self.train_max_neg_item,
                self.test_max_pos_item + self.test_max_neg_item),
            self.emb_size + self.ranker_emb_size * 2,
            "ordinal_position_embedding",
        )(feed["position"])
        xi = dense(self.num_hidden_unit, name="rFF0")(di + pi)

        attend = (~feed["padding_mask"])[:, None, None, :]  # [B,1,1,L]
        for k in range(self.n_blocks):
            xi = TransformerLayer(
                d_model=self.num_hidden_unit, d_ff=128, n_heads=self.num_heads,
                dropout=self.dropout, kq_same=False, out_proj=True, name=f"encoder_{k}",
            )(xi, mask=attend, training=training)
        return dense(1, name="rFF1")(xi)[..., 0]


@register_model("PRMGeneral")
class PRMGeneral(RerankModel, PRMBase):
    emb_size: int = 64
    n_blocks: int = 4
    num_heads: int = 4
    num_hidden_unit: int = 64

    parse_model_args = staticmethod(
        lambda parser: RerankModel.parse_model_args(PRMBase.parse_model_args_prm(parser))
    )

    @nn.compact
    def __call__(self, feed, training: bool = False):
        return {"prediction": self.prm_prediction(feed, training)}


@register_model("PRMSequential")
class PRMSequential(RerankSeqModel, PRMBase):
    emb_size: int = 64
    n_blocks: int = 4
    num_heads: int = 4
    num_hidden_unit: int = 64

    parse_model_args = staticmethod(
        lambda parser: RerankSeqModel.parse_model_args(PRMBase.parse_model_args_prm(parser))
    )

    @nn.compact
    def __call__(self, feed, training: bool = False):
        return {"prediction": self.prm_prediction(feed, training)}
