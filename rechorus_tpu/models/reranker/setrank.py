"""SetRank -- permutation-invariant set attention re-ranking.

Reference behavior: src/models/reranker/SetRank.py (Pang et al.,
SIGIR'20): same [item emb | u_v | i_v] input as PRM (position embedding
added AFTER rFF0), MSAB (multihead set attention) or IMSAB (induced,
m=20 inducing points) blocks.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from rechorus_tpu.models.base import RerankModel, RerankSeqModel
from rechorus_tpu.ops.layers import MultiHeadAttention, dense, embed
from rechorus_tpu.registry import register_model


class MAB(nn.Module):
    """Multihead attention block: norm1(Q + attn(Q,K,V)), norm2(x + FF(x))
    (reference SetRank.py:29-56)."""

    d_model: int
    n_heads: int
    d_ff: int = 128
    dropout: float = 0.0

    @nn.compact
    def __call__(self, Q, K, V, key_padding_mask=None, training: bool = False):
        mask = None
        if key_padding_mask is not None:
            mask = (~key_padding_mask)[:, None, None, :]  # [B,1,1,Lk]
        attn = MultiHeadAttention(self.d_model, self.n_heads, out_proj=True, name="attn")(Q, K, V, mask=mask)
        attn = nn.Dropout(self.dropout, deterministic=not training)(attn)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(Q + attn)
        ff = dense(self.d_model, name="linear2")(
            nn.Dropout(self.dropout, deterministic=not training)(nn.relu(dense(self.d_ff, name="linear1")(x)))
        )
        ff = nn.Dropout(self.dropout, deterministic=not training)(ff)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + ff)


class SetRankBase:
    @staticmethod
    def parse_model_args_setrank(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of item embedding vectors.")
        parser.add_argument("--n_blocks", type=int, default=4, help="num of blocks of MSAB/IMSAB")
        parser.add_argument("--num_heads", type=int, default=4, help="Number of attention heads.")
        parser.add_argument("--num_hidden_unit", type=int, default=64, help="Hidden units.")
        parser.add_argument("--setrank_type", type=str, default="IMSAB", help="MSAB or IMSAB")
        return parser

    def setrank_prediction(self, feed, training: bool):
        feed = self.rerank_feed(feed, training)  # no-op unless --tuneranker
        i_ids = feed["item_id"]
        i_vectors = embed(self.item_num, self.emb_size, "i_embeddings")(i_ids)
        pv = jnp.concatenate([feed["u_v"], feed["i_v"]], axis=2)
        di = jnp.concatenate([i_vectors, pv], axis=2)
        # position added AFTER rFF0 (positionafter=1, SetRank.py:108-120)
        xi = dense(self.num_hidden_unit, name="rFF0")(di)
        # sized by the larger of the train/test caps (see prm.py note)
        pi = embed(
            max(self.train_max_pos_item + self.train_max_neg_item,
                self.test_max_pos_item + self.test_max_neg_item),
            self.num_hidden_unit, "ordinal_position_embedding",
        )(feed["position"])
        xi = xi + pi

        pad = feed["padding_mask"]
        for k in range(self.n_blocks):
            if self.setrank_type == "MSAB":
                xi = MAB(self.num_hidden_unit, self.num_heads, dropout=self.dropout,
                         name=f"msab_{k}")(xi, xi, xi, key_padding_mask=pad, training=training)
            else:  # IMSAB
                m = 20
                I = self.param(f"inducing_{k}", nn.initializers.normal(0.01), (m, self.num_hidden_unit))
                I_r = jnp.broadcast_to(I[None, :, :], (xi.shape[0], m, self.num_hidden_unit))
                h = MAB(self.num_hidden_unit, self.num_heads, dropout=self.dropout,
                        name=f"imsab_{k}_1")(I_r, xi, xi, key_padding_mask=pad, training=training)
                xi = MAB(self.num_hidden_unit, self.num_heads, dropout=self.dropout,
                         name=f"imsab_{k}_2")(xi, h, h, key_padding_mask=None, training=training)
        return dense(1, name="rFF1")(xi)[..., 0]


@register_model("SetRankGeneral")
class SetRankGeneral(RerankModel, SetRankBase):
    emb_size: int = 64
    n_blocks: int = 4
    num_heads: int = 4
    num_hidden_unit: int = 64
    setrank_type: str = "IMSAB"

    parse_model_args = staticmethod(
        lambda parser: RerankModel.parse_model_args(SetRankBase.parse_model_args_setrank(parser))
    )

    @nn.compact
    def __call__(self, feed, training: bool = False):
        return {"prediction": self.setrank_prediction(feed, training)}


@register_model("SetRankSequential")
class SetRankSequential(RerankSeqModel, SetRankBase):
    emb_size: int = 64
    n_blocks: int = 4
    num_heads: int = 4
    num_hidden_unit: int = 64
    setrank_type: str = "IMSAB"

    parse_model_args = staticmethod(
        lambda parser: RerankSeqModel.parse_model_args(SetRankBase.parse_model_args_setrank(parser))
    )

    @nn.compact
    def __call__(self, feed, training: bool = False):
        return {"prediction": self.setrank_prediction(feed, training)}
