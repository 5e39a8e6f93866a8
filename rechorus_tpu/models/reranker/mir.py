"""MIR -- multi-level interaction re-ranking.

Reference behavior: src/models/reranker/MIR.py (Xi et al., 2022):
intra-set multihead attention over candidates + BiLSTM over the positive
history (intra-list) + SLAttention set<->list cross interaction with a
learned time-decay, 4-layer MLP head. Requires sequential input; both
modes use ImpressionSeqReader (reference MIR.py:183-201).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from rechorus_tpu.models.base import RerankSeqModel
from rechorus_tpu.ops.layers import BiLSTM, MultiHeadAttention, dense, embed
from rechorus_tpu.registry import register_model


class SLAttention(nn.Module):
    """Set<->list co-attention with exp time decay (reference MIR.py:19-80)."""

    v_dim: int
    q_dim: int
    hidden_size: int
    decay: bool = True

    @nn.compact
    def __call__(self, V, Q, time, usr_prof):
        # V: [B, Lv, v_dim] candidates; Q: [B, Lq, q_dim] history
        B, Lv = V.shape[0], V.shape[1]
        Lq = Q.shape[1]
        w_b = self.param("w_b", lambda k, s: 0.01 * jax.random.normal(k, s), (self.q_dim, self.v_dim))
        C1 = jnp.einsum("bqd,de,bve->bqv", Q, w_b, V)
        if self.decay:
            pos = time[:, :, None]  # [B, Lq, 1] -> broadcast [B, Lq, Lv]
            theta = nn.leaky_relu(dense(1, name="fc_decay2")(
                nn.leaky_relu(dense(32, name="fc_decay1")(usr_prof))
            ))  # [B, 1]
            decay_theta = theta[:, :, None]
            pos_decay = jnp.exp(-decay_theta * pos)
            C = jnp.tanh(C1 * pos_decay + C1)
        else:
            C = C1
        w_v = self.param("w_v", lambda k, s: 0.01 * jax.random.normal(k, s), (self.v_dim, 1))
        w_q = self.param("w_q", lambda k, s: 0.01 * jax.random.normal(k, s), (self.q_dim, 1))
        hv_1 = jnp.broadcast_to(V @ w_v, (B, Lv, Lv))  # [B, Lv, Lv]
        hq_1 = jnp.broadcast_to(Q @ w_q, (B, Lq, Lv)).swapaxes(1, 2)  # [B, Lv, Lq]
        h_v = jnp.tanh(hv_1 + jnp.einsum("bvq,bqw->bvw", hq_1, C))
        h_q = jnp.tanh(hq_1 + jnp.einsum("bvw,bwq->bvq", hv_1, C.swapaxes(1, 2)))
        a_v = jax.nn.softmax(h_v, axis=-1)
        a_q = jax.nn.softmax(h_q, axis=-1)
        v = jnp.einsum("bvw,bwd->bvd", a_v, V)
        q = jnp.einsum("bvq,bqd->bvd", a_q, Q)
        return v, q


class MIRBase:
    @staticmethod
    def parse_model_args_mir(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of item embedding vectors.")
        parser.add_argument("--num_heads", type=int, default=4, help="Number of attention heads.")
        parser.add_argument("--num_hidden_unit", type=int, default=64, help="Hidden units in attention/BiLSTM.")
        return parser

    def mir_prediction(self, feed, training: bool):
        feed = self.rerank_feed(feed, training)  # no-op unless --tuneranker
        i_ids = feed["item_id"]
        his_ids = feed["history_items"]
        B, Lv = i_ids.shape

        i_emb = embed(self.item_num, self.emb_size, "i_embeddings")
        i_v = jnp.concatenate([i_emb(i_ids), feed["i_v"]], axis=2)  # [B, Lv, e+re]
        his_v = jnp.concatenate([i_emb(his_ids), feed["his_v"]], axis=2)
        seq_v = feed["u_v"][:, 0, :]  # user profile [B, re]

        padding_mask = feed["padding_mask"]
        # intra-set attention over candidates (padding masked)
        attend = (~padding_mask)[:, None, None, :]
        attn_i = MultiHeadAttention(
            i_v.shape[-1], self.num_heads, out_proj=True, name="intra_set"
        )(i_v, i_v, i_v, mask=attend)
        attn_i = attn_i * (~padding_mask)[:, :, None].astype(attn_i.dtype)
        seq = jnp.concatenate([i_v, attn_i], axis=2)  # [B, Lv, 2(e+re)]

        # intra-list BiLSTM over history
        bilstm_his = BiLSTM(self.num_hidden_unit, name="intra_list")(his_v, feed["lengths"])
        usr_seq = jnp.concatenate([bilstm_his, his_v], axis=2)

        # time transform (reference MIR.py:160-165, following MIR repo)
        ht = feed["history_times"].astype(jnp.float32)
        times = (ht > 0).astype(jnp.float32)
        tmax = jnp.max(ht, axis=1, keepdims=True) - ht
        tmax = jnp.log2(tmax + 1)
        tmax = tmax + jnp.max(tmax, axis=1, keepdims=True) + 1

        v, q = SLAttention(
            v_dim=seq.shape[-1], q_dim=usr_seq.shape[-1],
            hidden_size=self.emb_size, name="SLAttention",
        )(seq, usr_seq, tmax * times, seq_v)

        fin = jnp.concatenate([v, q], axis=2)
        final_embed = jnp.concatenate([i_v, fin], axis=2)
        final_embed = nn.LayerNorm(epsilon=1e-5, use_bias=False, use_scale=False, name="ln")(final_embed)
        drop = lambda x: nn.Dropout(self.dropout, deterministic=not training)(x)
        x = drop(nn.relu(dense(500, name="fc1")(final_embed)))
        x = drop(nn.relu(dense(200, name="fc2")(x)))
        x = drop(nn.relu(dense(80, name="fc3")(x)))
        return dense(1, name="fc4")(x)[..., 0]


@register_model("MIRGeneral")
class MIRGeneral(RerankSeqModel, MIRBase):
    emb_size: int = 64
    num_heads: int = 4
    num_hidden_unit: int = 64

    parse_model_args = staticmethod(
        lambda parser: RerankSeqModel.parse_model_args(MIRBase.parse_model_args_mir(parser))
    )

    @nn.compact
    def __call__(self, feed, training: bool = False):
        return {"prediction": self.mir_prediction(feed, training)}


@register_model("MIRSequential")
class MIRSequential(RerankSeqModel, MIRBase):
    emb_size: int = 64
    num_heads: int = 4
    num_hidden_unit: int = 64

    parse_model_args = staticmethod(
        lambda parser: RerankSeqModel.parse_model_args(MIRBase.parse_model_args_mir(parser))
    )

    @nn.compact
    def __call__(self, feed, training: bool = False):
        return {"prediction": self.mir_prediction(feed, training)}
