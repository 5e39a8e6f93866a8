"""TiSASRec -- time-interval-aware self-attention (Li et al., WSDM'20).

Reference behavior: src/models/sequential/TiSASRec.py: SASRec plus
pairwise time-interval key/value embeddings. Intervals = |t_i - t_j| /
user_min_interval, clipped to --time_max; attention scores add
q.inter_k and outputs add attention-weighted inter_v
(TimeIntervalMultiHeadAttention, TiSASRec.py:118-199). The per-user
minimum interval is precomputed from all interactions (TiSASRec.py:48-53).
"""
from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from rechorus_tpu.models.base import SequentialModel
from rechorus_tpu.ops.layers import dense, embed
from rechorus_tpu.registry import register_model


class TimeIntervalTransformerLayer(nn.Module):
    """Post-LN block whose attention consumes absolute-position and
    pairwise-interval K/V embeddings (reference TiSASRec.py:118-199)."""

    d_model: int
    d_ff: int
    n_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, seq, pos_k, pos_v, inter_k, inter_v, mask, training: bool = False):
        B, L, D = seq.shape
        h, d_k = self.n_heads, self.d_model // self.n_heads
        q = dense(self.d_model, name="q")(seq).reshape(B, L, h, d_k).swapaxes(1, 2)
        k = (dense(self.d_model, name="k")(seq) + pos_k).reshape(B, L, h, d_k).swapaxes(1, 2)
        v = (dense(self.d_model, name="v")(seq) + pos_v).reshape(B, L, h, d_k).swapaxes(1, 2)
        # [B, L, L, D] -> [B, h, L, L, d_k]
        ik = inter_k.reshape(B, L, L, h, d_k).transpose(0, 3, 1, 2, 4)
        iv = inter_v.reshape(B, L, L, h, d_k).transpose(0, 3, 1, 2, 4)

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        scores = scores + jnp.einsum("bhqd,bhqkd->bhqk", q, ik)
        scores = scores / (d_k ** 0.5)
        scores = jnp.where(mask, scores, -jnp.inf)
        attn = jnp.nan_to_num(nn.softmax(scores, axis=-1))
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out + jnp.einsum("bhqk,bhqkd->bhqd", attn, iv)
        context = out.swapaxes(1, 2).reshape(B, L, self.d_model)

        context = nn.LayerNorm(epsilon=1e-5, name="ln1")(
            nn.Dropout(self.dropout, deterministic=not training)(context) + seq)
        ff = dense(self.d_model, name="ff2")(nn.relu(dense(self.d_ff, name="ff1")(context)))
        return nn.LayerNorm(epsilon=1e-5, name="ln2")(
            nn.Dropout(self.dropout, deterministic=not training)(ff) + context)


@register_model("TiSASRec")
class TiSASRec(SequentialModel):
    batcher: ClassVar[str] = "tisas"
    extra_log_args: ClassVar[list] = ["emb_size", "num_layers", "num_heads", "time_max"]

    emb_size: int = 64
    num_layers: int = 1
    num_heads: int = 4
    time_max: int = 512
    supports_catalog: ClassVar[bool] = True

    @staticmethod
    def parse_model_args(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        parser.add_argument("--num_layers", type=int, default=1, help="Number of self-attention layers.")
        parser.add_argument("--num_heads", type=int, default=4, help="Number of attention heads.")
        parser.add_argument("--time_max", type=int, default=512, help="Max time intervals.")
        return SequentialModel.parse_model_args(parser)

    @nn.compact
    def __call__(self, feed, training: bool = False, catalog: bool = False):
        history = feed["history_items"]
        t_history = feed["history_times"]
        user_min_t = feed["user_min_intervals"]  # [B]
        lengths = feed["lengths"]
        B, L = history.shape

        valid_his = (history > 0).astype(jnp.int32)
        i_emb = embed(self.item_num, self.emb_size, "i_embeddings")
        his_vectors = i_emb(history)

        position = (lengths[:, None] - jnp.arange(L)[None, :]) * valid_his
        pos_k = embed(self.history_max + 1, self.emb_size, "p_k_embeddings")(position)
        pos_v = embed(self.history_max + 1, self.emb_size, "p_v_embeddings")(position)

        interval = jnp.abs(t_history[:, :, None] - t_history[:, None, :])
        interval = jnp.clip(
            (interval / jnp.maximum(user_min_t, 1)[:, None, None]).astype(jnp.int32),
            0, self.time_max)
        inter_k = embed(self.time_max + 1, self.emb_size, "t_k_embeddings")(interval)
        inter_v = embed(self.time_max + 1, self.emb_size, "t_v_embeddings")(interval)

        causal = jnp.tril(jnp.ones((1, 1, L, L), dtype=bool))
        for b in range(self.num_layers):
            his_vectors = TimeIntervalTransformerLayer(
                d_model=self.emb_size, d_ff=self.emb_size, n_heads=self.num_heads,
                dropout=self.dropout, name=f"block_{b}",
            )(his_vectors, pos_k, pos_v, inter_k, inter_v, causal, training=training)
        his_vectors = his_vectors * valid_his[:, :, None].astype(his_vectors.dtype)

        his_vector = jnp.take_along_axis(
            his_vectors, jnp.maximum(lengths - 1, 0)[:, None, None], axis=1)[:, 0, :]
        if catalog:
            return {"u_v": his_vector}
        i_vectors = i_emb(feed["item_id"])
        prediction = (his_vector[:, None, :] * i_vectors).sum(-1)
        return {"prediction": prediction}
