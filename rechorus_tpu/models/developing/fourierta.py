"""FourierTA -- Fourier temporal attention over the history.

Reference behavior: src/models/developing/FourierTA.py: MLP target
attention over history items, modulated by a learnable inverse-DFT decay
of the log-normalized interaction age (FourierTemporalAttention, 84-120);
one FFN + layer-norm block; prediction = dot(u + context, item) + bias.
"""
from __future__ import annotations

import math
from typing import ClassVar

import flax.linen as nn
import jax.numpy as jnp

from rechorus_tpu.models.base import SequentialModel
from rechorus_tpu.ops import losses
from rechorus_tpu.ops.layers import NORMAL_INIT, dense
from rechorus_tpu.registry import register_model


@register_model("FourierTA")
class FourierTA(SequentialModel):
    batcher: ClassVar[str] = "seq_delta"
    extra_log_args: ClassVar[list] = ["t_scalar"]

    emb_size: int = 64
    t_scalar: int = 60

    @staticmethod
    def parse_model_args(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        parser.add_argument("--t_scalar", type=int, default=60, help="Time interval scalar.")
        return SequentialModel.parse_model_args(parser)

    @nn.compact
    def __call__(self, feed, training: bool = False):
        d = self.emb_size
        u_vectors = self.param("user_embeddings", NORMAL_INIT, (self.user_num, d))[feed["user_id"]]
        item_emb = self.param("item_embeddings", NORMAL_INIT, (self.item_num, d))
        i_vectors = item_emb[feed["item_id"]]  # [B, C, d]
        his_vectors = item_emb[feed["history_items"]]  # [B, H, d]
        delta_t_n = feed["history_delta_t"]  # [B, H]
        valid = (feed["history_items"] > 0)  # [B, H]

        # MLP target attention (FourierTA.py:110-115)
        query = his_vectors[:, None, :, :] * i_vectors[:, :, None, :]  # [B, C, H, d]
        attention = dense(1, use_bias=False, name="A_out")(
            jnp.tanh(dense(10, name="A")(query)))[..., 0]  # [B, C, H]
        attention = losses.masked_softmax(
            attention, jnp.broadcast_to(valid[:, None, :], attention.shape), axis=-1)

        # learnable inverse-DFT decay (FourierTA.py:102-108)
        freq_real = self.param("freq_real", NORMAL_INIT, (d,))
        freq_imag = self.param("freq_imag", NORMAL_INIT, (d,))
        freq = jnp.linspace(0.0, 1.0, d) / 2.0
        freqs = jnp.concatenate([freq, -freq])
        x_real = jnp.concatenate([freq_real, freq_real])
        x_imag = jnp.concatenate([freq_imag, -freq_imag])
        w = 2.0 * math.pi * freqs * delta_t_n[..., None]  # [B, H, 2d]
        decay = ((jnp.cos(w) * x_real - jnp.sin(w) * x_imag).mean(-1) / 2.0)
        decay = jnp.clip(decay, 0.0, 1.0) * valid  # [B, H]
        attention = attention * decay[:, None, :]
        context = jnp.einsum("bch,bhd->bcd", attention, his_vectors)

        residual = context
        context = dense(d, name="W2")(nn.relu(dense(d, name="W1")(context)))
        context = nn.Dropout(self.dropout, deterministic=not training)(context)
        context = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(residual + context)

        i_bias = self.param("item_bias", NORMAL_INIT, (self.item_num, 1))[feed["item_id"]][..., 0]
        prediction = ((u_vectors[:, None, :] + context) * i_vectors).sum(-1) + i_bias
        return {"prediction": prediction}
