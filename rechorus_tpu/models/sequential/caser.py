"""Caser -- convolutional sequence embedding.

Reference behavior: src/models/sequential/Caser.py (Tang & Wang, WSDM'18):
horizontal convs of widths 1..L max-pooled over time + vertical conv over
the time axis, concatenated through fc, combined with the user embedding.
Pad item 0 embeds to zeros (reference uses padding_idx=0).
"""
from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax.numpy as jnp

from rechorus_tpu.models.base import SequentialModel
from rechorus_tpu.ops.layers import NORMAL_INIT, dense, embed
from rechorus_tpu.registry import register_model


@register_model("Caser")
class Caser(SequentialModel):
    extra_log_args: ClassVar[list] = ["emb_size", "num_horizon", "num_vertical", "L"]
    supports_catalog: ClassVar[bool] = True

    emb_size: int = 64
    num_horizon: int = 16
    num_vertical: int = 8
    L: int = 4

    @staticmethod
    def parse_model_args(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        parser.add_argument("--num_horizon", type=int, default=16, help="Number of horizon convolution kernels.")
        parser.add_argument("--num_vertical", type=int, default=8, help="Number of vertical convolution kernels.")
        parser.add_argument("--L", type=int, default=4, help="Union window size.")
        return SequentialModel.parse_model_args(parser)

    @nn.compact
    def __call__(self, feed, training: bool = False, catalog: bool = False):
        u_ids = feed["user_id"]
        history = feed["history_items"]  # [B, max_his]
        B, L_seq = history.shape

        i_emb = embed(self.item_num, self.emb_size, "i_embeddings")
        his = i_emb(history) * (history > 0)[:, :, None]  # padding_idx=0 semantics
        his_img = his[:, :, :, None]  # [B, T, E, 1] -- NHWC for flax Conv

        outs = []
        if self.num_vertical > 0:
            out_v = nn.Conv(
                self.num_vertical, kernel_size=(L_seq, 1), padding="VALID",
                kernel_init=NORMAL_INIT, bias_init=NORMAL_INIT, name="conv_v",
            )(his_img)  # [B, 1, E, num_v]
            outs.append(out_v.reshape(B, -1))
        if self.num_horizon > 0:
            hs = []
            for h in range(1, self.L + 1):
                conv = nn.Conv(
                    self.num_horizon, kernel_size=(h, self.emb_size), padding="VALID",
                    kernel_init=NORMAL_INIT, bias_init=NORMAL_INIT, name=f"conv_h_{h}",
                )(his_img)  # [B, T-h+1, 1, num_h]
                conv = nn.relu(conv[:, :, 0, :])
                hs.append(conv.max(axis=1))  # max-pool over time
            outs.append(jnp.concatenate(hs, axis=1))

        user_vector = embed(self.user_num, self.emb_size, "u_embeddings")(u_ids)
        z = nn.relu(dense(self.emb_size, name="fc")(jnp.concatenate(outs, axis=1)))
        his_vector = dense(self.emb_size, name="out")(jnp.concatenate([z, user_vector], axis=1))

        if catalog:
            return {"u_v": his_vector}
        i_vectors = i_emb(feed["item_id"])
        prediction = (his_vector[:, None, :] * i_vectors).sum(-1)
        return {"prediction": prediction}
