"""DIN -- deep interest network: target attention over user history.

Reference behavior: src/models/context_seq/DIN.py (Zhou et al., KDD'18;
RecBole SequenceAttLayer-derived): attention MLP over [q, k, q-k, q*k]
with sigmoid activations, unnormalized weights (softmax_stag=False, mask
value 0), scaled by sqrt(d); Dice-activated DNN with BatchNorm.
The reference flattens candidates to 2D and repeats history per
candidate (DIN.py:147-160); here the attention is vectorized over the
candidate axis with broadcasting -- no repeat materialization until the
4-way concat.
"""
from __future__ import annotations

import ast
from typing import ClassVar, Tuple

import flax.linen as nn
import jax.numpy as jnp

from rechorus_tpu.models.base import ContextSeqCTRModel, ContextSeqModel
from rechorus_tpu.models.context._modes import ctr_out
from rechorus_tpu.ops.layers import MLPBlock
from rechorus_tpu.registry import register_model


class DINBase:
    @staticmethod
    def parse_model_args_din(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        parser.add_argument("--att_layers", type=str, default="[64]",
                            help="Size of each layer in the attention module.")
        parser.add_argument("--dnn_layers", type=str, default="[64]",
                            help="Size of each layer in the MLP module.")
        return parser

    @classmethod
    def _din_kwargs(cls, args):
        return {
            "att_layers": tuple(ast.literal_eval(args.att_layers)),
            "dnn_layers": tuple(ast.literal_eval(args.dnn_layers)),
        }

    def din_embeddings(self, feed, training: bool):
        g = self.group_embeddings(feed, self.emb_size)
        B, C = g["item"].shape[:2]
        H = g["history"].shape[1]
        if self.add_historical_situations and "history_situ" in g:
            history_emb = jnp.concatenate([g["history"], g["history_situ"]], axis=-2).reshape(B, H, -1)
            current_emb = jnp.concatenate(
                [g["item"], jnp.broadcast_to(g["situ"][:, None], (B, C) + g["situ"].shape[1:])], axis=-2
            ).reshape(B, C, -1)
        else:
            history_emb = g["history"].reshape(B, H, -1)
            current_emb = g["item"].reshape(B, C, -1)
        ctx_parts = [g["item"], jnp.broadcast_to(g["user"][:, None], (B, C) + g["user"].shape[1:])]
        if "situ" in g:
            ctx_parts.append(jnp.broadcast_to(g["situ"][:, None], (B, C) + g["situ"].shape[1:]))
        all_context = jnp.concatenate(ctx_parts, axis=-2).reshape(B, C, -1)
        return history_emb, current_emb, all_context

    def target_attention(self, current_emb, history_emb, lengths, training: bool):
        """DIN attention, vectorized over candidates.

        current_emb [B, C, D]; history_emb [B, H, D]; lengths [B].
        Returns [B, C, D]. Parity with reference attention() incl. the
        unnormalized masked weights and sqrt(D) scaling.
        """
        B, C, D = current_emb.shape
        H = history_emb.shape[1]
        q = current_emb[:, :, None, :]  # [B, C, 1, D]
        k = history_emb[:, None, :, :]  # [B, 1, H, D]
        qb = jnp.broadcast_to(q, (B, C, H, D))
        kb = jnp.broadcast_to(k, (B, C, H, D))
        att_in = jnp.concatenate([qb, kb, qb - kb, qb * kb], axis=-1)
        w = MLPBlock(
            hidden_units=self.att_layers, hidden_activations="Sigmoid",
            dropout_rate=self.dropout, output_dim=1, name="att_mlp_layers",
        )(att_in, training=training)[..., 0]  # [B, C, H]
        valid = (jnp.arange(H)[None, None, :] < lengths[:, None, None])
        w = jnp.where(valid, w, 0.0) / jnp.sqrt(D).astype(w.dtype)
        self.sow("intermediates", "din_attention", w)  # check_list parity
        return jnp.einsum("bch,bhd->bcd", w, history_emb)

    def din_prediction(self, feed, training: bool):
        history_emb, current_emb, all_context = self.din_embeddings(feed, training)
        user_his = self.target_attention(current_emb, history_emb, feed["lengths"], training)
        din_in = jnp.concatenate([user_his, user_his * current_emb, all_context], axis=-1)
        out = MLPBlock(
            hidden_units=self.dnn_layers, hidden_activations="Dice", norm="batch_norm",
            dropout_rate=self.dropout, output_dim=1, name="dnn_mlp_layers",
        )(din_in, training=training)
        return out[..., 0]


@register_model("DINCTR")
class DINCTR(ContextSeqCTRModel, DINBase):
    extra_log_args: ClassVar[list] = ["emb_size", "att_layers", "add_historical_situations"]

    emb_size: int = 64
    att_layers: Tuple[int, ...] = (64,)
    dnn_layers: Tuple[int, ...] = (64,)

    parse_model_args = staticmethod(
        lambda parser: ContextSeqCTRModel.parse_model_args(DINBase.parse_model_args_din(parser))
    )

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw.update(cls._din_kwargs(args))
        return kw

    @nn.compact
    def __call__(self, feed, training: bool = False):
        return ctr_out(self.din_prediction(feed, training), feed)


@register_model("DINTopK")
class DINTopK(ContextSeqModel, DINBase):
    extra_log_args: ClassVar[list] = ["emb_size", "att_layers", "add_historical_situations"]

    emb_size: int = 64
    att_layers: Tuple[int, ...] = (64,)
    dnn_layers: Tuple[int, ...] = (64,)

    parse_model_args = staticmethod(
        lambda parser: ContextSeqModel.parse_model_args(DINBase.parse_model_args_din(parser))
    )

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw.update(cls._din_kwargs(args))
        return kw

    @nn.compact
    def __call__(self, feed, training: bool = False):
        return {"prediction": self.din_prediction(feed, training)}
