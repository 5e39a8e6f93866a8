"""CAN -- co-action network on top of DIEN.

Reference behavior: src/models/context_seq/CAN.py (Bian et al., 2022):
the target item's "induce" embedding is reshaped into per-item micro-MLP
weights; user / situation / history embeddings are fed through that
micro-MLP (tanh), history outputs mean-pooled over valid steps; all
co-action outputs concatenated with the DIEN input into the FCN.
"""
from __future__ import annotations

from typing import ClassVar, Tuple

import ast

import flax.linen as nn
import jax.numpy as jnp

from rechorus_tpu.models.base import ContextSeqCTRModel, ContextSeqModel
from rechorus_tpu.models.context._modes import ctr_out
from rechorus_tpu.models.context_seq.dien import DIENBase
from rechorus_tpu.ops.layers import MLPBlock, NORMAL_INIT, embed
from rechorus_tpu.registry import register_model


class CANBase(DIENBase):
    @staticmethod
    def parse_model_args_can(parser):
        parser.add_argument("--induce_vec_size", type=int, default=512,
                            help="size of the induced co-action vector")
        parser.add_argument("--orders", type=int, default=1,
                            help="orders of the feature co-action vector")
        parser.add_argument("--co_action_layers", type=str, default="[4,4]",
                            help="layers of the micro-MLP in the co-action module")
        return DIENBase.parse_model_args_dien(parser)

    @classmethod
    def _can_kwargs(cls, args):
        kw = cls._dien_kwargs(args)
        kw["co_action_layers"] = tuple(ast.literal_eval(args.co_action_layers))
        return kw

    def _micro_mlp(self, induction, feed_vec):
        """Apply the induced micro-MLP to feed vectors.

        induction [B, C, induce]; feed_vec [..., B, C(broadcastable), D*orders].
        Returns concat of all layer outputs along the last axis.
        """
        orders = [feed_vec ** (i + 1) for i in range(self.orders)]
        h = jnp.concatenate(orders, axis=-1)
        pre = h.shape[-1]
        start = 0
        outs = []
        for layer in self.co_action_layers:
            w = induction[..., start : start + pre * layer]
            w = w.reshape(w.shape[:-1] + (pre, layer))
            start += pre * layer
            b = induction[..., start : start + layer]
            start += layer
            h = jnp.tanh(jnp.einsum("...d,...dl->...l", h, w) + b)
            outs.append(h)
            pre = layer
        return outs

    def can_prediction(self, feed, training: bool):
        dien_out = self.dien_forward_parts(feed, training)
        g, inp, out = dien_out["g"], dien_out["inp"], dien_out["out"]
        B, C = g["item"].shape[:2]

        item_ids = feed["item_id"]
        if item_ids.ndim == 1:
            item_ids = item_ids[:, None]
        induction = embed(self.item_num, self.induce_vec_size, "item_embedding_induce")(item_ids)

        user_vec = g["user"][:, 0, :]  # user_id embedding [B, d]
        ui = self._micro_mlp(induction, jnp.broadcast_to(user_vec[:, None, :], (B, C, user_vec.shape[-1])))
        co_parts = [jnp.concatenate(ui, axis=-1)]
        if "situ" in g:
            for s in range(g["situ"].shape[-2]):
                sv = g["situ"][:, s, :]
                ci = self._micro_mlp(induction, jnp.broadcast_to(sv[:, None, :], (B, C, sv.shape[-1])))
                co_parts.append(jnp.concatenate(ci, axis=-1))
        # history co-action: micro-MLP over each history step, masked mean
        hist_vec = g["history"][..., 0, :]  # item_id embeddings [B, H, d]
        H = hist_vec.shape[1]
        lengths = feed["lengths"]
        mask = (jnp.arange(H)[None, :] < lengths[:, None]).astype(hist_vec.dtype)
        hs = self._micro_mlp(induction[:, None], hist_vec[:, :, None, :])  # list of [B, H, C, l]
        pooled = [
            (h * mask[:, :, None, None]).sum(axis=1) / jnp.maximum(mask.sum(axis=1)[:, None, None], 1.0)
            for h in hs
        ]
        co_parts.append(jnp.concatenate(pooled, axis=-1))

        all_in = jnp.concatenate(co_parts + [inp], axis=-1)
        prediction = MLPBlock(
            hidden_units=self.fcn_hidden_layers, hidden_activations=self.fcn_activations,
            dropout_rate=self.dropout, output_dim=1, name="fcn_net",
        )(all_in, training=training)[..., 0]
        out["prediction"] = prediction
        return out


@register_model("CANCTR")
class CANCTR(ContextSeqCTRModel, CANBase):
    extra_log_args: ClassVar[list] = ["emb_size", "evolving_gru_type"]

    emb_size: int = 64
    evolving_gru_type: str = "AGRU"
    fcn_hidden_layers: Tuple[int, ...] = (64,)
    fcn_activations: str = "ReLU"
    aux_hidden_layers: Tuple[int, ...] = (64,)
    aux_activations: str = "ReLU"
    alpha_aux: float = 0.0
    induce_vec_size: int = 512
    orders: int = 1
    co_action_layers: Tuple[int, ...] = (4, 4)

    parse_model_args = staticmethod(
        lambda parser: ContextSeqCTRModel.parse_model_args(CANBase.parse_model_args_can(parser))
    )

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw.update(cls._can_kwargs(args))
        return kw

    @nn.compact
    def __call__(self, feed, training: bool = False):
        out = self.can_prediction(feed, training)
        res = ctr_out(out["prediction"], feed)
        if "aux_loss" in out:
            res["aux_loss"] = out["aux_loss"]
        return res

    def loss(self, out_dict, feed):
        loss = super().loss(out_dict, feed)
        if "aux_loss" in out_dict:
            loss = loss + self.alpha_aux * out_dict["aux_loss"]
        return loss


@register_model("CANTopK")
class CANTopK(ContextSeqModel, CANBase):
    extra_log_args: ClassVar[list] = ["emb_size", "evolving_gru_type", "fcn_hidden_layers"]

    emb_size: int = 64
    evolving_gru_type: str = "AGRU"
    fcn_hidden_layers: Tuple[int, ...] = (64,)
    fcn_activations: str = "ReLU"
    aux_hidden_layers: Tuple[int, ...] = (64,)
    aux_activations: str = "ReLU"
    alpha_aux: float = 0.0
    induce_vec_size: int = 512
    orders: int = 1
    co_action_layers: Tuple[int, ...] = (4, 4)

    parse_model_args = staticmethod(
        lambda parser: ContextSeqModel.parse_model_args(CANBase.parse_model_args_can(parser))
    )

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw.update(cls._can_kwargs(args))
        return kw

    @nn.compact
    def __call__(self, feed, training: bool = False):
        out = self.can_prediction(feed, training)
        return out

    def loss(self, out_dict, feed):
        loss = super().loss(out_dict, feed)
        if "aux_loss" in out_dict:
            loss = loss + self.alpha_aux * out_dict["aux_loss"]
        return loss
