"""DIEN -- deep interest evolution network.

Reference behavior: src/models/context_seq/DIEN.py (Zhou et al., AAAI'19;
FuxiCTR-derived): interest-extraction GRU over history, target attention,
interest-evolving AGRU/AUGRU/AIGRU, FCN head; optional auxiliary
next-item binary loss on sampled negative history (--alpha_aux > 0).

TPU deviations (documented):
  * The extractor GRU runs ONCE per batch instead of per candidate
    (reference repeats identical inputs per item, DIEN.py:144-148) --
    outputs are identical, compute is C-times less.
  * target_attention softmaxes over the HISTORY axis; the reference
    softmaxes dim=-2 (the flattened batch axis, DIEN.py:124) which is a
    latent bug vs the paper/FuxiCTR.
  * Negative history for the aux loss is sampled on device per step
    (reference samples per epoch on host, DIEN.py:195-205).
"""
from __future__ import annotations

import ast
from typing import ClassVar, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rechorus_tpu.models.base import ContextSeqCTRModel, ContextSeqModel
from rechorus_tpu.models.context._modes import ctr_out
from rechorus_tpu.ops.layers import AttentionalGRU, MLPBlock, MaskedGRU
from rechorus_tpu.ops.losses import masked_softmax
from rechorus_tpu.registry import register_model


class DIENBase:
    @staticmethod
    def parse_model_args_dien(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="the size of the embedding vectors")
        parser.add_argument("--evolving_gru_type", type=str, default="AGRU",
                            help="the type of the evolving gru: AGRU, AUGRU, AIGRU")
        parser.add_argument("--fcn_hidden_layers", type=str, default="[64]", help="hidden layers of the fcn net")
        parser.add_argument("--fcn_activations", type=str, default="ReLU", help="activation of the fcn net")
        parser.add_argument("--aux_hidden_layers", type=str, default="[64]", help="hidden layers of the aux net")
        parser.add_argument("--aux_activations", type=str, default="ReLU", help="activation of the aux net")
        parser.add_argument("--alpha_aux", type=float, default=0,
                            help="weight of auxiliary loss; aux net used only when alpha_aux>0")
        return parser

    @classmethod
    def _dien_kwargs(cls, args):
        return {
            "fcn_hidden_layers": tuple(ast.literal_eval(args.fcn_hidden_layers)),
            "aux_hidden_layers": tuple(ast.literal_eval(args.aux_hidden_layers)),
        }

    def dien_forward_parts(self, feed, training: bool):
        """Everything up to (not including) the FCN head; returns
        {'g': group embeddings, 'inp': fcn input, 'out': aux outputs} so
        CAN can extend the fcn input with co-action features."""
        extra = {}
        if self.alpha_aux > 0 and training and "history_neg_items" in feed:
            extra["history_neg"] = feed["history_neg_items"]
        g = self.group_embeddings(feed, self.emb_size, extra_item_ids=extra)
        B, C = g["item"].shape[:2]
        H = g["history"].shape[1]
        if self.add_historical_situations and "history_situ" in g:
            history_emb = jnp.concatenate([g["history"], g["history_situ"]], axis=-2).reshape(B, H, -1)
            target_emb = jnp.concatenate(
                [g["item"], jnp.broadcast_to(g["situ"][:, None], (B, C) + g["situ"].shape[1:])], axis=-2
            ).reshape(B, C, -1)
        else:
            history_emb = g["history"].reshape(B, H, -1)
            target_emb = g["item"].reshape(B, C, -1)
        user_emb = g["user"].reshape(B, -1)
        situ_emb = g["situ"].reshape(B, -1) if "situ" in g else None
        lengths = feed["lengths"]
        D = history_emb.shape[-1]

        # interest extraction (once per batch -- inputs are target-free)
        interest_emb, _ = MaskedGRU(D, name="gru")(history_emb, lengths)

        # target attention over the history axis
        attW = self.param("attentionW", nn.initializers.normal(1.0), (D, D))
        proj = interest_emb @ attW  # [B, H, D]
        scores = jnp.einsum("bhd,bcd->bch", proj, target_emb)
        valid = (jnp.arange(H)[None, None, :] < lengths[:, None, None])
        attention = masked_softmax(scores, valid, axis=-1)  # [B, C, H]

        # interest evolution per candidate
        ev = AttentionalGRU(D, gru_type=self.evolving_gru_type, name="evolving_gru")
        flat_inputs = jnp.broadcast_to(interest_emb[:, None], (B, C, H, D)).reshape(B * C, H, D)
        flat_att = attention.reshape(B * C, H)
        flat_len = jnp.broadcast_to(lengths[:, None], (B, C)).reshape(B * C)
        h_out = ev(flat_inputs, flat_att, flat_len).reshape(B, C, D)

        history_sum = history_emb.sum(axis=-2)  # [B, D] (pads included, parity)
        parts = [jnp.broadcast_to(user_emb[:, None], (B, C, user_emb.shape[-1]))]
        if situ_emb is not None:
            parts.append(jnp.broadcast_to(situ_emb[:, None], (B, C, situ_emb.shape[-1])))
        parts += [
            target_emb,
            jnp.broadcast_to(history_sum[:, None], (B, C, D)),
            target_emb * history_sum[:, None],
            h_out,
        ]
        inp = jnp.concatenate(parts, axis=-1)

        out = {}
        if "history_neg" in g:
            neg_hist = g["history_neg"]
            if self.add_historical_situations and "history_situ" in g:
                neg_hist = jnp.concatenate([neg_hist, g["history_situ"]], axis=-2)
            neg_hist = neg_hist.reshape(B, H, -1)
            out["aux_loss"] = self._aux_loss(interest_emb, history_emb, neg_hist, lengths, training)
        return {"g": g, "inp": inp, "out": out}

    def dien_forward(self, feed, training: bool):
        p = self.dien_forward_parts(feed, training)
        prediction = MLPBlock(
            hidden_units=self.fcn_hidden_layers, hidden_activations=self.fcn_activations,
            dropout_rate=self.dropout, output_dim=1, name="fcn_net",
        )(p["inp"], training=training)[..., 0]
        out = p["out"]
        out["prediction"] = prediction
        return out

    def _aux_loss(self, interest_emb, pos_emb, neg_emb, lengths, training: bool):
        """Binary next-item discrimination (reference DIEN.py:176-192)."""
        aux = MLPBlock(
            hidden_units=self.aux_hidden_layers, hidden_activations=self.aux_activations,
            dropout_rate=self.dropout, output_dim=1, name="aux_net",
        )
        pos_in = jnp.concatenate([interest_emb[:, :-1, :], pos_emb[:, 1:, :]], axis=-1)
        neg_in = jnp.concatenate([interest_emb[:, :-1, :], neg_emb[:, 1:, :]], axis=-1)
        pos_p = nn.sigmoid(aux(pos_in, training=training)[..., 0])
        neg_p = nn.sigmoid(aux(neg_in, training=training)[..., 0])
        eps = 1e-7
        pos_l = -jnp.log(jnp.clip(pos_p, eps, 1 - eps))
        neg_l = -jnp.log(jnp.clip(1 - neg_p, eps, 1 - eps))
        Hm1 = pos_l.shape[1]
        mask = (jnp.arange(1, Hm1 + 1)[None, :] < lengths[:, None]).astype(pos_l.dtype)
        per_row = jnp.stack([(pos_l * mask).sum(-1), (neg_l * mask).sum(-1)], 0) / (mask.sum(-1) + 1e-9)
        return per_row.mean()


@register_model("DIENCTR")
class DIENCTR(ContextSeqCTRModel, DIENBase):
    extra_log_args: ClassVar[list] = ["emb_size", "evolving_gru_type", "fcn_hidden_layers"]

    emb_size: int = 64
    evolving_gru_type: str = "AGRU"
    fcn_hidden_layers: Tuple[int, ...] = (64,)
    fcn_activations: str = "ReLU"
    aux_hidden_layers: Tuple[int, ...] = (64,)
    aux_activations: str = "ReLU"
    alpha_aux: float = 0.0

    parse_model_args = staticmethod(
        lambda parser: ContextSeqCTRModel.parse_model_args(DIENBase.parse_model_args_dien(parser))
    )

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw.update(cls._dien_kwargs(args))
        return kw

    @nn.compact
    def __call__(self, feed, training: bool = False):
        out = self.dien_forward(feed, training)
        res = ctr_out(out["prediction"], feed)
        if "aux_loss" in out:
            res["aux_loss"] = out["aux_loss"]
        return res

    def loss(self, out_dict, feed):
        loss = super().loss(out_dict, feed)
        if "aux_loss" in out_dict:
            loss = loss + self.alpha_aux * out_dict["aux_loss"]
        return loss


@register_model("DIENTopK")
class DIENTopK(ContextSeqModel, DIENBase):
    extra_log_args: ClassVar[list] = ["emb_size", "evolving_gru_type", "fcn_hidden_layers"]

    emb_size: int = 64
    evolving_gru_type: str = "AGRU"
    fcn_hidden_layers: Tuple[int, ...] = (64,)
    fcn_activations: str = "ReLU"
    aux_hidden_layers: Tuple[int, ...] = (64,)
    aux_activations: str = "ReLU"
    alpha_aux: float = 0.0

    parse_model_args = staticmethod(
        lambda parser: ContextSeqModel.parse_model_args(DIENBase.parse_model_args_dien(parser))
    )

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw.update(cls._dien_kwargs(args))
        return kw

    @nn.compact
    def __call__(self, feed, training: bool = False):
        return self.dien_forward(feed, training)

    def loss(self, out_dict, feed):
        loss = super().loss(out_dict, feed)
        if "aux_loss" in out_dict:
            loss = loss + self.alpha_aux * out_dict["aux_loss"]
        return loss
