"""DCNv2 -- improved deep & cross: full-matrix cross or mixture of
low-rank experts, parallel or stacked structure.

Reference behavior: src/models/context/DCNv2.py (Wang et al., WWW'21).
"""
from __future__ import annotations

import ast
from typing import ClassVar, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rechorus_tpu.models.base import ContextCTRModel, ContextModel
from rechorus_tpu.models.context._modes import ctr_out
from rechorus_tpu.ops.feature_bank import FeatureEmbeddingBank
from rechorus_tpu.ops.layers import MLPBlock, dense
from rechorus_tpu.registry import register_model


class DCNv2Base:
    @staticmethod
    def parse_model_args_dcnv2(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        parser.add_argument("--layers", type=str, default="[64]", help="Size of each deep layer.")
        parser.add_argument("--cross_layer_num", type=int, default=4, help="Number of cross layers.")
        parser.add_argument("--mixed", type=int, default=1, help="Whether to use mixture of low-rank experts.")
        parser.add_argument("--structure", type=str, default="parallel", help="parallel | stacked")
        parser.add_argument("--low_rank", type=int, default=64, help="Low-rank size when mixed==1.")
        parser.add_argument("--expert_num", type=int, default=2, help="Number of experts per cross layer when mixed==1.")
        parser.add_argument("--reg_weight", type=float, default=2.0, help="Regularization weight (mixed version).")
        return parser

    @classmethod
    def _layers_kwargs(cls, args):
        return {"layers": tuple(ast.literal_eval(args.layers))}

    def cross_net_2(self, x0):
        """x_{l+1} = x_0 * (W_l x_l + b_l) + x_l (full matrix). Also
        returns sum_l ||W_l||_F: the reference adds reg_weight * that to
        the loss for the non-mixed variant (DCNv2.py:192-198)."""
        D = x0.shape[-1]
        x_l = x0
        reg = 0.0
        for layer in range(self.cross_layer_num):
            w = self.param(f"cross_w2_{layer}", nn.initializers.normal(1.0), (D, D))
            b = self.param(f"cross_b_{layer}", nn.initializers.zeros, (D,))
            xl_w = jnp.einsum("de,bce->bcd", w, x_l) + b
            x_l = x0 * xl_w + x_l
            reg = reg + jnp.sqrt((w ** 2).sum())
        return x_l, reg

    def cross_net_mix(self, x0):
        """MoE of low-rank experts with tanh nonlinearity in the subspace
        (reference DCNv2.py:96-145, RecBole-derived). The gating Linear is
        per-EXPERT, shared across cross layers (reference DCNv2.py:62)."""
        D = x0.shape[-1]
        x_l = x0
        gating_mods = [dense(1, name=f"gating_{e}") for e in range(self.expert_num)]
        for layer in range(self.cross_layer_num):
            b = self.param(f"cross_b_{layer}", nn.initializers.zeros, (D,))
            U = self.param(f"cross_u_{layer}", nn.initializers.normal(1.0), (self.expert_num, D, self.low_rank))
            V = self.param(f"cross_v_{layer}", nn.initializers.normal(1.0), (self.expert_num, D, self.low_rank))
            Cm = self.param(f"cross_c_{layer}", nn.initializers.normal(1.0), (self.expert_num, self.low_rank, self.low_rank))
            expert_outs, gates = [], []
            for e in range(self.expert_num):
                gates.append(gating_mods[e](x_l))  # [B, C, 1]
                xl_v = jnp.einsum("dr,bcd->bcr", V[e], x_l)
                xl_c = jnp.tanh(xl_v)
                xl_c = jnp.einsum("rs,bcs->bcr", Cm[e], xl_c)
                xl_c = jnp.tanh(xl_c)
                xl_u = jnp.einsum("dr,bcr->bcd", U[e], xl_c)
                expert_outs.append(x0 * (xl_u + b))
            expert_output = jnp.stack(expert_outs, axis=-1)  # [B, C, D, E]
            gating = jax.nn.softmax(jnp.concatenate(gates, axis=-1), axis=-1)  # [B, C, E]
            moe = jnp.einsum("bcde,bce->bcd", expert_output, gating)
            x_l = x_l + moe
        return x_l

    def dcnv2_prediction(self, feed, training: bool):
        cat_ids, float_vals = self.context_inputs(feed)
        context_vectors = FeatureEmbeddingBank(
            total_vocab=self.total_vocab, kinds=self.feature_kinds,
            vec_size=self.emb_size, include_linear=False, name="bank",
        )(cat_ids, float_vals)
        B, C = context_vectors.shape[:2]
        context_emb = context_vectors.reshape(B, C, -1)

        if self.mixed:
            cross_output, reg = self.cross_net_mix(context_emb), 0.0
        else:
            cross_output, reg = self.cross_net_2(context_emb)
        deep = MLPBlock(
            hidden_units=self.layers, hidden_activations="ReLU", norm="batch_norm",
            dropout_rate=self.dropout, output_dim=None, name="deep_layers",
        )
        if self.structure == "parallel":
            deep_output = deep(context_emb, training=training)
            output = dense(1, name="predict_layer")(jnp.concatenate([cross_output, deep_output], axis=-1))
        else:  # stacked
            deep_output = deep(cross_output, training=training)
            output = dense(1, name="predict_layer")(deep_output)
        return output[..., 0], reg


@register_model("DCNv2CTR")
class DCNv2CTR(ContextCTRModel, DCNv2Base):
    extra_log_args: ClassVar[list] = ["emb_size", "loss_n", "cross_layer_num", "structure"]

    emb_size: int = 64
    layers: Tuple[int, ...] = (64,)
    cross_layer_num: int = 4
    mixed: int = 1
    structure: str = "parallel"
    low_rank: int = 64
    expert_num: int = 2
    reg_weight: float = 2.0

    parse_model_args = staticmethod(
        lambda parser: ContextCTRModel.parse_model_args(DCNv2Base.parse_model_args_dcnv2(parser))
    )

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw.update(cls._layers_kwargs(args))
        return kw

    @nn.compact
    def __call__(self, feed, training: bool = False):
        pred, reg = self.dcnv2_prediction(feed, training)
        out = ctr_out(pred, feed)
        out["reg_loss"] = self.reg_weight * reg
        return out

    def loss(self, out_dict, feed):
        # reference adds the cross-matrix L2 only for mixed==0 (DCNv2.py:192-222)
        return super().loss(out_dict, feed) + out_dict["reg_loss"]


@register_model("DCNv2TopK")
class DCNv2TopK(ContextModel, DCNv2Base):
    extra_log_args: ClassVar[list] = ["emb_size", "loss_n", "cross_layer_num", "structure"]

    emb_size: int = 64
    layers: Tuple[int, ...] = (64,)
    cross_layer_num: int = 4
    mixed: int = 1
    structure: str = "parallel"
    low_rank: int = 64
    expert_num: int = 2
    reg_weight: float = 2.0

    parse_model_args = staticmethod(
        lambda parser: ContextModel.parse_model_args(DCNv2Base.parse_model_args_dcnv2(parser))
    )

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw.update(cls._layers_kwargs(args))
        return kw

    @nn.compact
    def __call__(self, feed, training: bool = False):
        pred, reg = self.dcnv2_prediction(feed, training)
        return {"prediction": pred, "reg_loss": self.reg_weight * reg}

    def loss(self, out_dict, feed):
        return super().loss(out_dict, feed) + out_dict["reg_loss"]
