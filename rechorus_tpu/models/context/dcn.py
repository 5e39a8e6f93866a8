"""DCN -- deep & cross network.

Reference behavior: src/models/context/DCN.py (Wang et al., KDD'17):
cross network x_{l+1} = x_0 * (w_l . x_l) + b_l + x_l parallel to a deep
MLP (BatchNorm before activation); loss adds reg_weight * sum ||w_l||_2.
"""
from __future__ import annotations

import ast
from typing import ClassVar, Tuple

import flax.linen as nn
import jax.numpy as jnp

from rechorus_tpu.models.base import ContextCTRModel, ContextModel
from rechorus_tpu.models.context._modes import ctr_out
from rechorus_tpu.ops.feature_bank import FeatureEmbeddingBank
from rechorus_tpu.ops.layers import MLPBlock, dense
from rechorus_tpu.registry import register_model


class DCNBase:
    @staticmethod
    def parse_model_args_dcn(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        parser.add_argument("--layers", type=str, default="[64]", help="Size of each deep layer.")
        parser.add_argument("--cross_layer_num", type=int, default=6, help="Number of cross layers.")
        parser.add_argument("--reg_weight", type=float, default=2.0,
                            help="Regularization weight for cross-layer weights.")
        return parser

    @classmethod
    def _layers_kwargs(cls, args):
        return {"layers": tuple(ast.literal_eval(args.layers))}

    def embed_context(self, feed):
        cat_ids, float_vals = self.context_inputs(feed)
        context_vectors = FeatureEmbeddingBank(
            total_vocab=self.total_vocab, kinds=self.feature_kinds,
            vec_size=self.emb_size, include_linear=False, name="bank",
        )(cat_ids, float_vals)
        B, C = context_vectors.shape[:2]
        return context_vectors.reshape(B, C, -1)

    def cross_net(self, x_0):
        x_l = x_0
        reg = 0.0
        for layer in range(self.cross_layer_num):
            w = self.param(f"cross_w_{layer}", nn.initializers.normal(1.0), (x_0.shape[-1],))
            b = self.param(f"cross_b_{layer}", lambda k, s: jnp.full(s, 0.01), (x_0.shape[-1],))
            xl_w = (x_l * w).sum(-1, keepdims=True)
            x_l = x_0 * xl_w + b + x_l
            reg = reg + jnp.sqrt((w ** 2).sum())
        return x_l, reg

    def dcn_prediction(self, feed, training: bool):
        context_emb = self.embed_context(feed)
        cross_output, reg = self.cross_net(context_emb)
        deep_output = MLPBlock(
            hidden_units=self.layers, hidden_activations="ReLU", norm="batch_norm",
            dropout_rate=self.dropout, output_dim=None, name="deep_layers",
        )(context_emb, training=training)
        output = dense(1, name="predict_layer")(jnp.concatenate([cross_output, deep_output], axis=-1))
        return output[..., 0], reg


@register_model("DCNCTR")
class DCNCTR(ContextCTRModel, DCNBase):
    extra_log_args: ClassVar[list] = ["emb_size", "loss_n", "cross_layer_num"]

    emb_size: int = 64
    layers: Tuple[int, ...] = (64,)
    cross_layer_num: int = 6
    reg_weight: float = 2.0

    parse_model_args = staticmethod(
        lambda parser: ContextCTRModel.parse_model_args(DCNBase.parse_model_args_dcn(parser))
    )

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw.update(cls._layers_kwargs(args))
        return kw

    @nn.compact
    def __call__(self, feed, training: bool = False):
        pred, reg = self.dcn_prediction(feed, training)
        out = ctr_out(pred, feed)
        out["reg_loss"] = self.reg_weight * reg
        return out

    def loss(self, out_dict, feed):
        return super().loss(out_dict, feed) + out_dict["reg_loss"]


@register_model("DCNTopK")
class DCNTopK(ContextModel, DCNBase):
    extra_log_args: ClassVar[list] = ["emb_size", "loss_n", "cross_layer_num"]

    emb_size: int = 64
    layers: Tuple[int, ...] = (64,)
    cross_layer_num: int = 6
    reg_weight: float = 2.0

    parse_model_args = staticmethod(
        lambda parser: ContextModel.parse_model_args(DCNBase.parse_model_args_dcn(parser))
    )

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw.update(cls._layers_kwargs(args))
        return kw

    @nn.compact
    def __call__(self, feed, training: bool = False):
        pred, reg = self.dcn_prediction(feed, training)
        return {"prediction": pred, "reg_loss": self.reg_weight * reg}

    def loss(self, out_dict, feed):
        return super().loss(out_dict, feed) + out_dict["reg_loss"]
