"""AutoInt -- automatic feature interaction via self-attention.

Reference behavior: src/models/context/AutoInt.py (Song et al., CIKM'19):
stacked multi-head self-attention over feature embeddings + linear
residual, relu, flattened into a deep MLP; linear term added.
"""
from __future__ import annotations

import ast
from typing import ClassVar, Tuple

import flax.linen as nn
import jax.numpy as jnp

from rechorus_tpu.models.base import ContextCTRModel, ContextModel
from rechorus_tpu.models.context._modes import ctr_out
from rechorus_tpu.ops.feature_bank import FeatureEmbeddingBank
from rechorus_tpu.ops.layers import MLPBlock, MultiHeadAttention, dense
from rechorus_tpu.registry import register_model


class AutoIntBase:
    @staticmethod
    def parse_model_args_autoint(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        parser.add_argument("--attention_size", type=int, default=32, help="Size of attention hidden space.")
        parser.add_argument("--num_heads", type=int, default=1, help="Number of attention heads.")
        parser.add_argument("--num_layers", type=int, default=1, help="Number of self-attention layers.")
        parser.add_argument("--layers", type=str, default="[64]", help="Size of each layer.")
        return parser

    @classmethod
    def _layers_kwargs(cls, args):
        return {"layers": tuple(ast.literal_eval(args.layers))}

    def autoint_prediction(self, feed, training: bool):
        cat_ids, float_vals = self.context_inputs(feed)
        embeddings, linear_value = FeatureEmbeddingBank(
            total_vocab=self.total_vocab, kinds=self.feature_kinds,
            vec_size=self.emb_size, include_linear=True, name="bank",
        )(cat_ids, float_vals)
        overall_bias = self.param("overall_bias", lambda k: jnp.asarray([0.01]))
        linear_value = overall_bias + linear_value.sum(axis=-1)

        att_input = embeddings  # [B, C, F, d]
        d_in = self.emb_size
        for i in range(self.num_layers):
            attention = MultiHeadAttention(
                d_model=d_in, n_heads=self.num_heads, kq_same=False, use_bias=False,
                attention_d=self.attention_size, name=f"att_{i}",
            )(att_input, att_input, att_input)
            residual = dense(self.attention_size, name=f"residual_{i}")(att_input)
            att_input = nn.relu(attention + residual)
            d_in = self.attention_size

        B, C = att_input.shape[:2]
        deep_vectors = MLPBlock(
            hidden_units=self.layers, hidden_activations="ReLU",
            dropout_rate=self.dropout, output_dim=1, name="deep_layers",
        )(att_input.reshape(B, C, -1), training=training)[..., 0]
        return linear_value + deep_vectors


@register_model("AutoIntCTR")
class AutoIntCTR(ContextCTRModel, AutoIntBase):
    extra_log_args: ClassVar[list] = ["emb_size", "layers", "num_layers", "num_heads", "loss_n"]

    emb_size: int = 64
    attention_size: int = 32
    num_heads: int = 1
    num_layers: int = 1
    layers: Tuple[int, ...] = (64,)

    parse_model_args = staticmethod(
        lambda parser: ContextCTRModel.parse_model_args(AutoIntBase.parse_model_args_autoint(parser))
    )

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw.update(cls._layers_kwargs(args))
        return kw

    @nn.compact
    def __call__(self, feed, training: bool = False):
        return ctr_out(self.autoint_prediction(feed, training), feed)


@register_model("AutoIntTopK")
class AutoIntTopK(ContextModel, AutoIntBase):
    extra_log_args: ClassVar[list] = ["emb_size", "layers", "num_layers", "num_heads", "loss_n"]

    emb_size: int = 64
    attention_size: int = 32
    num_heads: int = 1
    num_layers: int = 1
    layers: Tuple[int, ...] = (64,)

    parse_model_args = staticmethod(
        lambda parser: ContextModel.parse_model_args(AutoIntBase.parse_model_args_autoint(parser))
    )

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw.update(cls._layers_kwargs(args))
        return kw

    @nn.compact
    def __call__(self, feed, training: bool = False):
        return {"prediction": self.autoint_prediction(feed, training)}
