"""Wide&Deep -- FM wide part + deep MLP over flattened feature embeddings.

Reference behavior: src/models/context/WideDeep.py (Cheng et al., 2016).
"""
from __future__ import annotations

import ast
from typing import ClassVar, Tuple

import flax.linen as nn
import jax.numpy as jnp

from rechorus_tpu.models.base import ContextCTRModel, ContextModel
from rechorus_tpu.models.context._modes import ctr_out
from rechorus_tpu.ops.feature_bank import FeatureEmbeddingBank
from rechorus_tpu.ops.layers import MLPBlock
from rechorus_tpu.registry import register_model


class WideDeepBase:
    @staticmethod
    def parse_model_args_wd(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        parser.add_argument("--layers", type=str, default="[64]", help="Size of each layer.")
        return parser

    @classmethod
    def _layers_kwargs(cls, args):
        return {"layers": tuple(ast.literal_eval(args.layers))}

    def wd_prediction(self, feed, training: bool):
        cat_ids, float_vals = self.context_inputs(feed)
        deep_vectors, wide_linear = FeatureEmbeddingBank(
            total_vocab=self.total_vocab, kinds=self.feature_kinds,
            vec_size=self.emb_size, include_linear=True, name="bank",
        )(cat_ids, float_vals)
        overall_bias = self.param("overall_bias", lambda k: jnp.asarray([0.01]))
        wide_prediction = overall_bias + wide_linear.sum(axis=-1)
        B, C = deep_vectors.shape[:2]
        deep_vector = deep_vectors.reshape(B, C, -1)
        deep_prediction = MLPBlock(
            hidden_units=self.layers, hidden_activations="ReLU",
            dropout_rate=self.dropout, output_dim=1, name="deep_layers",
        )(deep_vector, training=training)[..., 0]
        return deep_prediction + wide_prediction


@register_model("WideDeepCTR")
class WideDeepCTR(ContextCTRModel, WideDeepBase):
    extra_log_args: ClassVar[list] = ["emb_size", "layers", "loss_n"]

    emb_size: int = 64
    layers: Tuple[int, ...] = (64,)

    @staticmethod
    def parse_model_args(parser):
        parser = WideDeepBase.parse_model_args_wd(parser)
        return ContextCTRModel.parse_model_args(parser)

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw.update(cls._layers_kwargs(args))
        return kw

    @nn.compact
    def __call__(self, feed, training: bool = False):
        return ctr_out(self.wd_prediction(feed, training), feed)


@register_model("WideDeepTopK")
class WideDeepTopK(ContextModel, WideDeepBase):
    extra_log_args: ClassVar[list] = ["emb_size", "layers", "loss_n"]

    emb_size: int = 64
    layers: Tuple[int, ...] = (64,)

    @staticmethod
    def parse_model_args(parser):
        parser = WideDeepBase.parse_model_args_wd(parser)
        return ContextModel.parse_model_args(parser)

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw.update(cls._layers_kwargs(args))
        return kw

    @nn.compact
    def __call__(self, feed, training: bool = False):
        return {"prediction": self.wd_prediction(feed, training)}
