"""DeepFM -- FM + shared-embedding deep tower (sum of predictions).

Reference behavior: src/models/context/DeepFM.py (Guo et al., IJCAI'17).
"""
from __future__ import annotations

from typing import ClassVar, Tuple

import flax.linen as nn
import jax.numpy as jnp

from rechorus_tpu.models.base import ContextCTRModel, ContextModel
from rechorus_tpu.models.context._modes import ctr_out
from rechorus_tpu.models.context.widedeep import WideDeepBase
from rechorus_tpu.ops.feature_bank import FeatureEmbeddingBank
from rechorus_tpu.ops.layers import MLPBlock
from rechorus_tpu.registry import register_model


class DeepFMBase(WideDeepBase):
    def dfm_prediction(self, feed, training: bool):
        cat_ids, float_vals = self.context_inputs(feed)
        context_vectors, linear_vectors = FeatureEmbeddingBank(
            total_vocab=self.total_vocab, kinds=self.feature_kinds,
            vec_size=self.emb_size, include_linear=True, name="bank",
        )(cat_ids, float_vals)
        overall_bias = self.param("overall_bias", lambda k: jnp.asarray([0.01]))
        linear_value = overall_bias + linear_vectors.sum(axis=-1)
        fm_vectors = 0.5 * (context_vectors.sum(axis=-2) ** 2 - (context_vectors ** 2).sum(axis=-2))
        fm_prediction = fm_vectors.sum(axis=-1) + linear_value
        B, C = context_vectors.shape[:2]
        deep_prediction = MLPBlock(
            hidden_units=self.layers, hidden_activations="ReLU",
            dropout_rate=self.dropout, output_dim=1, name="deep_layers",
        )(context_vectors.reshape(B, C, -1), training=training)[..., 0]
        return fm_prediction + deep_prediction


@register_model("DeepFMCTR")
class DeepFMCTR(ContextCTRModel, DeepFMBase):
    extra_log_args: ClassVar[list] = ["emb_size", "layers", "loss_n"]

    emb_size: int = 64
    layers: Tuple[int, ...] = (64,)

    parse_model_args = staticmethod(
        lambda parser: ContextCTRModel.parse_model_args(DeepFMBase.parse_model_args_wd(parser))
    )

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw.update(cls._layers_kwargs(args))
        return kw

    @nn.compact
    def __call__(self, feed, training: bool = False):
        return ctr_out(self.dfm_prediction(feed, training), feed)


@register_model("DeepFMTopK")
class DeepFMTopK(ContextModel, DeepFMBase):
    extra_log_args: ClassVar[list] = ["emb_size", "layers", "loss_n"]

    emb_size: int = 64
    layers: Tuple[int, ...] = (64,)

    parse_model_args = staticmethod(
        lambda parser: ContextModel.parse_model_args(DeepFMBase.parse_model_args_wd(parser))
    )

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw.update(cls._layers_kwargs(args))
        return kw

    @nn.compact
    def __call__(self, feed, training: bool = False):
        return {"prediction": self.dfm_prediction(feed, training)}
