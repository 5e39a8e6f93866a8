"""FM -- factorization machines over context features.

Reference behavior: src/models/context/FM.py (Rendle, ICDM'10):
per-feature embeddings (fused table here, see ops/feature_bank.py),
FM interaction 0.5*((sum v)^2 - sum v^2), linear terms + overall bias.
Modes: FMCTR (sigmoid + BCE), FMTopK (ranking).
"""
from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax.numpy as jnp

from rechorus_tpu.models.base import ContextCTRModel, ContextModel
from rechorus_tpu.ops.feature_bank import FeatureEmbeddingBank
from rechorus_tpu.registry import register_model


class FMBase:
    @staticmethod
    def parse_model_args_fm(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        return parser

    def fm_prediction(self, feed):
        cat_ids, float_vals = self.context_inputs(feed)
        fm_vectors, linear_value = FeatureEmbeddingBank(
            total_vocab=self.total_vocab, kinds=self.feature_kinds,
            vec_size=self.emb_size, include_linear=True, name="bank",
        )(cat_ids, float_vals)
        overall_bias = self.param("overall_bias", lambda k: jnp.asarray([0.01]))
        linear_value = overall_bias + linear_value.sum(axis=-1)  # [B, C]
        interaction = 0.5 * (fm_vectors.sum(axis=-2) ** 2 - (fm_vectors ** 2).sum(axis=-2))
        return linear_value + interaction.sum(axis=-1)  # [B, C]


@register_model("FMCTR")
class FMCTR(ContextCTRModel, FMBase):
    extra_log_args: ClassVar[list] = ["emb_size", "loss_n"]

    emb_size: int = 64

    @staticmethod
    def parse_model_args(parser):
        parser = FMBase.parse_model_args_fm(parser)
        return ContextCTRModel.parse_model_args(parser)

    @nn.compact
    def __call__(self, feed, training: bool = False):
        pred = self.fm_prediction(feed)
        return {"prediction": nn.sigmoid(pred.reshape(-1)), "label": feed["label"].reshape(-1)}


@register_model("FMTopK")
class FMTopK(ContextModel, FMBase):
    extra_log_args: ClassVar[list] = ["emb_size", "loss_n"]

    emb_size: int = 64

    @staticmethod
    def parse_model_args(parser):
        parser = FMBase.parse_model_args_fm(parser)
        return ContextModel.parse_model_args(parser)

    @nn.compact
    def __call__(self, feed, training: bool = False):
        return {"prediction": self.fm_prediction(feed)}
