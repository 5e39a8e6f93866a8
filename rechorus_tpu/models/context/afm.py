"""AFM -- attentional factorization machines.

Reference behavior: src/models/context/AFM.py (Xiao et al., IJCAI'17):
pairwise feature interactions weighted by AttLayer attention + projection
p; loss adds reg_weight * ||attlayer.w||_2 (emitted as out['reg_loss']
here since JAX losses are pure functions of outputs).
"""
from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax.numpy as jnp

from rechorus_tpu.models.base import ContextCTRModel, ContextModel
from rechorus_tpu.models.context._modes import ctr_out
from rechorus_tpu.ops.feature_bank import FeatureEmbeddingBank
from rechorus_tpu.ops.layers import AttLayer, dense
from rechorus_tpu.registry import register_model


class AFMBase:
    @staticmethod
    def parse_model_args_afm(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        parser.add_argument("--attention_size", type=int, default=64, help="Size of attention embedding vectors.")
        parser.add_argument("--reg_weight", type=float, default=2.0,
                            help="Regularization weight for attention layer weights.")
        return parser

    def afm_prediction(self, feed, training: bool):
        cat_ids, float_vals = self.context_inputs(feed)
        fm_vectors, linear_value = FeatureEmbeddingBank(
            total_vocab=self.total_vocab, kinds=self.feature_kinds,
            vec_size=self.emb_size, include_linear=True, name="bank",
        )(cat_ids, float_vals)
        overall_bias = self.param("overall_bias", lambda k: jnp.asarray([0.01]))
        linear_value = overall_bias + linear_value.sum(axis=-1)

        F = fm_vectors.shape[-2]
        rows, cols = jnp.triu_indices(F, k=1)
        p, q = fm_vectors[..., rows, :], fm_vectors[..., cols, :]
        pair_wise_inter = p * q  # [B, C, n_pairs, d]

        att = AttLayer(self.attention_size, name="attlayer")
        att_signal = att(pair_wise_inter)[..., None]
        att_pooling = (att_signal * pair_wise_inter).sum(axis=-2)  # [B, C, d]
        att_pooling = nn.Dropout(self.dropout, deterministic=not training)(att_pooling)
        proj_p = self.param("p", nn.initializers.normal(1.0), (self.emb_size,))
        afm_out = (att_pooling * proj_p).sum(axis=-1)

        # L2 reg on the attention projection kernel (reference AFM.py:105);
        # emitted through the output so the pure loss fn can add it
        w = att.variables["params"]["w"]["kernel"]
        reg = jnp.sqrt((w ** 2).sum())
        return linear_value + afm_out, reg


@register_model("AFMCTR")
class AFMCTR(ContextCTRModel, AFMBase):
    extra_log_args: ClassVar[list] = ["emb_size", "attention_size", "loss_n"]

    emb_size: int = 64
    attention_size: int = 64
    reg_weight: float = 2.0

    parse_model_args = staticmethod(
        lambda parser: ContextCTRModel.parse_model_args(AFMBase.parse_model_args_afm(parser))
    )

    @nn.compact
    def __call__(self, feed, training: bool = False):
        pred, reg = self.afm_prediction(feed, training)
        out = ctr_out(pred, feed)
        out["reg_loss"] = self.reg_weight * reg
        return out

    def loss(self, out_dict, feed):
        return super().loss(out_dict, feed) + out_dict["reg_loss"]


@register_model("AFMTopK")
class AFMTopK(ContextModel, AFMBase):
    extra_log_args: ClassVar[list] = ["emb_size", "attention_size", "loss_n"]

    emb_size: int = 64
    attention_size: int = 64
    reg_weight: float = 2.0

    parse_model_args = staticmethod(
        lambda parser: ContextModel.parse_model_args(AFMBase.parse_model_args_afm(parser))
    )

    @nn.compact
    def __call__(self, feed, training: bool = False):
        pred, reg = self.afm_prediction(feed, training)
        out = {"prediction": pred, "reg_loss": self.reg_weight * reg}
        return out

    def loss(self, out_dict, feed):
        return super().loss(out_dict, feed) + out_dict["reg_loss"]
