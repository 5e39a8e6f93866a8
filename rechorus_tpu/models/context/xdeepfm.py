"""xDeepFM -- compressed interaction network + deep + FM linear.

Reference behavior: src/models/context/xDeepFM.py (Lian et al., KDD'18).
The reference computes the CIN per candidate item in a python loop and
(latent bug) drops both the CIN output from the final sum and all but the
last item's CIN result; here the CIN is vectorized over the candidate
axis with einsum and its output IS added, matching the paper. The
reference's reg_loss (deep/linear/conv L2) is likewise emitted.
"""
from __future__ import annotations

import ast
from typing import ClassVar, Tuple

import flax.linen as nn
import jax.numpy as jnp

from rechorus_tpu.models.base import ContextCTRModel, ContextModel
from rechorus_tpu.models.context._modes import ctr_out
from rechorus_tpu.ops.feature_bank import FeatureEmbeddingBank
from rechorus_tpu.ops.layers import MLPBlock, NORMAL_INIT, dense
from rechorus_tpu.registry import register_model


class XDeepFMBase:
    @staticmethod
    def parse_model_args_xdfm(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        parser.add_argument("--layers", type=str, default="[64]", help="Size of each layer.")
        parser.add_argument("--cin_layers", type=str, default="[8,8]", help="Size of each CIN layer.")
        parser.add_argument("--direct", type=int, default=0,
                            help="Whether utilize the output of current network for the next layer.")
        parser.add_argument("--reg_weight", type=float, default=2.0, help="The weight of regularization loss term.")
        return parser

    @classmethod
    def _layers_kwargs(cls, args):
        cin = list(ast.literal_eval(args.cin_layers))
        if not args.direct:
            cin = [int(x // 2 * 2) for x in cin]
        return {"layers": tuple(ast.literal_eval(args.layers)), "cin_layer_size": tuple(cin)}

    def cin(self, x0):
        """Compressed interaction network, vectorized over candidates.

        x0: [B, C, F, d]. Each layer: z = einsum(h_prev, x0) over fields ->
        conv1x1 over the (h*m) channel -> split direct/next (when not
        `direct`). Output: [B, C, final_len] after sum over d.
        """
        field0 = x0.shape[-2]
        hidden = x0
        field_nums = [field0]
        finals = []
        reg = 0.0
        for i, layer_size in enumerate(self.cin_layer_size):
            z = jnp.einsum("bchd,bcmd->bchmd", hidden, x0)
            B, C = z.shape[:2]
            z = z.reshape(B, C, field_nums[-1] * field0, -1)  # [B,C,h*m,d]
            w = self.param(f"cin_w_{i}", NORMAL_INIT, (layer_size, field_nums[-1] * field0))
            b = self.param(f"cin_b_{i}", NORMAL_INIT, (layer_size,))
            out = jnp.einsum("lk,bckd->bcld", w, z) + b[None, None, :, None]
            out = nn.relu(out)
            reg = reg + jnp.sqrt((w ** 2).sum())
            if self.direct:
                direct_connect, hidden = out, out
                field_nums.append(layer_size)
            else:
                if i != len(self.cin_layer_size) - 1:
                    hidden, direct_connect = out[:, :, : layer_size // 2, :], out[:, :, layer_size // 2 :, :]
                    field_nums.append(layer_size // 2)
                else:
                    direct_connect, hidden = out, None
            finals.append(direct_connect)
        result = jnp.concatenate(finals, axis=2).sum(-1)  # [B, C, final_len]
        return result, reg

    def xdfm_prediction(self, feed, training: bool):
        cat_ids, float_vals = self.context_inputs(feed)
        bank = FeatureEmbeddingBank(
            total_vocab=self.total_vocab, kinds=self.feature_kinds,
            vec_size=self.emb_size, include_linear=True, name="bank")
        context_vectors, linear_value = bank(cat_ids, float_vals)
        overall_bias = self.param("overall_bias", lambda k: jnp.asarray([0.01]))
        fm_prediction = overall_bias + linear_value.sum(axis=-1)
        fm_vectors = 0.5 * (context_vectors.sum(axis=-2) ** 2 - (context_vectors ** 2).sum(axis=-2))
        fm_prediction = fm_prediction + fm_vectors.sum(axis=-1)

        B, C = context_vectors.shape[:2]
        deep = MLPBlock(
            hidden_units=self.layers, hidden_activations="ReLU",
            dropout_rate=self.dropout, output_dim=1, name="deep_layers")
        deep_prediction = deep(context_vectors.reshape(B, C, -1), training=training)[..., 0]

        cin_output, reg = self.cin(context_vectors)
        cin_prediction = dense(1, name="cin_linear")(cin_output)[..., 0]

        # reference reg_loss (xDeepFM.py:76-93) also covers the deep MLP
        # Linear weights and each per-feature linear-embedding table's
        # weight, as separate per-parameter L2 norms
        dp = deep.variables["params"]
        for sub in dp.values():
            if "kernel" in sub:
                reg = reg + jnp.sqrt((sub["kernel"] ** 2).sum())
        bp = bank.variables["params"]
        if "fused_linear" in bp:
            lin = bp["fused_linear"]["embedding"]
            offs = list(self.feature_offsets) + [self.total_vocab]
            for a, b in zip(offs[:-1], offs[1:]):  # per-feature table norms
                reg = reg + jnp.sqrt((lin[a:b] ** 2).sum())
        j = 0
        while f"float_lin_{j}" in bp:
            reg = reg + jnp.sqrt((bp[f"float_lin_{j}"]["kernel"] ** 2).sum())
            j += 1
        return fm_prediction + deep_prediction + cin_prediction, reg


@register_model("xDeepFMCTR")
class XDeepFMCTR(ContextCTRModel, XDeepFMBase):
    extra_log_args: ClassVar[list] = ["emb_size", "layers", "loss_n"]

    emb_size: int = 64
    layers: Tuple[int, ...] = (64,)
    cin_layer_size: Tuple[int, ...] = (8, 8)
    direct: int = 0
    reg_weight: float = 2.0

    parse_model_args = staticmethod(
        lambda parser: ContextCTRModel.parse_model_args(XDeepFMBase.parse_model_args_xdfm(parser))
    )

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw.update(cls._layers_kwargs(args))
        return kw

    @nn.compact
    def __call__(self, feed, training: bool = False):
        pred, reg = self.xdfm_prediction(feed, training)
        out = ctr_out(pred, feed)
        out["reg_loss"] = self.reg_weight * reg
        return out

    def loss(self, out_dict, feed):
        return super().loss(out_dict, feed) + out_dict["reg_loss"]


@register_model("xDeepFMTopK")
class XDeepFMTopK(ContextModel, XDeepFMBase):
    extra_log_args: ClassVar[list] = ["emb_size", "layers", "loss_n"]

    emb_size: int = 64
    layers: Tuple[int, ...] = (64,)
    cin_layer_size: Tuple[int, ...] = (8, 8)
    direct: int = 0
    reg_weight: float = 2.0

    parse_model_args = staticmethod(
        lambda parser: ContextModel.parse_model_args(XDeepFMBase.parse_model_args_xdfm(parser))
    )

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw.update(cls._layers_kwargs(args))
        return kw

    @nn.compact
    def __call__(self, feed, training: bool = False):
        pred, reg = self.xdfm_prediction(feed, training)
        return {"prediction": pred, "reg_loss": self.reg_weight * reg}

    def loss(self, out_dict, feed):
        return super().loss(out_dict, feed) + out_dict["reg_loss"]
