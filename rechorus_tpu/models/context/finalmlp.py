"""FinalMLP -- two-stream MLPs with feature selection + bilinear fusion.

Reference behavior: src/models/context/FinalMLP.py (Mao et al., AAAI'23;
FuxiCTR-derived FeatureSelection / InteractionAggregation).
"""
from __future__ import annotations

import ast
from typing import ClassVar, Tuple

import flax.linen as nn
import jax.numpy as jnp

from rechorus_tpu.models.base import ContextCTRModel, ContextModel
from rechorus_tpu.models.context._modes import ctr_out
from rechorus_tpu.ops.feature_bank import FeatureEmbeddingBank
from rechorus_tpu.ops.layers import MLPBlock, NORMAL_INIT, dense, embed
from rechorus_tpu.registry import register_model


class FinalMLPBase:
    @staticmethod
    def parse_model_args_finalmlp(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        parser.add_argument("--mlp1_hidden_units", type=str, default="[64,64,64]", help="Hidden units list of MLP1.")
        parser.add_argument("--mlp1_hidden_activations", type=str, default="ReLU", help="Hidden activation of MLP1.")
        parser.add_argument("--mlp1_dropout", type=float, default=0, help="Dropout rate of MLP1.")
        parser.add_argument("--mlp1_batch_norm", type=int, default=0, help="BatchNorm in MLP1.")
        parser.add_argument("--mlp2_hidden_units", type=str, default="[64,64,64]", help="Hidden units list of MLP2.")
        parser.add_argument("--mlp2_hidden_activations", type=str, default="ReLU", help="Hidden activation of MLP2.")
        parser.add_argument("--mlp2_dropout", type=float, default=0, help="Dropout rate of MLP2.")
        parser.add_argument("--mlp2_batch_norm", type=int, default=0, help="BatchNorm in MLP2.")
        parser.add_argument("--use_fs", type=int, default=1, help="Whether to use feature selection module.")
        parser.add_argument("--fs_hidden_units", type=str, default="[64]", help="Hidden units of feature selection.")
        parser.add_argument("--fs1_context", type=str, default="", help="Context features for MLP1, comma-split.")
        parser.add_argument("--fs2_context", type=str, default="", help="Context features for MLP2, comma-split.")
        parser.add_argument("--num_heads", type=int, default=1, help="Number of heads in the fusion module.")
        return parser

    @classmethod
    def _fmlp_kwargs(cls, args):
        return {
            "mlp1_hidden_units": tuple(ast.literal_eval(args.mlp1_hidden_units)),
            "mlp2_hidden_units": tuple(ast.literal_eval(args.mlp2_hidden_units)),
            "fs_hidden_units": tuple(ast.literal_eval(args.fs_hidden_units)),
            "fs1_context": tuple(f for f in args.fs1_context.split(",") if f),
            "fs2_context": tuple(f for f in args.fs2_context.split(",") if f),
        }

    def _fs_gate(self, feed, flat_emb, ctx_names, tag: str, training: bool):
        B, C = flat_emb.shape[:2]
        if len(ctx_names) == 0:
            bias = self.param(f"fs{tag}_ctx_bias", nn.initializers.zeros, (1, self.emb_size))
            fs_input = jnp.broadcast_to(bias[None, :, :], (B, C, self.emb_size))
        else:
            parts = []
            for i, ctx in enumerate(ctx_names):
                val = self.feature_value(feed, ctx)  # [B, C]
                if ctx.endswith("_f"):
                    parts.append(dense(self.emb_size, name=f"fs{tag}_emb_{i}")(val[..., None].astype(jnp.float32)))
                else:
                    # context ids get their own gate embedding (reference
                    # FeatureSelection builds separate tables)
                    vocab = self._fs_vocab(ctx)
                    parts.append(embed(vocab, self.emb_size, name=f"fs{tag}_emb_{i}")(val.astype(jnp.int32)))
            fs_input = jnp.concatenate(parts, axis=-1)
        gate = MLPBlock(
            hidden_units=self.fs_hidden_units, hidden_activations="ReLU",
            output_dim=flat_emb.shape[-1], name=f"fs{tag}_gate",
        )(fs_input, training=training)
        return flat_emb * (nn.sigmoid(gate) * 2)

    def _fs_vocab(self, ctx):
        # vocab size for a named categorical feature = its slice of the
        # fused table; derive from consecutive offsets
        names, kinds, offs = self.feature_names, self.feature_kinds, self.feature_offsets
        cat_names = [n for n, k in zip(names, kinds) if k == "cat"]
        i = cat_names.index(ctx)
        if i + 1 < len(offs):
            return self.feature_offsets[i + 1] - self.feature_offsets[i]
        return self.total_vocab - self.feature_offsets[i]

    def fusion(self, x, y):
        """Bilinear multi-head aggregation (reference FinalMLP.py:223-248)."""
        out = dense(1, name="w_x")(x) + dense(1, name="w_y")(y)  # [B, C, 1]
        B, C = x.shape[:2]
        hx = x.reshape(B, C, self.num_heads, -1)
        hy = y.reshape(B, C, self.num_heads, -1)
        w_xy = self.param(
            "w_xy", nn.initializers.xavier_normal(),
            (self.num_heads, hx.shape[-1], hy.shape[-1]),
        )
        xy = jnp.einsum("bchx,hxy,bchy->bch", hx, w_xy, hy).sum(-1, keepdims=True)
        return (out + xy)[..., 0]

    def finalmlp_prediction(self, feed, training: bool):
        cat_ids, float_vals = self.context_inputs(feed)
        embeddings = FeatureEmbeddingBank(
            total_vocab=self.total_vocab, kinds=self.feature_kinds,
            vec_size=self.emb_size, include_linear=False, name="bank",
        )(cat_ids, float_vals)
        B, C = embeddings.shape[:2]
        flat_emb = embeddings.reshape(B, C, -1)

        if self.use_fs:
            feat1 = self._fs_gate(feed, flat_emb, self.fs1_context, "1", training)
            feat2 = self._fs_gate(feed, flat_emb, self.fs2_context, "2", training)
        else:
            feat1 = feat2 = flat_emb
        mlp1_out = MLPBlock(
            hidden_units=self.mlp1_hidden_units, hidden_activations=self.mlp1_hidden_activations,
            dropout_rate=self.mlp1_dropout, norm="batch_norm" if self.mlp1_batch_norm else None,
            name="mlp1",
        )(feat1, training=training)
        mlp2_out = MLPBlock(
            hidden_units=self.mlp2_hidden_units, hidden_activations=self.mlp2_hidden_activations,
            dropout_rate=self.mlp2_dropout, norm="batch_norm" if self.mlp2_batch_norm else None,
            name="mlp2",
        )(feat2, training=training)
        return self.fusion(mlp1_out, mlp2_out)


@register_model("FinalMLPCTR")
class FinalMLPCTR(ContextCTRModel, FinalMLPBase):
    extra_log_args: ClassVar[list] = ["emb_size", "loss_n", "use_fs"]

    emb_size: int = 64
    mlp1_hidden_units: Tuple[int, ...] = (64, 64, 64)
    mlp1_hidden_activations: str = "ReLU"
    mlp1_dropout: float = 0.0
    mlp1_batch_norm: int = 0
    mlp2_hidden_units: Tuple[int, ...] = (64, 64, 64)
    mlp2_hidden_activations: str = "ReLU"
    mlp2_dropout: float = 0.0
    mlp2_batch_norm: int = 0
    use_fs: int = 1
    fs_hidden_units: Tuple[int, ...] = (64,)
    fs1_context: Tuple[str, ...] = ()
    fs2_context: Tuple[str, ...] = ()
    num_heads: int = 1

    parse_model_args = staticmethod(
        lambda parser: ContextCTRModel.parse_model_args(FinalMLPBase.parse_model_args_finalmlp(parser))
    )

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw.update(cls._fmlp_kwargs(args))
        return kw

    @nn.compact
    def __call__(self, feed, training: bool = False):
        return ctr_out(self.finalmlp_prediction(feed, training), feed)


@register_model("FinalMLPTopK")
class FinalMLPTopK(ContextModel, FinalMLPBase):
    extra_log_args: ClassVar[list] = ["emb_size", "loss_n", "use_fs"]

    emb_size: int = 64
    mlp1_hidden_units: Tuple[int, ...] = (64, 64, 64)
    mlp1_hidden_activations: str = "ReLU"
    mlp1_dropout: float = 0.0
    mlp1_batch_norm: int = 0
    mlp2_hidden_units: Tuple[int, ...] = (64, 64, 64)
    mlp2_hidden_activations: str = "ReLU"
    mlp2_dropout: float = 0.0
    mlp2_batch_norm: int = 0
    use_fs: int = 1
    fs_hidden_units: Tuple[int, ...] = (64,)
    fs1_context: Tuple[str, ...] = ()
    fs2_context: Tuple[str, ...] = ()
    num_heads: int = 1

    parse_model_args = staticmethod(
        lambda parser: ContextModel.parse_model_args(FinalMLPBase.parse_model_args_finalmlp(parser))
    )

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw.update(cls._fmlp_kwargs(args))
        return kw

    @nn.compact
    def __call__(self, feed, training: bool = False):
        return {"prediction": self.finalmlp_prediction(feed, training)}
