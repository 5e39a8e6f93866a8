"""SAM -- self-attention models for feature interaction (SAM1/2A/2E/3A/3E).

Reference behavior: src/models/context/SAM.py (Cheng & Xue, SIGIR'21;
FuxiCTR-derived SAMBlock).
"""
from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax.numpy as jnp

from rechorus_tpu.models.base import ContextCTRModel, ContextModel
from rechorus_tpu.models.context._modes import ctr_out
from rechorus_tpu.ops.feature_bank import FeatureEmbeddingBank
from rechorus_tpu.ops.layers import dense
from rechorus_tpu.registry import register_model


class SAMBlock(nn.Module):
    num_layers: int
    num_fields: int
    embedding_dim: int
    use_residual: bool = False
    interaction_type: str = "SAM2E"
    aggregation: str = "concat"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, F, training: bool = False):
        # F: [B, C, F, d]
        drop = lambda x: nn.Dropout(self.dropout, deterministic=not training)(x)
        t = self.interaction_type
        if t == "SAM1":
            out = F
        elif t == "SAM2A":
            W = self.param("W", nn.initializers.ones, (self.num_fields, self.num_fields, self.embedding_dim))
            S = jnp.einsum("bcnd,bcmd->bcnm", F, F)
            out = drop(S[..., None] * W)  # [B, C, f, f, d]
            out = out.reshape(F.shape[:2] + (self.num_fields * self.num_fields, self.embedding_dim))
        elif t == "SAM2E":
            S = jnp.einsum("bcnd,bcmd->bcnm", F, F)
            U = jnp.einsum("bcnd,bcmd->bcnmd", F, F)
            out = drop(S[..., None] * U)
            out = out.reshape(F.shape[:2] + (self.num_fields * self.num_fields, self.embedding_dim))
        elif t in ("SAM3A", "SAM3E"):
            out = F
            for i in range(self.num_layers):
                K = dense(self.embedding_dim, use_bias=False, name=f"K_{i}")
                S = jnp.einsum("bcnd,bcmd->bcnm", out, K(out))
                if t == "SAM3A":
                    W = self.param(f"W_{i}", nn.initializers.ones,
                                   (self.num_fields, self.num_fields, self.embedding_dim))
                    new = (S[..., None] * W).sum(axis=-2)  # [B, C, f, d]
                else:
                    U = jnp.einsum("bcnd,bcmd->bcnmd", out, out)
                    new = (S[..., None] * U).sum(axis=-2)
                if self.use_residual:
                    new = new + dense(self.embedding_dim, use_bias=False, name=f"Q_{i}")(out)
                out = drop(new)
        else:
            raise ValueError(f"interaction_type={t} not supported.")

        if self.aggregation == "weighted_pooling":
            w = self.param("agg_weight", nn.initializers.ones, (out.shape[-2], 1))
            return (out * w).sum(axis=-2)
        elif self.aggregation == "concat":
            return out.reshape(out.shape[:2] + (-1,))
        elif self.aggregation == "mean_pooling":
            return out.mean(axis=-2)
        elif self.aggregation == "sum_pooling":
            return out.sum(axis=-2)
        raise ValueError(f"aggregation={self.aggregation} not supported.")


class SAMBase:
    @staticmethod
    def parse_model_args_sam(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        parser.add_argument("--interaction_type", type=str, default="SAM2E",
                            help="SAM2A, SAM2E, SAM3A, SAM3E, SAM1.")
        parser.add_argument("--aggregation", type=str, default="concat",
                            help="concat, weighted_pooling, mean_pooling, sum_pooling")
        parser.add_argument("--num_layers", type=int, default=1, help="Number of layers in SAM block.")
        parser.add_argument("--use_residual", type=int, default=0, help="Use residual connection in SAM block.")
        return parser

    @classmethod
    def _sam_kwargs(cls, args):
        agg = args.aggregation
        if args.interaction_type in ("SAM2A", "SAM2E") and agg != "concat":
            agg = "concat"  # reference forces this (SAM.py:41-46)
        if args.interaction_type == "SAM1" and agg != "weighted_pooling":
            agg = "weighted_pooling"
        return {"aggregation": agg}

    def sam_prediction(self, feed, training: bool):
        cat_ids, float_vals = self.context_inputs(feed)
        embeddings = FeatureEmbeddingBank(
            total_vocab=self.total_vocab, kinds=self.feature_kinds,
            vec_size=self.emb_size, include_linear=False, name="bank",
        )(cat_ids, float_vals)
        block = SAMBlock(
            num_layers=self.num_layers, num_fields=len(self.feature_names),
            embedding_dim=self.emb_size, use_residual=bool(self.use_residual),
            interaction_type=self.interaction_type, aggregation=self.aggregation,
            dropout=self.dropout, name="block",
        )
        interacted = block(embeddings, training=training)
        return dense(1, name="output_layer")(interacted)[..., 0]


@register_model("SAMCTR")
class SAMCTR(ContextCTRModel, SAMBase):
    extra_log_args: ClassVar[list] = ["emb_size", "loss_n", "interaction_type", "aggregation"]

    emb_size: int = 64
    interaction_type: str = "SAM2E"
    aggregation: str = "concat"
    num_layers: int = 1
    use_residual: int = 0

    parse_model_args = staticmethod(
        lambda parser: ContextCTRModel.parse_model_args(SAMBase.parse_model_args_sam(parser))
    )

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw.update(cls._sam_kwargs(args))
        return kw

    @nn.compact
    def __call__(self, feed, training: bool = False):
        return ctr_out(self.sam_prediction(feed, training), feed)


@register_model("SAMTopK")
class SAMTopK(ContextModel, SAMBase):
    extra_log_args: ClassVar[list] = ["emb_size", "loss_n", "interaction_type", "aggregation"]

    emb_size: int = 64
    interaction_type: str = "SAM2E"
    aggregation: str = "concat"
    num_layers: int = 1
    use_residual: int = 0

    parse_model_args = staticmethod(
        lambda parser: ContextModel.parse_model_args(SAMBase.parse_model_args_sam(parser))
    )

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw.update(cls._sam_kwargs(args))
        return kw

    @nn.compact
    def __call__(self, feed, training: bool = False):
        return {"prediction": self.sam_prediction(feed, training)}
