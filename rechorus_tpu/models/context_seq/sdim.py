"""SDIM -- sampling-based deep interest modeling via LSH bucket collisions.

Reference behavior: src/models/context_seq/SDIM.py (FuxiCTR-derived, ETA
subclass): long-history interest = sum of history embeddings whose LSH
bucket collides with the target's, averaged over hashes; short part =
target attention.

TPU deviation (documented): the collision sum excludes padded positions
(the reference's embedding_bag path includes pad collisions,
SDIM.py:114-131); vectorized with einsum instead of nonzero+embedding_bag
(data-dependent shapes don't compile on TPU).
"""
from __future__ import annotations

from typing import ClassVar, Tuple

import flax.linen as nn
import jax.numpy as jnp

from rechorus_tpu.models.base import ContextSeqCTRModel, ContextSeqModel
from rechorus_tpu.models.context._modes import ctr_out
from rechorus_tpu.ops.layers import MLPBlock, MultiHeadTargetAttention
from rechorus_tpu.models.context_seq.eta import ETABase
from rechorus_tpu.registry import register_model


class SDIMBase(ETABase):
    def lsh_attention(self, rotations, target_emb, sequence_emb, mask):
        """target_emb [B, C, D]; sequence_emb [B, H, D]; mask [B, H]."""
        seq_bucket = self.lsh_hash(sequence_emb, rotations)  # [B, H, nh]
        tgt_bucket = self.lsh_hash(target_emb, rotations)  # [B, C, nh]
        collide = (tgt_bucket[:, :, None, :] == seq_bucket[:, None, :, :])  # [B, C, H, nh]
        collide = collide & mask[:, None, :, None]
        out = jnp.einsum("bchn,bhd->bcnd", collide.astype(sequence_emb.dtype), sequence_emb)
        return out.mean(axis=2)  # mean over hashes -> [B, C, D]

    def sdim_prediction(self, feed, training: bool):
        g = self.group_embeddings(feed, self.emb_size)
        mask_short, mask_long = self.history_masks(feed)
        B, C = g["item"].shape[:2]

        feats = []
        if self.recent_k > 0:
            for i, (tf, sf) in enumerate(zip(self.short_target_field, self.short_sequence_field)):
                t = self.concat_field(g, feed, tf)
                s = self.concat_field(g, feed, sf)
                att = MultiHeadTargetAttention(
                    input_dim=t.shape[-1], attention_dim=self.attention_dim, num_heads=self.num_heads,
                    dropout_rate=self.attention_dropout, use_scale=bool(self.use_scale),
                    use_qkvo=bool(self.use_qkvo), name=f"short_attention_{i}",
                )
                m = jnp.broadcast_to(mask_short[:, None, :], (B, C, s.shape[1]))
                feats.append(att(t, s, m, training=training))
        if self.history_max > self.recent_k:
            for i, (tf, sf) in enumerate(zip(self.long_target_field, self.long_sequence_field)):
                t = self.concat_field(g, feed, tf)
                s = self.concat_field(g, feed, sf)
                rot = self._rotations(f"random_rotations_{i}", t.shape[-1])
                feats.append(self.lsh_attention(rot, t, s, mask_long))
        feature_emb = jnp.concatenate(feats, axis=-1)
        return MLPBlock(
            hidden_units=self.dnn_hidden_units, hidden_activations=self.dnn_activations,
            dropout_rate=self.net_dropout, norm="batch_norm" if self.batch_norm else None,
            output_dim=1, name="dnn",
        )(feature_emb, training=training)[..., 0]


@register_model("SDIMCTR")
class SDIMCTR(ContextSeqCTRModel, SDIMBase):
    extra_log_args: ClassVar[list] = ["emb_size", "add_historical_situations"]

    emb_size: int = 64
    dnn_hidden_units: Tuple[int, ...] = (128, 64)
    dnn_activations: str = "ReLU"
    net_dropout: float = 0.0
    batch_norm: int = 0
    attention_dim: int = 64
    num_heads: int = 1
    use_scale: int = 1
    attention_dropout: float = 0.0
    use_qkvo: int = 1
    retrieval_k: int = 5
    reuse_hash: int = 1
    num_hashes: int = 1
    hash_bits: int = 4
    short_target_field: tuple = ("item_id",)
    short_sequence_field: tuple = ("history_item_id",)
    long_target_field: tuple = ("item_id",)
    long_sequence_field: tuple = ("history_item_id",)
    recent_k: int = 5

    parse_model_args = staticmethod(
        lambda parser: ContextSeqCTRModel.parse_model_args(SDIMBase.parse_model_args_eta(parser))
    )

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw.update(cls._eta_kwargs(args))
        return kw

    @nn.compact
    def __call__(self, feed, training: bool = False):
        return ctr_out(self.sdim_prediction(feed, training), feed)


@register_model("SDIMTopK")
class SDIMTopK(ContextSeqModel, SDIMBase):
    extra_log_args: ClassVar[list] = ["emb_size", "add_historical_situations"]

    emb_size: int = 64
    dnn_hidden_units: Tuple[int, ...] = (128, 64)
    dnn_activations: str = "ReLU"
    net_dropout: float = 0.0
    batch_norm: int = 0
    attention_dim: int = 64
    num_heads: int = 1
    use_scale: int = 1
    attention_dropout: float = 0.0
    use_qkvo: int = 1
    retrieval_k: int = 5
    reuse_hash: int = 1
    num_hashes: int = 1
    hash_bits: int = 4
    short_target_field: tuple = ("item_id",)
    short_sequence_field: tuple = ("history_item_id",)
    long_target_field: tuple = ("item_id",)
    long_sequence_field: tuple = ("history_item_id",)
    recent_k: int = 5

    parse_model_args = staticmethod(
        lambda parser: ContextSeqModel.parse_model_args(SDIMBase.parse_model_args_eta(parser))
    )

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw.update(cls._eta_kwargs(args))
        return kw

    @nn.compact
    def __call__(self, feed, training: bool = False):
        return {"prediction": self.sdim_prediction(feed, training)}
