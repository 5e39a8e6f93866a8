"""SLRC+ -- Hawkes-process recommender with relational excitations.

Reference behavior: src/models/sequential/SLRCPlus.py (Wang et al.,
WWW'19): prediction = MF base intensity (+user/item bias) + excitation
sum over relations of alpha_r * kernel_r(dt), kernel = pi * Exp(beta).pdf
+ (1-pi) * Normal(mu, sigma).pdf over the time since the most recent
relationally-connected history interaction; relation 0 = repeat
consumption. The per-row python interval loops (SLRCPlus.py:94-116)
become the jitted ops/kg.relational_intervals searchsorted kernel.
"""
from __future__ import annotations

import math
from typing import ClassVar

import flax.linen as nn
import jax.numpy as jnp

from rechorus_tpu.models.base import SequentialModel
from rechorus_tpu.ops.layers import embed
from rechorus_tpu.registry import register_model


def exp_pdf(dt, beta):
    return beta * jnp.exp(-beta * dt)


def normal_pdf(dt, mu, sigma):
    return jnp.exp(-((dt - mu) ** 2) / (2.0 * sigma ** 2)) / (sigma * math.sqrt(2.0 * math.pi))


@register_model("SLRCPlus")
class SLRCPlus(SequentialModel):
    reader: ClassVar[str] = "KGReader"
    batcher: ClassVar[str] = "slrc"
    extra_log_args: ClassVar[list] = ["emb_size"]
    candidate_aligned_keys: ClassVar[tuple] = ("relational_interval",)

    emb_size: int = 64
    time_scalar: int = 60 * 60 * 24 * 100
    relation_num: int = 1

    @staticmethod
    def parse_model_args(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        parser.add_argument("--time_scalar", type=int, default=60 * 60 * 24 * 100,
                            help="Time scalar for time intervals.")
        return SequentialModel.parse_model_args(parser)

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw["relation_num"] = len(corpus.item_relations) + 1
        return kw

    def lazy_table_specs(self) -> dict:
        # every [n_items, *] Hawkes-parameter table is gathered by the
        # candidate ids, the MF tables by user/item ids; global_alpha is
        # a scalar and stays dense
        return {
            ("u_embeddings", "embedding"): ("user_id",),
            ("user_bias", "embedding"): ("user_id",),
            ("i_embeddings", "embedding"): ("item_id",),
            ("item_bias", "embedding"): ("item_id",),
            ("alphas", "embedding"): ("item_id",),
            ("pis", "embedding"): ("item_id",),
            ("mus", "embedding"): ("item_id",),
            ("betas", "embedding"): ("item_id",),
            ("sigmas", "embedding"): ("item_id",),
        }

    @nn.compact
    def __call__(self, feed, training: bool = False):
        R = self.relation_num
        u_ids = feed["user_id"]
        i_ids = feed["item_id"]
        r_intervals = feed["relational_interval"]  # [B, C, R]

        # Excitation (reference SLRCPlus.py:66-80). TableEmbed (not raw
        # params): required for --bf16_emb and the --sparse_emb_grad
        # lookup context (ops/layers.embed docstring)
        global_alpha = self.param("global_alpha", nn.initializers.zeros, ())
        alphas = global_alpha + embed(self.item_num, R, "alphas")(i_ids)
        pis = embed(self.item_num, R, "pis")(i_ids) + 0.5
        mus = embed(self.item_num, R, "mus")(i_ids) + 1.0
        betas = jnp.clip(embed(self.item_num, R, "betas")(i_ids) + 1.0, 1e-10, 10.0)
        sigmas = jnp.clip(embed(self.item_num, R, "sigmas")(i_ids) + 1.0, 1e-10, 10.0)
        mask = (r_intervals >= 0).astype(jnp.float32)
        delta_t = r_intervals * mask
        decay = pis * exp_pdf(delta_t, betas) + (1 - pis) * normal_pdf(delta_t, mus, sigmas)
        excitation = (alphas * decay * mask).sum(-1)  # [B, C]

        # Base intensity (MF + biases)
        u_vec = embed(self.user_num, self.emb_size, "u_embeddings")(u_ids)
        i_vec = embed(self.item_num, self.emb_size, "i_embeddings")(i_ids)
        u_bias = embed(self.user_num, 1, "user_bias")(u_ids)
        i_bias = embed(self.item_num, 1, "item_bias")(i_ids)[..., 0]
        base_intensity = (u_vec[:, None, :] * i_vec).sum(-1) + u_bias + i_bias
        return {"prediction": base_intensity + excitation}
