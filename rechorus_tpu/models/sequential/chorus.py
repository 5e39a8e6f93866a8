"""Chorus -- knowledge- and time-aware item modeling (2-stage).

Reference behavior: src/models/sequential/Chorus.py (Wang et al.,
SIGIR'20). Stage 1 pretrains TransE KG embeddings over reversed relation
triplets with margin ranking loss (kg_forward 155-166, loss 168-177) and
checkpoints EVERY epoch to a well-known path; stage 2 loads them and
trains recommendation: per-relation temporal kernels (exponential /
complement=normal / substitute=-normal+normal; kernel_functions 100-120)
re-weight relation-translated item embeddings (rec_forward 122-153),
scored by BPR or GMF; KG-pretrained tables get lr scaled by --lr_scale
(customize_parameters 179-196).

TPU notes: both stages share ONE param tree (all tables created in every
trace) so stage-2 checkpoint loading is a pure pytree restore; the
per-group lr is an optax update-scaling transform (runner lr_scales hook).
"""
from __future__ import annotations

import math
import os
from typing import Any, ClassVar

import flax
import flax.linen as nn
import jax.numpy as jnp

from rechorus_tpu.models.base import SequentialModel
from rechorus_tpu.ops import losses
from rechorus_tpu.ops.layers import NORMAL_INIT
from rechorus_tpu.registry import register_model


@register_model("Chorus")
class Chorus(SequentialModel):
    reader: ClassVar[str] = "KGReader"
    batcher: ClassVar[str] = "chorus"
    extra_log_args: ClassVar[list] = ["margin", "lr_scale", "stage"]
    candidate_aligned_keys: ClassVar[tuple] = ("relational_interval", "category_id")

    emb_size: int = 64
    stage: int = 2
    base_method: str = "BPR"
    time_scalar: int = 60 * 60 * 24 * 100
    category_col: Any = "i_category"
    lr_scale: float = 0.1
    margin: float = 1.0
    relation_num: int = 1
    relations: tuple = ()
    category_num: int = 1
    pretrain_path: str = ""

    @staticmethod
    def parse_model_args(parser):
        parser.add_argument("--stage", type=int, default=2,
                            help="Stage of training: 1-KG_pretrain, 2-recommendation.")
        parser.add_argument("--base_method", type=str, default="BPR",
                            help="Basic method to generate recommendations: BPR, GMF")
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        parser.add_argument("--time_scalar", type=int, default=60 * 60 * 24 * 100,
                            help="Time scalar for time intervals.")
        parser.add_argument("--category_col", type=str, default="i_category",
                            help="The name of category column in item_meta.csv.")
        parser.add_argument("--lr_scale", type=float, default=0.1,
                            help="Scale the lr for parameters in pre-trained KG model.")
        parser.add_argument("--margin", type=float, default=1,
                            help="Margin in hinge loss.")
        return SequentialModel.parse_model_args(parser)

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw["relation_num"] = len(corpus.item_relations) + 1
        kw["relations"] = tuple(corpus.item_relations)
        if args.category_col in corpus.item_meta_df.columns:
            kw["category_col"] = args.category_col
            kw["category_num"] = int(corpus.item_meta_df[args.category_col].max()) + 1
        else:
            kw["category_col"] = None
            kw["category_num"] = 1  # a virtual global category
        # stage-1 checkpoints land at a well-known path stage 2 loads
        # (reference Chorus.py:68-76)
        base_dir = os.path.dirname(getattr(args, "model_path", "") or "") or "../model/Chorus"
        kw["pretrain_path"] = os.path.join(
            base_dir, "KG__{}__emb_size={}__margin={}.bin".format(
                args.dataset, args.emb_size, args.margin))
        if args.stage == 1:
            args.model_path = kw["pretrain_path"]
        return kw

    # ------------------------------------------------------------------
    @nn.compact
    def __call__(self, feed, training: bool = False):
        R, d = self.relation_num, self.emb_size
        # create ALL params in every trace so stage-1 checkpoints restore
        # cleanly into stage 2 (reference keeps one nn.Module for both)
        u_emb = self.param("u_embeddings", NORMAL_INIT, (self.user_num, d))
        i_emb = self.param("i_embeddings", NORMAL_INIT, (self.item_num, d))
        r_emb = self.param("r_embeddings", NORMAL_INIT, (R, d))
        betas = self.param("betas", NORMAL_INIT, (self.category_num, R))
        mus = self.param("mus", NORMAL_INIT, (self.category_num, R))
        sigmas = self.param("sigmas", NORMAL_INIT, (self.category_num, R))
        pred_w = self.param("prediction_w", NORMAL_INIT, (d, 1))
        u_bias = self.param("user_bias", NORMAL_INIT, (self.user_num, 1))
        i_bias = self.param("item_bias", NORMAL_INIT, (self.item_num, 1))

        if "head_id" in feed:  # stage-1 KG training batch
            head = i_emb[feed["head_id"]]
            tail = i_emb[feed["tail_id"]]
            relation = r_emb[feed["relation_id"]]
            prediction = -((head + relation - tail) ** 2).sum(-1)
            return {"prediction": prediction}

        u_ids, i_ids = feed["user_id"], feed["item_id"]
        c_ids = feed["category_id"]
        r_interval = feed["relational_interval"]  # [B, C, R]

        u_vectors = u_emb[u_ids]
        i_vectors = i_emb[i_ids]

        b = jnp.clip(betas[c_ids] + 1.0, 1e-10, 10.0)
        s = jnp.clip(sigmas[c_ids] + 1.0, 1e-10, 10.0)
        m = mus[c_ids] + 1.0
        mask = (r_interval >= 0).astype(jnp.float32)
        temporal_decay = self._kernel_functions(r_interval * mask, b, s, m) * mask

        r_vectors = r_emb  # [R, d]
        ri_vectors = i_vectors[:, :, None, :] + r_vectors[None, None, :, :]
        chorus_vectors = i_vectors + (temporal_decay[:, :, :, None] * ri_vectors).sum(2)

        if self.base_method.upper().strip() == "GMF":
            mf_vector = u_vectors[:, None, :] * chorus_vectors
            prediction = (mf_vector @ pred_w)[..., 0]
        else:
            prediction = (u_vectors[:, None, :] * chorus_vectors).sum(-1)
            prediction = prediction + u_bias[u_ids] + i_bias[i_ids][..., 0]
        return {"prediction": prediction}

    def _kernel_functions(self, r_interval, betas, sigmas, mus):
        """Per-relation decay kernels (reference Chorus.py:100-120),
        selected statically by relation NAME."""

        def norm_pdf(x, mu, sigma):
            return jnp.exp(-((x - mu) ** 2) / (2.0 * sigma ** 2)) / (sigma * math.sqrt(2 * math.pi))

        decay_lst = []
        for r_idx in range(self.relation_num):
            dt = r_interval[:, :, r_idx]
            beta, sigma, mu = betas[:, :, r_idx], sigmas[:, :, r_idx], mus[:, :, r_idx]
            if r_idx > 0 and "complement" in self.relations[r_idx - 1]:
                decay = norm_pdf(dt, 0.0, beta)
            elif r_idx > 0 and "substitute" in self.relations[r_idx - 1]:
                decay = -norm_pdf(dt, 0.0, beta) + norm_pdf(dt, mu, sigma)
            else:  # exponential by default
                decay = beta * jnp.exp(-beta * dt)
            decay_lst.append(jnp.clip(decay, -1.0, 1.0))
        return jnp.stack(decay_lst, axis=2)

    # ------------------------------------------------------------------
    def loss(self, out_dict, feed):
        if self.stage == 1 and "head_id" in feed:
            predictions = out_dict["prediction"]
            pos_pred = predictions[:, :2].reshape(-1)
            neg_pred = predictions[:, 2:].reshape(-1)
            return jnp.maximum(0.0, self.margin - (pos_pred - neg_pred)).mean()
        return losses.bpr_multi_neg(out_dict["prediction"])

    def post_init_state(self, state):
        if self.stage == 2:
            if not os.path.exists(self.pretrain_path):
                raise ValueError('Pre-trained KG model does not exist, please run with "--stage 1"')
            with open(self.pretrain_path, "rb") as f:
                restored = flax.serialization.from_bytes(
                    {"params": state.params, "extra_vars": state.extra_vars}, f.read())
            return state.replace(params=restored["params"])
        return state

    def lr_scales(self, params):
        """Stage 2 scales the lr of the KG-pretrained tables by lr_scale
        (reference customize_parameters, Chorus.py:179-196)."""
        if self.stage != 2:
            return None
        kg = {"i_embeddings", "r_embeddings"}
        return {k: (self.lr_scale if k in kg else 1.0) for k in params}
