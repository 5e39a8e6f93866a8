"""CFKG -- collaborative filtering on knowledge-base embeddings (TransE).

Reference behavior: src/models/general/CFKG.py (Zhang et al., SIGIR'18):
one entity table over [users | items+attribute entities], relation table
with index 0 = "buy"; score(h, r, t) = -||h + r - t||^2; margin ranking
loss over the 4-column (h,h,h,h') x (t,t,t',t) corruption built by the
'cfkg' batcher; training rows = KG triplets + interactions.
CMD example:
  python -m rechorus_tpu.main --model_name CFKG --emb_size 64 --margin 1 \
      --include_attr 1 --lr 1e-4 --l2 1e-6 --dataset Grocery_and_Gourmet_Food
"""
from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax.numpy as jnp

from rechorus_tpu.models.base import GeneralModel
from rechorus_tpu.ops.layers import embed
from rechorus_tpu.registry import register_model


@register_model("CFKG")
class CFKG(GeneralModel):
    reader: ClassVar[str] = "KGReader"
    batcher: ClassVar[str] = "cfkg"
    extra_log_args: ClassVar[list] = ["emb_size", "margin", "include_attr"]

    emb_size: int = 64
    margin: float = 0.0
    entity_num: int = 0
    relation_num: int = 0

    @staticmethod
    def parse_model_args(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        parser.add_argument("--margin", type=float, default=0, help="Margin in hinge loss.")
        return GeneralModel.parse_model_args(parser)

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw["entity_num"] = corpus.n_entities
        kw["relation_num"] = corpus.n_relations
        return kw

    def lazy_table_specs(self) -> dict:
        # the joint [users | entities] table is the big one; r_embeddings
        # is [n_relations, d] (tiny) and stays dense
        return {("e_embeddings", "embedding"): ("head_id", "tail_id")}

    @nn.compact
    def __call__(self, feed, training: bool = False):
        # TableEmbed (not raw params): required for --bf16_emb and the
        # --sparse_emb_grad lookup context (ops/layers.embed docstring)
        e_emb = embed(self.user_num + self.entity_num, self.emb_size, "e_embeddings")
        r_emb = embed(self.relation_num, self.emb_size, "r_embeddings")
        head = e_emb(feed["head_id"])
        tail = e_emb(feed["tail_id"])
        relation = r_emb(feed["relation_id"])
        prediction = -((head + relation - tail) ** 2).sum(-1)
        return {"prediction": prediction}

    def loss(self, out_dict, feed):
        predictions = out_dict["prediction"]  # [B, 4]
        pos_pred = predictions[:, :2].reshape(-1)
        neg_pred = predictions[:, 2:].reshape(-1)
        # nn.MarginRankingLoss(margin)(pos, neg, +1) = mean max(0, m-(pos-neg))
        return jnp.maximum(0.0, self.margin - (pos_pred - neg_pred)).mean()
