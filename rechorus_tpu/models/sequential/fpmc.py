"""FPMC -- factorized personalized Markov chains.

Reference behavior: src/models/sequential/FPMC.py (Rendle et al., WWW'10):
MF term dot(UI[u], IU[i]) + first-order transition term dot(LI[last], IL[i]).
The reference feeds last_item_id from the Dataset; here the model derives
it from the fixed-shape history arrays (last valid position).
"""
from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax.numpy as jnp

from rechorus_tpu.models.base import SequentialModel
from rechorus_tpu.ops.layers import embed
from rechorus_tpu.registry import register_model


@register_model("FPMC")
class FPMC(SequentialModel):

    def lazy_table_specs(self) -> dict:
        # the 'last item' li-gather draws from history_items values
        return {
            ("ui_embeddings", "embedding"): ("user_id",),
            ("iu_embeddings", "embedding"): ("item_id",),
            ("il_embeddings", "embedding"): ("item_id",),
            ("li_embeddings", "embedding"): ("history_items",),
        }

    extra_log_args: ClassVar[list] = ["emb_size"]
    supports_catalog: ClassVar[bool] = True
    catalog_raw_table: ClassVar[bool] = False  # returns a transformed i_table

    emb_size: int = 64

    @staticmethod
    def parse_model_args(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        return SequentialModel.parse_model_args(parser)

    @nn.compact
    def __call__(self, feed, training: bool = False, catalog: bool = False):
        u_id = feed["user_id"]
        history = feed["history_items"]
        lengths = feed["lengths"]
        li_id = jnp.take_along_axis(history, jnp.maximum(lengths - 1, 0)[:, None], axis=1)[:, 0]

        ui_emb = embed(self.user_num, self.emb_size, "ui_embeddings")
        iu_emb = embed(self.item_num, self.emb_size, "iu_embeddings")
        li_emb = embed(self.item_num, self.emb_size, "li_embeddings")
        il_emb = embed(self.item_num, self.emb_size, "il_embeddings")
        if catalog:
            # score = ui.iu[i] + li.il[i] == [ui|li] . [iu|il][i]
            # (computed table -> returned explicitly; XLA folds the
            # arange-gather into the raw tables)
            rows = jnp.arange(self.item_num, dtype=jnp.int32)
            u_v = jnp.concatenate([ui_emb(u_id), li_emb(li_id)], axis=-1)
            table = jnp.concatenate([iu_emb(rows), il_emb(rows)], axis=-1)
            return {"u_v": u_v, "i_table": table}
        ui = ui_emb(u_id)
        iu = iu_emb(feed["item_id"])
        li = li_emb(li_id)
        il = il_emb(feed["item_id"])

        prediction = (ui[:, None, :] * iu).sum(-1) + (li[:, None, :] * il).sum(-1)
        return {"prediction": prediction}
