"""NeuMF (NCF) -- GMF tower || MLP tower -> linear head.

Reference behavior: src/models/general/NeuMF.py (He et al., WWW'17).
"""
from __future__ import annotations

import ast
from typing import ClassVar, Tuple

import flax.linen as nn
import jax.numpy as jnp

from rechorus_tpu.models.base import GeneralModel
from rechorus_tpu.ops.layers import dense, embed
from rechorus_tpu.registry import register_model


@register_model("NeuMF")
class NeuMF(GeneralModel):

    def lazy_table_specs(self) -> dict:
        # twin MF/MLP tables, all gathered by user_id/item_id only
        return {
            ("mf_u_embeddings", "embedding"): ("user_id",),
            ("mlp_u_embeddings", "embedding"): ("user_id",),
            ("mf_i_embeddings", "embedding"): ("item_id",),
            ("mlp_i_embeddings", "embedding"): ("item_id",),
        }

    extra_log_args: ClassVar[list] = ["emb_size", "layers"]

    emb_size: int = 64
    layers: Tuple[int, ...] = (64,)

    @staticmethod
    def parse_model_args(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        parser.add_argument("--layers", type=str, default="[64]", help="Size of each layer.")
        return GeneralModel.parse_model_args(parser)

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw["layers"] = tuple(ast.literal_eval(args.layers))
        return kw

    @nn.compact
    def __call__(self, feed, training: bool = False):
        u_ids = feed["user_id"][:, None]  # [B, 1]
        i_ids = feed["item_id"]  # [B, C]
        u_ids = jnp.broadcast_to(u_ids, i_ids.shape)

        mf_u = embed(self.user_num, self.emb_size, "mf_u_embeddings")(u_ids)
        mf_i = embed(self.item_num, self.emb_size, "mf_i_embeddings")(i_ids)
        mlp_u = embed(self.user_num, self.emb_size, "mlp_u_embeddings")(u_ids)
        mlp_i = embed(self.item_num, self.emb_size, "mlp_i_embeddings")(i_ids)

        mf_vector = mf_u * mf_i
        mlp_vector = jnp.concatenate([mlp_u, mlp_i], axis=-1)
        for k, layer_size in enumerate(self.layers):
            mlp_vector = nn.relu(dense(layer_size, name=f"mlp_{k}")(mlp_vector))
            mlp_vector = nn.Dropout(self.dropout, deterministic=not training)(mlp_vector)

        output_vector = jnp.concatenate([mf_vector, mlp_vector], axis=-1)
        prediction = dense(1, use_bias=False, name="prediction")(output_vector)[..., 0]
        return {"prediction": prediction}
