"""LightGCN -- simplified graph convolution over the user-item bipartite graph.

Reference behavior: src/models/general/LightGCN.py (He et al., SIGIR'20):
symmetric-normalized adjacency D^-1/2 A D^-1/2 over the (n_users+n_items)
node set built from train interactions (LightGCN.py:22-53), K propagation
layers, final embedding = mean of all layer outputs (LGCNEncoder.forward
137-154), dot-product scoring; Impression mode at LightGCN.py:93-108.

TPU design: the reference's scipy CSR + torch.sparse.mm becomes edge-list
arrays in the 'constants' collection + jax.ops.segment_sum (rows sorted at
build time so XLA gets indices_are_sorted); propagation is a dense [N, d]
gather/segment-sum per layer -- fully fused into the jitted step, no host
sparse matrices.
"""
from __future__ import annotations

from typing import Any, ClassVar

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rechorus_tpu.models.base import GeneralModel, ImpressionModel
from rechorus_tpu.registry import register_model

XAVIER_U = nn.initializers.xavier_uniform()


def build_edges(n_users: int, n_items: int, train_clicked_set) -> dict:
    """Symmetric-normalized bipartite edge list (reference build_adjmat,
    LightGCN.py:22-53, selfloop_flag=False). Nodes: [users | items+n_users].
    """
    us, its = [], []
    for u, s in train_clicked_set.items():
        for i in s:
            us.append(u)
            its.append(i)
    u = np.asarray(us, dtype=np.int32)
    i = np.asarray(its, dtype=np.int32) + n_users
    rows = np.concatenate([u, i])
    cols = np.concatenate([i, u])
    n = n_users + n_items
    deg = np.bincount(rows, minlength=n).astype(np.float64) + 1e-10
    d_inv_sqrt = np.power(deg, -0.5)
    d_inv_sqrt[np.isinf(d_inv_sqrt)] = 0.0
    vals = (d_inv_sqrt[rows] * d_inv_sqrt[cols]).astype(np.float32)
    order = np.argsort(rows, kind="stable")  # sorted rows -> fast segment_sum
    return {"rows": rows[order], "cols": cols[order], "vals": vals[order]}


class LightGCNBase:
    @staticmethod
    def parse_model_args_base(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        parser.add_argument("--n_layers", type=int, default=3, help="Number of LightGCN layers.")
        return parser

    @classmethod
    def graph_kwargs(cls, corpus):
        edges = build_edges(corpus.n_users, corpus.n_items, corpus.train_clicked_set)
        return {"adj_factory": (lambda edges=edges: edges)}

    def _edges(self):
        arrays = self.adj_factory()
        out = {}
        for k, v in arrays.items():
            if self.has_variable("constants", k):
                out[k] = self.get_variable("constants", k)
            else:
                out[k] = self.variable("constants", k, lambda v=v: jnp.asarray(v)).value
        return out

    def propagate(self):
        """K-layer propagation over the full node set -> mean of layers."""
        user_emb = self.param("user_emb", XAVIER_U, (self.user_num, self.emb_size))
        item_emb = self.param("item_emb", XAVIER_U, (self.item_num, self.emb_size))
        edges = self._edges()
        rows, cols, vals = edges["rows"], edges["cols"], edges["vals"]
        n = self.user_num + self.item_num
        ego = jnp.concatenate([user_emb, item_emb], axis=0)  # [N, d]
        acc = ego
        for _ in range(self.n_layers):
            ego = jax.ops.segment_sum(
                vals[:, None] * ego[cols], rows, num_segments=n, indices_are_sorted=True
            )
            acc = acc + ego
        all_emb = acc / (self.n_layers + 1)
        return all_emb[: self.user_num], all_emb[self.user_num:]

    def score(self, feed):
        user_all, item_all = self.propagate()
        u_embed = user_all[feed["user_id"]]  # [B, d]
        i_embed = item_all[feed["item_id"]]  # [B, C, d]
        prediction = (u_embed[:, None, :] * i_embed).sum(-1)
        u_v = jnp.broadcast_to(u_embed[:, None, :], i_embed.shape)
        return {"prediction": prediction, "u_v": u_v, "i_v": i_embed}


@register_model("LightGCN")
class LightGCN(GeneralModel, LightGCNBase):
    extra_log_args: ClassVar[list] = ["emb_size", "n_layers", "batch_size"]
    supports_catalog: ClassVar[bool] = True
    catalog_raw_table: ClassVar[bool] = False  # returns a transformed i_table

    def lazy_table_specs(self) -> dict:
        # OPT OUT of --lazy_emb_adam: graph propagation back-propagates
        # into EVERY user/item row each step (the segment_sum conv), so
        # touched-rows updates are the full table anyway
        return {}

    emb_size: int = 64
    n_layers: int = 3
    adj_factory: Any = None

    @staticmethod
    def parse_model_args(parser):
        parser = LightGCNBase.parse_model_args_base(parser)
        return GeneralModel.parse_model_args(parser)

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw.update(cls.graph_kwargs(corpus))
        return kw

    @nn.compact
    def __call__(self, feed, training: bool = False, catalog: bool = False):
        if catalog:
            # propagated (not raw-param) table -> returned explicitly
            user_all, item_all = self.propagate()
            return {"u_v": user_all[feed["user_id"]], "i_table": item_all}
        return {"prediction": self.score(feed)["prediction"]}


@register_model("LightGCNImpression")
class LightGCNImpression(ImpressionModel, LightGCNBase):
    """Impression-mode LightGCN (reference LightGCN.py:93-108)."""

    extra_log_args: ClassVar[list] = ["emb_size", "n_layers", "batch_size"]

    emb_size: int = 64
    n_layers: int = 3
    adj_factory: Any = None

    @staticmethod
    def parse_model_args(parser):
        parser = LightGCNBase.parse_model_args_base(parser)
        return ImpressionModel.parse_model_args(parser)

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw.update(cls.graph_kwargs(corpus))
        return kw

    @nn.compact
    def __call__(self, feed, training: bool = False):
        return self.score(feed)
