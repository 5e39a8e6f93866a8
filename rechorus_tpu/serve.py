"""Standalone full-catalog serving API (build once, query many).

The reference has NO serving surface -- its closest thing is the
one-shot top-100 CSV export at the end of training (reference
main.py:96-153). A production recommender needs the opposite shape: a
build-once index object and a cheap jitted query path. `ServeIndex`
packages the round-5 serving kernels behind that shape:

    idx = ServeIndex.build(model, state, corpus, k=100)      # once
    items, scores = idx.query(user_ids)                      # many
    # (same return order as BaseRunner.predict_topk)

Build-time work (once, off the query path):
  * extract the user/item tables (+ item bias) from trained params via
    the catalog protocol (`BaseModel.supports_catalog`);
  * build the grouped-slice rescore copy (`ops.topk.
    group_table_for_rescore`) for large catalogs -- the r5 change that
    took 1M-item serving from 19.9k to 32.7k users/s exact / 74.3k
    approx (docs/PERF.md r5);
  * optionally bake the per-user clicked-exclusion matrix.

The query path is ONE jitted function per (batch shape): user-vector
gather -> fused pallas bucket-max scoring -> exact top-k (or
bucket-level `approx_max_k`, measured item recall 0.995 at target 0.98)
-> grouped-slice exact rescore -> clicked knockout. Small catalogs
(< ops.topk.MIN_ROWS_FOR_TILED) take the dense masked-top-k route.

Models whose catalog table is NOT the raw param table (LightGCN's
propagated embeddings, FPMC's fused transition table) build via
`ServeIndex.from_tables(u_table, i_table, ...)` with whatever they
precompute.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rechorus_tpu.ops import metrics as metrics_ops
from rechorus_tpu.ops import topk as topk_ops


@dataclasses.dataclass
class ServeIndex:
    u_table: jnp.ndarray                  # [n_users(+pad), D]
    i_table: jnp.ndarray                  # [n_items(+pad), D]
    i_bias: Optional[jnp.ndarray]         # [n_items(+pad)] or None
    grouped: Optional[jnp.ndarray]        # [Gp, bucket, D] rescore copy
    clicked: Optional[jnp.ndarray]        # [n_users, M] exclusion ids
    n_items: int
    k: int = 100
    approx: bool = False
    recall_target: float = 0.98

    # ------------------------------------------------------------------ #
    @classmethod
    def from_tables(cls, u_table, i_table, *, i_bias=None, clicked=None,
                    n_items: int | None = None, k: int = 100,
                    approx: bool = False, recall_target: float = 0.98):
        u_table = jnp.asarray(u_table)
        i_table = jnp.asarray(i_table)
        n_items = int(n_items if n_items is not None else i_table.shape[0])
        grouped = None
        if (i_table.shape[0] >= topk_ops.MIN_ROWS_FOR_TILED
                and topk_ops._use_pallas()
                and i_table.shape[0] >= topk_ops.DEFAULT_BUCKET * 128):
            grouped = topk_ops.group_table_for_rescore(i_table)
        return cls(u_table=u_table, i_table=i_table,
                   i_bias=None if i_bias is None else jnp.asarray(i_bias),
                   grouped=grouped,
                   clicked=None if clicked is None else jnp.asarray(clicked),
                   n_items=n_items, k=k, approx=approx,
                   recall_target=recall_target)

    @classmethod
    def build(cls, model, state, corpus=None, *, k: int = 100,
              approx: bool = False, recall_target: float = 0.98,
              exclude_clicked: bool = True):
        """From a trained TrainState of a catalog-protocol model whose
        catalog table is the raw param table. Other models: precompute
        the tables and use `from_tables`."""
        if not getattr(model, "supports_catalog", False) or \
                not getattr(model, "catalog_raw_table", True):
            raise ValueError(
                f"{type(model).__name__} does not expose a raw catalog "
                "table; precompute (u_table, i_table) and use "
                "ServeIndex.from_tables")
        params = state.params
        node = params
        for kk in model.catalog_table:
            node = node[kk]
        i_table = node["embedding"]
        if "u_embeddings" not in params:
            raise ValueError("no u_embeddings table; use from_tables")
        u_table = params["u_embeddings"]["embedding"]
        bias = None
        for name in ("i_bias", "item_bias"):
            if name in params and "embedding" in params[name]:
                cand = params[name]["embedding"].reshape(-1)
                if cand.shape[0] != i_table.shape[0]:
                    raise ValueError(
                        f"param {name!r} has {cand.shape[0]} rows but the "
                        f"item table has {i_table.shape[0]}; pass the bias "
                        "explicitly via from_tables")
                bias = cand
                break
        clicked = None
        if exclude_clicked and corpus is not None:
            clicked = jnp.asarray(
                corpus.clicked_matrix(include_residual=True), jnp.int32)
        return cls.from_tables(u_table, i_table, i_bias=bias, clicked=clicked,
                               n_items=getattr(corpus, "n_items", None)
                               or i_table.shape[0],
                               k=k, approx=approx, recall_target=recall_target)

    # ------------------------------------------------------------------ #
    def _query_fn(self):
        k, n_items = self.k, self.n_items
        approx, recall = self.approx, self.recall_target
        use_tiled = self.i_table.shape[0] >= topk_ops.MIN_ROWS_FOR_TILED

        @jax.jit
        def query(u_table, i_table, bias, grouped, clicked, user_ids):
            u = u_table[user_ids]
            cl = None if clicked is None else clicked[user_ids]
            if use_tiled:
                return topk_ops.tiled_catalog_topk(
                    u, i_table, k, bias=bias, clicked_rows=cl,
                    n_valid=n_items, approx=approx, recall_target=recall,
                    grouped_table=grouped)
            scores = u @ i_table.T
            if bias is not None:
                scores = scores + bias[None, :]
            if i_table.shape[0] > n_items:
                scores = jnp.where(jnp.arange(i_table.shape[0]) < n_items,
                                   scores, -jnp.inf)
            return metrics_ops.masked_topk(
                scores, cl if cl is not None
                else jnp.zeros((u.shape[0], 1), jnp.int32),
                k, n_valid=n_items, approx=approx, recall_target=recall)

        return query

    def query(self, user_ids):
        """(item ids [B, k], scores [B, k]) -- top-k catalog items per
        user, clicked/pad/dead rows excluded; same return order as
        BaseRunner.predict_topk. Returns numpy. Fixed batch shapes reuse
        the compiled program; pad ragged tails with user 0."""
        if not hasattr(self, "_compiled_query"):
            self._compiled_query = self._query_fn()
        user_ids = jnp.asarray(user_ids, jnp.int32)
        v, i = self._compiled_query(self.u_table, self.i_table, self.i_bias,
                                    self.grouped, self.clicked, user_ids)
        return np.asarray(i), np.asarray(v)
