"""Fixed-shape device-resident batch pipelines.

Replaces the reference's inner `Dataset` classes + torch DataLoader worker
processes (src/models/BaseModel.py:96-152, src/helpers/BaseRunner.py:182):
the whole corpus becomes a dict of fixed-shape device arrays placed on HBM
once, and feeds are assembled INSIDE jitted steps by index gather --
negative sampling, history slicing and candidate assembly are all device
compute. No per-step host->device traffic.

A `Batcher` holds:
  * host-side numpy arrays built once from the reader (`build`),
  * static config (num_neg, candidate counts, history_max),
  * jittable feed builders `train_feed(arrays, idx, key)` and
    `eval_feed(arrays, idx)` closed over by the runner's jitted fns.
"""
from __future__ import annotations

import logging
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rechorus_tpu.ops import sampling

BATCHER_REGISTRY: Dict[str, type] = {}


def register_batcher(name):
    def deco(cls):
        BATCHER_REGISTRY[name] = cls
        return cls

    return deco


def get_batcher(name: str):
    return BATCHER_REGISTRY[name]


class Batcher:
    """Base: one instance per (corpus, phase)."""

    def __init__(self, corpus, model, phase: str, args):
        self.corpus = corpus
        self.model = model
        self.phase = phase
        self.args = args
        self.arrays: Dict[str, np.ndarray] = {}
        self.n = 0
        self.build()

    def __len__(self):
        return self.n

    def build(self):
        raise NotImplementedError

    def device_arrays(self) -> Dict[str, jnp.ndarray]:
        return {k: jnp.asarray(v) for k, v in self.arrays.items()}

    # jittable -------------------------------------------------------------
    def train_feed(self, arrays, idx, key):
        raise NotImplementedError

    def eval_feed(self, arrays, idx):
        raise NotImplementedError


@register_batcher("general")
class GeneralBatcher(Batcher):
    """(user, target) rows; train negatives sampled on device; dev/test use
    logged candidate lists [target | 99 negs] or the full catalog
    (test_all). Parity: reference GeneralModel.Dataset
    (src/models/BaseModel.py:191-214)."""

    def build(self):
        df = self.corpus.data_df[self.phase]
        self.n = len(df)
        self.arrays["user_id"] = df["user_id"].to_numpy().astype(np.int32)
        self.arrays["target_item"] = df["item_id"].to_numpy().astype(np.int32)
        self.test_all = bool(getattr(self.model, "test_all", 0)) and self.phase != "train"
        if self.phase == "train":
            self.arrays["_clicked"] = self.corpus.clicked_matrix(include_residual=False)
            self.num_neg = self.model.num_neg
        elif not self.test_all:
            neg = np.stack(self.corpus.data_df[self.phase]["neg_items"].to_list()).astype(np.int32)
            self.arrays["neg_items"] = neg
        else:
            # full-catalog eval: mask train+residual clicked items
            # (reference BaseRunner.py:244-251)
            self.arrays["_clicked_all"] = self.corpus.clicked_matrix(include_residual=True)

    # -- jittable ----------------------------------------------------------
    def train_feed(self, arrays, idx, key):
        users = arrays["user_id"][idx]
        target = arrays["target_item"][idx]
        neg = sampling.sample_negatives(
            key, users, arrays["_clicked"], self.num_neg, self.corpus.n_items
        )
        item_ids = jnp.concatenate([target[:, None], neg], axis=1)
        return {"user_id": users, "item_id": item_ids, "batch_size": users.shape[0]}

    def eval_feed(self, arrays, idx):
        users = arrays["user_id"][idx]
        target = arrays["target_item"][idx]
        if self.test_all:
            # candidates = the whole catalog [0..n_items); item 0 (pad) and
            # every train+residual clicked item are masked by the runner
            # via 'clicked_mask'; the target's catalog copy is also clicked
            # (it sits in residual_clicked_set), so it never double-counts.
            feed = {
                "user_id": users,
                "item_id": jnp.broadcast_to(
                    jnp.arange(self.corpus.n_items, dtype=jnp.int32)[None, :],
                    (users.shape[0], self.corpus.n_items),
                ),
                "_clicked_rows": arrays["_clicked_all"][users],
                "_target": target,
            }
        else:
            item_ids = jnp.concatenate([target[:, None], arrays["neg_items"][idx]], axis=1)
            feed = {"user_id": users, "item_id": item_ids}
        feed["batch_size"] = users.shape[0]
        return feed


@register_batcher("sequential")
class SequentialBatcher(GeneralBatcher):
    """Adds history_items/history_times/lengths, filters position>0 rows.

    Parity: reference SequentialModel.Dataset (BaseModel.py:226-245).
    """

    def build(self):
        df = self.corpus.data_df[self.phase]
        keep = df["position"].to_numpy() > 0
        df = df[keep].reset_index(drop=True)
        self._df = df
        self.n = len(df)
        self.arrays["user_id"] = df["user_id"].to_numpy().astype(np.int32)
        self.arrays["target_item"] = df["item_id"].to_numpy().astype(np.int32)
        H = self.model.history_max
        his_items, his_times, lengths = self.corpus.history_arrays(df, H)
        self.arrays["history_items"] = his_items
        self.arrays["history_times"] = his_times
        self.arrays["lengths"] = lengths
        self.test_all = bool(getattr(self.model, "test_all", 0)) and self.phase != "train"
        if self.phase == "train":
            self.arrays["_clicked"] = self.corpus.clicked_matrix(include_residual=False)
            self.num_neg = self.model.num_neg
        elif not self.test_all:
            neg = np.stack(df["neg_items"].to_list()).astype(np.int32)
            self.arrays["neg_items"] = neg
        else:
            self.arrays["_clicked_all"] = self.corpus.clicked_matrix(include_residual=True)

    def train_feed(self, arrays, idx, key):
        feed = super().train_feed(arrays, idx, key)
        feed["history_items"] = arrays["history_items"][idx]
        feed["history_times"] = arrays["history_times"][idx]
        feed["lengths"] = arrays["lengths"][idx]
        return feed

    def eval_feed(self, arrays, idx):
        feed = super().eval_feed(arrays, idx)
        feed["history_items"] = arrays["history_items"][idx]
        feed["history_times"] = arrays["history_times"][idx]
        feed["lengths"] = arrays["lengths"][idx]
        return feed
