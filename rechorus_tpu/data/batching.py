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
            self.num_neg = self.model.num_neg if getattr(self.model, "train_with_neg", True) else 0
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
        if self.num_neg > 0:
            neg = sampling.sample_negatives(
                key, users, arrays["_clicked"], self.num_neg, self.corpus.n_items
            )
            item_ids = jnp.concatenate([target[:, None], neg], axis=1)
        else:  # self-supervised models (BUIR/DirectAU): positives only
            item_ids = target[:, None]
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


@register_batcher("ctr")
class CTRBatcher(Batcher):
    """Pointwise rows: item_id [B,1], label [B]; no negative sampling.

    Parity: reference CTRModel.Dataset (BaseModel.py:276-288).
    """

    def build(self):
        df = self.corpus.data_df[self.phase]
        self._df = df
        self.n = len(df)
        self.arrays["user_id"] = df["user_id"].to_numpy().astype(np.int32)
        self.arrays["target_item"] = df["item_id"].to_numpy().astype(np.int32)
        self.arrays["label"] = df["label"].to_numpy().astype(np.float32)

    def _feed(self, arrays, idx):
        users = arrays["user_id"][idx]
        return {
            "user_id": users,
            "item_id": arrays["target_item"][idx][:, None],
            "label": arrays["label"][idx],
            "batch_size": users.shape[0],
        }

    def train_feed(self, arrays, idx, key):
        return self._feed(arrays, idx)

    def eval_feed(self, arrays, idx):
        return self._feed(arrays, idx)


def _add_situation(batcher, df):
    """Pack per-row situation features into cat/float blocks."""
    from rechorus_tpu.data.context import is_categorical

    situ = list(batcher.corpus.situation_feature_names)
    cat_cols = [c for c in situ if is_categorical(c)]
    flt_cols = [c for c in situ if not is_categorical(c)]
    if cat_cols:
        batcher.arrays["situ_cat"] = df[cat_cols].to_numpy().astype(np.int32)
    if flt_cols:
        batcher.arrays["situ_float"] = df[flt_cols].to_numpy().astype(np.float32)


def _maybe_neg_history(batcher, feed, key):
    """Sampled negative history for DIEN's auxiliary loss: uniform ids
    avoiding the positive at the same position (reference DIEN.py:195-205,
    sampled per epoch on host; here per step on device)."""
    if getattr(batcher.model, "alpha_aux", 0) <= 0 or "history_items" not in feed:
        return feed
    hist = feed["history_items"]
    n_items = batcher.corpus.n_items

    def body(i, carry):
        neg, key = carry
        key, sub = jax.random.split(key)
        fresh = jax.random.randint(sub, hist.shape, 1, n_items, dtype=jnp.int32)
        neg = jnp.where(neg == hist, fresh, neg)
        return neg, key

    key, sub = jax.random.split(key)
    neg = jax.random.randint(sub, hist.shape, 1, n_items, dtype=jnp.int32)
    neg, _ = jax.lax.fori_loop(0, 4, body, (neg, key))
    feed["history_neg_items"] = neg
    return feed


def _history_situ(batcher, df):
    """[n, H, F_s] historical situation values, categorical columns first
    (the order group_embeddings expects)."""
    from rechorus_tpu.data.context import is_categorical

    situ = list(batcher.corpus.situation_feature_names)
    raw = batcher.corpus.history_situ_arrays(df, batcher.model.history_max)
    order = [i for i, c in enumerate(situ) if is_categorical(c)] + [
        i for i, c in enumerate(situ) if not is_categorical(c)
    ]
    return raw[:, :, order].astype(np.float32 if any(not is_categorical(c) for c in situ) else np.int32)


def _situ_feed(batcher, feed, arrays, idx):
    if "situ_cat" in arrays:
        feed["situ_cat"] = arrays["situ_cat"][idx]
    if "situ_float" in arrays:
        feed["situ_float"] = arrays["situ_float"][idx]
    return feed


@register_batcher("context")
class ContextBatcher(GeneralBatcher):
    """General top-k + situation blocks; user/item feature matrices live
    in the model's constants (see models/base._ContextFields)."""

    def build(self):
        super().build()
        _add_situation(self, self.corpus.data_df[self.phase])

    def train_feed(self, arrays, idx, key):
        return _situ_feed(self, super().train_feed(arrays, idx, key), arrays, idx)

    def eval_feed(self, arrays, idx):
        return _situ_feed(self, super().eval_feed(arrays, idx), arrays, idx)


@register_batcher("context_ctr")
class ContextCTRBatcher(CTRBatcher):
    def build(self):
        super().build()
        _add_situation(self, self._df)

    def train_feed(self, arrays, idx, key):
        return _situ_feed(self, super().train_feed(arrays, idx, key), arrays, idx)

    def eval_feed(self, arrays, idx):
        return _situ_feed(self, super().eval_feed(arrays, idx), arrays, idx)


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


@register_batcher("context_seq")
class ContextSeqBatcher(SequentialBatcher):
    """Sequential top-k + situation blocks (+ historical situations).

    History item features are gathered in-model from the constants
    matrices by history_items id (reference instead precomputes
    history_<feature> columns per row, BaseContextModel.py:110-124).
    """

    def build(self):
        super().build()
        _add_situation(self, self._df)
        if getattr(self.model, "add_historical_situations", 0):
            self.arrays["history_situ"] = _history_situ(self, self._df)

    def train_feed(self, arrays, idx, key):
        key, aux_key = jax.random.split(key)
        feed = _situ_feed(self, super().train_feed(arrays, idx, key), arrays, idx)
        if "history_situ" in arrays:
            feed["history_situ"] = arrays["history_situ"][idx]
        _maybe_neg_history(self, feed, aux_key)
        return feed

    def eval_feed(self, arrays, idx):
        feed = _situ_feed(self, super().eval_feed(arrays, idx), arrays, idx)
        if "history_situ" in arrays:
            feed["history_situ"] = arrays["history_situ"][idx]
        return feed


@register_batcher("context_seq_ctr")
class ContextSeqCTRBatcher(CTRBatcher):
    """Pointwise CTR rows + history arrays (position>0 rows only,
    reference ContextSeqCTRModel.Dataset, BaseContextModel.py:144-166)."""

    def build(self):
        df = self.corpus.data_df[self.phase]
        keep = df["position"].to_numpy() > 0
        df = df[keep].reset_index(drop=True)
        self._df = df
        self.n = len(df)
        self.arrays["user_id"] = df["user_id"].to_numpy().astype(np.int32)
        self.arrays["target_item"] = df["item_id"].to_numpy().astype(np.int32)
        self.arrays["label"] = df["label"].to_numpy().astype(np.float32)
        H = self.model.history_max
        his_items, his_times, lengths = self.corpus.history_arrays(df, H)
        self.arrays["history_items"] = his_items
        self.arrays["history_times"] = his_times
        self.arrays["lengths"] = lengths
        _add_situation(self, df)
        if getattr(self.model, "add_historical_situations", 0):
            self.arrays["history_situ"] = _history_situ(self, df)

    def _feed(self, arrays, idx):
        feed = super()._feed(arrays, idx)
        for k in ["history_items", "history_times", "lengths", "history_situ"]:
            if k in arrays:
                feed[k] = arrays[k][idx]
        return _situ_feed(self, feed, arrays, idx)

    def train_feed(self, arrays, idx, key):
        return _maybe_neg_history(self, self._feed(arrays, idx), key)


@register_batcher("impression")
class ImpressionBatcher(Batcher):
    """Logged pos/neg lists padded to per-phase caps; item_id =
    [pos_pad | neg_pad]; target = +1 valid pos / 0 valid neg / -1 pad.

    Parity: reference ImpressionModel.Dataset (BaseImpressionModel.py:
    154-211) + ImpressionRunner.fit label construction (187-190).
    """

    def _source_df(self):
        return self.corpus.data_df[self.phase]

    def build(self):
        df = self._source_df()
        self._df = df
        self.n = len(df)
        if self.phase == "train":
            self.pos_len = self.model.train_max_pos_item
            self.neg_len = self.model.train_max_neg_item
        else:
            self.pos_len = self.model.test_max_pos_item
            self.neg_len = self.model.test_max_neg_item
        n = self.n

        def pad_lists(col, width):
            out = np.zeros((n, width), dtype=np.int32)
            for r, lst in enumerate(df[col]):
                lst = list(lst)[:width]
                out[r, : len(lst)] = lst
            return out

        self.arrays["user_id"] = df["user_id"].to_numpy().astype(np.int32)
        self.arrays["pos_items"] = pad_lists("pos_items", self.pos_len)
        self.arrays["neg_items"] = pad_lists("neg_items", self.neg_len)
        self.arrays["pos_num"] = np.minimum(df["pos_num"].to_numpy(), self.pos_len).astype(np.int32)
        self.arrays["neg_num"] = np.minimum(df["neg_num"].to_numpy(), self.neg_len).astype(np.int32)

    def _feed(self, arrays, idx):
        users = arrays["user_id"][idx]
        pos = arrays["pos_items"][idx]
        neg = arrays["neg_items"][idx]
        pos_num = arrays["pos_num"][idx]
        neg_num = arrays["neg_num"][idx]
        item_ids = jnp.concatenate([pos, neg], axis=1)
        pos_valid = jnp.arange(self.pos_len)[None, :] < pos_num[:, None]
        neg_valid = jnp.arange(self.neg_len)[None, :] < neg_num[:, None]
        target = jnp.concatenate(
            [jnp.where(pos_valid, 1.0, -1.0), jnp.where(neg_valid, 0.0, -1.0)], axis=1
        )
        return {
            "user_id": users, "item_id": item_ids, "target": target,
            "pos_num": pos_num, "neg_num": neg_num, "batch_size": users.shape[0],
        }

    def train_feed(self, arrays, idx, key):
        return self._feed(arrays, idx)

    def eval_feed(self, arrays, idx):
        return self._feed(arrays, idx)


@register_batcher("impression_seq")
class ImpressionSeqBatcher(ImpressionBatcher):
    """+ dual pos/neg history arrays (reference BaseImpressionModel.py:
    237-253). Requests with empty positive history are kept (lengths=0,
    models must mask) except that parity filtering (position>0) applies
    like SequentialModel."""

    def _source_df(self):
        df = self.corpus.data_df[self.phase]
        keep = df["position"].to_numpy() > 0
        return df[keep].reset_index(drop=True)

    def build(self):
        super().build()
        df = self._df
        H = self.model.history_max
        his, his_t, lens, nhis, nhis_t, nlens = self.corpus.dual_history_arrays(df, H)
        self.arrays["history_items"] = his
        self.arrays["history_times"] = his_t
        self.arrays["lengths"] = lens
        self.arrays["neg_history_items"] = nhis
        self.arrays["neg_history_times"] = nhis_t
        self.arrays["neg_lengths"] = nlens

    def _feed(self, arrays, idx):
        feed = super()._feed(arrays, idx)
        for k in ["history_items", "history_times", "lengths",
                  "neg_history_items", "neg_history_times", "neg_lengths"]:
            feed[k] = arrays[k][idx]
        return feed


@register_batcher("rerank")
class RerankBatcher(ImpressionBatcher):
    """Impression feeds + frozen-ranker outputs computed inside the
    jitted step (reference instead runs the ranker in DataLoader collate,
    BaseRerankerModel.py:70-84)."""

    def build(self):
        super().build()
        from rechorus_tpu.models.reranker._loader import load_ranker

        def example_feed():
            arrays = {k: jnp.asarray(v[:2]) for k, v in self.arrays.items()}
            return ImpressionBatcher._feed(self, arrays, jnp.arange(2))

        self.ranker, self.ranker_variables = load_ranker(self.args, self.corpus, example_feed)

    def _feed(self, arrays, idx):
        feed = super()._feed(arrays, idx)
        out = self.ranker.apply(self.ranker_variables, feed, training=False)
        valid = feed["target"] != -1
        scores = jnp.where(valid, out["prediction"], -jnp.inf)
        order = jnp.argsort(-scores, axis=1)
        position = jnp.argsort(order, axis=1)
        feed["scores"] = scores
        feed["position"] = position.astype(jnp.int32)
        feed["padding_mask"] = ~valid
        feed["u_v"] = out["u_v"]
        feed["i_v"] = out["i_v"]
        return feed


@register_batcher("rerank_seq")
class RerankSeqBatcher(ImpressionSeqBatcher):
    def build(self):
        super().build()
        from rechorus_tpu.models.reranker._loader import load_ranker

        def example_feed():
            arrays = {k: jnp.asarray(v[:2]) for k, v in self.arrays.items()}
            return ImpressionSeqBatcher._feed(self, arrays, jnp.arange(2))

        self.ranker, self.ranker_variables = load_ranker(self.args, self.corpus, example_feed)

    def _feed(self, arrays, idx):
        feed = super()._feed(arrays, idx)
        out = self.ranker.apply(self.ranker_variables, feed, training=False)
        valid = feed["target"] != -1
        scores = jnp.where(valid, out["prediction"], -jnp.inf)
        order = jnp.argsort(-scores, axis=1)
        feed["scores"] = scores
        feed["position"] = jnp.argsort(order, axis=1).astype(jnp.int32)
        feed["padding_mask"] = ~valid
        feed["u_v"] = out["u_v"]
        feed["i_v"] = out["i_v"]
        # his_v: ranker item embeddings of the positive history; obtained
        # by scoring the history ids as candidates and taking i_v
        his_feed = dict(feed)
        his_feed["item_id"] = feed["history_items"]
        his_out = self.ranker.apply(self.ranker_variables, his_feed, training=False)
        feed["his_v"] = his_out["i_v"]
        return feed
