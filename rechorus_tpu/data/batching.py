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

from typing import Dict

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


class LazyRows:
    """Deferred per-row array: `build(lo, hi)` materializes rows
    [lo, hi). Under `--host_shard_input`, heavy corpus arrays (history
    banks etc.) stay in this form until BaseRunner.place_arrays, which
    builds only each host's addressable 'data'-shard blocks -- corpus
    host RAM then scales 1/num_hosts (single-device/replicated placement
    just builds the whole range)."""

    __slots__ = ("shape", "dtype", "build")

    def __init__(self, shape, dtype, build):
        self.shape = tuple(shape)
        self.dtype = np.dtype(dtype)
        self.build = build

    @property
    def nbytes(self) -> int:
        return int(np.prod(self.shape)) * self.dtype.itemsize

    @property
    def ndim(self) -> int:
        return len(self.shape)

    def __getitem__(self, key) -> np.ndarray:
        # plain [lo:hi] slicing materializes the range (host-side
        # precomputes like SLRC/Chorus intervals stream over row chunks)
        if not (isinstance(key, slice) and key.step in (None, 1)):
            raise TypeError("LazyRows supports only contiguous [lo:hi] slices")
        lo, hi, _ = key.indices(self.shape[0])
        return self.materialize(lo, hi)

    def materialize(self, lo: int = 0, hi: int | None = None) -> np.ndarray:
        hi = self.shape[0] if hi is None else hi
        n = self.shape[0]
        real_hi = min(hi, n)
        out = np.asarray(self.build(lo, real_hi), dtype=self.dtype)
        if hi > real_hi:  # rows past the logical end (divisibility padding)
            out = np.concatenate(
                [out, np.zeros((hi - real_hi,) + self.shape[1:], self.dtype)])
        return out


class Batcher:
    """Base: one instance per (corpus, phase)."""

    def __init__(self, corpus, model, phase: str, args):
        self.corpus = corpus
        self.model = model
        self.phase = phase
        self.args = args
        self.arrays: Dict[str, np.ndarray] = {}
        self.n = 0
        self.host_shard_input = bool(int(getattr(args, "host_shard_input", 0) or 0))
        self.build()

    def __len__(self):
        return self.n

    def build(self):
        raise NotImplementedError

    def device_arrays(self) -> Dict[str, jnp.ndarray]:
        """LazyRows entries pass through unmaterialized; the runner's
        place_arrays resolves them (per-shard on a mesh)."""
        return {k: v if isinstance(v, LazyRows) else jnp.asarray(v)
                for k, v in self.arrays.items()}

    # jittable -------------------------------------------------------------
    def train_feed(self, arrays, idx, key):
        raise NotImplementedError

    def eval_feed(self, arrays, idx, cands=None):
        raise NotImplementedError

    def epoch_arrays(self, arrays, key) -> Dict[str, jnp.ndarray]:
        """Jittable once-per-epoch stage, run inside epoch_fn BEFORE the
        step scan; returned entries are merged into `arrays` for this
        epoch's train_feed calls. Every row of the permutation is visited
        exactly once per epoch, so sampling negatives here is
        distributionally identical to sampling them inside each step --
        and matches the reference's actions_before_epoch granularity
        (src/models/BaseModel.py:206-214) -- while batching the whole
        epoch's rejection probes into one device program (the per-step
        KG-membership gathers + member-table VMEM staging dominated the
        KDA step trace; docs/PERF.md r4)."""
        return {}


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
            if "_ep_neg_items" in arrays:  # epoch_arrays-hoisted lane
                neg = arrays["_ep_neg_items"][idx]
            else:
                neg = sampling.sample_negatives(
                    key, users, arrays["_clicked"], self.num_neg, self.corpus.n_items
                )
            item_ids = jnp.concatenate([target[:, None], neg], axis=1)
        else:  # self-supervised models (BUIR/DirectAU): positives only
            item_ids = target[:, None]
        return {"user_id": users, "item_id": item_ids, "batch_size": users.shape[0]}

    def eval_feed(self, arrays, idx, cands=None):
        users = arrays["user_id"][idx]
        target = arrays["target_item"][idx]
        if self.test_all:
            # candidates = the whole catalog [0..n_items); item 0 (pad) and
            # every train+residual clicked item are masked by the runner
            # via 'clicked_mask'; the target's catalog copy is also clicked
            # (it sits in residual_clicked_set), so it never double-counts.
            # `cands` overrides the candidate matrix [B, C] -- the runner's
            # candidate-tiled eval streams catalog chunks through the
            # model's ordinary forward (big catalogs, non-catalog models).
            if cands is None:
                cands = jnp.broadcast_to(
                    jnp.arange(self.corpus.n_items, dtype=jnp.int32)[None, :],
                    (users.shape[0], self.corpus.n_items),
                )
            feed = {
                "user_id": users,
                "item_id": cands,
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

    def eval_feed(self, arrays, idx, cands=None):
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
    feed["history_neg_items"] = sampling.first_accepted(
        key,
        lambda k: jax.random.randint(k, hist.shape, 1, n_items, dtype=jnp.int32),
        lambda c: c == hist, rounds=4)
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

    def eval_feed(self, arrays, idx, cands=None):
        return _situ_feed(self, super().eval_feed(arrays, idx, cands), arrays, idx)


@register_batcher("context_ctr")
class ContextCTRBatcher(CTRBatcher):
    def build(self):
        super().build()
        _add_situation(self, self._df)

    def train_feed(self, arrays, idx, key):
        return _situ_feed(self, super().train_feed(arrays, idx, key), arrays, idx)

    def eval_feed(self, arrays, idx, cands=None):
        return _situ_feed(self, super().eval_feed(arrays, idx, cands), arrays, idx)


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
        if self.host_shard_input:
            # deferred: each host builds only its addressable row blocks
            # (BaseRunner.place_arrays); the C++ history kernel takes any
            # row slice, so a range build costs exactly its share
            cache = {}

            def triple(lo, hi, j):
                # one entry per local shard range (the three keys request
                # the same ranges, so each range builds once); evicted
                # after its 3rd read so the host copy does not stay
                # pinned alongside the device placement for the whole run
                ent = cache.get((lo, hi))
                if ent is None:
                    ent = [self.corpus.history_arrays(df.iloc[lo:hi], H), 0]
                    cache[(lo, hi)] = ent
                val = ent[0][j]
                ent[1] += 1
                if ent[1] >= 3:
                    cache.pop((lo, hi), None)
                return val

            self.arrays["history_items"] = LazyRows(
                (self.n, H), np.int32, lambda lo, hi: triple(lo, hi, 0))
            self.arrays["history_times"] = LazyRows(
                (self.n, H), np.int64, lambda lo, hi: triple(lo, hi, 1))
            self.arrays["lengths"] = LazyRows(
                (self.n,), np.int32, lambda lo, hi: triple(lo, hi, 2))
        else:
            his_items, his_times, lengths = self.corpus.history_arrays(df, H)
            self.arrays["history_items"] = his_items
            self.arrays["history_times"] = his_times
            self.arrays["lengths"] = lengths
        self.test_all = bool(getattr(self.model, "test_all", 0)) and self.phase != "train"
        if self.phase == "train":
            self.arrays["_clicked"] = self.corpus.clicked_matrix(include_residual=False)
            # same train_with_neg contract as GeneralBatcher (CLRec etc.
            # train without sampled negatives)
            self.num_neg = self.model.num_neg if getattr(self.model, "train_with_neg", True) else 0
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

    def eval_feed(self, arrays, idx, cands=None):
        feed = super().eval_feed(arrays, idx, cands)
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

    def eval_feed(self, arrays, idx, cands=None):
        feed = _situ_feed(self, super().eval_feed(arrays, idx, cands), arrays, idx)
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

    --test_all eval (VERDICT r4 item 2): the negative block becomes the
    FULL catalog (item_id = [pos_pad | 0..n_items-1]; catalog column j is
    item j), with the user's positively-clicked items (all splits),
    id 0, and pad positives masked via target = -1 -- the runner turns
    those to -inf before the listwise metrics, and neg_num becomes the
    per-row count of valid catalog candidates. This implements the
    masking the reference INTENDS at ImpressionRunner.py:141-149; the
    reference path itself is non-functional (its evaluate_method
    returns {} for test_all, :82-83, and the clicked mask indexes
    columns by raw item id into a [B, P+N] matrix). Width P + n_items
    per eval row: sized for research catalogs, not 1M-item serving.
    """

    def _source_df(self):
        return self.corpus.data_df[self.phase]

    def build(self):
        df = self._source_df()
        self._df = df
        self.n = len(df)
        self.test_all = bool(getattr(self.model, "test_all", 0)) and self.phase != "train"
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
        self.arrays["pos_num"] = np.minimum(df["pos_num"].to_numpy(), self.pos_len).astype(np.int32)
        if self.test_all:
            self.neg_len = self.corpus.n_items
            clicked = self.corpus.pos_clicked_matrix()
            self.arrays["_clicked_rows"] = clicked
            # valid catalog candidates = n_items - 1 (id 0) - #clicked
            # ids (unique per user; each masks one catalog column)
            cnt = (clicked > 0).sum(axis=1).astype(np.int64)
            self.arrays["neg_num"] = (
                self.corpus.n_items - 1 - cnt[self.arrays["user_id"]]
            ).astype(np.int32)
        else:
            self.arrays["neg_items"] = pad_lists("neg_items", self.neg_len)
            self.arrays["neg_num"] = np.minimum(df["neg_num"].to_numpy(), self.neg_len).astype(np.int32)

    def _feed(self, arrays, idx):
        users = arrays["user_id"][idx]
        pos = arrays["pos_items"][idx]
        pos_num = arrays["pos_num"][idx]
        neg_num = arrays["neg_num"][idx]
        pos_valid = jnp.arange(self.pos_len)[None, :] < pos_num[:, None]
        B = users.shape[0]
        if self.test_all:
            N = self.corpus.n_items
            catalog = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (B, N))
            item_ids = jnp.concatenate([pos, catalog], axis=1)
            clicked = arrays["_clicked_rows"][users]            # [B, M]
            cl = jnp.zeros((B, N), bool).at[
                jnp.arange(B)[:, None], clicked.astype(jnp.int32)].set(True)
            cat_valid = (jnp.arange(N)[None, :] > 0) & ~cl
            target = jnp.concatenate(
                [jnp.where(pos_valid, 1.0, -1.0), jnp.where(cat_valid, 0.0, -1.0)], axis=1
            )
        else:
            neg = arrays["neg_items"][idx]
            item_ids = jnp.concatenate([pos, neg], axis=1)
            neg_valid = jnp.arange(self.neg_len)[None, :] < neg_num[:, None]
            target = jnp.concatenate(
                [jnp.where(pos_valid, 1.0, -1.0), jnp.where(neg_valid, 0.0, -1.0)], axis=1
            )
        return {
            "user_id": users, "item_id": item_ids, "target": target,
            "pos_num": pos_num, "neg_num": neg_num, "batch_size": B,
        }

    def train_feed(self, arrays, idx, key):
        return self._feed(arrays, idx)

    def eval_feed(self, arrays, idx, cands=None):
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
        if getattr(self.model, "test_all", 0):
            # hard error, not silent: rerankers score a LOGGED candidate
            # list (ordinal position embeddings sized by the caps); a
            # full-catalog candidate axis has no defined semantics here
            # (the reference crashes on it too)
            raise ValueError("--test_all is not defined for re-ranking "
                             "models; drop the flag")
        super().build()
        from rechorus_tpu.models.reranker._loader import load_ranker

        def example_feed():
            arrays = {k: jnp.asarray(v[:2]) for k, v in self.arrays.items()}
            return ImpressionBatcher._feed(self, arrays, jnp.arange(2))

        self.ranker, self.ranker_variables = load_ranker(self.args, self.corpus, example_feed)
        self.tuneranker = bool(getattr(self.model, "tuneranker", 0))

    def post_init_state(self, state):
        """--tuneranker: swap the reranker init's randomly-initialized
        `ranker_module` subtree for the loaded ranker checkpoint (the
        reference un-freezes the loaded params in place,
        BaseRerankerModel.py:58-66). Called by BaseRunner.init_state."""
        if not self.tuneranker:
            return state
        import jax as _jax

        loaded = self.ranker_variables
        params = dict(state.params)
        if _jax.tree_util.tree_structure(params.get("ranker_module")) != \
                _jax.tree_util.tree_structure(loaded["params"]):
            raise ValueError(
                "--tuneranker: loaded ranker params do not match the "
                "ranker_module subtree (config drift between the ranker "
                "checkpoint and --ranker_config_file?)")
        params["ranker_module"] = loaded["params"]
        extra = dict(state.extra_vars)
        for col, sub in loaded.items():
            if col == "params":
                continue
            col_tree = dict(extra.get(col, {}))
            col_tree["ranker_module"] = sub
            extra[col] = col_tree
        return state.replace(params=params, extra_vars=extra)

    def _feed(self, arrays, idx):
        feed = super()._feed(arrays, idx)
        if self.tuneranker:
            # the MODEL runs the ranker as a trainable submodule
            # (RerankModel.rerank_feed); precomputing frozen outputs here
            # would mask its gradients
            return feed
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
        if getattr(self.model, "test_all", 0):
            raise ValueError("--test_all is not defined for re-ranking "
                             "models; drop the flag")
        super().build()
        from rechorus_tpu.models.reranker._loader import load_ranker

        def example_feed():
            arrays = {k: jnp.asarray(v[:2]) for k, v in self.arrays.items()}
            return ImpressionSeqBatcher._feed(self, arrays, jnp.arange(2))

        self.ranker, self.ranker_variables = load_ranker(self.args, self.corpus, example_feed)
        self.tuneranker = bool(getattr(self.model, "tuneranker", 0))

    post_init_state = RerankBatcher.post_init_state

    def _feed(self, arrays, idx):
        feed = super()._feed(arrays, idx)
        if self.tuneranker:
            return feed  # see RerankBatcher._feed
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


# ---------------------------------------------------------------------------
# Knowledge-aware batchers
# ---------------------------------------------------------------------------


def _kg_corruption(batcher, arrays, idx, key, swap_feed: bool = False):
    """4-column TransE corruption (h,h,h,h') x (t,t,t',t), negatives
    rejection-sampled on device against the packed triplet set
    (reference CFKG.Dataset / Chorus.Dataset.actions_before_epoch).
    swap_feed reverses head/tail in the FEED (Chorus stage-1 trains the
    inverse relations is_complement_of / is_substitute_of,
    reference Chorus.py:205-210)."""
    from rechorus_tpu.ops import kg as kg_ops

    h = arrays["kg_head"][idx]
    r = arrays["kg_relation"][idx]
    t = arrays["kg_tail"][idx]
    neg_heads, neg_tails = kg_ops.sample_kg_negatives(
        key, h, r, t, arrays["_triplet_keys"],
        batcher.corpus.n_relations, batcher.corpus.n_entities,
        hi_tail=batcher.kg_neg_hi, hi_head=batcher.kg_neg_hi,
    )
    head_id = jnp.stack([h, h, h, neg_heads], axis=1)
    tail_id = jnp.stack([t, t, neg_tails, t], axis=1)
    relation_id = jnp.broadcast_to(r[:, None], (r.shape[0], 4))
    if swap_feed:
        head_id, tail_id = tail_id, head_id
    return {"head_id": head_id, "tail_id": tail_id, "relation_id": relation_id,
            "batch_size": h.shape[0]}


@register_batcher("cfkg")
class CFKGBatcher(Batcher):
    """CFKG: train rows = KG triplets + 'buy' interactions (relation 0);
    eval = user-head, relation 0, candidate tails. Entity indexing in the
    FEED: users first, then entities (+n_users offsets applied here,
    reference CFKG.Dataset._get_feed_dict).

    Deviation noted for parity: for relation>0 rows the reference's
    initial neg_tail draw is U[1, n_items) but resamples land in
    U[1, n_entities) (CFKG.py actions_before_epoch) -- we sample both
    uniformly from U[1, n_entities), the distribution its loop converges
    to.
    """

    def build(self):
        df = self.corpus.data_df[self.phase]
        self.n_users = self.corpus.n_users
        if self.phase == "train":
            rel = self.corpus.relation_df
            inter = df
            self.arrays["kg_head"] = np.concatenate(
                [rel["head"].to_numpy(), inter["user_id"].to_numpy()]).astype(np.int32)
            self.arrays["kg_tail"] = np.concatenate(
                [rel["tail"].to_numpy(), inter["item_id"].to_numpy()]).astype(np.int32)
            self.arrays["kg_relation"] = np.concatenate(
                [rel["relation"].to_numpy(), np.zeros(len(inter))]).astype(np.int32)
            self.arrays["_triplet_keys"] = self.corpus.member_table()
            self.arrays["_clicked"] = self.corpus.clicked_matrix(include_residual=False)
            self.n = len(self.arrays["kg_head"])
        else:
            self.n = len(df)
            self.arrays["user_id"] = df["user_id"].to_numpy().astype(np.int32)
            self.arrays["target_item"] = df["item_id"].to_numpy().astype(np.int32)
            self.test_all = bool(getattr(self.model, "test_all", 0))
            if not self.test_all:
                self.arrays["neg_items"] = np.stack(df["neg_items"].to_list()).astype(np.int32)
            else:
                self.arrays["_clicked_all"] = self.corpus.clicked_matrix(include_residual=True)

    def train_feed(self, arrays, idx, key):
        from rechorus_tpu.ops import kg as kg_ops

        h = arrays["kg_head"][idx]
        r = arrays["kg_relation"][idx]
        t = arrays["kg_tail"][idx]
        is_buy = r == 0
        B = h.shape[0]
        n_users, n_items = self.corpus.n_users, self.corpus.n_items
        n_entities, n_rel = self.corpus.n_entities, self.corpus.n_relations
        clicked = arrays["_clicked"]
        keys = arrays["_triplet_keys"]

        def in_clicked(users, cand):
            rows = clicked[jnp.clip(users, 0, n_users - 1)]
            return (cand[:, None] == rows).any(axis=-1)

        def resample(key, bad_fn, buy_hi):
            def draw(sub):
                raw = jax.random.randint(sub, (B,), 1, n_entities, dtype=jnp.int32)
                buy = 1 + (raw - 1) % (buy_hi - 1)
                return jnp.where(is_buy, buy, raw)

            return sampling.first_accepted(key, draw, bad_fn, rounds=8)

        k1, k2 = jax.random.split(key)
        # neg tail: buy rows avoid the head-user's clicked items; KG rows
        # avoid existing (h, r, t') triplets
        neg_tails = resample(
            k1,
            lambda c: jnp.where(is_buy, in_clicked(h, c),
                                kg_ops.is_member(keys, h, r, c, n_rel, n_entities)),
            n_items,
        )
        # neg head: buy rows pick a user u' whose clicked set excludes t;
        # KG rows avoid (h', r, t)
        neg_heads = resample(
            k2,
            lambda c: jnp.where(is_buy, in_clicked(c, t),
                                kg_ops.is_member(keys, c, r, t, n_rel, n_entities)),
            n_users,
        )
        head_id = jnp.stack([h, h, h, neg_heads], axis=1)
        tail_id = jnp.stack([t, t, neg_tails, t], axis=1) + n_users
        head_id = jnp.where((r > 0)[:, None], head_id + n_users, head_id)
        relation_id = jnp.broadcast_to(r[:, None], (B, 4))
        return {"head_id": head_id, "tail_id": tail_id, "relation_id": relation_id,
                "batch_size": B}

    def eval_feed(self, arrays, idx, cands=None):
        users = arrays["user_id"][idx]
        target = arrays["target_item"][idx]
        B = users.shape[0]
        if getattr(self, "test_all", False):
            tails = cands if cands is not None else jnp.broadcast_to(
                jnp.arange(self.corpus.n_items, dtype=jnp.int32)[None, :],
                (B, self.corpus.n_items))
            feed = {"_clicked_rows": arrays["_clicked_all"][users], "_target": target}
        else:
            tails = jnp.concatenate([target[:, None], arrays["neg_items"][idx]], axis=1)
            feed = {}
        feed.update({
            "head_id": jnp.broadcast_to(users[:, None], tails.shape),
            "tail_id": tails + self.corpus.n_users,
            "relation_id": jnp.zeros_like(tails),
            "batch_size": B,
        })
        return feed


@register_batcher("slrc")
class SLRCBatcher(SequentialBatcher):
    """Sequential feeds + [B, C, R] relational_interval computed on device
    (reference SLRCPlus.Dataset._get_feed_dict python loops)."""

    include_repeat = True

    def build(self):
        super().build()
        self.arrays["time"] = self._df["time"].to_numpy().astype(np.int64)
        self.arrays["_triplet_keys"] = self.corpus.member_table()
        if self.phase != "train" and not getattr(self, "test_all", False):
            # eval candidates are static -> compute [n, C, R] intervals ONCE
            # instead of per-epoch inside the eval scan
            self.arrays["relational_interval"] = self._precompute_eval_intervals()
        elif self.phase == "train":
            # the TARGET column is static too; per-step KG probing is then
            # only needed for the sampled negatives
            self.arrays["_target_interval"] = self._precompute_intervals(
                self.arrays["target_item"][:, None])

    def _interval_fn(self, history, his_times, now, items, keys):
        from rechorus_tpu.ops import kg as kg_ops

        return kg_ops.relational_intervals(
            history, his_times, now, items, keys,
            self.corpus.n_relations, self.corpus.n_entities,
            float(self.model.time_scalar), self.include_repeat,
            query_relations=self.model.relation_num,
        )

    def _precompute_eval_intervals(self) -> np.ndarray:
        items = np.concatenate(
            [self.arrays["target_item"][:, None], self.arrays["neg_items"]], axis=1)
        return self._precompute_intervals(items)

    def _precompute_intervals(self, items: np.ndarray) -> np.ndarray:
        keys = jnp.asarray(self.arrays["_triplet_keys"])
        f = jax.jit(lambda h, ht, now, it: self._interval_fn(h, ht, now, it, keys))
        out, B = [], 1024
        for s in range(0, self.n, B):
            e = min(s + B, self.n)
            out.append(np.asarray(f(
                jnp.asarray(self.arrays["history_items"][s:e]),
                jnp.asarray(self.arrays["history_times"][s:e]),
                jnp.asarray(self.arrays["time"][s:e]),
                jnp.asarray(items[s:e]))))
        return np.concatenate(out, axis=0)

    def _add_interval(self, feed, arrays, idx):
        if "relational_interval" in arrays:
            feed["relational_interval"] = arrays["relational_interval"][idx]
        else:
            feed["relational_interval"] = self._interval_fn(
                feed["history_items"], feed["history_times"], arrays["time"][idx],
                feed["item_id"], arrays["_triplet_keys"])
        return feed

    def train_feed(self, arrays, idx, key):
        feed = super().train_feed(arrays, idx, key)
        if "_target_interval" in arrays:
            neg_int = self._interval_fn(
                feed["history_items"], feed["history_times"], arrays["time"][idx],
                feed["item_id"][:, 1:], arrays["_triplet_keys"])
            feed["relational_interval"] = jnp.concatenate(
                [arrays["_target_interval"][idx], neg_int], axis=1)
            return feed
        return self._add_interval(feed, arrays, idx)

    def eval_feed(self, arrays, idx, cands=None):
        return self._add_interval(super().eval_feed(arrays, idx, cands), arrays, idx)


@register_batcher("chorus")
class ChorusBatcher(SLRCBatcher):
    """Stage 1 train: TransE corruption over reversed relation triplets;
    otherwise sequential + relational_interval (no repeat relation) +
    per-candidate category_id (reference Chorus.Dataset)."""

    include_repeat = False

    def build(self):
        self.kg_train = self.model.stage == 1 and self.phase == "train"
        if self.kg_train:
            rel = self.corpus.relation_df
            self.arrays["kg_head"] = rel["head"].to_numpy().astype(np.int32)
            self.arrays["kg_tail"] = rel["tail"].to_numpy().astype(np.int32)
            self.arrays["kg_relation"] = rel["relation"].to_numpy().astype(np.int32)
            self.arrays["_triplet_keys"] = self.corpus.member_table()
            self.kg_neg_hi = self.corpus.n_items
            self.n = len(rel)
            return
        super().build()
        cate = np.zeros(self.corpus.n_items, dtype=np.int32)
        col = self.model.category_col
        if col:
            meta = self.corpus.item_meta_df
            cate[meta["item_id"].to_numpy()] = meta[col].to_numpy().astype(np.int32)
        self.arrays["_item2cate"] = cate

    def train_feed(self, arrays, idx, key):
        if self.kg_train:
            return _kg_corruption(self, arrays, idx, key, swap_feed=True)
        feed = super().train_feed(arrays, idx, key)
        feed["category_id"] = arrays["_item2cate"][feed["item_id"]]
        return feed

    def eval_feed(self, arrays, idx, cands=None):
        feed = super().eval_feed(arrays, idx, cands)
        feed["category_id"] = arrays["_item2cate"][feed["item_id"]]
        return feed


@register_batcher("kda")
class KDABatcher(SequentialBatcher):
    """KDA feeds: sequential + per-candidate relation-value entities
    (item_val [B,C,R]), log-normalized history time deltas, and a per-row
    DistMult KG batch with mixed head/tail corruption.

    Parity: reference KDA.Dataset (KDA.py:192-263). The reference samples
    the epoch's KG rows + negatives on host (actions_before_epoch); here
    one uniform triplet + its corruptions are drawn per step on device.
    """

    def build(self):
        super().build()
        self.arrays["time"] = self._df["time"].to_numpy().astype(np.int64)
        self.arrays["_item_val"] = self.corpus.item_value_matrix()
        if self.phase == "train":
            rel = self.corpus.relation_df
            self.arrays["kg_head"] = rel["head"].to_numpy().astype(np.int32)
            self.arrays["kg_tail"] = rel["tail"].to_numpy().astype(np.int32)
            self.arrays["kg_relation"] = rel["relation"].to_numpy().astype(np.int32)
            self.arrays["_triplet_keys"] = self.corpus.member_table()
            mat, lens = self.corpus.share_attr_matrix()
            self.arrays["_share_mat"] = mat
            self.arrays["_share_len"] = lens

    def _common(self, feed, arrays, idx):
        feed["item_val"] = arrays["_item_val"][feed["item_id"]]  # [B, C, R]
        dt = (arrays["time"][idx][:, None] - feed["history_times"]).astype(jnp.float32)
        # norm_time (reference KDAReader.py:33-37)
        feed["history_delta_t"] = jnp.maximum(
            jnp.log2(dt / self.model.t_scalar + 1e-6), 0.0)
        return feed

    def _sample_kg_block(self, arrays, kg_key, M: int):
        """One DistMult KG row + mixed head/tail corruptions per train
        row, vectorized over M rows (reference KDA.Dataset.
        actions_before_epoch samples the epoch's whole block at once;
        this is its device-side equivalent). Returns dict of [M, ...]."""
        from rechorus_tpu.ops import kg as kg_ops

        n_items = self.corpus.n_items
        n_rel, n_ent = self.corpus.n_relations, self.corpus.n_entities
        keys_arr = arrays["_triplet_keys"]
        N = self.model.num_neg
        k1, k2, k3, k4, k5 = jax.random.split(kg_key, 5)

        tri = jax.random.randint(k1, (M,), 0, len(self.arrays["kg_head"]), dtype=jnp.int32)
        h = arrays["kg_head"][tri]
        t = arrays["kg_tail"][tri]
        r = arrays["kg_relation"][tri]
        is_attr = t >= n_items
        val = jnp.where(is_attr, t, 0)
        # attr rows: tail becomes a random item SHARING the attribute
        row = jnp.clip(t - n_items, 0, arrays["_share_mat"].shape[0] - 1)
        j = jax.random.randint(k2, (M,), 0, 1 << 30) % jnp.maximum(arrays["_share_len"][row], 1)
        t_item = jnp.where(is_attr, arrays["_share_mat"][row, j], t)

        def resample(key, bad_fn):
            return sampling.first_accepted(
                key,
                lambda k: jax.random.randint(k, (M, N), 1, n_items, dtype=jnp.int32),
                bad_fn, rounds=8)

        # negative heads: (h', r, tail-or-val) must not exist
        probe_t = jnp.where(is_attr, val, t_item)
        neg_head_cand = resample(
            k3, lambda c: kg_ops.is_member(keys_arr, c, r[:, None], probe_t[:, None], n_rel, n_ent))
        # negative tails: item-item rows probe (h, r, t'); attr rows probe
        # (t', r, val) -- the corrupted item must not share the attribute
        neg_tail_cand = resample(
            k4, lambda c: jnp.where(
                is_attr[:, None],
                kg_ops.is_member(keys_arr, c, r[:, None], val[:, None], n_rel, n_ent),
                kg_ops.is_member(keys_arr, h[:, None], r[:, None], c, n_rel, n_ent)))
        choose_head = jax.random.uniform(k5, (M, N)) < self.model.neg_head_p
        neg_heads = jnp.where(choose_head, neg_head_cand, h[:, None])
        neg_tails = jnp.where(choose_head, t_item[:, None], neg_tail_cand)

        return {
            "head_id": jnp.concatenate([h[:, None], neg_heads], axis=1),
            "tail_id": jnp.concatenate([t_item[:, None], neg_tails], axis=1),
            "relation_id": r,
            "value_id": val,
        }

    def epoch_arrays(self, arrays, key):
        """Hoist BOTH samplers to one per-epoch program: the per-step
        [rounds+1, B] cuckoo-membership gathers and their 8 MB
        member-table VMEM staging were ~25% of the KDA step (docs/PERF.md
        r4 trace); batched per epoch they run once at [rounds+1, n]."""
        if self.phase != "train":
            return {}
        _, kg_key = jax.random.split(key)
        # rec negatives stay per-step: hoisting them turns the clicked-set
        # collision compare into one epoch-wide [rounds+1, n, M] op whose
        # HBM traffic cannot hide behind step compute (measured +hoist
        # regression, docs/PERF.md r4); the KG cuckoo probes are the ones
        # whose per-step staging dominated.
        return {"_ep_kg_" + k: v
                for k, v in self._sample_kg_block(arrays, kg_key, self.n).items()}

    def train_feed(self, arrays, idx, key):
        key, kg_key = jax.random.split(key)
        feed = self._common(super().train_feed(arrays, idx, key), arrays, idx)
        if "_ep_kg_head_id" in arrays:  # epoch_arrays-hoisted lane
            for k in ("head_id", "tail_id", "relation_id", "value_id"):
                feed[k] = arrays["_ep_kg_" + k][idx]
            return feed
        # fallback (non-epoch_fn callers, e.g. the packed-lane trace probe)
        feed.update(self._sample_kg_block(arrays, kg_key, feed["user_id"].shape[0]))
        return feed

    def eval_feed(self, arrays, idx, cands=None):
        return self._common(super().eval_feed(arrays, idx, cands), arrays, idx)


@register_batcher("tisas")
class TiSASBatcher(SequentialBatcher):
    """Sequential + per-user minimum time interval (reference
    TiSASRec.py:48-53 computes it over each user's full interaction
    timeline; the feed carries it per row)."""

    def build(self):
        super().build()
        mins = {}
        for u, user_df in self.corpus.all_df.groupby("user_id"):
            ts = np.sort(user_df["time"].to_numpy())
            d = np.diff(ts)
            d = d[d > 0]
            mins[u] = int(d.min()) if len(d) else 0xFFFFFFFF
        users = self._df["user_id"].to_numpy()
        self.arrays["user_min_intervals"] = np.asarray(
            [mins[u] for u in users], dtype=np.int64)

    def train_feed(self, arrays, idx, key):
        feed = super().train_feed(arrays, idx, key)
        feed["user_min_intervals"] = arrays["user_min_intervals"][idx]
        return feed

    def eval_feed(self, arrays, idx, cands=None):
        feed = super().eval_feed(arrays, idx, cands)
        feed["user_min_intervals"] = arrays["user_min_intervals"][idx]
        return feed


def _beta_augment(key, hist, lengths, a, b, mask_token):
    """One augmented view of a padded history batch: 50/50 mask_op /
    reorder_op with Beta(a,b)-sampled ratios over the VALID prefix
    (reference ContraRec.Dataset, ContraRec.py:106-140), fully on device."""
    B, H = hist.shape
    kc, kr, km, ks, kp = jax.random.split(key, 5)
    pos = jnp.arange(H)[None, :]
    valid = pos < lengths[:, None]
    ratio = jax.random.beta(kr, a, b, (B,))

    # mask_op: mask floor(len*ratio) uniformly-chosen valid positions
    k = jnp.floor(lengths * ratio).astype(jnp.int32)
    scores = jax.random.uniform(km, (B, H)) + (~valid) * 2.0
    rank = jnp.argsort(jnp.argsort(scores, axis=-1), axis=-1)
    masked = jnp.where((rank < k[:, None]) & valid, mask_token, hist)

    # reorder_op: shuffle a random contiguous span of length floor(len*ratio)
    slen = jnp.floor(lengths * ratio).astype(jnp.int32)
    start = jnp.floor(jax.random.uniform(ks, (B,)) *
                      (lengths - slen + 1).astype(jnp.float32)).astype(jnp.int32)
    in_span = (pos >= start[:, None]) & (pos < (start + slen)[:, None]) & valid
    rand_key = start[:, None] + jax.random.uniform(kp, (B, H)) * slen[:, None]
    sort_key = jnp.where(in_span, rand_key, pos.astype(jnp.float32))
    order = jnp.argsort(sort_key, axis=-1)
    reordered = jnp.take_along_axis(hist, order, axis=-1)

    choose_mask = jax.random.uniform(kc, (B,)) > 0.5
    return jnp.where(choose_mask[:, None], masked, reordered)


@register_batcher("contra")
class ContraBatcher(SequentialBatcher):
    """Sequential + two on-device augmented history views for ContraRec's
    context-context contrast."""

    def train_feed(self, arrays, idx, key):
        key, ka, kb = jax.random.split(key, 3)
        feed = super().train_feed(arrays, idx, key)
        mt = self.corpus.n_items  # mask token
        feed["history_items_a"] = _beta_augment(
            ka, feed["history_items"], feed["lengths"],
            float(self.model.beta_a), float(self.model.beta_b), mt)
        feed["history_items_b"] = _beta_augment(
            kb, feed["history_items"], feed["lengths"],
            float(self.model.beta_a), float(self.model.beta_b), mt)
        return feed


@register_batcher("contra_kda")
class ContraKDABatcher(KDABatcher):
    """KDA feeds + two augmented history views for ContraKDA's
    context-context contrast. Masked positions become pad id 0 (the
    entity table has no spare mask row), i.e. item-dropout views."""

    def train_feed(self, arrays, idx, key):
        key, ka, kb = jax.random.split(key, 3)
        feed = super().train_feed(arrays, idx, key)
        feed["history_items_a"] = _beta_augment(
            ka, feed["history_items"], feed["lengths"],
            float(self.model.beta_a), float(self.model.beta_b), 0)
        feed["history_items_b"] = _beta_augment(
            kb, feed["history_items"], feed["lengths"],
            float(self.model.beta_a), float(self.model.beta_b), 0)
        return feed


@register_batcher("seq_delta")
class SeqDeltaBatcher(SequentialBatcher):
    """Sequential + log-normalized history age (FourierTA feeds,
    reference FourierTA.Dataset + KDAReader.norm_time)."""

    def build(self):
        super().build()
        self.arrays["time"] = self._df["time"].to_numpy().astype(np.int64)

    def _delta(self, feed, arrays, idx):
        dt = (arrays["time"][idx][:, None] - feed["history_times"]).astype(jnp.float32)
        feed["history_delta_t"] = jnp.maximum(
            jnp.log2(dt / self.model.t_scalar + 1e-6), 0.0)
        return feed

    def train_feed(self, arrays, idx, key):
        return self._delta(super().train_feed(arrays, idx, key), arrays, idx)

    def eval_feed(self, arrays, idx, cands=None):
        return self._delta(super().eval_feed(arrays, idx, cands), arrays, idx)


@register_batcher("s3rec")
class S3RecBatcher(SequentialBatcher):
    """Stage-1 pretrain rows = max_his-chunked user sequences with
    on-device MIP masking + SP segment sampling (reference S3Rec.Dataset,
    S3Rec.py:117-183); otherwise plain sequential."""

    def build(self):
        self.pre_train = self.model.stage == 1 and self.phase == "train"
        if not self.pre_train:
            super().build()
            return
        H = self.model.history_max
        long_seq, rows, lens = [], [], []
        for seq in self.corpus.user_his.values():
            items = [x[0] for x in seq]
            long_seq.extend(items)
            for i in range((len(items) - 1) // H + 1):
                chunk = items[i * H: (i + 1) * H]
                rows.append(chunk + [0] * (H - len(chunk)))
                lens.append(len(chunk))
        self.n = len(rows)
        self.arrays["item_seq"] = np.asarray(rows, dtype=np.int32)
        self.arrays["seq_len"] = np.asarray(lens, dtype=np.int32)
        self.arrays["long_seq"] = np.asarray(long_seq, dtype=np.int32)

    def train_feed(self, arrays, idx, key):
        if not self.pre_train:
            return super().train_feed(arrays, idx, key)
        seq = arrays["item_seq"][idx]  # [B, H]
        seq_len = arrays["seq_len"][idx]
        B, H = seq.shape
        mask_token = self.corpus.n_items
        n_items = self.corpus.n_items
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        pos = jnp.arange(H)[None, :]
        valid = pos < seq_len[:, None]

        # ---- MIP: mask random valid positions, sample neg items not in seq
        mip_sel = (jax.random.uniform(k1, (B, H)) < self.model.mask_ratio) & valid
        mask_seq = jnp.where(mip_sel, mask_token, seq)

        def bad(c):  # negative must not appear anywhere in the row's seq
            return (c[:, :, None] == seq[:, None, :]).any(-1)

        neg = sampling.first_accepted(
            k2,
            lambda k: jax.random.randint(k, (B, H), 1, n_items, dtype=jnp.int32),
            bad, rounds=8)
        neg_item = jnp.where(mip_sel, neg, seq)

        # ---- SP: mask a contiguous segment; neg segment from the global stream
        ks1, ks2, ks3 = jax.random.split(k3, 3)
        half = jnp.maximum(seq_len // 2, 1)
        sample_len = 1 + (jax.random.randint(ks1, (B,), 0, 1 << 30) % half)
        start = jax.random.randint(ks2, (B,), 0, 1 << 30) % jnp.maximum(seq_len - sample_len, 1)
        n_long = arrays["long_seq"].shape[0]
        neg_start = jax.random.randint(ks3, (B,), 0, 1 << 30) % jnp.maximum(n_long - H, 1)
        in_span = (pos >= start[:, None]) & (pos < (start + sample_len)[:, None]) & valid
        trivial = (seq_len < 2)[:, None]  # len<2: keep copies (reference :151)
        mask_seg_seq = jnp.where(in_span & ~trivial, mask_token, seq)
        pos_seg = jnp.where((in_span | ~valid) | trivial, seq, mask_token)
        neg_items_gathered = arrays["long_seq"][
            jnp.clip(neg_start[:, None] + (pos - start[:, None]), 0, n_long - 1)]
        neg_seg = jnp.where(in_span & ~trivial, neg_items_gathered, pos_seg)

        return {
            "mask_seq": mask_seq, "pos_item": seq, "neg_item": neg_item,
            "mask_seg_seq": mask_seg_seq, "pos_seg": pos_seg, "neg_seg": neg_seg,
            "seq_len": seq_len, "batch_size": B,
        }
