"""Readers: host-side CSV -> frozen in-memory corpus.

Contract parity with the reference (src/helpers/BaseReader.py,
SeqReader.py): readers expose `data_df{train,dev,test}` (pandas),
`n_users`/`n_items` (= max id + 1), `train_clicked_set` /
`residual_clicked_set` per user, and (SeqReader) `user_his` +
per-row `position`.

TPU-first additions: every reader also materializes *fixed-shape numpy
arrays* (`seq_arrays()`, `clicked_matrix()`) that runners place on device
once -- the batch pipeline then assembles feeds by index gather inside
jitted steps instead of torch DataLoader worker processes.
"""
from __future__ import annotations

import ast
import logging
import os
from typing import Dict

import numpy as np
import pandas as pd


def _fast_parse_list_column(values) -> list:
    """Vectorized parse of a '[1, 2, 3]'-style string column: one big
    comma-join + np.fromstring instead of per-row ast.literal_eval
    (~40x on 100k x 99 neg_items columns). Returns a list of np row
    views into one [n, K] matrix when rows have uniform length, else
    per-row arrays. Raises ValueError on anything np.fromstring can't
    take (nested lists, strings) -- caller falls back to literal_eval."""
    stripped = [s.strip()[1:-1] for s in values]
    counts = np.fromiter((s.count(",") + 1 if s.strip() else 0 for s in stripped),
                         dtype=np.int64, count=len(stripped))
    joined = ",".join(s for s in stripped if s.strip())
    dtype = np.float64 if ("." in joined or "e" in joined or "E" in joined) else np.int64
    flat = np.fromstring(joined, dtype=dtype, sep=",") if joined else np.empty(0, dtype)
    if flat.size != counts.sum():
        raise ValueError("unparsed tokens in list column")
    if len(counts) and (counts == counts[0]).all():
        return list(flat.reshape(len(counts), -1))
    offsets = np.concatenate([[0], np.cumsum(counts)])
    return [flat[offsets[r]: offsets[r + 1]] for r in range(len(counts))]


def eval_list_columns(df: pd.DataFrame) -> pd.DataFrame:
    """Parse list-valued string columns (e.g. neg_items) into np arrays.

    Parity: reference src/utils/utils.py:47-51 (which uses eval(); we use
    a vectorized numeric parse with an ast.literal_eval fallback -- same
    accepted grammar, no code execution).
    """
    import warnings

    for col in df.columns:
        if pd.api.types.is_object_dtype(df[col]) or isinstance(df[col].dtype, pd.StringDtype):
            first = df[col].iloc[0] if len(df) else None
            if isinstance(first, str) and first.strip().startswith("["):
                try:
                    with warnings.catch_warnings():
                        warnings.simplefilter("ignore", DeprecationWarning)
                        parsed = _fast_parse_list_column(df[col].to_numpy())
                    # assign via a pre-built object array: a bare list of
                    # np rows makes pandas re-coerce element-wise (slow)
                    holder = np.empty(len(parsed), dtype=object)
                    holder[:] = parsed
                    df[col] = holder
                except (ValueError, TypeError):
                    df[col] = df[col].apply(lambda x: np.array(ast.literal_eval(x)))
    return df


class BaseReader:
    """Top-k general reader. Parity: src/helpers/BaseReader.py."""

    @staticmethod
    def parse_data_args(parser):
        parser.add_argument("--path", type=str, default="data/", help="Input data dir.")
        parser.add_argument("--dataset", type=str, default="Grocery_and_Gourmet_Food", help="Choose a dataset.")
        parser.add_argument("--sep", type=str, default="\t", help="sep of csv file.")
        parser.add_argument("--csv_chunksize", type=int, default=0,
                            help="Read split CSVs in chunks of this many rows "
                                 "(0 = whole-file). Bounds the parse-time peak "
                                 "RSS on corpora with hundreds of millions of "
                                 "rows; the assembled corpus arrays are compact "
                                 "numpy either way.")
        return parser

    def __init__(self, args):
        self.sep = args.sep
        self.prefix = args.path
        self.dataset = args.dataset
        self.csv_chunksize = int(getattr(args, "csv_chunksize", 0) or 0)
        self._read_data()
        self._build_clicked_sets()

    def _build_clicked_sets(self):
        """CSR clicked sets (one vectorized unique per split group)
        replacing the reference's dict-of-set build loop
        (BaseReader.py:30-41). `train_clicked_set[u]` is the sorted
        unique item-id array u clicked in train; `residual_clicked_set`
        the same over dev+test."""
        from rechorus_tpu.data.csr import CSRRows, pairs_to_csr

        tr = self.data_df["train"]
        flat, off = pairs_to_csr(tr["user_id"].to_numpy(), tr["item_id"].to_numpy(),
                                 self.n_users, unique=True)
        self.train_clicked_set = CSRRows(flat.astype(np.int32), off)
        res_u = np.concatenate([self.data_df[k]["user_id"].to_numpy() for k in ("dev", "test")])
        res_i = np.concatenate([self.data_df[k]["item_id"].to_numpy() for k in ("dev", "test")])
        flat, off = pairs_to_csr(res_u, res_i, self.n_users, unique=True)
        self.residual_clicked_set = CSRRows(flat.astype(np.int32), off)

    def _read_csv(self, path: str) -> pd.DataFrame:
        if not self.csv_chunksize:
            return pd.read_csv(path, sep=self.sep)
        chunks = [eval_list_columns(c) for c in
                  pd.read_csv(path, sep=self.sep, chunksize=self.csv_chunksize)]
        return pd.concat(chunks, ignore_index=True)

    def _read_data(self):
        logging.info('Reading data from "{}", dataset = "{}" '.format(self.prefix, self.dataset))
        self.data_df = dict()
        for key in ["train", "dev", "test"]:
            path = os.path.join(self.prefix, self.dataset, key + ".csv")
            self.data_df[key] = (
                self._read_csv(path).reset_index(drop=True).sort_values(by=["user_id", "time"])
            )
            self.data_df[key] = eval_list_columns(self.data_df[key])

        logging.info("Counting dataset statistics...")
        key_columns = ["user_id", "item_id", "time"]
        if "label" in self.data_df["train"].columns:
            key_columns.append("label")
        self.all_df = pd.concat([self.data_df[k][key_columns] for k in ["train", "dev", "test"]])
        self.n_users = int(self.all_df["user_id"].max()) + 1
        self.n_items = int(self.all_df["item_id"].max()) + 1
        for key in ["dev", "test"]:
            if "neg_items" in self.data_df[key]:
                col = self.data_df[key]["neg_items"]
                worst = max((int(np.max(a)) for a in col if np.size(a)), default=0)
                assert worst < self.n_items, "negative items include unseen ids"
        logging.info(
            '"# user": {}, "# item": {}, "# entry": {}'.format(self.n_users - 1, self.n_items - 1, len(self.all_df))
        )
        if "label" in key_columns:
            positive_num = int((self.all_df.label == 1).sum())
            logging.info(
                '"# positive interaction": {} ({:.1f}%)'.format(positive_num, positive_num / self.all_df.shape[0] * 100)
            )

    # ---------------- TPU-first fixed-shape corpus arrays ----------------

    def _history_views(self):
        from rechorus_tpu.data.csr import CSRRows

        if isinstance(self.user_his, CSRRows):
            return self.user_his  # rows are already [L, 2] int64 views
        if not hasattr(self, "_his_np"):
            self._his_np = {u: np.asarray(h, dtype=np.int64) for u, h in self.user_his.items()}
        return self._his_np

    def _history_flat(self):
        """CSR-style flattened per-user histories for the native kernel."""
        from rechorus_tpu.data.csr import CSRRows

        if not hasattr(self, "_his_flat"):
            if isinstance(self.user_his, CSRRows):
                f, offsets = self.user_his.flat, self.user_his.offsets
                self._his_flat = (np.ascontiguousarray(f[:, 0]),
                                  np.ascontiguousarray(f[:, 1]),
                                  np.asarray(offsets, dtype=np.int64))
                return self._his_flat
            offsets = np.zeros(self.n_users + 1, dtype=np.int64)
            for u in range(self.n_users):
                offsets[u + 1] = offsets[u] + len(self.user_his.get(u, ()))
            flat_i = np.zeros(int(offsets[-1]), dtype=np.int64)
            flat_t = np.zeros(int(offsets[-1]), dtype=np.int64)
            for u, h in self.user_his.items():
                if len(h):
                    a = np.asarray(h, dtype=np.int64).reshape(len(h), -1)
                    flat_i[offsets[u]: offsets[u + 1]] = a[:, 0]
                    flat_t[offsets[u]: offsets[u + 1]] = a[:, 1]
            self._his_flat = (flat_i, flat_t, offsets)
        return self._his_flat

    def history_arrays(self, df: pd.DataFrame, history_max: int):
        """Fixed-shape [n_rows, history_max] history items/times + lengths.

        Equivalent of the reference's per-row feed-dict slicing
        (BaseModel.py:236-245): history = user_his[u][:position][-history_max:],
        left-aligned, zero-padded. Uses the C++ kernel
        (native/corpus_ops.cpp) when a compiler is available; numpy
        fallback otherwise.
        """
        users = df["user_id"].to_numpy()
        positions = df["position"].to_numpy()
        from rechorus_tpu import native

        if native.available():
            flat_i, flat_t, offsets = self._history_flat()
            return native.build_history_arrays(
                users, positions, flat_i, flat_t, offsets, history_max)
        n = len(df)
        his_items = np.zeros((n, history_max), dtype=np.int32)
        his_times = np.zeros((n, history_max), dtype=np.int64)
        lengths = np.zeros((n,), dtype=np.int32)
        his_np = self._history_views()
        for r in range(n):
            u, p = users[r], int(positions[r])
            if p <= 0:
                continue
            h = his_np[u][max(0, p - history_max) : p]
            L = len(h)
            his_items[r, :L] = h[:, 0]
            his_times[r, :L] = h[:, 1]
            lengths[r] = L
        return his_items, his_times, lengths

    def clicked_matrix(self, include_residual: bool = False) -> np.ndarray:
        """Padded per-user clicked-item matrix [n_users, max_clicked] int32.

        Pad value 0 (item ids are >= 1). Used for device-side rejection
        sampling of negatives and for test_all masking, replacing the
        reference's python-set membership loops (BaseModel.py:206-214,
        BaseRunner.py:244-251).
        """
        from rechorus_tpu.data.csr import CSRRows, csr_fill_matrix, pairs_to_csr

        def _as_csr(mapping) -> CSRRows:
            if isinstance(mapping, CSRRows):
                return mapping
            # dict-of-set subclasses (e.g. ImpressionContextReader's
            # label-aware rebuild) and pre-CSR corpus pickles
            users = np.fromiter((u for u, s in mapping.items() for _ in s), np.int64)
            items = np.fromiter((i for s in mapping.values() for i in s), np.int64)
            flat, off = pairs_to_csr(users, items, self.n_users, unique=True)
            return CSRRows(flat.astype(np.int32), off)

        train = _as_csr(self.train_clicked_set)
        if include_residual:
            res = _as_csr(self.residual_clicked_set)
            users = np.concatenate([
                np.repeat(np.arange(self.n_users), np.diff(train.offsets)),
                np.repeat(np.arange(self.n_users), np.diff(res.offsets)),
            ])
            flat, offsets = pairs_to_csr(users, np.concatenate([train.flat, res.flat]),
                                         self.n_users, unique=True)
        else:
            flat, offsets = train.flat, train.offsets
        max_len = max(1, int(np.diff(offsets).max()))
        from rechorus_tpu import native

        if native.available():
            return native.fill_clicked_matrix(np.asarray(flat, dtype=np.int64),
                                              np.asarray(offsets, dtype=np.int64),
                                              self.n_users, max_len)
        return csr_fill_matrix(flat, offsets, max_len)


class ContextReader(BaseReader):
    """Context/CTR reader: item/user metadata + feature vocab sizes.

    Parity: src/helpers/ContextReader.py -- feature name conventions
    i_*/u_*/c_* with suffix _c categorical / _f float (data/README.md:
    47-60); feature_max[f] = vocab size across splits.
    """

    @staticmethod
    def parse_data_args(parser):
        parser.add_argument("--include_item_features", type=int, default=0,
                            help="Whether include item context features (0 or 1).")
        parser.add_argument("--include_user_features", type=int, default=0,
                            help="Whether include user context features (0 or 1).")
        parser.add_argument("--include_situation_features", type=int, default=0,
                            help="Whether include situation (i.e., dynamic context) features (0 or 1).")
        return BaseReader.parse_data_args(parser)

    def __init__(self, args):
        super().__init__(args)
        self.include_item_features = args.include_item_features
        self.include_user_features = args.include_user_features
        self.include_situation_features = args.include_situation_features
        self._load_ui_metadata()
        self._collect_context()

    def _load_ui_metadata(self):
        self.item_meta_df, self.user_meta_df = None, None
        item_meta_path = os.path.join(self.prefix, self.dataset, "item_meta.csv")
        user_meta_path = os.path.join(self.prefix, self.dataset, "user_meta.csv")
        if os.path.exists(item_meta_path) and self.include_item_features:
            self.item_meta_df = pd.read_csv(item_meta_path, sep=self.sep)
            self.item_feature_names = sorted([c for c in self.item_meta_df.columns if c[:2] == "i_"])
        else:
            self.item_feature_names = []
        if os.path.exists(user_meta_path) and self.include_user_features:
            self.user_meta_df = pd.read_csv(user_meta_path, sep=self.sep)
            self.user_feature_names = sorted([c for c in self.user_meta_df.columns if c[:2] == "u_"])
        else:
            self.user_feature_names = []
        if self.include_situation_features:
            self.situation_feature_names = sorted([c for c in self.data_df["train"].columns if c[:2] == "c_"])
        else:
            self.situation_feature_names = []

    def _collect_context(self):
        logging.info("Collect context features...")
        id_columns = ["user_id", "item_id"]
        self.item_features, self.user_features = None, None
        self.feature_max = dict()
        for key in ["train", "dev", "test"]:
            ids_df = self.data_df[key][id_columns]
            for f in id_columns:
                self.feature_max[f] = max(self.feature_max.get(f, 0), int(ids_df[f].max()) + 1)
            if self.include_situation_features and len(self.situation_feature_names):
                context_df = self.data_df[key][self.situation_feature_names]
                for f in self.situation_feature_names:
                    self.feature_max[f] = max(self.feature_max.get(f, 0), int(context_df[f].max()) + 1)
        if self.item_meta_df is not None and self.include_item_features:
            item_df = self.item_meta_df[["item_id"] + self.item_feature_names]
            self.item_features = item_df.set_index("item_id").to_dict(orient="index")
            for f in self.item_feature_names:
                self.feature_max[f] = max(self.feature_max.get(f, 0), int(item_df[f].max()) + 1)
            logging.info("# Item Features: %d" % (item_df.shape[1]))
        if self.user_meta_df is not None and self.include_user_features:
            user_df = self.user_meta_df[["user_id"] + self.user_feature_names].set_index("user_id")
            self.user_features = user_df.to_dict(orient="index")
            for f in self.user_feature_names:
                self.feature_max[f] = max(self.feature_max.get(f, 0), int(user_df[f].max()) + 1)
            logging.info("# User Features: %d" % (user_df.shape[1]))


class SeqReader(BaseReader):
    """Sequential reader: global time-sorted history + per-row position.

    Parity: src/helpers/SeqReader.py (mergesort for stability).
    """

    def __init__(self, args):
        super().__init__(args)
        self._append_his_info()

    def _append_his_info(self):
        """Vectorized global-time history build (one lexsort + one stable
        argsort; no python loop, no merge). Semantics match the reference
        (SeqReader.py:20-32): rows sorted by (time, user) stably, each
        row's `position` = number of that user's earlier rows, user_his
        in time order. Documented deviation: positions are assigned by
        row identity (all_df row r IS split row r), not merged back on
        (user,item,time) -- identical output for unique keys, but the
        reference's merge duplicates rows when a user has two
        interactions with the same item at the same timestamp."""
        logging.info("Appending history info...")
        from rechorus_tpu.data.csr import CSRRows

        u = self.all_df["user_id"].to_numpy(np.int64)
        i = self.all_df["item_id"].to_numpy(np.int64)
        t = self.all_df["time"].to_numpy(np.int64)
        n = len(u)
        order = np.lexsort((u, t))  # stable: primary time, secondary user
        us = u[order]
        sidx = np.argsort(us, kind="stable")  # group by user, keep time order
        counts = np.bincount(us, minlength=self.n_users)
        starts = np.zeros(self.n_users, dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        grp_pos = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
        pos_sorted = np.empty(n, dtype=np.int64)
        pos_sorted[sidx] = grp_pos
        position_all = np.empty(n, dtype=np.int64)
        position_all[order] = pos_sorted
        his_order = order[sidx]
        offsets = np.zeros(self.n_users + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        self.user_his = CSRRows(np.stack([i[his_order], t[his_order]], axis=1), offsets)
        lo = 0
        for key in ["train", "dev", "test"]:
            L = len(self.data_df[key])
            self.data_df[key]["position"] = position_all[lo: lo + L]
            lo += L


class ContextSeqReader(ContextReader):
    """Context + sequential: SeqReader-style history where each entry also
    stores its situation-context vector.

    Parity: src/helpers/ContextSeqReader.py:18-43.
    """

    def __init__(self, args):
        super().__init__(args)
        self._append_his_info()

    def _append_his_info(self):
        """Vectorized twin of SeqReader._append_his_info that also builds
        the per-step situation-context history (`user_his_situ`, CSR
        [T, F]). Parity: reference ContextSeqReader.py:18-43; same
        documented deviation on duplicate (user,item,time) keys as
        SeqReader."""
        logging.info("Appending history info with situation context...")
        from rechorus_tpu.data.csr import CSRRows

        situ = list(self.situation_feature_names)
        u = self.all_df["user_id"].to_numpy(np.int64)
        i = self.all_df["item_id"].to_numpy(np.int64)
        t = self.all_df["time"].to_numpy(np.int64)
        # reindex tolerates splits missing some c_* columns (pad 0 there,
        # where the reference's concat+merge produced NaN)
        situ_vals = (np.concatenate([
            self.data_df[k].reindex(columns=situ, fill_value=0).to_numpy(np.int64)
            for k in ("train", "dev", "test")])
            if situ else np.zeros((len(u), 0), dtype=np.int64))
        n = len(u)
        order = np.lexsort((u, t))
        us = u[order]
        sidx = np.argsort(us, kind="stable")
        counts = np.bincount(us, minlength=self.n_users)
        starts = np.zeros(self.n_users, dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        grp_pos = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
        pos_sorted = np.empty(n, dtype=np.int64)
        pos_sorted[sidx] = grp_pos
        position_all = np.empty(n, dtype=np.int64)
        position_all[order] = pos_sorted
        his_order = order[sidx]
        offsets = np.zeros(self.n_users + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        self.user_his = CSRRows(np.stack([i[his_order], t[his_order]], axis=1), offsets)
        self.user_his_situ = CSRRows(situ_vals[his_order], offsets)
        lo = 0
        for key in ["train", "dev", "test"]:
            L = len(self.data_df[key])
            self.data_df[key]["position"] = position_all[lo: lo + L]
            lo += L

    def history_situ_arrays(self, df: pd.DataFrame, history_max: int) -> np.ndarray:
        """[n_rows, history_max, n_situ_features] per-step situation
        context, gathered in one fancy-index pass over the CSR."""
        from rechorus_tpu.data.csr import CSRRows

        n = len(df)
        F = len(self.situation_feature_names)
        users = df["user_id"].to_numpy(np.int64)
        positions = df["position"].to_numpy(np.int64)
        if not isinstance(self.user_his_situ, CSRRows):  # pre-CSR pickle
            out = np.zeros((n, history_max, F), dtype=np.int64)
            situ_np = {u: np.asarray(v) for u, v in self.user_his_situ.items()}
            for r in range(n):
                u, p = users[r], int(positions[r])
                if p > 0:
                    h = situ_np[u][max(0, p - history_max): p]
                    out[r, : len(h)] = h
            return out
        flat, offsets = self.user_his_situ.flat, self.user_his_situ.offsets
        start = np.maximum(0, positions - history_max)
        lengths = positions - start  # rows with position <= 0 get length <= 0
        idx = offsets[users, None] + start[:, None] + np.arange(history_max)[None, :]
        valid = np.arange(history_max)[None, :] < lengths[:, None]
        gathered = flat[np.clip(idx, 0, max(len(flat) - 1, 0))]
        return np.where(valid[..., None], gathered, 0).astype(np.int64)


class ImpressionReader(BaseReader):
    """Impression reader: consecutive rows of a user with equal
    --impression_idkey form one request with pos_items/neg_items sets.

    Parity: src/helpers/ImpressionReader.py -- requires a label column;
    impressions without positives are dropped, then those without
    negatives (neg_num > 0 filter); the merged sets attach to the last
    row of each group. Deviation: item id 0 entries are filtered out
    directly (the reference truncates each list at the first 0 via
    set-iteration order -- fragile dead code for 1-based ids).
    """

    @staticmethod
    def parse_data_args(parser):
        parser.add_argument("--impression_idkey", type=str, default="time",
                            help="The key for impression identification, [time, impression_id]")
        return BaseReader.parse_data_args(parser)

    def __init__(self, args):
        self.impression_idkey = args.impression_idkey
        super().__init__(args)
        self._append_impression_info()

    def _read_data(self):
        logging.info('Reading data from "{}", dataset = "{}" '.format(self.prefix, self.dataset))
        self.data_df = dict()
        for key in ["train", "dev", "test"]:
            path = os.path.join(self.prefix, self.dataset, key + ".csv")
            self.data_df[key] = (
                self._read_csv(path).reset_index(drop=True)
                .sort_values(by=["user_id", self.impression_idkey], kind="mergesort")
            )
            self.data_df[key] = eval_list_columns(self.data_df[key])
        if "label" not in self.data_df["train"].columns:
            raise KeyError("Impression data must have binary labels")
        key_columns = ["user_id", "item_id", "time", "label"]
        if self.impression_idkey != "time":
            key_columns.insert(3, self.impression_idkey)
        self.all_df = pd.concat([self.data_df[k][key_columns] for k in ["train", "dev", "test"]])
        self.n_users = int(self.all_df["user_id"].max()) + 1
        self.n_items = int(self.all_df["item_id"].max()) + 1
        logging.info(
            'Update impression data -- "# user": {}, "# item": {}, "# entry": {}'.format(
                self.n_users - 1, self.n_items - 1, len(self.all_df)
            )
        )

    def _append_impression_info(self):
        """Vectorized request grouping: consecutive (user, idkey) rows
        form one request; its sorted-unique pos (label!=0) / neg item
        sets attach to the group's LAST row; requests missing either side
        are dropped. One unique pass per split instead of a per-row
        python loop (reference ImpressionReader.py semantics; id-0
        filtering deviation documented in the class docstring)."""
        logging.info("Merging positive items by timestamp/impression_idkey...")
        from rechorus_tpu.data.csr import pairs_to_csr

        for key in ["train", "dev", "test"]:
            df = self.data_df[key]
            n = len(df)
            if n == 0:
                df = df.copy()
                df["pos_items"], df["neg_items"] = [], []
                df["pos_num"], df["neg_num"] = [], []
                self.data_df[key] = df
                continue
            uid = df["user_id"].to_numpy()
            idk = df[self.impression_idkey].to_numpy()
            change = np.ones(n, dtype=bool)
            change[1:] = (uid[1:] != uid[:-1]) | (idk[1:] != idk[:-1])
            gid = np.cumsum(change) - 1
            n_groups = int(gid[-1]) + 1
            last = np.nonzero(np.concatenate([change[1:], [True]]))[0]
            items = df["item_id"].to_numpy(np.int64)
            labels = df["label"].to_numpy()
            nz = items != 0
            pos_flat, pos_off = pairs_to_csr(gid[nz & (labels != 0)],
                                             items[nz & (labels != 0)],
                                             n_groups, unique=True)
            neg_flat, neg_off = pairs_to_csr(gid[nz & (labels == 0)],
                                             items[nz & (labels == 0)],
                                             n_groups, unique=True)
            pos_num, neg_num = np.diff(pos_off), np.diff(neg_off)
            keep_g = np.nonzero((pos_num > 0) & (neg_num > 0))[0]
            out = df.iloc[last[keep_g]].copy().reset_index(drop=True)
            pos_lists = np.split(pos_flat, pos_off[1:-1])
            neg_lists = np.split(neg_flat, neg_off[1:-1])
            out["pos_items"] = [pos_lists[g] for g in keep_g]
            out["neg_items"] = [neg_lists[g] for g in keep_g]
            out["pos_num"] = pos_num[keep_g]
            out["neg_num"] = neg_num[keep_g]
            self.data_df[key] = out
        logging.info(
            "train, dev, test request num: %d %d %d"
            % tuple(len(self.data_df[k]) for k in ["train", "dev", "test"])
        )


    def pos_clicked_matrix(self) -> np.ndarray:
        """Padded per-user matrix of POSITIVELY-clicked item ids across
        all splits [n_users, max_clicked] int32, pad 0 -- the impression
        analog of clicked_matrix for --test_all eval masking. The
        reference masks `corpus.user_his` (positives across all time,
        ImpressionRunner.py:141-149); label-0 impression rows are mere
        exposures and must NOT be excluded from the candidate catalog."""
        from rechorus_tpu.data.csr import csr_fill_matrix, pairs_to_csr

        pos = self.all_df[self.all_df["label"] != 0]
        flat, offsets = pairs_to_csr(pos["user_id"].to_numpy(),
                                     pos["item_id"].to_numpy(),
                                     self.n_users, unique=True)
        max_len = max(1, int(np.diff(offsets).max()))
        return csr_fill_matrix(flat.astype(np.int32), offsets, max_len)


class ImpressionSeqReader(ImpressionReader):
    """Impression + sequential: dual per-user pos/neg histories with
    per-request position/neg_position (src/helpers/ImpressionSeqReader.py).
    """

    def __init__(self, args):
        super().__init__(args)
        self._append_his_info()

    def _append_his_info(self):
        """Vectorized dual-history build: requests sorted per user by
        (idkey,) time; `position`/`neg_position` = exclusive cumsum of
        the user's earlier pos/neg set sizes; pos/neg item-time pairs
        become per-user CSR blocks. Positions are assigned by row
        identity -- equivalent to the reference's merge on
        (user, idkey) because request keys are unique after grouping
        (reference ImpressionSeqReader.py:18-56)."""
        logging.info("Appending history info with corresponding impressions...")
        from rechorus_tpu.data.csr import CSRRows, DualCSRRows

        keys = ["train", "dev", "test"]
        u = np.concatenate([self.data_df[k]["user_id"].to_numpy(np.int64) for k in keys])
        t = np.concatenate([self.data_df[k]["time"].to_numpy(np.int64) for k in keys])
        if self.impression_idkey != "time":
            idk = np.concatenate([self.data_df[k][self.impression_idkey].to_numpy()
                                  for k in keys])
            order = np.lexsort((t, idk, u))
        else:
            order = np.lexsort((t, u))
        n = len(u)
        us = u[order]
        offsets_req = np.zeros(self.n_users + 1, dtype=np.int64)
        np.cumsum(np.bincount(us, minlength=self.n_users), out=offsets_req[1:])

        cols = {}
        for tag, items_col, pos_col in [("pos", "pos_items", "position"),
                                        ("neg", "neg_items", "neg_position")]:
            lists = []
            for k in keys:
                lists.extend(self.data_df[k][items_col].to_list())
            cnt = np.fromiter((len(x) for x in lists), dtype=np.int64, count=n)
            cs = cnt[order]
            excl = np.cumsum(cs) - cs  # global exclusive cumsum over sorted requests
            base = excl[offsets_req[:-1].clip(max=max(n - 1, 0))]  # user-group starts
            position_sorted = excl - np.repeat(base, np.diff(offsets_req))
            position = np.empty(n, dtype=np.int64)
            position[order] = position_sorted
            cols[pos_col] = position
            flat_items = (np.concatenate([np.asarray(lists[r], dtype=np.int64)
                                          for r in order])
                          if int(cnt.sum()) else np.empty(0, np.int64))
            flat_times = np.repeat(t[order], cs)
            his_off = np.zeros(self.n_users + 1, dtype=np.int64)
            np.cumsum(np.bincount(us, weights=cs, minlength=self.n_users).astype(np.int64),
                      out=his_off[1:])
            cols[tag] = CSRRows(np.stack([flat_items, flat_times], axis=1), his_off)
        self.user_his = DualCSRRows(cols["pos"], cols["neg"])
        lo = 0
        for key in keys:
            L = len(self.data_df[key])
            self.data_df[key]["position"] = cols["position"][lo: lo + L]
            self.data_df[key]["neg_position"] = cols["neg_position"][lo: lo + L]
            lo += L

    def dual_history_arrays(self, df: pd.DataFrame, history_max: int):
        """Fixed-shape pos/neg histories: returns (his, his_t, len,
        neg_his, neg_his_t, neg_len). CSR-native: reuses the C++ history
        kernel (native/corpus_ops.cpp) per tag when available."""
        from rechorus_tpu import native
        from rechorus_tpu.data.csr import DualCSRRows

        n = len(df)
        out = {}
        for tag, pos_col in [("pos", "position"), ("neg", "neg_position")]:
            users = df["user_id"].to_numpy()
            positions = df[pos_col].to_numpy()
            if isinstance(self.user_his, DualCSRRows):
                csr = getattr(self.user_his, tag)
                flat, offsets = csr.flat, np.asarray(csr.offsets, dtype=np.int64)
                if native.available():
                    out[tag] = native.build_history_arrays(
                        users, positions, np.ascontiguousarray(flat[:, 0]),
                        np.ascontiguousarray(flat[:, 1]), offsets, history_max)
                    continue
                his_np = csr
            else:  # pre-CSR corpus pickle
                his_np = {uu: np.asarray(h[tag], dtype=np.int64).reshape(-1, 2)
                          for uu, h in self.user_his.items()}
            his = np.zeros((n, history_max), dtype=np.int32)
            his_t = np.zeros((n, history_max), dtype=np.int64)
            lens = np.zeros((n,), dtype=np.int32)
            for r in range(n):
                uu, p = users[r], int(positions[r])
                if p <= 0:
                    continue
                h = his_np[uu][max(0, p - history_max): p]
                L = len(h)
                his[r, :L] = h[:, 0]
                his_t[r, :L] = h[:, 1]
                lens[r] = L
            out[tag] = (his, his_t, lens)
        return out["pos"] + out["neg"]


class KGReader(SeqReader):
    """Knowledge-aware reader: item-item relation triplets from
    item_meta.csv `r_*` list columns, optional attribute relations from
    `i_*` columns mapping attribute values to entity ids past n_items.

    Parity: src/helpers/KGReader.py:31-73 -- relation index 0 is reserved
    for the virtual "buy"/self relation; n_entities = max id over
    heads/tails + 1; exposes `triplet_set`, `relation_df`, `n_relations`,
    `item_relations`, `attr_relations`, `share_attr_dict`.
    """

    @staticmethod
    def parse_data_args(parser):
        parser.add_argument("--include_attr", type=int, default=0,
                            help="Whether include attribute-based relations.")
        return SeqReader.parse_data_args(parser)

    def __init__(self, args):
        super().__init__(args)
        self.include_attr = args.include_attr
        item_meta_path = os.path.join(self.prefix, self.dataset, "item_meta.csv")
        self.item_meta_df = eval_list_columns(pd.read_csv(item_meta_path, sep=self.sep))
        self._construct_kg()

    def _construct_kg(self):
        logging.info("Constructing relation triplets...")
        self.triplet_set = set()
        heads, relations, tails = [], [], []

        self.item_relations = [r for r in self.item_meta_df.columns if r.startswith("r_")]
        meta_items = self.item_meta_df["item_id"].to_numpy()
        for r_idx, r in enumerate(self.item_relations):
            for head_item, tail_list in zip(meta_items, self.item_meta_df[r].values):
                for tail_item in tail_list:
                    heads.append(int(head_item))
                    tails.append(int(tail_item))
                    relations.append(r_idx + 1)  # 0 reserved for the virtual relation
                    self.triplet_set.add((int(head_item), r_idx + 1, int(tail_item)))
        logging.info("Item-item relations:" + str(self.item_relations))

        self.attr_relations = list()
        if self.include_attr:
            self.attr_relations = [r for r in self.item_meta_df.columns if r.startswith("i_")]
            self.attr_max, self.share_attr_dict = list(), dict()
            for r_idx, attr in enumerate(self.attr_relations):
                base = self.n_items + int(np.sum(self.attr_max))
                relation_idx = len(self.item_relations) + r_idx + 1
                for item, val in zip(self.item_meta_df["item_id"], self.item_meta_df[attr]):
                    if val != 0:  # 0 encodes NaN
                        heads.append(int(item))
                        tails.append(int(val + base))
                        relations.append(relation_idx)
                        self.triplet_set.add((int(item), relation_idx, int(val + base)))
                for val, val_df in self.item_meta_df.groupby(attr):
                    self.share_attr_dict[int(val + base)] = val_df["item_id"].tolist()
                self.attr_max.append(int(self.item_meta_df[attr].max()) + 1)
            logging.info("Attribute-based relations:" + str(self.attr_relations))

        self.relations = self.item_relations + self.attr_relations
        self.relation_df = pd.DataFrame({"head": heads, "relation": relations, "tail": tails})
        self.n_relations = len(self.relations) + 1
        self.n_entities = int(pd.concat((self.relation_df["head"], self.relation_df["tail"])).max()) + 1 \
            if len(self.relation_df) else self.n_items
        logging.info('"# relation": {}, "# triplet": {}'.format(self.n_relations, len(self.relation_df)))

    def sorted_triplet_keys(self) -> np.ndarray:
        from rechorus_tpu.ops.kg import sorted_triplet_keys

        return sorted_triplet_keys(self.relation_df, self.n_relations, self.n_entities)

    def member_table(self) -> np.ndarray:
        """Cuckoo membership table of the packed triplets (the device
        representation every kg.is_member consumer takes); built once
        and cached -- corpora are shared across batcher phases."""
        if getattr(self, "_member_table", None) is None:
            from rechorus_tpu.ops.kg import build_member_table

            self._member_table = build_member_table(
                self.relation_df["head"].to_numpy(),
                self.relation_df["relation"].to_numpy(),
                self.relation_df["tail"].to_numpy(),
                self.n_relations, self.n_entities)
        return self._member_table


class KDAReader(KGReader):
    """KDA reader: per-relation time-interval distributions DFT'd into
    complex freq_x[n_relations, n_dft//2+1] that initialize KDA's
    frequency-domain decay embeddings.

    Parity: src/helpers/KDAReader.py -- norm_time (33-37) log2-normalizes
    intervals, _time_interval_cnt (53-85, cached to interval.pkl) collects
    per-relation delta-t lists (virtual adjacent-interaction relation,
    attribute-sharing relations, natural item relations probing the KG for
    the nearest related predecessor), _cal_freq_x (88-106) histograms and
    DFTs them. The reference's per-user python probe loops are replaced by
    numpy pairwise membership against the packed triplet keys.
    """

    @staticmethod
    def parse_data_args(parser):
        parser.add_argument("--t_scalar", type=int, default=60, help="Time interval scalar.")
        parser.add_argument("--n_dft", type=int, default=64, help="The point of DFT.")
        parser.add_argument("--freq_rand", type=int, default=0,
                            help="Whether randomly initialize parameters in frequency domain.")
        return KGReader.parse_data_args(parser)

    @staticmethod
    def dft(x, n_dft=-1) -> np.ndarray:
        if n_dft <= 0:
            n_dft = 2 ** (int(np.log2(len(x))) + 1)
        freq_x = np.fft.fft(x, n_dft)
        return 2 * freq_x[: n_dft // 2 + 1]  # fold negative frequencies

    @staticmethod
    def norm_time(a, t_scalar: int) -> np.ndarray:
        norm_t = np.log2(np.asarray(a) / t_scalar + 1e-6)
        return np.maximum(norm_t, 0)

    def __init__(self, args):
        super().__init__(args)
        self.t_scalar = args.t_scalar
        self.n_dft = args.n_dft
        self.freq_rand = args.freq_rand
        self.regenerate = getattr(args, "regenerate", 0)
        self.interval_file = os.path.join(self.prefix, self.dataset, "interval.pkl")
        self.freq_x = np.empty((self.n_relations, self.n_dft // 2 + 1), dtype=complex)
        if not self.freq_rand:
            self._time_interval_cnt()
            self._cal_freq_x()

    def _time_interval_cnt(self):
        import pickle

        if os.path.exists(self.interval_file) and not self.regenerate:
            with open(self.interval_file, "rb") as f:
                self.interval_dict = pickle.load(f)
            return

        logging.info("Counting relational time intervals...")
        self.interval_dict = {"virtual": []}
        for relation_type in self.relations:
            self.interval_dict[relation_type] = []

        merge_df = pd.merge(self.all_df, self.item_meta_df, how="left", on="item_id")
        from rechorus_tpu.ops.kg import pack_keys

        keys = np.sort(np.unique(pack_keys(
            self.relation_df["head"], self.relation_df["relation"], self.relation_df["tail"],
            self.n_relations, self.n_entities)))
        for user, user_df in merge_df.groupby("user_id"):
            times = user_df["time"].to_numpy()
            iids = user_df["item_id"].to_numpy()
            # virtual adjacent-interaction relation
            delta = times[1:] - times[:-1]
            self.interval_dict["virtual"].extend(delta[delta > 0].tolist())
            # attribute-sharing relations
            for attr in self.attr_relations:
                for val, df in user_df.groupby(attr):
                    d = df["time"].to_numpy()
                    d = d[1:] - d[:-1]
                    self.interval_dict[attr].extend(d[d > 0].tolist())
            # natural item relations: nearest related predecessor per target.
            # Pairs are enumerated in TARGET CHUNKS so peak memory stays
            # ~PAIR_BUDGET regardless of history length (a full
            # np.tril_indices(L) is O(L^2) -- tens of GB for a 50k-row
            # power user); each target's pairs live in one chunk, so the
            # per-chunk nearest-predecessor pick is globally correct.
            L = len(iids)
            if L < 2 or not len(keys):
                continue
            PAIR_BUDGET = 1 << 22
            t_lo = 1
            while t_lo < L:
                span = max(1, PAIR_BUDGET // L)
                t_hi = min(t_lo + span, L)
                tgt_arr = np.arange(t_lo, t_hi)[:, None]   # [T, 1]
                src_arr = np.arange(t_hi - 1)[None, :]     # [1, S]
                valid = src_arr < tgt_arr
                tgt = np.broadcast_to(tgt_arr, valid.shape)[valid]
                src = np.broadcast_to(src_arr, valid.shape)[valid]
                dt = times[tgt] - times[src]
                for r_idx, relation in enumerate(self.item_relations):
                    q = pack_keys(iids[src], np.full(len(src), r_idx + 1), iids[tgt],
                                  self.n_relations, self.n_entities)
                    pos = np.searchsorted(keys, q)
                    member = keys[np.clip(pos, 0, len(keys) - 1)] == q
                    ok = member & (dt > 0)
                    if not ok.any():
                        continue
                    # nearest predecessor = max src index per target
                    best = {}
                    for k in np.flatnonzero(ok):
                        t0 = tgt[k]
                        if t0 not in best or src[k] > src[best[t0]]:
                            best[t0] = k
                    self.interval_dict[relation].extend(int(dt[k]) for k in best.values())
                t_lo = t_hi

        try:
            import pickle

            with open(self.interval_file, "wb") as f:
                pickle.dump(self.interval_dict, f)
        except OSError:
            logging.warning("Could not cache interval.pkl (read-only data dir?)")

    def _cal_freq_x(self):
        distributions = []
        for col in ["virtual"] + self.relations:
            lst = self.interval_dict[col]
            if not len(lst):  # degenerate relation: flat distribution
                distributions.append(np.ones(2))
                continue
            intervals = self.norm_time(lst, self.t_scalar)
            bin_num = int(max(intervals)) + 1
            ns = np.zeros(bin_num)
            for inter in intervals:
                ns[int(inter)] += 1
            distributions.append(ns / max(ns))
            min_dft = 2 ** (int(np.log2(bin_num) + 1))
            if self.n_dft < min_dft:
                self.n_dft = min_dft
        self.freq_x = np.empty((self.n_relations, self.n_dft // 2 + 1), dtype=complex)
        for i, dist in enumerate(distributions):
            self.freq_x[i] = self.dft(dist, self.n_dft)
        del self.interval_dict

    def item_value_matrix(self) -> np.ndarray:
        """[n_items, n_relations] value-entity ids per item: 0 for the
        virtual + natural item relations, attribute entity id for attr
        relations (reference KDA.Dataset item_val_dict)."""
        R = self.n_relations
        out = np.zeros((self.n_items, R), dtype=np.int32)
        meta = self.item_meta_df
        for idx, r in enumerate(self.attr_relations):
            base = self.n_items + int(np.sum(self.attr_max[:idx]))
            col = len(self.item_relations) + 1 + idx
            out[meta["item_id"].to_numpy(), col] = meta[r].to_numpy().astype(np.int32) + base
        return out

    def share_attr_matrix(self):
        """Padded [n_attr_entities, max_share] matrix of items sharing each
        attribute entity (rows indexed by entity_id - n_items), + lengths."""
        n_attr = self.n_entities - self.n_items
        if n_attr <= 0:
            return np.zeros((1, 1), dtype=np.int32), np.ones(1, dtype=np.int32)
        max_share = max((len(v) for v in self.share_attr_dict.values()), default=1)
        mat = np.zeros((n_attr, max_share), dtype=np.int32)
        lens = np.ones(n_attr, dtype=np.int32)
        for ent, items in self.share_attr_dict.items():
            row = ent - self.n_items
            mat[row, : len(items)] = items
            lens[row] = len(items)
        return mat, lens


class ImpressionContextReader(ImpressionReader, ContextReader):
    """Impression data + context metadata (multiple inheritance,
    reference src/helpers/ImpressionContextReader.py:14-52). The reference
    exposes the dynamic-context flag as --include_context_features; it
    maps onto the situation-feature machinery.
    """

    @staticmethod
    def parse_data_args(parser):
        parser.add_argument("--include_item_features", type=int, default=0,
                            help="Whether include item context features.")
        parser.add_argument("--include_user_features", type=int, default=0,
                            help="Whether include user context features.")
        parser.add_argument("--include_context_features", type=int, default=0,
                            help="Whether include dynamic context features.")
        parser.add_argument("--impression_idkey", type=str, default="time",
                            help="The key for impression identification, [time, impression_id]")
        return BaseReader.parse_data_args(parser)

    def __init__(self, args):
        self.impression_idkey = args.impression_idkey
        # BaseReader ctor logic (clicked sets) with ImpressionReader's
        # _read_data override, then the context machinery:
        self.sep = args.sep
        self.prefix = args.path
        self.dataset = args.dataset
        self.csv_chunksize = int(getattr(args, "csv_chunksize", 0) or 0)
        self._read_data()
        self._build_clicked_sets()
        self.include_item_features = args.include_item_features
        self.include_user_features = args.include_user_features
        self.include_situation_features = args.include_context_features
        self._load_ui_metadata()
        self._collect_context()
        self._append_impression_info()
