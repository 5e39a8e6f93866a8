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


def eval_list_columns(df: pd.DataFrame) -> pd.DataFrame:
    """Parse list-valued string columns (e.g. neg_items) into np arrays.

    Parity: reference src/utils/utils.py:47-51 (which uses eval(); we use
    ast.literal_eval -- same accepted grammar, no code execution).
    """
    for col in df.columns:
        if pd.api.types.is_object_dtype(df[col]) or isinstance(df[col].dtype, pd.StringDtype):
            first = df[col].iloc[0] if len(df) else None
            if isinstance(first, str) and first.strip().startswith("["):
                df[col] = df[col].apply(lambda x: np.array(ast.literal_eval(x)))
    return df


class BaseReader:
    """Top-k general reader. Parity: src/helpers/BaseReader.py."""

    @staticmethod
    def parse_data_args(parser):
        parser.add_argument("--path", type=str, default="data/", help="Input data dir.")
        parser.add_argument("--dataset", type=str, default="Grocery_and_Gourmet_Food", help="Choose a dataset.")
        parser.add_argument("--sep", type=str, default="\t", help="sep of csv file.")
        return parser

    def __init__(self, args):
        self.sep = args.sep
        self.prefix = args.path
        self.dataset = args.dataset
        self._read_data()

        self.train_clicked_set: Dict[int, set] = dict()
        self.residual_clicked_set: Dict[int, set] = dict()
        for key in ["train", "dev", "test"]:
            df = self.data_df[key]
            for uid, iid in zip(df["user_id"], df["item_id"]):
                if uid not in self.train_clicked_set:
                    self.train_clicked_set[uid] = set()
                    self.residual_clicked_set[uid] = set()
                if key == "train":
                    self.train_clicked_set[uid].add(iid)
                else:
                    self.residual_clicked_set[uid].add(iid)

    def _read_data(self):
        logging.info('Reading data from "{}", dataset = "{}" '.format(self.prefix, self.dataset))
        self.data_df = dict()
        for key in ["train", "dev", "test"]:
            path = os.path.join(self.prefix, self.dataset, key + ".csv")
            self.data_df[key] = (
                pd.read_csv(path, sep=self.sep).reset_index(drop=True).sort_values(by=["user_id", "time"])
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
                neg_items = np.array(self.data_df[key]["neg_items"].tolist())
                assert (neg_items >= self.n_items).sum() == 0, "negative items include unseen ids"
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
        if not hasattr(self, "_his_np"):
            self._his_np = {u: np.asarray(h, dtype=np.int64) for u, h in self.user_his.items()}
        return self._his_np

    def _history_flat(self):
        """CSR-style flattened per-user histories for the native kernel."""
        if not hasattr(self, "_his_flat"):
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
        sets = []
        for u in range(self.n_users):
            s = set(self.train_clicked_set.get(u, ()))
            if include_residual:
                s = s | set(self.residual_clicked_set.get(u, ()))
            sets.append(s)
        max_len = max(1, max(len(s) for s in sets))
        from rechorus_tpu import native

        if native.available():
            offsets = np.zeros(self.n_users + 1, dtype=np.int64)
            for u, s in enumerate(sets):
                offsets[u + 1] = offsets[u] + len(s)
            flat = np.zeros(int(offsets[-1]), dtype=np.int64)
            for u, s in enumerate(sets):
                if s:
                    flat[offsets[u]: offsets[u + 1]] = sorted(s)
            return native.fill_clicked_matrix(flat, offsets, self.n_users, max_len)
        mat = np.zeros((self.n_users, max_len), dtype=np.int32)
        for u, s in enumerate(sets):
            if s:
                mat[u, : len(s)] = sorted(s)
        return mat


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
        logging.info("Appending history info...")
        sort_df = self.all_df.sort_values(by=["time", "user_id"], kind="mergesort")
        position = list()
        self.user_his: Dict[int, list] = dict()
        for uid, iid, t in zip(sort_df["user_id"], sort_df["item_id"], sort_df["time"]):
            if uid not in self.user_his:
                self.user_his[uid] = list()
            position.append(len(self.user_his[uid]))
            self.user_his[uid].append((iid, t))
        sort_df = sort_df.copy()
        sort_df["position"] = position
        for key in ["train", "dev", "test"]:
            self.data_df[key] = pd.merge(
                left=self.data_df[key], right=sort_df, how="left", on=["user_id", "item_id", "time"]
            )


class ContextSeqReader(ContextReader):
    """Context + sequential: SeqReader-style history where each entry also
    stores its situation-context vector.

    Parity: src/helpers/ContextSeqReader.py:18-43.
    """

    def __init__(self, args):
        super().__init__(args)
        self._append_his_info()

    def _append_his_info(self):
        logging.info("Appending history info with situation context...")
        situ = list(self.situation_feature_names)
        frames = []
        for key in ["train", "dev", "test"]:
            cols = ["user_id", "item_id", "time"] + [c for c in situ if c in self.data_df[key].columns]
            frames.append(self.data_df[key][cols])
        all_df = pd.concat(frames)
        sort_df = all_df.sort_values(by=["time", "user_id"], kind="mergesort")
        position = list()
        self.user_his = dict()
        self.user_his_situ = dict()
        situ_vals = sort_df[situ].to_numpy() if situ else np.zeros((len(sort_df), 0))
        for k, (uid, iid, t) in enumerate(zip(sort_df["user_id"], sort_df["item_id"], sort_df["time"])):
            if uid not in self.user_his:
                self.user_his[uid] = list()
                self.user_his_situ[uid] = list()
            position.append(len(self.user_his[uid]))
            self.user_his[uid].append((iid, t))
            self.user_his_situ[uid].append(situ_vals[k])
        sort_df = sort_df.copy()
        sort_df["position"] = position
        merge_cols = ["user_id", "item_id", "time"]
        for key in ["train", "dev", "test"]:
            self.data_df[key] = pd.merge(
                left=self.data_df[key], right=sort_df[merge_cols + ["position"]],
                how="left", on=merge_cols,
            )

    def history_situ_arrays(self, df: pd.DataFrame, history_max: int) -> np.ndarray:
        """[n_rows, history_max, n_situ_features] per-step situation context."""
        n = len(df)
        F = len(self.situation_feature_names)
        out = np.zeros((n, history_max, F), dtype=np.int64)
        users = df["user_id"].to_numpy()
        positions = df["position"].to_numpy()
        situ_np = {u: np.asarray(v) for u, v in self.user_his_situ.items()}
        for r in range(n):
            u, p = users[r], int(positions[r])
            if p <= 0:
                continue
            h = situ_np[u][max(0, p - history_max) : p]
            out[r, : len(h)] = h
        return out


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
                pd.read_csv(path, sep=self.sep).reset_index(drop=True)
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
        logging.info("Merging positive items by timestamp/impression_idkey...")
        for key in ["train", "dev", "test"]:
            df = self.data_df[key]
            group_change = (df["user_id"].ne(df["user_id"].shift(1))
                            | df[self.impression_idkey].ne(df[self.impression_idkey].shift(1)))
            group_id = group_change.cumsum()
            pos_col, neg_col, keep = [], [], []
            items = df["item_id"].to_numpy()
            labels = df["label"].to_numpy()
            gids = group_id.to_numpy()
            n = len(df)
            i = 0
            while i < n:
                j = i
                pos, neg = [], []
                while j < n and gids[j] == gids[i]:
                    (pos if labels[j] else neg).append(int(items[j]))
                    j += 1
                pos = sorted(set(p for p in pos if p != 0))
                neg = sorted(set(x for x in neg if x != 0))
                for r in range(i, j - 1):
                    pos_col.append([])
                    neg_col.append([])
                    keep.append(False)
                pos_col.append(pos)
                neg_col.append(neg)
                keep.append(len(pos) > 0 and len(neg) > 0)
                i = j
            df = df.copy()
            df["pos_items"] = pos_col
            df["neg_items"] = neg_col
            df["pos_num"] = [len(p) for p in pos_col]
            df["neg_num"] = [len(x) for x in neg_col]
            self.data_df[key] = df[np.array(keep)].reset_index(drop=True)
        logging.info(
            "train, dev, test request num: %d %d %d"
            % tuple(len(self.data_df[k]) for k in ["train", "dev", "test"])
        )


class ImpressionSeqReader(ImpressionReader):
    """Impression + sequential: dual per-user pos/neg histories with
    per-request position/neg_position (src/helpers/ImpressionSeqReader.py).
    """

    def __init__(self, args):
        super().__init__(args)
        self._append_his_info()

    def _append_his_info(self):
        logging.info("Appending history info with corresponding impressions...")
        frames = []
        for key in ["train", "dev", "test"]:
            d = self.data_df[key][["user_id", "pos_items", "neg_items", "time", self.impression_idkey]].copy() \
                if self.impression_idkey != "time" else \
                self.data_df[key][["user_id", "pos_items", "neg_items", "time"]].copy()
            frames.append(d)
        sort_cols = ["user_id", "time"] if self.impression_idkey == "time" else \
            ["user_id", self.impression_idkey, "time"]
        sort_df = pd.concat(frames).sort_values(by=sort_cols, kind="mergesort")
        position, neg_position = [], []
        self.user_his = dict()
        for uid, pids, nids, t in zip(sort_df["user_id"], sort_df["pos_items"], sort_df["neg_items"], sort_df["time"]):
            if uid not in self.user_his:
                self.user_his[uid] = {"pos": [], "neg": []}
            position.append(len(self.user_his[uid]["pos"]))
            neg_position.append(len(self.user_his[uid]["neg"]))
            for pid in pids:
                self.user_his[uid]["pos"].append((pid, t))
            for nid in nids:
                self.user_his[uid]["neg"].append((nid, t))
        sort_df = sort_df.copy()
        sort_df["position"] = position
        sort_df["neg_position"] = neg_position
        merge_on = ["user_id", self.impression_idkey]
        for key in ["train", "dev", "test"]:
            self.data_df[key] = pd.merge(
                left=self.data_df[key],
                right=sort_df.drop(columns=["pos_items", "neg_items"]
                                   + (["time"] if self.impression_idkey != "time" else [])),
                how="left", on=merge_on,
            )

    def dual_history_arrays(self, df: pd.DataFrame, history_max: int):
        """Fixed-shape pos/neg histories: returns (his, his_t, len,
        neg_his, neg_his_t, neg_len)."""
        n = len(df)
        out = {}
        for tag, pos_col in [("pos", "position"), ("neg", "neg_position")]:
            his = np.zeros((n, history_max), dtype=np.int32)
            his_t = np.zeros((n, history_max), dtype=np.int64)
            lens = np.zeros((n,), dtype=np.int32)
            his_np = {u: np.asarray(h[tag], dtype=np.int64).reshape(-1, 2) for u, h in self.user_his.items()}
            users = df["user_id"].to_numpy()
            positions = df[pos_col].to_numpy()
            for r in range(n):
                u, p = users[r], int(positions[r])
                if p <= 0:
                    continue
                h = his_np[u][max(0, p - history_max): p]
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
            # natural item relations: nearest related predecessor per target
            L = len(iids)
            if L < 2 or not len(keys):
                continue
            s_idx, t_idx = np.tril_indices(L, k=-1)  # source earlier than target
            # tril gives (row=target, col=source)
            tgt, src = s_idx, t_idx
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
        self._read_data()
        self.train_clicked_set = {}
        self.residual_clicked_set = {}
        for key in ["train", "dev", "test"]:
            df = self.data_df[key]
            for uid, iid in zip(df["user_id"], df["item_id"]):
                if uid not in self.train_clicked_set:
                    self.train_clicked_set[uid] = set()
                    self.residual_clicked_set[uid] = set()
                if key == "train":
                    self.train_clicked_set[uid].add(iid)
                else:
                    self.residual_clicked_set[uid].add(iid)
        self.include_item_features = args.include_item_features
        self.include_user_features = args.include_user_features
        self.include_situation_features = args.include_context_features
        self._load_ui_metadata()
        self._collect_context()
        self._append_impression_info()
