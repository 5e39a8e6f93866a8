"""Vectorized corpus builds == loop/dict reference semantics.

The readers build clicked sets / histories / impression groups with
sort+unique passes (data/csr.py) instead of the reference's python
loops (BaseReader.py:30-41, SeqReader.py:20-32, ImpressionReader.py,
ImpressionSeqReader.py). These tests re-derive each structure with the
plain-loop semantics on small random corpora and assert equality,
including the edge cases that vectorization tends to get wrong: users
missing from train, time ties, id-0 impression entries, requests with
only positives/only negatives."""
import argparse
import os

import numpy as np
import pandas as pd
import pytest

from rechorus_tpu.data.csr import CSRRows, csr_fill_matrix, pairs_to_csr
from rechorus_tpu.data.readers import BaseReader, ImpressionReader, ImpressionSeqReader, SeqReader


def _write_topk(root, rng, n_users=40, n_items=30, with_ties=True):
    os.makedirs(root, exist_ok=True)
    rows = []
    for u in range(1, n_users + 1):
        for _ in range(int(rng.integers(2, 9))):
            t = int(rng.integers(0, 50))  # small range -> many time ties
            rows.append((u, int(rng.integers(1, n_items + 1)), t))
    df = pd.DataFrame(rows, columns=["user_id", "item_id", "time"])
    df = df.drop_duplicates(["user_id", "item_id", "time"])  # unique keys (documented deviation)
    df = df.sample(frac=1.0, random_state=1)
    cuts = [0, int(len(df) * 0.8), int(len(df) * 0.9), len(df)]
    parts = [df.iloc[cuts[j]: cuts[j + 1]] for j in range(3)]
    for name, part in zip(["train", "dev", "test"], parts):
        p = part.copy()
        if name != "train":
            p["neg_items"] = [str(rng.integers(1, n_items + 1, size=5).tolist())
                              for _ in range(len(p))]
        p.to_csv(os.path.join(root, name + ".csv"), sep="\t", index=False)
    return df


def _ns(root, **kw):
    return argparse.Namespace(path=os.path.dirname(root), dataset=os.path.basename(root),
                              sep="\t", **kw)


@pytest.fixture(scope="module")
def topk_reader(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vec") / "VecSynth")
    rng = np.random.default_rng(7)
    _write_topk(root, rng)
    return SeqReader(_ns(root))


def test_clicked_sets_match_loop(topk_reader):
    r = topk_reader
    want_train, want_res = {}, {}
    for key in ["train", "dev", "test"]:
        df = r.data_df[key]
        for uid, iid in zip(df["user_id"], df["item_id"]):
            tgt = want_train if key == "train" else want_res
            tgt.setdefault(int(uid), set()).add(int(iid))
    for u in range(r.n_users):
        assert set(np.asarray(r.train_clicked_set.get(u, ())).tolist()) == want_train.get(u, set())
        assert set(np.asarray(r.residual_clicked_set.get(u, ())).tolist()) == want_res.get(u, set())
    # dict-contract surface: iteration yields exactly the non-empty users
    assert sorted(iter(r.train_clicked_set)) == sorted(want_train)
    assert len(r.train_clicked_set) == len(want_train)
    assert (3 in r.train_clicked_set) == (3 in want_train)


def test_positions_and_history_match_loop(topk_reader):
    r = topk_reader
    # loop reference: stable (time, user) sort, per-user cumcount
    sort_df = r.all_df.sort_values(by=["time", "user_id"], kind="mergesort")
    his, position = {}, []
    for uid, iid, t in zip(sort_df["user_id"], sort_df["item_id"], sort_df["time"]):
        his.setdefault(int(uid), [])
        position.append(len(his[int(uid)]))
        his[int(uid)].append((int(iid), int(t)))
    got_pos = np.concatenate([r.data_df[k]["position"].to_numpy() for k in ["train", "dev", "test"]])
    # positions computed on the (time, user)-sorted view; map back to the
    # original concat row order by inverting the same stable permutation
    order = np.lexsort((r.all_df["user_id"].to_numpy(), r.all_df["time"].to_numpy()))
    want_pos = np.empty(len(order), dtype=np.int64)
    want_pos[order] = position
    np.testing.assert_array_equal(got_pos, want_pos)
    for u, h in his.items():
        np.testing.assert_array_equal(np.asarray(r.user_his[u]), np.asarray(h),
                                      err_msg=f"user {u}")


def test_clicked_matrix_matches_sets(topk_reader):
    r = topk_reader
    for include_residual in (False, True):
        mat = r.clicked_matrix(include_residual=include_residual)
        for u in range(r.n_users):
            s = set(np.asarray(r.train_clicked_set.get(u, ())).tolist())
            if include_residual:
                s |= set(np.asarray(r.residual_clicked_set.get(u, ())).tolist())
            row = mat[u][mat[u] > 0].tolist()
            assert sorted(row) == sorted(s), f"user {u}"


def test_fast_list_column_parse_matches_literal_eval(topk_reader):
    df = topk_reader.data_df["dev"]
    assert isinstance(df["neg_items"].iloc[0], np.ndarray)
    assert df["neg_items"].iloc[0].shape == (5,)
    assert df["neg_items"].iloc[0].dtype in (np.int64, np.float64)


def _write_impression(root, rng, n_users=25, n_items=20):
    os.makedirs(root, exist_ok=True)
    rows = []
    for u in range(1, n_users + 1):
        for t in sorted(rng.integers(0, 30, size=int(rng.integers(2, 6)))):
            for _ in range(int(rng.integers(1, 6))):
                item = int(rng.integers(0, n_items + 1))  # id 0 sometimes
                rows.append((u, item, int(t), int(rng.integers(0, 2))))
    df = pd.DataFrame(rows, columns=["user_id", "item_id", "time", "label"])
    df = df.sample(frac=1.0, random_state=3)
    cuts = [0, int(len(df) * 0.8), int(len(df) * 0.9), len(df)]
    parts = [df.iloc[cuts[j]: cuts[j + 1]] for j in range(3)]
    for name, part in zip(["train", "dev", "test"], parts):
        part.to_csv(os.path.join(root, name + ".csv"), sep="\t", index=False)


@pytest.fixture(scope="module")
def imp_reader(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vecimp") / "VecImp")
    _write_impression(root, np.random.default_rng(11))
    return ImpressionSeqReader(_ns(root, impression_idkey="time"))


def test_impression_groups_match_loop(imp_reader):
    r = imp_reader
    for key in ["train", "dev", "test"]:
        df = r.data_df[key]
        # re-derive from the raw csv with the loop semantics
        raw = pd.read_csv(os.path.join(r.prefix, r.dataset, key + ".csv"), sep="\t")
        raw = raw.sort_values(by=["user_id", "time"], kind="mergesort")
        want = []
        for (u, t), grp in raw.groupby(["user_id", "time"], sort=False):
            pos = sorted(set(int(i) for i, lb in zip(grp["item_id"], grp["label"]) if lb and i != 0))
            neg = sorted(set(int(i) for i, lb in zip(grp["item_id"], grp["label"]) if not lb and i != 0))
            if pos and neg:
                want.append((int(u), int(t), pos, neg))
        assert len(df) == len(want), key
        for row_i, (u, t, pos, neg) in enumerate(want):
            assert int(df["user_id"].iloc[row_i]) == u
            assert int(df["time"].iloc[row_i]) == t
            assert list(df["pos_items"].iloc[row_i]) == pos
            assert list(df["neg_items"].iloc[row_i]) == neg
            assert int(df["pos_num"].iloc[row_i]) == len(pos)
            assert int(df["neg_num"].iloc[row_i]) == len(neg)


def test_impression_positions_and_dual_history(imp_reader):
    r = imp_reader
    # loop reference over the grouped requests
    frames = [r.data_df[k][["user_id", "pos_items", "neg_items", "time"]] for k in ["train", "dev", "test"]]
    sort_df = pd.concat(frames, ignore_index=True)
    order = np.lexsort((sort_df["time"].to_numpy(), sort_df["user_id"].to_numpy()))
    his = {}
    position = np.empty(len(sort_df), dtype=np.int64)
    neg_position = np.empty(len(sort_df), dtype=np.int64)
    for k in order:
        u = int(sort_df["user_id"].iloc[k])
        his.setdefault(u, {"pos": [], "neg": []})
        position[k] = len(his[u]["pos"])
        neg_position[k] = len(his[u]["neg"])
        t = int(sort_df["time"].iloc[k])
        his[u]["pos"].extend((int(p), t) for p in sort_df["pos_items"].iloc[k])
        his[u]["neg"].extend((int(x), t) for x in sort_df["neg_items"].iloc[k])
    got_pos = np.concatenate([r.data_df[k]["position"].to_numpy() for k in ["train", "dev", "test"]])
    got_neg = np.concatenate([r.data_df[k]["neg_position"].to_numpy() for k in ["train", "dev", "test"]])
    np.testing.assert_array_equal(got_pos, position)
    np.testing.assert_array_equal(got_neg, neg_position)
    for u, h in his.items():
        np.testing.assert_array_equal(np.asarray(r.user_his[u]["pos"]).reshape(-1, 2),
                                      np.asarray(h["pos"]).reshape(-1, 2), err_msg=f"user {u} pos")
        np.testing.assert_array_equal(np.asarray(r.user_his[u]["neg"]).reshape(-1, 2),
                                      np.asarray(h["neg"]).reshape(-1, 2), err_msg=f"user {u} neg")
    # dual_history_arrays against the naive slice
    df = r.data_df["test"]
    H = 4
    his_a, his_t, lens, nhis, nhis_t, nlens = r.dual_history_arrays(df, H)
    for row in range(len(df)):
        u, p = int(df["user_id"].iloc[row]), int(df["position"].iloc[row])
        want = his.get(u, {"pos": []})["pos"][max(0, p - H): p] if p > 0 else []
        assert lens[row] == len(want)
        np.testing.assert_array_equal(his_a[row, : len(want)], [w[0] for w in want])
        np.testing.assert_array_equal(his_t[row, : len(want)], [w[1] for w in want])


def test_csr_primitives():
    users = np.array([2, 0, 2, 2, 0, 5])
    vals = np.array([7, 3, 7, 1, 9, 4])
    flat, off = pairs_to_csr(users, vals, 6, unique=True)
    rows = CSRRows(flat, off)
    assert rows[0].tolist() == [3, 9]
    assert rows[2].tolist() == [1, 7]
    assert rows[5].tolist() == [4]
    assert rows.get(1, ()) == () and rows.get(99, ()) == ()
    assert list(rows) == [0, 2, 5] and len(rows) == 3
    mat = csr_fill_matrix(flat, off, 2)
    assert mat.tolist() == [[3, 9], [0, 0], [1, 7], [0, 0], [0, 0], [4, 0]]


def test_chunked_csv_matches_whole_file(tmp_path):
    root = str(tmp_path / "Chunked")
    rng = np.random.default_rng(23)
    _write_topk(root, rng)
    whole = SeqReader(_ns(root))
    chunked = SeqReader(_ns(root, csv_chunksize=17))
    for key in ["train", "dev", "test"]:
        a, b = whole.data_df[key], chunked.data_df[key]
        assert len(a) == len(b)
        for col in ["user_id", "item_id", "time", "position"]:
            np.testing.assert_array_equal(a[col].to_numpy(), b[col].to_numpy(), err_msg=f"{key}.{col}")
    np.testing.assert_array_equal(whole.user_his.flat, chunked.user_his.flat)
