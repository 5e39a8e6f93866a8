"""MovieLens-1M ingestion -> reference CSV contract (VERDICT item 6).

Faithful reimplementation of /root/reference/data/MovieLens_1M/
MovieLens-1M.ipynb: rating>=4 -> label, iterated 5-core filtering on
positives, Britannica day-period buckets, timeline 80/10/10 split,
impression-id assignment (<=20 rows), CTR + TOPK variants with the same
re-id and negative-sampling seeds (numpy legacy RandomState, seed 1 dev /
2 test) so the produced CSVs match the reference's published artifacts.

Usage:
  python scripts/prepare_ml1m.py [--raw ml-1m/ratings.dat dir] [--out data/]

Download-gated: this image has no network egress. Place the raw dump
(ml-1m.zip extracted: ratings.dat + movies.dat) under --raw first, e.g.
  curl -O http://files.grouplens.org/datasets/movielens/ml-1m.zip
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import zipfile
from datetime import datetime

import numpy as np
import pandas as pd


def get_time_range(hour: int) -> int:
    # Britannica parts-of-day buckets (notebook cell 8)
    if 5 <= hour <= 8:
        return 0
    if 8 < hour < 11:
        return 1
    if 11 <= hour <= 12:
        return 2
    if 12 < hour <= 15:
        return 3
    if 15 < hour <= 17:
        return 4
    if 18 <= hour <= 19:
        return 5
    if 19 < hour <= 21:
        return 6
    if hour > 21:
        return 7
    return 8  # 0-4 am


def load_raw(raw: str) -> pd.DataFrame:
    path = os.path.join(raw, "ratings.dat")
    if not os.path.exists(path):
        zpath = os.path.join(raw, "ml-1m.zip")
        if os.path.exists(zpath):
            with zipfile.ZipFile(zpath) as z:
                z.extractall(raw)
            inner = os.path.join(raw, "ml-1m", "ratings.dat")
            if os.path.exists(inner):
                raw = os.path.join(raw, "ml-1m")
                path = inner
    if not os.path.exists(path):
        sys.exit(
            f"ratings.dat not found under {raw}.\n"
            "This image has no network egress -- download ml-1m.zip from\n"
            "http://files.grouplens.org/datasets/movielens/ml-1m.zip on a\n"
            "connected machine and place it (or its extracted contents) there.")
    df = pd.read_csv(path, sep="::", engine="python",
                     names=["user_id", "item_id", "rating", "time"])
    df["label"] = (df["rating"] >= 4).astype(int)
    return df[["user_id", "time", "item_id", "label"]]


def five_core(df: pd.DataFrame) -> pd.DataFrame:
    """Iterated 5-core on POSITIVE interaction counts (notebook cell 5)."""
    while True:
        pos = df[df["label"] == 1]
        u_ok = pos.groupby("user_id").size()
        i_ok = pos.groupby("item_id").size()
        keep_u = set(u_ok[u_ok >= 5].index)
        keep_i = set(i_ok[i_ok >= 5].index)
        out = df[df["user_id"].isin(keep_u) & df["item_id"].isin(keep_i)]
        if len(out) == len(df):
            return out
        df = out


def add_situations(df: pd.DataFrame) -> pd.DataFrame:
    ts = df["time"].apply(datetime.fromtimestamp)
    df = df.assign(
        c_hour_c=ts.apply(lambda x: x.hour),
        c_weekday_c=ts.apply(lambda x: x.weekday()),
        _date=ts.apply(lambda x: x.date()),
    )
    df["c_period_c"] = df["c_hour_c"].apply(get_time_range)
    df["c_day_f"] = (df["_date"] - df["_date"].min()).apply(lambda x: x.days)
    return df.drop(columns=["_date"])


def reid(series: pd.Series) -> dict:
    return dict(zip(sorted(series.unique()), range(1, series.nunique() + 1)))


def assign_impressions(df: pd.DataFrame, max_imp_len: int = 20) -> pd.DataFrame:
    """Consecutive same-user rows share an impression id, capped at 20
    rows (notebook cell 15)."""
    imp_ids = np.zeros(len(df), dtype=np.int64)
    cur, length, last_uid = 0, 0, None
    for idx, uid in enumerate(df["user_id"].to_numpy()):
        if uid == last_uid and length < max_imp_len:
            length += 1
        else:
            cur += 1
            length = 1
        imp_ids[idx] = cur
        last_uid = uid
    return df.assign(impression_id=imp_ids)


def item_meta_for(raw: str, item2newid: dict, out_dir: str):
    movies = pd.read_csv(os.path.join(raw, "movies.dat"), sep="::",
                         names=["movieId", "title", "genres"],
                         encoding="latin-1", engine="python")
    sel = movies[movies["movieId"].isin(item2newid)].copy()
    sel["item_id"] = sel["movieId"].map(item2newid)
    g2id = {g: i for i, g in enumerate(sorted(sel["genres"].unique()), 1)}
    t2id = {t: i for i, t in enumerate(sorted(sel["title"].unique()), 1)}
    sel["i_genre_c"] = sel["genres"].map(g2id)
    sel["i_title_c"] = sel["title"].map(t2id)
    sel[["item_id", "i_genre_c", "i_title_c"]].to_csv(
        os.path.join(out_dir, "item_meta.csv"), sep="\t", index=False)


def generate_negative(data_df, all_items, clicked_item_set, random_seed, n=99):
    """Exact notebook cell-24 semantics incl. the legacy RandomState."""
    if n >= len(all_items):
        raise SystemExit(
            f"cannot draw {n} distinct negatives from {len(all_items)} items; "
            "pass a smaller --neg_items")
    np.random.seed(random_seed)
    neg_items = np.random.choice(all_items, (len(data_df), n))
    for i, uid in enumerate(data_df["user_id"].to_numpy()):
        user_clicked = clicked_item_set[uid]
        for j in range(n):
            while neg_items[i][j] in user_clicked | set(neg_items[i][:j]):
                neg_items[i][j] = np.random.choice(all_items, 1)[0]
    return neg_items.tolist()


def build_ctr(df: pd.DataFrame, raw: str, out_dir: str):
    os.makedirs(out_dir, exist_ok=True)
    df = df.copy()
    u2id, i2id = reid(df["user_id"]), reid(df["item_id"])
    df["orig_item_id"] = df["item_id"]
    df["user_id"] = df["user_id"].map(u2id)
    df["item_id"] = df["item_id"].map(i2id)
    df = df.sort_values(by=["user_id", "time"], kind="mergesort").reset_index(drop=True)
    json.dump({int(k): v for k, v in u2id.items()}, open(os.path.join(out_dir, "user2newid.json"), "w"))
    json.dump({int(k): v for k, v in i2id.items()}, open(os.path.join(out_dir, "item2newid.json"), "w"))

    cut1 = df["c_day_f"].max() * 0.8
    cut2 = df["c_day_f"].max() * 0.9
    train = df[df["c_day_f"] <= cut1].copy()
    val = df[(df["c_day_f"] > cut1) & (df["c_day_f"] <= cut2)].copy()
    test = df[df["c_day_f"] > cut2].copy()
    tu, ti = set(train["user_id"]), set(train["item_id"])
    val = val[val["user_id"].isin(tu) & val["item_id"].isin(ti)].copy()
    test = test[test["user_id"].isin(tu) & test["item_id"].isin(ti)].copy()

    cols = ["user_id", "item_id", "time", "label",
            "c_hour_c", "c_weekday_c", "c_period_c", "c_day_f", "impression_id"]
    for part, name in ((train, "train"), (val, "dev"), (test, "test")):
        part = assign_impressions(part)
        part[cols].to_csv(os.path.join(out_dir, f"{name}.csv"), sep="\t", index=False)
    item_meta_for(raw, {k: v for k, v in i2id.items()}, out_dir)
    print(f"CTR: train={len(train)} dev={len(val)} test={len(test)} "
          f"users={len(u2id)} items={len(i2id)} -> {out_dir}")


def build_topk(df: pd.DataFrame, raw: str, out_dir: str, n_neg: int = 99):
    os.makedirs(out_dir, exist_ok=True)
    pos = df[df["label"] == 1].copy()
    cut1 = int(pos["c_day_f"].max() * 0.8)
    cut2 = int(pos["c_day_f"].max() * 0.9)
    train = pos[pos["c_day_f"] <= cut1].copy()
    val_test = pos[pos["c_day_f"] > cut1].sort_values(by="time", kind="mergesort")
    val = val_test[val_test["c_day_f"] <= cut2].copy()
    test = val_test[val_test["c_day_f"] > cut2].copy()
    tu, ti = set(train["user_id"]), set(train["item_id"])
    val = val[val["user_id"].isin(tu) & val["item_id"].isin(ti)].copy()
    test = test[test["user_id"].isin(tu) & test["item_id"].isin(ti)].copy()

    all_df = pd.concat([train, val, test], axis=0)
    u2id, i2id = reid(all_df["user_id"]), reid(all_df["item_id"])
    for part in (train, val, test, all_df):
        part["user_id"] = part["user_id"].map(u2id)
        part["item_id"] = part["item_id"].map(i2id)
    json.dump({int(k): v for k, v in u2id.items()}, open(os.path.join(out_dir, "user2newid.json"), "w"))
    json.dump({int(k): v for k, v in i2id.items()}, open(os.path.join(out_dir, "item2newid.json"), "w"))

    clicked = {u: set(g["item_id"]) for u, g in all_df.groupby("user_id")}
    all_items = all_df["item_id"].unique()
    val["neg_items"] = generate_negative(val, all_items, clicked, random_seed=1, n=n_neg)
    test["neg_items"] = generate_negative(test, all_items, clicked, random_seed=2, n=n_neg)

    cols = ["user_id", "item_id", "time", "c_hour_c", "c_weekday_c", "c_period_c", "c_day_f"]
    train[cols].to_csv(os.path.join(out_dir, "train.csv"), sep="\t", index=False)
    val[cols + ["neg_items"]].to_csv(os.path.join(out_dir, "dev.csv"), sep="\t", index=False)
    test[cols + ["neg_items"]].to_csv(os.path.join(out_dir, "test.csv"), sep="\t", index=False)
    item_meta_for(raw, {k: v for k, v in i2id.items()}, out_dir)
    print(f"TOPK: train={len(train)} dev={len(val)} test={len(test)} "
          f"users={len(u2id)} items={len(i2id)} -> {out_dir}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw", default="data/raw/ml-1m",
                    help="Directory containing ratings.dat/movies.dat (or ml-1m.zip).")
    ap.add_argument("--out", default="data", help="Output data root.")
    ap.add_argument("--neg_items", type=int, default=99, help="Sampled negatives per dev/test row (reference: 99).")
    a = ap.parse_args()
    df = load_raw(a.raw)
    raw = a.raw if os.path.exists(os.path.join(a.raw, "ratings.dat")) \
        else os.path.join(a.raw, "ml-1m")
    df = five_core(df)
    print(f"5-core: {len(df)} interactions, "
          f"{df['user_id'].nunique()} users, {df['item_id'].nunique()} items")
    df = add_situations(df)
    build_ctr(df, raw, os.path.join(a.out, "ML_1MCTR"))
    build_topk(df, raw, os.path.join(a.out, "ML_1MTOPK"), n_neg=a.neg_items)


if __name__ == "__main__":
    main()
