"""MIND-Large ingestion -> reference CSV contract (VERDICT item 6).

Faithful reimplementation of /root/reference/data/MIND_Large/
MIND-large.ipynb: impressions from behaviors.tsv ("N1234-1" clicks),
iterated 5-core on positives, Britannica day-period buckets, day<=5 ->
train, later impressions split into dev/test by session first-seen order,
CTR + TOPK variants with the reference's re-id and negative-sampling
seeds (legacy RandomState, seed 1 dev / 2 test).

Usage:
  python scripts/prepare_mind.py [--raw data/raw/MIND_large] [--out data/]

Download-gated: this image has no network egress. Get MINDlarge_train.zip
and MINDlarge_dev.zip from https://msnews.github.io/ and extract them to
<raw>/train and <raw>/dev first (each contains behaviors.tsv + news.tsv).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from datetime import datetime

import numpy as np
import pandas as pd

from prepare_ml1m import generate_negative, get_time_range, reid


def load_raw(raw: str) -> pd.DataFrame:
    rows = []
    for part in ("train", "dev"):
        path = os.path.join(raw, part, "behaviors.tsv")
        if not os.path.exists(path):
            sys.exit(
                f"{path} not found.\n"
                "This image has no network egress -- download MINDlarge_train.zip\n"
                "and MINDlarge_dev.zip from https://msnews.github.io/ on a\n"
                "connected machine and extract them to <raw>/train and <raw>/dev.")
        with open(path) as f:
            for line in f:
                sid, uid, time_str, _hist, imps = line.rstrip("\n").split("\t")[:5]
                for imp in imps.split(" "):
                    iid, label = imp.rsplit("-", 1)
                    rows.append((sid, uid, time_str, iid, int(label)))
    return pd.DataFrame(rows, columns=["session_id", "user_id", "time_str", "news_id", "label"])


def five_core(df: pd.DataFrame) -> pd.DataFrame:
    """Iterated 5-core on POSITIVE counts (notebook cell 7)."""
    while True:
        pos = df[df["label"] == 1]
        u_ok = pos.groupby("user_id").size()
        i_ok = pos.groupby("news_id").size()
        keep_u = set(u_ok[u_ok >= 5].index)
        keep_i = set(i_ok[i_ok >= 5].index)
        out = df[df["user_id"].isin(keep_u) & df["news_id"].isin(keep_i)]
        if len(out) == len(df):
            return out
        df = out


def add_situations(df: pd.DataFrame) -> pd.DataFrame:
    ts = df["time_str"].apply(lambda s: datetime.strptime(s, "%m/%d/%Y %I:%M:%S %p"))
    df = df.assign(
        time=ts.apply(lambda x: x.timestamp()),
        c_hour_c=ts.apply(lambda x: x.hour),
        c_weekday_c=ts.apply(lambda x: x.weekday()),
        _date=ts.apply(lambda x: x.date()),
    )
    df["c_period_c"] = df["c_hour_c"].apply(get_time_range)
    df["c_day_f"] = (df["_date"] - df["_date"].min()).apply(lambda x: x.days)
    return df.drop(columns=["_date"])


def session_split(val_test: pd.DataFrame):
    """dev/test = first/second half of sessions in first-seen time order
    (notebook cell 16)."""
    val_test = val_test.sort_values(by="time", kind="mergesort")
    order = val_test["session_id"].drop_duplicates().tolist()
    first = set(order[: len(order) // 2])
    return (val_test[val_test["session_id"].isin(first)].copy(),
            val_test[~val_test["session_id"].isin(first)].copy())


def item_meta_for(raw: str, news_ids, item2newid: dict, out_dir: str):
    news = pd.read_csv(os.path.join(raw, "train", "news.tsv"), sep="\t", header=None,
                       names=["news_id", "category", "subcategory", "title", "abstract",
                              "url", "title_entity", "abstract_entity"])
    sel = news[news["news_id"].isin(set(news_ids))].copy()
    sel["item_id"] = sel["news_id"].map(item2newid)
    c2id = {c: i for i, c in enumerate(sorted(sel["category"].unique()), 1)}
    s2id = {s: i for i, s in enumerate(sorted(sel["subcategory"].unique()), 1)}
    sel["i_category_c"] = sel["category"].map(c2id)
    sel["i_subcategory_c"] = sel["subcategory"].map(s2id)
    sel[["item_id", "i_category_c", "i_subcategory_c"]].to_csv(
        os.path.join(out_dir, "item_meta.csv"), sep="\t", index=False)


def build_ctr(df: pd.DataFrame, raw: str, out_dir: str, train_days: int):
    os.makedirs(out_dir, exist_ok=True)
    df = df.copy()
    u2id, i2id = reid(df["user_id"]), reid(df["news_id"])
    df["user_id"] = df["user_id"].map(u2id)
    df["item_id"] = df["news_id"].map(i2id)
    df = df.sort_values(by=["user_id", "time"], kind="mergesort").reset_index(drop=True)
    json.dump(u2id, open(os.path.join(out_dir, "user2newid.json"), "w"))
    json.dump(i2id, open(os.path.join(out_dir, "item2newid.json"), "w"))

    train = df[df["c_day_f"] <= train_days].copy()
    val, test = session_split(df[df["c_day_f"] > train_days])
    tu, ti = set(train["user_id"]), set(train["item_id"])
    val = val[val["user_id"].isin(tu) & val["item_id"].isin(ti)]
    test = test[test["user_id"].isin(tu) & test["item_id"].isin(ti)]

    cols = ["user_id", "item_id", "time", "label",
            "c_hour_c", "c_weekday_c", "c_period_c", "c_day_f"]
    train[cols].to_csv(os.path.join(out_dir, "train.csv"), sep="\t", index=False)
    val[cols].to_csv(os.path.join(out_dir, "dev.csv"), sep="\t", index=False)
    test[cols].to_csv(os.path.join(out_dir, "test.csv"), sep="\t", index=False)
    item_meta_for(raw, df["news_id"].unique(), i2id, out_dir)
    print(f"CTR: train={len(train)} dev={len(val)} test={len(test)} "
          f"users={len(u2id)} items={len(i2id)} -> {out_dir}")


def build_topk(df: pd.DataFrame, raw: str, out_dir: str, train_days: int, n_neg: int):
    os.makedirs(out_dir, exist_ok=True)
    pos = df[df["label"] == 1].copy()
    train = pos[pos["c_day_f"] <= train_days].copy()
    val, test = session_split(pos[pos["c_day_f"] > train_days])
    tu, ti = set(train["user_id"]), set(train["news_id"])
    val = val[val["user_id"].isin(tu) & val["news_id"].isin(ti)].copy()
    test = test[test["user_id"].isin(tu) & test["news_id"].isin(ti)].copy()

    all_df = pd.concat([train, val, test], axis=0)
    u2id, i2id = reid(all_df["user_id"]), reid(all_df["news_id"])
    for part in (train, val, test, all_df):
        part["user_id"] = part["user_id"].map(u2id)
        part["item_id"] = part["news_id"].map(i2id)
    json.dump(u2id, open(os.path.join(out_dir, "user2newid.json"), "w"))
    json.dump(i2id, open(os.path.join(out_dir, "item2newid.json"), "w"))

    clicked = {u: set(g["item_id"]) for u, g in all_df.groupby("user_id")}
    all_items = all_df["item_id"].unique()
    val["neg_items"] = generate_negative(val, all_items, clicked, random_seed=1, n=n_neg)
    test["neg_items"] = generate_negative(test, all_items, clicked, random_seed=2, n=n_neg)

    cols = ["user_id", "item_id", "time", "c_hour_c", "c_weekday_c", "c_period_c", "c_day_f"]
    train[cols].to_csv(os.path.join(out_dir, "train.csv"), sep="\t", index=False)
    val[cols + ["neg_items"]].to_csv(os.path.join(out_dir, "dev.csv"), sep="\t", index=False)
    test[cols + ["neg_items"]].to_csv(os.path.join(out_dir, "test.csv"), sep="\t", index=False)
    item_meta_for(raw, all_df["news_id"].unique(), i2id, out_dir)
    print(f"TOPK: train={len(train)} dev={len(val)} test={len(test)} "
          f"users={len(u2id)} items={len(i2id)} -> {out_dir}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw", default="data/raw/MIND_large",
                    help="Directory with train/ and dev/ (behaviors.tsv, news.tsv).")
    ap.add_argument("--out", default="data", help="Output data root.")
    ap.add_argument("--train_days", type=int, default=5,
                    help="c_day_f <= this -> train (reference: 5).")
    ap.add_argument("--neg_items", type=int, default=99)
    a = ap.parse_args()
    df = load_raw(a.raw)
    df = five_core(df)
    print(f"5-core: {len(df)} impressions, "
          f"{df['user_id'].nunique()} users, {df['news_id'].nunique()} items")
    df = add_situations(df)
    build_ctr(df, a.raw, os.path.join(a.out, "MINDCTR"), a.train_days)
    build_topk(df, a.raw, os.path.join(a.out, "MINDTOPK"), a.train_days, a.neg_items)


if __name__ == "__main__":
    main()
