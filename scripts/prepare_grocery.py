"""Regenerate Grocery_and_Gourmet_Food train/dev/test splits.

The reference snapshot ships only the already-split train.csv; dev/test
were produced by data/Grocery_and_Gourmet_Food/Amazon.ipynb (leave-one-out
per user + 99 uniformly sampled negatives avoiding each user's clicked
set). We re-apply the same protocol to the shipped interactions so metric
numbers are comparable in protocol (not bit-identical in rows).

Writes to <repo>/data/Grocery_and_Gourmet_Food/{train,dev,test}.csv
and item_meta.csv (copied: category + r_complement/r_substitute relations).
"""
from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd

SRC = "/root/reference/data/Grocery_and_Gourmet_Food"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "Grocery_and_Gourmet_Food")
NEG_ITEMS = 99
SEED = 42


def main():
    os.makedirs(DST, exist_ok=True)
    rng = np.random.default_rng(SEED)
    df = pd.read_csv(os.path.join(SRC, "train.csv"), sep="\t")
    df = df.sort_values(by=["time", "user_id"], kind="mergesort").reset_index(drop=True)
    n_items = int(df["item_id"].max())

    clicked = df.groupby("user_id")["item_id"].apply(set).to_dict()

    # keep each user's first interaction in train (cold-start guard), then
    # split off the last two interactions per user as test / dev
    leave_df = df.groupby("user_id").head(1)
    rest = df.drop(leave_df.index)

    def pop_tail(d):
        tail = d.groupby("user_id").tail(1)
        return tail, d.drop(tail.index)

    test_df, rest = pop_tail(rest)
    dev_df, rest = pop_tail(rest)
    train_df = pd.concat([leave_df, rest]).sort_index()

    def add_negs(d):
        d = d.copy()
        neg = rng.integers(1, n_items + 1, size=(len(d), NEG_ITEMS))
        for i, uid in enumerate(d["user_id"].to_numpy()):
            cset = clicked[uid]
            for j in range(NEG_ITEMS):
                while neg[i, j] in cset:
                    neg[i, j] = rng.integers(1, n_items + 1)
        d["neg_items"] = [list(map(int, row)) for row in neg]
        return d

    dev_df, test_df = add_negs(dev_df), add_negs(test_df)

    train_df.to_csv(os.path.join(DST, "train.csv"), sep="\t", index=False)
    dev_df.to_csv(os.path.join(DST, "dev.csv"), sep="\t", index=False)
    test_df.to_csv(os.path.join(DST, "test.csv"), sep="\t", index=False)
    shutil.copy(os.path.join(SRC, "item_meta.csv"), os.path.join(DST, "item_meta.csv"))
    print(f"train={len(train_df)} dev={len(dev_df)} test={len(test_df)} n_items={n_items}")


if __name__ == "__main__":
    main()
