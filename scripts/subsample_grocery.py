"""Build a user-subsampled Grocery split for reference-rerun closures.

The published-config reference rerun (the Chorus/FPMC closure method,
RESULTS.md) is infeasible for some models on a 1-core box -- ContraRec's
CCC loss alone is ~125 s/step at the published batch 4096 (quadratic
[2B,2B] similarity work on single-thread BLAS), i.e. ~300 h for the
published run. This script subsamples p% of users (all their rows, same
leave-one-out structure), densely remaps ids, and re-samples the 99 dev/
test negatives within the subsample's item universe (uniform, excluding
the user's clicked items -- the reference's own protocol, BaseReader
clicked sets). BOTH frameworks then run the identical subsample, so
framework-vs-framework agreement is still exact closure evidence; only
the absolute level differs from the full-split published table.

Usage: python scripts/subsample_grocery.py --frac 0.03 --out /tmp/ref_rerun/data/Grocery_sub03
"""
from __future__ import annotations

import argparse
import ast
import os

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "data", "Grocery_and_Gourmet_Food")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frac", type=float, default=0.03)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", required=True)
    a = ap.parse_args()

    dfs = {s: pd.read_csv(os.path.join(SRC, s + ".csv"), sep="\t") for s in ("train", "dev", "test")}
    users = np.sort(dfs["train"]["user_id"].unique())
    rng = np.random.default_rng(a.seed)
    keep = np.sort(rng.choice(users, size=max(2, int(len(users) * a.frac)), replace=False))
    keep_set = set(keep.tolist())

    sub = {s: df[df["user_id"].isin(keep_set)].copy() for s, df in dfs.items()}
    items = np.sort(pd.concat([d["item_id"] for d in sub.values()]).unique())
    uid_map = {u: i + 1 for i, u in enumerate(keep)}
    iid_map = {it: i + 1 for i, it in enumerate(items)}
    n_items = len(items) + 1

    clicked = {}
    for s in ("train", "dev", "test"):
        for u, it in zip(sub[s]["user_id"], sub[s]["item_id"]):
            clicked.setdefault(u, set()).add(iid_map[it])

    os.makedirs(a.out, exist_ok=True)
    for s in ("train", "dev", "test"):
        df = sub[s]
        out = pd.DataFrame({
            "user_id": [uid_map[u] for u in df["user_id"]],
            "item_id": [iid_map[it] for it in df["item_id"]],
            "time": df["time"].to_numpy(),
        })
        if s != "train":
            negs = []
            for u in df["user_id"]:
                seen = clicked[u]
                pool = [i for i in range(1, n_items) if i not in seen]
                negs.append(list(map(int, rng.choice(pool, size=min(99, len(pool)), replace=False))))
            out["neg_items"] = [str(n) for n in negs]
        out.to_csv(os.path.join(a.out, s + ".csv"), sep="\t", index=False)

    # item_meta for KG-aware models: remap item ids, keep rows in-universe;
    # relation columns (r_*) point at item ids too -- drop out-of-universe refs (0 = pad)
    meta_path = os.path.join(SRC, "item_meta.csv")
    if os.path.exists(meta_path):
        meta = pd.read_csv(meta_path, sep="\t")
        meta = meta[meta["item_id"].isin(iid_map)].copy()
        meta["item_id"] = meta["item_id"].map(iid_map)
        for col in meta.columns:
            if col.startswith("r_"):
                def _remap(v):
                    try:
                        lst = ast.literal_eval(str(v))
                    except (ValueError, SyntaxError):
                        return v
                    return str([iid_map[x] for x in lst if x in iid_map])
                meta[col] = meta[col].map(_remap)
        meta.to_csv(os.path.join(a.out, "item_meta.csv"), sep="\t", index=False)

    n = {s: len(sub[s]) for s in sub}
    print(f"users={len(keep)} items={len(items)} rows={n}")


if __name__ == "__main__":
    main()
