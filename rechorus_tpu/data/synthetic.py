"""Synthetic dataset generator (reference CSV contract).

Emits train/dev/test.csv (+ optional item_meta/user_meta, labels,
impressions) in the exact column conventions the readers expect
(reference data/README.md:9-60). Used by tests and as a quick-start
fixture; generates data with learnable structure (block preference
matrix) so tiny end-to-end runs show real metric lift.
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd


def make_topk_dataset(
    path: str,
    n_users: int = 200,
    n_items: int = 100,
    n_per_user: int = 12,
    n_neg: int = 19,
    n_groups: int = 4,
    seed: int = 0,
):
    """Block-structured interactions: user group g prefers item group g."""
    rng = np.random.default_rng(seed)
    rows = []
    for u in range(1, n_users + 1):
        g = u % n_groups
        group_items = np.arange(1, n_items + 1)[(np.arange(1, n_items + 1) % n_groups) == g]
        t0 = rng.integers(1e8, 2e8)
        items = rng.choice(group_items, size=min(n_per_user, len(group_items)), replace=False)
        for j, it in enumerate(items):
            rows.append((u, int(it), int(t0 + j * 86400)))
    # guarantee the top item id is observed so the reader's n_items covers
    # the full sampled-negative range [1, n_items]
    if not any(r[1] == n_items for r in rows):
        rows.append((1, n_items, int(rng.integers(1e8, 2e8))))
    df = pd.DataFrame(rows, columns=["user_id", "item_id", "time"])
    df = df.sort_values(by=["time", "user_id"], kind="mergesort").reset_index(drop=True)
    clicked = df.groupby("user_id")["item_id"].apply(set).to_dict()

    leave = df.groupby("user_id").head(1)
    rest = df.drop(leave.index)
    test = rest.groupby("user_id").tail(1)
    rest = rest.drop(test.index)
    dev = rest.groupby("user_id").tail(1)
    rest = rest.drop(dev.index)
    train = pd.concat([leave, rest]).sort_index()

    def add_negs(d):
        d = d.copy()
        neg = rng.integers(1, n_items + 1, size=(len(d), n_neg))
        for i, uid in enumerate(d["user_id"].to_numpy()):
            cset = clicked[uid]
            for j in range(n_neg):
                while neg[i, j] in cset:
                    neg[i, j] = rng.integers(1, n_items + 1)
        d["neg_items"] = [list(map(int, r)) for r in neg]
        return d

    os.makedirs(path, exist_ok=True)
    train.to_csv(os.path.join(path, "train.csv"), sep="\t", index=False)
    add_negs(dev).to_csv(os.path.join(path, "dev.csv"), sep="\t", index=False)
    add_negs(test).to_csv(os.path.join(path, "test.csv"), sep="\t", index=False)
    return {"n_users": n_users, "n_items": n_items}


def make_ctr_dataset(
    path: str,
    n_users: int = 150,
    n_items: int = 80,
    n_per_user: int = 14,
    n_groups: int = 4,
    seed: int = 1,
    expose_bias: float = 0.0,
    topk: bool = False,
):
    """CTR rows with learnable labels: click iff user group ~ item category
    (plus noise), item_meta with i_category_c, user_meta with u_group_c,
    situation column c_hour_c. expose_bias > 0 skews each user's exposures
    toward their own group so HISTORY becomes informative (for testing
    sequential models that predict from history alone).

    topk=True emits the reference's ML_1MTOPK contract instead (context
    top-k protocol, data/README.md:9-33): positive rows only, no label
    column, dev/test carry a sampled 99-negative ``neg_items`` column
    (uniform, excluding the user's clicked items)."""
    rng = np.random.default_rng(seed)
    all_items = np.arange(1, n_items + 1)
    rows = []
    for u in range(1, n_users + 1):
        g = u % n_groups
        t0 = rng.integers(1e8, 2e8)
        if expose_bias > 0:
            group_items = all_items[all_items % n_groups == g]
            n_own = min(int(n_per_user * expose_bias), len(group_items))
            items = np.concatenate([
                rng.choice(group_items, size=n_own, replace=False),
                rng.choice(all_items, size=n_per_user - n_own, replace=False),
            ])
            rng.shuffle(items)
        else:
            items = rng.choice(all_items, size=n_per_user, replace=False)
        for j, it in enumerate(items):
            cat = int(it) % n_groups
            p = 0.8 if cat == g else 0.15
            label = int(rng.random() < p)
            hour = int(rng.integers(0, 24))
            rows.append((u, int(it), int(t0 + j * 86400), label, hour))
    df = pd.DataFrame(rows, columns=["user_id", "item_id", "time", "label", "c_hour_c"])
    df = df.sort_values(by=["time", "user_id"], kind="mergesort").reset_index(drop=True)
    if topk:
        df = df[df["label"] == 1].drop(columns=["label"]).reset_index(drop=True)
    # global-time split 80/10/10 (reference CTR datasets use timeline split)
    n = len(df)
    train = df.iloc[: int(n * 0.8)]
    dev = df.iloc[int(n * 0.8) : int(n * 0.9)]
    test = df.iloc[int(n * 0.9) :]
    if topk:
        clicked = df.groupby("user_id")["item_id"].agg(set).to_dict()
        def _negs(split):
            out = []
            for u in split["user_id"]:
                pool = np.setdiff1d(all_items, np.array(sorted(clicked[u])))
                out.append(str(list(map(int, rng.choice(pool, size=min(99, len(pool)),
                                                        replace=False)))))
            return out
        dev = dev.assign(neg_items=_negs(dev))
        test = test.assign(neg_items=_negs(test))
    os.makedirs(path, exist_ok=True)
    train.to_csv(os.path.join(path, "train.csv"), sep="\t", index=False)
    dev.to_csv(os.path.join(path, "dev.csv"), sep="\t", index=False)
    test.to_csv(os.path.join(path, "test.csv"), sep="\t", index=False)
    item_meta = pd.DataFrame({
        "item_id": np.arange(1, n_items + 1),
        "i_category_c": [i % n_groups for i in range(1, n_items + 1)],
        "i_quality_f": rng.uniform(0, 1, size=n_items).round(3),
    })
    item_meta.to_csv(os.path.join(path, "item_meta.csv"), sep="\t", index=False)
    user_meta = pd.DataFrame({
        "user_id": np.arange(1, n_users + 1),
        "u_group_c": [u % n_groups for u in range(1, n_users + 1)],
    })
    user_meta.to_csv(os.path.join(path, "user_meta.csv"), sep="\t", index=False)
    return {"n_users": n_users, "n_items": n_items}


def make_ctr_long_dataset(
    path: str,
    n_users: int = 300,
    n_items: int = 200,
    n_per_user: int = 60,
    n_groups: int = 8,
    win_lo: int = 4,
    win_hi: int = 9,
    seed: int = 11,
):
    """Long-range-dependency CTR corpus (VERDICT r3 item 4): the label of
    row j is click-iff ANY item `win_lo`..`win_hi` interactions EARLIER
    shares the target's category (p=0.85 on presence, 0.15 otherwise).

    Why this makes long-history retrieval CAUSAL for lift:
      * the informative window sits deeper than the harness' recent_k
        (3) but inside history_max (10), so models attending only to
        recent items see noise;
      * the dependency SLIDES with j, so a user-id embedding cannot
        memorize it (unlike a fixed per-user persona);
      * the signal is "a category-similar item is PRESENT in the long
        window", which is exactly what ETA's SimHash top-k / SDIM's
        bucket-collision retrieval detect (reference ETA.py:24-122,
        SDIM.py:114-131) -- no positional precision required.
    u_group_c is RANDOM (uninformative) so user features cannot leak the
    signal; c_hour_c is random too."""
    rng = np.random.default_rng(seed)
    all_items = np.arange(1, n_items + 1)
    rows = []
    for u in range(1, n_users + 1):
        t0 = rng.integers(1e8, 2e8)
        items = rng.choice(all_items, size=n_per_user, replace=True)
        cats = items % n_groups
        for j, it in enumerate(items):
            if j >= win_lo:
                window = cats[max(0, j - win_hi): j - win_lo + 1]
                p = 0.85 if (window == cats[j]).any() else 0.15
            else:
                p = 0.5  # no past to depend on: pure noise rows
            label = int(rng.random() < p)
            hour = int(rng.integers(0, 24))
            rows.append((u, int(it), int(t0 + j * 86400), label, hour))
    df = pd.DataFrame(rows, columns=["user_id", "item_id", "time", "label", "c_hour_c"])
    df = df.sort_values(by=["time", "user_id"], kind="mergesort").reset_index(drop=True)
    n = len(df)
    train = df.iloc[: int(n * 0.8)]
    dev = df.iloc[int(n * 0.8): int(n * 0.9)]
    test = df.iloc[int(n * 0.9):]
    os.makedirs(path, exist_ok=True)
    train.to_csv(os.path.join(path, "train.csv"), sep="\t", index=False)
    dev.to_csv(os.path.join(path, "dev.csv"), sep="\t", index=False)
    test.to_csv(os.path.join(path, "test.csv"), sep="\t", index=False)
    item_meta = pd.DataFrame({
        "item_id": all_items,
        "i_category_c": (all_items % n_groups).astype(int),
        "i_quality_f": rng.uniform(0, 1, size=n_items).round(3),
    })
    item_meta.to_csv(os.path.join(path, "item_meta.csv"), sep="\t", index=False)
    user_meta = pd.DataFrame({
        "user_id": np.arange(1, n_users + 1),
        "u_group_c": rng.integers(0, n_groups, size=n_users),
    })
    user_meta.to_csv(os.path.join(path, "user_meta.csv"), sep="\t", index=False)
    return {"n_users": n_users, "n_items": n_items,
            "win_lo": win_lo, "win_hi": win_hi}


def make_impression_dataset(
    path: str,
    n_users: int = 120,
    n_items: int = 80,
    n_impressions: int = 8,
    n_groups: int = 4,
    seed: int = 2,
    noise: float = 0.0,
):
    """Impression rows: several rows per (user, time) request; positives
    biased to the user's group so ranking positives above negatives is
    learnable. Splits: last impression -> test, second-to-last -> dev.

    noise > 0 makes the task mid-SNR (each pos/neg drawn from the WRONG
    pool with that probability) so metrics land well below 1.0 -- a
    saturated task cannot detect a subtly wrong loss (cross_parity)."""
    rng = np.random.default_rng(seed)
    all_items = np.arange(1, n_items + 1)
    rows = []
    for u in range(1, n_users + 1):
        g = u % n_groups
        group_items = all_items[all_items % n_groups == g]
        other_items = all_items[all_items % n_groups != g]
        t0 = int(rng.integers(1e8, 2e8))
        for imp in range(n_impressions):
            t = t0 + imp * 86400
            n_pos = int(rng.integers(1, 4))
            n_neg = int(rng.integers(3, 7))
            pos = [int(rng.choice(other_items if rng.random() < noise else group_items))
                   for _ in range(n_pos)]
            neg = [int(rng.choice(group_items if rng.random() < noise else other_items))
                   for _ in range(n_neg)]
            for it in pos:
                rows.append((u, int(it), t, 1))
            for it in neg:
                rows.append((u, int(it), t, 0))
    df = pd.DataFrame(rows, columns=["user_id", "item_id", "time", "label"])
    df = df.sort_values(by=["user_id", "time"], kind="mergesort").reset_index(drop=True)
    # split by impression index per user
    t_per_user = df.groupby("user_id")["time"].transform("max")
    test = df[df["time"] == t_per_user]
    rest = df[df["time"] < t_per_user]
    t2 = rest.groupby("user_id")["time"].transform("max")
    dev = rest[rest["time"] == t2]
    train = rest[rest["time"] < t2]
    os.makedirs(path, exist_ok=True)
    train.to_csv(os.path.join(path, "train.csv"), sep="\t", index=False)
    dev.to_csv(os.path.join(path, "dev.csv"), sep="\t", index=False)
    test.to_csv(os.path.join(path, "test.csv"), sep="\t", index=False)
    return {"n_users": n_users, "n_items": n_items}


def make_kg_dataset(
    path: str,
    n_users: int = 200,
    n_items: int = 100,
    n_per_user: int = 12,
    n_neg: int = 19,
    n_groups: int = 4,
    seed: int = 3,
):
    """Top-k dataset + item_meta.csv with r_complement / r_substitute list
    columns (same-group items related) and an i_category_c attribute, in
    the reference's KG conventions (data/README.md + KGReader contract)."""
    stats = make_topk_dataset(path, n_users, n_items, n_per_user, n_neg, n_groups, seed)
    rng = np.random.default_rng(seed + 100)
    items = np.arange(1, n_items + 1)
    comp, subst = [], []
    for it in items:
        g = it % n_groups
        same = items[(items % n_groups == g) & (items != it)]
        comp.append(sorted(map(int, rng.choice(same, size=min(3, len(same)), replace=False))))
        subst.append(sorted(map(int, rng.choice(same, size=min(2, len(same)), replace=False))))
    item_meta = pd.DataFrame({
        "item_id": items,
        "r_complement": [str(x) for x in comp],
        "r_substitute": [str(x) for x in subst],
        "i_category_c": [int(i % n_groups) + 1 for i in items],
    })
    item_meta.to_csv(os.path.join(path, "item_meta.csv"), sep="\t", index=False)
    return stats
