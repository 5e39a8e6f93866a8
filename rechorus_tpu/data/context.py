"""Context-feature schema: canonical ordering + fused vocab layout.

The reference keeps one nn.Embedding per feature in a ModuleDict
(src/models/context/FM.py:34-42). TPU-first we fuse every categorical
feature into ONE embedding table with per-feature vocab offsets -- a
single gather instead of F small ones (better HBM locality, one fused
kernel), distributionally identical init.

Canonical feature order (parity with reference ContextModel.__init__,
src/models/BaseContextModel.py:43-44):
    user_features + item_features + situation_features + [user_id, item_id]
Kinds: 'cat' for *_c / *_id (embedding), 'float' for *_f (Dense(1->d)).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class ContextSchema:
    names: Tuple[str, ...]
    kinds: Tuple[str, ...]  # 'cat' | 'float'
    offsets: Tuple[int, ...]  # vocab offset per cat feature (0 for floats)
    total_vocab: int
    user_names: Tuple[str, ...]
    item_names: Tuple[str, ...]
    situ_names: Tuple[str, ...]

    @property
    def n_features(self) -> int:
        return len(self.names)

    @property
    def cat_positions(self) -> Tuple[int, ...]:
        return tuple(i for i, k in enumerate(self.kinds) if k == "cat")

    @property
    def float_positions(self) -> Tuple[int, ...]:
        return tuple(i for i, k in enumerate(self.kinds) if k == "float")


def is_categorical(name: str) -> bool:
    return name.endswith("_c") or name.endswith("_id")


def build_schema(corpus) -> ContextSchema:
    names = tuple(
        list(corpus.user_feature_names)
        + list(corpus.item_feature_names)
        + list(corpus.situation_feature_names)
        + ["user_id", "item_id"]
    )
    kinds = tuple("cat" if is_categorical(n) else "float" for n in names)
    offsets = []
    acc = 0
    for n, k in zip(names, kinds):
        if k == "cat":
            offsets.append(acc)
            acc += int(corpus.feature_max[n])
        else:
            offsets.append(0)
    return ContextSchema(
        names=names,
        kinds=kinds,
        offsets=tuple(offsets),
        total_vocab=acc,
        user_names=tuple(corpus.user_feature_names),
        item_names=tuple(corpus.item_feature_names),
        situ_names=tuple(corpus.situation_feature_names),
    )


def feature_matrices(corpus) -> Dict[str, np.ndarray]:
    """Dense lookup matrices for user/item features.

    item_features[i] rows indexed by item id (0 row = zeros for padding);
    same for users. Replaces the reference's per-row dict lookups
    (BaseContextModel.get_context_feature, :15-28).
    """
    out = {}
    if corpus.item_feature_names:
        mat = np.zeros((corpus.n_items, len(corpus.item_feature_names)), dtype=np.float64)
        for iid, feats in corpus.item_features.items():
            if 0 <= iid < corpus.n_items:
                mat[iid] = [feats[c] for c in corpus.item_feature_names]
        out["item"] = mat
    if corpus.user_feature_names:
        mat = np.zeros((corpus.n_users, len(corpus.user_feature_names)), dtype=np.float64)
        for uid, feats in corpus.user_features.items():
            if 0 <= uid < corpus.n_users:
                mat[uid] = [feats[c] for c in corpus.user_feature_names]
        out["user"] = mat
    return out
