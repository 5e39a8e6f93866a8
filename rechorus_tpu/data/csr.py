"""Compact CSR-backed corpus structures.

The reference keeps per-user corpus state in python dict-of-set /
dict-of-list objects (BaseReader.py:30-41, SeqReader.py:22-32) -- ~100
bytes per interaction of object overhead and O(n) python-loop build
time. Here the same state lives in two numpy arrays (flat values +
[n_users+1] offsets, 8-16 bytes/interaction) built by vectorized
sort/unique passes; `CSRRows` wraps them in a read-only Mapping so every
consumer of the dict contract (iteration, membership, `get`, slicing the
per-user value) keeps working unchanged.
"""
from __future__ import annotations

from typing import Iterator, Mapping

import numpy as np


class CSRRows(Mapping):
    """Read-only {user -> np.ndarray view of its rows} over CSR storage.

    `flat` is [T] (e.g. sorted clicked item ids) or [T, k] (e.g. history
    (item, time) pairs); `offsets` is [n_users + 1]. Rows are zero-copy
    views. Mimics the dict contract of the reader structures it
    replaces: iteration yields only users with non-empty rows, `get`
    returns a default for empty/out-of-range users, and membership tests
    on a row's value work because rows are numpy arrays.
    """

    __slots__ = ("flat", "offsets")

    def __init__(self, flat: np.ndarray, offsets: np.ndarray):
        self.flat = flat
        self.offsets = offsets

    def __getitem__(self, u: int) -> np.ndarray:
        return self.flat[self.offsets[u]: self.offsets[u + 1]]

    def get(self, u, default=()):
        if 0 <= u < len(self.offsets) - 1:
            row = self[u]
            if len(row):
                return row
        return default

    def __contains__(self, u) -> bool:
        return 0 <= u < len(self.offsets) - 1 and self.offsets[u] < self.offsets[u + 1]

    def __iter__(self) -> Iterator[int]:
        counts = np.diff(self.offsets)
        return iter(np.nonzero(counts)[0].tolist())

    def __len__(self) -> int:
        return int((np.diff(self.offsets) > 0).sum())

    # pickle support for the corpus cache (Mapping has no __dict__ here)
    def __getstate__(self):
        return (self.flat, self.offsets)

    def __setstate__(self, state):
        self.flat, self.offsets = state


class DualCSRRows(Mapping):
    """{user -> {"pos": [L,2] view, "neg": [L,2] view}} over two CSRs;
    keeps the ImpressionSeqReader.user_his dict contract."""

    __slots__ = ("pos", "neg")

    def __init__(self, pos: CSRRows, neg: CSRRows):
        self.pos = pos
        self.neg = neg

    def __getitem__(self, u):
        return {"pos": self.pos[u], "neg": self.neg[u]}

    def __contains__(self, u) -> bool:
        return u in self.pos or u in self.neg

    def __iter__(self) -> Iterator[int]:
        both = np.nonzero((np.diff(self.pos.offsets) > 0)
                          | (np.diff(self.neg.offsets) > 0))[0]
        return iter(both.tolist())

    def __len__(self) -> int:
        return int(((np.diff(self.pos.offsets) > 0)
                    | (np.diff(self.neg.offsets) > 0)).sum())

    def __getstate__(self):
        return (self.pos, self.neg)

    def __setstate__(self, state):
        self.pos, self.neg = state


def pairs_to_csr(users: np.ndarray, values: np.ndarray, n_users: int,
                 unique: bool = False):
    """Group (user, value) pairs into CSR (flat sorted by user, values
    ascending within user; `unique=True` dedups per user). Vectorized:
    one lexsort + bincount."""
    users = np.asarray(users, dtype=np.int64)
    values = np.asarray(values, dtype=np.int64)
    order = np.lexsort((values, users))
    u, v = users[order], values[order]
    if unique and len(u):
        keep = np.ones(len(u), dtype=bool)
        keep[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
        u, v = u[keep], v[keep]
    counts = np.bincount(u, minlength=n_users)
    offsets = np.zeros(n_users + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return v, offsets


def group_rows_to_csr(users: np.ndarray, rows: np.ndarray, n_users: int,
                      order: np.ndarray):
    """CSR of per-user row blocks keeping `order`'s relative ordering
    within each user (stable argsort by user). `rows` is [T, k]."""
    u = np.asarray(users, dtype=np.int64)[order]
    sidx = np.argsort(u, kind="stable")
    counts = np.bincount(u, minlength=n_users)
    offsets = np.zeros(n_users + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return np.asarray(rows)[order][sidx], offsets, sidx


def csr_fill_matrix(flat: np.ndarray, offsets: np.ndarray, max_len: int,
                    dtype=np.int32) -> np.ndarray:
    """[n_users, max_len] left-aligned padded matrix from CSR (pad 0)."""
    n_users = len(offsets) - 1
    counts = np.diff(offsets)
    mat = np.zeros((n_users, max_len), dtype=dtype)
    if len(flat):
        rows = np.repeat(np.arange(n_users), counts)
        cols = np.arange(len(flat)) - np.repeat(offsets[:-1], counts)
        mat[rows, cols] = flat
    return mat
