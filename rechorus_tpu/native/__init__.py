"""ctypes bindings for the native host-side corpus kernels.

Compiled lazily with g++ on first use (cached next to the source);
everything degrades gracefully to the pure-numpy fallbacks in
data/readers.py when no compiler is available.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "corpus_ops.cpp")
_LIB = os.path.join(_DIR, "libcorpus_ops.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB)
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.build_history_arrays.argtypes = [
            i64p, i64p, ctypes.c_int64, i64p, i64p, i64p, ctypes.c_int64,
            i32p, i64p, i32p]
        lib.build_history_arrays.restype = None
        lib.fill_clicked_matrix.argtypes = [
            i64p, i64p, ctypes.c_int64, ctypes.c_int64, i32p]
        lib.fill_clicked_matrix.restype = None
        _lib = lib
    except Exception as e:  # no compiler / sandbox: numpy fallback
        logging.debug("native corpus_ops unavailable (%s); using numpy fallback", e)
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def build_history_arrays(users, positions, his_items_flat, his_times_flat,
                         user_offsets, history_max: int):
    """Returns (items [n,H] int32, times [n,H] int64, lengths [n] int32)."""
    lib = _load()
    n = len(users)
    H = history_max
    out_items = np.zeros((n, H), dtype=np.int32)
    out_times = np.zeros((n, H), dtype=np.int64)
    out_len = np.zeros((n,), dtype=np.int32)
    lib.build_history_arrays(
        np.ascontiguousarray(users, dtype=np.int64),
        np.ascontiguousarray(positions, dtype=np.int64),
        n,
        np.ascontiguousarray(his_items_flat, dtype=np.int64),
        np.ascontiguousarray(his_times_flat, dtype=np.int64),
        np.ascontiguousarray(user_offsets, dtype=np.int64),
        H, out_items, out_times, out_len)
    return out_items, out_times, out_len


def fill_clicked_matrix(clicked_flat, offsets, n_users: int, max_len: int):
    lib = _load()
    out = np.zeros((n_users, max_len), dtype=np.int32)
    lib.fill_clicked_matrix(
        np.ascontiguousarray(clicked_flat, dtype=np.int64),
        np.ascontiguousarray(offsets, dtype=np.int64),
        n_users, max_len, out)
    return out
