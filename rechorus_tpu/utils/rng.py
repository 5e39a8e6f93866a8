"""Explicit RNG key plumbing.

The reference relies on global numpy/torch seeds (src/utils/utils.py:13-20)
for negative sampling, shuffling, dropout and the anti-leak permutation.
JAX requires explicit keys; we derive every stream from a single master
seed so runs are reproducible, with documented non-bit-identical (but
distributionally identical) behavior vs the reference.
"""
from __future__ import annotations

import random

import jax
import numpy as np


def init_seed(seed: int) -> None:
    """Seed host-side RNGs (python + numpy). Device RNG uses explicit keys."""
    random.seed(seed)
    np.random.seed(seed)


def master_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def epoch_key(key: jax.Array, epoch: int) -> jax.Array:
    return jax.random.fold_in(key, epoch)
