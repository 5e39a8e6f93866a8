"""Device-side negative sampling and the anti-leak candidate permutation.

Replaces the reference's host-side numpy loops:
  * rejection sampling of negatives vs train_clicked_set
    (src/models/BaseModel.py:206-214) -> vectorized resampling rounds
    against a padded per-user clicked matrix, fully jittable.
  * anti-position-leak shuffle of candidate columns + un-permute of
    predictions (src/helpers/BaseRunner.py:187-202) -> take_along_axis
    with an argsort-of-uniform permutation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_negatives(
    key: jax.Array,
    users: jnp.ndarray,
    clicked_pad: jnp.ndarray,
    num_neg: int,
    n_items: int,
    rounds: int = 8,
) -> jnp.ndarray:
    """Uniform negatives in [1, n_items) avoiding each user's clicked set.

    users: [B] int32; clicked_pad: [n_users, M] int32 padded with 0.
    Returns [B, num_neg] int32. After `rounds` resampling rounds the
    residual collision probability is (|clicked|/n_items)^rounds --
    negligible; distributionally equivalent to the reference's
    while-loop rejection sampling.
    """
    B = users.shape[0]
    clicked = clicked_pad[users]  # [B, M]

    def collides(neg):
        return (neg[:, :, None] == clicked[:, None, :]).any(axis=-1)

    k0, key = jax.random.split(key)
    neg = jax.random.randint(k0, (B, num_neg), 1, n_items, dtype=jnp.int32)

    def body(i, carry):
        neg, key = carry
        key, sub = jax.random.split(key)
        fresh = jax.random.randint(sub, (B, num_neg), 1, n_items, dtype=jnp.int32)
        neg = jnp.where(collides(neg), fresh, neg)
        return neg, key

    neg, _ = jax.lax.fori_loop(0, rounds, body, (neg, key))
    return neg


def candidate_permutation(key: jax.Array, shape):
    """Random per-row column permutation indices; returns (idx, inverse).

    Models can't memorize 'column 0 = target'; the runner applies idx to
    item_id and every candidate-aligned feed key, then restores
    predictions to original order with `restore_predictions` before the
    loss (reference BaseRunner.py:187-202).
    """
    u = jax.random.uniform(key, shape)
    idx = jnp.argsort(u, axis=-1)
    inv = jnp.argsort(idx, axis=-1)
    return idx, inv


def restore_predictions(predictions: jnp.ndarray, inv: jnp.ndarray) -> jnp.ndarray:
    return jnp.take_along_axis(predictions, inv, axis=-1)
