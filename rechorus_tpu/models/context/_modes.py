"""Shared helpers for the CTR/TopK mode-class pattern."""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


def ctr_out(prediction, feed):
    """Wrap a raw [B, 1] score into the CTR contract: sigmoid + label."""
    return {"prediction": nn.sigmoid(prediction.reshape(-1)), "label": feed["label"].reshape(-1)}
