"""Shared neural blocks (flax.linen), mirroring reference src/utils/layers.py.

Weight init convention matches the reference BaseModel.init_weights
(src/models/BaseModel.py:29-35): N(0, 0.01) for Dense kernels+biases and
embedding tables.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

NORMAL_INIT = nn.initializers.normal(stddev=0.01)


def dense(features: int, use_bias: bool = True, name: Optional[str] = None) -> nn.Dense:
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=NORMAL_INIT,
        bias_init=NORMAL_INIT,
        name=name,
    )


def embed(num: int, dim: int, name: Optional[str] = None) -> nn.Embed:
    return nn.Embed(num, dim, embedding_init=NORMAL_INIT, name=name)


class MLPBlock(nn.Module):
    """Configurable MLP tower (reference src/utils/layers.py:201-243).

    hidden_units: sizes of hidden layers; output_dim appends a final
    linear head when not None. hidden_activations: name or list
    ('ReLU', 'Dice', 'Sigmoid', 'Tanh', ...). norm: None|'batch_norm'|
    'layer_norm'. On TPU we use LayerNorm for 'batch_norm' requests in
    eval-sensitive paths? No -- BatchNorm is supported via flax with
    running stats in the 'batch_stats' collection.
    """

    hidden_units: Sequence[int]
    hidden_activations: str | Sequence[str] = "ReLU"
    output_dim: Optional[int] = None
    dropout_rate: float = 0.0
    use_bias: bool = True
    norm: Optional[str] = None  # 'batch_norm' | 'layer_norm' | None

    @nn.compact
    def __call__(self, x, training: bool = False):
        acts = self.hidden_activations
        if isinstance(acts, str):
            acts = [acts] * len(self.hidden_units)
        for i, (h, act) in enumerate(zip(self.hidden_units, acts)):
            x = dense(h, use_bias=self.use_bias, name=f"dense_{i}")(x)
            if self.norm == "batch_norm":
                x = nn.BatchNorm(use_running_average=not training, name=f"bn_{i}")(x)
            elif self.norm == "layer_norm":
                x = nn.LayerNorm(name=f"ln_{i}")(x)
            if act.lower() == "dice":
                x = Dice(name=f"dice_{i}")(x)
            else:
                x = apply_activation(x, act)
            if self.dropout_rate > 0:
                x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
        if self.output_dim is not None:
            x = dense(self.output_dim, use_bias=self.use_bias, name="head")(x)
        return x


class Dice(nn.Module):
    """Adaptive activation from the DIN paper (reference layers.py:246-285)."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.zeros, x.shape[-1:])
        # data-dependent normalization over the batch axis, like the
        # reference's BatchNorm1d(affine=False) in eval-agnostic form
        mean = jnp.mean(x, axis=0, keepdims=True)
        var = jnp.var(x, axis=0, keepdims=True)
        x_norm = (x - mean) * jax.lax.rsqrt(var + 1e-8)
        p = jax.nn.sigmoid(x_norm)
        return p * x + (1.0 - p) * alpha * x


def apply_activation(x, name: str):
    name_l = name.lower()
    if name_l == "relu":
        return nn.relu(x)
    if name_l == "sigmoid":
        return nn.sigmoid(x)
    if name_l == "tanh":
        return nn.tanh(x)
    if name_l == "gelu":
        return nn.gelu(x)
    if name_l == "softplus":
        return jax.nn.softplus(x)
    if name_l in ("none", "linear", "identity"):
        return x
    raise ValueError(f"Unknown activation: {name}")


class AttLayer(nn.Module):
    """Attention signal over the second-to-last axis
    (reference layers.py:65-90, RecBole-derived): softmax(sum(relu(Wx) * h))."""

    att_dim: int

    @nn.compact
    def __call__(self, infeatures):
        att_signal = nn.relu(dense(self.att_dim, use_bias=False, name="w")(infeatures))
        h = self.param("h", nn.initializers.normal(1.0), (self.att_dim,))
        att_signal = (att_signal * h).sum(-1)
        return jax.nn.softmax(att_signal, axis=-1)


class MaskedGRU(nn.Module):
    """GRU over left-aligned padded sequences.

    Replaces the reference's sort + pack_padded_sequence dance
    (GRU4Rec.py:50-60) with a fixed-shape masked scan: returns
    (outputs [B, L, H], final_state [B, H]) where final_state is the
    hidden at position lengths-1 and outputs beyond lengths carry the
    last valid state (mask before use if that matters).
    """

    hidden_size: int

    @nn.compact
    def __call__(self, seq, lengths):
        rnn = nn.RNN(nn.GRUCell(features=self.hidden_size), return_carry=True)
        carry, outputs = rnn(seq, seq_lengths=lengths)
        return outputs, carry


class MultiHeadAttention(nn.Module):
    """Scaled dot-product MHA with optional shared K/Q projection and the
    reference's -inf mask + NaN-to-0 guard (src/utils/layers.py:9-63)."""

    d_model: int
    n_heads: int
    kq_same: bool = False
    use_bias: bool = True
    attention_d: int = -1  # output dim; defaults to d_model (reference :17-20)

    @nn.compact
    def __call__(self, q, k, v, mask=None):
        att_d = self.attention_d if self.attention_d > 0 else self.d_model
        d_k = att_d // self.n_heads
        k_proj = dense(att_d, self.use_bias, name="k")
        # kq_same=True shares the K projection for queries (reference
        # layers.py kq_same option used by SASRec)
        q_l = k_proj(q) if self.kq_same else dense(att_d, self.use_bias, name="q")(q)
        k_l = k_proj(k)
        v_l = dense(att_d, self.use_bias, name="v")(v)

        def heads(x):
            return x.reshape(x.shape[:-1] + (self.n_heads, d_k)).swapaxes(-2, -3)

        qh, kh, vh = heads(q_l), heads(k_l), heads(v_l)
        scores = jnp.einsum("...qd,...kd->...qk", qh, kh) / jnp.sqrt(d_k).astype(qh.dtype)
        if mask is not None:
            scores = jnp.where(mask, scores, -jnp.inf)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = jnp.nan_to_num(attn)  # rows fully masked -> 0 (reference NaN guard)
        out = jnp.einsum("...qk,...kd->...qd", attn, vh)
        out = out.swapaxes(-2, -3).reshape(out.shape[:-3] + (q.shape[-2], att_d))
        return out


class TransformerLayer(nn.Module):
    """Post-LN residual transformer block (reference layers.py:92-118)."""

    d_model: int
    d_ff: int
    n_heads: int
    dropout: float = 0.0
    kq_same: bool = False

    @nn.compact
    def __call__(self, seq, mask=None, training: bool = False):
        context = MultiHeadAttention(self.d_model, self.n_heads, kq_same=self.kq_same, name="mha")(
            seq, seq, seq, mask=mask
        )
        context = nn.Dropout(self.dropout, deterministic=not training)(context)
        context = nn.LayerNorm(name="ln1")(context + seq)
        ff = dense(self.d_ff, name="ff1")(context)
        ff = nn.relu(ff)
        ff = dense(self.d_model, name="ff2")(ff)
        ff = nn.Dropout(self.dropout, deterministic=not training)(ff)
        return nn.LayerNorm(name="ln2")(ff + context)
