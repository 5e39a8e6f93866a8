"""Shared neural blocks (flax.linen), mirroring reference src/utils/layers.py.

Weight init convention matches the reference BaseModel.init_weights
(src/models/BaseModel.py:29-35): N(0, 0.01) for Dense kernels+biases and
embedding tables.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

NORMAL_INIT = nn.initializers.normal(stddev=0.01)

# process-global Dense init scheme (--dense_init). The reference
# initializes EVERY Linear kernel+bias at N(0, 0.01)
# (src/models/BaseModel.py:29-35); for deep multiplicative chains
# (ETA/SDIM attention -> DNN) that start is numerically starved and,
# with l2>0 entering Adam's moments, sits on a knife-edge where the
# decay races the learning signal and can zero the DNN into a dead-ReLU
# collapse (measured: grads -> exact 0 by step ~150 on the ctr_long
# corpus; torch falls on the same knife-edge but may land on the live
# side depending on early bias dynamics). 'glorot' (kernel
# glorot-uniform, bias 0) is the documented deviation that removes the
# knife-edge; 'reference' stays bit-faithful to the reference contract.
_DENSE_INIT = "reference"


def set_dense_init(mode: str) -> None:
    global _DENSE_INIT
    if mode not in ("reference", "glorot"):
        raise ValueError(f"--dense_init must be 'reference' or 'glorot', got {mode!r}")
    _DENSE_INIT = mode


def dense(features: int, use_bias: bool = True, name: Optional[str] = None) -> nn.Dense:
    if _DENSE_INIT == "glorot":
        return nn.Dense(
            features,
            use_bias=use_bias,
            kernel_init=nn.initializers.glorot_uniform(),
            bias_init=nn.initializers.zeros_init(),
            name=name,
        )
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=NORMAL_INIT,
        bias_init=NORMAL_INIT,
        name=name,
    )


# process-global table storage dtype (mirrors parallel.mesh's row-pad
# knob): --bf16_emb sets bfloat16 so tables cost half the HBM. Gathered
# rows are cast back to f32 AFTER the take (nn.Embed's own dtype arg
# would promote the WHOLE table before gathering).
_TABLE_DTYPE = None


def set_table_dtype(dt) -> None:
    global _TABLE_DTYPE
    _TABLE_DTYPE = dt


# sparse-lookup context for the --sparse_emb_grad training lane: maps a
# table's full param path, e.g. ('i_embeddings', 'embedding'), to
# (sorted_rows [R], row_vals [R, D]). While set (only inside the train
# step's loss_fn trace), TableEmbed resolves lookups from row_vals via
# binary search instead of gathering the dense table, so the backward
# pass produces an [R, D] cotangent instead of materializing an [N, D]
# zeros+scatter for the whole table. Ids missing from sorted_rows (a
# lazy_table_specs coverage gap) fall back to a stop-gradient dense
# gather: the forward stays exact, only that row's update is dropped --
# the same failure mode as the dense-grad lazy lane.
_SPARSE_LOOKUP: dict = {}


def set_sparse_lookup(mapping) -> None:
    global _SPARSE_LOOKUP
    _SPARSE_LOOKUP = mapping if mapping is not None else {}


class TableEmbed(nn.Embed):
    """nn.Embed that (a) gathers in storage dtype and casts only the
    gathered rows to f32 (so --bf16_emb never promotes the whole table),
    and (b) honors the sparse-lookup context above. Param path is
    identical to nn.Embed ('<name>/embedding'), so checkpoints and the
    catalog protocol see the same tree."""

    def __call__(self, inputs):
        table = self.embedding
        out_dtype = jnp.float32 if table.dtype in (jnp.bfloat16, jnp.float16) else table.dtype
        entry = None
        if _SPARSE_LOOKUP:
            path = tuple(self.scope.path) + ("embedding",)
            entry = _SPARSE_LOOKUP.get(path)
        if entry is None:
            return jnp.take(table, inputs, axis=0).astype(out_dtype)
        # (rows sorted ascending, vals [R, D] f32[, fallback table]). The
        # packed-carry lane passes the [N, 3D] [p|mu|nu] block as the
        # fallback source (the flax-visible param leaf is a dead zeros
        # placeholder there: gathering from a lane SLICE of the packed
        # table would make XLA materialize the [N, D] slice every step).
        rows, vals = entry[0], entry[1]
        fb_table = entry[2] if len(entry) > 2 and entry[2] is not None else table
        if len(entry) > 3:
            # O(1) dense id->slot map (ops/lazy_adam.row_pos_map): one
            # gather instead of the ~log2(R) sequentially dependent
            # searchsorted levels per covered feed gather
            pos = entry[3][inputs]
            hit = pos < vals.shape[0]
            pos = jnp.minimum(pos, vals.shape[0] - 1)
        else:
            from rechorus_tpu.ops.kg import searchsorted_unrolled

            # static unroll: jnp.searchsorted is a sequential scan on TPU
            pos = searchsorted_unrolled(rows, inputs)
            pos = jnp.clip(pos, 0, rows.shape[0] - 1)
            hit = rows[pos] == inputs
        fallback = jax.lax.stop_gradient(jnp.take(fb_table, inputs, axis=0))
        fallback = fallback[..., : vals.shape[-1]]  # packed: param lanes first
        out = jnp.where(hit[..., None], vals[pos], fallback.astype(vals.dtype))
        return out.astype(out_dtype)


class StorageEmbed(TableEmbed):
    """Backwards-compatible alias (bf16 storage tables)."""


def embed(num: int, dim: int, name: Optional[str] = None, init=NORMAL_INIT) -> nn.Embed:
    """Embedding table; rows round up to the mesh row-pad quantum
    (parallel.mesh.set_table_row_pad) so 'model'-axis row-sharding always
    divides. Ids are < num, so the dead tail rows are never gathered.
    Every model-level table gather should go through this (TableEmbed):
    raw `self.param(...)[ids]` gathers bypass the --bf16_emb storage cast
    AND the --sparse_emb_grad lookup context (silent zero grads there)."""
    from rechorus_tpu.parallel.mesh import pad_rows

    if _TABLE_DTYPE is not None:
        return StorageEmbed(pad_rows(num), dim, embedding_init=init,
                            param_dtype=_TABLE_DTYPE, name=name)
    return TableEmbed(pad_rows(num), dim, embedding_init=init, name=name)


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
                # momentum 0.9 == torch BatchNorm1d momentum 0.1
                x = nn.BatchNorm(use_running_average=not training,
                                 momentum=0.9, epsilon=1e-5, name=f"bn_{i}")(x)
            elif self.norm == "layer_norm":
                x = nn.LayerNorm(epsilon=1e-5, name=f"ln_{i}")(x)
            if act.lower() == "dice":
                x = Dice(name=f"dice_{i}")(x, training=training)
            else:
                x = apply_activation(x, act)
            if self.dropout_rate > 0:
                x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
        if self.output_dim is not None:
            x = dense(self.output_dim, use_bias=self.use_bias, name="head")(x)
        return x


class Dice(nn.Module):
    """Adaptive activation from the DIN paper (reference layers.py:246-285).

    Torch parity: an affine BatchNorm1d(eps=1e-8) with running statistics
    (batch stats while training, running averages at eval; flax momentum
    0.9 == torch momentum 0.1), then p*x + (1-p)*alpha*x."""

    @nn.compact
    def __call__(self, x, training: bool = False):
        alpha = self.param("alpha", nn.initializers.zeros, x.shape[-1:])
        x_norm = nn.BatchNorm(use_running_average=not training,
                              momentum=0.9, epsilon=1e-8, name="bn")(x)
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


class AttentionalGRU(nn.Module):
    """AGRU / AUGRU / plain GRU scan with attention-modulated update gate.

    Replaces the reference's custom DynamicGRU / AGRUCell / AUGRUCell over
    packed sequences (src/models/context_seq/DIEN.py:287-369) with a
    fixed-shape masked lax.scan. Torch GRU gate order (r, z, n) with
    n = tanh(W_in x + b_in + r * (W_hn h + b_hn)).

    inputs [B, T, D], att_scores [B, T], lengths [B] -> final hidden [B, H].
    gru_type: 'AGRU'  -> h' = (1-a) h + a n
              'AUGRU' -> z' = a * z; h' = (1-z') h + z' n
              'AIGRU' -> standard GRU over a-scaled inputs
    """

    hidden_size: int
    gru_type: str = "AUGRU"

    @nn.compact
    def __call__(self, inputs, att_scores, lengths):
        B, T, D = inputs.shape
        Hs = self.hidden_size
        scale = 1.0 / (Hs ** 0.5)

        def u_init(key, shape, dtype=jnp.float32):  # ~ torch GRU default U(-s, s)
            return jax.random.uniform(key, shape, dtype, -scale, scale)

        wx = self.param("wx", u_init, (D, 3 * Hs))
        wh = self.param("wh", u_init, (Hs, 3 * Hs))
        # names contain 'bias' so the optimizer's decay mask excludes them
        # (reference groups on `'bias' in name`, BaseModel.py:63-72)
        bx = self.param("bias_x", u_init, (3 * Hs,))
        bh = self.param("bias_h", u_init, (3 * Hs,))

        if self.gru_type == "AIGRU":
            inputs = inputs * att_scores[:, :, None]

        def step(h, xs):
            x_t, a_t, t = xs
            gi = x_t @ wx + bx
            gh = h @ wh + bh
            i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
            h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
            r = jax.nn.sigmoid(i_r + h_r)
            z = jax.nn.sigmoid(i_z + h_z)
            n = jnp.tanh(i_n + r * h_n)
            if self.gru_type == "AGRU":
                a = a_t[:, None]
                h_new = (1.0 - a) * h + a * n
            elif self.gru_type == "AUGRU":
                z = a_t[:, None] * z
                h_new = (1.0 - z) * h + z * n
            else:  # plain GRU (AIGRU path)
                h_new = (1.0 - z) * h + z * n
            valid = (t < lengths)[:, None]
            return jnp.where(valid, h_new, h), None

        h0 = jnp.zeros((B, Hs), inputs.dtype)
        ts = jnp.arange(T)
        h, _ = jax.lax.scan(
            step, h0, (inputs.swapaxes(0, 1), att_scores.swapaxes(0, 1), ts)
        )
        return h


class MultiHeadAttention(nn.Module):
    """Scaled dot-product MHA with optional shared K/Q projection and the
    reference's -inf mask + NaN-to-0 guard (src/utils/layers.py:9-63)."""

    d_model: int
    n_heads: int
    kq_same: bool = False
    use_bias: bool = True
    attention_d: int = -1  # output dim; defaults to d_model (reference :17-20)
    out_proj: bool = False  # torch nn.MultiheadAttention-style output proj

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
        # observability hook (reference check_list logs attention
        # distributions, utils/utils.py:37-44): materialized only when
        # apply() makes 'intermediates' mutable (BaseRunner.check)
        self.sow("intermediates", "attention", attn)
        out = jnp.einsum("...qk,...kd->...qd", attn, vh)
        out = out.swapaxes(-2, -3).reshape(out.shape[:-3] + (q.shape[-2], att_d))
        if self.out_proj:
            out = dense(att_d, self.use_bias, name="out_proj")(out)
        return out


class BiLSTM(nn.Module):
    """Bidirectional LSTM over padded sequences -> [B, L, 2*hidden]."""

    hidden_size: int

    @nn.compact
    def __call__(self, seq, lengths=None):
        fwd = nn.RNN(nn.OptimizedLSTMCell(features=self.hidden_size), name="fwd")
        bwd = nn.RNN(nn.OptimizedLSTMCell(features=self.hidden_size), reverse=True,
                     keep_order=True, name="bwd")
        out_f = fwd(seq, seq_lengths=lengths)
        out_b = bwd(seq, seq_lengths=lengths)
        return jnp.concatenate([out_f, out_b], axis=-1)


class MultiHeadTargetAttention(nn.Module):
    """Target attention: one query per candidate over a shared history.

    FuxiCTR-derived (reference layers.py:121-198). Vectorized over the
    candidate axis: target [B, C, D], history [B, H, D], mask [B, C, H]
    (True = attend) -> [B, C, D]. The reference flattens to (B*C) and
    repeats the history per candidate.
    """

    input_dim: int = 64
    attention_dim: int = 64
    num_heads: int = 1
    dropout_rate: float = 0.0
    use_scale: bool = True
    use_qkvo: bool = True

    @nn.compact
    def __call__(self, target, history, mask=None, training: bool = False):
        att_dim = self.attention_dim if self.use_qkvo else self.input_dim
        head_dim = att_dim // self.num_heads
        if self.use_qkvo:
            q = dense(att_dim, use_bias=False, name="W_q")(target)
            k = dense(att_dim, use_bias=False, name="W_k")(history)
            v = dense(att_dim, use_bias=False, name="W_v")(history)
        else:
            q, k, v = target, history, history
        B, C = q.shape[:2]
        H = k.shape[1]
        qh = q.reshape(B, C, self.num_heads, head_dim)
        kh = k.reshape(B, H, self.num_heads, head_dim)
        vh = v.reshape(B, H, self.num_heads, head_dim)
        scores = jnp.einsum("bcnd,bhnd->bnch", qh, kh)
        if self.use_scale:
            scores = scores / (head_dim ** 0.5)
        if mask is not None:
            scores = jnp.where(mask[:, None, :, :], scores, -1.0e9)
        attn = jax.nn.softmax(scores, axis=-1)
        if self.dropout_rate > 0:
            attn = nn.Dropout(self.dropout_rate, deterministic=not training)(attn)
        out = jnp.einsum("bnch,bhnd->bcnd", attn, vh).reshape(B, C, att_dim)
        if self.use_qkvo:
            out = dense(self.input_dim, use_bias=False, name="W_o")(out)
        return out


class TransformerLayer(nn.Module):
    """Post-LN residual transformer block (reference layers.py:92-118)."""

    d_model: int
    d_ff: int
    n_heads: int
    dropout: float = 0.0
    kq_same: bool = False
    out_proj: bool = False

    @nn.compact
    def __call__(self, seq, mask=None, training: bool = False):
        context = MultiHeadAttention(
            self.d_model, self.n_heads, kq_same=self.kq_same, out_proj=self.out_proj, name="mha"
        )(seq, seq, seq, mask=mask)
        context = nn.Dropout(self.dropout, deterministic=not training)(context)
        # epsilon matches torch nn.LayerNorm (1e-5; flax defaults to 1e-6)
        context = nn.LayerNorm(epsilon=1e-5, name="ln1")(context + seq)
        ff = dense(self.d_ff, name="ff1")(context)
        ff = nn.relu(ff)
        ff = dense(self.d_model, name="ff2")(ff)
        ff = nn.Dropout(self.dropout, deterministic=not training)(ff)
        return nn.LayerNorm(epsilon=1e-5, name="ln2")(ff + context)
