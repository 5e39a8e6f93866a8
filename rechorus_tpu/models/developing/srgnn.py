"""SRGNN -- session graph + gated GNN (Wu et al., AAAI'19).

Reference behavior: src/models/developing/SRGNN.py: each history becomes
a session graph (unique item nodes, in/out-degree-normalized adjacency of
consecutive transitions, SRGNN.py:43-76, built per row on CPU); a gated
GNN cell propagates node states (102-150); soft attention over sequence
states + last state -> linear transform -> dot scoring.

TPU design: the per-row python graph build becomes device ops -- node
dedup via jnp.unique(size=H), alias via searchsorted, adjacency via
scatter -- all inside the jitted step (vmapped implicitly over batch).
"""
from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax
import jax.numpy as jnp

from rechorus_tpu.models.base import SequentialModel
from rechorus_tpu.registry import register_model


def build_session_graph(history):
    """history [B, H] -> (alias [B, H], A [B, H, 2H], nodes [B, H]).

    Fixed-shape equivalent of reference _get_slice (SRGNN.py:43-76):
    nodes = sorted unique items (0-padded), alias = node index per
    position, A = [in-normalized | out-normalized] adjacency.
    """

    def one(seq):
        H = seq.shape[0]
        # re-sort: unique(size=) appends fill pads at the END, which would
        # break the searchsorted alias lookup
        nodes = jnp.sort(jnp.unique(seq, size=H, fill_value=0))
        alias = jnp.searchsorted(nodes, seq)
        u, v = alias[:-1], alias[1:]
        ok = (seq[:-1] > 0) & (seq[1:] > 0)
        a = jnp.zeros((H, H))
        a = a.at[jnp.where(ok, u, 0), jnp.where(ok, v, 0)].max(ok.astype(jnp.float32))
        sum_in = a.sum(0)
        a_in = a / jnp.where(sum_in == 0, 1.0, sum_in)
        sum_out = a.sum(1)
        a_out = (a.T / jnp.where(sum_out == 0, 1.0, sum_out))
        # reference: concat([A_in, A_out]).T -> [H, 2H]
        return alias, jnp.concatenate([a_in, a_out], axis=0).T, nodes

    return jax.vmap(one)(history)


class GatedGNN(nn.Module):
    """GRU-style gated propagation over the session graph
    (reference GNN, SRGNN.py:102-150)."""

    emb_size: int
    step: int = 1

    @nn.compact
    def __call__(self, A, hidden):
        d = self.emb_size
        std = 1.0 / (d ** 0.5)

        def uni(key, shape, dtype=jnp.float32):  # U(-std, std), reference :30-32
            return jax.random.uniform(key, shape, dtype, -std, std)

        def p(name, shape):
            return self.param(name, uni, shape)

        w_ih = p("w_ih", (2 * d, 3 * d))
        w_hh = p("w_hh", (d, 3 * d))
        b_ih = p("b_ih", (3 * d,))
        b_hh = p("b_hh", (3 * d,))
        b_iah = p("b_iah", (d,))
        b_ioh = p("b_ioh", (d,))
        edge_in = nn.Dense(d, kernel_init=uni, bias_init=uni, name="linear_edge_in")
        edge_out = nn.Dense(d, kernel_init=uni, bias_init=uni, name="linear_edge_out")

        H = A.shape[1]
        for _ in range(self.step):
            input_in = jnp.einsum("bij,bjd->bid", A[:, :, :H], edge_in(hidden)) + b_iah
            input_out = jnp.einsum("bij,bjd->bid", A[:, :, H:], edge_out(hidden)) + b_ioh
            inputs = jnp.concatenate([input_in, input_out], axis=2)
            gi = inputs @ w_ih + b_ih
            gh = hidden @ w_hh + b_hh
            i_r, i_i, i_n = jnp.split(gi, 3, axis=2)
            h_r, h_i, h_n = jnp.split(gh, 3, axis=2)
            reset = jax.nn.sigmoid(i_r + h_r)
            inputgate = jax.nn.sigmoid(i_i + h_i)
            newgate = jnp.tanh(i_n + reset * h_n)
            hidden = (1 - inputgate) * hidden + inputgate * newgate
        return hidden


@register_model("SRGNN")
class SRGNN(SequentialModel):
    extra_log_args: ClassVar[list] = ["num_layers"]

    emb_size: int = 64
    num_layers: int = 1

    @staticmethod
    def parse_model_args(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        parser.add_argument("--num_layers", type=int, default=1, help="Number of GNN steps.")
        return SequentialModel.parse_model_args(parser)

    @nn.compact
    def __call__(self, feed, training: bool = False):
        d = self.emb_size
        std = 1.0 / (d ** 0.5)

        def uni(key, shape, dtype=jnp.float32):  # U(-std, std), reference :30-32
            return jax.random.uniform(key, shape, dtype, -std, std)

        history, lengths = feed["history_items"], feed["lengths"]
        B, H = history.shape
        valid = (history > 0).astype(jnp.float32)

        i_table = self.param("i_embeddings", uni, (self.item_num, d))
        i_table = i_table.at[0].set(0.0)  # padding_idx=0 (reference :36)
        alias, A, nodes = build_session_graph(history)
        hidden = i_table[nodes]
        hidden = GatedGNN(d, self.num_layers, name="gnn")(A, hidden)
        seq_hidden = jnp.take_along_axis(hidden, alias[:, :, None], axis=1)  # [B, H, d]

        ht = jnp.take_along_axis(
            seq_hidden, jnp.maximum(lengths - 1, 0)[:, None, None], axis=1)[:, 0]
        l1 = nn.Dense(d, kernel_init=uni, bias_init=uni, name="linear1")
        l2 = nn.Dense(d, kernel_init=uni, bias_init=uni, name="linear2")
        l3 = nn.Dense(1, use_bias=False, kernel_init=uni, name="linear3")
        alpha = l3(jax.nn.sigmoid(l1(ht)[:, None, :] + l2(seq_hidden)))  # [B, H, 1]
        a = (alpha * seq_hidden * valid[:, :, None]).sum(1)
        his_vector = nn.Dense(d, kernel_init=uni, bias_init=uni, name="linear_transform")(
            jnp.concatenate([a, ht], axis=1))

        i_vectors = i_table[feed["item_id"]]
        prediction = (his_vector[:, None, :] * i_vectors).sum(-1)
        return {"prediction": prediction}
