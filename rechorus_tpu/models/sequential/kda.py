"""KDA -- Knowledge-aware Dynamic Attention (temporal evolution of item
relations, frequency-domain decay).

Reference behavior: src/models/sequential/KDA.py (Wang et al., TOIS'21):
1) Relational dynamic history aggregation: per relation r, attention of
   relation-translated candidate embeddings over the history, modulated by
   a learnable inverse-DFT temporal decay initialized from the corpus's
   relational interval-distribution DFT (RelationalDynamicAggregation,
   KDA.py:266-303; init copy 69-73).
2) Multi-layer self-attention over the relation axis + FFN (110-135).
3) Pooling (average/max/attention) -> his_vector; prediction =
   dot(u + his_vector, candidate entity emb) + item bias (137-160).
4) Joint loss = rec BPR + gamma * DistMult KG BPR (162-191).
"""
from __future__ import annotations

import math
from typing import Any, ClassVar

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rechorus_tpu.models.base import SequentialModel
from rechorus_tpu.ops import losses
from rechorus_tpu.ops import layers as L
from rechorus_tpu.ops.layers import MultiHeadAttention, NORMAL_INIT, dense
from rechorus_tpu.registry import register_model


@register_model("KDA")
class KDA(SequentialModel):
    reader: ClassVar[str] = "KDAReader"
    batcher: ClassVar[str] = "kda"
    extra_log_args: ClassVar[list] = ["num_layers", "num_heads", "gamma", "freq_rand", "include_val"]
    candidate_aligned_keys: ClassVar[tuple] = ("item_val",)

    emb_size: int = 64
    neg_head_p: float = 0.5
    num_layers: int = 1
    num_heads: int = 1
    gamma: float = -1.0
    attention_size: int = 10
    pooling: str = "average"
    include_val: int = 1
    t_scalar: int = 60
    freq_rand: int = 0
    freq_dim: int = 33
    relation_num: int = 1
    entity_num: int = 0
    freq_factory: Any = None  # lambda -> (real [R,F], imag [R,F]) numpy

    @staticmethod
    def parse_model_args(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        parser.add_argument("--neg_head_p", type=float, default=0.5,
                            help="The probability of sampling negative head entity.")
        parser.add_argument("--num_layers", type=int, default=1, help="Number of self-attention layers.")
        parser.add_argument("--num_heads", type=int, default=1, help="Number of attention heads.")
        parser.add_argument("--gamma", type=float, default=-1,
                            help="Coefficient of KG loss (-1 for auto-determine).")
        parser.add_argument("--attention_size", type=int, default=10,
                            help="Size of attention hidden space.")
        parser.add_argument("--pooling", type=str, default="average",
                            help="Method of pooling relational history embeddings: average, max, attention")
        parser.add_argument("--include_val", type=int, default=1,
                            help="Whether include relation value in the relation representation")
        return SequentialModel.parse_model_args(parser)

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw["relation_num"] = corpus.n_relations
        kw["entity_num"] = corpus.n_entities
        kw["t_scalar"] = corpus.t_scalar
        kw["freq_dim"] = corpus.n_dft // 2 + 1
        kw["freq_rand"] = corpus.freq_rand
        if args.gamma < 0:
            kw["gamma"] = len(corpus.relation_df) / len(corpus.all_df)
        if not corpus.freq_rand:
            real = np.real(corpus.freq_x).astype(np.float32)
            imag = np.imag(corpus.freq_x).astype(np.float32)
            kw["freq_factory"] = (lambda real=real, imag=imag: (real, imag))
        return kw

    # ------------------------------------------------------------------
    def _freq_init(self, which: int):
        if self.freq_factory is None:
            return NORMAL_INIT
        return lambda key, shape, dtype=jnp.float32: jnp.asarray(self.freq_factory()[which])

    def _idft_decay(self, freq_real, freq_imag, delta_t):
        """Learnable temporal decay per relation via inverse DFT with
        conjugate symmetry (reference RelationalDynamicAggregation.
        idft_decay, KDA.py:276-286). delta_t [B, H] -> [B, H, R].

        The reference materializes a [.., R, 2F] broadcast over the
        conjugate-extended spectrum; the two halves are identical by
        symmetry (cos(-w)x_r = cos(w)x_r and -sin(-w)(-x_i) =
        -sin(w)x_i), so mean over 2F == mean over F of one half.
        Computing that half as two [B*H, F] x [F, R] einsums keeps the
        contraction on the MXU and drops the [B, H, R, 2F] intermediate
        + concat copies the trace showed per step (docs/PERF.md r4).
        Equivalence vs the literal transcription is pinned by
        tests/test_weight_port.py (KDA forward parity)."""
        F = self.freq_dim
        freq = jnp.linspace(0.0, 1.0, F) / 2.0
        w = 2.0 * math.pi * freq * delta_t[..., None]  # [B, H, F]
        real = jnp.einsum("bhf,rf->bhr", jnp.cos(w), freq_real)
        imag = jnp.einsum("bhf,rf->bhr", jnp.sin(w), freq_imag)
        return (real - imag) / (2.0 * F)  # [B, H, R]

    def lazy_table_specs(self) -> dict:
        # the entity table is gathered by candidates, history, the KG
        # triple batch and item values; relation/freq tables are [R, *]
        # (tiny) and stay dense
        return {
            ("user_embeddings", "embedding"): ("user_id",),
            ("item_bias", "embedding"): ("item_id",),
            ("entity_embeddings", "embedding"): (
                "item_id", "history_items", "item_val",
                "head_id", "tail_id", "value_id",
                "history_items_a", "history_items_b",
            ),
        }

    @nn.compact
    def __call__(self, feed, training: bool = False):
        R, d = self.relation_num, self.emb_size
        # TableEmbed (not raw params) for the id-gathered tables: required
        # for --bf16_emb and the --sparse_emb_grad lookup context
        # (ops/layers.embed docstring)
        user_emb = L.embed(self.user_num, d, "user_embeddings")
        entity_tbl = L.embed(self.entity_num, d, "entity_embeddings")
        entity_emb = entity_tbl  # gathers below go through TableEmbed
        relation_emb = self.param("relation_embeddings", NORMAL_INIT, (R, d))
        freq_real = self.param("freq_real", self._freq_init(0), (R, self.freq_dim))
        freq_imag = self.param("freq_imag", self._freq_init(1), (R, self.freq_dim))
        item_bias = L.embed(self.item_num, 1, "item_bias")

        u_ids, i_ids = feed["user_id"], feed["item_id"]
        history = feed["history_items"]  # [B, H]
        delta_t_n = feed["history_delta_t"]  # [B, H]
        B, H = history.shape

        u_vectors = user_emb(u_ids)  # [B, d]
        i_vectors = entity_emb(i_ids)  # [B, C, d]
        v_vectors = entity_emb(feed["item_val"])  # [B, C, R, d]

        # submodules created ONCE so repeated encode() calls (ContraKDA's
        # augmented views) share parameters
        attn_blocks = [
            (MultiHeadAttention(d, self.num_heads, use_bias=False, name=f"attn_{k}"),
             dense(d, name=f"w1_{k}"), dense(d, name=f"w2_{k}"),
             nn.LayerNorm(epsilon=1e-5, name=f"ln_{k}"))
            for k in range(self.num_layers)
        ]
        if self.pooling == "attention":
            pool_a = dense(self.attention_size, name="A")
            pool_out = dense(1, use_bias=False, name="A_out")

        def encode(i_vec, v_vec, hist, delta_t):
            """Relational dynamic aggregation + relation self-attention +
            pooling -> per-candidate history vector [B, C, d]
            (KDA.py:288-303)."""
            his_vecs = entity_emb(hist)  # [B, H, d]
            if self.include_val:
                rv = relation_emb[None, None, :, :] + v_vec
                ri_vectors = rv * i_vec[:, :, None, :]  # [B, C, R, d]
            else:
                ri_vectors = relation_emb[None, None, :, :] * i_vec[:, :, None, :]
            attention = jnp.einsum("bhd,bcrd->bchr", his_vecs, ri_vectors)
            valid = (hist > 0)[:, None, :, None]  # [B, 1, H, 1]
            attention = losses.masked_softmax(
                attention, jnp.broadcast_to(valid, attention.shape), axis=2)
            decay = jnp.clip(self._idft_decay(freq_real, freq_imag, delta_t), 0.0, 1.0)
            decay = jnp.where(valid[:, 0, :, :], decay, 0.0)[:, None, :, :]  # [B, 1, H, R]
            attention = attention * decay
            context = jnp.einsum("bhd,bchr->bcrd", his_vecs, attention)  # [B, C, R, d]

            for mha, w1, w2, ln in attn_blocks:
                residual = context
                context = mha(context, context, context)
                context = w1(context)
                context = w2(nn.relu(context))
                context = nn.Dropout(self.dropout, deterministic=not training)(context)
                context = ln(residual + context)

            if self.pooling == "attention":
                query = context * u_vectors[:, None, None, :]
                att = pool_out(jnp.tanh(pool_a(query)))[..., 0]
                att = jax.nn.softmax(att - jax.lax.stop_gradient(att.max()), axis=-1)
                return (context * att[:, :, :, None]).sum(-2)
            elif self.pooling == "max":
                return context.max(axis=-2)
            return context.mean(axis=-2)  # [B, C, d]

        his_vector = encode(i_vectors, v_vectors, history, delta_t_n)

        i_bias = item_bias(i_ids)[..., 0]
        prediction = ((u_vectors[:, None, :] + his_vector) * i_vectors).sum(-1) + i_bias
        out = {"prediction": prediction}

        if training and "history_items_a" in feed:
            # ContraKDA: context-context consistency of the two augmented
            # histories, each encoded by the SAME relational encoder
            # conditioned on the true target candidate
            tcol = feed.get("_target_col", jnp.zeros_like(i_ids[:, 0]))[:, None]
            tgt_i = jnp.take_along_axis(i_vectors, tcol[:, :, None], axis=1)  # [B, 1, d]
            tgt_v = jnp.take_along_axis(v_vectors, tcol[:, :, None, None], axis=1)
            fa = encode(tgt_i, tgt_v, feed["history_items_a"], delta_t_n)[:, 0]
            fb = encode(tgt_i, tgt_v, feed["history_items_b"], delta_t_n)[:, 0]
            features = jnp.stack([fa, fb], axis=1)  # [B, 2, d]
            out["features"] = features / jnp.maximum(
                jnp.linalg.norm(features, axis=-1, keepdims=True), 1e-12)
            out["labels"] = jnp.take_along_axis(i_ids, tcol, axis=1)[:, 0]

        if "head_id" in feed:  # joint KG batch (train)
            head_v = entity_emb(feed["head_id"])  # [B, 1+N, d]
            tail_v = entity_emb(feed["tail_id"])
            value_v = entity_emb(feed["value_id"])  # [B, d]
            relation_v = relation_emb[feed["relation_id"]]  # [B, d]
            if self.include_val:
                rel = (relation_v + value_v)[:, None, :]
            else:
                rel = relation_v[:, None, :]
            out["kg_prediction"] = (head_v * rel * tail_v).sum(-1)
        return out

    def loss(self, out_dict, feed):
        rec_loss = losses.bpr_multi_neg(out_dict["prediction"])
        kg_loss = losses.bpr_multi_neg(out_dict["kg_prediction"])
        return rec_loss + self.gamma * kg_loss


@register_model("ContraKDA")
class ContraKDA(KDA):
    """KDA + ContraRec-style context-context contrastive training.

    The reference's results table lists ContraKDA (docs/
    demo_scripts_results/README.md:65, HR@5 0.5282 on Grocery) but this
    snapshot ships no ContraKDA.py, so the composition here is designed
    from its two parents: the KDA relational-dynamics encoder scores
    candidates as usual (+ joint KG BPR), and two augmented history
    views (beta-distributed masking, mask -> pad id 0 because the entity
    table has no spare mask row) are encoded by the SAME relational
    encoder conditioned on the true target, then pulled together with
    the ContraRec CCC InfoNCE (ops/losses.infonce).
    """

    batcher: ClassVar[str] = "contra_kda"
    extra_log_args: ClassVar[list] = [
        "num_layers", "num_heads", "gamma", "contra_gamma", "ccc_temp", "freq_rand"]

    contra_gamma: float = 0.3
    ccc_temp: float = 1.0
    beta_a: int = 3
    beta_b: int = 3

    @staticmethod
    def parse_model_args(parser):
        parser.add_argument("--contra_gamma", type=float, default=0.3,
                            help="Coefficient of the context-context contrastive loss.")
        parser.add_argument("--ccc_temp", type=float, default=1.0,
                            help="Temperature of the contrastive loss.")
        parser.add_argument("--beta_a", type=int, default=3,
                            help="Beta-distribution parameter for view masking.")
        parser.add_argument("--beta_b", type=int, default=3,
                            help="Beta-distribution parameter for view masking.")
        return KDA.parse_model_args(parser)

    def loss(self, out_dict, feed):
        loss = super().loss(out_dict, feed)
        if "features" in out_dict:
            labels = out_dict["labels"]
            same_target = labels[:, None] == labels[None, :]
            loss = loss + self.contra_gamma * self.ccc_temp * losses.infonce(
                out_dict["features"], temperature=self.ccc_temp,
                same_target_mask=same_target)
        return loss
