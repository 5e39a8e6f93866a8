"""TiMiRec -- target-interest distillation for multi-interest recommendation.

Reference behavior: src/models/sequential/TiMiRec.py (Wang et al.,
CIKM'22). Stage 'pretrain' trains the K-head MultiInterestExtractor
(attention pooling + optional position emb + optional transformer,
158-205) picking the interest closest to the target; checkpoints to a
well-known extractor path. Stage 'finetune' loads it (PARTIALLY -- only
matching keys, load_model 97-106), adds a GRU InterestPredictor + a
projection MLP, and distills: KL(log_softmax(pred_intent/T) ||
softmax(target_intent/T)) * T^2 added to the BPR loss (146-156).
"""
from __future__ import annotations

import logging
import os
from typing import ClassVar

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp

from rechorus_tpu.models.base import SequentialModel
from rechorus_tpu.ops import losses
from rechorus_tpu.ops.layers import MaskedGRU, TransformerLayer, dense, embed
from rechorus_tpu.registry import register_model


class MultiInterestExtractor(nn.Module):
    """K attention heads over the history (reference TiMiRec.py:158-205)."""

    k: int
    item_num: int
    emb_size: int
    attn_size: int
    max_his: int
    add_pos: int
    add_trm: int

    def setup(self):
        self.i_embeddings = embed(self.item_num, self.emb_size, "i_embeddings")
        if self.add_pos:
            self.p_embeddings = embed(self.max_his + 1, self.emb_size, "p_embeddings")
        self.w1 = dense(self.attn_size, name="W1")
        self.w2 = dense(self.k, name="W2")
        if self.add_trm:
            self.transformer = TransformerLayer(
                d_model=self.emb_size, d_ff=self.emb_size, n_heads=1, kq_same=False,
                name="transformer")

    def __call__(self, history, lengths, training: bool = False):
        B, L = history.shape
        valid = (history > 0)
        his_vectors = self.i_embeddings(history)
        if self.add_pos:
            position = (lengths[:, None] - jnp.arange(L)[None, :]) * valid.astype(jnp.int32)
            his_vectors = his_vectors + self.p_embeddings(position)
        if self.add_trm:
            his_vectors = self.transformer(his_vectors, mask=valid[:, None, None, :],
                                           training=training)
            his_vectors = his_vectors * valid[:, :, None].astype(his_vectors.dtype)
        attn = self.w2(jnp.tanh(self.w1(his_vectors)))  # [B, L, K]
        attn = attn.swapaxes(-1, -2)  # [B, K, L]
        attn = losses.masked_softmax(attn, jnp.broadcast_to(valid[:, None, :], attn.shape), axis=-1)
        return jnp.einsum("bkl,bld->bkd", attn, his_vectors)  # [B, K, d]


class InterestPredictor(nn.Module):
    """GRU over the history -> final hidden (reference TiMiRec.py:208-222)."""

    item_num: int
    emb_size: int

    @nn.compact
    def __call__(self, history, lengths):
        his_vectors = embed(self.item_num + 1, self.emb_size, "i_embeddings")(history)
        _, carry = MaskedGRU(self.emb_size, name="rnn")(his_vectors, lengths)
        return carry


@register_model("TiMiRec")
class TiMiRec(SequentialModel):

    def lazy_table_specs(self) -> dict:
        # OPT OUT of --lazy_emb_adam: the mask-token / distillation rows
        # are gathered inside the model (not listed in any feed key), so
        # touched-rows updates would silently miss their grads
        return {}

    extra_log_args: ClassVar[list] = ["emb_size", "attn_size", "K", "temp", "add_pos", "add_trm", "n_layers"]

    emb_size: int = 64
    attn_size: int = 8
    K: int = 2
    add_pos: int = 1
    add_trm: int = 1
    temp: float = 1.0
    n_layers: int = 1
    stage: str = "finetune"
    extractor_path: str = ""

    @staticmethod
    def parse_model_args(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        parser.add_argument("--attn_size", type=int, default=8, help="Size of attention vectors.")
        parser.add_argument("--K", type=int, default=2, help="Number of hidden interests.")
        parser.add_argument("--add_pos", type=int, default=1,
                            help="Whether add position embedding in extractor.")
        parser.add_argument("--add_trm", type=int, default=1,
                            help="Whether add the transformer layer in extractor.")
        parser.add_argument("--temp", type=float, default=1,
                            help="Temperature in knowledge distillation loss.")
        parser.add_argument("--n_layers", type=int, default=1, help="Number of the projection layer.")
        parser.add_argument("--stage", type=str, default="finetune",
                            help="Training stage: pretrain / finetune.")
        return SequentialModel.parse_model_args(parser)

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        if args.stage not in ("pretrain", "finetune"):
            raise ValueError("Invalid stage: " + args.stage)
        base_dir = os.path.dirname(getattr(args, "model_path", "") or "") or "../model/TiMiRec"
        kw["extractor_path"] = os.path.join(
            base_dir, "Extractor__{}__{}__emb_size={}__K={}__add_pos={}__add_trm={}.bin".format(
                args.dataset, args.random_seed, args.emb_size, args.K, args.add_pos, args.add_trm))
        if args.stage == "pretrain":
            args.model_path = kw["extractor_path"]
        return kw

    @nn.compact
    def __call__(self, feed, training: bool = False):
        i_ids = feed["item_id"]
        history, lengths = feed["history_items"], feed["lengths"]
        B = history.shape[0]
        extractor = MultiInterestExtractor(
            self.K, self.item_num, self.emb_size, self.attn_size, self.history_max,
            self.add_pos, self.add_trm, name="interest_extractor")
        interest_vectors = extractor(history, lengths, training=training)  # [B, K, d]
        i_vectors = extractor.i_embeddings(i_ids)  # [B, C, d]

        out = {}
        if self.stage == "pretrain":
            if training:
                tcol = feed.get("_target_col", jnp.zeros_like(i_ids[:, 0]))
                target_vector = jnp.take_along_axis(
                    i_vectors, tcol[:, None, None], axis=1)[:, 0]  # true target
                target_intent = (interest_vectors * target_vector[:, None, :]).sum(-1)  # [B, K]
                idx_sel = target_intent.argmax(-1)
                user_vector = jnp.take_along_axis(
                    interest_vectors, idx_sel[:, None, None], axis=1)[:, 0]
                prediction = (user_vector[:, None, :] * i_vectors).sum(-1)
            else:
                prediction = (interest_vectors[:, None, :, :] * i_vectors[:, :, None, :]).sum(-1)
                prediction = prediction.max(-1)
        else:  # finetune
            his_vector = InterestPredictor(self.item_num, self.emb_size,
                                           name="interest_predictor")(history, lengths)
            x = his_vector
            for i in range(self.n_layers - 1):
                x = dense(self.emb_size, name=f"proj_{i}")(x)
                x = nn.Dropout(0.5, deterministic=not training)(x)
                x = nn.relu(x)
            pred_intent = dense(self.K, name="proj_final")(x)  # [B, K]
            if training:
                tcol = feed.get("_target_col", jnp.zeros_like(i_ids[:, 0]))
                target_vector = jnp.take_along_axis(i_vectors, tcol[:, None, None], axis=1)[:, 0]

                def norm(v):
                    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)

                target_intent = (norm(interest_vectors) * norm(target_vector)[:, None, :]).sum(-1)
                out["pred_intent"] = pred_intent
                out["target_intent"] = target_intent
            user_vector = (interest_vectors * jax.nn.softmax(pred_intent, -1)[:, :, None]).sum(-2)
            prediction = (user_vector[:, None, :] * i_vectors).sum(-1)
        out["prediction"] = prediction
        return out

    def loss(self, out_dict, feed):
        loss = losses.bpr_multi_neg(out_dict["prediction"])
        if self.stage == "finetune":
            pred = jax.nn.log_softmax(out_dict["pred_intent"] / self.temp, axis=1)
            target = jax.nn.softmax(
                jax.lax.stop_gradient(out_dict["target_intent"]) / self.temp, axis=1)
            # KLDivLoss(reduction='batchmean')(log_p, q) = mean_rows sum q*(log q - log_p)
            kl = (target * (jnp.log(jnp.maximum(target, 1e-12)) - pred)).sum(1).mean()
            loss = loss + self.temp * self.temp * kl
        return loss

    def post_init_state(self, state):
        if self.stage == "finetune":
            if os.path.exists(self.extractor_path):
                with open(self.extractor_path, "rb") as f:
                    raw = flax.serialization.msgpack_restore(f.read())

                def merge(dst, src):
                    out = dict(dst)
                    for k, v in src.items():
                        if k in dst:
                            out[k] = merge(dst[k], v) if isinstance(v, dict) else v
                    return out

                params = merge(flax.serialization.to_state_dict(state.params),
                               raw.get("params", {}))
                params = flax.serialization.from_state_dict(state.params, params)
                logging.info("Load extractor from " + self.extractor_path)
                return state.replace(params=params)
            logging.info("Train from scratch!")
        return state
