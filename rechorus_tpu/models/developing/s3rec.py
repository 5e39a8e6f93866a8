"""S3Rec -- self-supervised pretraining with MIP + SP objectives.

Reference behavior: src/models/developing/S3Rec.py: stage 1 pretrains a
BERT4Rec encoder over max_his-chunked user sequences with two objectives:
masked item prediction (random positions -> mask token; score pos vs
sampled neg through mip_norm, 58-62) and segment prediction (a random
contiguous segment masked out; its encoding vs a random segment of the
global stream through sp_norm, 64-66); loss = mip_weight * sum(BCE) +
sp_weight * sum(BCE) (105-115). Stage 2 loads the pretrained weights
(partially, matching keys) and finetunes with BPR.

TPU notes: the per-row masking/segment sampling (reference Dataset,
117-183) runs on device in the 's3rec' batcher.

Documented deviation: the MIP head scores each masked POSITION's encoder
output against its pos/neg item (the S3Rec paper's masked-item objective).
The reference instead broadcasts the sequence's FINAL hidden state over
all positions (S3Rec.py:58-61 calls its encoder, which returns only the
lengths-1 state) -- a latent bug that makes every position share one
query. The inference branch (what the weight-port parity test pins) is
identical in both.
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
from rechorus_tpu.models.sequential.contrarec import BERT4RecEncoder
from rechorus_tpu.ops import losses
from rechorus_tpu.ops.layers import dense, embed
from rechorus_tpu.registry import register_model


@register_model("S3Rec")
class S3Rec(SequentialModel):

    def lazy_table_specs(self) -> dict:
        # OPT OUT of --lazy_emb_adam: the mask-token / distillation rows
        # are gathered inside the model (not listed in any feed key), so
        # touched-rows updates would silently miss their grads
        return {}

    batcher: ClassVar[str] = "s3rec"
    extra_log_args: ClassVar[list] = ["emb_size", "mip_weight", "sp_weight", "mask_ratio", "stage"]

    emb_size: int = 64
    mip_weight: float = 0.2
    sp_weight: float = 0.5
    mask_ratio: float = 0.2
    stage: int = 1
    pre_path: str = ""

    @staticmethod
    def parse_model_args(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        parser.add_argument("--mip_weight", type=float, default=0.2, help="Coefficient of the MIP loss.")
        parser.add_argument("--sp_weight", type=float, default=0.5, help="Coefficient of the SP loss.")
        parser.add_argument("--mask_ratio", type=float, default=0.2,
                            help="Proportion of masked positions in the sequence.")
        parser.add_argument("--stage", type=int, default=1,
                            help="Stage of training: 1-pretrain, 2-finetune.")
        return SequentialModel.parse_model_args(parser)

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        base_dir = os.path.dirname(getattr(args, "model_path", "") or "") or "../model/S3Rec"
        kw["pre_path"] = os.path.join(base_dir, "Pre__{}.bin".format(args.dataset))
        if args.stage == 1:
            args.model_path = kw["pre_path"]
        return kw

    @nn.compact
    def __call__(self, feed, training: bool = False):
        i_emb = embed(self.item_num + 1, self.emb_size, "i_embeddings")
        encoder = BERT4RecEncoder(self.emb_size, self.history_max, num_layers=2,
                                  num_heads=2, input_ln=True, dropout=0.2,
                                  name="encoder")
        if "mask_seq" in feed:  # stage-1 pretrain batch
            mip_norm = dense(self.emb_size, name="mip_norm")
            sp_norm = dense(self.emb_size, name="sp_norm")
            mask_seq, seq_len = feed["mask_seq"], feed["seq_len"]
            # MIP: per-position encoder outputs scored vs pos/neg items
            seq_output = encoder.encode_all(i_emb(mask_seq), seq_len, training=training)
            pos_score = jax.nn.sigmoid(
                (mip_norm(seq_output) * i_emb(feed["pos_item"])).sum(-1)).reshape(-1)
            neg_score = jax.nn.sigmoid(
                (mip_norm(seq_output) * i_emb(feed["neg_item"])).sum(-1)).reshape(-1)
            mip_dis = jax.nn.sigmoid(pos_score - neg_score)
            L = mask_seq.shape[1]
            valid = jnp.arange(L)[None, :] < seq_len[:, None]
            mip_mask = ((mask_seq == self.item_num) & valid).astype(jnp.float32)
            # SP: segment-context vs pos/neg segment encodings
            seg_ctx = encoder(i_emb(feed["mask_seg_seq"]), seq_len, training=training)
            pos_seg = encoder(i_emb(feed["pos_seg"]), seq_len, training=training)
            neg_seg = encoder(i_emb(feed["neg_seg"]), seq_len, training=training)
            sp_pos = jax.nn.sigmoid((sp_norm(seg_ctx) * pos_seg).sum(-1))
            sp_neg = jax.nn.sigmoid((sp_norm(seg_ctx) * neg_seg).sum(-1))
            sp_dis = jax.nn.sigmoid(sp_pos - sp_neg)
            return {"mip_dis": mip_dis, "mip_mask": mip_mask.reshape(-1), "sp_dis": sp_dis}

        his_vector = encoder(i_emb(feed["history_items"]), feed["lengths"], training=training)
        i_vectors = i_emb(feed["item_id"])
        prediction = (his_vector[:, None, :] * i_vectors).sum(-1)
        return {"prediction": prediction}

    def loss(self, out_dict, feed):
        if self.stage == 1:
            mip = -jnp.log(jnp.clip(out_dict["mip_dis"], 1e-7, 1.0))
            mip_loss = (mip * out_dict["mip_mask"]).sum()
            sp_loss = -jnp.log(jnp.clip(out_dict["sp_dis"], 1e-7, 1.0)).sum()
            return self.mip_weight * mip_loss + self.sp_weight * sp_loss
        return losses.bpr_multi_neg(out_dict["prediction"])

    def post_init_state(self, state):
        if self.stage == 2:
            if os.path.exists(self.pre_path):
                with open(self.pre_path, "rb") as f:
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
                logging.info("Load pretrained S3Rec from " + self.pre_path)
                return state.replace(params=params)
            logging.info("Train from scratch!")
        return state
