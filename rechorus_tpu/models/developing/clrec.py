"""CLRec -- contrastive learning for sequential recommendation.

Reference behavior: src/models/developing/CLRec.py: BERT4Rec encoder;
training uses NO sampled negatives -- the loss is InfoNCE between the
sequence representation (view 0) and the target item embedding (view 1)
with in-batch items as negatives (ContraLoss, CLRec.py:70-109).
"""
from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax
import jax.numpy as jnp

from rechorus_tpu.models.base import SequentialModel
from rechorus_tpu.models.sequential.contrarec import BERT4RecEncoder
from rechorus_tpu.ops.layers import embed
from rechorus_tpu.registry import register_model


@register_model("CLRec")
class CLRec(SequentialModel):
    train_with_neg: ClassVar[bool] = False
    extra_log_args: ClassVar[list] = ["batch_size", "temp"]

    emb_size: int = 64
    temp: float = 0.2

    @staticmethod
    def parse_model_args(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        parser.add_argument("--temp", type=float, default=0.2, help="Temperature in contrastive loss.")
        return SequentialModel.parse_model_args(parser)

    @nn.compact
    def __call__(self, feed, training: bool = False):
        i_emb = embed(self.item_num, self.emb_size, "i_embeddings")
        encoder = BERT4RecEncoder(self.emb_size, self.history_max, num_layers=2,
                                  num_heads=2, name="encoder")
        his_vector = encoder(i_emb(feed["history_items"]), feed["lengths"], training=training)
        i_vectors = i_emb(feed["item_id"])
        prediction = (his_vector[:, None, :] * i_vectors).sum(-1)
        out = {"prediction": prediction}
        if training:
            features = jnp.stack([his_vector, i_vectors[:, 0, :]], axis=1)
            features = features / jnp.maximum(
                jnp.linalg.norm(features, axis=-1, keepdims=True), 1e-12)
            out["features"] = features
        return out

    def loss(self, out_dict, feed):
        # one-directional InfoNCE: anchors = sequence reps, contrasts =
        # in-batch target embeddings (reference ContraLoss, CLRec.py:70-109)
        f = out_dict["features"]
        logits = (f[:, 0] @ f[:, 1].T) / self.temp  # [B, B]
        log_prob = jax.nn.log_softmax(logits, axis=1)
        return -jnp.diagonal(log_prob).mean()
