"""ContraRec -- sequential recommendation with multiple contrast signals.

Reference behavior: src/models/sequential/ContraRec.py (Wang et al.,
TOIS'22): CTC loss = temperature-scaled softmax-CE over candidates;
CCC loss = supervised InfoNCE (ContraLoss, 142-195) over TWO augmented
views of the history (mask_op / reorder_op with Beta(a,b)-sampled ratios,
106-140), where in-batch rows sharing the same target item count as
positives. Encoders: GRU4Rec / Caser / BERT4Rec (197-276).

TPU notes: augmentation runs on device inside the jitted step (the
reference augments per-row in DataLoader workers). Deviation for parity:
the reference's CCC labels take column 0 of the ALREADY-PERMUTED item_id
(an artifact of the anti-leak shuffle, BaseRunner.py:187-202); we use the
true target id (the documented intent of the paper).
"""
from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax
import jax.numpy as jnp

from rechorus_tpu.models.base import SequentialModel
from rechorus_tpu.ops import losses
from rechorus_tpu.ops.layers import MaskedGRU, TransformerLayer, dense, embed
from rechorus_tpu.registry import register_model


class BERT4RecEncoder(nn.Module):
    """Bidirectional transformer over valid positions
    (reference ContraRec.py:253-276). __call__ returns the state at
    lengths-1; encode_all returns all positions (S3Rec's MIP head)."""

    emb_size: int
    max_his: int
    num_layers: int = 2
    num_heads: int = 2
    # S3Rec's encoder variant LayerNorms + drops the position-added input
    # (reference S3Rec.py:186-205); ContraRec/CLRec's does not
    input_ln: bool = False
    dropout: float = 0.0

    def setup(self):
        self.p_embeddings = embed(self.max_his + 1, self.emb_size, "p_embeddings")
        self.blocks = [
            TransformerLayer(d_model=self.emb_size, d_ff=self.emb_size,
                             n_heads=self.num_heads, name=f"trm_{k}")
            for k in range(self.num_layers)
        ]
        if self.input_ln:
            self.layer_norm = nn.LayerNorm(epsilon=1e-5, name="layer_norm")
            self.input_drop = nn.Dropout(self.dropout)

    def encode_all(self, seq, lengths, training: bool = False):
        B, L, _ = seq.shape
        len_range = jnp.arange(L)
        valid = len_range[None, :] < lengths[:, None]
        position = len_range[None, :] * valid.astype(jnp.int32)
        seq = seq + self.p_embeddings(position)
        if self.input_ln:
            seq = self.input_drop(self.layer_norm(seq), deterministic=not training)
        attn_mask = valid[:, None, None, :]
        for block in self.blocks:
            seq = block(seq, mask=attn_mask, training=training)
        return seq * valid[:, :, None].astype(seq.dtype)

    def __call__(self, seq, lengths, training: bool = False):
        seq = self.encode_all(seq, lengths, training=training)
        return jnp.take_along_axis(seq, jnp.maximum(lengths - 1, 0)[:, None, None], axis=1)[:, 0]


class GRUEncoder(nn.Module):
    """GRU + linear head (reference GRU4RecEncoder, ContraRec.py:199-218)."""

    emb_size: int
    hidden_size: int = 128

    @nn.compact
    def __call__(self, seq, lengths, training: bool = False):
        _, carry = MaskedGRU(self.hidden_size, name="rnn")(seq, lengths)
        return dense(self.emb_size, use_bias=False, name="out")(carry)


class CaserEncoder(nn.Module):
    """Horizontal + vertical convolutions (reference CaserEncoder,
    ContraRec.py:220-251)."""

    emb_size: int
    max_his: int
    num_horizon: int = 16
    num_vertical: int = 8
    l: int = 5

    @nn.compact
    def __call__(self, seq, lengths, training: bool = False):
        B, L, D = seq.shape
        x = seq[:, :, :, None]  # NHWC: [B, L, D, 1]
        out_v = nn.Conv(self.num_vertical, kernel_size=(L, 1), padding="VALID",
                        name="conv_v")(x).reshape(B, -1)
        outs = []
        for i in range(1, self.l + 1):
            c = nn.Conv(self.num_horizon, kernel_size=(i, D), padding="VALID",
                        name=f"conv_h_{i}")(x)  # [B, L-i+1, 1, nh]
            outs.append(nn.relu(c[:, :, 0, :]).max(axis=1))
        out_h = jnp.concatenate(outs, axis=1)
        return dense(self.emb_size, name="fc")(jnp.concatenate([out_v, out_h], axis=1))


@register_model("ContraRec")
class ContraRec(SequentialModel):

    def lazy_table_specs(self) -> dict:
        # OPT OUT of --lazy_emb_adam: the mask-token / distillation rows
        # are gathered inside the model (not listed in any feed key), so
        # touched-rows updates would silently miss their grads
        return {}

    batcher: ClassVar[str] = "contra"
    extra_log_args: ClassVar[list] = ["gamma", "num_neg", "batch_size", "ctc_temp", "ccc_temp", "encoder"]

    emb_size: int = 64
    gamma: float = 1.0
    beta_a: int = 3
    beta_b: int = 3
    ctc_temp: float = 1.0
    ccc_temp: float = 0.2
    encoder: str = "BERT4Rec"

    @staticmethod
    def parse_model_args(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        parser.add_argument("--gamma", type=float, default=1, help="Coefficient of the contrastive loss.")
        parser.add_argument("--beta_a", type=int, default=3,
                            help="Parameter of the beta distribution for sampling.")
        parser.add_argument("--beta_b", type=int, default=3,
                            help="Parameter of the beta distribution for sampling.")
        parser.add_argument("--ctc_temp", type=float, default=1,
                            help="Temperature in context-target contrastive loss.")
        parser.add_argument("--ccc_temp", type=float, default=0.2,
                            help="Temperature in context-context contrastive loss.")
        parser.add_argument("--encoder", type=str, default="BERT4Rec",
                            help="Choose a sequence encoder: GRU4Rec, Caser, BERT4Rec.")
        return SequentialModel.parse_model_args(parser)

    @property
    def mask_token(self):
        return self.item_num  # one id past the catalog

    def _encoder(self):
        if self.encoder == "GRU4Rec":
            return GRUEncoder(self.emb_size, hidden_size=128, name="encoder")
        elif self.encoder == "Caser":
            return CaserEncoder(self.emb_size, self.history_max, num_horizon=16,
                                num_vertical=8, l=5, name="encoder")
        elif self.encoder == "BERT4Rec":
            return BERT4RecEncoder(self.emb_size, self.history_max, num_layers=2,
                                   num_heads=2, name="encoder")
        raise ValueError("Invalid sequence encoder.")

    @nn.compact
    def __call__(self, feed, training: bool = False):
        i_emb = embed(self.item_num + 1, self.emb_size, "i_embeddings")
        encoder = self._encoder()
        history, lengths = feed["history_items"], feed["lengths"]

        his_vector = encoder(i_emb(history), lengths, training=training)
        i_vectors = i_emb(feed["item_id"])
        prediction = (his_vector[:, None, :] * i_vectors).sum(-1)
        out = {"prediction": prediction}

        if training and "history_items_a" in feed:
            his_a = encoder(i_emb(feed["history_items_a"]), lengths, training=training)
            his_b = encoder(i_emb(feed["history_items_b"]), lengths, training=training)
            features = jnp.stack([his_a, his_b], axis=1)  # [B, 2, d]
            features = features / jnp.maximum(
                jnp.linalg.norm(features, axis=-1, keepdims=True), 1e-12)
            out["features"] = features
            # true target id per row (see module docstring re: permutation)
            tcol = feed.get("_target_col", jnp.zeros_like(feed["item_id"][:, 0]))
            out["labels"] = jnp.take_along_axis(feed["item_id"], tcol[:, None], axis=1)[:, 0]
        return out

    def loss(self, out_dict, feed):
        predictions = out_dict["prediction"] / self.ctc_temp
        ctc_loss = -self.ctc_temp * jax.nn.log_softmax(predictions, axis=1)[:, 0].mean()
        labels = out_dict["labels"]
        same_target = labels[:, None] == labels[None, :]
        ccc_loss = self.ccc_temp * losses.infonce(
            out_dict["features"], temperature=self.ccc_temp, same_target_mask=same_target)
        return ctc_loss + self.gamma * ccc_loss
