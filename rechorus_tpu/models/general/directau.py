"""DirectAU -- representation alignment + uniformity for CF.

Reference behavior: src/models/general/DirectAU.py (Wang et al., KDD'22):
plain MF scoring; loss = alignment(||u-i||^2 on normalized embeddings)
+ gamma * mean of the two uniformity terms log mean exp(-2*pdist^2);
trains WITHOUT negatives.
CMD example:
  python -m rechorus_tpu.main --model_name DirectAU --emb_size 64 \
      --lr 1e-3 --l2 1e-6 --epoch 500 --gamma 0.3
"""
from __future__ import annotations

from typing import ClassVar

import flax.linen as nn

from rechorus_tpu.models.base import GeneralModel
from rechorus_tpu.ops import losses
from rechorus_tpu.ops.layers import embed
from rechorus_tpu.registry import register_model

XAVIER = nn.initializers.xavier_normal()


@register_model("DirectAU")
class DirectAU(GeneralModel):
    train_with_neg: ClassVar[bool] = False
    extra_log_args: ClassVar[list] = ["emb_size", "gamma"]

    emb_size: int = 64
    gamma: float = 1.0

    @staticmethod
    def parse_model_args(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        parser.add_argument("--gamma", type=float, default=1, help="Weight of the uniformity loss.")
        return GeneralModel.parse_model_args(parser)

    @nn.compact
    def __call__(self, feed, training: bool = False):
        # TableEmbed (not raw params): required for --bf16_emb and the
        # --sparse_emb_grad lookup context (ops/layers.embed docstring)
        u_emb = embed(self.user_num, self.emb_size, "u_embeddings", init=XAVIER)
        i_emb = embed(self.item_num, self.emb_size, "i_embeddings", init=XAVIER)
        user, items = feed["user_id"], feed["item_id"]
        user_e = u_emb(user)  # [B, d]
        item_e = i_emb(items)  # [B, C, d]
        prediction = (user_e[:, None, :] * item_e).sum(-1)
        out = {"prediction": prediction}
        if training:
            out.update({"user_e": user_e, "item_e": item_e[:, 0]})
        return out

    def loss(self, out_dict, feed):
        user_e, item_e = out_dict["user_e"], out_dict["item_e"]
        align = losses.alignment_loss(user_e, item_e)
        uniform = (losses.uniformity_loss(user_e) + losses.uniformity_loss(item_e)) / 2
        return align + self.gamma * uniform
