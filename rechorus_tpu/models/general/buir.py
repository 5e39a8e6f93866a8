"""BUIR -- Bootstrapping User and Item Representations (one-class CF).

Reference behavior: src/models/general/BUIR.py (Lee et al., SIGIR'21):
online/target twin embedding tables + a linear predictor; BYOL-style loss
2 - 2*cos(online, stop_grad(target)); target tables follow the online ones
by EMA (momentum) after every optimizer step (driven by BUIRRunner);
trains WITHOUT negatives.

TPU design: the target tables live in the 'target' variable collection
(non-trainable state carried in TrainState.extra_vars); the EMA update is
a pure pytree op fused into the jitted epoch scan.
"""
from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax.numpy as jnp

from rechorus_tpu.models.base import GeneralModel
from rechorus_tpu.registry import register_model

XAVIER = nn.initializers.xavier_normal()


@register_model("BUIR")
class BUIR(GeneralModel):
    runner: ClassVar[str] = "BUIRRunner"
    train_with_neg: ClassVar[bool] = False
    extra_log_args: ClassVar[list] = ["emb_size", "momentum"]

    emb_size: int = 64
    momentum: float = 0.995

    @staticmethod
    def parse_model_args(parser):
        parser.add_argument("--emb_size", type=int, default=64, help="Size of embedding vectors.")
        parser.add_argument("--momentum", type=float, default=0.995, help="Momentum update.")
        return GeneralModel.parse_model_args(parser)

    @nn.compact
    def __call__(self, feed, training: bool = False):
        from rechorus_tpu.ops.layers import embed
        from rechorus_tpu.parallel.mesh import pad_rows

        # TableEmbed (not raw params): required for --bf16_emb and the
        # --sparse_emb_grad lookup context (ops/layers.embed docstring)
        user_online = embed(self.user_num, self.emb_size, "user_online", init=XAVIER)
        item_online = embed(self.item_num, self.emb_size, "item_online", init=XAVIER)
        # reference init_weights: Linear weight xavier_normal, bias N(0,1)
        predictor = nn.Dense(self.emb_size, kernel_init=XAVIER,
                             bias_init=nn.initializers.normal(1.0), name="predictor")

        user, items = feed["user_id"], feed["item_id"]
        u_on = user_online(user)  # [B, d]
        i_on = item_online(items)  # [B, C, d]
        prediction = (predictor(i_on) * u_on[:, None, :]).sum(-1) + \
                     (predictor(u_on)[:, None, :] * i_on).sum(-1)
        out = {"prediction": prediction}

        if training:
            # target tables: EMA copies of the online ones, initialized to
            # the same values by post_init_state (reference BUIR.py:50-56);
            # shapes follow the online tables' row padding
            u_t = self.variable("target", "user_target",
                                lambda: jnp.zeros((pad_rows(self.user_num), self.emb_size)))
            i_t = self.variable("target", "item_target",
                                lambda: jnp.zeros((pad_rows(self.item_num), self.emb_size)))
            out.update({
                "u_online": predictor(u_on),
                "u_target": u_t.value[user],
                "i_online": predictor(i_on[:, 0]),
                "i_target": i_t.value[items[:, 0]],
            })
        return out

    def loss(self, out_dict, feed):
        def norm(x):
            return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

        u_on, i_on = norm(out_dict["u_online"]), norm(out_dict["i_online"])
        # targets come from the non-trainable 'target' collection --
        # naturally stop-gradient (reference uses .detach())
        u_t, i_t = norm(out_dict["u_target"]), norm(out_dict["i_target"])
        loss_ui = 2 - 2 * (u_on * i_t).sum(-1)
        loss_iu = 2 - 2 * (i_on * u_t).sum(-1)
        return (loss_ui + loss_iu).mean()

    # -- BUIRRunner hooks ------------------------------------------------
    def post_init_state(self, state):
        # jnp.copy: the targets must be distinct buffers from the online
        # params (the jitted epoch fn donates its input state; aliased
        # leaves would be donated twice)
        tgt = dict(state.extra_vars.get("target", {}))
        tgt["user_target"] = jnp.copy(state.params["user_online"]["embedding"])
        tgt["item_target"] = jnp.copy(state.params["item_online"]["embedding"])
        extra = dict(state.extra_vars)
        extra["target"] = tgt
        return state.replace(extra_vars=extra)

    def ema_update(self, params, extra_vars):
        m = self.momentum
        tgt = extra_vars["target"]
        new_tgt = {
            "user_target": tgt["user_target"] * m + params["user_online"]["embedding"] * (1.0 - m),
            "item_target": tgt["item_target"] * m + params["item_online"]["embedding"] * (1.0 - m),
        }
        out = dict(extra_vars)
        out["target"] = new_tgt
        return out

    def lazy_table_specs(self) -> dict:
        # online twins only; the EMA target update is a full-table op by
        # construction (not an optimizer update), so lazy Adam's benefit
        # is bounded by it at scale
        return {
            ("user_online", "embedding"): ("user_id",),
            ("item_online", "embedding"): ("item_id",),
        }
